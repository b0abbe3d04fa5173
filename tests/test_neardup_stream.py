"""Streaming near-dup filter: batch semantics + cross-batch index growth."""

from __future__ import annotations

from streamroom_bigdata_spark.streaming.neardup import (
    batch_neardup_filter,
    streaming_neardup_sink,
)

DOC = (
    "the quick brown fox jumps over the lazy dog again and again today "
    "while the band plays on"
)
OTHER = (
    "completely different text about spark shuffles partitions and "
    "catalyst optimizer rules nothing shared here"
)


def test_within_batch_earliest_wins(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, DOC), (2, DOC + " tail"), (3, OTHER)], "doc_id long, text string"
    )
    accepted, bands = batch_neardup_filter(docs, str(tmp_path / "noindex"))
    ids = {r.doc_id for r in accepted.collect()}
    assert 1 in ids and 3 in ids        # earliest copy + the distinct doc
    assert 2 not in ids                  # near-copy of doc 1 dropped
    assert {r.doc_id for r in bands.select("doc_id").distinct().collect()} == ids


def test_cross_batch_dedup_via_index(spark, tmp_path):
    index = str(tmp_path / "index")
    store = str(tmp_path / "accepted")
    sink = streaming_neardup_sink(index, store)

    b0 = spark.createDataFrame([(1, DOC)], "doc_id long, text string")
    # batch 1: a near-copy of history plus a genuinely new doc
    b1 = spark.createDataFrame(
        [(10, DOC + " extra"), (11, OTHER)], "doc_id long, text string"
    )
    sink(b0, 0)
    sink(b1, 1)
    got = {r.doc_id for r in spark.read.parquet(store).collect()}
    assert got == {1, 11}
    # index holds bands for accepted docs only
    idx_docs = {
        r.doc_id
        for r in spark.read.parquet(index).select("doc_id").distinct().collect()
    }
    assert idx_docs == {1, 11}
