"""Persistent ANN index (operators/annindex.py): the maintenance
invariants the SQL oracles can't see — generation accounting, time
travel, frozen-codebook equality between chained and one-shot indexes,
and the probed-list pushdown reaching the parquet scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators.annindex import (
    _CODES,
    _emb,
    _queries_of,
    ann_index_build,
    ann_index_ingest,
    ann_index_probe,
)
from streamroom_bigdata_spark.operators.similarity import PQ_M
from streamroom_bigdata_spark.sources.manifest_table import (
    manifest_history,
    manifest_read,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory):
    """A 3-commit chain (build on batch0, ingest batch1, batch2) plus the
    corpus frame, shared by every test in the module."""
    emb = _emb(spark, SF_SMOKE)
    idx = str(tmp_path_factory.mktemp("annidx"))
    ann_index_build(spark, idx, emb.filter(F.col("vec_id") % 3 == 0))
    for b in (1, 2):
        ann_index_ingest(spark, idx, emb.filter(F.col("vec_id") % 3 == b))
    return idx, emb


def test_ingest_appends_exactly_pqm_rows_per_vector(spark, chain):
    idx, emb = chain
    counts = {
        b: emb.filter(F.col("vec_id") % 3 == b).count() for b in range(3)
    }
    hist = manifest_history(spark, f"{idx}/{_CODES}")
    assert [rec["generation"] for rec in hist] == [0, 1, 2]
    prev = 0
    for b, rec in enumerate(hist):
        added = rec["n_rows"] - prev
        prev = rec["n_rows"]
        assert added == PQ_M * counts[b]


def test_codes_cover_corpus_exactly_once(spark, chain):
    idx, emb = chain
    codes = manifest_read(spark, f"{idx}/{_CODES}")
    per_vec = codes.groupBy("vec_id").count().collect()
    assert len(per_vec) == emb.count()
    assert all(r["count"] == PQ_M for r in per_vec)
    # one list assignment per vector, constant across its code rows
    assert (
        codes.groupBy("vec_id")
        .agg(F.countDistinct("list_id").alias("nl"))
        .filter(F.col("nl") != 1)
        .count()
        == 0
    )


def test_chained_probe_equals_oneshot_frozen_codebook_index(
    spark, chain, tmp_path
):
    """Build a SECOND index in one shot from batch0's training slice but
    ingest the rest in ONE batch — probing it must equal probing the
    3-commit chain: generation layout is invisible to queries."""
    idx, emb = chain
    idx2 = str(tmp_path / "oneshot")
    ann_index_build(spark, idx2, emb.filter(F.col("vec_id") % 3 == 0))
    ann_index_ingest(spark, idx2, emb.filter(F.col("vec_id") % 3 != 0))
    q = _queries_of(emb)
    a = sorted(map(tuple, ann_index_probe(spark, idx, q).collect()))
    b = sorted(map(tuple, ann_index_probe(spark, idx2, q).collect()))
    assert a == b


def test_timetravel_probe_sees_only_its_generation(spark, chain):
    idx, emb = chain
    q = _queries_of(emb)
    g0 = ann_index_probe(spark, idx, q, generation=0)
    # every neighbor at generation 0 is a batch-0 vector
    assert g0.filter(F.col("neighbor_id") % 3 != 0).count() == 0
    # and generation 1 adds batch-1 vectors but never batch-2 ones
    g1 = ann_index_probe(spark, idx, q, generation=1)
    assert g1.filter(F.col("neighbor_id") % 3 == 2).count() == 0
    assert g1.filter(F.col("neighbor_id") % 3 == 1).count() > 0


def test_probe_list_filter_reaches_parquet_scan(spark, chain):
    idx, emb = chain
    plan = ann_index_probe(spark, idx, _queries_of(emb))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PushedFilters" in plan and "In(list_id" in plan


def test_probe_k_and_self_exclusion(spark, chain):
    idx, emb = chain
    q = _queries_of(emb)
    out = ann_index_probe(spark, idx, q, k=3).collect()
    assert all(r.rnk <= 3 for r in out)
    assert all(r.neighbor_id != r.query_id for r in out)
    incl = ann_index_probe(spark, idx, q, k=3, exclude_self=False)
    # with self-matches allowed, each query's own vector scores maximal
    # ADC similarity and must surface at rank 1
    top = {r.query_id: r.neighbor_id for r in incl.filter("rnk = 1").collect()}
    assert all(q_id == n_id for q_id, n_id in top.items())


def test_streaming_ingest_agrees_with_batch_chain(spark, chain, tmp_path):
    """Streaming the non-build batches through the foreachBatch sink
    produces a probe-identical index to the batch ingest chain — the
    micro-batch boundary is just a generation boundary."""
    import os

    from streamroom_bigdata_spark.operators.annindex import (
        streaming_ann_index_sink,
    )
    from streamroom_bigdata_spark.sources import load_table

    idx_batch, emb = chain
    # offline build on batch0, as in the chain fixture
    idx_stream = str(tmp_path / "stream_idx")
    ann_index_build(spark, idx_stream, emb.filter(F.col("vec_id") % 3 == 0))

    # stage batches 1 and 2 as two parquet files with distinct mtimes
    # (file-source micro-batch order follows mtime — verify-skill gotcha)
    raw = load_table(spark, SF_SMOKE, "embeddings")
    src = tmp_path / "stream_src"
    for b in (1, 2):
        part = str(src / f"b{b}")
        raw.filter(F.col("vec_id") % 3 == b).coalesce(1).write.parquet(part)
        for root, _, files in os.walk(part):
            for fn in files:
                os.utime(os.path.join(root, fn), (1000 + b, 1000 + b))
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(streaming_ann_index_sink(idx_stream))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    qdf = _queries_of(emb)
    a = sorted(map(tuple, ann_index_probe(spark, idx_batch, qdf).collect()))
    b = sorted(map(tuple, ann_index_probe(spark, idx_stream, qdf).collect()))
    assert a == b


def test_compaction_is_probe_invisible_and_recluster_real(spark, chain):
    """ann_index_compact collapses the 3-generation append chain into one
    re-clustered commit: probe results are byte-identical, the pre-compact
    state stays time-travelable, and the list filter still reaches the
    parquet scan.

    NOTE: mutates the module-scoped chain (adds a generation) — keep this
    test LAST in the file; earlier tests assert the pristine [0,1,2]
    generation layout."""
    from streamroom_bigdata_spark.operators.annindex import (
        ann_index_compact,
    )
    from streamroom_bigdata_spark.sources.manifest_table import (
        _generation_dirs,
        manifest_history,
    )

    idx, emb = chain
    q = _queries_of(emb)
    before = sorted(map(tuple, ann_index_probe(spark, idx, q).collect()))
    gen = ann_index_compact(spark, idx)
    after = sorted(map(tuple, ann_index_probe(spark, idx, q).collect()))
    assert before == after
    hist = manifest_history(spark, f"{idx}/{_CODES}")
    assert hist[-1]["generation"] == gen
    # the chain's three data dirs collapsed to one
    assert len(_generation_dirs(hist[-1])) == 1
    assert len(_generation_dirs(hist[-2])) == 3
    # row count preserved exactly
    assert hist[-1]["n_rows"] == hist[-2]["n_rows"]
    # pre-compact generation still answers via time travel
    g2 = sorted(
        map(
            tuple,
            ann_index_probe(spark, idx, q, generation=gen - 1).collect(),
        )
    )
    assert g2 == before
    # pushdown still live on the compacted layout
    plan = ann_index_probe(spark, idx, q)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "In(list_id" in plan
