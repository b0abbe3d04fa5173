"""Streaming near-duplicate filtering against a persistent signature index.

The LLM-crawl-ingest shape: documents arrive continuously; a new document
is kept only if it does not collide with anything ALREADY ACCEPTED. Per
micro-batch (foreachBatch):

1. MinHash-band signatures for the batch (same math as operators/dedup.py
   — one explode + min-agg over the batch only).
2. History probe: equi-join batch band keys against the persistent band
   index (shuffle keyed on band values — never a scan of all history).
3. Within-batch collisions: earliest doc_id in a band bucket wins.
4. Survivors append to the accepted store; their bands append to the index.

Duplicate decision = any shared LSH band, i.e. the candidate-generation
half of batch ``near_dup_pairs`` used as a filter: documents whose
estimated Jaccard clears the banding curve are dropped without an exact
verify (a dedup FILTER trades a little precision near the threshold for
never re-reading history text). State grows with ACCEPTED documents only
(N_BANDS rows of three longs per doc), and each trigger's cost is
proportional to the batch and its collisions — never to history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import (
    exploded_shingles_of,
    minhash_signatures_of,
    signature_bands,
)

__all__ = ["streaming_neardup_sink", "batch_neardup_filter"]


def batch_neardup_filter(
    docs: DataFrame, index_dir: str
) -> tuple[DataFrame, DataFrame]:
    """One round of the filter: returns (accepted_docs, accepted_bands).
    ``docs`` is (doc_id, text); the index at ``index_dir`` holds previously
    accepted documents' band rows (doc_id, band_id, band_key)."""
    spark = docs.sparkSession
    # the SAME shingle/minhash/band math as batch near_dup_pairs — one core,
    # so the persistent index and batch results can never drift apart
    bands = signature_bands(minhash_signatures_of(exploded_shingles_of(docs)))

    from pyspark.errors import AnalysisException

    dup_vs_history = None
    try:
        index = spark.read.parquet(index_dir)
        dup_vs_history = (
            bands.join(index, ["band_id", "band_key"])
            .select(bands.doc_id.alias("dup_id"))
            .distinct()
        )
    except AnalysisException as exc:  # first batch: no index yet
        if "PATH_NOT_FOUND" not in str(exc) and "Path does not exist" not in str(exc):
            raise

    # within-batch: earliest doc_id of a colliding band bucket wins
    a = bands.alias("a")
    b = bands.alias("b")
    dup_in_batch = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("dup_id"))
        .distinct()
    )
    dups = (
        dup_in_batch
        if dup_vs_history is None
        else dup_in_batch.unionByName(dup_vs_history).distinct()
    ).withColumnRenamed("dup_id", "doc_id")

    accepted = docs.join(dups, "doc_id", "left_anti")
    accepted_bands = bands.join(accepted.select("doc_id"), "doc_id", "left_semi")
    return accepted, accepted_bands


def streaming_neardup_sink(index_dir: str, accepted_dir: str):
    """foreachBatch function: filter each micro-batch against the index,
    append survivors to the accepted store and their bands to the index."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        accepted, accepted_bands = batch_neardup_filter(batch_df, index_dir)
        accepted.persist()
        try:
            accepted.write.mode("append").parquet(accepted_dir)
            accepted_bands.write.mode("append").parquet(index_dir)
        finally:
            accepted.unpersist()

    return apply
