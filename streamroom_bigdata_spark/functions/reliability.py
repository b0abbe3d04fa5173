"""Shared materialization strategy for iterative operators.

Every iterative loop in the repo (connected components, pagerank, k-core,
label propagation, the triangle/LCC edge tables, LSH band counting)
truncates lineage each round so Catalyst never re-plans a growing chain.
HOW it truncates is a reliability decision this module centralizes:

- ``checkpoint_dir=None`` (default): ``localCheckpoint`` — executor-local
  blocks, zero external storage, the right call on local[32] and for
  runs where a retry-from-scratch is acceptable.
- ``checkpoint_dir=<path>``: RELIABLE ``df.checkpoint()`` into that
  directory — the per-round state survives executor loss, which is the
  contract a 1000-executor cluster needs (one lost executor must not
  abort round 7 of an 8-round pagerank over 100 TB).

Measured cost of reliable mode (connected_components, sf0.1, interleaved
A/B warm medians): 1.39 s vs 1.37 s local — noise, because every
per-round table in these loops is output-sized (labels, ranks, peeled
edges), not corpus-sized; the write cost follows the small table.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def make_checkpointer(
    spark: SparkSession, checkpoint_dir: str | None
) -> Callable[..., DataFrame]:
    """Return ``ckpt(df, eager=True)`` implementing the strategy above.

    Setting the SparkContext checkpoint dir is idempotent and scoped to
    the session; callers pass the returned function down their round
    loops so the local/reliable decision is made exactly once."""
    if checkpoint_dir is not None:
        spark.sparkContext.setCheckpointDir(checkpoint_dir)

    def ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
        if checkpoint_dir is not None:
            return df.checkpoint(eager=eager)
        return df.localCheckpoint(eager=eager)

    return ckpt
