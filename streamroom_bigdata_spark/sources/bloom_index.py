"""Per-file Bloom sidecar index for point-lookup file skipping.

Parquet footer min/max stats prune range predicates (maintenance.py layout
writers), but a point lookup on a high-cardinality key still opens every
file whose [min, max] straddles the value. The missing metadata is a
per-file membership sketch — what Delta's Bloom index / Iceberg puffin
files store. Minimum viable form:

- ``build_bloom_sidecars``: one Bloom sketch per data file, built
  distributed (groupBy file → vectorized sketch in ``applyInPandas``),
  written as a tiny parquet table under ``<table>/_bloom/<col>/``.
  Underscore-prefixed dirs are invisible to Spark's file index, so normal
  table reads are unaffected.
- ``bloom_pruned_read``: load the sidecar table (O(files) rows of sketch
  bytes — metadata-sized), test the probe values against each file's
  sketch on the driver, and read ONLY the candidate files, re-applying the
  exact predicate. Bloom zero-false-negative ⇒ result identical to the
  full scan; false positives only cost extra file opens (≈ fpp per file).

At 100 TB / 128 MiB files that is ~800k sketch rows — the same listing
scale the read already pays — against opening 800k files for one key.
Sketches key on int64 columns (hash strings to int64 first if needed).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloom import BloomSketch

_SIDE_SCHEMA = "file string, n_bits long, n_hashes int, bits binary"


def _sidecar_dir(table_dir: str, col: str) -> str:
    return f"{table_dir}/_bloom/{col}"


def build_bloom_sidecars(
    spark: SparkSession, table_dir: str, col: str, fpp: float = 0.01
) -> int:
    """Build one Bloom sketch per data file of ``table_dir`` over int64
    column ``col``; returns the number of files indexed. Each sketch is
    sized to its own file's row count (files are ≤ maxPartitionBytes, so a
    group is one task's worth of one column — bounded memory)."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        # belt-and-braces: NULL keys arrive as NaN in a float64 column and
        # would corrupt (or throw on) the uint64 cast; the scan below
        # already filters them, but a sketch must never be built over NaN
        keys = pdf["k"].dropna()
        sk = BloomSketch(max(1, len(keys)), fpp)
        sk._set(keys.to_numpy(np.int64).astype(np.uint64))
        return pd.DataFrame(
            {
                "file": [pdf["f"].iloc[0]],
                "n_bits": [sk.n_bits],
                "n_hashes": [sk.n_hashes],
                "bits": [sk.bits.tobytes()],
            }
        )

    # NULL keys are never probe-able (point predicates are null-rejecting:
    # NULL = v and NULL IN (...) are both never true), so drop them before
    # sketching; a file of only NULL keys simply gets no sidecar row and is
    # correctly pruned from every lookup.
    rows = spark.read.parquet(table_dir).select(
        F.input_file_name().alias("f"), F.col(col).cast("long").alias("k")
    ).filter(F.col("k").isNotNull())
    sketches = rows.groupBy("f").applyInPandas(build, _SIDE_SCHEMA)
    dst = _sidecar_dir(table_dir, col)
    sketches.write.mode("overwrite").parquet(dst)
    return spark.read.parquet(dst).count()


def bloom_pruned_read(
    spark: SparkSession, table_dir: str, col: str, values: list[int]
) -> DataFrame:
    """Point lookup ``col IN values`` reading only files whose sketch says
    a probe value might be present. Exact: the predicate is re-applied
    after the pruned scan, and Bloom filters have no false negatives."""
    probe = np.asarray(values, dtype=np.int64).astype(np.uint64)
    keep = []
    for r in spark.read.parquet(_sidecar_dir(table_dir, col)).collect():
        sk = BloomSketch.__new__(BloomSketch)
        sk.n_bits, sk.n_hashes = r.n_bits, r.n_hashes
        sk.bits = np.frombuffer(bytes(r.bits), dtype=np.uint8)
        if sk.contains(probe).any():
            keep.append(r.file)
    pred = F.col(col).isin([int(v) for v in values])
    if not keep:
        # provably no file can contain any probe value
        return spark.read.parquet(table_dir).filter(F.lit(False))
    return spark.read.parquet(*keep).filter(pred)
