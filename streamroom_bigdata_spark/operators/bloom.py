"""Bloom-filter availability probe (SURVEY.md §2.3 J2, §2.10 D1).

The reference builds a Guava Bloom filter on the driver from
``distinct().collect()`` of booked room ids and probes it in a row-at-a-time
UDF (reference: processing.scala:60-74). That collect is unbounded driver
memory — the anti-pattern SURVEY.md §4.3.1 forbids. PySpark exposes neither
``df.stat.bloomFilter`` nor the ``bloom_filter_agg``/``might_contain``
expressions (Scala/JVM-only), so this module builds the same sketch
scale-safely with public APIs only:

- **build**: each partition folds its keys into one m-bit numpy bitmap
  (``mapInPandas``, vectorized double hashing); partial bitmaps are then
  OR-merged in a tree of shuffle stages (fan-in 16 per stage), so the
  driver collects at most ``fan-in`` bitmaps — O(sketch bytes) driver
  traffic regardless of input partition count, never O(partitions).
- **probe**: the finished bitmap broadcasts to executors; a vectorized
  Pandas UDF checks all k bit positions per Arrow batch.

Guarantees (property-tested): zero false negatives; false-positive rate ≈
the configured target. The exact alternative (broadcast semi-join) is what
``plans/recommend.py`` uses; this is the sketch variant for when the booked
side is too big to broadcast but fits a few MiB of bits.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit finalizer (splitmix64) — same avalanche quality
    as xxhash for integer keys, pure numpy uint64 ops."""
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64)
        x ^= x >> np.uint64(33)
        x *= _MIX1
        x ^= x >> np.uint64(33)
        x *= _MIX2
        x ^= x >> np.uint64(33)
    return x


def _positions(keys: np.ndarray, n_bits: int, n_hashes: int) -> np.ndarray:
    """(len(keys), n_hashes) bit positions via double hashing:
    pos_i = (h1 + i*h2) mod m."""
    h1 = _splitmix64(keys)
    h2 = _splitmix64(keys ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
    i = np.arange(n_hashes, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(n_bits)).astype(
            np.int64
        )


class BloomSketch:
    """An m-bit Bloom filter with k hash functions over int64 keys."""

    def __init__(self, expected_items: int, fpp: float = 0.01):
        n_bits = max(64, int(-expected_items * math.log(fpp) / (math.log(2) ** 2)))
        self.n_bits = ((n_bits + 63) // 64) * 64
        self.n_hashes = max(1, round(self.n_bits / expected_items * math.log(2)))
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _set(self, keys: np.ndarray) -> None:
        pos = _positions(keys, self.n_bits, self.n_hashes).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        pos = _positions(keys.astype(np.uint64), self.n_bits, self.n_hashes)
        bit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        return bit.all(axis=1)


_MERGE_FANIN = 16


def _or_merge(batches):
    """OR every bitmap in this partition into one — the tree-merge kernel."""
    acc = None
    for pdf in batches:
        for buf in pdf["bits"]:
            arr = np.frombuffer(buf, dtype=np.uint8)
            acc = arr.copy() if acc is None else acc | arr
    if acc is not None:
        yield pd.DataFrame({"bits": [acc.tobytes()]})


def staged_partials(
    df: DataFrame, key_col: str, expected_items: int, fpp: float = 0.01
) -> DataFrame:
    """Lazy plan producing ≤ ``_MERGE_FANIN`` partial bitmaps: one bitmap per
    input partition, then tree-OR-merged through ``repartition`` stages of
    fan-in ``_MERGE_FANIN`` until at most one stage of bitmaps remains. The
    whole tree runs executor-side in one job; the driver only ever collects
    the final ≤ fan-in rows — O(sketch bytes), independent of partition
    count (the reference collects ALL keys to the driver,
    processing.scala:66-70)."""

    def partial(batches):
        sketch = BloomSketch(expected_items, fpp)
        saw = False
        for pdf in batches:
            keys = pdf[key_col].to_numpy(dtype=np.int64).astype(np.uint64)
            if len(keys):
                sketch._set(keys)
                saw = True
        if saw:
            yield pd.DataFrame({"bits": [sketch.bits.tobytes()]})

    partials = df.select(key_col).mapInPandas(partial, "bits binary")
    n_parts = df.rdd.getNumPartitions()
    while n_parts > _MERGE_FANIN:
        n_parts = max(1, math.ceil(n_parts / _MERGE_FANIN))
        partials = partials.repartition(n_parts).mapInPandas(_or_merge, "bits binary")
    return partials


def build_bloom(
    df: DataFrame, key_col: str, expected_items: int, fpp: float = 0.01
) -> BloomSketch:
    """Distributed tree-merged build: the driver receives at most
    ``_MERGE_FANIN`` bitmaps no matter how many input partitions exist —
    O(sketch bytes) through the driver, the 100 TB-safe replacement for the
    reference's ``distinct().collect()``."""
    proto = BloomSketch(expected_items, fpp)
    n_bits, n_hashes = proto.n_bits, proto.n_hashes
    rows = staged_partials(df, key_col, expected_items, fpp).collect()
    assert len(rows) <= _MERGE_FANIN
    for row in rows:
        proto.bits |= np.frombuffer(row.bits, dtype=np.uint8)
    assert proto.n_bits == n_bits and proto.n_hashes == n_hashes
    return proto


def might_contain(spark: SparkSession, sketch: BloomSketch, key: Column) -> Column:
    """Vectorized probe column (D1): broadcast the sketch once, test every
    Arrow batch with one numpy gather — no per-row Python."""
    b = spark.sparkContext.broadcast((sketch.bits, sketch.n_bits, sketch.n_hashes))

    @F.pandas_udf("boolean")
    def probe(keys: pd.Series) -> pd.Series:
        bits, n_bits, n_hashes = b.value
        sk = object.__new__(BloomSketch)
        sk.bits, sk.n_bits, sk.n_hashes = (
            np.frombuffer(bits, dtype=np.uint8),
            n_bits,
            n_hashes,
        )
        return pd.Series(sk.contains(keys.to_numpy(dtype=np.int64)))

    return probe(key)


bloom_availability_oracle = """
SELECT p_partkey,
       CAST(CASE WHEN p_partkey IN (
              SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
            ) THEN 0.5 ELSE 1.0 END AS DOUBLE) AS availability_score
FROM part
"""


@register("bloom_availability", bloom_availability_oracle)
def bloom_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's availability check (processing.scala:106-109) with
    the sketch as a *runtime filter*: parts the Bloom probe clears are
    definitely free (no false negatives → score 1.0 with no join at all);
    only the bloom-positive remainder rides the exact semi-join, which
    corrects the sketch's false positives. The result is therefore exactly
    the semi-join availability — SQL-oracled — while the join's shuffle
    input shrinks to ~|booked|·(1+fpp) rows instead of |part|. The
    no-false-negative and FPP properties of the probe itself are asserted
    in tests/test_bloom.py."""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    booked = lineitem.filter(F.col("l_returnflag") == "R").select("l_partkey")
    # size the sketch from the data, not a constant: an undersized sketch
    # silently blows past the FPP target at larger scale factors. The
    # pre-pass is a partial-aggregated approx_count_distinct — one cheap job
    # that moves a single HLL sketch to the driver.
    approx_n = booked.agg(F.approx_count_distinct("l_partkey").alias("n")).first().n
    sketch = build_bloom(
        booked, "l_partkey", expected_items=max(1024, int(approx_n * 1.2)), fpp=0.01
    )
    flagged = part.withColumn(
        "maybe_booked", might_contain(spark, sketch, F.col("p_partkey"))
    )
    # bloom-negative rows never touch a join; bloom-positive rows (true
    # matches + ~fpp false positives) ride one left join against the
    # distinct booked keys, which corrects the false positives to 1.0
    score_pos = (
        flagged.filter(F.col("maybe_booked"))
        .join(
            booked.distinct().withColumn("hit", F.lit(1)),
            F.col("p_partkey") == F.col("l_partkey"),
            "left",
        )
        .select(
            "p_partkey",
            F.when(F.col("hit").isNotNull(), 0.5).otherwise(1.0).alias(
                "availability_score"
            ),
        )
    )
    score_neg = flagged.filter(~F.col("maybe_booked")).select(
        "p_partkey", F.lit(1.0).alias("availability_score")
    )
    return score_pos.unionByName(score_neg)


def bloom_filtered_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    fpp: float = 0.01,
    how: str = "inner",
) -> DataFrame:
    """Runtime-filter join (the shuffle reducer, SURVEY.md §4.3): when the
    small side is too big to broadcast but most big-side rows won't match,
    build a Bloom sketch of the small side's keys and pre-filter the big
    side BEFORE its shuffle. False positives only — they just ride the
    shuffle and drop in the exact join — so the result is identical to the
    plain join (asserted in tests/test_bloom.py).

    At 100 TB: the big side's shuffle shrinks by (1 − selectivity); the
    sketch costs one pass over the small side's keys plus O(sketch bytes)
    through the driver (tree-merged build above). This is the manual form
    of the row-level runtime filters Spark injects for some join shapes —
    usable on any join, including ones the optimizer won't cover.

    Only join types where dropping non-matching BIG-side rows is sound are
    accepted (inner / left_semi): pre-filtering the big side of a
    'left'/'full'/'anti' join would delete rows the join must preserve."""
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(
            f"bloom_filtered_join: how={how!r} would drop preserved-side "
            "rows; only inner/left_semi are supported"
        )
    spark = big.sparkSession
    approx_n = (
        small.agg(F.approx_count_distinct(small_key).alias("n")).first().n
    )
    sketch = build_bloom(
        small, small_key, expected_items=max(1024, int(approx_n * 1.2)), fpp=fpp
    )
    pre = big.filter(might_contain(spark, sketch, F.col(big_key)))
    return pre.join(small, pre[big_key] == small[small_key], how)
