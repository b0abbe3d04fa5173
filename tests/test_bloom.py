"""Bloom sketch properties (J2/D1): no false negatives, FPP near target,
agreement with the exact semi-join on the availability query."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators.bloom import (
    _MERGE_FANIN,
    BloomSketch,
    bloom_availability,
    build_bloom,
    might_contain,
    staged_partials,
)
from streamroom_bigdata_spark.sources import load_table


def test_no_false_negatives_numpy():
    sk = BloomSketch(expected_items=10_000, fpp=0.01)
    members = np.arange(0, 10_000, dtype=np.uint64) * np.uint64(7919)
    sk._set(members)
    assert sk.contains(members.astype(np.int64)).all()


def test_fpp_near_target_numpy():
    sk = BloomSketch(expected_items=10_000, fpp=0.01)
    members = np.arange(10_000, dtype=np.uint64)
    sk._set(members)
    non_members = np.arange(1_000_000, 1_100_000, dtype=np.int64)
    fp_rate = sk.contains(non_members).mean()
    assert fp_rate < 0.03  # target 0.01, generous bound for hash variance


def test_distributed_build_matches_local(spark):
    df = spark.range(0, 5_000).select(F.col("id").alias("k")).repartition(8)
    sketch = build_bloom(df, "k", expected_items=5_000, fpp=0.01)
    local = BloomSketch(expected_items=5_000, fpp=0.01)
    local._set(np.arange(5_000, dtype=np.uint64))
    assert np.array_equal(sketch.bits, local.bits)


def test_tree_merge_bounds_driver_traffic(spark):
    """Scale defect fix (VERDICT r1 #1): with many input partitions the
    driver must collect at most _MERGE_FANIN bitmaps — the tree OR-merges
    the rest executor-side — and the merged sketch must still be exact."""
    n_parts = 100  # > _MERGE_FANIN, forces at least one merge stage
    df = spark.range(0, 5_000).select(F.col("id").alias("k")).repartition(n_parts)
    partials = staged_partials(df, "k", expected_items=5_000, fpp=0.01)
    assert partials.count() <= _MERGE_FANIN
    sketch = build_bloom(df, "k", expected_items=5_000, fpp=0.01)
    local = BloomSketch(expected_items=5_000, fpp=0.01)
    local._set(np.arange(5_000, dtype=np.uint64))
    assert np.array_equal(sketch.bits, local.bits)


def test_probe_column_no_false_negatives(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    booked = lineitem.filter(F.col("l_returnflag") == "R").select("l_partkey")
    sketch = build_bloom(booked, "l_partkey", expected_items=100_000, fpp=0.01)
    flagged = booked.distinct().withColumn(
        "hit", might_contain(spark, sketch, F.col("l_partkey"))
    )
    assert flagged.filter(~F.col("hit")).count() == 0


def test_bloom_availability_vs_exact(spark, sf_dir):
    """Every part the exact semi-join calls booked must score 0.5 under the
    sketch; sketch-only 0.5s are false positives, bounded by FPP."""
    got = {
        r.p_partkey: r.availability_score
        for r in bloom_availability(spark, sf_dir).collect()
    }
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    truly_booked = {
        r.l_partkey
        for r in lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_partkey")
        .distinct()
        .collect()
    }
    n_parts = part.count()
    false_pos = 0
    for pk, score in got.items():
        if pk in truly_booked:
            assert score == 0.5  # no false negatives, ever
        elif score == 0.5:
            false_pos += 1
    assert false_pos / max(1, n_parts - len(truly_booked)) < 0.05


def test_bloom_filtered_join_equals_plain_join(spark, sf_dir):
    """The runtime-filter join must be result-identical to the plain join
    (false positives survive the pre-filter but drop in the exact join)."""
    from streamroom_bigdata_spark.operators.bloom import bloom_filtered_join
    from streamroom_bigdata_spark.sources import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # a selective small side: high-priority orders only
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_totalprice")
    )
    got = bloom_filtered_join(li, orders, "l_orderkey", "o_orderkey")
    plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
    assert got.count() == plain.count()
    h = lambda df: df.select(
        F.sum(F.hash("l_orderkey", "l_partkey", "o_totalprice")).alias("h")
    ).collect()[0].h
    assert h(got) == h(plain)
