"""Salting helpers must be result-identical to their unsalted forms."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamroom_bigdata_spark.functions.skew import salted_count, salted_join_left
from streamroom_bigdata_spark.sources import load_table


def test_salted_count_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r.l_partkey: r.cnt
        for r in li.groupBy("l_partkey").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {r.l_partkey: r.cnt for r in salted_count(li, "l_partkey").collect()}
    assert salted == plain


def test_salted_count_hot_key(spark):
    # one key holds 90% of rows — the pathological case salting exists for
    rows = [(0, i) for i in range(9000)] + [(k, 0) for k in range(1, 1001)]
    df = spark.createDataFrame(rows, "k int, v int")
    got = {r.k: r.cnt for r in salted_count(df, "k", n_salts=32).collect()}
    assert got[0] == 9000
    assert all(got[k] == 1 for k in range(1, 1001))


def test_salted_join_matches_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    small = customer.withColumnRenamed("c_custkey", "o_custkey")
    plain = orders.join(small, "o_custkey")
    salted = salted_join_left(orders, small, "o_custkey")
    assert salted.count() == plain.count()
    assert (
        salted.select(F.sum(F.hash("o_orderkey", "c_name")).alias("h")).collect()[0].h
        == plain.select(F.sum(F.hash("o_orderkey", "c_name")).alias("h")).collect()[0].h
    )


def test_salt_deterministic_and_bounded(spark):
    """The salt must be content-derived: identical across recomputation
    (task-retry safety, SPARK-23207 class) and always in [0, n_salts)."""
    from streamroom_bigdata_spark.functions.skew import with_salt

    df = spark.range(0, 1000).withColumn("v", F.col("id") % 7)
    s1 = {r.id: r._salt for r in with_salt(df, 16).collect()}
    s2 = {r.id: r._salt for r in with_salt(df, 16).collect()}
    assert s1 == s2
    assert all(0 <= s < 16 for s in s1.values())
    assert len(set(s1.values())) > 4  # actually spreads


def test_detect_hot_keys_finds_planted_key(spark):
    from streamroom_bigdata_spark.functions.skew import detect_hot_keys

    # key 7 holds 60% of 200k rows; everything else is uniform
    df = spark.range(0, 200_000).select(
        F.when(F.col("id") % 10 < 6, F.lit(7))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(5_000)) + 100)
        .alias("k")
    )
    hot = detect_hot_keys(df, "k", sample_fraction=0.05, min_sampled=1_000)
    assert hot == [7]


def test_with_hot_salt_salts_only_hot_keys(spark):
    from streamroom_bigdata_spark.functions.skew import with_hot_salt

    df = spark.range(0, 5_000).select(
        (F.col("id") % 10).alias("k"), F.col("id").alias("v")
    )
    out = with_hot_salt(df, "k", [3], 8).collect()
    hot_salts = {r._salt for r in out if r.k == 3}
    cold_salts = {r._salt for r in out if r.k != 3}
    assert cold_salts == {0}
    assert len(hot_salts) > 2  # the hot key actually spreads
    assert all(0 <= s < 8 for s in hot_salts)


def test_salted_join_hot_list_matches_plain(spark, sf_dir):
    """hot-list variant: same rows as the plain join, with the small side
    replicated only for the hot keys."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    small = customer.withColumnRenamed("c_custkey", "o_custkey")
    hot = [r.o_custkey for r in orders.groupBy("o_custkey").count()
           .orderBy(F.desc("count")).limit(3).collect()]
    plain = orders.join(small, "o_custkey")
    salted = salted_join_left(orders, small, "o_custkey", n_salts=4, hot=hot)
    assert salted.count() == plain.count()
    assert (
        salted.select(F.sum(F.hash("o_orderkey", "c_name")).alias("h")).collect()[0].h
        == plain.select(F.sum(F.hash("o_orderkey", "c_name")).alias("h")).collect()[0].h
    )


def test_with_hot_salt_empty_hot_list(spark):
    from streamroom_bigdata_spark.functions.skew import with_hot_salt

    df = spark.range(0, 100).select((F.col("id") % 5).alias("k"))
    out = with_hot_salt(df, "k", [], 8).collect()
    assert {r._salt for r in out} == {0}
