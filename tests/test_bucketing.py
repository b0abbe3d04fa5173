"""Bucketed co-located join: correct results AND a shuffle-free plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamroom_bigdata_spark.sources import load_table
from streamroom_bigdata_spark.sources.bucketing import cobucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8, sort_col="o_orderkey")
    write_bucketed(
        lineitem, "b_lineitem", "o_orderkey", n_buckets=8, sort_col="o_orderkey"
    )
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_is_shuffle_free(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = cobucketed_join(spark, left, right, "o_orderkey")
    # disable broadcast so the planner must choose a merge join; bucketing
    # then removes the Exchange on both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_cobucketed_join_matches_plain(spark, sf_dir, bucketed_tables):
    left, right = bucketed_tables
    joined = cobucketed_join(spark, left, right, "o_orderkey")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    plain = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    )
    assert joined.count() == plain.count()
    got = joined.agg(F.sum("l_quantity").alias("s")).collect()[0].s
    want = plain.agg(F.sum("l_quantity").alias("s")).collect()[0].s
    assert got == want
