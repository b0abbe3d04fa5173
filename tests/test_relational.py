"""Relational operator semantics (SURVEY.md §2.2-2.8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import relational, scalar, windows
from streamroom_bigdata_spark.sources import load_table


def test_pricing_summary_totals(spark, sf_dir):
    rows = relational.pricing_summary(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-09-02").cast("timestamp")
    expected_total = li.filter(F.col("l_shipdate") <= cutoff).count()
    assert sum(r.count_order for r in rows) == expected_total
    assert all(r.avg_disc <= 1.0 for r in rows)


def test_topk_matches_full_sort(spark, sf_dir):
    # TakeOrderedAndProject must equal sort-then-head (O2 property)
    topk = relational.topk_orders(spark, sf_dir).collect()
    full = (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .collect()
    )
    assert [r.o_orderkey for r in topk] == [r.o_orderkey for r in full[:10]]


def test_semi_anti_partition_customers(spark, sf_dir):
    # semi ∪ anti == all customers, disjoint (J4)
    semi = {r.c_custkey for r in relational.semi_join_active_customers(spark, sf_dir).collect()}
    anti = {r.c_custkey for r in relational.anti_join_idle_customers(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "customer").count()
    assert semi.isdisjoint(anti)
    assert len(semi) + len(anti) == total


def test_left_join_nullfill_never_null(spark, sf_dir):
    df = relational.left_join_order_counts(spark, sf_dir)
    assert df.filter(F.col("n_orders").isNull() | F.col("total_spent").isNull()).count() == 0
    assert df.count() == load_table(spark, sf_dir, "customer").count()


def test_union_flattening_plan(spark, sf_dir):
    # CombineUnions: the 3-way fold should appear as a single Union node
    df = relational.union_order_classes(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") == 1


def test_rollup_grand_total(spark, sf_dir):
    rows = relational.rollup_orders(spark, sf_dir).collect()
    grand = [r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None]
    assert len(grand) == 1
    assert grand[0].n_orders == load_table(spark, sf_dir, "orders").count()


def test_cube_row_count(spark, sf_dir):
    rows = relational.cube_lineitem(spark, sf_dir).collect()
    flags = load_table(spark, sf_dir, "lineitem").select("l_returnflag").distinct().count()
    statuses = load_table(spark, sf_dir, "lineitem").select("l_linestatus").distinct().count()
    # (flags+1) * (statuses+1) groupings, minus combos that don't exist
    assert len(rows) <= (flags + 1) * (statuses + 1)
    assert any(r.l_returnflag is None and r.l_linestatus is None for r in rows)


def test_intersect_except_disjoint(spark, sf_dir):
    inter = {r.l_partkey for r in relational.intersect_part_keys(spark, sf_dir).collect()}
    exc = {r.l_partkey for r in relational.except_part_keys(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem")
    r_keys = {
        r.l_partkey
        for r in li.filter(F.col("l_returnflag") == "R").select("l_partkey").distinct().collect()
    }
    assert inter <= r_keys
    assert exc <= r_keys


def test_approx_count_distinct_close(spark, sf_dir):
    # HLL sketch within 10% of exact (A6 sketch variant, not oracle-hashable)
    orders = load_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.approx_count_distinct("o_custkey").alias("approx"),
        F.count_distinct("o_custkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.10


def test_window_running_monotone(spark, sf_dir):
    rows = windows.running_totals(spark, sf_dir).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for recs in by_user.values():
        recs.sort(key=lambda r: (r.ts, r.event_id))
        run = 0.0
        for r in recs:
            run += r.value
            assert abs(r.running_value - run) < 1e-2


def test_normalized_usage_bounds(spark, sf_dir):
    rows = windows.normalized_usage(spark, sf_dir).collect()
    assert all(0.0 < r.collab_score <= 1.0 for r in rows)
    assert any(r.collab_score == 1.0 for r in rows)


def test_json_extraction_values(spark, sf_dir):
    rows = scalar.json_extraction(spark, sf_dir).collect()
    assert rows and all(r.sum_k >= 0 for r in rows)


def test_star_join_broadcasts_dims(spark, sf_dir):
    df = relational.star_join_revenue(spark, sf_dir)
    physical = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in physical


def test_quartiles_distributed_matches_ntile(spark, sf_dir):
    """The distributed-rank form must be bit-identical to the ntile oracle
    form, with no single-partition exchange over the input relation."""
    got = {
        r.quartile: (r.n, r.min_bal, r.max_bal)
        for r in windows.quartiles_distributed(spark, sf_dir).collect()
    }
    want = {
        r.quartile: (r.n, r.min_bal, r.max_bal)
        for r in windows.ntile_quartiles(spark, sf_dir).collect()
    }
    assert got == want
    plan = windows.quartiles_distributed(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan


def test_quantile_summary_error_bound(spark, sf_dir):
    """percentile_approx(accuracy=10k) must land within rank-error 1/10k of
    the exact per-group percentile (here: exact match is typical at fixture
    cardinality, so assert a tight value tolerance against F.percentile)."""
    from streamroom_bigdata_spark.operators.relational import quantile_summary

    approx = {r.o_orderstatus: r for r in quantile_summary(spark, sf_dir).collect()}
    exact = {
        r.o_orderstatus: r
        for r in (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_orderstatus")
            .agg(
                F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
                F.min("o_totalprice").alias("lo"),
                F.max("o_totalprice").alias("hi"),
            )
            .collect()
        )
    }
    for status, a in approx.items():
        e = exact[status]
        spread = e.hi - e.lo
        assert abs(a.p50 - e.p50) <= 0.01 * spread + 1e-6
        assert e.lo <= a.p25 <= a.p50 <= a.p75 <= a.p95 <= e.hi


def test_profile_columns_with_nulls(spark):
    from streamroom_bigdata_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [(1, None), (2, "a"), (None, "a")], "x int, y string"
    )
    got = {r.col_name: r for r in profile_columns(df, ["x", "y"]).collect()}
    assert got["x"].n_rows == 3 and got["x"].n_nulls == 1
    assert got["x"].n_distinct == 2 and got["x"].min_val == "1"
    assert got["y"].n_nulls == 1 and got["y"].n_distinct == 1
    # the unpivot itself is a zero-exchange row explosion; count_distinct
    # adds its two-phase expand, so exactly 2 hash exchanges total
    plan = (
        profile_columns(df, ["x", "y"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 2
    assert "Exchange SinglePartition" not in plan


def test_registry_driver_contract():
    """Driver contract invariants: every oracle belongs to a registered
    query, names are unique by construction, all entries callable."""
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(callable(f) for f in qs.values())
    assert len(qs) >= 80


def test_counting_median_matches_lower_percentile_definition(spark, tmp_path):
    """Domain-counting percentiles equal the brute-force lower-percentile
    (smallest value with cum ≥ p·n) on a planted skewed group."""
    from streamroom_bigdata_spark.operators.relational import counting_median

    qtys = {"A": [1, 1, 1, 5, 9, 9, 10, 10], "B": [7]}
    rows = []
    for flag, qs in qtys.items():
        rows += [(flag, float(q)) for q in qs]
    spark.createDataFrame(
        rows, "l_returnflag string, l_quantity double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    def brute(vals, num, den):
        s = sorted(vals)
        n = len(s)
        return next(v for i, v in enumerate(s) if den * (i + 1) >= num * n)

    got = {
        r.l_returnflag: (r.p25, r.p50, r.p75, r.n)
        for r in counting_median(spark, str(tmp_path)).collect()
    }
    for flag, vals in qtys.items():
        exp = (
            brute(vals, 1, 4), brute(vals, 2, 4), brute(vals, 3, 4), len(vals)
        )
        assert got[flag] == exp, (flag, got[flag], exp)


def test_rolling_revenue_range_is_calendar_bounded(spark, tmp_path):
    """RANGE frame vs rows frame: a 10-day-old order falls OUT of the
    7-day trailing sum even though it is the previous ROW, and same-day
    orders are mutual peers (both include both)."""
    from streamroom_bigdata_spark.operators.windows import (
        rolling_revenue_range,
    )
    import datetime as dt

    base = dt.datetime(1995, 1, 20)
    rows = [
        (1, 7, base - dt.timedelta(days=10), 100.0),  # outside the frame
        (2, 7, base - dt.timedelta(days=3), 10.0),    # inside
        (3, 7, base, 1.0),
        (4, 7, base, 2.0),                            # same-day peer of 3
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.o_orderkey: r.trailing_7d_revenue
        for r in rolling_revenue_range(spark, str(tmp_path)).collect()
    }
    assert got[1] == 100.0
    assert got[2] == 10.0          # the 10-day-old row is out of range
    assert got[3] == 13.0 and got[4] == 13.0  # same-day peers symmetric


# --- ABC classification (round-11) -------------------------------------------


def test_abc_integer_boundary_classes(spark, monkeypatch):
    """10 parts: one worth 80 exactly (cum share 0.8 → A, boundary
    INCLUSIVE via 5·cum <= 4·tot), then 15 spread over 3 parts reaching
    0.95 exactly (→ B), rest C."""
    import datetime as dt

    from streamroom_bigdata_spark.operators import relational

    vals = [80.0, 5.0, 5.0, 5.0] + [1.0] * 5  # total 100
    li = spark.createDataFrame(
        [
            (i + 1, i + 1, 1, 1, 1.0, v, 0.0, 0.0, "N", "O",
             dt.datetime(2024, 1, 2))
            for i, v in enumerate(vals)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.relational.load_table",
        lambda spark_, sf_, name: li,
    )
    rows = {r.abc_class: r for r in
            relational.abc_classification(spark, "x").collect()}
    assert rows["A"].n_parts == 1 and rows["A"].rev_share == 0.8
    assert rows["B"].n_parts == 3 and rows["B"].rev_share == 0.15
    assert rows["C"].n_parts == 5 and rows["C"].rev_share == 0.05


def test_fulfillment_latency_exact_percentiles(spark, monkeypatch):
    """100 lineitems with lag days 1..100 on one priority → p50=50,
    p90=90, p99=99 (lower-percentile convention), mean 50.5."""
    import datetime as dt

    from streamroom_bigdata_spark.operators import relational

    base = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [(k, 1, "O", 10.0, base, "1-URGENT") for k in range(1, 101)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (k, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
             base + dt.timedelta(days=k))
            for k in range(1, 101)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    tables = {"orders": orders, "lineitem": li}
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.relational.load_table",
        lambda spark_, sf_, name: tables[name],
    )
    r = relational.fulfillment_latency_percentiles(spark, "x").collect()[0]
    assert (r.p50, r.p90, r.p99) == (50, 90, 99)
    assert r.n_items == 100
    assert abs(r.mean_days - 50.5) < 1e-9
