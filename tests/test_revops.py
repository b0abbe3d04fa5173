"""Revenue-ops wave (RFM, attribution, LTV, sequences, skyline,
reconciliation, compaction planner) — planted-data checks beyond the DuckDB
oracle equivalence, plus the plan-shape guards the 100 TB design relies on."""

from __future__ import annotations

import datetime as dt

import pytest

from streamroom_bigdata_spark import registry
from streamroom_bigdata_spark.operators import layout, revops


def _patch(monkeypatch, module, tables: dict):
    monkeypatch.setattr(
        f"streamroom_bigdata_spark.operators.{module}.load_table",
        lambda spark_, sf_, name: tables[name],
    )


def _orders(spark, rows):
    """rows: (orderkey, custkey, totalprice, date)"""
    return spark.createDataFrame(
        [(ok, c, "O", float(p), d, "1-URGENT") for ok, c, p, d in rows],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, ts, value)"""
    return spark.createDataFrame(
        [(e, t, u, ty, float(v), "{}") for e, u, ty, t, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


# --- RFM segmentation -------------------------------------------------------


def test_rfm_planted_quartile_scores(spark, monkeypatch):
    """Customer k has k orders of 100 each, last on day 10k: recency
    quartiles over [0,10,20,30] are (7.5,15,22.5), frequency/monetary over
    [1..4]/[100..400] are (1.75,2.5,3.25)-shaped — so customer k scores
    exactly (k,k,k)."""
    base = dt.datetime(2024, 1, 1)
    rows, ok = [], 0
    for cust in (1, 2, 3, 4):
        for j in range(cust):
            ok += 1
            # j-th order 1 day apart; LAST order lands on day 10*cust
            rows.append((ok, cust, 100.0, base + dt.timedelta(days=10 * cust - j)))
    _patch(monkeypatch, "revops", {"orders": _orders(spark, rows)})
    got = {
        (r.r_score, r.f_score, r.m_score): (r.segment, r.n_customers, r.avg_monetary)
        for r in revops.rfm_segments(spark, "ignored").collect()
    }
    assert got == {
        (1, 1, 1): ("hibernating", 1, 100.0),
        (2, 2, 2): ("hibernating", 1, 200.0),
        (3, 3, 3): ("champion", 1, 300.0),
        (4, 4, 4): ("champion", 1, 400.0),
    }


def test_rfm_plan_has_no_window(spark, sf_dir):
    """The quartile scoring must ride 1-row broadcast aggregates — an
    ntile re-spelling would reintroduce the unpartitioned-window funnel."""
    plan = (
        registry.queries()["rfm_segments"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window [" not in plan


# --- Multi-touch attribution ------------------------------------------------


def test_attribution_planted_weights(spark, monkeypatch):
    """3 touches (click, view, click) before a 10.0 purchase: linear
    10/3 each; U-shaped 4.0 first + 2.0 middle + 4.0 last. A touch 8 days
    old and a touch-less purchase contribute nothing."""
    base = dt.datetime(2024, 1, 10)
    ev = _events(
        spark,
        [
            (1, 1, "click", base - dt.timedelta(days=8), 0.0),  # outside 7d
            (2, 1, "click", base - dt.timedelta(days=3), 0.0),
            (3, 1, "view", base - dt.timedelta(days=2), 0.0),
            (4, 1, "click", base - dt.timedelta(days=1), 0.0),
            (5, 1, "purchase", base, 10.0),
            (6, 2, "purchase", base, 99.0),  # no touches → dropped
        ],
    )
    _patch(monkeypatch, "revops", {"events": ev})
    got = {
        r.touch_type: (r.n_touches, r.credit_linear, r.credit_u)
        for r in revops.multi_touch_attribution(spark, "ignored").collect()
    }
    assert got == {
        "click": (2, round(20 / 3, 4), 8.0),
        "view": (1, round(10 / 3, 4), 2.0),
    }


def test_attribution_single_touch_full_credit(spark, monkeypatch):
    ev = _events(
        spark,
        [
            (1, 1, "view", dt.datetime(2024, 1, 9), 0.0),
            (2, 1, "purchase", dt.datetime(2024, 1, 10), 7.5),
        ],
    )
    _patch(monkeypatch, "revops", {"events": ev})
    [r] = revops.multi_touch_attribution(spark, "ignored").collect()
    assert (r.touch_type, r.n_touches, r.credit_linear, r.credit_u) == (
        "view", 1, 7.5, 7.5,
    )


def test_attribution_plan_pushes_filters_no_global_funnel(spark, sf_dir):
    plan = (
        registry.queries()["multi_touch_attribution"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "Exchange SinglePartition" not in plan


# --- LTV cohort curve --------------------------------------------------------


def test_ltv_planted_cumulative(spark, monkeypatch):
    """cust1: Jan(100) + Mar(50) → cohort 202401 ages 0,2 cum 100,150;
    cust2: Feb(200) → cohort 202402 age 0 cum 200."""
    rows = [
        (1, 1, 100.0, dt.datetime(2024, 1, 5)),
        (2, 1, 50.0, dt.datetime(2024, 3, 20)),
        (3, 2, 200.0, dt.datetime(2024, 2, 1)),
    ]
    _patch(monkeypatch, "revops", {"orders": _orders(spark, rows)})
    got = {
        (r.cohort_ym, r.age_months): (r.n_orders, r.cum_revenue, r.ltv_per_customer)
        for r in revops.ltv_cohort_curve(spark, "ignored").collect()
    }
    assert got == {
        (202401, 0): (1, 100.0, 100.0),
        (202401, 2): (1, 150.0, 150.0),
        (202402, 0): (1, 200.0, 200.0),
    }


def test_ltv_half_cent_division_is_exact(spark, monkeypatch):
    """Two customers in one cohort, cum at an odd cent count: 100.01+100.00
    → 200.01, /2 = 100.005 — the exact-integer half-up path must yield
    100.01 (not the binary-double 100.00)."""
    rows = [
        (1, 1, 100.01, dt.datetime(2024, 1, 5)),
        (2, 2, 100.00, dt.datetime(2024, 1, 6)),
    ]
    _patch(monkeypatch, "revops", {"orders": _orders(spark, rows)})
    [r] = revops.ltv_cohort_curve(spark, "ignored").collect()
    assert (r.cum_revenue, r.ltv_per_customer) == (200.01, 100.01)


# --- Frequent event sequences -------------------------------------------------


def test_sequences_planted_trigrams(spark, monkeypatch):
    ev = _events(
        spark,
        [
            (1, 1, "a", dt.datetime(2024, 1, 1, 0), 0.0),
            (2, 1, "b", dt.datetime(2024, 1, 1, 1), 0.0),
            (3, 1, "c", dt.datetime(2024, 1, 1, 2), 0.0),
            (4, 1, "d", dt.datetime(2024, 1, 1, 3), 0.0),
            (5, 2, "a", dt.datetime(2024, 1, 1, 0), 0.0),
            (6, 2, "b", dt.datetime(2024, 1, 1, 1), 0.0),
            (7, 2, "c", dt.datetime(2024, 1, 1, 2), 0.0),
        ],
    )
    _patch(monkeypatch, "revops", {"events": ev})
    rows = revops.frequent_event_sequences(spark, "ignored").collect()
    assert [(r.seq, r.n) for r in rows] == [("a>b>c", 2), ("b>c>d", 1)]


def test_sequences_plan_is_distributed_topk(spark, sf_dir):
    plan = (
        registry.queries()["frequent_event_sequences"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# --- Pareto frontier (skyline) ------------------------------------------------


def test_pareto_planted_frontier(spark, monkeypatch):
    parts = spark.createDataFrame(
        [
            (1, 1, 10.0),
            (2, 2, 5.0),
            (3, 2, 7.0),   # dominated: not cheapest at size 2
            (4, 3, 5.0),   # dominated: (3,4) is cheaper at same size
            (5, 3, 4.0),
            (6, 4, 4.0),   # dominated by (3,4.0): smaller size, equal price
            (7, 5, 3.0),   # duplicate pair: both non-dominated
            (8, 5, 3.0),
        ],
        "p_partkey long, p_size int, p_retailprice double",
    ).selectExpr(
        "p_partkey", "'n' AS p_name", "'b' AS p_brand", "'t' AS p_type",
        "p_size", "p_retailprice",
    )
    _patch(monkeypatch, "revops", {"part": parts})
    keys = sorted(
        r.p_partkey
        for r in revops.pareto_frontier_parts(spark, "ignored").collect()
    )
    assert keys == [1, 2, 5, 7, 8]


def test_pareto_plan_no_cartesian_over_catalog(spark, sf_dir):
    """The skyline must NOT be the naive all-pairs anti-join: the only
    non-equi join allowed is the size-domain triangle (≤ |sizes|² rows)."""
    plan = (
        registry.queries()["pareto_frontier_parts"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # catalog ⋈ bounded dims


# --- Order ledger reconciliation -----------------------------------------------


def test_reconcile_planted_classes(spark, monkeypatch):
    base = dt.datetime(2024, 1, 1)
    orders = _orders(
        spark,
        [
            (1, 1, 100.0, base),  # computed 100 → close (rel 0)
            (2, 1, 100.0, base),  # computed 60 → drift (rel .4)
            (3, 1, 100.0, base),  # computed 10 → large (rel .9)
            (4, 1, 100.0, base),  # computed 300 → severe (rel 2)
            (5, 1, 100.0, base),  # no lineitems
        ],
    )
    li_rows = [
        (1, 50.0), (1, 50.0), (2, 60.0), (3, 10.0), (4, 300.0),
        (99, 5.0),  # orphan
    ]
    lineitem = spark.createDataFrame(
        [
            (ok, 1, 1, i, 1.0, float(p), 0.0, 0.0, "N", "O", base)
            for i, (ok, p) in enumerate(li_rows)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    _patch(monkeypatch, "revops", {"orders": orders, "lineitem": lineitem})
    got = {
        r.status: (r.n_orders, r.median_rel_diff, r.max_rel_diff)
        for r in revops.order_price_reconcile(spark, "ignored").collect()
    }
    assert got == {
        "close": (1, 0.0, 0.0),
        "drift": (1, 0.4, 0.4),
        "large": (1, 0.9, 0.9),
        "severe": (1, 2.0, 2.0),
        "no_lineitems": (1, None, None),
        "orphan_lineitems": (1, None, None),
    }


# --- Compaction planner ---------------------------------------------------------


def test_compaction_planted_bins(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(i, "x", "en", "s", 10_000) for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.layout.load_table",
        lambda spark_, sf_, name: {"documents": docs}[name],
    )
    got = {
        (r.lang, r.batch_id, r.bin_id): (r.n_docs, r.bin_chars, r.fill_ratio)
        for r in layout.compaction_bins(spark, "ignored").collect()
    }
    # cum 10k/20k/30k/40k, start offsets 0/10k/20k/30k, target 16384
    assert got == {
        ("en", 0, 0): (2, 20_000, round(20_000 / 16_384, 4)),
        ("en", 0, 1): (2, 20_000, round(20_000 / 16_384, 4)),
    }


def test_compaction_bins_never_split_documents(spark, monkeypatch):
    """A document larger than the target still lands in exactly one bin."""
    docs = spark.createDataFrame(
        [(0, "x", "en", "s", 50_000), (1, "x", "en", "s", 100)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.layout.load_table",
        lambda spark_, sf_, name: {"documents": docs}[name],
    )
    rows = layout.compaction_bins(spark, "ignored").collect()
    assert sum(r.n_docs for r in rows) == 2
    assert sum(r.bin_chars for r in rows) == 50_100


def test_compaction_plan_single_data_shuffle(spark, sf_dir):
    """Window and final aggregate share the (lang, batch) partitioning —
    one data-sized exchange, nothing single-partition."""
    plan = (
        registry.queries()["compaction_bins"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange SinglePartition" not in plan


# --- Price elasticity -----------------------------------------------------------


def test_elasticity_planted_slope(spark, monkeypatch):
    """q = p^-2 exactly (constant elasticity -2): ln q = -2 ln p, so the
    log-log slope must be -2.0 with R² = 1."""
    import math

    rows = []
    for i, p in enumerate((1.0, 2.0, 4.0, 8.0)):
        q = p ** -2
        # l_extendedprice = unit price * quantity
        rows.append((i, 1, 1, 1, q, p * q, 0.0, 0.0, "N", "O",
                     dt.datetime(2024, 1, 1)))
    lineitem = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(1, "n", "BRAND#1", "t", 1, 1.0)],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    _patch(monkeypatch, "revops", {"lineitem": lineitem, "part": part})
    [r] = revops.price_elasticity_brand(spark, "ignored").collect()
    assert (r.p_brand, r.n) == ("BRAND#1", 4)
    assert r.elasticity == pytest.approx(-2.0)
    assert r.r2 == pytest.approx(1.0)


def test_elasticity_plan_single_shuffle(spark, sf_dir):
    plan = (
        registry.queries()["price_elasticity_brand"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(
        [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    ) == 1
    assert "BroadcastHashJoin" in plan


# --- Seasonal-naive backtest -------------------------------------------------------


def test_backtest_planted_metrics(spark, monkeypatch):
    """Days 1-7 revenue 100; days 8-14 revenue 110 → every paired day has
    |err| = 10, APE = 10/110: MAE 10, MAPE = SMAPE-ish = exact."""
    from streamroom_bigdata_spark.operators import timeseries

    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(14):
        rev = 100.0 if d < 7 else 110.0
        rows.append((d, 1, rev, base + dt.timedelta(days=d)))
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.timeseries.load_table",
        lambda spark_, sf_, name: {"orders": _orders(spark, rows)}[name],
    )
    [r] = timeseries.seasonal_naive_backtest(spark, "ignored").collect()
    assert r.n_days == 7
    assert r.mae == pytest.approx(10.0)
    assert r.mape == pytest.approx(10 / 110)
    assert r.smape == pytest.approx(2 * 10 / (110 + 100))
    assert r.medape == pytest.approx(10 / 110)


def test_backtest_skips_gapped_days(spark, monkeypatch):
    """A day whose d-7 ancestor is missing must be EXCLUDED, not paired
    with the wrong lag (the mom_revenue_growth gap lesson)."""
    from streamroom_bigdata_spark.operators import timeseries

    base = dt.datetime(2024, 1, 1)
    # day 0 and day 7 exist → 1 pair; day 9 exists but day 2 doesn't
    rows = [
        (1, 1, 100.0, base),
        (2, 1, 105.0, base + dt.timedelta(days=7)),
        (3, 1, 999.0, base + dt.timedelta(days=9)),
    ]
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.timeseries.load_table",
        lambda spark_, sf_, name: {"orders": _orders(spark, rows)}[name],
    )
    [r] = timeseries.seasonal_naive_backtest(spark, "ignored").collect()
    assert r.n_days == 1
    assert r.mae == pytest.approx(5.0)
