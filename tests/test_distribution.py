"""Distribution/concentration operators (Welch t, KS, Theil-Sen, ACF,
Spearman, entropy, Gini, HHI, lexical diversity) — planted-data checks
beyond the DuckDB oracle equivalence."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from streamroom_bigdata_spark.operators import distribution


def _patch_tables(monkeypatch, tables: dict):
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.distribution.load_table",
        lambda spark_, sf_, name: tables[name],
    )


def _events(spark, rows):
    """rows: (event_type, hour, value)"""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1 + i % 3, h), i, t, float(v), "{}")
            for i, (t, h, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _orders(spark, rows):
    """rows: (custkey, priority, totalprice, day)"""
    return spark.createDataFrame(
        [
            (i, c, "O", float(p), dt.datetime(2024, 1, 1) + dt.timedelta(days=d), pr)
            for i, (c, pr, p, d) in enumerate(rows)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


# --- Welch t ---------------------------------------------------------------


def test_welch_t_planted_groups(spark, monkeypatch):
    """A=[10,12,14] (m=12, s²=4), B=[1,2,3] (m=2, s²=1):
    t = 10/√(4/3+1/3) = 7.745967, Welch df = (5/3)²/((16/9)/2+(1/9)/2)."""
    ev = _events(
        spark,
        [("purchase", 0, v) for v in (10, 12, 14)]
        + [("click", 0, v) for v in (1, 2, 3)]
        + [("view", 0, 999)],  # excluded arm
    )
    _patch_tables(monkeypatch, {"events": ev})
    r = distribution.welch_t_test(spark, "ignored").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.mean_a == 12.0 and r.mean_b == 2.0
    assert r.t_stat == pytest.approx(10.0 / math.sqrt(5.0 / 3.0), abs=1e-6)
    df = (5.0 / 3.0) ** 2 / ((4.0 / 3.0) ** 2 / 2 + (1.0 / 3.0) ** 2 / 2)
    assert r.df_welch == pytest.approx(df, abs=0.01)


# --- KS two-sample ---------------------------------------------------------


def test_ks_planted_distributions(spark, monkeypatch):
    """A={1,2,3}, B={3,4,5}: D = |F_a - F_b| peaks at 2/3 (v=2 and v=3)."""
    od = _orders(
        spark,
        [(1, "1-URGENT", p, 0) for p in (1, 2, 3)]
        + [(1, "5-LOW", p, 0) for p in (3, 4, 5)]
        + [(1, "3-MEDIUM", 100, 0)],  # excluded class
    )
    _patch_tables(monkeypatch, {"orders": od})
    r = distribution.ks_two_sample_price(spark, "ignored").collect()[0]
    assert (r.n_a, r.n_b) == (3, 3)
    assert r.ks_stat == pytest.approx(2.0 / 3.0, abs=1e-6)


def test_ks_identical_distributions_zero(spark, monkeypatch):
    od = _orders(
        spark,
        [(1, "1-URGENT", p, 0) for p in (5, 6, 7)]
        + [(1, "5-LOW", p, 0) for p in (5, 6, 7)],
    )
    _patch_tables(monkeypatch, {"orders": od})
    r = distribution.ks_two_sample_price(spark, "ignored").collect()[0]
    assert r.ks_stat == 0.0


# --- Theil-Sen -------------------------------------------------------------


def test_theil_sen_ignores_outlier_day(spark, monkeypatch):
    """rev = 10·day for days 1..9 plus one wild day-10 outlier: the median
    pairwise slope stays 10 where OLS would be dragged up."""
    od = _orders(
        spark,
        [(1, "1-URGENT", 10 * d, d) for d in range(1, 10)]
        + [(1, "1-URGENT", 100000, 10)],
    )
    _patch_tables(monkeypatch, {"orders": od})
    r = distribution.theil_sen_daily_trend(spark, "ignored").collect()[0]
    assert r.n_days == 10
    assert r.n_pairs == 45
    assert r.ts_slope_per_day == pytest.approx(10.0, abs=1e-6)


# --- ACF -------------------------------------------------------------------


def test_acf_planted_ramp(spark, monkeypatch):
    """x = 1..5 on days 0..4: mean 3, SS 10; lag-1 autocovariance sum 4,
    lag-2 sum -1 → acf(1)=0.4, acf(2)=-0.1 (textbook ramp values)."""
    od = _orders(spark, [(1, "1-URGENT", v, v - 1) for v in range(1, 6)])
    _patch_tables(monkeypatch, {"orders": od})
    rows = {r.lag: r for r in distribution.acf_daily_revenue(spark, "ignored").collect()}
    assert rows[1].n_pairs == 4 and rows[1].acf == pytest.approx(0.4, abs=1e-6)
    assert rows[2].n_pairs == 3 and rows[2].acf == pytest.approx(-0.1, abs=1e-6)
    assert 5 not in rows  # no pairs at lags beyond the span


# --- Spearman --------------------------------------------------------------


def test_spearman_monotone_is_one(spark, monkeypatch):
    """Daily revenue strictly increasing with order count → ρ = 1 even
    though the relation is nonlinear (revenue = count³)."""
    od = _orders(
        spark,
        [
            (c, "1-URGENT", (d + 1) ** 3 * 100.0 / (d + 1), d)
            for d in range(6)
            for c in range(d + 1)
        ],
    )
    _patch_tables(monkeypatch, {"orders": od})
    r = distribution.spearman_daily_corr(spark, "ignored").collect()[0]
    assert r.n_days == 6
    assert r.spearman_rho == pytest.approx(1.0, abs=1e-6)


# --- entropy ---------------------------------------------------------------


def test_entropy_concentrated_vs_uniform(spark, monkeypatch):
    ev = _events(
        spark,
        [("signup", 5, 1.0)] * 8  # all in one hour → entropy 0
        + [("view", h, 1.0) for h in (0, 6, 12, 18) for _ in range(2)],  # uniform/4
    )
    _patch_tables(monkeypatch, {"events": ev})
    rows = {r.event_type: r for r in distribution.entropy_hour_profile(spark, "ignored").collect()}
    assert rows["signup"].entropy_nats == 0.0
    assert rows["signup"].norm_entropy == 0.0
    assert rows["view"].n_hours == 4
    assert rows["view"].entropy_nats == pytest.approx(math.log(4), abs=1e-6)
    assert rows["view"].norm_entropy == pytest.approx(
        math.log(4) / math.log(24), abs=1e-6
    )


# --- Gini ------------------------------------------------------------------


def _customers(spark, rows):
    """rows: (custkey, segment)"""
    return spark.createDataFrame(
        [(c, f"Customer#{c}", 0, 0.0, seg) for c, seg in rows],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )


def test_gini_equal_and_skewed(spark, monkeypatch):
    """Equal revenues → G = 0; two customers at 1 vs 99 → G = 0.49."""
    od = _orders(
        spark,
        [(c, "1-URGENT", 50.0, 0) for c in (1, 2, 3, 4)]
        + [(5, "1-URGENT", 1.0, 0), (6, "1-URGENT", 99.0, 0)],
    )
    cust = _customers(
        spark, [(c, "EVEN") for c in (1, 2, 3, 4)] + [(5, "SKEW"), (6, "SKEW")]
    )
    _patch_tables(monkeypatch, {"orders": od, "customer": cust})
    rows = {r.segment: r for r in distribution.gini_customer_revenue(spark, "ignored").collect()}
    assert rows["EVEN"].gini == 0.0
    assert rows["SKEW"].n_customers == 2
    assert rows["SKEW"].gini == pytest.approx(0.49, abs=1e-6)


# --- HHI -------------------------------------------------------------------


def test_hhi_monopoly_and_duopoly(spark, monkeypatch):
    li = spark.createDataFrame(
        [
            (1, 1, 10, 1, 1.0, 100.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
            (2, 1, 20, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
            (3, 1, 21, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 1)),
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )
    supp = spark.createDataFrame(
        [(10, "S10", 0, 0.0), (20, "S20", 1, 0.0), (21, "S21", 1, 0.0)],
        "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
    )
    nat = spark.createDataFrame(
        [(0, "MONO", 0), (1, "DUO", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    _patch_tables(monkeypatch, {"lineitem": li, "supplier": supp, "nation": nat})
    rows = {r.nation: r for r in distribution.hhi_supplier_concentration(spark, "ignored").collect()}
    assert rows["MONO"].hhi == 1.0 and rows["MONO"].top_share == 1.0
    assert rows["DUO"].hhi == 0.5 and rows["DUO"].top_share == 0.5


# --- lexical diversity -----------------------------------------------------


def test_lexical_diversity_planted_corpus(spark, monkeypatch):
    docs = spark.createDataFrame(
        [
            (1, "a b c", "en", "web", 5),
            (2, "a a a a", "en", "web", 7),
            (3, "x x", "en", "tmpl", 3),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    _patch_tables(monkeypatch, {"documents": docs})
    rows = {r.source: r for r in distribution.lexical_diversity(spark, "ignored").collect()}
    web = rows["web"]
    assert (web.n_tokens, web.n_types, web.n_hapax) == (7, 3, 2)
    assert web.type_token_ratio == pytest.approx(3 / 7, abs=1e-6)
    assert web.hapax_ratio == pytest.approx(2 / 3, abs=1e-6)
    tmpl = rows["tmpl"]
    assert (tmpl.n_tokens, tmpl.n_types, tmpl.n_hapax) == (2, 1, 0)


# --- Hill tail index -------------------------------------------------------


def test_hill_planted_exponential_tail(spark, monkeypatch):
    """k=2 over x = (e³, e², e, 1): threshold = e (3rd largest),
    Σ ln(x/thr) = 2 + 1 = 3 → α̂ = 2/3."""
    monkeypatch.setattr(distribution, "HILL_K", 2)
    od = _orders(
        spark,
        [(1, "1-URGENT", math.exp(3), 0), (1, "1-URGENT", math.exp(2), 0),
         (1, "1-URGENT", math.exp(1), 0), (1, "1-URGENT", 1.0, 0)],
    )
    _patch_tables(monkeypatch, {"orders": od})
    r = distribution.hill_tail_index(spark, "ignored").collect()[0]
    assert r.k == 2
    assert r.threshold == pytest.approx(math.exp(1), abs=0.01)
    assert r.mean_log_excess == pytest.approx(1.5, abs=1e-6)
    assert r.hill_alpha == pytest.approx(2.0 / 3.0, abs=1e-6)


# --- Fano dispersion -------------------------------------------------------


def test_fano_regular_vs_bursty(spark, monkeypatch):
    """Regular arrivals (1/hour over the 4-hour spine) → Fano 0; the same
    4 events packed into one hour → counts (4,0,0,0), Fano 3."""
    ev = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, h), i, "regular", 1.0, "{}")
            for i, h in enumerate((0, 1, 2, 3))
        ]
        + [
            (10 + i, dt.datetime(2024, 1, 1, 0, i), i, "bursty", 1.0, "{}")
            for i in range(4)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _patch_tables(monkeypatch, {"events": ev})
    rows = {r.event_type: r for r in distribution.fano_dispersion_hourly(spark, "ignored").collect()}
    assert rows["regular"].n_buckets == 4
    assert rows["regular"].fano == 0.0
    assert rows["bursty"].n_buckets == 4  # zero hours INCLUDED via the spine
    assert rows["bursty"].mean_per_hour == 1.0
    assert rows["bursty"].fano == pytest.approx(3.0, abs=1e-6)
    assert rows["bursty"].cv == pytest.approx(math.sqrt(3.0), abs=1e-6)


# --- Cramér's V ------------------------------------------------------------


def test_cramers_v_perfect_association(spark, monkeypatch):
    """Type A only on Monday, type B only on Tuesday, equal counts →
    V = 1 (2024-01-01 is a Monday)."""
    ev = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1), i, "A", 1.0, "{}") for i in range(5)]
        + [(9 + i, dt.datetime(2024, 1, 2), i, "B", 1.0, "{}") for i in range(5)],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _patch_tables(monkeypatch, {"events": ev})
    r = distribution.cramers_v_type_dow(spark, "ignored").collect()[0]
    assert (r.n, r.n_rows, r.n_cols) == (10, 2, 2)
    assert r.chi2 == pytest.approx(10.0, abs=1e-4)
    assert r.cramers_v == pytest.approx(1.0, abs=1e-6)


def test_cramers_v_counts_empty_cells(spark, monkeypatch):
    """3 types × 2 dows with one (type, dow) cell empty: χ² must include
    the empty cell's expected count — Σ over observed cells alone would
    understate it."""
    rows = (
        [(0, dt.datetime(2024, 1, 1), 0, "A", 1.0, "{}")] * 1
        + [(1, dt.datetime(2024, 1, 2), 0, "A", 1.0, "{}")]
        + [(2, dt.datetime(2024, 1, 1), 0, "B", 1.0, "{}")]
        + [(3, dt.datetime(2024, 1, 2), 0, "B", 1.0, "{}")]
        + [(4, dt.datetime(2024, 1, 1), 0, "C", 1.0, "{}")]  # C never on Tue
    )
    ev = spark.createDataFrame(
        [(i, ts, u, t, v, p) for (i, ts, u, t, v, p) in rows],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _patch_tables(monkeypatch, {"events": ev})
    r = distribution.cramers_v_type_dow(spark, "ignored").collect()[0]
    # hand-computed: n=5, rows A=2,B=2,C=1; cols Mon=3,Tue=2
    # e: A-Mon 1.2, A-Tue .8, B-Mon 1.2, B-Tue .8, C-Mon .6, C-Tue .4 (empty)
    exp_chi2 = (
        (1 - 1.2) ** 2 / 1.2 + (1 - 0.8) ** 2 / 0.8
        + (1 - 1.2) ** 2 / 1.2 + (1 - 0.8) ** 2 / 0.8
        + (1 - 0.6) ** 2 / 0.6 + (0 - 0.4) ** 2 / 0.4
    )
    assert r.chi2 == pytest.approx(exp_chi2, abs=1e-4)


def test_welch_zero_variance_yields_null_not_abort(spark, monkeypatch):
    """Two constant arms: SE and the Welch-Satterthwaite denominator are
    exactly 0 — t/df must be NULL, not an ANSI DIVIDE_BY_ZERO abort."""
    ev = _events(
        spark,
        [("purchase", 0, 5) for _ in range(3)]
        + [("click", 0, 2) for _ in range(3)],
    )
    _patch_tables(monkeypatch, {"events": ev})
    [r] = distribution.welch_t_test(spark, "ignored").collect()
    assert (r.n_a, r.n_b, r.mean_a, r.mean_b) == (3, 3, 5.0, 2.0)
    assert r.t_stat is None
    assert r.df_welch is None


def test_welch_counts_are_value_based(spark, monkeypatch):
    """A NULL value row must not count toward n (both engines count
    non-null VALUES, not arm rows — the cross-engine latent)."""
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1), 1, "purchase", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 1), 1, "purchase", None, "{}"),
        (3, dt.datetime(2024, 1, 1), 1, "purchase", 14.0, "{}"),
        (4, dt.datetime(2024, 1, 1), 2, "click", 1.0, "{}"),
        (5, dt.datetime(2024, 1, 1), 2, "click", 3.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    _patch_tables(monkeypatch, {"events": ev})
    [r] = distribution.welch_t_test(spark, "ignored").collect()
    assert (r.n_a, r.n_b) == (2, 2)  # the NULL purchase is not an observation


def test_cramers_single_category_is_null_not_abort(spark, monkeypatch):
    """All events one type → least(nr, nc) = 1 → V undefined: NULL, not an
    ANSI divide-by-zero abort (DuckDB would return inf and diverge)."""
    ev = _events(spark, [("purchase", h, 1) for h in range(6)])
    _patch_tables(monkeypatch, {"events": ev})
    [r] = distribution.cramers_v_type_dow(spark, "ignored").collect()
    assert r.n_rows == 1
    assert r.cramers_v is None


def test_cross_corr_planted_lead_lag(spark, monkeypatch):
    """y is x shifted by exactly 2 days (period-3 pattern, 15 days, so the
    shifted series has identical mean/SS): the exact r(k) is computable
    from the planted daily series; lag 2 dominates."""
    import datetime as dt

    from streamroom_bigdata_spark.operators import distribution as dist

    pattern = [10.0, 40.0, 25.0]
    days = 15
    x = [pattern[t % 3] for t in range(days)]
    y = [pattern[(t - 2) % 3] for t in range(days)]
    rows = []
    eid = 0
    for t in range(days):
        rows.append(
            (eid, dt.datetime(2024, 1, 1 + t, 1), 1, "click", x[t], "{}")
        )
        eid += 1
        rows.append(
            (eid, dt.datetime(2024, 1, 1 + t, 2), 1, "purchase", y[t], "{}")
        )
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.distribution.load_table",
        lambda spark_, sf_, name: df,
    )
    out = {r.lag: r for r in dist.cross_corr_lagged(spark, "ignored").collect()}
    assert set(out) == set(range(dist.XC_MAX_LAG + 1))
    mx = sum(x) / days
    ssx = sum((v - mx) ** 2 for v in x)  # == ssy (shifted periodic)
    for lag in out:
        n_pairs = days - lag
        assert out[lag].n_pairs == n_pairs
        num = sum((x[t] - mx) * (y[t + lag] - mx) for t in range(n_pairs))
        assert abs(out[lag].xcorr - round(num / ssx, 6)) < 1e-6
    assert max(out.values(), key=lambda r: r.xcorr).lag == 2


def test_cross_corr_constant_series_is_null_not_abort(spark, monkeypatch):
    """No click events at all → every daily x is the COALESCE 0.0 and
    SSx = 0 → NULL xcorr, never an ANSI DIVIDE_BY_ZERO abort."""
    import datetime as dt

    from streamroom_bigdata_spark.operators import distribution as dist

    rows = [
        (i, dt.datetime(2024, 1, 1 + i), 1, "purchase", float(i + 1), "{}")
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.distribution.load_table",
        lambda spark_, sf_, name: df,
    )
    out = dist.cross_corr_lagged(spark, "ignored").collect()
    assert len(out) == dist.XC_MAX_LAG + 1
    assert all(r.xcorr is None for r in out)
