"""Quant/trend-diagnostics wave (round 11) — planted-data checks beyond
the DuckDB oracle equivalence: known closed-form answers, tie handling,
degenerate guards, and the link-prediction brute-force cross-check."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from streamroom_bigdata_spark.operators import behavior, graph, quant


def _patch(monkeypatch, mod, tables):
    """tables: name -> DataFrame; missing names raise (test must plant
    everything its operator loads)."""
    monkeypatch.setattr(
        f"streamroom_bigdata_spark.operators.{mod}.load_table",
        lambda spark_, sf_, name: tables[name],
    )


def _orders(spark, rows):
    """rows: (orderkey, custkey, day, totalprice)"""
    return spark.createDataFrame(
        [
            (ok, ck, "O", float(p), dt.datetime(2024, 1, d), "1-URGENT")
            for ok, ck, d, p in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )


def _events(spark, rows):
    """rows: (event_id, day, hour, minute, user, value)"""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h, mi), u, "click", float(v), "{}")
            for i, d, h, mi, u, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


# --- OHLC ---------------------------------------------------------------


def test_ohlc_tie_broken_by_event_id(spark, monkeypatch):
    """Two events at the identical timestamp: the LOWER event_id is the
    open, the higher the close — deterministic bars under ts ties."""
    ev = _events(
        spark,
        [
            (7, 1, 0, 0, 1, 30.0),  # same ts as event 3
            (3, 1, 0, 0, 1, 10.0),
            (5, 1, 12, 0, 1, 99.0),
        ],
    )
    _patch(monkeypatch, "quant", {"events": ev})
    r = quant.ohlc_daily_value(spark, "x").collect()[0]
    assert (r.open, r.close) == (10.0, 99.0)
    assert (r.low, r.high) == (10.0, 99.0)
    assert r.n_events == 3


# --- TWAP ---------------------------------------------------------------


def test_twap_weights_by_holding_time(spark, monkeypatch):
    """Value 10 held 3 minutes then 40 held 1 minute (last event opens no
    interval): TWAP = (10*180 + 40*60) / 240 = 17.5."""
    ev = _events(
        spark,
        [(1, 1, 0, 0, 1, 10.0), (2, 1, 0, 3, 1, 40.0), (3, 1, 0, 4, 1, 0.0)],
    )
    _patch(monkeypatch, "quant", {"events": ev})
    r = quant.twap_user_value(spark, "x").collect()[0]
    assert r.n_intervals == 2
    assert r.span_ms == 240_000
    assert r.twap == pytest.approx(17.5)


def test_twap_drops_zero_span_users(spark, monkeypatch):
    """All of a user's events on one timestamp → no intervals → excluded
    (never a divide-by-zero)."""
    ev = _events(spark, [(1, 1, 0, 0, 9, 5.0), (2, 1, 0, 0, 9, 7.0)])
    _patch(monkeypatch, "quant", {"events": ev})
    assert quant.twap_user_value(spark, "x").count() == 0


# --- Kendall τ-b / Mann-Kendall ------------------------------------------


def test_kendall_perfect_concordance(spark, monkeypatch):
    """Revenue and order count both strictly increasing by day (d orders
    of 100 on day d) → every pair concordant → τ-b = 1."""
    rows, ok = [], 0
    for d in range(1, 7):
        for _ in range(d):
            ok += 1
            rows.append((ok, 1, d, 100.0))
    od = _orders(spark, rows)
    _patch(monkeypatch, "quant", {"orders": od})
    r = quant.kendall_tau_daily(spark, "x").collect()[0]
    assert r.n_days == 6 and r.n_pairs == 15
    assert r.conc_minus_disc == 15
    assert r.tau_b == pytest.approx(1.0)


def test_kendall_tie_correction(spark, monkeypatch):
    """Two days tied on revenue: the tied pair contributes 0 to S and the
    denominator shrinks by the tie term — brute-force cross-check."""
    days = [(1, 100.0, 1), (2, 100.0, 2), (3, 300.0, 3), (4, 250.0, 4)]
    rows, ok = [], 0
    for d, price, n in days:
        for _ in range(n):
            ok += 1
            rows.append((ok, 1, d, price))
    od = _orders(spark, rows)
    _patch(monkeypatch, "quant", {"orders": od})
    r = quant.kendall_tau_daily(spark, "x").collect()[0]
    rev = [p * n for _, p, n in days]
    cnt = [n for _, _, n in days]
    s = sum(
        (rev[j] > rev[i]) - (rev[j] < rev[i])
        for i in range(4)
        for j in range(i + 1, 4)
        if (cnt[j] > cnt[i]) - (cnt[j] < cnt[i]) > 0
    ) - sum(
        (rev[j] > rev[i]) - (rev[j] < rev[i])
        for i in range(4)
        for j in range(i + 1, 4)
        if (cnt[j] > cnt[i]) - (cnt[j] < cnt[i]) < 0
    )
    n0 = 6
    t_rev = sum(1 for i in range(4) for j in range(i + 1, 4) if rev[i] == rev[j])
    assert r.conc_minus_disc == s
    assert r.tau_b == pytest.approx(s / math.sqrt((n0 - t_rev) * n0), abs=1e-6)


def test_mann_kendall_monotone_series(spark, monkeypatch):
    """Strictly increasing daily revenue → S = C(n,2), z > 0 with the
    no-ties variance n(n-1)(2n+5)/18."""
    od = _orders(spark, [(d, 1, d, 50.0 + d) for d in range(1, 11)])
    _patch(monkeypatch, "quant", {"orders": od})
    r = quant.mann_kendall_trend(spark, "x").collect()[0]
    assert r.s_stat == 45
    var = 10 * 9 * 25 / 18.0
    assert r.var_s == pytest.approx(var, abs=1e-3)
    assert r.z_mk == pytest.approx(44 / math.sqrt(var), abs=1e-5)


# --- Runs test ------------------------------------------------------------


def test_runs_test_alternating_sequence(spark, monkeypatch):
    """Daily order counts strictly alternating around the median → every
    step starts a new run: R = n, z maximal positive."""
    rows, ok = [], 0
    for d in range(1, 9):
        n = 1 if d % 2 else 3  # alternate 1,3,1,3... median 2
        for _ in range(n):
            ok += 1
            rows.append((ok, 1, d, 100.0))
    od = _orders(spark, rows)
    _patch(monkeypatch, "quant", {"orders": od})
    r = quant.runs_test_daily(spark, "x").collect()[0]
    assert (r.n_above, r.n_below) == (4, 4)
    assert r.n_runs == 8
    assert r.e_runs == pytest.approx(1 + 2 * 4 * 4 / 8, abs=1e-9)  # 5
    assert r.z_runs > 2.0


# --- Chow test ------------------------------------------------------------


def test_chow_detects_planted_slope_break(spark, monkeypatch):
    """First half slope +10/day, second half slope -10/day (with small
    deterministic jitter so the segment fits aren't EXACT — a perfect fit
    makes SSR_seg 0 and F infinite, which the divide guard reports as
    NULL): pooled OLS fits badly → F huge. A pure linear series → F ≈ 0."""
    broken = [(d, 1, d, 100.0 + 10 * d + (d % 3)) for d in range(1, 11)] + [
        (d, 1, d, 300.0 - 10 * (d - 10) + (d % 3)) for d in range(11, 21)
    ]
    od = _orders(spark, [(i + 1, c, d, p) for i, (_, c, d, p) in enumerate(broken)])
    _patch(monkeypatch, "quant", {"orders": od})
    r = quant.chow_test_break(spark, "x").collect()[0]
    assert r.n_pre + r.n_post == 20
    assert r.f_chow > 100

    linear = [
        (i + 1, 1, d, 100.0 + 10 * d + (d % 3))
        for i, d in enumerate(range(1, 21))
    ]
    _patch(monkeypatch, "quant", {"orders": _orders(spark, linear)})
    r2 = quant.chow_test_break(spark, "x").collect()[0]
    assert r2.f_chow < 1.0


# --- Jensen-Shannon --------------------------------------------------------


def _docs(spark, rows):
    """rows: (doc_id, source, text)"""
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, s, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_jsd_zero_for_identical_and_one_for_disjoint(spark, monkeypatch):
    """Same token stream in both sources → JSD = 0; fully disjoint
    vocabularies → JSD = 1 bit (the base-2 upper bound)."""
    same = _docs(
        spark, [(1, "src0", "a b b c"), (2, "src1", "a b b c")]
    )
    _patch(monkeypatch, "quant", {"documents": same})
    r = quant.jensen_shannon_sources(spark, "x").collect()[0]
    assert r.jsd_bits == pytest.approx(0.0, abs=1e-9)
    assert r.vocab_shared == 3

    disjoint = _docs(spark, [(1, "src0", "a a b"), (2, "src1", "x y y z")])
    _patch(monkeypatch, "quant", {"documents": disjoint})
    r = quant.jensen_shannon_sources(spark, "x").collect()[0]
    assert r.jsd_bits == pytest.approx(1.0, abs=1e-9)
    assert r.vocab_shared == 0


# --- Adamic-Adar ------------------------------------------------------------


def _lineitem(spark, rows):
    """rows: (orderkey, partkey)"""
    return spark.createDataFrame(
        [
            (ok, pk, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", dt.datetime(2024, 1, 2))
            for ok, pk in rows
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    )


def test_adamic_adar_matches_brute_force(spark, monkeypatch):
    """3 customers over 4 parts, by hand: parts (1,2) shared by customers
    A(deg 2) and B(deg 3) → AA = 1/ln2 + 1/ln3; pairs with <2 common
    customers are filtered."""
    # orders: one per customer; customer = orderkey here
    orders = _orders(spark, [(1, 1, 1, 10.0), (2, 2, 1, 10.0), (3, 3, 1, 10.0)])
    li = _lineitem(
        spark,
        [(1, 1), (1, 2),  # cust 1: parts {1,2}, deg 2
         (2, 1), (2, 2), (2, 3),  # cust 2: {1,2,3}, deg 3
         (3, 3), (3, 4)],  # cust 3: {3,4}, deg 2
    )
    _patch(monkeypatch, "graph", {"orders": orders, "lineitem": li})
    out = {(r.part_a, r.part_b): r for r in
           graph.adamic_adar_links(spark, "x").collect()}
    assert set(out) == {(1, 2)}  # only pair with >= 2 common customers
    assert out[(1, 2)].n_common == 2
    assert out[(1, 2)].aa_score == pytest.approx(
        1 / math.log(2) + 1 / math.log(3), abs=1e-6
    )


def test_adamic_adar_degree_cap_excludes_pivot(spark, monkeypatch):
    """A customer above AA_MAX_DEG contributes no pairs — the hot-pivot
    guard the 100 TB story rests on."""
    parts = list(range(1, graph.AA_MAX_DEG + 2))  # deg 41 > cap
    orders = _orders(spark, [(1, 1, 1, 10.0), (2, 2, 1, 10.0)])
    li = _lineitem(
        spark,
        [(1, p) for p in parts] + [(2, 1), (2, 2)],
    )
    _patch(monkeypatch, "graph", {"orders": orders, "lineitem": li})
    out = {(r.part_a, r.part_b) for r in
           graph.adamic_adar_links(spark, "x").collect()}
    assert out == set()  # pivot capped out; remaining pair has n_common 1


# --- Degree assortativity ----------------------------------------------------


def test_assortativity_negative_for_star(spark, monkeypatch):
    """A star (1 customer, k suppliers, distinct orders) is perfectly
    disassortative: every edge joins the hub (deg k) to a leaf (deg 1)
    → corr over the symmetrized list = -1."""
    from pyspark.sql import functions as F

    orders = _orders(spark, [(k, 7, 1, 10.0) for k in range(1, 5)])
    # supplier k on order k: l_suppkey = l_orderkey
    li = _lineitem(spark, [(k, 1) for k in range(1, 5)]).withColumn(
        "l_suppkey", F.col("l_orderkey")
    )
    _patch(monkeypatch, "graph", {"orders": orders, "lineitem": li})
    r = graph.degree_assortativity(spark, "x").collect()[0]
    assert r.n_nodes == 5  # hub + 4 leaves
    assert r.n_edges == 8  # 4 undirected edges, both orientations
    assert r.assortativity == pytest.approx(-1.0, abs=1e-9)


# --- Association rules --------------------------------------------------------


def test_assoc_rules_directed_confidence(spark, monkeypatch):
    """Pair (1,2) in 3 baskets; part 1 in 4 baskets, part 2 in 3 →
    conf(1→2) = 3/4, conf(2→1) = 1; lift symmetric."""
    li = _lineitem(
        spark,
        [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (3, 2), (4, 1)],
    )
    _patch(monkeypatch, "behavior", {"lineitem": li})
    out = {(r.ante, r.cons): r for r in
           behavior.assoc_rules_confidence(spark, "x").collect()}
    assert set(out) == {(1, 2), (2, 1)}
    assert out[(1, 2)].confidence == pytest.approx(0.75)
    assert out[(2, 1)].confidence == pytest.approx(1.0)
    assert out[(1, 2)].lift == out[(2, 1)].lift == pytest.approx(
        3 * 4 / (4.0 * 3), abs=1e-9
    )  # = 1.0


# --- Bollinger bands ---------------------------------------------------------


def test_bollinger_flat_series_never_breaks(spark, monkeypatch):
    """Constant daily revenue → sd = 0 → bands collapse onto the mean and
    the exact-integer breakout inequality (strict >) is false everywhere."""
    od = _orders(spark, [(d, 1, d, 500.0) for d in range(1, 15)])
    _patch(monkeypatch, "quant", {"orders": od})
    rows = quant.bollinger_daily_revenue(spark, "x").collect()
    assert len(rows) == 8  # 14 days, first full window on day 7
    assert all(not r.breakout for r in rows)
    assert all(r.ma7 == pytest.approx(500.0) for r in rows)


def test_bollinger_spike_flags_breakout(spark, monkeypatch):
    """A 10x spike day against an otherwise noisy-flat series exceeds
    mean + 2sd of its trailing window → breakout True exactly there."""
    prices = {d: 500.0 + (d % 3) for d in range(1, 15)}
    prices[12] = 5000.0
    od = _orders(spark, [(d, 1, d, prices[d]) for d in range(1, 15)])
    _patch(monkeypatch, "quant", {"orders": od})
    rows = {r.d: r for r in quant.bollinger_daily_revenue(spark, "x").collect()}
    spike_d = [d for d, r in rows.items() if r.breakout]
    day12 = [d for d in rows if rows[d].rev == 5000.0]
    assert day12 and day12[0] in spike_d


# --- Max drawdown ------------------------------------------------------------


def test_max_drawdown_planted_slump(spark, monkeypatch):
    """Peak day 300, worst later day 100 → drawdown 200 (66.67% of peak),
    trough at the FIRST day attaining it."""
    seq = [(1, 100.0), (2, 300.0), (3, 100.0), (4, 250.0), (5, 100.0)]
    od = _orders(spark, [(d, 1, d, p) for d, p in seq])
    _patch(monkeypatch, "quant", {"orders": od})
    r = quant.max_drawdown_revenue(spark, "x").collect()[0]
    assert r.n_days == 5
    assert r.max_drawdown == pytest.approx(200.0)
    # trough = day 3, the FIRST day 200 below the 300 peak (day 5 ties)
    epoch_day3 = (dt.date(2024, 1, 3) - dt.date(1970, 1, 1)).days
    assert r.trough_d == epoch_day3
    assert r.drawdown_frac == pytest.approx(200.0 / 300.0, abs=1e-6)


# --- Daily return profile ------------------------------------------------------


def test_return_profile_known_diffs(spark, monkeypatch):
    """Revenue 100,200,150 → changes +100,-50: mean 25, hit rate 1/2."""
    od = _orders(spark, [(1, 1, 1, 100.0), (2, 1, 2, 200.0), (3, 1, 3, 150.0)])
    _patch(monkeypatch, "quant", {"orders": od})
    r = quant.daily_return_profile(spark, "x").collect()[0]
    assert r.n_changes == 2
    assert r.mean_chg == pytest.approx(25.0)
    assert r.frac_up == pytest.approx(0.5)
    # sample std of {100, -50} = 106.0660...
    assert r.std_chg == pytest.approx(106.0660, abs=1e-3)


# --- MinHash calibration --------------------------------------------------------


def test_minhash_calibration_identical_docs_exact(spark, monkeypatch):
    """Two identical documents: estimator 1.0, true Jaccard 1.0 → the one
    candidate pair calibrates with zero error."""
    from streamroom_bigdata_spark.operators import dedup

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = _docs(spark, [(1, "src0", text), (2, "src1", text)])
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.dedup.load_table",
        lambda spark_, sf_, name: docs,
    )
    r = dedup.minhash_jaccard_calibration(spark, "x").collect()[0]
    assert r.n_pairs == 1
    assert r.mae == pytest.approx(0.0)
    assert r.bias == pytest.approx(0.0)
    assert r.frac_within_025 == pytest.approx(1.0)
