"""Statistical-inference operators (regression trend, Benford, ANOVA,
Mann-Whitney, Kaplan-Meier) — planted-data checks beyond the DuckDB
oracle equivalence."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from streamroom_bigdata_spark.operators import stats


def _ev(spark, rows):
    """rows: (user_id, event_type, day, hour, value)"""
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h), u, t, float(v), "{}")
            for i, (u, t, d, h, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _patch(monkeypatch, df):
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.stats.load_table",
        lambda spark_, sf_, name: df,
    )


def test_regression_trend_recovers_planted_line(spark, monkeypatch):
    """Values on an exact line value = 2*day + 5 → slope 2/day, R² = 1."""
    rows = [(1, "click", d, 0, 2 * d + 5) for d in range(1, 11)]
    _patch(monkeypatch, _ev(spark, rows))
    out = stats.regression_trend(spark, "ignored").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 10
    assert r.slope_per_day == pytest.approx(2.0, abs=1e-5)
    assert r.r2 == pytest.approx(1.0, abs=1e-6)


def test_benford_uses_exact_first_digit_not_log(spark, monkeypatch):
    """Prices 100.00 / 19.99 / 0.05 → digits 1, 1, 5 (integer-cents path,
    power-of-ten boundary included on purpose); frequencies sum to 1."""
    li = spark.createDataFrame(
        [(100.00,), (19.99,), (0.05,), (900.01,)],
        "l_extendedprice double",
    )
    _patch(monkeypatch, li)
    rows = {r.digit: r for r in stats.benford_digit_profile(spark, "x").collect()}
    assert rows[1].n == 2 and rows[5].n == 1 and rows[9].n == 1
    assert sum(r.observed_freq for r in rows.values()) == pytest.approx(1.0)
    assert rows[1].expected_freq == pytest.approx(math.log10(2), abs=1e-9)


def test_anova_f_zero_when_groups_identical(spark, monkeypatch):
    """Same values in every group → SSB = 0 → F = 0; planted mean shift
    on one group → F large."""
    same = [(u, t, 1, u, v) for t in ("a", "b", "c")
            for u, v in ((1, 10.0), (2, 20.0), (3, 30.0))]
    _patch(monkeypatch, _ev(spark, same))
    r = stats.anova_f_oneway(spark, "x").collect()[0]
    assert r.k_groups == 3 and r.n_total == 9
    assert r.f_stat == pytest.approx(0.0, abs=1e-9)

    shifted = [(u, t, 1, u, v + (1000.0 if t == "c" else 0.0))
               for t in ("a", "b", "c")
               for u, v in ((1, 10.0), (2, 20.0), (3, 30.0))]
    _patch(monkeypatch, _ev(spark, shifted))
    r2 = stats.anova_f_oneway(spark, "x").collect()[0]
    assert r2.f_stat > 100


def test_mann_whitney_symmetric_and_separated(spark, monkeypatch):
    """Identical samples → U = n²/2, z = 0; fully separated samples →
    U = 0 (every A below every B) and rank_biserial = +1."""
    a, b = stats.MW_GROUP_A, stats.MW_GROUP_B
    sym = [(1, a, 1, 1, v) for v in (1, 2, 3, 4)] + [
        (2, b, 1, 1, v) for v in (1, 2, 3, 4)
    ]
    _patch(monkeypatch, _ev(spark, sym))
    r = stats.mann_whitney_u(spark, "x").collect()[0]
    assert (r.n_a, r.n_b) == (4, 4)
    assert r.u_stat == pytest.approx(8.0)  # n_a*n_b/2 with all-tie pairs
    assert r.z_score == pytest.approx(0.0, abs=1e-9)

    sep = [(1, a, 1, 1, v) for v in (1, 2, 3, 4)] + [
        (2, b, 1, 1, v) for v in (10, 11, 12, 13)
    ]
    _patch(monkeypatch, _ev(spark, sep))
    r2 = stats.mann_whitney_u(spark, "x").collect()[0]
    assert r2.u_stat == pytest.approx(0.0)
    assert r2.rank_biserial == pytest.approx(1.0)
    assert r2.z_score < -2.0


def test_mann_whitney_tie_groups_share_average_rank(spark, monkeypatch):
    """A = {1, 2}, B = {2, 3}: the tied 2s take average rank 2.5 →
    R_A = 1 + 2.5 = 3.5 → U = 0.5 (one half-tie pair)."""
    a, b = stats.MW_GROUP_A, stats.MW_GROUP_B
    data = [(1, a, 1, 1, 1), (1, a, 1, 2, 2), (2, b, 1, 3, 2), (2, b, 1, 4, 3)]
    _patch(monkeypatch, _ev(spark, data))
    r = stats.mann_whitney_u(spark, "x").collect()[0]
    assert r.u_stat == pytest.approx(0.5)


def test_kaplan_meier_hand_computed_curve(spark, monkeypatch):
    """4 users starting day 1: conversions at +1d (u1) and +2d (u2);
    u3, u4 never convert (censored at the horizon).

    KM: S(1) = 3/4; S(2) = 3/4 · 2/3 = 1/2. Censored users stay in the
    at-risk denominator until the horizon."""
    thr = stats.KM_VALUE_THRESHOLD
    rows = [
        (1, "signup", 1, 0, 0), (1, "purchase", 2, 0, thr + 1),
        (2, "signup", 1, 0, 0), (2, "purchase", 3, 0, thr + 1),
        (3, "signup", 1, 0, 0), (3, "purchase", 5, 0, thr - 1),  # low value
        (4, "signup", 1, 0, 0), (4, "click", 9, 0, 0),  # horizon = day 9
    ]
    _patch(monkeypatch, _ev(spark, rows))
    out = {r.t_days: r for r in stats.kaplan_meier_conversion(spark, "x").collect()}
    assert set(out) == {1, 2}  # only conversion times appear
    assert out[1].n_at_risk == 4 and out[1].n_converted == 1
    assert out[1].survival == pytest.approx(0.75)
    assert out[2].n_at_risk == 3 and out[2].n_converted == 1
    assert out[2].survival == pytest.approx(0.5)


def test_kaplan_meier_terminal_full_conversion_hits_zero(spark, monkeypatch):
    """When the last at-risk users all convert, survival reaches exactly
    0.0 (the ln(0) short-circuit path)."""
    thr = stats.KM_VALUE_THRESHOLD
    rows = [
        (1, "signup", 1, 0, 0), (1, "purchase", 2, 0, thr + 1),
        (2, "signup", 1, 0, 0), (2, "purchase", 3, 0, thr + 1),
    ]
    _patch(monkeypatch, _ev(spark, rows))
    out = {r.t_days: r for r in stats.kaplan_meier_conversion(spark, "x").collect()}
    assert out[2].survival == 0.0
    assert out[1].survival == pytest.approx(0.5)


def test_poisson_bootstrap_ci_brackets_true_mean(spark, monkeypatch):
    """Planted values centered at 50 → the 95% interval contains 50 and
    is ordered lower <= mean <= upper; repeated runs are identical
    (hash determinism, no RNG state)."""
    rows = [(u % 7, "click", 1 + (u % 28), u % 24, 40 + (u % 21))
            for u in range(400)]
    _patch(monkeypatch, _ev(spark, rows))
    r1 = stats.poisson_bootstrap_ci(spark, "x").collect()[0]
    r2 = stats.poisson_bootstrap_ci(spark, "x").collect()[0]
    assert r1 == r2
    assert r1.n_reps == stats.BOOT_REPS
    assert r1.ci_lower <= r1.boot_mean <= r1.ci_upper
    assert r1.ci_lower < 50 < r1.ci_upper
    # interval should be tight around the true mean for n=400
    assert r1.ci_upper - r1.ci_lower < 5


def test_poisson_bootstrap_degenerate_replica_cross_engine(
    spark, monkeypatch, tmp_path
):
    """A 1-event table makes ~37 of 100 replicas all-zero-weight, so their
    mean_rep is NULL via nullif — and the rn=98 order-statistic cut lands
    in the NULL tail, exactly where implicit NULL ordering used to diverge
    (Spark ascending defaults NULLS FIRST, DuckDB NULLS LAST). Both
    engines must now produce the identical row."""
    import duckdb

    df = _ev(spark, [(1, "click", 1, 0, 42.0)])
    _patch(monkeypatch, df)
    got = stats.poisson_bootstrap_ci(spark, "x").collect()[0]
    df.toPandas().to_parquet(tmp_path / "events.parquet")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    want = con.execute(stats.poisson_bootstrap_oracle).fetchone()
    con.close()
    assert (got.n_reps, got.boot_mean, got.ci_lower, got.ci_upper) == want
    assert got.ci_lower == 42.0  # rn=3 sits among the surviving replicas
    assert got.ci_upper is None  # rn=98 sits in the NULL tail on BOTH engines


_DOC_DDL = "doc_id long, text string, lang string, source string, n_chars long"


def test_roc_auc_separable_and_tied(spark, monkeypatch):
    """Perfectly separated unigram scores → AUC 1; adding a negative doc
    that TIES the positive score → AUC (2 wins + 2 half-ties)/4 = 0.75."""
    sep = [
        (0, "x x x x", "en", "s", 7),
        (1, "x x", "en", "s", 3),
        (2, "y", "de", "s", 1),
        (3, "y y", "de", "s", 3),
    ]

    def run(rows):
        df = spark.createDataFrame(rows, _DOC_DDL)
        monkeypatch.setattr(
            "streamroom_bigdata_spark.operators.stats.load_table",
            lambda spark_, sf_, name: df,
        )
        return stats.roc_auc_quality(spark, "ignored").collect()[0]

    r = run(sep)
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)
    # docs 0/1 and 4 all score ln(c_x/N) exactly (single-token docs of the
    # same token) → one mid-rank tie group spanning both classes
    tied = [
        (0, "x x", "en", "s", 3),
        (1, "x x", "en", "s", 3),
        (2, "y", "de", "s", 1),
        (4, "x x", "de", "s", 3),
    ]
    r = run(tied)
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 0.75)


def test_kmv_daily_cumulative_replay(spark, monkeypatch):
    """500 planted users over 3 first-seen days replayed in Python with
    the same md5-prefix hash: exact counts, the underfull-day exact
    convention, and the (K-1)·2⁶⁰/h_K estimate all match."""
    import datetime as dt
    import hashlib

    from streamroom_bigdata_spark.operators import profile as prof

    first_seen = {u: 1 + (u % 3) for u in range(500)}  # days 1..3
    rows = [
        (u * 10 + d, dt.datetime(2024, 1, d, 12), u, "click", 1.0, "{}")
        for u, fs in first_seen.items()
        for d in range(fs, 4)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.profile.load_table",
        lambda spark_, sf_, name: df,
    )
    out = {
        r.day: r
        for r in prof.kmv_daily_cumulative(spark, "ignored").collect()
    }
    hashes = {
        u: int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)
        for u in first_seen
    }
    k = prof.KMV_CUM_K
    for d in (1, 2, 3):
        users = [u for u, fs in first_seen.items() if fs <= d]
        r = out[dt.date(2024, 1, d)]
        assert r.exact_users == len(users)
        if len(users) < k:
            assert r.kmv_estimate == float(len(users))
            assert r.rel_err == 0.0
        else:
            hk = sorted(hashes[u] for u in users)[k - 1]
            est = (k - 1) * 1152921504606846976.0 / hk
            assert abs(r.kmv_estimate - round(est, 2)) < 1e-6


def test_roc_auc_single_class_is_null_not_abort(spark, monkeypatch):
    """An all-positive corpus zeroes n_neg → NULL AUC, never an ANSI
    DIVIDE_BY_ZERO abort."""
    rows = [(i, "w w", "en", "s", 3) for i in range(6)]
    df = spark.createDataFrame(rows, _DOC_DDL)
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.stats.load_table",
        lambda spark_, sf_, name: df,
    )
    r = stats.roc_auc_quality(spark, "ignored").collect()[0]
    assert (r.n_pos, r.n_neg) == (6, 0)
    assert r.auc is None


def test_hll_portable_accuracy_and_mergeability(spark):
    """Portable HLL: (a) estimate within ~3 std errors (1.04/sqrt(256) ≈
    6.5%) of a known cardinality large enough to leave the linear-counting
    regime; (b) register merge is lossless — the union of two halves'
    registers estimates EXACTLY what the full set's registers do (max is
    associative), the property that makes per-shard sketches roll up."""
    from pyspark.sql import functions as F

    from streamroom_bigdata_spark.operators.profile import (
        HLL_M,
        _hll_estimate,
        _hll_registers,
    )

    n = 50_000
    df = spark.range(n).select(
        F.lit("g").alias("g"), F.col("id").cast("string").alias("k")
    )
    regs = _hll_registers(df, F.col("k"), ["g"])
    (est,) = _hll_estimate(regs, ["g"]).collect()
    assert abs(est.hll_estimate - n) / n < 3 * 1.04 / (HLL_M ** 0.5)

    half_a = df.filter(F.col("k").cast("long") % 2 == 0)
    half_b = df.filter(F.col("k").cast("long") % 2 == 1)
    merged = (
        _hll_registers(half_a, F.col("k"), ["g"])
        .union(_hll_registers(half_b, F.col("k"), ["g"]))
        .groupBy("g", "b")
        .agg(F.max("m_reg").alias("m_reg"))
    )
    (est_m,) = _hll_estimate(merged, ["g"]).collect()
    assert est_m.hll_estimate == est.hll_estimate
