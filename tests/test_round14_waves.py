"""Round-14 wave invariants the SQL oracles can't express: metric/test
properties that must hold by THEORY (zero-distance on identical samples,
statistic orderings, bounds), checked on the fixture corpus so they pin
the implementations' semantics, not just cross-engine agreement."""

from __future__ import annotations

from conftest import SF_SMOKE


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


def test_energy_distance_is_nonnegative_and_metric_consistent(spark):
    from streamroom_bigdata_spark.operators.stats import (
        energy_distance_values,
    )

    r = _one(energy_distance_values(spark, SF_SMOKE))
    # D^2 >= 0 (energy distance is a metric squared, up to fixture
    # quantization: allow one 1e-6 quantization ulp)
    assert r.energy_distance >= -1e-6
    # 2 E|X-Y| >= E|X-X'| + E|Y-Y'| is exactly the same statement
    assert 2 * r.e_cross + 1e-6 >= r.e_within_a + r.e_within_b


def test_kuiper_dominates_ks_and_bounds(spark):
    from streamroom_bigdata_spark.operators.stats import kuiper_test_values

    r = _one(kuiper_test_values(spark, SF_SMOKE))
    assert 0.0 <= r.d_plus <= 1.0 and 0.0 <= r.d_minus <= 1.0
    # V = D+ + D- >= max(D+, D-) = KS distance of the same two samples
    assert r.kuiper_v + 1e-9 >= max(r.d_plus, r.d_minus)
    assert r.kuiper_v <= 2.0


def test_cliffs_delta_bounds_and_count_conservation(spark):
    from streamroom_bigdata_spark.operators.stats import cliffs_delta_values

    r = _one(cliffs_delta_values(spark, SF_SMOKE))
    assert -1.0 <= r.cliffs_delta <= 1.0
    # gt + lt + ties partitions all n_a * n_b cross pairs
    assert r.n_greater + r.n_less + r.n_ties == r.n_a * r.n_b


def test_moods_median_counts_bounded_by_arms(spark):
    from streamroom_bigdata_spark.operators.stats import moods_median_test

    r = _one(moods_median_test(spark, SF_SMOKE))
    assert 0 <= r.a_above <= r.n_a and 0 <= r.b_above <= r.n_b
    assert r.chi2 >= 0.0
    # by construction of the lower pooled median, at most half the pooled
    # mass lies strictly above it
    assert 2 * (r.a_above + r.b_above) <= r.n_a + r.n_b


def test_ridge_shrinks_toward_zero_vs_ols(spark):
    from streamroom_bigdata_spark.operators.mlfit import (
        ols_two_factor,
        ridge_regression_price,
    )

    ols = _one(ols_two_factor(spark, SF_SMOKE))
    ridge = _one(ridge_regression_price(spark, SF_SMOKE))
    # with an orthogonal-ish design the L2 penalty cannot INCREASE the
    # coefficient norm; allow rounding slack
    norm_ols = ols.b_quantity**2 + ols.b_discount**2
    norm_ridge = ridge.b_quantity**2 + ridge.b_discount**2
    assert norm_ridge <= norm_ols + 1e-6


def test_durbin_watson_in_range(spark):
    from streamroom_bigdata_spark.operators.timeseries import (
        durbin_watson_daily,
    )

    r = _one(durbin_watson_daily(spark, SF_SMOKE))
    assert 0.0 <= r.dw_stat <= 4.0


def test_pacf_lag1_equals_acf_lag1(spark):
    from streamroom_bigdata_spark.operators.distribution import (
        acf_daily_revenue,
        pacf_daily_revenue,
    )

    pac = _one(pacf_daily_revenue(spark, SF_SMOKE))
    acf1 = {
        r.lag: r.acf for r in acf_daily_revenue(spark, SF_SMOKE).collect()
    }[1]
    # phi_11 == rho_1 by definition; the two ops compute rho_1 with
    # different exactness discipline (PACF clears the mean denominator),
    # so agree to the coarser rounding
    assert abs(pac.pacf1 - acf1) < 5e-4
    assert abs(pac.pacf2) <= 1.0 + 1e-9 and abs(pac.pacf3) <= 1.0 + 1e-9


def test_link_prediction_quartet_shares_candidates(spark):
    from streamroom_bigdata_spark.operators.graph import (
        adamic_adar_links,
        jaccard_links,
        preferential_attachment_links,
        resource_allocation_links,
    )

    key = lambda df: {  # noqa: E731
        (r.part_a, r.part_b) for r in df.collect()
    }
    aa = key(adamic_adar_links(spark, SF_SMOKE))
    assert aa == key(jaccard_links(spark, SF_SMOKE))
    assert aa == key(preferential_attachment_links(spark, SF_SMOKE))
    assert aa == key(resource_allocation_links(spark, SF_SMOKE))
    # jaccard bounds
    j = jaccard_links(spark, SF_SMOKE).collect()
    assert all(0.0 < r.jaccard <= 1.0 for r in j)
    assert all(r.n_common <= min(r.deg_a, r.deg_b) for r in j)


def test_purchase_gap_shares_are_shares(spark):
    from streamroom_bigdata_spark.operators.behavior import (
        purchase_gap_churn_risk,
    )

    rows = purchase_gap_churn_risk(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_overdue <= r.n_assessable
        assert abs(r.overdue_share - r.n_overdue / r.n_assessable) < 1e-6


def test_nrr_grr_ordering(spark):
    from streamroom_bigdata_spark.operators.revops import (
        net_revenue_retention,
    )

    rows = net_revenue_retention(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # GRR caps every account at prior spend, so GRR <= NRR and <= 1
        assert r.grr <= r.nrr + 1e-9
        assert r.grr <= 1.0 + 1e-9
        assert r.n_retained <= r.n_base
