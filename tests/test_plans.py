"""Plan-shape regression guards: the scale properties the 100 TB design
depends on, asserted against the physical plan so a future edit can't
silently reintroduce a driver bottleneck or an unnecessary shuffle."""

from __future__ import annotations

import re

from streamroom_bigdata_spark import registry


def _plan(spark, name, sf_dir):
    return (
        registry.queries()[name](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_star_join_broadcasts_dims(spark, sf_dir):
    """Fact ⋈ 4 dims: every dim side broadcast, at most one shuffle join
    (lineitem ⋈ orders)."""
    plan = _plan(spark, "star_join_revenue", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3
    assert plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") <= 1


def test_topk_orders_is_distributed_topk(spark, sf_dir):
    plan = _plan(spark, "topk_orders", sf_dir)
    assert "TakeOrderedAndProject" in plan


def test_asof_join_single_shuffle_key(spark, sf_dir):
    """As-of emulation: exchanges only on the join/window key — no
    single-partition funnel."""
    plan = _plan(spark, "asof_join", sf_dir)
    assert "Exchange SinglePartition" not in plan


def test_quartiles_distributed_no_global_funnel(spark, sf_dir):
    plan = _plan(spark, "quartiles_distributed", sf_dir)
    assert "Exchange SinglePartition" not in plan


def test_sessionize_single_exchange(spark, sf_dir):
    """Both windows and the final aggregate share one user_id shuffle."""
    plan = _plan(spark, "sessionize_events", sf_dir)
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    assert "Exchange SinglePartition" not in plan


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """Map-side combine: partial_ aggregate functions below the exchange."""
    plan = _plan(spark, "pricing_summary", sf_dir)
    assert "partial_" in plan


def test_filters_push_into_scan(spark, sf_dir):
    """Predicate pushdown reaches the parquet reader on a filtered scan."""
    plan = _plan(spark, "semi_join_active_customers", sf_dir)
    assert "PushedFilters: [" in plan


def test_no_cartesian_products_in_headline(spark, sf_dir):
    import bench

    for name in bench.HEADLINE:
        plan = _plan(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name


def test_star_join_bucketed_fact_join_is_exchange_free(spark, sf_dir):
    """The bucketed variant's lineitem⋈orders join must read co-located
    buckets: merge join with no Exchange on either side (broadcast disabled
    so the planner can't hide the shuffle question)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(spark, "star_join_bucketed", sf_dir)
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    join_part = plan.split("SortMergeJoin")[-1]  # subtree below the fact join
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in join_part, join_part


# --- forced-broadcast audit (VERDICT r2 #4) --------------------------------

#: fact-table relations, identified in analyzed plans by a distinctive column
_FACT_COLS = {
    "lineitem": "l_orderkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

#: queries allowed N broadcast hints over fact-derived subtrees, each with a
#: boundedness argument. Anything else that force-broadcasts a fact subtree
#: fails the audit — at 100× scale that hint is the classic OOM.
_ALLOWED_FACT_BROADCASTS = {
    # round-12 waves — every hinted side is a 1-row scalar aggregate or a
    # domain-bounded sketch over a fact table (the in-plan scalar pattern;
    # counts include plan-tree reuse of the same bounded side):
    # 1-row (N, X) customer-revenue totals
    "theil_index_nations": 1,
    # 1-row exact self-join cardinality
    "join_size_estimate_cm": 1,
    # 1-row (n, n_pos, brier_sum) totals
    "brier_score_decomposition": 1,
    # 5-row per-group medians + 1-row grand totals (+ reuse)
    "brown_forsythe_spread": 3,
    # 1-row pooled percentile sketch
    "quantile_align_sources": 1,
    # 1-row corpus totals + 1-row BH cutoff, reused across the rank join
    "bh_fdr_brand_returns": 5,
    # 1-row global key-range bounds: both per-layout groupBy branches +
    # the flag-algebra join (the post-rework per-branch spelling — 9.5 s
    # → 1.8 s warm; same bounded 1-row side three times)
    "zonemap_prune_stats": 3,
    # 1-row calendar split + 1-row calibration quantile (+ reuse)
    "conformal_interval_daily": 3,
    # 1-row horizon + 1-row lifetable totals (+ reuse)
    "nelson_aalen_hazard": 3,
    # 1-row mu0/cp0 + 2-row segment means, reused across both levels
    "binary_segmentation_changepoints": 6,
    # 1-row n/mu/ss scalars reused across the 10-lag spine
    "ljung_box_q": 5,
    # 9-double decile boundary sketch + 1-row revenue total (+ reuse)
    "lorenz_curve_deciles": 3,
    # 1-row (xbar, mRbar) limits
    "xmr_control_chart": 1,
    # 1-row (n, sd) + two day-DOMAIN rank-row lookups (calendar-bounded)
    "ransac_trend_daily": 3,
    # 9-double score-decile boundary sketch + 1-row totals, the boundary
    # sketch reused by both bin paths (subtree reuse)
    "gains_chart_stopword": 3,
    # 1-row global aggregates (max usage / corpus count): one row crosses
    "recommend_rooms": 1,
    "recommend_rmse": 1,
    "normalized_usage": 1,
    "tf_idf": 1,
    # literal-key-bounded subsets (|QUERY_IDS| or anchor row)
    "ann_lsh_cosine": 1,
    "cosine_to_anchor_pandas": 1,
    "vector_norms": 1,
    # centroids: Aggregate keyed on the quantizer's label domain (k lists,
    # fixed by design) — 2 assignment paths + 1 query path
    "ann_ivf_cosine": 3,
    # round-13 composition: the same label-domain centroid broadcast under
    # both _nearest_lists paths + the |Q|·n_probe-row probed-list table
    # (literal-key-bounded QUERY_IDS); the 640-row integer ADC table is
    # createDataFrame-built, not fact-derived
    "ann_ivfpq_cosine": 3,
    # round-14 wave — every hinted side bounded by design:
    # 1-row closed-form OLS fit broadcast onto the day-domain residuals
    "durbin_watson_daily": 1,
    "breusch_pagan_daily": 1,
    # 1-row (n, S) moments + 1-row Σv² — the moment row feeds both the
    # centering and (via subtree reuse) the lag branches
    "pacf_daily_revenue": 4,
    # 1-row corpus max-day scalar
    "purchase_gap_churn_risk": 1,
    # 1-row 4-point OLS fit broadcast back onto the per-n rows (the
    # dyadic lattice literal is createDataFrame-built, not fact-derived)
    "hurst_exponent_daily": 1,
    # |Q|·TOP_K neighbor rows + |Q|-row prediction (literal-key-bounded
    # QUERY_IDS — the ann_lsh_cosine class)
    "knn_label_predict": 2,
    # sensitive-value-DOMAIN global distribution (≤ |priorities| rows)
    "t_closeness_profile": 1,
    # round-13 wave — every hinted side a 1-row scalar or a
    # catalog/domain-bounded aggregate:
    # 1-row corpus doc count
    "token_burstiness": 1,
    # 1-row key totals + 1-row p99 rank cut
    "join_key_skew_profile": 2,
    # 1-row (n_days, revenue_total)
    "page_hinkley_drift": 1,
    # 1-row horizon + 1-row per-arm user totals (+ subtree reuse)
    "logrank_test_conversion": 3,
    # 1-row base month + brand-DOMAIN base-basket weights (catalog-bounded)
    "price_index_laspeyres": 2,
    # 1-row OLS fit scalars (n, Σx, cxx, b, means)
    "newey_west_se": 1,
    # 64-row (DIM-bounded) global-centroid table
    "embedding_label_drift": 1,
    # 1-row arm totals over the bin-domain histogram
    "hellinger_value_histograms": 1,
    # 1-row (n_blocks, k_treatments) dims
    "friedman_test_types": 1,
    # documented O(n²) small-scale oracle for its LSH twin
    "embedding_near_dup": 1,
    # Misra-Gries candidates: ≤ partitions × capacity rows by construction
    "heavy_hitter_tokens": 1,
    # round-7 second wave — every broadcast side is an aggregate bounded
    # by an enum-sized key domain or a single row, at ANY data scale:
    # chi-square marginals: event_type-sized + 7-weekday-sized + 1-row N
    "chi_square_type_dow": 3,
    # PSI: 1-row epoch bounds + 1-row totals (+ the bounds join reused)
    "drift_psi_event_types": 3,
    # market basket: 1-row order count (part totals deliberately unhinted)
    "market_basket_pairs": 1,
    # rolling actives: observed-day list (calendar-bounded)
    "rolling_active_users": 1,
    # round-7 third wave — bounded-by-design broadcast sides:
    # BM25: df_t is |QUERY_TERMS| rows, corpus stats are 1 row, at ANY scale
    "bm25_search": 2,
    # RRF: the two BM25 sides above + the 1-row anchor embedding
    "rrf_hybrid_search": 3,
    # global-scalar threshold / argmax: one row crosses
    "q11_important_parts": 1,
    "q15_top_supplier": 1,
    # round-8 window→aggregate respelling: region totals (≤ |nations|
    # rows) + 1-row grand total broadcast back — the two relations that
    # used to be unpartitioned-window allowlist entries
    "share_of_parent": 2,
    # round-8 — bounded-by-design broadcast sides:
    # MI marginals, same shape as chi_square: |lang|-sized + |source|-sized
    # + 1-row N, at ANY data scale
    "mutual_information_lang_source": 3,
    # temperature mixing: 1-row sqrt-weight sum + |sources|-row rate table
    "temperature_mix_sample": 2,
    # shard offset table: GID_SHARDS rows by construction
    "contiguous_global_ids": 1,
    # v4 mix stage: 1-row weight sum + |sources|-row rate table (the
    # temperature_mix_sample pair, over the curated survivor set)
    "curation_pipeline_v4": 2,
    # CUPED: 1-row pooled theta/pre-mean broadcast back over the user table
    "cuped_ab_adjusted": 1,
    # round-8 final wave (statistical/layout) — every broadcast side is a
    # 1-row or enum-domain-bounded aggregate, safe at ANY data scale:
    # ANOVA: 1-row grand mean broadcast over the per-group table
    "anova_f_oneway": 1,
    # Benford: 1-row total-count broadcast over the 9-digit histogram
    "benford_digit_profile": 1,
    # PMI collocations: 1-row total bigram/unigram counts
    "bigram_collocations": 1,
    # CUSUM: two distinct 1-row hints (target mean, argmax-|S| peak) over
    # the bounded day-domain series; the count is 3 because the mean-hint
    # subtree is instantiated twice — the cusum relation is reused under
    # the peak argmax AND the outer aggregate, and each instantiation
    # carries its own copy of the hint node (sigma is a plain column, not
    # a broadcast)
    "cusum_changepoint": 3,
    # Kaplan-Meier: 1-row cohort size + 1-row horizon + risk-set offsets
    # over the bounded day-domain event table
    "kaplan_meier_conversion": 3,
    # token budget: 1-row corpus total + |sources|-row quota table +
    # 1-row remainder — Hamilton apportionment scalars
    "token_budget_apportion": 3,
    # Z-order: 1-row min/max bounds row for the interleave normalization
    "zorder_layout": 1,
    # round-10 distribution wave — every broadcast side is a 1-row scalar
    # or a day/enum-DOMAIN-bounded aggregate, safe at ANY data scale:
    # Theil-Sen: 1-row day count (the days-bounded pair-join side's hint
    # sits behind the localCheckpoint, invisible to the analyzed plan —
    # the bound covers both in case the checkpoint boundary moves)
    "theil_sen_daily_trend": 2,
    # ACF: 1-row mean hint (instantiated under each reuse of the centered
    # relation — lag spine, shifted side, and the SS subtree) + the 1-row
    # SS hint itself
    "acf_daily_revenue": 4,
    # entropy: |event_type|-row totals joined back over the 24-hour grid
    "entropy_hour_profile": 1,
    # HHI: |nation|-row totals joined back over the supplier relation
    "hhi_supplier_concentration": 1,
    # Hill: 1-row threshold (min of the k+1-row top-k relation)
    "hill_tail_index": 1,
    # Fano: calendar-bounded hour spine exploded from the 1-row bounds
    "fano_dispersion_hourly": 1,
    # Cramér's V: χ² marginals (|type|-sized + 7-dow-sized + 1-row N,
    # the chi_square_type_dow trio) + 1-row dims + nested colt-count reuse
    "cramers_v_type_dow": 5,
    # round-10 revenue-ops wave — bounded-by-design broadcast sides:
    # RFM: two distinct 1-row hints (corpus max date, quartile boundaries);
    # the count is 3 because the quartile-boundary subtree re-instantiates
    # the per-customer relation, which carries its own copy of the
    # max-date hint (the cusum_changepoint subtree-reuse effect) — every
    # instance is a 1-row aggregate, safe at ANY data scale
    "rfm_segments": 3,
    # LTV: cohort sizes keyed on first-order month (corpus-month-DOMAIN
    # bounded — ≤ 12 rows/year at ANY data scale)
    "ltv_cohort_curve": 1,
    # Cohen's kappa: 1-row marginal-product sum over the |labels|²-bounded
    # confusion relation
    "lang_id_agreement_kappa": 1,
    # round-10 mlfit wave — naive Bayes: every broadcast side is model-
    # sized, never data-sized: the |langs|×|vocab| smoothed-logprob model,
    # the 1-row vocab size nested under it, the |langs|-row prior, and the
    # 1-row train count — classifier PARAMETERS, bounded at ANY data scale
    "naive_bayes_lang": 4,
    # SAX: 1-row mean/std normalization constants over the day-domain table
    "sax_daily_motifs": 1,
    # bigram LM: 1-row vocabulary size (the unigram scorer's v, as a hint)
    "bigram_logprob_quality": 1,
    # cross-correlation: 1-row means + 1-row SS over the day-domain table;
    # the count is 4 because the centered relation (carrying the mean
    # hint) re-instantiates under the SS aggregate, the lag spine, AND the
    # shifted side (the acf_daily_revenue subtree-reuse effect) — every
    # instance is a 1-row aggregate, safe at ANY data scale
    "cross_corr_lagged": 4,
    # KMV growth curve: |days|-row per-day new-user counts + |days|×K-row
    # partial-sketch union — both day-DOMAIN bounded at ANY data scale
    "kmv_daily_cumulative": 2,
    # round-11 wave — bounded-by-design broadcast sides:
    # decision stump: the threshold spine is the distinct l_quantity
    # DOMAIN (~50 integers at ANY data scale — the counting_median
    # argument); the data-sized stage already collapsed to that domain
    "decision_stump_returns": 1,
    # periodogram: 1-row mean/count + 1-row SST normalizers over the
    # day-DOMAIN series; the count is 3 because the centered relation
    # (carrying the mean hint) re-instantiates under the SST aggregate
    # AND the period scan (the acf_daily_revenue subtree-reuse effect)
    "periodogram_daily": 3,
    # round-11 quant wave — every broadcast side is a 1-row scalar or a
    # day-DOMAIN-bounded relation, safe at ANY data scale:
    # basket rules: 1-row order count (the market_basket_pairs hint)
    "assoc_rules_confidence": 1,
    # Chow: 1-row midpoint bounds (instantiated under the segment
    # moments AND the final select) + 1-row pooled-SSR + its nested
    # bounds copy — all 1-row aggregates
    "chow_test_break": 4,
    # assortativity: 1-row node count
    "degree_assortativity": 1,
    # JSD: two 1-row token totals over the vocab-bounded count tables
    "jensen_shannon_sources": 2,
    # Kendall τ-b: day-DOMAIN pair side (the theil_sen broadcast) +
    # 1-row day count + two tie-correction aggregates over day-domain
    # groupings — all calendar-bounded
    "kendall_tau_daily": 4,
    # Mann-Kendall: day-DOMAIN pair side + 1-row day count + 1-row tie
    # term
    "mann_kendall_trend": 3,
    # runs test: 1-row median broadcast over the day-DOMAIN series
    "runs_test_daily": 1,
    # round-15 wave — every hinted side a 1-row scalar or a bounded-by-
    # design relation (measured counts, kept exact so a new bad hint
    # can't hide behind slack):
    # 1-row (n, mu) exact-center row broadcast onto the deviation pass
    "jarque_bera_daily": 1,
    # 1-row (n, k) tail-size scalar joined onto the ordered returns
    "var_cvar_daily": 1,
    # 1-row day count broadcast into the doubled-midrank projection
    "bartels_rank_test": 1,
    # day-DOMAIN pair side (the mann_kendall/theil_sen broadcast) +
    # 1-row day count + 1-row per-season base + 1-row tie term
    "seasonal_mann_kendall": 4,
    # k·|Q| neighbor rows (corpus labels STREAM against it — the
    # knn_label_predict shape) + |Q|-row query-label row + label-DOMAIN
    # count relation
    "retrieval_eval_at_k": 3,
    # inherited from the composed ann_ivf_cosine subplan (its bounded
    # query-list side; the brute side hints nothing)
    "ann_recall_at_k": 1,
    # max drawdown: 1-row max-drawdown scalar joined back over the
    # day-DOMAIN table + 1-row day count
    "max_drawdown_revenue": 2,
}


def _fact_broadcast_hints(spark, fn, sf_dir):
    """Count ResolvedHint(broadcast) nodes whose subtree scans a fact
    relation in the analyzed (pre-optimization) logical plan."""
    lines = (
        fn(spark, sf_dir)._jdf.queryExecution().analyzed().toString().splitlines()
    )
    hits = 0
    for i, ln in enumerate(lines):
        if "ResolvedHint" not in ln or "broadcast" not in ln:
            continue
        ind = len(ln) - len(ln.lstrip(" :+|-"))
        sub = []
        for nxt in lines[i + 1:]:
            if len(nxt) - len(nxt.lstrip(" :+|-")) <= ind:
                break
            sub.append(nxt)
        subtxt = "\n".join(sub)
        if any(
            re.search(rf"Relation \[[^\]]*{c}#", subtxt)
            for c in _FACT_COLS.values()
        ):
            hits += 1
    return hits


def test_no_unjustified_forced_broadcast_over_facts(spark, sf_dir):
    offenders = {}
    for name, fn in sorted(registry.queries().items()):
        n = _fact_broadcast_hints(spark, fn, sf_dir)
        if n > _ALLOWED_FACT_BROADCASTS.get(name, 0):
            offenders[name] = n
    assert offenders == {}, (
        "forced broadcast hint(s) above a fact-derived relation — drop the "
        f"hint (let AQE decide) or justify in the allowlist: {offenders}"
    )
