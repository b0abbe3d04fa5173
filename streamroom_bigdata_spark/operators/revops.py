"""Revenue-ops / marketing analytics wave (round 10; SURVEY.md §2.21).

The reference's observable surface is a booking-events recommendation job
(`processing.scala:71-149`); these are the revenue/marketing questions the
same team asks over the identical tables next: who are our best customers
(RFM), which touchpoints earn the purchase credit (multi-touch attribution),
how does cohort value accumulate (LTV curves), what do users do in sequence
(path mining), which catalog entries are efficient (skyline), and does the
order ledger reconcile against its line items (cross-table audit).

Every query is shuffle-disciplined for the 100 TB case:

- per-entity aggregation keyed on the natural key (custkey / user_id /
  orderkey) — one data-sized hash shuffle with map-side partials;
- quartile boundaries and global scalars cross as 1-row broadcast
  aggregates, never via an unpartitioned window (the
  ``quartiles_distributed`` lesson);
- windows are partitioned by a data-sized key (purchase id, user, cohort)
  so no relation funnels through one task;
- top-k is ``orderBy().limit()`` → TakeOrderedAndProject (per-partition
  heaps, no global sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# RFM segmentation (recency / frequency / monetary quartile scores)
# ---------------------------------------------------------------------------

_RFM_SEGMENT_SQL = """
CASE WHEN r_score >= 3 AND f_score >= 3 AND m_score >= 3 THEN 'champion'
     WHEN r_score >= 3 AND f_score < 3 THEN 'new_or_promising'
     WHEN r_score < 3 AND f_score >= 3 THEN 'at_risk_loyal'
     ELSE 'hibernating' END
"""

rfm_oracle = f"""
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
           AS recency_days,
         count(*) AS frequency,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders GROUP BY o_custkey
), bounds AS (
  SELECT quantile_cont(recency_days, 0.25) AS r1,
         quantile_cont(recency_days, 0.50) AS r2,
         quantile_cont(recency_days, 0.75) AS r3,
         quantile_cont(frequency, 0.25) AS f1,
         quantile_cont(frequency, 0.50) AS f2,
         quantile_cont(frequency, 0.75) AS f3,
         quantile_cont(cents, 0.25) AS m1,
         quantile_cont(cents, 0.50) AS m2,
         quantile_cont(cents, 0.75) AS m3
  FROM per_cust
), scored AS (
  SELECT CAST(1 + CAST(recency_days <= r3 AS INT) + CAST(recency_days <= r2 AS INT)
           + CAST(recency_days <= r1 AS INT) AS INT) AS r_score,
         CAST(1 + CAST(frequency > f1 AS INT) + CAST(frequency > f2 AS INT)
           + CAST(frequency > f3 AS INT) AS INT) AS f_score,
         CAST(1 + CAST(cents > m1 AS INT) + CAST(cents > m2 AS INT)
           + CAST(cents > m3 AS INT) AS INT) AS m_score,
         cents
  FROM per_cust CROSS JOIN bounds
)
SELECT r_score, f_score, m_score, {_RFM_SEGMENT_SQL} AS segment,
       count(*) AS n_customers,
       ((2 * sum(cents) + count(*)) // (2 * count(*))) / 100.0
         AS avg_monetary
FROM scored GROUP BY r_score, f_score, m_score
"""


@register("rfm_segments", rfm_oracle)
def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: per-customer recency (days since last
    order, vs the corpus max date), frequency (order count), monetary
    (rounded revenue sum), quartile-scored 1-4 on each axis, rolled up to
    segment cells.

    Scale shape: ONE data-sized shuffle (orders → custkey aggregate with
    map-side partials). The corpus max date and the nine quartile
    boundaries cross as 1-row broadcast aggregates — exact
    ``F.percentile`` matches DuckDB's ``quantile_cont`` interpolation bit
    for bit (see relational.py's quantile note) — so no unpartitioned
    window exists anywhere; the ntile route would funnel the customer
    relation through one task. Monetary is rounded to cents BEFORE
    quartiling so cross-engine float-sum noise cannot flip a boundary
    comparison. Final aggregate is ≤64 cells.

    Boundary-tie exemption (round-13 sweep after the gains_chart
    defect): this query DOES assign membership against interpolated
    boundaries, but every quantity is EXACT — the data are integers
    (cents/days/counts < 2⁵⁰) and quartile interpolation fractions are
    exact binary values (0.25/0.5/0.75), so a·(1−f) + b·f and
    a + f·(b−a) both evaluate to the identical exact double on any
    engine and formula: the 1-ulp window the gains defect lived in does
    not exist here. Non-binary grid fractions (deciles' 0.1…) would
    reintroduce it — that class uses integer rank cuts instead."""
    orders = load_table(spark, sf_dir, "orders")
    max_date = orders.agg(
        F.max(F.col("o_orderdate").cast("date")).alias("corpus_max_date")
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.col("o_orderdate").cast("date")).alias("last_date"),
            F.count("*").alias("frequency"),
            # exact integer cents (per-row round is engine-identical, the
            # bigint sum exact) — a double revenue sum's accumulation-order
            # noise could flip a quartile-boundary comparison
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            ),
        )
        .join(F.broadcast(max_date))  # 1-row scalar: allowlisted
        .select(
            F.datediff("corpus_max_date", "last_date").alias("recency_days"),
            "frequency",
            "cents",
        )
    )
    bounds = per_cust.agg(
        F.percentile("recency_days", [0.25, 0.5, 0.75]).alias("rq"),
        F.percentile("frequency", [0.25, 0.5, 0.75]).alias("fq"),
        F.percentile("cents", [0.25, 0.5, 0.75]).alias("mq"),
    )
    scored = per_cust.join(F.broadcast(bounds)).select(
        (
            F.lit(1)
            + (F.col("recency_days") <= F.col("rq")[2]).cast("int")
            + (F.col("recency_days") <= F.col("rq")[1]).cast("int")
            + (F.col("recency_days") <= F.col("rq")[0]).cast("int")
        ).alias("r_score"),
        (
            F.lit(1)
            + (F.col("frequency") > F.col("fq")[0]).cast("int")
            + (F.col("frequency") > F.col("fq")[1]).cast("int")
            + (F.col("frequency") > F.col("fq")[2]).cast("int")
        ).alias("f_score"),
        (
            F.lit(1)
            + (F.col("cents") > F.col("mq")[0]).cast("int")
            + (F.col("cents") > F.col("mq")[1]).cast("int")
            + (F.col("cents") > F.col("mq")[2]).cast("int")
        ).alias("m_score"),
        "cents",
    )
    return (
        scored.withColumn("segment", F.expr(_RFM_SEGMENT_SQL))
        .groupBy("r_score", "f_score", "m_score", "segment")
        .agg(
            F.count("*").alias("n_customers"),
            # exact-integer half-up average in cents (see ltv_cohort_curve:
            # rounding the double mean hits half-cent boundaries where the
            # two engines' round() semantics diverge)
            (
                F.expr(
                    "(2 * sum(cents) + count(*)) div (2 * count(*))"
                )
                / 100.0
            ).alias("avg_monetary"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution (linear + U-shaped position weighting)
# ---------------------------------------------------------------------------

ATTRIB_WINDOW_DAYS = 7

attribution_oracle = f"""
WITH p AS (
  SELECT event_id AS p_id, user_id, ts AS p_ts, value AS revenue
  FROM events WHERE event_type = 'purchase'
), t AS (
  SELECT user_id, ts AS t_ts, event_type AS touch_type, event_id AS t_id
  FROM events WHERE event_type IN ('click', 'view')
), joined AS (
  SELECT p.p_id, p.revenue, t.touch_type,
         row_number() OVER (PARTITION BY p.p_id ORDER BY t.t_ts, t.t_id)
           AS pos,
         count(*) OVER (PARTITION BY p.p_id) AS n
  FROM p JOIN t ON p.user_id = t.user_id
   AND t.t_ts <= p.p_ts
   AND t.t_ts > p.p_ts - INTERVAL {ATTRIB_WINDOW_DAYS} DAY
), credited AS (
  SELECT touch_type, revenue / n AS credit_linear,
         revenue * (CASE WHEN n = 1 THEN 1.0
                         WHEN pos = 1 OR pos = n THEN
                           CASE WHEN n = 2 THEN 0.5 ELSE 0.4 END
                         ELSE 0.2 / (n - 2) END) AS credit_u
  FROM joined
)
SELECT touch_type, count(*) AS n_touches,
       round(sum(credit_linear), 4) AS credit_linear,
       round(sum(credit_u), 4) AS credit_u
FROM credited GROUP BY touch_type
"""


@register("multi_touch_attribution", attribution_oracle)
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch revenue attribution: every purchase's value is credited
    across the user's click/view touches in the preceding 7 days — equally
    (linear) and position-weighted (U-shaped: 40% first touch, 40% last,
    20% split over the middle; 100%/50-50 for 1-2 touches).

    Scale shape: two filtered scans of events (predicate pushed to
    parquet), ONE user_id-keyed shuffle join with a time-band predicate —
    candidate pairs are bounded per user by the 7-day band, so skew tracks
    the per-user event rate, not the corpus. Position/count windows
    partition by purchase id (data-sized key, fully parallel). Final
    aggregate is |touch types| rows."""
    events = load_table(spark, sf_dir, "events")
    p = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("revenue"),
    )
    t = events.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("touch_type"),
        F.col("event_id").alias("t_id"),
    )
    joined = p.join(
        t,
        (p.user_id == t.user_id)
        & (t.t_ts <= p.p_ts)
        & (
            t.t_ts
            > p.p_ts - F.expr(f"INTERVAL {ATTRIB_WINDOW_DAYS} DAYS")
        ),
    )
    w = Window.partitionBy("p_id")
    joined = joined.select(
        "p_id",
        "revenue",
        "touch_type",
        F.row_number().over(w.orderBy("t_ts", "t_id")).alias("pos"),
        F.count("*").over(w).alias("n"),
    )
    n, pos = F.col("n"), F.col("pos")
    u_weight = (
        F.when(n == 1, F.lit(1.0))
        .when(
            (pos == 1) | (pos == n),
            F.when(n == 2, F.lit(0.5)).otherwise(F.lit(0.4)),
        )
        .otherwise(F.lit(0.2) / (n - 2))
    )
    return (
        joined.select(
            "touch_type",
            (F.col("revenue") / n).alias("credit_linear"),
            (F.col("revenue") * u_weight).alias("credit_u"),
        )
        .groupBy("touch_type")
        .agg(
            F.count("*").alias("n_touches"),
            F.round(F.sum("credit_linear"), 4).alias("credit_linear"),
            F.round(F.sum("credit_u"), 4).alias("credit_u"),
        )
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve (cumulative revenue per cohort customer by age)
# ---------------------------------------------------------------------------

ltv_oracle = """
WITH firsts AS (
  SELECT o_custkey, min(o_orderdate) AS first_dt
  FROM orders GROUP BY o_custkey
), cohort_sizes AS (
  SELECT CAST(year(first_dt) * 100 + month(first_dt) AS INT) AS cohort_ym,
         count(*) AS cohort_customers
  FROM firsts GROUP BY 1
), aged AS (
  SELECT CAST(year(f.first_dt) * 100 + month(f.first_dt) AS INT) AS cohort_ym,
         (year(o.o_orderdate) * 12 + month(o.o_orderdate))
           - (year(f.first_dt) * 12 + month(f.first_dt)) AS age_months,
         CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
), monthly AS (
  SELECT cohort_ym, CAST(age_months AS BIGINT) AS age_months,
         count(*) AS n_orders, sum(cents) AS month_cents
  FROM aged GROUP BY cohort_ym, age_months
), cum AS (
  SELECT cohort_ym, age_months, n_orders,
         sum(month_cents) OVER (
           PARTITION BY cohort_ym ORDER BY age_months
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM monthly
)
SELECT c.cohort_ym, c.age_months, c.n_orders,
       round(c.cum_cents / 100.0, 2) AS cum_revenue,
       ((2 * c.cum_cents + s.cohort_customers)
          // (2 * s.cohort_customers)) / 100.0 AS ltv_per_customer
FROM cum c JOIN cohort_sizes s ON c.cohort_ym = s.cohort_ym
"""


@register("ltv_cohort_curve", ltv_oracle)
def ltv_cohort_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers cohorted by first-order
    month; per (cohort, age-in-months) order count and revenue; running
    cumulative revenue divided by cohort size = LTV per cohort customer.

    Scale shape: custkey aggregate (data-sized shuffle #1), custkey
    shuffle join back to orders (same key — AQE reuses the partitioning),
    then a (cohort, age) aggregate that is calendar²-bounded. The cumsum
    window partitions by cohort (bounded rows per partition: corpus month
    span). Cohort sizes are a month-domain-bounded aggregate broadcast
    back (allowlisted fact-derived broadcast)."""
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt")
    )
    ym = F.year("first_dt") * 100 + F.month("first_dt")
    cohort_sizes = firsts.groupBy(
        ym.cast("int").alias("cohort_ym")
    ).agg(F.count("*").alias("cohort_customers"))
    aged = orders.join(firsts, "o_custkey").select(
        ym.cast("int").alias("cohort_ym"),
        (
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            - (F.year("first_dt") * 12 + F.month("first_dt"))
        )
        .cast("bigint")
        .alias("age_months"),
        # exact integer cents: per-row round is engine-identical, and the
        # bigint cumsum below is then EXACT — a double cumsum's
        # accumulation-order noise flips 2-decimal rounding at boundaries
        F.round(F.col("o_totalprice") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    monthly = aged.groupBy("cohort_ym", "age_months").agg(
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("month_cents"),
    )
    w = (
        Window.partitionBy("cohort_ym")
        .orderBy("age_months")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        monthly.withColumn("cum_cents", F.sum("month_cents").over(w))
        # month-domain-bounded aggregate (≤ corpus month span rows)
        .join(F.broadcast(cohort_sizes), "cohort_ym")
        .select(
            "cohort_ym",
            "age_months",
            "n_orders",
            F.round(F.col("cum_cents") / 100.0, 2).alias("cum_revenue"),
            # exact-integer half-up rounding to whole cents: cum/size lands
            # ON a half-cent whenever size divides 2*cum oddly (size=2 does
            # it constantly), where Spark's BigDecimal HALF_UP and DuckDB's
            # binary-double round() disagree — so never round that double
            (
                F.expr(
                    "(2 * cum_cents + cohort_customers) "
                    "div (2 * cohort_customers)"
                )
                / 100.0
            ).alias("ltv_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# Frequent event sequences (per-user trigram path mining)
# ---------------------------------------------------------------------------

SEQ_TOP_K = 25

sequences_oracle = f"""
WITH hops AS (
  SELECT event_type AS t0,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT concat(t0, '>', t1, '>', t2) AS seq, count(*) AS n
FROM hops WHERE t1 IS NOT NULL AND t2 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, seq ASC LIMIT {SEQ_TOP_K}
"""


@register("frequent_event_sequences", sequences_oracle)
def frequent_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential path mining lite: the top-{K} most frequent 3-step
    event-type sequences across users (consecutive events per user in
    timestamp order).

    Scale shape: one user_id shuffle feeds the lead() window (partitioned
    by user — fully parallel, skew bounded by per-user event counts), the
    trigram aggregate is |event types|³-bounded (125 cells here), and the
    top-k is orderBy+limit → TakeOrderedAndProject per-partition heaps.
    Deterministic under ties: (count desc, seq asc) is a total order."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = events.select(
        F.col("event_type").alias("t0"),
        F.lead("event_type", 1).over(w).alias("t1"),
        F.lead("event_type", 2).over(w).alias("t2"),
    )
    return (
        hops.filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
        .select(F.concat_ws(">", "t0", "t1", "t2").alias("seq"))
        .groupBy("seq")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("seq"))
        .limit(SEQ_TOP_K)
    )


# ---------------------------------------------------------------------------
# Pareto frontier (skyline) over the part catalog
# ---------------------------------------------------------------------------

pareto_oracle = """
WITH s AS (
  SELECT p_size, min(p_retailprice) AS min_price_at_size
  FROM part GROUP BY p_size
), m AS (
  SELECT a.p_size, min(b.min_price_at_size) AS strict_prefix_min
  FROM s a LEFT JOIN s b ON b.p_size < a.p_size
  GROUP BY a.p_size
)
SELECT p.p_partkey, p.p_size, p.p_retailprice
FROM part p
JOIN s ON p.p_size = s.p_size
JOIN m ON p.p_size = m.p_size
WHERE p.p_retailprice = s.min_price_at_size
  AND (m.strict_prefix_min IS NULL
       OR m.strict_prefix_min > p.p_retailprice)
"""


@register("pareto_frontier_parts", pareto_oracle)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline query: parts Pareto-optimal on (p_size, p_retailprice), both
    minimized — part A dominates B iff size ≤, price ≤, one strict. The
    classic OLAP skyline, computed WITHOUT the naive all-pairs anti-join:
    per-size min price (size-DOMAIN-bounded, ~50 rows), strict-prefix min
    over sizes via a triangle self-join of that bounded table (no window,
    no single-partition funnel), broadcast back over the full catalog.
    A part survives iff it is the cheapest at its size AND strictly
    cheaper than everything smaller. O(domain²) driver-free arithmetic +
    one broadcast join at ANY scale; equal (size, price) duplicates are
    both non-dominated and both kept."""
    part = load_table(spark, sf_dir, "part")
    s = part.groupBy("p_size").agg(
        F.min("p_retailprice").alias("min_price_at_size")
    )
    a, b = s.alias("a"), s.alias("b")
    m = (
        a.join(b, F.col("b.p_size") < F.col("a.p_size"), "left")
        .groupBy(F.col("a.p_size").alias("p_size"))
        .agg(
            F.min(F.col("b.min_price_at_size")).alias("strict_prefix_min")
        )
    )
    dims = F.broadcast(s.join(m, "p_size"))
    return (
        part.join(dims, "p_size")
        .filter(
            (F.col("p_retailprice") == F.col("min_price_at_size"))
            & (
                F.col("strict_prefix_min").isNull()
                | (F.col("strict_prefix_min") > F.col("p_retailprice"))
            )
        )
        .select("p_partkey", "p_size", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# Order ledger reconciliation (orders vs recomputed lineitem totals)
# ---------------------------------------------------------------------------

reconcile_oracle = """
WITH li AS (
  SELECT l_orderkey,
         sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS computed
  FROM lineitem GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderkey, o.o_totalprice, li.computed,
         abs(o.o_totalprice - li.computed)
           / nullif(o.o_totalprice, 0) AS rel_diff
  FROM orders o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
), classed AS (
  SELECT CASE WHEN o_orderkey IS NULL THEN 'orphan_lineitems'
              WHEN computed IS NULL THEN 'no_lineitems'
              WHEN rel_diff <= 0.1 THEN 'close'
              WHEN rel_diff <= 0.5 THEN 'drift'
              WHEN rel_diff <= 1.0 THEN 'large'
              ELSE 'severe' END AS status,
         rel_diff
  FROM j
)
SELECT status, count(*) AS n_orders,
       round(quantile_cont(rel_diff, 0.5), 4) AS median_rel_diff,
       round(max(rel_diff), 4) AS max_rel_diff
FROM classed GROUP BY status
"""


@register("order_price_reconcile", reconcile_oracle)
def order_price_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table ledger audit: recompute each order's total from its
    line items (extended price net of discount, plus tax) and classify the
    relative drift against o_totalprice — including referential failures
    in BOTH directions (orders with no line items, orphan line items) via
    a full-outer join. The per-class report carries median and max
    relative drift.

    Scale shape: lineitem → orderkey aggregate (data-sized shuffle with
    map-side partials), full-outer shuffle join on the same key (no
    re-partition), |classes|-bounded final aggregate. Exact interpolated
    percentile matches quantile_cont cross-engine."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    li = lineitem.groupBy("l_orderkey").agg(
        F.sum(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
        ).alias("computed")
    )
    j = orders.join(
        li, orders.o_orderkey == li.l_orderkey, "full_outer"
    ).select(
        "o_orderkey",
        "computed",
        (
            F.abs(F.col("o_totalprice") - F.col("computed"))
            / F.nullif(F.col("o_totalprice"), F.lit(0))
        ).alias("rel_diff"),
    )
    rel = F.col("rel_diff")
    status = (
        F.when(F.col("o_orderkey").isNull(), "orphan_lineitems")
        .when(F.col("computed").isNull(), "no_lineitems")
        .when(rel <= 0.1, "close")
        .when(rel <= 0.5, "drift")
        .when(rel <= 1.0, "large")
        .otherwise("severe")
    )
    return (
        j.select(status.alias("status"), "rel_diff")
        .groupBy("status")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.percentile("rel_diff", 0.5), 4).alias(
                "median_rel_diff"
            ),
            F.round(F.max("rel_diff"), 4).alias("max_rel_diff"),
        )
    )


# ---------------------------------------------------------------------------
# Price elasticity by brand (log-log demand regression)
# ---------------------------------------------------------------------------

elasticity_oracle = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(ln(l.l_quantity),
                        ln(l.l_extendedprice / l.l_quantity)), 6)
         AS elasticity,
       round(regr_r2(ln(l.l_quantity),
                     ln(l.l_extendedprice / l.l_quantity)), 6) AS r2
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
GROUP BY p.p_brand
"""


@register("price_elasticity_brand", elasticity_oracle)
def price_elasticity_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Own-price demand elasticity per brand: slope of ln(quantity) on
    ln(unit price) — the log-log regression whose coefficient IS the
    elasticity — plus R² as the trust signal, via the single-pass
    ``regr_*`` streaming moments (`regression_trend` precedent: ratios of
    centered sums, accumulation-order noise cancels at round-6).

    Scale shape: lineitem ⋈ broadcast part (dimension), one |brands|-sized
    combinable aggregate — no data-sized relation survives the first
    shuffle."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = (
        lineitem.filter(
            (F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0)
        )
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .select(
            "p_brand",
            F.log(F.col("l_quantity")).alias("ln_q"),
            F.log(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "ln_p"
            ),
        )
    )
    return j.groupBy("p_brand").agg(
        F.count("*").alias("n"),
        F.round(F.regr_slope("ln_q", "ln_p"), 6).alias("elasticity"),
        F.round(F.regr_r2("ln_q", "ln_p"), 6).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Laspeyres / Paasche / Fisher price indexes (round 13)
# ---------------------------------------------------------------------------

price_index_oracle = """
WITH bm AS (
  SELECT p.p_brand AS brand,
         CAST(year(l.l_shipdate) * 100 + month(l.l_shipdate) AS BIGINT)
           AS ym,
         CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), priced AS (
  SELECT brand, ym, qty,
         CAST((CAST(cents AS HUGEINT) * 20000 + qty) // (2 * qty)
              AS BIGINT) AS p_micro
  FROM bm
), base AS (
  SELECT min(ym) AS ym0 FROM priced
), b0 AS (
  SELECT brand, qty AS q0, p_micro AS p0
  FROM priced, base WHERE ym = ym0
), joined AS (
  SELECT m.ym, m.brand, m.qty AS qm, m.p_micro AS pm, b.q0, b.p0
  FROM priced m JOIN b0 b USING (brand)
)
SELECT ym AS month,
       CAST(count(*) AS BIGINT) AS n_brands,
       round(CAST(sum(CAST(q0 AS HUGEINT) * pm) AS DOUBLE)
             / sum(CAST(q0 AS HUGEINT) * p0), 6) AS laspeyres,
       round(CAST(sum(CAST(qm AS HUGEINT) * pm) AS DOUBLE)
             / sum(CAST(qm AS HUGEINT) * p0), 6) AS paasche,
       round(sqrt((CAST(sum(CAST(q0 AS HUGEINT) * pm) AS DOUBLE)
                   / sum(CAST(q0 AS HUGEINT) * p0))
                  * (CAST(sum(CAST(qm AS HUGEINT) * pm) AS DOUBLE)
                     / sum(CAST(qm AS HUGEINT) * p0))), 6)
         AS fisher
FROM joined GROUP BY ym
"""


@register("price_index_laspeyres", price_index_oracle)
def price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly Laspeyres, Paasche and Fisher price indexes over the
    brand basket (base = the corpus's first month): Laspeyres weights
    price relatives by BASE-month quantities ("what would the old
    basket cost now"), Paasche by CURRENT quantities, Fisher is their
    geometric mean — the econometric price-level readout
    `mom_revenue_growth` (revenue mixes price AND volume) and
    `price_elasticity_brand` (per-brand response) both lack. Brands
    absent from the base month drop from the basket (standard
    fixed-basket convention; n_brands tracks coverage).

    Exactness: unit price per (brand, month) is an exact cents/qty
    rational quantized ONCE to 10⁻⁴ cents (floor(E·10⁴/Q + 0.5),
    identical IEEE ops both engines); every index numerator/denominator
    is then an EXACT integer Σq·p_micro, divided once — no float
    accumulation anywhere.

    Shape: one combinable (brand, month) groupBy over the
    part-broadcast join is the data-sized stage; everything after runs
    on the brand×month domain (bounded by catalog × calendar at ANY
    data scale); base-month weights broadcast back via a brand-keyed
    join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.year("l_shipdate") * 100 + F.month("l_shipdate"))
        .cast("bigint")
        .alias("ym"),
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    bm = (
        li.join(F.broadcast(part), "l_partkey")
        .groupBy("brand", "ym")
        .agg(F.sum("cents").alias("cents"), F.sum("qty").alias("qty"))
    )
    # p_micro is derived by EXACT integer round-half-up
    # (cents·20000 + qty) div (2·qty) — the cents product runs in
    # decimal(38,0) on Spark / HUGEINT in the oracle, so no double ever
    # touches the price (cents·10000.0 loses exactness above 2^53;
    # round-14 ADVICE fix). Round-15 ADVICE fix: the division is Spark's
    # integral DIV (IntegralDivide), not F.floor over a decimal `/` —
    # decimal division rounds HALF_UP at scale 6 BEFORE the floor, so a
    # quotient within 1e-6 of an integer (reachable once monthly qty
    # nears 1e6) floored one too high vs the oracle's exact HUGEINT `//`.
    priced = bm.select(
        "brand",
        "ym",
        "qty",
        F.expr(
            "CAST((CAST(cents AS DECIMAL(38,0)) * 20000 + qty) "
            "DIV (qty * 2) AS BIGINT)"
        ).alias("p_micro"),
    )
    base = priced.agg(F.min("ym").alias("ym0"))
    b0 = (
        priced.crossJoin(F.broadcast(base))
        .filter(F.col("ym") == F.col("ym0"))
        .select(
            "brand", F.col("qty").alias("q0"), F.col("p_micro").alias("p0")
        )
    )
    # Quantity×price products and their sums run in decimal(38,0) (Spark
    # int64 wraps silently with ANSI off; the oracle promotes to HUGEINT)
    # — the granger/bollinger exact-accumulation discipline.
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    joined = priced.join(F.broadcast(b0), "brand").select(
        "ym",
        (dec("q0") * dec("p_micro")).alias("l_num"),
        (dec("q0") * dec("p0")).alias("l_den"),
        (dec("qty") * dec("p_micro")).alias("p_num"),
        (dec("qty") * dec("p0")).alias("p_den"),
    )
    lasp = F.sum("l_num").cast("double") / F.sum("l_den")
    paas = F.sum("p_num").cast("double") / F.sum("p_den")
    return joined.groupBy("ym").agg(
        F.count("*").alias("n_brands"),
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    ).select(
        F.col("ym").alias("month"), "n_brands", "laspeyres", "paasche",
        "fisher",
    )


# ---------------------------------------------------------------------------
# Round-14: net / gross revenue retention (the SaaS-metric pair the LTV and
# retention-cohort readouts don't give directly)
# ---------------------------------------------------------------------------

nrr_oracle = """
WITH rev AS (
  SELECT o_custkey AS cust,
         CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT) AS ym,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
), paired AS (
  SELECT p.ym AS prev_ym,
         CASE WHEN p.ym % 100 = 12 THEN p.ym + 89 ELSE p.ym + 1 END
           AS month,
         p.cents AS prev_cents, coalesce(c.cents, 0) AS cur_cents
  FROM rev p LEFT JOIN rev c
    ON c.cust = p.cust
   AND c.ym = CASE WHEN p.ym % 100 = 12 THEN p.ym + 89 ELSE p.ym + 1 END
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_base,
       CAST(sum(CASE WHEN cur_cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_retained,
       floor(CAST(sum(CAST(cur_cents AS HUGEINT)) AS DOUBLE)
             / CAST(sum(CAST(prev_cents AS HUGEINT)) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS nrr,
       floor(CAST(sum(CAST(least(cur_cents, prev_cents) AS HUGEINT))
                  AS DOUBLE)
             / CAST(sum(CAST(prev_cents AS HUGEINT)) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS grr
FROM paired
GROUP BY month
"""


@register("net_revenue_retention", nrr_oracle)
def net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NET and GROSS revenue retention per calendar month: for every
    customer with revenue in month m−1 (the base book), how much of that
    book's revenue recurs in m — NRR includes expansion (a growing
    account can push it past 1), GRR caps each account at its prior
    spend (min(cur, prev): pure churn+contraction, never above 1). The
    pair the board asks for that ``retention_cohorts`` (logo counts) and
    ``ltv_cohort_curve`` (forward cumulative) don't directly give.

    Exactness: revenue is exact integer cents end-to-end; the two ratios
    are single divisions of exact HUGEINT/DECIMAL sums. Scale shape: one
    combinable (customer, month) groupBy is the data-sized stage; the
    month-to-next self-join is customer-keyed (shuffle_hash pinned both
    ways — both sides grow with the customer book, the sf≈10 audit rule)
    and everything after runs on the month domain."""
    rev = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("cust"),
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("bigint")
            .alias("ym"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("cust", "ym")
        .agg(F.sum("c").alias("cents"))
    )
    nxt = F.when(F.col("ym") % 100 == 12, F.col("ym") + 89).otherwise(
        F.col("ym") + 1
    )
    prev = rev.select(
        "cust", nxt.alias("month"), F.col("cents").alias("prev_cents")
    )
    cur = rev.select(
        "cust", F.col("ym").alias("month"), F.col("cents").alias("cur_cents")
    )
    paired = prev.hint("shuffle_hash").join(
        cur.hint("shuffle_hash"), ["cust", "month"], "left"
    ).select(
        "month",
        "prev_cents",
        F.coalesce(F.col("cur_cents"), F.lit(0)).alias("cur_cents"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = paired.groupBy("month").agg(
        F.count("*").alias("n_base"),
        F.sum((F.col("cur_cents") > 0).cast("long")).alias("n_retained"),
        F.sum(dec(F.col("cur_cents"))).alias("cur_s"),
        F.sum(dec(F.col("prev_cents"))).alias("prev_s"),
        F.sum(dec(F.least("cur_cents", "prev_cents"))).alias("kept_s"),
    )
    r6 = lambda c: F.floor(c * 1000000 + 0.5) / 1000000  # noqa: E731
    return agg.select(
        "month",
        F.col("n_base").cast("long").alias("n_base"),
        F.col("n_retained").cast("long").alias("n_retained"),
        r6(F.col("cur_s").cast("double") / F.col("prev_s").cast("double"))
        .alias("nrr"),
        r6(F.col("kept_s").cast("double") / F.col("prev_s").cast("double"))
        .alias("grr"),
    )
