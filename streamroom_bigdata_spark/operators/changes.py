"""Temporal change analytics: SCD2 change compression, gaps-and-islands,
rolling distinct actives, distribution drift, deterministic mode.

The warehouse-maintenance shapes a pipeline team runs on top of the event
store (SURVEY.md §2.16). All are window/aggregate column algebra — no UDFs,
one user-keyed (or type-keyed) shuffle each, output-sized final aggregates.

Reference anchor: the reference's store keeps only latest-state documents
(consumer.scala upserts); these queries are the history-tracking /
monitoring surface such a store needs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_ms
from ..registry import register
from ..sources import load_table

# --- SCD Type 2: compress an event stream into effective-dated history -----

scd2_oracle = """
WITH ordered AS (
  SELECT user_id, event_type,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS ts_ms,
         lag(event_type) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         ) AS prev_type
  FROM events
), changes AS (
  SELECT user_id, event_type, ts_ms AS valid_from_ms
  FROM ordered
  WHERE prev_type IS NULL OR prev_type <> event_type
)
SELECT user_id, event_type, valid_from_ms,
       lead(valid_from_ms) OVER (
         PARTITION BY user_id ORDER BY valid_from_ms, event_type
       ) AS valid_to_ms,
       CAST(lead(valid_from_ms) OVER (
         PARTITION BY user_id ORDER BY valid_from_ms, event_type
       ) IS NULL AS INT) AS is_current
FROM changes
"""


@register("scd2_type_history", scd2_oracle)
def scd2_type_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 change compression: collapse each user's event stream
    into effective-dated runs of the tracked attribute (event_type) —
    [valid_from, valid_to) intervals with an is_current flag, the standard
    slowly-changing-dimension history build.

    Two window passes over ONE user_id-keyed exchange: lag() marks change
    rows (run starts), and after the filter the lead() pass reuses the
    same hash partitioning (user_id survives the filter), so no second
    shuffle. Ties in ts are totally ordered by the unique event_id.

    100 TB note: state per user is its event history within a partition —
    no driver state, no iteration; output is change-sized (runs), not
    event-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            "event_type",
            epoch_ms("ts").alias("valid_from_ms"),
        )
    )
    # event_type tiebreaker: two change rows CAN share a millisecond (A→B→A
    # within one ms); their types necessarily differ, so (ms, type) is a
    # total order and lead() is deterministic on both engines
    w2 = Window.partitionBy("user_id").orderBy("valid_from_ms", "event_type")
    valid_to = F.lead("valid_from_ms").over(w2)
    return changes.select(
        "user_id",
        "event_type",
        "valid_from_ms",
        valid_to.alias("valid_to_ms"),
        valid_to.isNull().cast("int").alias("is_current"),
    )


# --- Gaps and islands: consecutive-day activity runs ------------------------

gaps_islands_oracle = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
), numbered AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY day
         ) AS INT) AS anchor
  FROM pairs
)
SELECT user_id,
       min(day) AS island_start,
       max(day) AS island_end,
       count(*) AS n_days
FROM numbered
GROUP BY user_id, anchor
"""


@register("gaps_islands_activity", gaps_islands_oracle)
def gaps_islands_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE active days per user.
    The classic row_number trick — day minus the user's day-rank is
    constant exactly within a consecutive run, so one window pass plus a
    (user, anchor) aggregate finds every island with no self-join and no
    iteration. Two exchanges: the (user, day) distinct and the user-keyed
    window (different keys, so the exchange can't be shared); both carry
    the deduped pairs, not raw events."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.col("ts").cast("timestamp").cast("date").alias("day")
    ).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    numbered = pairs.withColumn("anchor", F.date_sub(F.col("day"), rn))
    return numbered.groupBy("user_id", "anchor").agg(
        F.min("day").alias("island_start"),
        F.max("day").alias("island_end"),
        F.count("*").alias("n_days"),
    ).drop("anchor")


# --- Rolling 7-day distinct active users ------------------------------------

rolling_actives_oracle = """
WITH pairs AS (
  SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
  FROM events
), days AS (
  SELECT DISTINCT day FROM pairs
)
SELECT d.day, count(DISTINCT p.user_id) AS active_7d
FROM days d JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
GROUP BY d.day
"""


@register("rolling_active_users", rolling_actives_oracle)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per observed day. COUNT(DISTINCT)
    over a sliding window isn't a supported window aggregate, and the
    oracle's range self-join is quadratic-ish in active days — the
    scalable plan inverts the containment: each distinct (user, day)
    activity CONTRIBUTES to the 7 window-ends [day, day+6] via an explode
    of a 7-element date sequence (bounded 7× blow-up of the already-
    deduped pairs), then one count_distinct per window end. A broadcast
    semi-join restricts window ends to observed days so both sides agree
    on the output domain.

    100 TB note: the blow-up factor is the window length (7), independent
    of data size; state is a per-(day) distinct-merge — no per-user
    timelines, no range join."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select(
        "user_id", F.col("ts").cast("timestamp").cast("date").alias("day")
    ).distinct()
    days = pairs.select("day").distinct()
    contrib = pairs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("wday"),
    )
    observed = contrib.join(
        F.broadcast(days), contrib.wday == days.day, "left_semi"
    )
    return (
        observed.groupBy(F.col("wday").alias("day"))
        .agg(F.count_distinct("user_id").alias("active_7d"))
    )


# --- Distribution drift (PSI) between time epochs ---------------------------

drift_psi_oracle = """
WITH stamped AS (
  SELECT event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS ms FROM events
), bounds AS (
  SELECT min(ms) AS mn, max(ms) AS mx FROM stamped
), tagged AS (
  SELECT event_type,
         CASE WHEN ms * 2 <= mn + mx THEN 0 ELSE 1 END AS half
  FROM stamped, bounds
), counts AS (
  SELECT event_type,
         sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS cnt_a,
         sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cnt_b
  FROM tagged GROUP BY event_type
), totals AS (
  SELECT sum(cnt_a) AS tot_a, sum(cnt_b) AS tot_b FROM counts
)
SELECT c.event_type, c.cnt_a, c.cnt_b,
       round(CAST(c.cnt_a AS DOUBLE) / CAST(t.tot_a AS DOUBLE), 8) AS p_a,
       round(CAST(c.cnt_b AS DOUBLE) / CAST(t.tot_b AS DOUBLE), 8) AS p_b,
       round(
         (CAST(c.cnt_a AS DOUBLE) / CAST(t.tot_a AS DOUBLE)
          - CAST(c.cnt_b AS DOUBLE) / CAST(t.tot_b AS DOUBLE))
         * ln((CAST(c.cnt_a AS DOUBLE) / CAST(t.tot_a AS DOUBLE))
              / (CAST(c.cnt_b AS DOUBLE) / CAST(t.tot_b AS DOUBLE))),
         8) AS psi_term
FROM counts c, totals t
WHERE c.cnt_a > 0 AND c.cnt_b > 0
"""


@register("drift_psi_event_types", drift_psi_oracle)
def drift_psi_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution drift monitoring: per-category Population Stability
    Index terms of the event_type distribution between the first and
    second half of the observed time range — the standard
    training-vs-serving (or epoch-vs-epoch) drift check a data pipeline
    runs before trusting new data. PSI = Σ (p_a − p_b)·ln(p_a/p_b); the
    per-type terms are emitted (their sum is the index) so the drifting
    categories are visible, not just the scalar.

    The epoch split is deterministic integer arithmetic (2·ms ≤ min+max),
    ONE aggregate computes both halves' counts via conditional sums (no
    second scan), and the 1-row totals cross-join is broadcast. Types
    absent from either half are excluded (their PSI term is infinite);
    the counts columns expose them upstream if needed.

    Both engines evaluate the identical double expression on identical
    integer counts; ln agrees to the ulp (same libm), and the round(…, 8)
    keeps the hash comparison away from representation noise."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", epoch_ms("ts").alias("ms")
    )
    bounds = ev.agg(F.min("ms").alias("mn"), F.max("ms").alias("mx"))
    tagged = ev.join(F.broadcast(bounds)).select(
        "event_type",
        F.when(F.col("ms") * 2 <= F.col("mn") + F.col("mx"), 0)
        .otherwise(1)
        .alias("half"),
    )
    counts = tagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("cnt_b"),
    )
    totals = counts.agg(
        F.sum("cnt_a").alias("tot_a"), F.sum("cnt_b").alias("tot_b")
    )
    p_a = F.col("cnt_a").cast("double") / F.col("tot_a").cast("double")
    p_b = F.col("cnt_b").cast("double") / F.col("tot_b").cast("double")
    return (
        counts.join(F.broadcast(totals))
        .filter((F.col("cnt_a") > 0) & (F.col("cnt_b") > 0))
        .select(
            "event_type",
            "cnt_a",
            "cnt_b",
            F.round(p_a, 8).alias("p_a"),
            F.round(p_b, 8).alias("p_b"),
            F.round((p_a - p_b) * F.log(p_a / p_b), 8).alias("psi_term"),
        )
    )


# --- Deterministic per-group mode -------------------------------------------

mode_oracle = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS cnt
  FROM events GROUP BY user_id, event_type
), ranked AS (
  SELECT user_id, event_type, cnt,
         row_number() OVER (
           PARTITION BY user_id ORDER BY cnt DESC, event_type
         ) AS rn
  FROM counts
)
SELECT user_id, event_type AS top_type, cnt
FROM ranked WHERE rn = 1
"""


@register("mode_event_type", mode_oracle)
def mode_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with DETERMINISTIC ties: each user's most frequent
    event type, ties broken lexicographically — native mode() is
    tie-nondeterministic in both engines, so the portable spelling is
    count + row_number over (cnt DESC, value). The count aggregate
    map-side-combines to (user × type) partials; the window re-keys those
    partials on user_id alone — two exchanges, both (user × type)-sized,
    never event-sized."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("cnt")
    )
    rn = F.row_number().over(
        Window.partitionBy("user_id").orderBy(
            F.col("cnt").desc(), F.col("event_type")
        )
    )
    return (
        counts.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("top_type"), "cnt")
    )


# --- Chi-square independence test (categorical association) -----------------

chi_square_oracle = """
WITH cells AS (
  SELECT event_type,
         CAST(isodow(CAST(ts AS TIMESTAMP)) - 1 AS INT) AS dow,
         count(*) AS obs
  FROM events GROUP BY 1, 2
), rowt AS (
  SELECT event_type, sum(obs) AS r FROM cells GROUP BY 1
), colt AS (
  SELECT dow, sum(obs) AS c FROM cells GROUP BY 1
), tot AS (
  SELECT sum(obs) AS n FROM cells
)
SELECT ce.event_type, ce.dow, ce.obs,
       round(CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
             / CAST(t.n AS DOUBLE), 6) AS expected,
       round(pow(CAST(ce.obs AS DOUBLE)
                 - CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
                   / CAST(t.n AS DOUBLE), 2)
             / (CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
                / CAST(t.n AS DOUBLE)), 6) AS contrib
FROM cells ce
JOIN rowt r USING (event_type)
JOIN colt c USING (dow)
CROSS JOIN tot t
"""


@register("chi_square_type_dow", chi_square_oracle)
def chi_square_type_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event_type and ISO weekday
    — the categorical-association check behind seasonality/affinity
    monitoring. Emits the PER-CELL (observed, expected, (O−E)²/E)
    contingency table rather than the scalar statistic: the statistic is
    the trivial sum, the cells show WHERE the dependence lives, and
    per-cell output sidesteps cross-engine float-summation order entirely
    (each cell's arithmetic is the identical IEEE expression over
    identical integer marginals on both engines).

    One event-scan aggregate builds the cell counts; row/column/grand
    totals are cell-sized re-aggregates broadcast back — nothing after
    the first aggregate touches event-sized data."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        F.weekday(F.col("ts").cast("timestamp")).cast("int").alias("dow"),
    ).agg(F.count("*").alias("obs"))
    rowt = cells.groupBy("event_type").agg(F.sum("obs").alias("r"))
    colt = cells.groupBy("dow").agg(F.sum("obs").alias("c"))
    tot = cells.agg(F.sum("obs").alias("n"))
    expected = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("n").cast("double")
    )
    return (
        cells.join(F.broadcast(rowt), "event_type")
        .join(F.broadcast(colt), "dow")
        .join(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            "obs",
            F.round(expected, 6).alias("expected"),
            F.round(
                F.pow(F.col("obs").cast("double") - expected, 2) / expected, 6
            ).alias("contrib"),
        )
    )


# --- Mutual information / PMI (categorical dependence strength) -------------

mutual_information_oracle = """
WITH cells AS (
  SELECT lang, source, count(*) AS obs FROM documents GROUP BY 1, 2
), rowt AS (
  SELECT lang, sum(obs) AS r FROM cells GROUP BY 1
), colt AS (
  SELECT source, sum(obs) AS c FROM cells GROUP BY 1
), tot AS (
  SELECT sum(obs) AS n FROM cells
)
SELECT ce.lang, ce.source, ce.obs,
       round(ln(CAST(ce.obs AS DOUBLE) * CAST(t.n AS DOUBLE)
                / (CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE))), 6) AS pmi,
       round(CAST(ce.obs AS DOUBLE) / CAST(t.n AS DOUBLE)
             * ln(CAST(ce.obs AS DOUBLE) * CAST(t.n AS DOUBLE)
                  / (CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE))), 6)
         AS mi_contrib
FROM cells ce
JOIN rowt r USING (lang)
JOIN colt c USING (source)
CROSS JOIN tot t
"""


@register("mutual_information_lang_source", mutual_information_oracle)
def mutual_information_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information per (lang, source) cell plus each
    cell's contribution to the mutual information I(lang; source) — the
    dependence-strength profile behind corpus-mix audits ("is German
    over-represented in the web crawl?"). Emits the per-cell table rather
    than the scalar I (= trivial sum of ``mi_contrib``) for the same
    reason as :func:`chi_square_type_dow`: the cells show WHERE the
    dependence lives, and per-cell arithmetic over identical integer
    marginals is the identical IEEE expression on both engines — no
    cross-engine float-summation order anywhere.

    One doc-scan aggregate builds the cells; marginals are cell-sized
    re-aggregates broadcast back — nothing after the first aggregate
    touches corpus-sized data."""
    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count("*").alias("obs"))
    rowt = cells.groupBy("lang").agg(F.sum("obs").alias("r"))
    colt = cells.groupBy("source").agg(F.sum("obs").alias("c"))
    tot = cells.agg(F.sum("obs").alias("n"))
    pmi = F.log(
        F.col("obs").cast("double")
        * F.col("n").cast("double")
        / (F.col("r").cast("double") * F.col("c").cast("double"))
    )
    return (
        cells.join(F.broadcast(rowt), "lang")
        .join(F.broadcast(colt), "source")
        .join(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "obs",
            F.round(pmi, 6).alias("pmi"),
            F.round(
                F.col("obs").cast("double") / F.col("n").cast("double") * pmi,
                6,
            ).alias("mi_contrib"),
        )
    )


# --- Month-over-month revenue growth ----------------------------------------

mom_growth_oracle = """
WITH monthly AS (
  SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE)
           AS month,
         CAST(round(sum(CAST(o_totalprice AS DECIMAL(18, 2))), 2) AS DOUBLE)
           AS revenue
  FROM orders GROUP BY 1
)
SELECT month, revenue,
       round(
         (revenue - lag(revenue) OVER (ORDER BY month))
         / lag(revenue) OVER (ORDER BY month), 6) AS mom_growth
FROM monthly
"""


@register("mom_revenue_growth", mom_growth_oracle)
def mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the reporting composite of
    date_trunc bucketing, exact DECIMAL revenue, and a lag ratio. The
    growth window is UNPARTITIONED by design: its input is the monthly
    aggregate (month-count-bounded — ~80 rows for the fixture's 7-year
    span, ≤ a few thousand for any real horizon), so one task holding the
    whole relation is the bounded-case exception the plan audit
    allowlists, same as ntile_quartiles. The event-sized work (the
    aggregate) is fully parallel."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate").cast("timestamp"))
        .cast("date")
        .alias("month")
    ).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        F.round((F.col("revenue") - prev) / prev, 6).alias("mom_growth"),
    )


# ---------------------------------------------------------------------------
# Recursive month spine (the Spark 4 WITH RECURSIVE surface)
# ---------------------------------------------------------------------------

_MONTH_SPINE_SQL = """
WITH RECURSIVE bounds AS (
  SELECT CAST(min(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))) AS DATE) AS mn,
         CAST(max(date_trunc('month', CAST(o_orderdate AS TIMESTAMP))) AS DATE) AS mx
  FROM orders
), months AS (
  SELECT mn AS m, mx FROM bounds
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE), mx FROM months
  WHERE m < mx
), per_month AS (
  SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE) AS m,
         count(*) AS n_orders
  FROM orders GROUP BY m
)
SELECT months.m AS month, coalesce(p.n_orders, 0) AS n_orders
FROM months LEFT JOIN per_month p ON p.m = months.m
"""


@register("recursive_month_spine", _MONTH_SPINE_SQL)
def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill via the Spark 4 ``WITH RECURSIVE`` surface: a
    month spine generated recursively from the data's own [min, max]
    bounds, left-joined to per-month order counts so EMPTY months appear
    as explicit zero rows (the property a time-series chart or
    month-over-month join needs and a bare GROUP BY can't give). The
    IDENTICAL SQL text runs through Catalyst and through DuckDB as its
    own oracle.

    Spark 4 recursive CTEs only support UNION ALL (no fixpoint dedup), so
    the correct demo is a recursion whose row count is structurally
    bounded — here one row per month of data span, regardless of data
    size. (A cyclic-graph transitive closure under UNION ALL enumerates
    PATHS, not nodes — exponential; the iterative `connected_components`
    operator remains the graph-closure path.) The bounds are a 1-row
    aggregate; the spine is driver-light and joins against an
    output-sized per-month aggregate."""
    from ..sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_MONTH_SPINE_SQL)
