"""Time-series regularization operators ([EXT], fixtures: events).

Sensor/metric pipelines (the reference's domain is room telemetry —
bookings with start/end times, consumer.scala:29-30 — though its code never
regularizes time) and feature-engineering jobs both need irregular event
streams resampled onto a fixed grid with the last observation carried
forward. Composition: per-key span → in-plan ``sequence()`` grid → as-of
fill, all shuffled once on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

resample_ffill_oracle = """
WITH obs AS (
  SELECT user_id, ts, max(value) AS value FROM events GROUP BY 1, 2
), spans AS (
  SELECT user_id, min(ts) AS mn, max(ts) AS mx FROM obs GROUP BY 1
), grid AS (
  SELECT user_id,
         unnest(generate_series(
           date_trunc('hour', mn) + INTERVAL 1 HOUR, mx, INTERVAL 1 HOUR
         )) AS grid_ts
  FROM spans
)
SELECT g.user_id, g.grid_ts, o.value
FROM grid g ASOF LEFT JOIN obs o
  ON g.user_id = o.user_id AND o.ts <= g.grid_ts
"""


@register("resample_ffill_hourly", resample_ffill_oracle)
def resample_ffill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample each user's irregular event stream onto an hourly grid with
    forward fill (last observation carried forward). The grid spans the
    user's own observed range, starting at the first full hour after their
    first event — so every grid point has a defined value.

    Spark has no ASOF join, so the fill is the union-and-window form: grid
    rows (null value) union observation rows, one window per user ordered
    by (ts, is_grid) — observations sort before a grid point at the same
    instant — and ``last(value, ignorenulls=True)`` carries the fill. One
    hash shuffle on user_id covers span agg, union, and window; the
    per-user ``sequence()`` array is bounded by span/interval (~720 here —
    for year-long spans at 100 TB, explode months first, then hours, to
    bound the array). The DuckDB oracle replays it with a native ASOF LEFT
    JOIN — same semantics, independent implementation."""
    events = load_table(spark, sf_dir, "events")
    # ties at identical (user, ts) resolve deterministically before filling
    obs = events.groupBy("user_id", "ts").agg(F.max("value").alias("value"))
    spans = obs.groupBy("user_id").agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    )
    # A user whose events all land inside one clock hour has
    # grid_start > mx; F.sequence throws for start > stop with a positive
    # step, so gate it — explode(NULL) emits no rows, matching the
    # oracle's empty generate_series for the same span.
    grid_start = F.date_trunc("hour", F.col("mn")) + F.expr("INTERVAL 1 HOUR")
    grid = spans.select(
        "user_id",
        F.explode(
            F.when(
                grid_start <= F.col("mx"),
                F.sequence(grid_start, F.col("mx"), F.expr("INTERVAL 1 HOUR")),
            )
        ).alias("grid_ts"),
    )
    unioned = obs.select(
        "user_id", "ts", F.lit(0).alias("is_grid"), "value"
    ).unionByName(
        grid.select(
            "user_id",
            F.col("grid_ts").alias("ts"),
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("double").alias("value"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_grid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.withColumn(
        "ffill", F.last("value", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("is_grid") == 1).select(
        "user_id",
        F.col("ts").alias("grid_ts"),
        F.col("ffill").alias("value"),
    )


# ---------------------------------------------------------------------------
# Time-series pattern matching (round-7): z-normalized sliding-window
# similarity search — the time-series complement of the vector ANN path
# (cf. the streaming-similarity-search line of work, e.g. EDBT'19).
# ---------------------------------------------------------------------------

TSM_L = 8         # subsequence length
TSM_TOPK = 20
# query pattern: a monotone ramp, z-normalized below; any literal works —
# the ramp finds "steadily rising value" episodes
_TSM_Q = list(range(1, TSM_L + 1))
_q_mean = sum(_TSM_Q) / TSM_L
_q_std = (sum((q - _q_mean) ** 2 for q in _TSM_Q) / TSM_L) ** 0.5
_TSM_QZ = [(q - _q_mean) / _q_std for q in _TSM_Q]


def _tsm_sql() -> str:
    # pure lead-column algebra — no list/array functions, so the SAME
    # formulas run in both engines: w0..w7 via lead(), population mean/std,
    # z-normalize, squared distance to the z-normalized ramp
    leads = ",\n         ".join(
        f"lead(value, {j}) OVER w AS w{j}" for j in range(1, TSM_L)
    )
    terms = " + ".join(f"w{j}" for j in range(TSM_L))
    sq_terms = " + ".join(f"w{j} * w{j}" for j in range(TSM_L))
    dist = " + ".join(
        f"pow((w{j} - m) / s - ({_TSM_QZ[j]!r}), 2)" for j in range(TSM_L)
    )
    return f"""
WITH seq AS (
  SELECT user_id,
         CAST(row_number() OVER w AS INT) - 1 AS pos,
         value AS w0,
         {leads}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), stats AS (
  SELECT user_id, pos,
         ({terms}) / {TSM_L}.0 AS m,
         sqrt(greatest(({sq_terms}) / {TSM_L}.0
              - pow(({terms}) / {TSM_L}.0, 2), 0.0)) AS s,
         w0, {', '.join(f'w{j}' for j in range(1, TSM_L))}
  FROM seq WHERE w{TSM_L - 1} IS NOT NULL
)
SELECT user_id, pos, round({dist}, 6) AS zdist
FROM stats
WHERE s > 1e-9
ORDER BY round({dist}, 6), user_id, pos
LIMIT {TSM_TOPK}
"""


@register("ts_pattern_match", _tsm_sql())
def ts_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 best matches of a z-normalized query pattern (a
    rising ramp) across every user's value series, at every position —
    sliding-window similarity search with scale/offset invariance (the
    UCR-suite formulation). One user-keyed window pass produces the
    TSM_L=8 lead columns; mean/std/z-distance are flat column algebra
    inside whole-stage codegen (no arrays, no UDFs); the top-k is a
    TakeOrderedAndProject on the ROUNDED distance with a deterministic
    (user, pos) tiebreak. At 100 TB: one shuffle on user_id, per-row
    O(L) arithmetic, output fixed at k."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cols = [F.col("value").alias("w0")] + [
        F.lead("value", j).over(w).alias(f"w{j}") for j in range(1, TSM_L)
    ]
    seq = events.select(
        "user_id",
        (F.row_number().over(w) - 1).cast("int").alias("pos"),
        *cols,
    ).filter(F.col(f"w{TSM_L - 1}").isNotNull())
    ws = [F.col(f"w{j}") for j in range(TSM_L)]
    m = sum(ws[1:], ws[0]) / float(TSM_L)
    sq = sum((c * c for c in ws[1:]), ws[0] * ws[0]) / float(TSM_L)
    s = F.sqrt(F.greatest(sq - m * m, F.lit(0.0)))
    stats = seq.select(
        "user_id", "pos", m.alias("m"), s.alias("s"), *ws
    ).filter(F.col("s") > 1e-9)
    dist = None
    for j in range(TSM_L):
        term = F.pow((F.col(f"w{j}") - F.col("m")) / F.col("s") - _TSM_QZ[j], 2)
        dist = term if dist is None else dist + term
    return (
        stats.select("user_id", "pos", F.round(dist, 6).alias("zdist"))
        .orderBy("zdist", "user_id", "pos")
        .limit(TSM_TOPK)
    )


# ---------------------------------------------------------------------------
# Exponential smoothing (round-7): bounded-window EWMA
# ---------------------------------------------------------------------------

EWMA_ALPHA = 0.3
EWMA_K = 16  # truncation window: (1-α)^16 ≈ 0.003 — <0.4% tail mass


def _ewma_sql() -> str:
    # finite-K EWMA as flat lag algebra (identical formulas both engines):
    # ewma_t = Σ_{j<K} α(1-α)^j x_{t-j} / Σ_{j<K over available} α(1-α)^j.
    # The denominator renormalizes at series heads (fewer than K lags), so
    # early rows are exact truncated-EWMA too, not NULL.
    lags = ",\n         ".join(
        f"lag(value, {j}) OVER w AS x{j}" for j in range(1, EWMA_K)
    )
    num = " + ".join(
        f"coalesce(x{j} * {EWMA_ALPHA * (1 - EWMA_ALPHA) ** j!r}, 0.0)"
        for j in range(EWMA_K)
    )
    den = " + ".join(
        f"CASE WHEN x{j} IS NOT NULL THEN {EWMA_ALPHA * (1 - EWMA_ALPHA) ** j!r} ELSE 0.0 END"
        for j in range(EWMA_K)
    )
    return f"""
WITH seq AS (
  SELECT user_id, event_id, value AS x0,
         {lags}
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       round(({num}) / ({den}), 6) AS ewma
FROM seq
"""


@register("ewma_values", _ewma_sql())
def ewma_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event exponentially-weighted moving average of ``value``
    (α=EWMA_ALPHA=0.3), truncated at K=EWMA_K=16 lags ((1-α)^K ≈ 0.3% tail
    mass) and head-renormalized — the smoothing/anomaly-baseline operator.
    A true infinite-memory EWMA is a sequential recurrence no engine's
    window algebra expresses; the truncated form is ONE user-keyed window
    pass producing K lag columns folded by flat codegen arithmetic —
    portable to the SQL oracle as the identical formulas, and
    embarrassingly parallel at 100 TB (shuffle on user_id only)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_cols = [F.col("value").alias("x0")] + [
        F.lag("value", j).over(w).alias(f"x{j}") for j in range(1, EWMA_K)
    ]
    seq = events.select("user_id", "event_id", *lag_cols)
    num, den = None, None
    for j in range(EWMA_K):
        wgt = EWMA_ALPHA * (1 - EWMA_ALPHA) ** j
        t_num = F.coalesce(F.col(f"x{j}") * wgt, F.lit(0.0))
        t_den = F.when(F.col(f"x{j}").isNotNull(), F.lit(wgt)).otherwise(0.0)
        num = t_num if num is None else num + t_num
        den = t_den if den is None else den + t_den
    return seq.select(
        "user_id", "event_id", F.round(num / den, 6).alias("ewma")
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (trend + weekly seasonal + residual)
# ---------------------------------------------------------------------------

seasonal_oracle = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, sum(value) AS y
  FROM events GROUP BY 1
), keyed AS (
  SELECT day, y, CAST(day - DATE '1970-01-01' AS BIGINT) % 7 AS dow
  FROM daily
), trended AS (
  SELECT day, dow, y,
         avg(y) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
           AS trend
  FROM keyed
), seasonal AS (
  SELECT dow, avg(y - trend) AS s FROM trended GROUP BY dow
)
SELECT t.day, CAST(t.dow AS BIGINT) AS dow,
       round(t.y, 4) AS y,
       round(t.trend, 4) AS trend,
       round(s.s, 4) AS seasonal,
       round(t.y - t.trend - s.s, 4) AS residual
FROM trended t JOIN seasonal s ON s.dow = t.dow
"""


@register("seasonal_decompose_daily", seasonal_oracle)
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition of the daily revenue series:
    trend = centered 7-day moving average, weekly seasonal = per-weekday
    mean of the detrended series, residual = the rest — the anomaly
    baseline `ewma_values` smooths toward, split into its named parts.

    Scale shape: the data-sized stage is one combinable day groupBy; the
    decomposition runs on the day-DOMAIN table (bounded by the corpus
    span — the counting_median domain argument), so the centered-window
    pass is allowlisted as bounded. The weekday key is (epoch_day mod 7)
    — pure integer arithmetic, deliberately NOT dayofweek(), whose
    Sunday-origin differs across engines. Edge days average their
    available 7-day frame (both engines' frame semantics agree)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("y")
    )
    keyed = daily.select(
        "day",
        "y",
        F.pmod(F.datediff("day", F.lit("1970-01-01")).cast("bigint"), F.lit(7)).alias(
            "dow"
        ),
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    # seasonal as a dow-partitioned window over the SAME trended relation,
    # NOT groupBy("dow")+join: the join form references the trended
    # relation twice, so the centered-window pass (and the day groupBy
    # feeding it) is instantiated twice in the physical plan — the window
    # form keeps that subtree at exactly one instantiation
    wdow = Window.partitionBy("dow")
    trended = keyed.withColumn("trend", F.avg("y").over(w7)).withColumn(
        "s", F.avg(F.col("y") - F.col("trend")).over(wdow)
    )
    return trended.select(
        "day",
        F.col("dow").cast("bigint").alias("dow"),
        F.round("y", 4).alias("y"),
        F.round("trend", 4).alias("trend"),
        F.round("s", 4).alias("seasonal"),
        F.round(F.col("y") - F.col("trend") - F.col("s"), 4).alias("residual"),
    )


# ---------------------------------------------------------------------------
# CUSUM changepoint detection on the daily mean
# ---------------------------------------------------------------------------

cusum_oracle = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, avg(value) AS m
  FROM events GROUP BY 1
), mu AS (SELECT avg(m) AS mu FROM daily),
cusum AS (
  SELECT day, m,
         sum(m - mu) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM daily, mu
), peak AS (
  SELECT day AS cp_day, round(abs(s), 6) AS cusum_peak
  FROM cusum ORDER BY round(abs(s), 6) DESC, day LIMIT 1
)
SELECT p.cp_day AS changepoint_day, p.cusum_peak,
       round(avg(CASE WHEN c.day <= p.cp_day THEN c.m END), 6) AS mean_before,
       round(avg(CASE WHEN c.day >  p.cp_day THEN c.m END), 6) AS mean_after
FROM cusum c, peak p
GROUP BY p.cp_day, p.cusum_peak
"""


@register("cusum_changepoint", cusum_oracle)
def cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint scan over the daily mean event value: the running
    sum of deviations from the grand mean peaks (in absolute value) at the
    most likely level-shift day; reports that day, the peak, and the mean
    on each side — the level-shift alarm the per-point z-score queries
    can't see (a persistent small shift never trips a pointwise
    threshold).

    Scale shape: one combinable day groupBy, then everything runs on the
    day-domain table (allowlisted bounded window). The argmax is
    deterministic cross-engine: ordered by the ROUNDED peak with the day
    as tiebreak, via a top-1 TakeOrdered, never a full sort."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("m")
    )
    mu = daily.agg(F.avg("m").alias("mu"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cusum = daily.crossJoin(F.broadcast(mu)).withColumn(
        "s", F.sum(F.col("m") - F.col("mu")).over(w)
    )
    peak = (
        cusum.select(
            F.col("day").alias("cp_day"),
            F.round(F.abs("s"), 6).alias("cusum_peak"),
        )
        .orderBy(F.col("cusum_peak").desc(), "cp_day")
        .limit(1)
    )
    return (
        cusum.crossJoin(F.broadcast(peak))
        .groupBy("cp_day", "cusum_peak")
        .agg(
            F.round(
                F.avg(F.when(F.col("day") <= F.col("cp_day"), F.col("m"))), 6
            ).alias("mean_before"),
            F.round(
                F.avg(F.when(F.col("day") > F.col("cp_day"), F.col("m"))), 6
            ).alias("mean_after"),
        )
        .select(
            F.col("cp_day").alias("changepoint_day"),
            "cusum_peak",
            "mean_before",
            "mean_after",
        )
    )


# ---------------------------------------------------------------------------
# Seasonal-naive forecast backtest (lag-7 baseline, error metrics)
# ---------------------------------------------------------------------------

backtest_oracle = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
), paired AS (
  SELECT a.day, a.cents AS actual, f.cents AS forecast
  FROM daily a JOIN daily f ON a.day = f.day + INTERVAL 7 DAY
)
SELECT CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs(actual - forecast)) AS BIGINT)
         / (count(*) * 100.0) AS mae,
       sum(abs(actual - forecast) / CAST(actual AS DOUBLE)) / count(*)
         AS mape,
       sum(2.0 * abs(actual - forecast) / (actual + CAST(forecast AS DOUBLE)))
         / count(*) AS smape,
       quantile_cont(abs(actual - forecast) / CAST(actual AS DOUBLE), 0.5)
         AS medape
FROM paired
"""


@register("seasonal_naive_backtest", backtest_oracle)
def seasonal_naive_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-quality floor: backtest the seasonal-naive baseline
    (forecast(d) = revenue(d−7)) over the daily order-revenue series and
    report MAE / MAPE / SMAPE / median-APE — the reference error rates any
    real forecasting model must beat before deployment.

    The lag is an exact-date SELF-JOIN (day = day−7), not a lag window:
    the day relation is domain-bounded but the join stays fully parallel
    and, unlike lag-over-ordered-days, silently skips gapped days instead
    of misaligning them (the `mom_revenue_growth` gap lesson, solved
    without its allowlisted window). Daily revenue is summed in EXACT
    integer cents, so |actual − forecast| is exact integer arithmetic and
    MAE is a single IEEE division; MAPE/SMAPE terms are per-row exact
    divisions; median-APE is the exact interpolated percentile both
    engines share. Scale shape: one data-sized shuffle (orders → day),
    then a day-domain join + 1-row reduce."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias(
            "cents"
        )
    )
    a, f_ = daily.alias("a"), daily.alias("f")
    paired = a.join(
        f_, F.col("a.day") == F.date_add(F.col("f.day"), 7)
    ).select(
        F.col("a.cents").alias("actual"),
        F.col("f.cents").alias("forecast"),
    )
    abs_diff = F.abs(F.col("actual") - F.col("forecast"))
    ape = abs_diff / F.col("actual").cast("double")
    return paired.agg(
        F.count("*").alias("n_days"),
        (F.sum(abs_diff) / (F.count("*") * 100.0)).alias("mae"),
        (F.sum(ape) / F.count("*")).alias("mape"),
        (
            F.sum(
                2.0
                * abs_diff
                / (F.col("actual") + F.col("forecast").cast("double"))
            )
            / F.count("*")
        ).alias("smape"),
        F.percentile(ape, 0.5).alias("medape"),
    )


# ---------------------------------------------------------------------------
# Holt double exponential smoothing over the daily revenue series
# ---------------------------------------------------------------------------

HOLT_ALPHA = 0.5  # level gain
HOLT_BETA = 0.3  # trend gain
_H_OMA = 1.0 - HOLT_ALPHA
_H_OMB = 1.0 - HOLT_BETA


def _holt_oracle() -> str:
    # the recursive term inlines the new-level expression into the trend
    # update with the SAME operand order the pandas loop uses, so the two
    # engines run bitwise-identical double arithmetic off the quantized y
    lnew = f"{HOLT_ALPHA!r} * i.y + {_H_OMA!r} * (h.l + h.b)"
    return f"""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 6) AS y
  FROM events GROUP BY 1
), idx AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS rn FROM daily
), hw(rn, day, y, l, b, f) AS (
  SELECT rn, day, y, y, CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE)
  FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.rn, i.day, i.y,
         {lnew},
         {HOLT_BETA!r} * (({lnew}) - h.l) + {_H_OMB!r} * h.b,
         h.l + h.b
  FROM hw h JOIN idx i ON i.rn = h.rn + 1
)
SELECT day, y,
       round(l, 4) AS level, round(b, 4) AS trend,
       round(f, 4) AS forecast,
       round(abs(y - f), 4) AS abs_err
FROM hw
"""


@register("holt_linear_forecast", _holt_oracle())
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend (double exponential) smoothing of the daily
    revenue series with a one-step-ahead backtest: level, trend, the
    forecast each day's state implied for the next, and its absolute
    error — the trending counterpart of `ewma_values` (whose single
    smoother cannot follow a drifting mean) and the smoothed cousin of
    `seasonal_naive_backtest`.

    The coupled level/trend recurrence is NOT expressible as window-lag
    algebra (the EWMA truncation trick needs a single geometric state),
    so the day-DOMAIN series — bounded by the corpus span at ANY data
    scale, the counting_median domain argument — runs through one
    applyInPandas group; the data-sized stage below it is a combinable
    day groupBy. Cross-engine determinism: the daily input is quantized
    to 6 decimals FIRST, and both engines then run the identical
    double-arithmetic recurrence (the oracle's recursive CTE inlines the
    level update with the same operand order), so outputs agree bitwise
    before the final round-4."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )

    def holt(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day").reset_index(drop=True)
        lvl, trd, fc = [], [], []
        l = b = None
        for y in pdf["y"]:
            if l is None:
                f, l, b = None, y, 0.0
            else:
                f = l + b
                l_new = HOLT_ALPHA * y + _H_OMA * (l + b)
                b = HOLT_BETA * (l_new - l) + _H_OMB * b
                l = l_new
            lvl.append(l)
            trd.append(b)
            fc.append(f)
        return pd.DataFrame(
            {
                "day": pdf["day"],
                "y": pdf["y"],
                "l": lvl,
                "b": trd,
                "f": fc,
            }
        )

    smoothed = daily.groupBy(F.lit(1).alias("g")).applyInPandas(
        holt, "day date, y double, l double, b double, f double"
    )
    return smoothed.select(
        "day",
        "y",
        F.round("l", 4).alias("level"),
        F.round("b", 4).alias("trend"),
        F.round("f", 4).alias("forecast"),
        F.round(F.abs(F.col("y") - F.col("f")), 4).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# SAX symbolic discretization + motif counts over the daily series
# ---------------------------------------------------------------------------

#: Gaussian quartile breakpoints (Lin et al. 2003, alphabet size 4),
#: embedded as IDENTICAL literals in both engines — neither engine
#: evaluates an inverse normal CDF
_SAX_BREAKS = (-0.6745, 0.0, 0.6745)
_SAX_WORD = 3  # motif length in days

sax_oracle = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 6) AS y
  FROM events GROUP BY 1
), stats AS (
  SELECT avg(y) AS mu, stddev_samp(y) AS sd FROM daily
), z AS (
  SELECT day, round((y - mu) / nullif(sd, 0), 6) AS z FROM daily, stats
), sym AS (
  SELECT day,
         CASE WHEN z < {_SAX_BREAKS[0]!r} THEN 'a'
              WHEN z < {_SAX_BREAKS[1]!r} THEN 'b'
              WHEN z < {_SAX_BREAKS[2]!r} THEN 'c'
              ELSE 'd' END AS s
  FROM z
), words AS (
  SELECT day,
         s || lead(s, 1) OVER (ORDER BY day)
           || lead(s, 2) OVER (ORDER BY day) AS motif
  FROM sym
)
SELECT motif, CAST(count(*) AS BIGINT) AS n_windows,
       min(day) AS first_day
FROM words WHERE motif IS NOT NULL
GROUP BY motif
"""


@register("sax_daily_motifs", sax_oracle)
def sax_daily_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolic discretization of the daily revenue series (Lin et
    al. 2003): z-normalize, quantize into a 4-letter alphabet at the
    Gaussian quartile breakpoints, slide a 3-day word over the symbol
    string, and count motif frequencies — the symbolic pattern census a
    monitoring team greps before reaching for a full matrix profile
    ('dcb' spikes-then-decays, 'aaa' sustained troughs).

    Determinism: the daily input and the z-scores are both quantized to
    6 decimals before any comparison, the breakpoints are shared
    literals, and lead() words are ordered by day on both engines.

    Scale shape: the data-sized stage is one combinable day groupBy;
    normalization, bucketing, and the word windows run on the
    day-DOMAIN table (corpus-span bounded — the allowlisted
    single-partition case), and the motif census is ≤ 4³ rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    stats = daily.agg(
        F.avg("y").alias("mu"), F.stddev_samp("y").alias("sd")
    )
    z = daily.crossJoin(F.broadcast(stats)).select(
        "day",
        # nullif: a constant daily series has sd 0 — NULL z (bucket 'd',
        # the same degenerate path as a 1-day series), not an ANSI abort
        F.round(
            (F.col("y") - F.col("mu")) / F.nullif(F.col("sd"), F.lit(0.0)), 6
        ).alias("z"),
    )
    sym = z.select(
        "day",
        F.when(F.col("z") < _SAX_BREAKS[0], "a")
        .when(F.col("z") < _SAX_BREAKS[1], "b")
        .when(F.col("z") < _SAX_BREAKS[2], "c")
        .otherwise("d")
        .alias("s"),
    )
    w = Window.orderBy("day")
    words = sym.select(
        "day",
        F.concat(
            F.col("s"), F.lead("s", 1).over(w), F.lead("s", 2).over(w)
        ).alias("motif"),
    ).filter(F.col("motif").isNotNull())
    return words.groupBy("motif").agg(
        F.count("*").alias("n_windows"), F.min("day").alias("first_day")
    )


# ---------------------------------------------------------------------------
# Periodicity scan (round-11): discrete-Fourier power over candidate periods
# ---------------------------------------------------------------------------

PERIOD_MIN = 2
PERIOD_MAX = 30
_TWO_PI = 6.283185307179586  # 2π as one literal double on BOTH engines

periodogram_oracle = f"""
WITH daily AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         sum(value) AS y
  FROM events GROUP BY 1
), st AS (
  SELECT avg(y) AS mu, CAST(count(*) AS BIGINT) AS n FROM daily
), ctr AS (
  SELECT t, y - st.mu AS yc FROM daily, st
), sst AS (
  SELECT sum(yc * yc) AS ss FROM ctr
), terms AS (
  SELECT p.p,
         c.yc * cos({_TWO_PI} * CAST(c.t % p.p AS DOUBLE) / p.p) AS tc,
         c.yc * sin({_TWO_PI} * CAST(c.t % p.p AS DOUBLE) / p.p) AS ts
  FROM ctr c, (SELECT unnest(range({PERIOD_MIN}, {PERIOD_MAX + 1})) AS p) p
), agg AS (
  SELECT p, sum(tc) AS cs, sum(ts) AS sn FROM terms GROUP BY p
)
SELECT CAST(a.p AS INT) AS period,
       round((a.cs * a.cs + a.sn * a.sn) * 2.0 / (st.n * sst.ss), 6)
         AS power_frac
FROM agg a, st, sst
"""


@register("periodogram_daily", periodogram_oracle)
def periodogram_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodicity scan of the daily event-value series: for each
    candidate period p in [2, 30] days, the normalized Fourier power
    2·(C_p² + S_p²)/(N·SST) of the mean-centered series — the variance
    fraction a sinusoid at that period explains. The weekly cadence
    planted in the events fixture surfaces as the p = 7 peak; a flat
    scan is the "no seasonality" answer `seasonal_decompose_daily`
    assumes away. Completes the time-series family's frequency-domain
    view next to ACF's lag-domain one.

    Determinism: trig arguments are reduced MOD p in INTEGER space first
    (t % p), so both engines evaluate cos/sin on identical small
    arguments (< 2π) where libm implementations agree to ULPs — float
    noise ~1e-12 relative against round-6 outputs.

    Scale shape: the data-sized stage is one combinable day groupBy; the
    scan is a |days| × 29 broadcast-domain product (calendar-bounded at
    ANY data scale — the counting_median domain argument) feeding one
    combinable per-period sum, then 1-row normalizers join back."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("t")
    ).agg(F.sum("value").alias("y"))
    st = daily.agg(
        F.avg("y").alias("mu"), F.count("*").cast("long").alias("n")
    )
    ctr = daily.crossJoin(F.broadcast(st)).select(
        "t", (F.col("y") - F.col("mu")).alias("yc"), "n"
    )
    sst = ctr.agg(
        F.sum(F.col("yc") * F.col("yc")).alias("ss"),
        F.first("n").alias("n"),
    )
    periods = spark.range(PERIOD_MIN, PERIOD_MAX + 1).select(
        F.col("id").cast("int").alias("p")
    )
    ang = (
        F.lit(_TWO_PI)
        * F.pmod(F.col("t"), F.col("p")).cast("double")
        / F.col("p")
    )
    agg = (
        ctr.join(F.broadcast(periods))
        .select("p", (F.col("yc") * F.cos(ang)).alias("tc"),
                (F.col("yc") * F.sin(ang)).alias("ts"))
        .groupBy("p")
        .agg(F.sum("tc").alias("cs"), F.sum("ts").alias("sn"))
    )
    return agg.crossJoin(F.broadcast(sst)).select(
        F.col("p").alias("period"),
        F.round(
            (F.col("cs") * F.col("cs") + F.col("sn") * F.col("sn"))
            * 2.0
            / (F.col("n") * F.col("ss")),
            6,
        ).alias("power_frac"),
    )


# ---------------------------------------------------------------------------
# Hampel filter (round-11): rolling-median/MAD outlier days
# ---------------------------------------------------------------------------

HAMPEL_HALF_WIN = 3      # ±3 days → 7-day window interior
HAMPEL_K = 3.5           # the conventional Hampel threshold
_HAMPEL_C = 0.6745       # MAD → σ consistency constant (Φ⁻¹(0.75))

hampel_oracle = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, sum(value) AS y FROM events GROUP BY 1
), win AS (
  SELECT a.day, a.y, b.y AS yb
  FROM daily a JOIN daily b
    ON b.day - a.day BETWEEN -{HAMPEL_HALF_WIN} AND {HAMPEL_HALF_WIN}
), med AS (
  SELECT day, any_value(y) AS y, quantile_cont(yb, 0.5) AS med
  FROM win GROUP BY day
), dev AS (
  SELECT w.day, quantile_cont(abs(w.yb - m.med), 0.5) AS mad
  FROM win w JOIN med m USING (day) GROUP BY w.day
)
SELECT m.day, round(m.y, 4) AS y, round(m.med, 4) AS med,
       round(d.mad, 4) AS mad,
       round({_HAMPEL_C} * (m.y - m.med) / nullif(d.mad, 0), 4) AS z,
       coalesce(abs({_HAMPEL_C} * (m.y - m.med) / nullif(d.mad, 0))
                > {HAMPEL_K}, FALSE) AS is_outlier
FROM med m JOIN dev d USING (day)
"""


@register("hampel_outlier_days", hampel_oracle)
def hampel_outlier_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hampel filter over the daily series: a day is an outlier when its
    value sits more than {K} robust sigmas (0.6745·(y−med)/MAD) from its
    ±{W}-day rolling MEDIAN — the robust alternative to z-scores against
    a rolling mean, immune to the outlier polluting its own baseline
    (one bad day shifts a 7-day mean by 1/7 of its size; it shifts the
    median not at all). An all-equal window (MAD 0) yields NULL z and
    FALSE flag on both engines.

    Scale shape: one combinable day groupBy, then a |days| × 7
    range self-join on the day DOMAIN (calendar-bounded) feeding two
    exact-median aggregations — no data-sized window, no sort."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum("value").alias("y")
    )
    a, b = daily.alias("a"), daily.alias("b")
    win = a.join(
        b,
        F.datediff(F.col("b.day"), F.col("a.day")).between(
            -HAMPEL_HALF_WIN, HAMPEL_HALF_WIN
        ),
    ).select(
        F.col("a.day").alias("day"),
        F.col("a.y").alias("y"),
        F.col("b.y").alias("yb"),
    )
    med = win.groupBy("day").agg(
        F.any_value("y").alias("y"),
        F.expr("percentile(yb, 0.5)").alias("med"),
    )
    dev = (
        win.join(med.select("day", "med"), "day")
        .groupBy("day")
        .agg(F.expr("percentile(abs(yb - med), 0.5)").alias("mad"))
    )
    z = (
        F.lit(_HAMPEL_C)
        * (F.col("y") - F.col("med"))
        / F.nullif(F.col("mad"), F.lit(0.0))
    )
    return med.join(dev, "day").select(
        "day",
        F.round("y", 4).alias("y"),
        F.round("med", 4).alias("med"),
        F.round("mad", 4).alias("mad"),
        F.round(z, 4).alias("z"),
        F.coalesce(F.abs(z) > HAMPEL_K, F.lit(False)).alias("is_outlier"),
    )


hampel_outlier_days.__doc__ = hampel_outlier_days.__doc__.format(
    K=HAMPEL_K, W=HAMPEL_HALF_WIN
)


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (weekly cycle) over daily revenue
# ---------------------------------------------------------------------------

HW_M = 7  # season length (weekly cycle on a daily series)
HW_ALPHA = 0.3  # level gain
HW_BETA = 0.1  # trend gain
HW_GAMMA = 0.2  # seasonal gain
_HW_OMA = 1.0 - HW_ALPHA
_HW_OMB = 1.0 - HW_BETA
_HW_OMG = 1.0 - HW_GAMMA


def _hw_oracle() -> str:
    # the new-level expression is inlined into the trend/seasonal updates
    # with the SAME operand order as the pandas loop — bitwise-identical
    # double arithmetic off the quantized y (the holt_linear convention);
    # the seasonal state rides the recursion as a DOUBLE[] of the last m
    # seasonals (ss[1] is s_{t-m}), initialized at rn=m from the carried
    # y-prefix list.
    lnew = f"{HW_ALPHA!r} * (i.y - h.ss[1]) + {_HW_OMA!r} * (h.l + h.b)"
    return f"""
WITH RECURSIVE daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 6) AS y
  FROM events GROUP BY 1
), idx AS (
  SELECT day, y, row_number() OVER (ORDER BY day) AS rn FROM daily
), hw(rn, day, y, acc, ys, l, b, ss, su, f) AS (
  SELECT rn, day, y, y, [y],
         CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
         CAST(NULL AS DOUBLE[]), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
  FROM idx WHERE rn = 1
  UNION ALL
  SELECT i.rn, i.day, i.y,
         h.acc + i.y,
         CASE WHEN i.rn <= {HW_M} THEN list_append(h.ys, i.y) ELSE h.ys END,
         CASE WHEN i.rn < {HW_M} THEN NULL
              WHEN i.rn = {HW_M} THEN (h.acc + i.y) / {float(HW_M)!r}
              ELSE {lnew} END,
         CASE WHEN i.rn < {HW_M} THEN NULL
              WHEN i.rn = {HW_M} THEN 0.0
              ELSE {HW_BETA!r} * (({lnew}) - h.l) + {_HW_OMB!r} * h.b END,
         CASE WHEN i.rn < {HW_M} THEN NULL
              WHEN i.rn = {HW_M} THEN list_transform(
                list_append(h.ys, i.y),
                x -> x - (h.acc + i.y) / {float(HW_M)!r})
              ELSE list_append(h.ss[2:],
                {HW_GAMMA!r} * (i.y - ({lnew})) + {_HW_OMG!r} * h.ss[1]) END,
         CASE WHEN i.rn <= {HW_M} THEN NULL ELSE h.ss[1] END,
         CASE WHEN i.rn <= {HW_M} THEN NULL ELSE h.l + h.b + h.ss[1] END
  FROM hw h JOIN idx i ON i.rn = h.rn + 1
)
SELECT day, y,
       floor(l * 10000 + 0.5) / 10000 AS level,
       floor(b * 10000 + 0.5) / 10000 AS trend,
       floor(su * 10000 + 0.5) / 10000 AS seasonal,
       floor(f * 10000 + 0.5) / 10000 AS forecast,
       floor(abs(y - f) * 10000 + 0.5) / 10000 AS abs_err
FROM hw WHERE f IS NOT NULL
"""


@register("holt_winters_seasonal", _hw_oracle())
def holt_winters_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (weekly cycle m=7) of the
    daily revenue series with a one-step-ahead backtest — the seasonal
    member of the smoothing family: `ewma_values` (level only) →
    `holt_linear_forecast` (level+trend) → this (level+trend+seasonal),
    answering the question `seasonal_decompose_daily` diagnoses but
    cannot FORECAST. Deterministic textbook init: level = mean of the
    first m observations (accumulated sequentially), trend = 0, seasonal_i
    = y_i − level; from t > m: f = l + b + s_{t−m}, then the coupled
    level/trend/seasonal updates.

    The recurrence carries the last m seasonals as STATE, so it is not
    window-lag algebra — the day-DOMAIN series (calendar-bounded at any
    data scale, the holt_linear argument) runs through one applyInPandas
    group; the data-sized stage is the combinable daily groupBy.
    Cross-engine determinism: daily y quantized to 6 decimals FIRST; the
    oracle's recursive CTE then runs the identical double arithmetic in
    the identical operand order, carrying the seasonal list through the
    recursion — outputs agree bitwise before the final round-4."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )

    def hw(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("day").reset_index(drop=True)
        out = []
        acc = 0.0
        ys: list = []
        l = b = None
        ss: list = []
        for day, y in zip(pdf["day"], pdf["y"]):
            rn = len(ys) + 1
            if rn < HW_M:
                acc += y
                ys.append(y)
            elif rn == HW_M:
                acc += y
                ys.append(y)
                l = acc / float(HW_M)
                b = 0.0
                ss = [x - l for x in ys]
            else:
                ys.append(y)  # rn bookkeeping only
                su = ss[0]
                f = l + b + su
                l_new = HW_ALPHA * (y - su) + _HW_OMA * (l + b)
                b = HW_BETA * (l_new - l) + _HW_OMB * b
                s_new = HW_GAMMA * (y - l_new) + _HW_OMG * su
                l = l_new
                ss = ss[1:] + [s_new]
                out.append((day, y, l, b, su, f, abs(y - f)))
        return pd.DataFrame(
            out, columns=["day", "y", "l", "b", "su", "f", "ae"]
        )

    smoothed = daily.groupBy(F.lit(1).alias("g")).applyInPandas(
        hw,
        "day date, y double, l double, b double, su double, f double,"
        " ae double",
    )
    # explicit floor(x·10⁴+0.5)/10⁴ on BOTH engines (round-half-toward-+∞
    # in identical IEEE ops): Spark round() (HALF_UP on the shortest
    # decimal string) and DuckDB round() (on the double bits) disagreed on
    # ONE sf≈1 level value sitting exactly on a .00005 boundary — the
    # bollinger band-rounding lesson applied here after the sf≈1 gate
    # caught it
    r4 = lambda c: F.floor(F.col(c) * 10000 + F.lit(0.5)) / 10000  # noqa: E731
    return smoothed.select(
        "day",
        "y",
        r4("l").alias("level"),
        r4("b").alias("trend"),
        r4("su").alias("seasonal"),
        r4("f").alias("forecast"),
        r4("ae").alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# Split-conformal prediction interval for the seasonal-naive forecaster
# ---------------------------------------------------------------------------

CONF_LEVEL = 0.9  # nominal coverage

conformal_oracle = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 6) AS y
  FROM events GROUP BY 1
), paired AS (
  SELECT a.day, abs(a.y - f.y) AS resid
  FROM daily a JOIN daily f ON f.day = a.day - INTERVAL 7 DAY
), split AS (
  SELECT min(day) + CAST(floor(date_diff('day', min(day), max(day)) / 2)
                         AS BIGINT) * INTERVAL 1 DAY AS mid
  FROM paired
), cal AS (
  SELECT quantile_cont(resid, {CONF_LEVEL!r}) AS q_hat,
         CAST(count(*) AS BIGINT) AS n_cal
  FROM paired, split WHERE day <= mid
), ev AS (
  SELECT CAST(count(*) AS BIGINT) AS n_eval,
         CAST(sum(CASE WHEN resid <= (SELECT q_hat FROM cal)
                       THEN 1 ELSE 0 END) AS BIGINT) AS covered
  FROM paired, split WHERE day > mid
)
SELECT c.n_cal, e.n_eval,
       round(c.q_hat, 4) AS q_hat,
       round(CAST(e.covered AS DOUBLE) / e.n_eval, 6) AS coverage,
       CAST({CONF_LEVEL!r} AS DOUBLE) AS nominal
FROM cal c, ev e
"""


@register("conformal_interval_daily", conformal_oracle)
def conformal_interval_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval around the weekly seasonal-naive
    forecaster: residuals |y_d − y_{d−7}| on the FIRST half of the
    calendar calibrate q̂ = the 90th-percentile score, and the second half
    measures empirical coverage of ±q̂ — the distribution-free guarantee
    (coverage ≥ nominal, up to finite-sample slack) that
    `seasonal_naive_backtest`'s MAE/MAPE point metrics cannot give.
    Calibration/evaluation split at the calendar MIDPOINT (integer day
    arithmetic — no ranking, no window anywhere).

    Shape: one combinable daily groupBy, a calendar self-join (day−7),
    a 1-row percentile sketch over the calibration half, and a 1-row
    coverage reduce — day-domain relations throughout. Spark percentile ≡
    DuckDB quantile_cont (type-7, ulp-verified), residuals off quantized
    y → round-4/6 hash-stable."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    a, f_ = daily.alias("a"), daily.alias("f")
    paired = a.join(
        f_, F.col("a.day") == F.date_add(F.col("f.day"), 7)
    ).select(
        F.col("a.day").alias("day"),
        F.abs(F.col("a.y") - F.col("f.y")).alias("resid"),
    )
    split = paired.agg(
        F.date_add(
            F.min("day"),
            F.floor(F.datediff(F.max("day"), F.min("day")) / 2).cast("int"),
        ).alias("mid")
    )
    j = paired.crossJoin(F.broadcast(split))
    cal = j.filter(F.col("day") <= F.col("mid")).agg(
        F.percentile("resid", CONF_LEVEL).alias("q_hat"),
        F.count("*").alias("n_cal"),
    )
    evh = (
        j.filter(F.col("day") > F.col("mid"))
        .crossJoin(F.broadcast(cal))
        .agg(
            F.count("*").alias("n_eval"),
            F.sum((F.col("resid") <= F.col("q_hat")).cast("long")).alias(
                "covered"
            ),
            F.any_value("q_hat").alias("q_hat"),
            F.any_value("n_cal").alias("n_cal"),
        )
    )
    return evh.select(
        "n_cal",
        "n_eval",
        F.round("q_hat", 4).alias("q_hat"),
        F.round(
            F.col("covered").cast("double") / F.col("n_eval"), 6
        ).alias("coverage"),
        F.lit(CONF_LEVEL).alias("nominal"),
    )


# ---------------------------------------------------------------------------
# Binary segmentation: two-level CUSUM changepoint tree
# ---------------------------------------------------------------------------

binseg_oracle = """
WITH daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS day, avg(value) AS m
  FROM events GROUP BY 1
), mu0 AS (SELECT avg(m) AS mu FROM daily),
c0 AS (
  SELECT day, m,
         sum(m - mu) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
  FROM daily, mu0
), cp0 AS MATERIALIZED (
  SELECT day AS cp, round(abs(s), 6) AS peak
  FROM c0 ORDER BY round(abs(s), 6) DESC, day LIMIT 1
), seg AS MATERIALIZED (
  SELECT d.day, d.m,
         CASE WHEN d.day <= p.cp THEN 'left' ELSE 'right' END AS side
  FROM daily d, cp0 p
), mus AS (SELECT side, avg(m) AS mu FROM seg GROUP BY side),
c1 AS (
  SELECT s.side, s.day, s.m,
         sum(s.m - u.mu) OVER (PARTITION BY s.side ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s2
  FROM seg s JOIN mus u ON u.side = s.side
), cp1 AS (
  SELECT side, day AS cp, round(abs(s2), 6) AS peak,
         row_number() OVER (PARTITION BY side
                            ORDER BY round(abs(s2), 6) DESC, day) AS rn
  FROM c1
)
SELECT 0 AS level, 'all' AS segment, p.cp AS changepoint_day, p.peak
FROM cp0 p
UNION ALL
SELECT 1, side, cp, peak FROM cp1 WHERE rn = 1
"""


@register("binary_segmentation_changepoints", binseg_oracle)
def binary_segmentation_changepoints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Binary segmentation (two levels) of the daily mean-value series:
    the level-0 CUSUM peak splits the calendar, then each half is
    re-scanned against its OWN mean for the strongest sub-shift — the
    multi-changepoint extension of `cusum_changepoint` (which can only
    name ONE shift; a series with two regime breaks puts the single peak
    between them and misleads). Output: the root changepoint and the
    best candidate inside each half with its peak mass.

    Determinism: every argmax orders by the ROUNDED peak with day
    tie-break (the cusum convention). Scale shape: one combinable daily
    groupBy is the data-sized stage; both scan levels run on the
    day-DOMAIN table — level 0 on the allowlisted bounded window, level
    1 PARTITIONED by segment side."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.avg("value").alias("m")
    )
    mu0 = daily.agg(F.avg("m").alias("mu"))
    w0 = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c0 = daily.crossJoin(F.broadcast(mu0)).withColumn(
        "s", F.sum(F.col("m") - F.col("mu")).over(w0)
    )
    cp0 = (
        c0.select("day", F.round(F.abs("s"), 6).alias("peak"))
        .orderBy(F.desc("peak"), F.asc("day"))
        .limit(1)
        .select(F.col("day").alias("cp"), "peak")
    )
    seg = daily.crossJoin(F.broadcast(cp0)).select(
        "day",
        "m",
        F.when(F.col("day") <= F.col("cp"), F.lit("left"))
        .otherwise(F.lit("right"))
        .alias("side"),
    )
    mus = seg.groupBy("side").agg(F.avg("m").alias("mu"))
    w1 = (
        Window.partitionBy("side")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    c1 = seg.join(F.broadcast(mus), "side").withColumn(
        "s2", F.sum(F.col("m") - F.col("mu")).over(w1)
    )
    w_rank = Window.partitionBy("side").orderBy(
        F.desc(F.round(F.abs("s2"), 6)), F.asc("day")
    )
    cp1 = (
        c1.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            F.lit(1).alias("level"),
            F.col("side").alias("segment"),
            F.col("day").alias("changepoint_day"),
            F.round(F.abs("s2"), 6).alias("peak"),
        )
    )
    root = cp0.select(
        F.lit(0).alias("level"),
        F.lit("all").alias("segment"),
        F.col("cp").alias("changepoint_day"),
        "peak",
    )
    return root.unionByName(cp1)


# ---------------------------------------------------------------------------
# XmR (individuals & moving range) control chart on daily revenue
# ---------------------------------------------------------------------------

#: Shewhart individuals-chart constants: 2.66 = 3/d2(2), 3.267 = D4(2),
#: embedded as identical literals in both engines
_XMR_E2 = 2.66
_XMR_D4 = 3.267

xmr_oracle = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, round(sum(value), 6) AS y
  FROM events GROUP BY 1
), mr AS (
  SELECT day, y, abs(y - lag(y) OVER (ORDER BY day)) AS mrange
  FROM daily
), lim AS (
  SELECT avg(y) AS xbar, avg(mrange) AS mrbar FROM mr
)
SELECT m.day, m.y, round(m.mrange, 6) AS mrange,
       round(l.xbar, 6) AS center,
       round(l.xbar + {_XMR_E2!r} * l.mrbar, 6) AS ucl,
       round(l.xbar - {_XMR_E2!r} * l.mrbar, 6) AS lcl,
       (m.y > l.xbar + {_XMR_E2!r} * l.mrbar
        OR m.y < l.xbar - {_XMR_E2!r} * l.mrbar) AS out_of_control,
       (m.mrange > {_XMR_D4!r} * l.mrbar) AS mr_out_of_control
FROM mr m, lim l
"""


@register("xmr_control_chart", xmr_oracle)
def xmr_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart XmR (individuals & moving-range) control chart on daily
    revenue: center line x̄, natural process limits x̄ ± 2.66·m̄R, and the
    D4 upper limit on the moving range itself — the SPC readout that
    separates routine variation from special causes, tighter-tailed than
    `event_zscore_grouped`'s z (mR̄ estimates short-term variation, so a
    slow drift trips it where a global σ hides it). Both flags compare
    the same doubles on both engines (constants are shared literals; y is
    quantized at 6 upstream).

    Shape: ONE combinable daily groupBy; lag + the two 1-row means ride
    the day-DOMAIN table (allowlisted bounded window)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value"), 6).alias("y")
    )
    w = Window.orderBy("day")
    mr = daily.withColumn(
        "mrange", F.abs(F.col("y") - F.lag("y").over(w))
    )
    lim = mr.agg(
        F.avg("y").alias("xbar"), F.avg("mrange").alias("mrbar")
    )
    j = mr.crossJoin(F.broadcast(lim))
    ucl = F.col("xbar") + _XMR_E2 * F.col("mrbar")
    lcl = F.col("xbar") - _XMR_E2 * F.col("mrbar")
    return j.select(
        "day",
        "y",
        F.round("mrange", 6).alias("mrange"),
        F.round("xbar", 6).alias("center"),
        F.round(ucl, 6).alias("ucl"),
        F.round(lcl, 6).alias("lcl"),
        ((F.col("y") > ucl) | (F.col("y") < lcl)).alias("out_of_control"),
        (F.col("mrange") > _XMR_D4 * F.col("mrbar")).alias(
            "mr_out_of_control"
        ),
    )


# ---------------------------------------------------------------------------
# Deterministic RANSAC line fit of the daily revenue trend
# ---------------------------------------------------------------------------

RANSAC_TRIALS = 32
RANSAC_EPS_SD = 0.5  # inlier tolerance, in global-sd units


def _ransac_oracle() -> str:
    from ..functions.hashing import sql_hash64

    h1 = sql_hash64("concat('ra:', CAST(t.trial AS VARCHAR))")
    h2 = sql_hash64("concat('rb:', CAST(t.trial AS VARCHAR))")
    return f"""
WITH daily AS (
  SELECT CAST(floor(epoch_ms(CAST(ts AS TIMESTAMP)) / 86400000.0) AS BIGINT)
           AS d,
         round(sum(value), 6) AS y
  FROM events GROUP BY 1
), idx AS (
  SELECT d, y, row_number() OVER (ORDER BY d) AS rn FROM daily
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 stddev_samp(y) AS sd FROM daily),
trials AS (
  SELECT unnest(range(0, {RANSAC_TRIALS})) AS trial
), picks AS (
  SELECT t.trial,
         1 + ({h1} % (SELECT n FROM nn)) AS i1,
         1 + ({h2} % (SELECT n FROM nn)) AS i2
  FROM trials t
), lines AS (
  SELECT p.trial, a.d AS d1, a.y AS y1,
         (b.y - a.y) / (b.d - a.d) AS slope
  FROM picks p
  JOIN idx a ON a.rn = p.i1
  JOIN idx b ON b.rn = p.i2
  WHERE p.i1 <> p.i2
), scored AS (
  SELECT l.trial, l.d1, l.slope,
         CAST(sum(CASE WHEN abs(dd.y - (l.y1 + l.slope * (dd.d - l.d1)))
                            <= {RANSAC_EPS_SD!r} * (SELECT sd FROM nn)
                       THEN 1 ELSE 0 END) AS BIGINT) AS inliers
  FROM lines l, daily dd
  GROUP BY l.trial, l.d1, l.y1, l.slope
)
SELECT trial, round(slope, 6) AS slope,
       CAST(inliers AS BIGINT) AS inliers,
       (row_number() OVER (ORDER BY inliers DESC, trial) = 1) AS is_best
FROM scored
"""


@register("ransac_trend_daily", _ransac_oracle())
def ransac_trend_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic RANSAC line fit of the daily revenue trend: 32
    trials each anchor a line through two hash-chosen days (salted
    portable hash of the trial id — replayable, engine-identical, the
    `negative_sampling_pairs` determinism convention) and count inlier
    days within 0.5·sd of the line; the max-inlier trial wins. The
    breakdown-point complement of `theil_sen_daily_trend` (median of all
    pairwise slopes): RANSAC survives >50% contamination when a
    consensus structure exists, and its inlier COUNT is itself the
    structure readout.

    Shape: everything after the ONE combinable daily groupBy is
    day-DOMAIN bounded — a 32-row trial spine, two rank joins, and a
    trials×days (32·|days|) scoring aggregate. Degenerate trials
    (i1 = i2) drop on both engines; ranks ride the allowlisted
    day-domain window."""
    from pyspark.sql import Window

    from ..functions.hashing import portable_hash64
    from ..functions.timeutil import epoch_ms as _ems

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.floor(_ems(F.col("ts").cast("timestamp")) / 86400000)
        .cast("bigint")
        .alias("d")
    ).agg(F.round(F.sum("value"), 6).alias("y"))
    w = Window.orderBy("d")
    idx = daily.withColumn("rn", F.row_number().over(w))
    nn = daily.agg(
        F.count("*").alias("n"), F.stddev_samp("y").alias("sd")
    )
    trials = daily.sparkSession.range(0, RANSAC_TRIALS).select(
        F.col("id").cast("int").alias("trial")
    )
    picks = trials.crossJoin(F.broadcast(nn)).select(
        "trial",
        "sd",
        (
            1
            + F.pmod(
                portable_hash64(
                    F.concat(F.lit("ra:"), F.col("trial").cast("string"))
                ),
                F.col("n"),
            )
        ).alias("i1"),
        (
            1
            + F.pmod(
                portable_hash64(
                    F.concat(F.lit("rb:"), F.col("trial").cast("string"))
                ),
                F.col("n"),
            )
        ).alias("i2"),
    )
    a, b = idx.alias("a"), idx.alias("b")
    lines = (
        picks.join(F.broadcast(a), F.col("i1") == F.col("a.rn"))
        .join(F.broadcast(b), F.col("i2") == F.col("b.rn"))
        .filter(F.col("i1") != F.col("i2"))
        .select(
            "trial",
            "sd",
            F.col("a.d").alias("d1"),
            F.col("a.y").alias("y1"),
            (
                (F.col("b.y") - F.col("a.y"))
                / (F.col("b.d") - F.col("a.d"))
            ).alias("slope"),
        )
    )
    scored = (
        lines.crossJoin(daily.select(F.col("d").alias("dd"), F.col("y").alias("yy")))
        .groupBy("trial", "d1", "y1", "slope")
        .agg(
            F.sum(
                (
                    F.abs(
                        F.col("yy")
                        - (F.col("y1") + F.col("slope") * (F.col("dd") - F.col("d1")))
                    )
                    <= RANSAC_EPS_SD * F.col("sd")
                ).cast("long")
            ).alias("inliers")
        )
    )
    w_best = Window.orderBy(F.desc("inliers"), F.asc("trial"))
    return scored.select(
        "trial",
        F.round("slope", 6).alias("slope"),
        "inliers",
        (F.row_number().over(w_best) == 1).alias("is_best"),
    )


# ---------------------------------------------------------------------------
# Page-Hinkley sequential drift detector (round 13)
# ---------------------------------------------------------------------------

#: slack, as a fraction of the grand daily mean (δ = mean/10): drift must
#: exceed the slack PER DAY before it accumulates — the knob that makes
#: Page-Hinkley ignore noise CUSUM would integrate
PH_DELTA_NUM = 1
PH_DELTA_DEN = 10
#: alarm threshold λ, in units of the grand daily mean
PH_LAMBDA_MEANS = 3

page_hinkley_oracle = f"""
WITH daily AS (
  SELECT CAST(floor(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 86400000.0)
              AS BIGINT) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY 1
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(rev_c) AS BIGINT) AS s
  FROM daily
), m AS (
  -- m_t scaled by DEN·n (exact): DEN·n·Σx − t·(DEN + NUM/…)·S …
  SELECT d,
         {PH_DELTA_DEN} * t.n
           * sum(CAST(rev_c AS HUGEINT)) OVER (ORDER BY d)
         - CAST(row_number() OVER (ORDER BY d) AS HUGEINT)
           * ({PH_DELTA_DEN} + {PH_DELTA_NUM}) * t.s AS ms
  FROM daily, tot t
), ph AS (
  SELECT d,
         ms - min(ms) OVER (ORDER BY d
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS phs
  FROM m
)
SELECT t.n AS n_days,
       round(CAST(max(p.phs) AS DOUBLE) / ({PH_DELTA_DEN} * t.s), 6)
         AS ph_max_over_mean,
       CAST(min(CASE WHEN p.phs > {PH_LAMBDA_MEANS * PH_DELTA_DEN} * t.s
                     THEN p.d END) AS BIGINT) AS first_alarm_day,
       CAST(sum(CASE WHEN p.phs > {PH_LAMBDA_MEANS * PH_DELTA_DEN} * t.s
                     THEN 1 ELSE 0 END) AS BIGINT) AS alarm_days
FROM ph p, tot t
GROUP BY t.n, t.s
"""


@register("page_hinkley_drift", page_hinkley_oracle)
def page_hinkley_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift detector over daily revenue: the
    SEQUENTIAL test PH_t = m_t − min_{i≤t} m_i with m_t =
    Σ(x_i − x̄ − δ) — the running-minimum reset is what
    `cusum_changepoint` lacks (CUSUM locates ONE retrospective shift;
    PH raises an alarm the first day cumulative drift since the best
    recent level exceeds λ, the online-monitor semantics), and the
    slack δ = x̄/10 is what keeps zero-mean noise from accumulating.
    Reports the peak drift (in daily-mean units), the FIRST alarm day
    (λ = 3 daily means) and the alarm-day count.

    Everything is EXACT integer arithmetic: m_t is scaled by
    DEN·n (n·Σx − t·(DEN+NUM)/DEN·S cleared of both denominators) and
    accumulated in DECIMAL(38,0)/HUGEINT — cents × day-count × 10 would
    pass int64 at a 100 TB year but not with margin; the threshold
    compare is integer (phs > 30·S), so no alarm day can flip on float
    noise. One combinable daily groupBy is the data-sized stage; the
    running sum/min ride day-DOMAIN windows (cusum shape,
    plan-audit allowlisted)."""
    from ..functions.timeutil import epoch_ms

    od = load_table(spark, sf_dir, "orders")
    daily = (
        od.select(
            F.floor(epoch_ms(F.col("o_orderdate").cast("timestamp")) / 86400000)
            .cast("bigint")
            .alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").alias("rev_c"))
    )
    tot = daily.agg(
        F.count("*").alias("n"), F.sum("rev_c").alias("s")
    )
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wrn = Window.orderBy("d")
    m = daily.crossJoin(F.broadcast(tot)).select(
        "d",
        "n",
        "s",
        (
            F.lit(PH_DELTA_DEN)
            * F.col("n")
            * F.sum(F.col("rev_c").cast("decimal(38,0)")).over(wcum)
            - F.row_number().over(wrn).cast("decimal(38,0)")
            * (PH_DELTA_DEN + PH_DELTA_NUM)
            * F.col("s")
        ).alias("ms"),
    )
    ph = m.select(
        "d",
        "n",
        "s",
        (F.col("ms") - F.min("ms").over(wcum)).alias("phs"),
    )
    lam = F.lit(PH_LAMBDA_MEANS * PH_DELTA_DEN).cast("decimal(38,0)")
    return ph.groupBy("n", "s").agg(
        F.round(
            F.max("phs").cast("double") / (PH_DELTA_DEN * F.col("s")), 6
        ).alias("ph_max_over_mean"),
        F.min(
            F.when(F.col("phs") > lam * F.col("s"), F.col("d"))
        ).alias("first_alarm_day"),
        F.sum(
            (F.col("phs") > lam * F.col("s")).cast("long")
        ).alias("alarm_days"),
    ).select(
        F.col("n").alias("n_days"),
        "ph_max_over_mean",
        "first_alarm_day",
        "alarm_days",
    )


# ---------------------------------------------------------------------------
# Granger causality, order volume → revenue (round 13)
# ---------------------------------------------------------------------------

granger_oracle = """
WITH daily AS (
  SELECT CAST(floor(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 86400000.0)
              AS BIGINT) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS y,
         CAST(count(*) AS BIGINT) AS x
  FROM orders GROUP BY 1
), lagged AS (
  SELECT y, lag(y) OVER (ORDER BY d) AS y1, lag(x) OVER (ORDER BY d) AS x1
  FROM daily
), obs AS (
  SELECT CAST(y AS HUGEINT) AS y, CAST(y1 AS HUGEINT) AS y1,
         CAST(x1 AS HUGEINT) AS x1
  FROM lagged WHERE y1 IS NOT NULL
), mom AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(y) AS sy, sum(y1) AS s1, sum(x1) AS s2,
         sum(y1 * y1) AS s11, sum(x1 * x1) AS s22, sum(y1 * x1) AS s12,
         sum(y * y1) AS sy1, sum(y * x1) AS sy2, sum(y * y) AS syy
  FROM obs
), cm AS (
  SELECT CAST(n AS BIGINT) AS n,
         CAST(n * s11 - s1 * s1 AS DOUBLE) AS c11,
         CAST(n * s22 - s2 * s2 AS DOUBLE) AS c22,
         CAST(n * s12 - s1 * s2 AS DOUBLE) AS c12,
         CAST(n * sy1 - sy * s1 AS DOUBLE) AS cy1,
         CAST(n * sy2 - sy * s2 AS DOUBLE) AS cy2,
         CAST(n * syy - sy * sy AS DOUBLE) AS cyy
  FROM mom
)
SELECT n AS n_days,
       round((cy2 * c11 - cy1 * c12)
             / (c11 * c22 - c12 * c12) / 100.0, 6) AS b_volume_lag,
       round(((cyy - cy1 * cy1 / c11)
              - (cyy - (cy1 * (cy1 * c22 - cy2 * c12)
                        + cy2 * (cy2 * c11 - cy1 * c12))
                       / (c11 * c22 - c12 * c12)))
             / ((cyy - (cy1 * (cy1 * c22 - cy2 * c12)
                        + cy2 * (cy2 * c11 - cy1 * c12))
                       / (c11 * c22 - c12 * c12))
                / (n - 3)), 6) AS f_stat
FROM cm
"""


@register("granger_causality_daily", granger_oracle)
def granger_causality_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality test, lag-1: does yesterday's order VOLUME help
    predict today's REVENUE beyond yesterday's revenue itself? F-test of
    the unrestricted regression y_t ~ y_{t−1} + x_{t−1} against the
    restricted y_t ~ y_{t−1} — the predictive-direction readout
    `cross_corr_lagged` (symmetric correlation) can't give. b_volume_lag
    is reported in cents-per-order units ÷100 (dollars/order).

    Determinism: every regression moment (Σy, Σy₁², Σy·x₁, …) is an
    EXACT integer over cents/counts, accumulated in HUGEINT/DECIMAL(38,0)
    (n·Σyy − (Σy)² ~ 10²⁶ at a 100 TB year — far past int64, the
    bollinger variance-numerator discipline); the centered moments
    convert to double ONCE and both engines evaluate the identical
    closed-form determinant algebra. Nothing float is ever summed.

    Shape: one combinable daily groupBy (the data-sized stage), one lag
    window over the day DOMAIN (allowlisted, cusum shape), one moment
    reduce, driver-free."""
    from ..functions.timeutil import epoch_ms

    od = load_table(spark, sf_dir, "orders")
    daily = (
        od.select(
            F.floor(epoch_ms(F.col("o_orderdate").cast("timestamp")) / 86400000)
            .cast("bigint")
            .alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").alias("y"), F.count("*").alias("x"))
    )
    wl = Window.orderBy("d")
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    obs = (
        daily.select(
            "d",
            "y",
            F.lag("y").over(wl).alias("y1"),
            F.lag("x").over(wl).alias("x1"),
        )
        .filter(F.col("y1").isNotNull())
        .select(dec(F.col("y")).alias("y"), dec(F.col("y1")).alias("y1"),
                dec(F.col("x1")).alias("x1"))
    )
    mom = obs.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("y1").alias("s1"),
        F.sum("x1").alias("s2"),
        F.sum(F.col("y1") * F.col("y1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x1")).alias("s22"),
        F.sum(F.col("y1") * F.col("x1")).alias("s12"),
        F.sum(F.col("y") * F.col("y1")).alias("sy1"),
        F.sum(F.col("y") * F.col("x1")).alias("sy2"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = dec(F.col("n"))
    cm = mom.select(
        F.col("n"),
        (nd * F.col("s11") - F.col("s1") * F.col("s1")).cast("double").alias("c11"),
        (nd * F.col("s22") - F.col("s2") * F.col("s2")).cast("double").alias("c22"),
        (nd * F.col("s12") - F.col("s1") * F.col("s2")).cast("double").alias("c12"),
        (nd * F.col("sy1") - F.col("sy") * F.col("s1")).cast("double").alias("cy1"),
        (nd * F.col("sy2") - F.col("sy") * F.col("s2")).cast("double").alias("cy2"),
        (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double").alias("cyy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    rss_r = F.col("cyy") - F.col("cy1") * F.col("cy1") / F.col("c11")
    rss_u = F.col("cyy") - (
        F.col("cy1") * (F.col("cy1") * F.col("c22") - F.col("cy2") * F.col("c12"))
        + F.col("cy2") * (F.col("cy2") * F.col("c11") - F.col("cy1") * F.col("c12"))
    ) / det
    return cm.select(
        F.col("n").alias("n_days"),
        F.round(
            (F.col("cy2") * F.col("c11") - F.col("cy1") * F.col("c12"))
            / det
            / 100.0,
            6,
        ).alias("b_volume_lag"),
        F.round((rss_r - rss_u) / (rss_u / (F.col("n") - 3)), 6).alias(
            "f_stat"
        ),
    )


# ---------------------------------------------------------------------------
# Newey-West (HAC) standard error for the daily revenue trend (round 13)
# ---------------------------------------------------------------------------

NW_LAGS = 5  # Bartlett-kernel truncation

nw_oracle = f"""
WITH daily AS (
  SELECT CAST(floor(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 86400000.0)
              AS BIGINT) AS d,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders GROUP BY 1
), mom AS (
  SELECT CAST(count(*) AS HUGEINT) AS n,
         sum(CAST(d AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(d AS HUGEINT) * d) AS sxx,
         sum(CAST(d AS HUGEINT) * y) AS sxy
  FROM daily
), fit AS (
  SELECT CAST(n AS BIGINT) AS n, sx,
         CAST(n * sxx - sx * sx AS HUGEINT) AS cxx,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS b,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
  FROM mom
), resid AS (
  SELECT d,
         CAST(floor(abs((y - f.ybar) - f.b * (d - f.xbar)) + 0.5) AS BIGINT)
         * CASE WHEN (y - f.ybar) - f.b * (d - f.xbar) >= 0
                THEN 1 ELSE -1 END AS eq,
         CAST(f.n AS HUGEINT) * d - f.sx AS xcn
  FROM daily, fit f
), u AS (
  SELECT d, CAST(eq AS HUGEINT) AS eq, CAST(eq AS HUGEINT) * xcn AS ut
  FROM resid
), lagged AS (
  SELECT eq, ut,
         {", ".join(
             f"lag(ut, {k}) OVER (ORDER BY d) AS ul{k}"
             for k in range(1, NW_LAGS + 1))}
  FROM u
), gam AS (
  SELECT sum(eq * eq) AS rssq,
         sum(ut * ut) AS g0,
         {", ".join(
             f"sum(ut * ul{k}) AS g{k}"
             for k in range(1, NW_LAGS + 1))}
  FROM lagged
)
SELECT f.n AS n_days,
       round(f.b / 100.0, 6) AS slope_per_day,
       round(sqrt(CAST(g.rssq AS DOUBLE) * f.n
                  / ((f.n - 2) * CAST(f.cxx AS DOUBLE))) / 100.0, 6)
         AS ols_se,
       round(sqrt((CAST({NW_LAGS + 1} AS HUGEINT) * g.g0
                   + 2 * ({" + ".join(
                       f"CAST({NW_LAGS + 1 - k} AS HUGEINT) * g.g{k}"
                       for k in range(1, NW_LAGS + 1))})
                  )::DOUBLE / {NW_LAGS + 1})
             / CAST(f.cxx AS DOUBLE) / 100.0, 6) AS nw_se
FROM fit f, gam g
"""


@register("newey_west_se", nw_oracle)
def newey_west_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey-West (HAC, Bartlett kernel, {NW_LAGS} lags) standard error
    of the daily-revenue OLS slope, next to the i.i.d. OLS SE — daily
    revenue is autocorrelated (see `acf_daily_revenue`), so the naive SE
    understates uncertainty and every trend "significance" read off it
    is too confident; the NW/OLS ratio IS the honesty correction. The
    inference companion to `regression_trend` (point estimate),
    `theil_sen_daily_trend` / `ransac_trend_daily` (robust estimates).

    Determinism: OLS moments are exact HUGEINT/DECIMAL(38,0); residuals
    are identical IEEE doubles on both engines (same closed-form a, b)
    quantized to INTEGER CENTS before any sum, and all autocovariance
    products Σu_t·u_{t−l} (u = e·(n·d − Σd), exact ints ~10¹⁶ — their
    products force the wide type) accumulate exactly; the Bartlett
    weights (1 − l/(L+1)) are cleared to integers by scaling the whole
    kernel sum by (L+1). Three sqrt/division ops at the end, identical
    both engines.

    Shape: one combinable daily groupBy; lag windows over the day
    DOMAIN (one ordering, allowlisted); two 1-row reduces."""
    from ..functions.timeutil import epoch_ms

    od = load_table(spark, sf_dir, "orders")
    daily = (
        od.select(
            F.floor(epoch_ms(F.col("o_orderdate").cast("timestamp")) / 86400000)
            .cast("bigint")
            .alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").alias("y"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = daily.agg(
        F.count("*").alias("n"),
        F.sum("d").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("d")) * F.col("d")).alias("sxx"),
        F.sum(dec(F.col("d")) * F.col("y")).alias("sxy"),
    )
    nd = dec(F.col("n"))
    fit = mom.select(
        "n",
        "sx",
        (nd * F.col("sxx") - dec(F.col("sx")) * F.col("sx")).alias("cxx"),
        (
            (nd * F.col("sxy") - dec(F.col("sx")) * F.col("sy")).cast("double")
            / (nd * F.col("sxx") - dec(F.col("sx")) * F.col("sx")).cast(
                "double"
            )
        ).alias("b"),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias("ybar"),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias("xbar"),
    )
    e = (F.col("y") - F.col("ybar")) - F.col("b") * (F.col("d") - F.col("xbar"))
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        "n",
        "cxx",
        "b",
        (
            F.floor(F.abs(e) + 0.5).cast("bigint")
            * F.when(e >= 0, F.lit(1)).otherwise(F.lit(-1))
        ).alias("eq"),
        (dec(F.col("n")) * F.col("d") - dec(F.col("sx"))).alias("xcn"),
    )
    u = resid.select(
        "d",
        "n",
        "cxx",
        "b",
        dec(F.col("eq")).alias("eqd"),
        (dec(F.col("eq")) * F.col("xcn")).alias("ut"),
    )
    wl = Window.orderBy("d")
    lags = [F.lag("ut", k).over(wl).alias(f"ul{k}") for k in range(1, NW_LAGS + 1)]
    lagged = u.select("n", "cxx", "b", "eqd", "ut", *lags)
    gam = lagged.agg(
        F.max("n").alias("n"),
        F.max("cxx").alias("cxx"),
        F.max("b").alias("b"),
        F.sum(F.col("eqd") * F.col("eqd")).alias("rssq"),
        F.sum(F.col("ut") * F.col("ut")).alias("g0"),
        *[
            F.sum(F.col("ut") * F.col(f"ul{k}")).alias(f"g{k}")
            for k in range(1, NW_LAGS + 1)
        ],
    )
    kernel = F.lit(NW_LAGS + 1).cast("decimal(38,0)") * F.col("g0")
    for k in range(1, NW_LAGS + 1):
        kernel = kernel + F.lit(2 * (NW_LAGS + 1 - k)).cast(
            "decimal(38,0)"
        ) * F.col(f"g{k}")
    return gam.select(
        F.col("n").alias("n_days"),
        F.round(F.col("b") / 100.0, 6).alias("slope_per_day"),
        F.round(
            F.sqrt(
                F.col("rssq").cast("double")
                * F.col("n")
                / ((F.col("n") - 2) * F.col("cxx").cast("double"))
            )
            / 100.0,
            6,
        ).alias("ols_se"),
        F.round(
            F.sqrt(kernel.cast("double") / (NW_LAGS + 1))
            / F.col("cxx").cast("double")
            / 100.0,
            6,
        ).alias("nw_se"),
    )


# ---------------------------------------------------------------------------
# Round-14: residual-diagnostic pair for the daily trend — Durbin-Watson
# (autocorrelation) and Breusch-Pagan (heteroscedasticity)
# ---------------------------------------------------------------------------

_TREND_RESID_SQL = """
daily AS (
  SELECT CAST(floor(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 86400000.0)
              AS BIGINT) AS d,
         sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS y
  FROM orders GROUP BY d
), mom AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(d) AS BIGINT) AS sx,
         CAST(sum(y) AS HUGEINT) AS sy,
         sum(CAST(d AS HUGEINT) * d) AS sxx,
         sum(CAST(d AS HUGEINT) * y) AS sxy
  FROM daily
), fit AS (
  SELECT n, sx, sxx,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS b,
         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
         CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar
  FROM mom
), resid AS (
  SELECT d, n,
         CAST(floor(abs((y - ybar) - b * (d - xbar)) / 100.0 + 0.5)
              AS BIGINT)
           * CASE WHEN (y - ybar) - b * (d - xbar) >= 0 THEN 1 ELSE -1 END
           AS eq
  FROM daily CROSS JOIN fit
)
"""

durbin_watson_oracle = f"""
WITH {_TREND_RESID_SQL}, lagged AS (
  SELECT n, eq, lag(eq) OVER (ORDER BY d) AS ep FROM resid
)
SELECT max(n) AS n_days,
       floor(CAST(sum(CASE WHEN ep IS NULL THEN 0
                           ELSE CAST(eq - ep AS HUGEINT) * (eq - ep) END)
                  AS DOUBLE)
             / CAST(sum(CAST(eq AS HUGEINT) * eq) AS DOUBLE)
             * 1000000 + 0.5) / 1000000 AS dw_stat
FROM lagged
"""


@register("durbin_watson_daily", durbin_watson_oracle)
def durbin_watson_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DURBIN-WATSON statistic of the daily-revenue trend residuals —
    the canonical lag-1 autocorrelation diagnostic (DW≈2 none, →0
    positive, →4 negative): the quick gate that decides whether
    `newey_west_se`'s HAC correction is even needed before paying its
    L-lag kernel. Residuals come from the SAME closed-form exact-moment
    OLS as newey_west (identical IEEE doubles both engines), quantized
    to integer DOLLARS before any sum — numerator and denominator are
    exact HUGEINT/DECIMAL sums of int products, one double division.
    Shape: one combinable daily groupBy; one day-DOMAIN lag window
    (calendar-bounded, allowlisted)."""
    from ..functions.timeutil import epoch_ms

    od = load_table(spark, sf_dir, "orders")
    daily = (
        od.select(
            F.floor(
                epoch_ms(F.col("o_orderdate").cast("timestamp")) / 86400000
            )
            .cast("bigint")
            .alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").alias("y"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = daily.agg(
        F.count("*").alias("n"),
        F.sum("d").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("d")) * F.col("d")).alias("sxx"),
        F.sum(dec(F.col("d")) * F.col("y")).alias("sxy"),
    )
    nd = dec(F.col("n"))
    fit = mom.select(
        "n",
        (
            (nd * F.col("sxy") - dec(F.col("sx")) * F.col("sy"))
            .cast("double")
            / (nd * F.col("sxx") - dec(F.col("sx")) * F.col("sx"))
            .cast("double")
        ).alias("b"),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias(
            "ybar"
        ),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "xbar"
        ),
    )
    e = (F.col("y") - F.col("ybar")) - F.col("b") * (
        F.col("d") - F.col("xbar")
    )
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "d",
        "n",
        (
            F.floor(F.abs(e) / 100.0 + 0.5).cast("bigint")
            * F.when(e >= 0, F.lit(1)).otherwise(F.lit(-1))
        ).alias("eq"),
    )
    lagged = resid.select(
        "n", "eq", F.lag("eq").over(Window.orderBy("d")).alias("ep")
    )
    num = F.sum(
        F.when(F.col("ep").isNull(), F.lit(0).cast("decimal(38,0)")).otherwise(
            dec(F.col("eq") - F.col("ep")) * (F.col("eq") - F.col("ep"))
        )
    )
    den = F.sum(dec(F.col("eq")) * F.col("eq"))
    return lagged.agg(
        F.max("n").alias("n_days"),
        (
            F.floor(num.cast("double") / den.cast("double") * 1000000 + 0.5)
            / 1000000
        ).alias("dw_stat"),
    )


breusch_pagan_oracle = f"""
WITH {_TREND_RESID_SQL}, aux AS (
  SELECT n, d, CAST(eq AS HUGEINT) * eq AS u FROM resid
), am AS (
  SELECT max(n) AS n,
         CAST(sum(d) AS HUGEINT) AS sx,
         sum(CAST(d AS HUGEINT) * d) AS sxx,
         sum(u) AS su,
         sum(u * d) AS sud,
         sum(u * u) AS suu
  FROM aux
)
SELECT CAST(n AS BIGINT) AS n_days,
       floor(CAST(n AS DOUBLE)
             * (CAST(n * sud - sx * su AS DOUBLE)
                * CAST(n * sud - sx * su AS DOUBLE))
             / (CAST(n * sxx - sx * sx AS DOUBLE)
                * CAST(n * suu - su * su AS DOUBLE))
             * 10000 + 0.5) / 10000 AS bp_lm
FROM am
"""


@register("breusch_pagan_daily", breusch_pagan_oracle)
def breusch_pagan_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BREUSCH-PAGAN heteroscedasticity test (Koenker's studentized LM
    form — n·R² of the squared-residual-on-regressor auxiliary fit) for
    the daily-revenue trend: growing revenue usually means growing
    VARIANCE, which biases the i.i.d. OLS SE that `newey_west_se`
    corrects for autocorrelation but not scale — this is the other half
    of that diagnosis. χ²(1) under homoscedasticity.

    Exactness: residuals are the shared closed-form-OLS doubles
    quantized to integer dollars; u = eq² and every auxiliary moment
    (Σu, Σud, Σu²) accumulates in exact HUGEINT/DECIMAL — R² is a ratio
    of exact-int co-moments converted once (the granger determinant
    discipline; the ~10³⁴ Σu² term is why dollars, not cents — the
    decimal(38) envelope then holds past sf≈1000). One combinable daily
    groupBy; NO window at all (the lag-free member of the residual
    pair)."""
    from ..functions.timeutil import epoch_ms

    od = load_table(spark, sf_dir, "orders")
    daily = (
        od.select(
            F.floor(
                epoch_ms(F.col("o_orderdate").cast("timestamp")) / 86400000
            )
            .cast("bigint")
            .alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c"),
        )
        .groupBy("d")
        .agg(F.sum("c").alias("y"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    mom = daily.agg(
        F.count("*").alias("n"),
        F.sum("d").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec(F.col("d")) * F.col("d")).alias("sxx"),
        F.sum(dec(F.col("d")) * F.col("y")).alias("sxy"),
    )
    nd = dec(F.col("n"))
    fit = mom.select(
        "n",
        (
            (nd * F.col("sxy") - dec(F.col("sx")) * F.col("sy"))
            .cast("double")
            / (nd * F.col("sxx") - dec(F.col("sx")) * F.col("sx"))
            .cast("double")
        ).alias("b"),
        (F.col("sy").cast("double") / F.col("n").cast("double")).alias(
            "ybar"
        ),
        (F.col("sx").cast("double") / F.col("n").cast("double")).alias(
            "xbar"
        ),
    )
    e = (F.col("y") - F.col("ybar")) - F.col("b") * (
        F.col("d") - F.col("xbar")
    )
    aux = daily.crossJoin(F.broadcast(fit)).select(
        "n",
        "d",
        (
            dec(
                F.floor(F.abs(e) / 100.0 + 0.5).cast("bigint")
                * F.when(e >= 0, F.lit(1)).otherwise(F.lit(-1))
            )
        ).alias("eqd"),
    ).select("n", "d", (F.col("eqd") * F.col("eqd")).alias("u"))
    am = aux.agg(
        F.max("n").alias("n"),
        F.sum(dec(F.col("d"))).alias("sx"),
        F.sum(dec(F.col("d")) * F.col("d")).alias("sxx"),
        F.sum("u").alias("su"),
        F.sum(F.col("u") * F.col("d")).alias("sud"),
        F.sum(F.col("u") * F.col("u")).alias("suu"),
    )
    nn = dec(F.col("n"))
    cxu = (nn * F.col("sud") - F.col("sx") * F.col("su")).cast("double")
    cxx = (nn * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    cuu = (nn * F.col("suu") - F.col("su") * F.col("su")).cast("double")
    bp = F.col("n").cast("double") * (cxu * cxu) / (cxx * cuu)
    return am.select(
        F.col("n").cast("long").alias("n_days"),
        (F.floor(bp * 10000 + 0.5) / 10000).alias("bp_lm"),
    )
