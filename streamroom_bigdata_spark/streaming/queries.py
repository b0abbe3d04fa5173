"""Event-time windowed aggregations (SURVEY.md §2.9 T7-T9).

The reference does no event-time processing at all — its time fields are
strings and all reasoning is lexicographic (consumer.scala:28-30). These
operators add the real thing: tumbling / sliding / session windows over the
``events`` fixture's ``ts`` column.

Each core transform takes a DataFrame and works identically on a batch frame
(registered below with a DuckDB oracle — window assignment is pure algebra,
so the batch result IS the converged streaming result) and on a streaming
frame (tests drive the same transforms through ``readStream`` with a
watermark and assert agreement with the batch answer; see
tests/test_streaming.py). ``with_watermark`` is the only streaming-specific
step (T7): late rows beyond the bound are dropped and window state is purged
— bounded state at any volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

TUMBLE = "1 hour"
SLIDE_DURATION = "1 hour"
SLIDE_STEP = "30 minutes"
SESSION_GAP = "10 minutes"


def with_watermark(events: DataFrame, delay: str = "15 minutes") -> DataFrame:
    """T7: bound event-time state — rows later than ``delay`` behind the max
    seen ``ts`` are dropped; closed windows are emitted and purged."""
    return events.withWatermark("ts", delay)


def _flatten_window(df: DataFrame, window_col: str = "window") -> DataFrame:
    return df.select(
        F.col(f"{window_col}.start").alias("window_start"),
        F.col(f"{window_col}.end").alias("window_end"),
        *[c for c in df.columns if c != window_col],
    )


def tumbling_agg(events: DataFrame) -> DataFrame:
    """T8 tumbling: non-overlapping 1-hour buckets × event_type."""
    out = events.groupBy(F.window("ts", TUMBLE), "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("sum_value"),
    )
    return _flatten_window(out)


def sliding_agg(events: DataFrame) -> DataFrame:
    """T8 sliding: 1-hour windows every 30 minutes — each event lands in two
    windows; Spark materializes the assignment as an internal explode, cost
    is duration/step copies per row."""
    out = events.groupBy(F.window("ts", SLIDE_DURATION, SLIDE_STEP)).agg(
        F.count("*").alias("n_events"),
        F.round(F.avg("value"), 6).alias("avg_value"),
    )
    return _flatten_window(out)


def session_agg(events: DataFrame) -> DataFrame:
    """T9 sessions: per-user windows that merge while consecutive events are
    within SESSION_GAP; window end = last event + gap."""
    out = events.groupBy(
        F.session_window("ts", SESSION_GAP), "user_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6).alias("sum_value"),
    )
    return _flatten_window(out, "session_window")


@register(
    "tumbling_window_events",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def tumbling_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_agg(load_table(spark, sf_dir, "events"))


@register(
    "sliding_window_events",
    """
    WITH assigned AS (
      SELECT unnest([time_bucket(INTERVAL 30 MINUTE, ts),
                     time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE])
               AS window_start,
             value
      FROM events
    )
    SELECT window_start,
           window_start + INTERVAL 1 HOUR AS window_end,
           count(*) AS n_events,
           round(avg(value), 6) AS avg_value
    FROM assigned
    GROUP BY 1, 2
    """,
)
def sliding_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_agg(load_table(spark, sf_dir, "events"))


@register(
    "session_window_events",
    f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP}
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, sum(new_session) OVER (
        PARTITION BY user_id ORDER BY ts
        ROWS UNBOUNDED PRECEDING
      ) AS session_no
      FROM flagged
    )
    SELECT min(ts) AS window_start,
           max(ts) + INTERVAL {SESSION_GAP} AS window_end,
           user_id,
           count(*) AS n_events,
           round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS sum_value
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def session_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_agg(load_table(spark, sf_dir, "events"))


JOIN_BOUND = "10 minutes"


def click_error_join_frames(clicks: DataFrame, errors: DataFrame) -> DataFrame:
    """Stream-stream (or batch-batch) interval join core: clicks matched to
    errors by the same user within [click_ts, click_ts + JOIN_BOUND].

    The equi-key (user_id) makes this a hash join with a range residual —
    one shuffle on user_id, never a cross product. On streaming inputs both
    sides must be watermarked (see :func:`stream_click_error_join`): the
    two-sided time bound lets Spark compute how long each side's state can
    matter and purge it — bounded state at any volume."""
    l = clicks.alias("l")
    r = errors.alias("r")
    return l.join(
        r,
        (F.col("l.user_id") == F.col("r.user_id"))
        & (F.col("r.ts") >= F.col("l.ts"))
        & (F.col("r.ts") <= F.col("l.ts") + F.expr(f"INTERVAL {JOIN_BOUND}")),
    ).select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("error_id"),
        F.col("l.user_id").alias("user_id"),
        F.col("l.ts").alias("click_ts"),
        F.col("r.ts").alias("error_ts"),
    )


def stream_click_error_join(
    clicks: DataFrame, errors: DataFrame, delay: str = "15 minutes"
) -> DataFrame:
    """T-EXT stream-stream join: watermark both sides, then the interval
    join above. Append-mode output; state on each side is dropped once the
    other side's watermark passes the join bound."""
    return click_error_join_frames(
        with_watermark(clicks, delay), with_watermark(errors, delay)
    )


@register(
    "click_error_join",
    """
    SELECT l.event_id AS click_id, r.event_id AS error_id, l.user_id,
           CAST(l.ts AS TIMESTAMP) AS click_ts,
           CAST(r.ts AS TIMESTAMP) AS error_ts
    FROM events l JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'click' AND r.event_type = 'error'
     AND CAST(r.ts AS TIMESTAMP) >= CAST(l.ts AS TIMESTAMP)
     AND CAST(r.ts AS TIMESTAMP) <= CAST(l.ts AS TIMESTAMP) + INTERVAL 10 MINUTE
    """,
)
def click_error_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch form of the interval join (the converged streaming answer)."""
    ev = load_table(spark, sf_dir, "events")
    return click_error_join_frames(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "error"),
    )


def stream_static_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join (the lookup-table pattern): a
    streaming event frame joined to a STATIC dimension — Spark plans the
    static side as a normal batch relation re-resolved every micro-batch
    (a broadcast for a small dim), no watermark or state needed (unlike
    stream-stream joins). Output: per-(segment) running counts/sums in
    update mode — the enriched rollup a dashboard consumes.

    ``dim`` must carry (user_id, segment). At 100 TB the static side is
    whatever the cluster can broadcast or shuffle per micro-batch; for
    mutable dims the manifest-table change feed (sources/manifest_table)
    is the refresh path."""
    enriched = events.join(dim, "user_id")
    return enriched.groupBy("segment").agg(
        F.count("*").alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 6
        ).alias("sum_value"),
    )


def ohlc_agg(events: DataFrame) -> DataFrame:
    """T8+ streaming twin of the batch `ohlc_daily_value` kernel (round-11
    quant wave): OHLC candlestick bars per tumbling hour — first/max/min/
    last `value`, open/close resolved by the unique (ts, event_id) struct
    so bars are deterministic under timestamp ties, exactly as the batch
    face. min_by/max_by/min/max are all declarative aggregates with
    map-side partials, so streaming state per open window is ONE row of
    four scalars + two keys — never the window's events. Works identically
    on a batch frame (tests assert closed-window agreement) and on a
    watermarked stream."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    out = events.groupBy(F.window("ts", TUMBLE)).agg(
        F.count("*").alias("n_events"),
        F.round(F.min_by("value", key), 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(F.max_by("value", key), 6).alias("close"),
    )
    return _flatten_window(out)
