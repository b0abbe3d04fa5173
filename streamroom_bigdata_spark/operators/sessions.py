"""Sessionization (gaps-and-islands) over the events table (SURVEY.md §2.5
W1-W3 composition; the batch complement of streaming session windows, T9).

The classic two-window plan: flag rows whose gap from the previous event
exceeds the threshold, running-sum the flags into a session index, then
aggregate per (user, session). Both windows partition by user_id — one hash
shuffle on user_id total; the second window and the final aggregation reuse
the first exchange's partitioning. No global sort, no driver state: at
100 TB this scales with the number of users, and AQE's skew handling covers
a pathologically hot user.

Millisecond epoch arithmetic on both sides (Spark ``unix_millis`` ≡ DuckDB
``epoch_ms``) keeps the gap comparison integer-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_ms
from ..registry import register
from ..sources import load_table

SESSION_GAP_MIN = 30
_GAP_MS = SESSION_GAP_MIN * 60 * 1000

sessionize_oracle = f"""
WITH ordered AS (
  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value,
         epoch_ms(CAST(ts AS TIMESTAMP)) AS ms,
         lag(epoch_ms(CAST(ts AS TIMESTAMP))) OVER (
           PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
         ) AS prev_ms
  FROM events
), flagged AS (
  SELECT *,
         CASE WHEN prev_ms IS NULL OR ms - prev_ms > {_GAP_MS}
              THEN 1 ELSE 0 END AS is_new
  FROM ordered
), numbered AS (
  SELECT *,
         CAST(sum(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS INT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 4) AS total_value
FROM numbered
GROUP BY user_id, session_idx
"""


@register("sessionize_events", sessionize_oracle)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: events more than SESSION_GAP_MIN apart start a
    new session; one row per (user, session) with bounds and totals."""
    return sessionize(load_table(spark, sf_dir, "events"))


def sessionize(events: DataFrame, gap_ms: int = _GAP_MS) -> DataFrame:
    """Gaps-and-islands sessionization of any (user_id, event_id, ts, value)
    frame — the composable core behind :func:`sessionize_events`."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ms = epoch_ms("ts")
    flagged = events.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.when(
            F.lag(ms).over(w).isNull() | (ms - F.lag(ms).over(w) > gap_ms),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    numbered = flagged.withColumn(
        "session_idx",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# Peak session concurrency per day — distributed sweep line
# ---------------------------------------------------------------------------

concurrency_oracle = f"""
WITH sess AS MATERIALIZED ({sessionize_oracle}),
b AS (
  SELECT session_start AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT session_end, -1 FROM sess
), g AS (
  SELECT t, delta, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
), run AS (
  SELECT t, sum(delta * c) OVER (ORDER BY t, delta) AS conc FROM g
)
SELECT CAST(t AS DATE) AS day,
       CAST(max(conc) AS BIGINT) AS peak_concurrent,
       CAST(count(*) AS BIGINT) AS n_boundaries
FROM run GROUP BY 1
"""


@register("session_concurrency_profile", concurrency_oracle)
def session_concurrency_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via a DISTRIBUTED sweep line over
    session boundaries — the capacity question (how many users were on
    AT ONCE, Little's-law input) that per-day session COUNTS
    (`rolling_active_users`) cannot answer, because overlap depends on
    interval structure, not volume. Convention: at equal timestamps ends
    sort before starts (half-open [start, end) occupancy — adjacent
    back-to-back sessions never double-count).

    Shape: sessionize (the `sessionize_events` gaps-and-islands core) →
    ±1 boundary rows → ONE combinable (t, delta) collapse → the
    `functions/ranking.py` range-partition kernel turns the global
    running sum into per-partition window sums + O(P) broadcast signed
    offsets (no single-task global window) → combinable per-day max.
    Counts are exact integers end-to-end — integer-exact oracle."""
    from ..functions.ranking import range_partition_offsets
    from ..session import shuffle_partition_count

    sess = sessionize(load_table(spark, sf_dir, "events"))
    b = sess.select(
        F.col("session_start").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(F.col("session_end").alias("t"), F.lit(-1).alias("delta"))
    )
    g = b.groupBy("t", "delta").agg(F.count("*").alias("c"))
    n_parts = shuffle_partition_count(spark)
    ranged, _, offsets_df, _ = range_partition_offsets(
        g,
        ["t", "delta"],
        [("sd", F.sum(F.col("delta") * F.col("c")))],
        n_parts,
    )
    w = (
        Window.partitionBy("pid")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = (
        ranged.withColumn("cum_local", F.sum(F.col("delta") * F.col("c")).over(w))
        .join(F.broadcast(offsets_df), "pid")
        .select(
            "t", (F.col("off_sd") + F.col("cum_local")).alias("conc")
        )
    )
    return run.groupBy(F.to_date("t").alias("day")).agg(
        F.max("conc").alias("peak_concurrent"),
        F.count("*").alias("n_boundaries"),
    )
