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
