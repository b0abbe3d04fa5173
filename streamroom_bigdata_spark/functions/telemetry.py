"""Single-pass pipeline telemetry via ``df.observe`` (Spark Observation API).

At 100 TB the naive way to report "rows written, null rate, total revenue"
alongside a job is a SECOND full scan (one action for the write, one for the
metrics). ``observe`` attaches named aggregates to the plan itself: the
metrics are computed by the SAME tasks that execute the action and surface
on the driver when it finishes — zero extra passes, zero extra shuffles.

Batch uses :class:`pyspark.sql.Observation`; streaming queries use the same
``DataFrame.observe(name, *exprs)`` form and read the values from each
micro-batch's ``QueryProgressEvent.observedMetrics`` — one mechanism for
both engines' telemetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_quality_metrics(df: DataFrame, value_col: str) -> tuple[DataFrame, Observation]:
    """Attach the standard write-side data-quality metrics (row count, null
    count of ``value_col``, sum of ``value_col``) to ``df``'s plan. Returns
    the instrumented frame and the Observation; run ONE action on the frame,
    then read ``observation.get`` — no second scan ever happens."""
    obs = Observation()
    instrumented = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col(value_col).isNull().cast("long")).alias("n_nulls"),
        F.sum(F.col(value_col).cast("double")).alias("total"),
    )
    return instrumented, obs
