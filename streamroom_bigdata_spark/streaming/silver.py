"""Silver-layer rollup: streaming windowed aggregate → partition-scoped
upsert.

Composes the event-time tumbling aggregate (queries.py, T8) with the
partition-scoped upsert sink (sources/maintenance.py): every micro-batch
emits the windows it updated (update output mode), and the sink merges
them into a silver parquet table keyed on (window_start, event_type) and
partitioned by window DATE — so the silver table always holds the CURRENT
value of every window, is directly queryable by batch jobs while the
stream runs, and each trigger rewrites ONLY the date partitions its
windows fall in. Per-trigger cost is therefore proportional to the
touched partitions (for a watermarked event-time stream, the last day or
two), not the table's lifetime size.

This is the medallion-architecture step the reference approximates by
re-running its batch job over Mongo (processing.scala reads the whole
bronze store per run).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.maintenance import streaming_partitioned_upsert_sink
from .queries import tumbling_agg, with_watermark

SILVER_KEY = "wkey"
SILVER_PART = "window_date"


def silver_rollup_frame(events: DataFrame) -> DataFrame:
    """The per-batch frame: tumbling window × event_type counts/sums with a
    composite upsert key and the date partition column."""
    agg = tumbling_agg(with_watermark(events))
    return agg.withColumn(
        SILVER_KEY,
        F.concat_ws(
            "|", F.col("window_start").cast("string"), F.col("event_type")
        ),
    ).withColumn(SILVER_PART, F.to_date("window_start"))


def start_silver_rollup(
    events: DataFrame,
    silver_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
):
    """Start the silver maintenance query. Update output mode: each
    micro-batch delivers only the windows whose aggregates changed; the
    sink merges them into (and rewrites only) the date partitions they
    belong to."""
    writer = (
        silver_rollup_frame(events)
        .writeStream.foreachBatch(
            streaming_partitioned_upsert_sink(
                silver_dir, SILVER_KEY, SILVER_PART
            )
        )
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
