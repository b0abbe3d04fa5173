"""Silver-layer rollup: streaming windowed aggregate → keyed upsert.

Composes the event-time tumbling aggregate (queries.py, T8) with the CDC
upsert sink (sources/maintenance.py): every micro-batch emits the windows
it updated (update output mode), and the sink merges them into a silver
parquet table keyed on (window_start, event_type) — so the silver table
always holds the CURRENT value of every window, updated incrementally, and
is directly queryable by batch jobs while the stream runs.

This is the medallion-architecture step the reference approximates by
re-running its batch job over Mongo (processing.scala reads the whole
bronze store per run): here the rollup is incremental — per trigger the
work is proportional to the windows touched, not the table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.maintenance import streaming_upsert_sink
from .queries import tumbling_agg, with_watermark

SILVER_KEY = "wkey"


def silver_rollup_frame(events: DataFrame) -> DataFrame:
    """The per-batch frame: tumbling window × event_type counts/sums with a
    composite upsert key."""
    agg = tumbling_agg(with_watermark(events))
    return agg.withColumn(
        SILVER_KEY,
        F.concat_ws(
            "|", F.col("window_start").cast("string"), F.col("event_type")
        ),
    )


def start_silver_rollup(
    events: DataFrame,
    silver_dir: str,
    checkpoint_dir: str,
    trigger_once: bool = False,
):
    """Start the silver maintenance query. Update output mode: each
    micro-batch delivers only the windows whose aggregates changed; the
    upsert sink replaces those rows in the silver table."""
    writer = (
        silver_rollup_frame(events)
        .writeStream.foreachBatch(streaming_upsert_sink(silver_dir, SILVER_KEY))
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
