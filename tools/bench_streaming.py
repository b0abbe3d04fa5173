"""Streaming throughput bench: events/s through the wire-parse + demux
router (reference comparison point: the reference producer hard-caps ingest
at 5 events/s via a 200 ms driver sleep, producer.scala:51).

Drives the router with the built-in rate source mapped onto the wire format,
sinks to per-entity parquet through the checkpointed foreachBatch router, and
reports rows/sec over the run. Usage: python tools/bench_streaming.py
[rows_per_second] [seconds].
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql import functions as F

    from streamroom_bigdata_spark.schemas import ENTITIES
    from streamroom_bigdata_spark.session import get_spark
    from streamroom_bigdata_spark.sources.readers import stream_rate_source
    from streamroom_bigdata_spark.streaming.ingest import parse_wire
    from streamroom_bigdata_spark.streaming.router import start_router

    rows_per_second = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    run_seconds = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    spark = get_spark(
        "bench_streaming", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    entities = list(ENTITIES)
    # rate rows -> synthetic wire JSON, one of the six entity types per row
    wire = stream_rate_source(spark, rows_per_second).select(
        F.to_json(
            F.struct(
                F.concat(F.lit("B"), F.col("value")).alias("booking_id"),
                F.concat(F.lit("C"), F.col("value") % 500).alias("classroom_id"),
                (F.col("value") % 200 + 5).cast("int").alias("students"),
                F.element_at(
                    F.array(*[F.lit(e) for e in entities]),
                    (F.col("value") % len(entities) + 1).cast("int"),
                ).alias("source_type"),
                F.date_format("timestamp", "yyyy-MM-dd HH:mm:ss").alias(
                    "ingestion_timestamp"
                ),
                F.date_format("timestamp", "yyyy-MM-dd").alias("ingestion_date"),
            )
        ).alias("value")
    )

    out_dir = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        t0 = time.time()
        q = start_router(
            parse_wire(wire),
            f"{out_dir}/bronze",
            f"{out_dir}/ckpt",
            single_pass=True,
        )
        time.sleep(run_seconds)
        q.stop()
        q.awaitTermination(60)
        elapsed = time.time() - t0
        rows = (
            spark.read.parquet(f"{out_dir}/bronze").count()
            if shutil.os.path.isdir(f"{out_dir}/bronze")
            else 0
        )
        print(
            json.dumps(
                {
                    "metric": "streaming_router_throughput",
                    "value": round(rows / elapsed, 1),
                    "unit": "events/sec",
                    "rows": rows,
                    "elapsed_sec": round(elapsed, 1),
                    "configured_rate": rows_per_second,
                }
            )
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
