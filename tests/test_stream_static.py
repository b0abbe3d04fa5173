"""Stream-static enrichment join: the streaming result over micro-batches
equals the batch recompute over the union of all batches."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from streamroom_bigdata_spark.streaming.queries import stream_static_enrich


def test_stream_static_enrich_matches_batch(spark, tmp_path):
    dim_rows = [(u, "gold" if u % 3 == 0 else "std") for u in range(1, 9)]
    dim = spark.createDataFrame(dim_rows, "user_id long, segment string")

    batches = [
        [
            {"user_id": 1 + (i + b) % 8, "ts": f"2024-01-01T00:0{b}:0{i}", "value": float(i + b)}
            for i in range(6)
        ]
        for b in range(3)
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, rows in enumerate(batches):
        p = src / f"b{i}.jsonl"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(p, (time.time() + i, time.time() + i))

    schema = "user_id long, ts string, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        stream_static_enrich(stream, dim)
        .writeStream.format("memory")
        .queryName("enrich_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.segment: (r.n_events, r.sum_value)
        for r in spark.sql("select * from enrich_sink").collect()
    }

    batch_df = spark.read.schema(schema).json(str(src))
    want = {
        r.segment: (r.n_events, r.sum_value)
        for r in stream_static_enrich(batch_df, dim).collect()
    }
    assert got == want
    assert set(got) == {"gold", "std"}
