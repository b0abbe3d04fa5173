"""Spark 4 Python DataSource: deterministic synthetic entity generator."""

from __future__ import annotations

import pytest

from streamroom_bigdata_spark.schemas import ENTITIES
from streamroom_bigdata_spark.sources.synthetic import SmartRoomSyntheticDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SmartRoomSyntheticDataSource)
    return spark


def _read(spark, entity, rows=50, parts=4):
    return (
        spark.read.format("smartroom_synthetic")
        .option("entity", entity)
        .option("rows_per_partition", rows)
        .option("partitions", parts)
        .load()
    )


def test_synthetic_source_schema_and_count(registered):
    df = _read(registered, "fixed_booking", rows=50, parts=4)
    assert df.schema == ENTITIES["fixed_booking"][0]
    assert df.count() == 200
    assert df.rdd.getNumPartitions() == 4


def test_synthetic_source_deterministic(registered):
    a = sorted(map(tuple, _read(registered, "classroom").collect()))
    b = sorted(map(tuple, _read(registered, "classroom").collect()))
    assert a == b
    assert len(set(r[0] for r in a)) == len(a)  # unique ids across partitions


def test_synthetic_source_feeds_wire_pipeline(registered):
    """Generated rows flow through the same tag/wire/parse path as CSVs."""
    from streamroom_bigdata_spark.streaming.ingest import (
        parse_wire,
        tag_entity,
        to_wire_json,
    )

    df = _read(registered, "professors", rows=10, parts=2)
    parsed = parse_wire(to_wire_json(tag_entity(df, "professors")))
    rows = parsed.collect()
    assert len(rows) == 20
    assert all(r.source_type == "professors" for r in rows)


def test_synthetic_stream_reader_emits_sequential_batches(registered, tmp_path):
    """Streaming DataSource: offset-based micro-batches with exact replay."""
    import time

    q = (
        registered.readStream.format("smartroom_synthetic")
        .option("entity", "classroom")
        .option("rows_per_batch", 5)
        .load()
        .writeStream.format("memory")
        .queryName("synth_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "synth_ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if registered.sql("SELECT * FROM synth_stream").count() >= 10:
                break
            time.sleep(0.25)
        rows = registered.sql("SELECT * FROM synth_stream").collect()
        ids = sorted(int(r.classroom_id[1:]) for r in rows)
        # sequential from 0, no gaps, no duplicates
        assert ids[:10] == list(range(10))
    finally:
        q.stop()
