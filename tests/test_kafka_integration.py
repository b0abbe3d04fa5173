"""Env-gated live Kafka round-trip (S3/S4 integration).

The sandbox has no broker and no spark-sql-kafka connector jar, so these
tests skip unless ``KAFKA_BOOTSTRAP`` is set (e.g.
``KAFKA_BOOTSTRAP=localhost:9092 pytest tests/test_kafka_integration.py``).
When a broker IS available they exercise the full reference pipeline shape
(producer.scala:46-51 -> consumer.scala:44-54): wire-format produce ->
batch offset-bounded read-back -> from_json parse, and a streaming read
into a memory sink.

The wire format itself (record projection, 21-field union schema, JSON
round-trip) is covered broker-free in tests/test_streaming.py — this file
only adds the live-transport leg on top.
"""

from __future__ import annotations

import os
import uuid

import pytest
from pyspark.sql import functions as F

from streamroom_bigdata_spark.streaming.ingest import entity_dir_to_wire, parse_wire
from streamroom_bigdata_spark.sources.readers import (
    read_kafka_batch,
    stream_kafka_source,
    write_kafka_batch,
)

KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not KAFKA_BOOTSTRAP,
    reason="KAFKA_BOOTSTRAP not set (no broker in this environment)",
)


def _write_entity_csvs(tmp_path):
    (tmp_path / "fixed_booking.csv").write_text(
        "booking_id;section_id;classroom_id;date;start_time;end_time;students\n"
        "B1;S1;C1;2024-01-01;08:00:00;10:00:00;30\n"
        "B2;S2;C2;2024-01-01;10:00:00;12:00:00;45\n"
    )
    (tmp_path / "classroom.csv").write_text(
        "classroom_id;college_id;room_number;capacity\n"
        "C1;COL1;101;40\nC2;COL1;102;60\n"
    )


def test_kafka_batch_roundtrip(spark, tmp_path):
    """Produce the wire records to a fresh topic, read them back with an
    offset-bounded batch scan, and recover the typed fields through the same
    from_json path the streaming consumer uses."""
    topic = f"it_wire_{uuid.uuid4().hex[:12]}"
    _write_entity_csvs(tmp_path)
    wire = entity_dir_to_wire(spark, str(tmp_path))
    n_sent = wire.count()

    write_kafka_batch(wire, KAFKA_BOOTSTRAP, topic)

    raw = read_kafka_batch(spark, KAFKA_BOOTSTRAP, topic)
    parsed = parse_wire(raw)  # value is binary; parse_wire casts to string
    rows = {
        (r.source_type, r.booking_id or r.classroom_id): r for r in parsed.collect()
    }
    assert len(rows) == n_sent == 4
    assert rows[("fixed_booking", "B1")].students == 30
    assert rows[("classroom", "C2")].capacity == 60
    # entity-specific fields absent from the other entity come back null
    assert rows[("classroom", "C1")].booking_id is None


def test_kafka_stream_read(spark, tmp_path):
    """Streaming leg: earliest-offset stream of a pre-filled topic drains
    into a memory sink with the full wire schema intact."""
    topic = f"it_stream_{uuid.uuid4().hex[:12]}"
    _write_entity_csvs(tmp_path)
    wire = entity_dir_to_wire(spark, str(tmp_path))
    write_kafka_batch(wire, KAFKA_BOOTSTRAP, topic)

    stream = stream_kafka_source(
        spark,
        bootstrap_servers=KAFKA_BOOTSTRAP,
        topic=topic,
        starting_offsets="earliest",
        max_offsets_per_trigger=100,
    )
    sink_name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        parse_wire(stream)
        .writeStream.format("memory")
        .queryName(sink_name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(60)
    finally:
        q.stop()
    got = spark.table(sink_name)
    assert got.count() == 4
    assert got.filter(F.col("source_type") == "fixed_booking").count() == 2
