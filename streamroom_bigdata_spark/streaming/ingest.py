"""CSV → tagged JSON wire records (SURVEY.md §2.1 S2-S3, §2.9 T6).

The reference's producer parses six entity CSVs on the driver, one line at a
time, assembling JSON by string interpolation and sleeping 200 ms per record
(reference: producer.scala:22-61,63-186). Here the same transform is a
distributed DataFrame plan: schema'd CSV scan → ``to_json(struct(*))`` with
the ``source_type`` discriminator and ingest stamps — executor-parallel, no
driver loop, no rate cap. The output is the wire format the streaming
consumer parses back with ``from_json`` (S5).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import ENTITIES, WIRE_SCHEMA
from ..sources.readers import read_entity_csv


def tag_entity(df: DataFrame, source_type: str) -> DataFrame:
    """Attach the discriminator + ingest stamps (reference: producer.scala:87,
    95-96 — ``source_type``, ``ingestion_timestamp``, ``ingestion_date``).
    Stamps are real timestamps formatted to the reference's wire format
    (strings, ``yyyy-MM-dd HH:mm:ss``) for parity."""
    now = F.current_timestamp()
    return df.withColumns(
        {
            "source_type": F.lit(source_type),
            "ingestion_timestamp": F.date_format(now, "yyyy-MM-dd HH:mm:ss"),
            "ingestion_date": F.date_format(now, "yyyy-MM-dd"),
        }
    )


def to_wire_json(df: DataFrame) -> DataFrame:
    """One JSON string per record — the Kafka message value (S2). ``value`` is
    the exact shape ``parse_wire`` (and the reference's consumer,
    consumer.scala:51-54) expects."""
    return df.select(F.to_json(F.struct(*df.columns)).alias("value"))


def dispatch_entity(filename: str) -> str | None:
    """Entity type for a CSV filename, by substring — the reference's
    dispatch rules verbatim (producer.scala:63-72: ``bookings`` &&
    !``onetime`` → fixed, ``onetime`` → one-time, then courses / sections /
    professors / classroom), extended so exact ``<entity>.csv`` names also
    dispatch. Returns None for unrecognized files (the reference returns a
    null parser and skips)."""
    name = os.path.basename(filename).lower()
    # one-time check comes FIRST and also accepts the underscored spelling:
    # the reference's `contains("bookings") && !contains("onetime")` routes
    # "one_time_bookings.csv" to the fixed parser, whose 7-field schema then
    # silently drops every 8-field row under DROPMALFORMED — a deliberate
    # deviation from producer.scala:65 to avoid that data-loss trap
    if "onetime" in name or "one_time" in name:
        return "one_time_booking"
    if "bookings" in name:
        return "fixed_booking"
    for ent in ("courses", "sections", "professors", "classroom"):
        if ent in name:
            return ent
    for ent in sorted(ENTITIES, key=len, reverse=True):
        if ent in name:
            return ent
    return None


def entity_dir_to_wire(spark: SparkSession, data_dir: str) -> DataFrame:
    """The whole producer pipeline: scan ``data_dir`` for CSVs, dispatch each
    by filename substring (producer.scala:63-72), read every file of an
    entity as ONE distributed scan, tag, and union to one wire-format
    DataFrame. Unrecognized files are skipped, like the reference's null
    parser."""
    by_entity: dict[str, list[str]] = {}
    for fname in sorted(os.listdir(data_dir)):
        if not fname.lower().endswith(".csv"):
            continue
        ent = dispatch_entity(fname)
        if ent is not None:
            by_entity.setdefault(ent, []).append(os.path.join(data_dir, fname))
    parts = [
        to_wire_json(tag_entity(read_entity_csv(spark, paths, ENTITIES[ent][0]), ent))
        for ent, paths in by_entity.items()
    ]
    if not parts:
        raise FileNotFoundError(f"no entity CSVs under {data_dir}")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def parse_wire(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Wire → typed rows (S5): cast to string, ``from_json`` against the
    21-field union schema, flatten (reference: consumer.scala:51-54). Fields
    absent for a given ``source_type`` come back null — standard ``from_json``
    semantics, same as the reference."""
    return (
        raw.select(F.col(value_col).cast("string").alias("json"))
        .select(F.from_json("json", WIRE_SCHEMA).alias("data"))
        .select("data.*")
    )


def with_event_times(parsed: DataFrame) -> DataFrame:
    """Typed event-time columns for the bronze store (the 'typed bronze'
    half of schemas.py's wire-parity note): booking date + start/end time
    strings become real timestamps, as does the ingestion stamp. Entities
    without those fields get nulls — try_to_timestamp, because ANSI mode
    makes plain to_timestamp RAISE on the empty string concat_ws yields for
    null fields. Keeps the original string columns for wire parity."""
    fmt = F.lit("yyyy-MM-dd HH:mm:ss")
    return parsed.withColumns(
        {
            "start_ts": F.try_to_timestamp(
                F.concat_ws(" ", "date", "start_time"), fmt
            ),
            "end_ts": F.try_to_timestamp(
                F.concat_ws(" ", "date", "end_time"), fmt
            ),
            "ingest_ts": F.try_to_timestamp(F.col("ingestion_timestamp"), fmt),
        }
    )
