"""Batch + streaming readers.

Batch: parquet fixture tables (columnar scans — Catalyst gets predicate
pushdown, column pruning and min/max skipping for free) and schema'd CSV for
the SmartRoom ingest surface (reference: producer.scala:22-36 reads CSV
line-wise on the driver; ours is a distributed `spark.read.csv`).

Streaming: thin wrappers for file/rate/socket/kafka sources (reference:
consumer.scala:44-49 Kafka source). Kafka needs the connector jar + a broker,
neither of which exists in the test container, so it is exercised only via
option-building unit tests; the file and rate sources drive the real tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import FIXTURE_TABLES


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # The fixture events.ts is parquet TIMESTAMP(NANOS), which Spark's
        # reader rejects outright. Read nanos as int64 and convert to a
        # microsecond timestamp in-plan (floor division — matches DuckDB's
        # ns→µs cast truncation, so oracle comparisons agree). Synthetic
        # events tables written with µs timestamps pass through untouched.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in FIXTURE_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (mirrors the DuckDB oracle
    environment, where the same names are pre-registered)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def read_entity_csv(
    spark: SparkSession, path: str, schema: T.StructType, sep: str = ";"
) -> DataFrame:
    """Schema'd CSV read for SmartRoom entity files (semicolon-separated,
    one header row — reference producer.scala:36,82). Malformed short rows
    drop via DROPMALFORMED, matching the reference's silent null-drop
    (producer.scala:83,102,...)."""
    return (
        spark.read.option("header", True)
        .option("sep", sep)
        .option("mode", "DROPMALFORMED")
        .schema(schema)
        .csv(path)
    )


def stream_file_source(
    spark: SparkSession, path: str, schema: T.StructType, fmt: str = "parquet", **options
) -> DataFrame:
    """File-based streaming source — the deterministic test harness stand-in
    for Kafka (same micro-batch engine downstream)."""
    reader = spark.readStream.format(fmt).schema(schema)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def stream_rate_source(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Built-in rate source: (timestamp, value) rows — used for throughput
    tests. The reference's producer is hard-capped at 5 events/s by a driver
    sleep (producer.scala:51); this is the executor-parallel replacement."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
) -> dict[str, str]:
    """Options for a Kafka streaming read (reference: consumer.scala:44-49).
    Rate limiting moves from the producer's per-record sleep to the consumer's
    maxOffsetsPerTrigger — backpressure the Spark way."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def stream_kafka_source(spark: SparkSession, **kwargs) -> DataFrame:
    """Kafka streaming source. Requires the spark-sql-kafka connector on the
    classpath and a reachable broker; guarded so environments without Kafka
    fail with a clear message instead of a JVM stack."""
    opts = kafka_source_options(**kwargs)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - no broker in test env
        raise RuntimeError(
            "Kafka source unavailable (connector jar or broker missing); "
            "use stream_file_source/stream_rate_source for local testing"
        ) from exc
