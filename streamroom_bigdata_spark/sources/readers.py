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
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
    **options,
) -> DataFrame:
    """File-based streaming source — the deterministic test harness stand-in
    for Kafka (same micro-batch engine downstream).

    ``max_files_per_trigger`` is the file-source rate-limiting knob (the
    idiomatic equivalent of the reference producer's 200 ms/record sleep,
    and of ``maxOffsetsPerTrigger`` on the Kafka source): each micro-batch
    ingests at most that many files, so a backlog drains in bounded bites
    instead of one giant catch-up batch that can blow executor memory."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
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


def stream_socket_source(
    spark: SparkSession, host: str = "localhost", port: int = 9999
) -> DataFrame:
    """Socket text source (S4): one ``value`` string column per received line.
    Spark connects to ``host:port`` as a client; lines are not replayable, so
    this is a dev/debug source — exactly the niche the reference's
    console-oriented tooling fills. Exercised against a real local socket in
    tests/test_streaming.py."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )


def kafka_sink_options(bootstrap_servers: str, topic: str) -> dict[str, str]:
    """Options for a Kafka write (reference: producer.scala:19-20,46-51
    produces to ``room_requests`` one record at a time on the driver; the
    Spark writer is executor-parallel)."""
    return {"kafka.bootstrap.servers": bootstrap_servers, "topic": topic}


def to_kafka_records(
    df: DataFrame, value_col: str = "value", key_col: str | None = None
) -> DataFrame:
    """Project to the (key, value) string columns the Kafka writer contract
    requires — the pure-plan half of the sink, unit-testable without a
    broker."""
    cols = [F.col(value_col).cast("string").alias("value")]
    if key_col is not None:
        cols.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*cols)


def write_kafka_batch(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    value_col: str = "value",
    key_col: str | None = None,
) -> None:
    """Batch Kafka sink (S3): every partition produces in parallel from the
    executors — no driver loop, no per-record sleep (contrast
    producer.scala:51's 200 ms/record cap). Guarded like the source: no
    connector jar / broker in the test container."""
    writer = to_kafka_records(df, value_col, key_col).write.format("kafka")
    for k, v in kafka_sink_options(bootstrap_servers, topic).items():
        writer = writer.option(k, v)
    try:
        writer.save()
    except Exception as exc:  # pragma: no cover - no broker in test env
        raise RuntimeError(
            "Kafka sink unavailable (connector jar or broker missing); "
            "use a file/memory sink for local testing"
        ) from exc


def stream_kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint_dir: str,
    value_col: str = "value",
    key_col: str | None = None,
):
    """Streaming Kafka sink (S3): returns the configured ``DataStreamWriter``
    (caller ``.start()``s it) — checkpointed, so output is at-least-once with
    idempotent-producer semantics left to the broker config."""
    writer = (
        to_kafka_records(df, value_col, key_col)
        .writeStream.format("kafka")
        .option("checkpointLocation", checkpoint_dir)
    )
    for k, v in kafka_sink_options(bootstrap_servers, topic).items():
        writer = writer.option(k, v)
    return writer


def console_sink(df: DataFrame, mode: str = "append", num_rows: int = 20, truncate: bool = False):
    """Console sink wrapper (S8) — the reference's consumer prints every
    micro-batch (consumer.scala format("console")). Returns the configured
    writer; caller ``.start()``s it."""
    return (
        df.writeStream.format("console")
        .outputMode(mode)
        .option("numRows", str(num_rows))
        .option("truncate", str(truncate).lower())
    )


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


def read_kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Batch Kafka read (S4 batch form): a bounded scan of ``topic`` between
    the two offset specs — the replay/backfill path. Same guard as the
    streaming source: clear error when the connector jar or broker is
    absent."""
    reader = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
    )
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - no broker in test env
        raise RuntimeError(
            "Kafka source unavailable (connector jar or broker missing); "
            "use batch parquet/CSV readers for local testing"
        ) from exc


def stream_rate_micro_batch(
    spark: SparkSession, rows_per_batch: int = 1000, start_ts_ms: int = 0
) -> DataFrame:
    """rate-micro-batch source (S4): EXACTLY ``rows_per_batch`` rows per
    trigger with deterministic values and timestamps — the reproducible
    variant of ``rate`` (which is wall-clock driven), right for
    load-shaping tests where batch contents must be stable across runs."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(rows_per_batch))
        .option("startTimestamp", str(start_ts_ms))
        .load()
    )
