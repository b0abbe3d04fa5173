"""Custom Python DataSource (Spark 4 API): deterministic SmartRoom entity
generator.

The reference fabricates its input by hand-editing CSVs and replaying them
through a driver loop (producer.scala:22-61). The idiomatic Spark 4 way to
provide synthetic/test data is a registered Python DataSource: the generator
runs ON THE EXECUTORS, one InputPartition per task, so producing a billion
synthetic rows parallelizes like any other scan — nothing flows through the
driver. Rows are a pure function of (partition, row index), so any slice of
the output is reproducible and task retries are safe.

Usage::

    spark.dataSource.register(SmartRoomSyntheticDataSource)
    df = (spark.read.format("smartroom_synthetic")
          .option("entity", "fixed_booking")
          .option("rows_per_partition", 1000)
          .option("partitions", 8)
          .load())
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from ..schemas import ENTITIES

_GEN_COLUMNS = {
    "fixed_booking": lambda i: (
        f"B{i}",
        f"S{i % 50}",
        f"C{i % 20}",
        f"2024-{(i % 12) + 1:02d}-{(i % 28) + 1:02d}",
        f"{8 + i % 10}:00:00",
        f"{9 + i % 10}:00:00",
        10 + (i * 7) % 90,
    ),
    "classroom": lambda i: (
        f"C{i}",
        f"COL{i % 5}",
        str(100 + i),
        20 + (i * 13) % 180,
    ),
    "professors": lambda i: (
        f"P{i}",
        f"prof_{i}",
        f"dept_{i % 8}",
        f"COL{i % 5}",
    ),
}


class SmartRoomSyntheticDataSource(DataSource):
    """spark.read.format("smartroom_synthetic") — executor-parallel,
    deterministic entity rows."""

    @classmethod
    def name(cls) -> str:
        return "smartroom_synthetic"

    def schema(self):
        entity = self.options.get("entity", "fixed_booking")
        if entity not in _GEN_COLUMNS:
            raise ValueError(
                f"unsupported entity {entity!r}; one of {sorted(_GEN_COLUMNS)}"
            )
        return ENTITIES[entity][0]

    def reader(self, schema) -> "_SyntheticReader":
        return _SyntheticReader(self.options)

    def simpleStreamReader(self, schema) -> "_SyntheticStreamReader":
        return _SyntheticStreamReader(self.options)


class _SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Streaming variant: each micro-batch emits the next ``rows_per_batch``
    rows; the offset is the global row index, so recovery replays are exact
    (``readBetweenOffsets`` regenerates any committed range — rows are a
    pure function of the index, the retry-safety contract this API asks
    for)."""

    def __init__(self, options):
        self.entity = options.get("entity", "fixed_booking")
        self.rows_per_batch = int(options.get("rows_per_batch", 10))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start):
        gen = _GEN_COLUMNS[self.entity]
        s = start["index"]
        end = {"index": s + self.rows_per_batch}
        return iter([gen(i) for i in range(s, s + self.rows_per_batch)]), end

    def readBetweenOffsets(self, start, end):
        gen = _GEN_COLUMNS[self.entity]
        return iter([gen(i) for i in range(start["index"], end["index"])])


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.entity = options.get("entity", "fixed_booking")
        self.rows_per_partition = int(options.get("rows_per_partition", 100))
        self.n_partitions = int(options.get("partitions", 4))

    def partitions(self):
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):
        gen = _GEN_COLUMNS[self.entity]
        base = partition.value * self.rows_per_partition
        for i in range(base, base + self.rows_per_partition):
            yield gen(i)
