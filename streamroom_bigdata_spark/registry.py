"""Query registry — the single source of truth behind the driver contract.

Every implemented operator registers a named PySpark query (callable taking
``(spark, sf_dir)`` and returning a DataFrame) and, when SQL-expressible, the
equivalent ANSI-SQL oracle that DuckDB runs over the same parquet tables.
``__spark_entry__.py`` re-exports these as ``queries()`` / ``oracle_sql()``.

Column-name discipline: the driver's comparator sorts columns by name and
hashes values, so every computed column is aliased identically in the Spark
plan and the oracle SQL.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: modules that register queries on import
_QUERY_MODULES = (
    "streamroom_bigdata_spark.plans.recommend",
    "streamroom_bigdata_spark.operators.relational",
    "streamroom_bigdata_spark.operators.windows",
    "streamroom_bigdata_spark.operators.asof",
    "streamroom_bigdata_spark.operators.scalar",
    "streamroom_bigdata_spark.operators.dedup",
    "streamroom_bigdata_spark.operators.text",
    "streamroom_bigdata_spark.operators.similarity",
    "streamroom_bigdata_spark.operators.sampling",
    "streamroom_bigdata_spark.operators.llmprep",
    "streamroom_bigdata_spark.operators.timeseries",
    "streamroom_bigdata_spark.operators.profile",
    "streamroom_bigdata_spark.operators.curation",
    "streamroom_bigdata_spark.operators.sessions",
    "streamroom_bigdata_spark.operators.multimodal",
    "streamroom_bigdata_spark.operators.behavior",
    "streamroom_bigdata_spark.operators.changes",
    "streamroom_bigdata_spark.operators.fuzzyjoin",
    "streamroom_bigdata_spark.operators.graph",
    "streamroom_bigdata_spark.operators.tpch_shapes",
    "streamroom_bigdata_spark.operators.quality",
    "streamroom_bigdata_spark.operators.retrieval",
    "streamroom_bigdata_spark.operators.kmeans",
    "streamroom_bigdata_spark.operators.bloom",
    "streamroom_bigdata_spark.operators.stats",
    "streamroom_bigdata_spark.operators.mlfit",
    "streamroom_bigdata_spark.operators.distribution",
    "streamroom_bigdata_spark.operators.layout",
    "streamroom_bigdata_spark.operators.revops",
    "streamroom_bigdata_spark.operators.governance",
    "streamroom_bigdata_spark.operators.quant",
    "streamroom_bigdata_spark.operators.incdedup",
    "streamroom_bigdata_spark.operators.annindex",
    "streamroom_bigdata_spark.streaming.queries",
)

_loaded = False


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` under ``name``; ``oracle`` is the DuckDB SQL
    equivalent (omit for non-SQL-expressible ops → driver does rows-only)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def queries() -> dict[str, QueryFn]:
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    load_all()
    return dict(ORACLES)
