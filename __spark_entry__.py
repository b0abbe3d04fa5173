"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf=0.001; ``queries()`` /
``oracle_sql()`` expose the full operator inventory (SURVEY.md §2) backed by
the registry in ``streamroom_bigdata_spark.registry``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from streamroom_bigdata_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (hybrid top-k room recommendation re-expressed over the
    star schema) on /root/testdata/sf0.001; driver checks rows > 0."""
    from streamroom_bigdata_spark.plans.recommend import recommend_rooms

    return recommend_rooms(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each SQL-expressible query."""
    return registry.oracle_sql()
