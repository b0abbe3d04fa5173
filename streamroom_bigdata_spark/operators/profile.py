"""Data-profiling operator: per-column statistics in ONE shuffle.

The first query any pipeline runs against a new table: null rates,
distinct counts, min/max per column. Shape: unpivot to long format
(col_name, value-as-string) — a zero-shuffle row explosion — then one
groupBy(col_name) aggregate (count_distinct adds its standard two-phase
expand — two hash exchanges total, no single-partition funnel). k columns
cost one scan, not k passes; at 100 TB the final aggregate state is k rows.

String-typed min/max keeps the output schema uniform across column types
(and matches what the DuckDB oracle computes on the same varchar cast);
distinct counts are exact here — swap count_distinct for
approx_count_distinct when profiling at the 100 TB end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

PROFILE_COLS = ("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")

_COL_SELECTS = " UNION ALL ".join(
    f"""
    SELECT '{c}' AS col_name,
           count(*) AS n_rows,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT CAST({c} AS VARCHAR)) AS n_distinct,
           min(CAST({c} AS VARCHAR)) AS min_val,
           max(CAST({c} AS VARCHAR)) AS max_val
    FROM orders
    """
    for c in PROFILE_COLS
)

column_profile_oracle = _COL_SELECTS


@register("column_profile", column_profile_oracle)
def column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the orders table — see module docstring for the
    single-shuffle unpivot shape."""
    return profile_columns(
        load_table(spark, sf_dir, "orders"), list(PROFILE_COLS)
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Profile any frame's columns: unpivot to (col_name, val) then one
    aggregate."""
    long = df.select(
        *[F.col(c).cast("string").alias(c) for c in cols]
    ).unpivot([], cols, "col_name", "val")
    return long.groupBy("col_name").agg(
        F.count("*").alias("n_rows"),
        (F.count("*") - F.count("val")).alias("n_nulls"),
        F.count_distinct("val").alias("n_distinct"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


# ---------------------------------------------------------------------------
# Mergeable distinct-count sketches (Spark 4 DataSketches HLL)
# ---------------------------------------------------------------------------

def distinct_sketch_by_group(
    df: DataFrame, group_col: str, col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HLL sketches as reusable BINARY aggregates — the profiling
    shape for 100 TB: sketch once per partition/day/source, then answer
    any rollup's distinct count by UNIONING sketches (mergeable, unlike a
    count_distinct result). Sketch size is fixed (2^lgk registers) no
    matter the input."""
    return df.groupBy(group_col).agg(
        F.hll_sketch_agg(col, F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def union_sketch_estimate(sketches: DataFrame) -> DataFrame:
    """Merge per-group sketches into one global estimate — the rollup a
    pre-sketched table answers without rescanning data."""
    return sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("estimate")
    )
