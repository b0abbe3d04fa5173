"""TPC-H-shaped composite queries (round-7; SURVEY.md §2.15).

Query-level parity entries: each composes operators already covered
individually (outer join, two-level aggregation, anti-join, scalar
subquery, distinct aggregation) into the recognizable TPC-H shapes Q13,
Q22 and Q16, adapted to the fixture schema (no comment/phone columns).
All are one-or-two-shuffle plans whose final aggregates are output-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# --- Q13: customer order-count distribution --------------------------------

q13_oracle = """
WITH c_orders AS (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderstatus <> 'F'
  GROUP BY c.c_custkey
)
SELECT c_count, count(*) AS custdist
FROM c_orders
GROUP BY c_count
"""


@register("q13_customer_distribution", q13_oracle)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: how many customers placed k (non-'F') orders, for each k.
    Left outer join keeps zero-order customers (c_count 0 via count of the
    null-extended key), then a distribution roll-up bounded by the max
    order count. Both aggregations shuffle on their (small) group keys;
    the join shuffles on custkey once."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus"
    ).filter(F.col("o_orderstatus") != "F")
    c_orders = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(F.count("*").alias("custdist"))


# --- Q22: valuable customers with no urgent orders -------------------------

q22_oracle = """
WITH rich AS (
  SELECT c_custkey, c_nationkey, c_acctbal
  FROM customer
  WHERE c_acctbal > (
    -- round-6 threshold: Spark's partial-aggregate avg and DuckDB's
    -- sequential avg can differ in the last ulps; comparing against the
    -- raw double would let a borderline customer flip between engines
    SELECT round(avg(c_acctbal), 6) FROM customer WHERE c_acctbal > 0.0
  )
)
SELECT r.c_nationkey AS nationkey,
       count(*) AS numcust,
       CAST(sum(CAST(r.c_acctbal AS DECIMAL(18, 2))) AS DOUBLE)
         AS totacctbal
FROM rich r
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = r.c_custkey AND o.o_orderpriority = '1-URGENT'
)
GROUP BY r.c_nationkey
"""


@register("q22_idle_valuable_customers", q22_oracle)
def q22_idle_valuable_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with NO urgent orders,
    rolled up per nation. Scalar subquery (global avg — 1 row crosses the
    exchange after map-side partials), anti-join against the filtered
    orders (null-safe left_anti), nation-sized final aggregate. DECIMAL
    accumulation keeps the balance total engine-exact."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 6).alias("a"))
    )
    rich = cust.join(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("a")
    )
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_custkey")
    return (
        rich.join(urgent, rich.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


# --- Q16: supplier variety per part class ----------------------------------

# NOT EXISTS, not NOT IN: the Spark side is a left_anti join, and NOT IN
# diverges from anti-join under three-valued logic the moment the inner
# side yields a NULL key (whole result empties) — NOT EXISTS is the
# anti-join-equivalent formulation on any data, null or not.
q16_oracle = """
SELECT p.p_brand, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE NOT EXISTS (
  SELECT 1 FROM supplier s
  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0.0
)
GROUP BY p.p_brand, p.p_size
"""


@register("q16_supplier_variety", q16_oracle)
def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct suppliers per (brand, size), excluding
    blacklisted (negative-balance) suppliers via anti-join. The distinct
    aggregation is the expensive part — Spark expands it into a two-phase
    plan (partial distinct per partition, then merge), so the shuffle
    carries (brand, size, suppkey) triples, not lineitems; the part dim
    join and the tiny blacklist are AQE-broadcast at runtime."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0.0
    ).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )
