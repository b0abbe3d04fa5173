"""Relational operators: projections/filters, joins, aggregations, set ops,
sorts/top-k (SURVEY.md §2.2-2.4, §2.6-2.7).

Every query here is a declarative DataFrame plan — Catalyst provides filter
pushdown, column pruning, partial aggregation, broadcast-join selection and
the TakeOrderedAndProject top-k rewrite; nothing is hand-scheduled. Dimension
tables are explicitly broadcast so the fact-table scan never shuffles for a
dim join at any scale factor.

Reference anchors: groupBy-count usage (processing.scala:84-86), global max
(processing.scala:88), left join + null fill (processing.scala:103-105),
union of booking relations (processing.scala:57,126-129), orderBy+limit top-k
(processing.scala:116-117), distinct (processing.scala:66), feasibility
filter (processing.scala:79), when/otherwise scoring (processing.scala:106-115).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity), 4) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price,
           round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount), 4) AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (A6): multi-aggregate groupBy with the
    filter pushed to the parquet scan and map-side partial aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price.cast("decimal(18,6)")), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum((disc_price * (1 + F.col("l_tax"))).cast("decimal(18,6)")), 2).cast("double").alias("sum_charge"),
            F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("l_quantity"), 4).alias("avg_qty"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.count("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.sum(F.col("l_discount").cast("decimal(18,2)")).cast("double") / F.count("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "usage_counts",
    """
    SELECT l_partkey,
           count(*) AS usage_count,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem GROUP BY l_partkey
    """,
)
def usage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key usage counts (A1) — the reference's room-usage aggregation
    (processing.scala:84-86) generalized with a second aggregate."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("usage_count"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


@register(
    "global_stats",
    """
    SELECT max(l_quantity)                        AS max_qty,
           min(l_quantity)                        AS min_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice), 4) AS avg_price,
           round(stddev_samp(l_extendedprice), 4) AS std_price,
           round(sqrt(avg(power(l_discount - l_tax, 2))), 6) AS rms_disc_tax,
           count(DISTINCT l_partkey)              AS distinct_parts,
           count(*)                               AS n_rows
    FROM lineitem
    """,
)
def global_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregates (A2-A4) kept fully in-plan — the reference pulls
    its global max and MSE to the driver (processing.scala:88,137); here the
    scalar math (sqrt-of-avg-of-pow) stays inside the aggregate plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.max("l_quantity").alias("max_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.count("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 4).alias("std_price"),
        F.round(
            F.sqrt(F.avg(F.pow(F.col("l_discount") - F.col("l_tax"), 2))), 6
        ).alias("rms_disc_tax"),
        F.count_distinct("l_partkey").alias("distinct_parts"),
        F.count("*").alias("n_rows"),
    )


@register(
    "distinct_booked",
    "SELECT DISTINCT l_partkey FROM lineitem WHERE l_returnflag = 'R'",
)
def distinct_booked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct keys of a filtered relation (A5) — the booked-room id set the
    reference collects into its Bloom filter (processing.scala:66)."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_partkey")
        .distinct()
    )


@register(
    "rollup_orders",
    """
    SELECT o_orderstatus, o_orderpriority,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (A7): status -> priority -> grand total."""
    return (
        load_table(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).alias("total_price"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "cube_lineitem",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*) AS n_rows
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube (A7) over the two status dimensions."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "pivot_status",
    """
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_open,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_filled
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide aggregation) with an explicit value list so the plan needs
    no extra distinct-values job."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnsRenamed({"O": "qty_open", "F": "qty_filled"})
    )


@register(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, metric, value FROM (
      SELECT p_partkey,
             'retailprice' AS metric, p_retailprice AS value FROM part
      UNION ALL
      SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    ) t
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt (the inverse of pivot_status): wide measure columns
    to long (key, metric, value) rows via ``DataFrame.unpivot`` — the
    Spark 3.4+ native operator, which generates an Expand node (each input
    row emitted once per measure inside the scan stage, no join, no
    shuffle). The oracle spells it as the portable UNION ALL; DuckDB's
    UNPIVOT syntax sugar expands to the same shape. Values are cast to a
    common type up front — unpivot requires it and implicit casts differ
    per engine."""
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").alias("retailprice"),
        F.col("p_size").cast("double").alias("size"),
    )
    return part.unpivot(
        ids=["p_partkey"],
        values=["retailprice", "size"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "approx_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS exact_custs,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group; the HLL-sketch variant
    (``approx_count_distinct``) is exercised in tests (sketches aren't
    oracle-hashable — A6 note in SURVEY.md §5)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("exact_custs"),
            F.count("*").alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "star_join_revenue",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY r.r_name, n.n_name
    """,
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-way star join (J3): fact ⋈ 4 dims. customer/nation/region are
    broadcast (no shuffle of the fact table for those joins); only the
    lineitem⋈orders join shuffles, on the shared orderkey."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            # decimal accumulation: order-independent exact sum (see
            # _REVENUE_SHARE_TEMPLATE note)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "star_join_bucketed",
    """
    SELECT r.r_name AS region_name, n.n_name AS nation_name,
           CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lineitems
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderstatus = 'F'
    GROUP BY r.r_name, n.n_name
    """,
)
def star_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """star_join_revenue over lineitem/orders BUCKETED on orderkey (J3
    scale variant): both sides hash into the same 16 buckets at write time,
    so the fact⋈fact join is a zero-Exchange merge join — at 100 TB this
    converts the query's dominant shuffle into a one-time layout cost paid
    at ingest. Results are identical to star_join_revenue (same oracle
    SQL); the Exchange-free plan is asserted in tests/test_plans.py and
    the unbucketed-vs-bucketed delta is measured in bench.py."""
    from ..sources.bucketing import ensure_star_bucketed

    li_tbl, ord_tbl = ensure_star_bucketed(spark, sf_dir)
    li = spark.table(li_tbl)
    orders = spark.table(ord_tbl).filter(F.col("o_orderstatus") == "F")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(
            # decimal accumulation: order-independent exact sum (see
            # _REVENUE_SHARE_TEMPLATE note)
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_lineitems"),
        )
    )


@register(
    "semi_join_active_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def semi_join_active_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence predicate as a left-semi join (J4) — the exact-semantics
    replacement for the reference's Bloom-filter membership probe
    (processing.scala:60-74)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "anti_join_idle_customers",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def anti_join_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absence predicate as a left-anti join (J4)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "left_join_order_counts",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
           round(coalesce(o.total_spent, 0.0), 2) AS total_spent
    FROM customer c
    LEFT JOIN (
      SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spent
      FROM orders GROUP BY o_custkey
    ) o ON c.c_custkey = o.o_custkey
    """,
)
def left_join_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join + null fill (J1/P6) — the reference's
    rooms ⟕ usage-scores join with na.fill(0.0)
    (processing.scala:103-105). Aggregate-before-join keeps the join input
    small (one row per customer, not per order)."""
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_totalprice").alias("total_spent"),
        )
    )
    return (
        customer.join(per_cust, customer.c_custkey == per_cust.o_custkey, "left")
        .na.fill({"n_orders": 0, "total_spent": 0.0})
        .select(
            "c_custkey",
            "c_name",
            "n_orders",
            F.round("total_spent", 2).alias("total_spent"),
        )
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@register(
    "union_order_classes",
    """
    SELECT 'high' AS order_class, o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice >= 300000
    UNION ALL
    SELECT 'urgent' AS order_class, o_orderkey, o_totalprice FROM orders
    WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT 'open' AS order_class, o_orderkey, o_totalprice FROM orders
    WHERE o_orderstatus = 'O'
    """,
)
def union_order_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-ary union via fold (U1/U2) — the reference's
    ``.map(...).reduce(_ union _)`` pattern (processing.scala:126-129);
    Catalyst's CombineUnions flattens it to one n-ary Union node."""
    orders = load_table(spark, sf_dir, "orders")
    parts = [
        orders.filter(F.col("o_totalprice") >= 300000).withColumn(
            "order_class", F.lit("high")
        ),
        orders.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
            "order_class", F.lit("urgent")
        ),
        orders.filter(F.col("o_orderstatus") == "O").withColumn(
            "order_class", F.lit("open")
        ),
    ]
    unioned = reduce(DataFrame.unionByName, parts)
    return unioned.select("order_class", "o_orderkey", "o_totalprice")


@register(
    "intersect_part_keys",
    """
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    INTERSECT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
    """,
)
def intersect_part_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (U3): parts appearing under both return flags."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(F.col("l_returnflag") == "A").select("l_partkey")
    return r.intersect(a)


@register(
    "except_part_keys",
    """
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'
    EXCEPT
    SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A' AND l_quantity >= 40
    """,
)
def except_part_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (U3): returned parts minus high-quantity 'A' parts (the second
    set is kept narrow so the difference is non-trivial at every SF)."""
    li = load_table(spark, sf_dir, "lineitem")
    r = li.filter(F.col("l_returnflag") == "R").select("l_partkey")
    a = li.filter(
        (F.col("l_returnflag") == "A") & (F.col("l_quantity") >= 40)
    ).select("l_partkey")
    return r.subtract(a)  # subtract == SQL EXCEPT (set semantics)


# ---------------------------------------------------------------------------
# Sorts / top-k / conditional projection
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy + limit (O1/O2) with a deterministic tiebreak; Catalyst
    rewrites to TakeOrderedAndProject (per-partition heap + driver merge —
    no global sort, scale-safe)."""
    return (
        load_table(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )


@register(
    "conditional_buckets",
    """
    SELECT CASE WHEN p_size >= 35 THEN 'large'
                WHEN p_size >= 15 THEN 'medium'
                ELSE 'small' END AS size_class,
           count(*) AS n_parts,
           round(avg(p_retailprice * 0.9 + 5.0), 4) AS avg_discounted
    FROM part
    GROUP BY 1
    """,
)
def conditional_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """when/otherwise conditional + arithmetic expression (P5/P7) — the
    reference's availability scoring shape (processing.scala:106-115)."""
    part = load_table(spark, sf_dir, "part")
    size_class = (
        F.when(F.col("p_size") >= 35, "large")
        .when(F.col("p_size") >= 15, "medium")
        .otherwise("small")
    )
    return (
        part.withColumn("size_class", size_class)
        .groupBy("size_class")
        .agg(
            F.count("*").alias("n_parts"),
            F.round(F.avg(F.col("p_retailprice") * 0.9 + 5.0), 4).alias(
                "avg_discounted"
            ),
        )
    )


_GS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
       count(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


@register("grouping_sets_orders", _GS_SQL)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (A7, SQL-API surface): per-status totals,
    per-priority totals, and the grand total in one pass — the shape rollup
    and cube can't express (no (status, priority) cell). Uses the SQL door
    into the same Catalyst Expand-based plan as rollup/cube."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GS_SQL)


_QS_PCTS = (0.25, 0.50, 0.75, 0.95)

# Both engines implement the standard continuous-percentile definition
# (pos = p * (n - 1), linear interpolation between the bracketing order
# statistics), so Spark's exact `percentile` and DuckDB's `quantile_cont`
# agree to the last bit on the same doubles. percentile_approx's
# GK-sketch answer is deliberately NOT the oracled surface: its selected
# rank depends on insertion-order delta bookkeeping that no other engine
# reproduces (its error *bound* is property-tested instead).
_QS_ORACLE = f"""
SELECT o_orderstatus,
       {", ".join(
           "round(quantile_cont(o_totalprice, CAST(%s AS DOUBLE)), 2) AS p%d"
           % (p, round(p * 100))
           for p in _QS_PCTS
       )},
       count(*) AS n_orders
FROM orders
GROUP BY o_orderstatus
"""


@register("quantile_summary", _QS_ORACLE)
def quantile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile summary (A6): exact interpolated percentiles per order
    status via Spark's sort-based `percentile` aggregate — the
    SQL-portable definition (pos = p*(n-1), linear interpolation), which
    DuckDB's quantile_cont reproduces bit-for-bit. The one-pass sketch
    variant (percentile_approx) is the 100 TB path and keeps its error
    bound property-tested in tests/test_relational.py; it is not the
    oracled surface because GK-sketch rank selection is
    implementation-defined."""
    pcts = F.array(*[F.lit(p) for p in _QS_PCTS])
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile("o_totalprice", pcts).alias("price_quantiles"),
            F.count("*").alias("n_orders"),
        )
        .select(
            "o_orderstatus",
            *[
                F.round(F.col("price_quantiles")[i], 2).alias(
                    f"p{round(p * 100)}"
                )
                for i, p in enumerate(_QS_PCTS)
            ],
            "n_orders",
        )
    )


@register(
    "latest_per_key",
    """
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY user_id
        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC
      ) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
)
def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key (the CDC / snapshot-compaction query): one
    window rank per user, partial top-k per partition before the final
    rank — never a global sort."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type", "value")
    )


@register(
    "full_outer_usage",
    """
    SELECT coalesce(p.p_partkey, l.l_partkey) AS part_key,
           p.p_brand,
           l.cnt,
           p.p_partkey IS NOT NULL AS in_catalog,
           l.l_partkey IS NOT NULL AS has_usage
    FROM part p
    FULL OUTER JOIN (
      SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey
    ) l ON p.p_partkey = l.l_partkey
    """,
)
def full_outer_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (set-reconciliation shape): catalog vs usage, keeping
    unmatched rows from BOTH sides with side-membership flags."""
    part = load_table(spark, sf_dir, "part")
    usage = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
    )
    return (
        part.join(usage, part.p_partkey == usage.l_partkey, "full_outer")
        .select(
            F.coalesce("p_partkey", "l_partkey").alias("part_key"),
            "p_brand",
            "cnt",
            F.col("p_partkey").isNotNull().alias("in_catalog"),
            F.col("l_partkey").isNotNull().alias("has_usage"),
        )
    )


# ---------------------------------------------------------------------------
# Pure-SQL entry point: one portable SQL text drives BOTH engines
# ---------------------------------------------------------------------------

# One portable SQL text drives both engines; only the FACT TABLE BINDING
# differs (a catalog concern, not a semantic one): DuckDB reads the plain
# parquet views, Spark reads the orderkey-bucketed overlay under distinct
# view names — rebinding the session-global `lineitem`/`orders` views in
# place was an ADVICE-flagged footgun for every other view consumer.
_REVENUE_SHARE_TEMPLATE = """
WITH rev AS (
  -- DECIMAL accumulation: the per-row product double is identical in both
  -- engines, but float-SUM order is not — at sf0.001 one (nation, yr)
  -- group measurably landed on a cent boundary (…673.95 vs .94). Casting
  -- each product to DECIMAL(18,6) before summing makes the sum exact and
  -- order-independent.
  SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS yr,
         CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                             AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
  FROM {lineitem} l JOIN {orders} o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2
)
SELECT nation, yr, revenue,
       round(revenue / sum(revenue) OVER (PARTITION BY yr), 6) AS yr_share
FROM rev
"""

_REVENUE_SHARE_SQL = _REVENUE_SHARE_TEMPLATE.format(
    lineitem="lineitem", orders="orders"
)


@register("sql_revenue_share", _REVENUE_SHARE_SQL)
def sql_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spark.sql() surface (SURVEY.md §3 'no SQL parser of its own —
    delegates to Spark SQL'): the SAME portable ANSI SQL text runs through
    Catalyst here and through DuckDB as its own oracle — dialect-portable
    by construction. Per-year revenue share per nation: star join →
    grouped aggregate → windowed share, all planned by Catalyst exactly
    as the equivalent DataFrame chain would be.

    The two fact views are overlaid with the orderkey-bucketed layout
    (sources/bucketing.py) before planning: the dominant lineitem⋈orders
    join then reads co-bucketed files side by side — no Exchange above
    either fact scan (asserted in tests/test_plans.py). The dimension joins
    broadcast, and the only remaining shuffles are the output-sized
    (nation, yr) aggregate and its window — the plan whose cost scales with
    the result, not the fact table."""
    from ..sources.bucketing import ensure_star_bucketed
    from ..sources.readers import register_views

    register_views(spark, sf_dir)
    li_tbl, ord_tbl = ensure_star_bucketed(spark, sf_dir)
    # bind the bucketed facts under their own view names — the session-
    # global `lineitem`/`orders` views stay untouched
    spark.table(li_tbl).createOrReplaceTempView("lineitem_bkt")
    spark.table(ord_tbl).createOrReplaceTempView("orders_bkt")
    return spark.sql(
        _REVENUE_SHARE_TEMPLATE.format(
            lineitem="lineitem_bkt", orders="orders_bkt"
        )
    )


@register(
    "salted_usage_counts",
    """
    SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY l_partkey
    """,
)
def salted_usage_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-phase aggregation (100 TB design note made a
    first-class query): groupBy on (key, deterministic salt) spreads a
    pathologically hot key over n_salts reducers, then a second output-
    sized merge — exact same result as the plain groupBy (the oracle IS
    the plain GROUP BY). AQE's skew-join splitting can't re-plan a skewed
    AGGREGATE, so this is the manual escape hatch; the salt is
    content-derived (xxhash64, functions/skew.py) so task retries can't
    renumber rows through it."""
    from ..functions.skew import salted_count

    return salted_count(
        load_table(spark, sf_dir, "lineitem"), "l_partkey", n_salts=16
    )


@register(
    "salted_join_usage",
    """
    SELECT l.l_partkey, p.p_brand,
           count(*) AS n_uses, round(sum(l.l_quantity), 2) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY l.l_partkey, p.p_brand
    """,
)
def salted_join_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant salted equi-join (the join-side twin of
    salted_usage_counts): the big side carries a content-derived salt, the
    small side is exploded n_salts ways, and the join key becomes
    (key, salt) — a hot part key's rows land on n_salts reducers instead
    of one. Exactness is by construction (each big row joins exactly its
    one salt replica) and the oracle is the plain join. Use when the small
    side is too big to broadcast whole but its rows can be replicated;
    AQE's skew handling covers the broadcastable case automatically."""
    from ..functions.skew import salted_join_left

    # l_orderkey rides along solely to feed the content-derived salt: the
    # salt hashes the whole row, and a hot part key whose rows share
    # quantity values would otherwise collapse onto one salt — exactly the
    # skew this query exists to spread (with_salt's documented caveat).
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_orderkey"
    ).withColumnRenamed("l_partkey", "p_partkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join_left(li, part, "p_partkey", n_salts=8)
    return joined.groupBy(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    ).agg(
        F.count("*").alias("n_uses"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


stat_aggregates_oracle = """
SELECT l_returnflag,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       round(var_samp(l_quantity), 6) AS qty_var,
       round(var_samp(l_extendedprice), 2) AS price_var
FROM lineitem
GROUP BY l_returnflag
"""


@register("stat_aggregates", stat_aggregates_oracle)
def stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-moment aggregate surface (A6 completion): correlation,
    sample covariance and variance per group — single-pass streaming
    moments (Welford-style partials merge associatively, so map-side
    combine works exactly as for sum/count). corr/covar are RATIOS of
    centered sums, so accumulation-order noise cancels to ~1e-12 relative
    and the round-6 outputs are stable cross-engine (unlike the raw
    sum-then-round sites swept to decimal earlier — skewness/kurtosis are
    excluded: Spark computes population g1/g2 where DuckDB applies the
    sample correction, a genuine semantic difference, not noise)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
            "qty_price_corr"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias(
            "qty_price_covar"
        ),
        F.round(F.var_samp("l_quantity"), 6).alias("qty_var"),
        F.round(F.var_samp("l_extendedprice"), 2).alias("price_var"),
    )


# ---------------------------------------------------------------------------
# LATERAL correlated-subquery surface (F11 completion)
# ---------------------------------------------------------------------------

_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
  SELECT o_orderkey, o_totalprice
  FROM orders
  WHERE o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey
  LIMIT 3
) o
WHERE c.c_mktsegment = 'BUILDING'
"""


@register("lateral_top_orders", _LATERAL_SQL)
def lateral_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery (the second spark.sql surface next to
    sql_revenue_share): each BUILDING-segment customer's top-3 orders by
    price, written as a per-row dependent subquery — the SAME portable
    SQL text runs through Catalyst and through DuckDB as its own oracle.

    Catalyst decorrelates the lateral into the window top-k plan the
    DataFrame spelling (`topk_per_brand`) would produce — per-key rank
    over one customer-keyed exchange, never an N-subquery loop; the
    deterministic (price, orderkey) ordering makes the kept rows
    engine-identical."""
    from ..sources.readers import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


# ---------------------------------------------------------------------------
# Conditional distinct aggregation (FILTER-clause surface)
# ---------------------------------------------------------------------------

filtered_distinct_oracle = """
SELECT n.n_name,
       CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_customers,
       CAST(count(DISTINCT c.c_custkey)
              FILTER (WHERE o.o_orderstatus = 'O') AS BIGINT)
         AS n_open_customers,
       CAST(count(DISTINCT o.o_orderkey)
              FILTER (WHERE o.o_totalprice > 200000) AS BIGINT)
         AS n_big_orders
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
"""


@register("filtered_distinct_counts", filtered_distinct_oracle)
def filtered_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional DISTINCT aggregation — the FILTER-clause surface: three
    distinct counts under different predicates out of ONE grouped pass
    (Spark plans multiple distinct aggregates via a single Expand, not
    one scan per aggregate; conditions become null-ing projections). The
    left join keeps customers with no orders in n_customers. One
    customer-keyed join + one nation-sized aggregate."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count_distinct("c_custkey").alias("n_customers"),
            F.count_distinct(
                F.when(F.col("o_orderstatus") == "O", F.col("c_custkey"))
            ).alias("n_open_customers"),
            F.count_distinct(
                F.when(F.col("o_totalprice") > 200000, F.col("o_orderkey"))
            ).alias("n_big_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Percent-of-parent hierarchy shares (nation within region within total)
# ---------------------------------------------------------------------------

share_of_parent_oracle = """
WITH rev AS (
  SELECT r.r_name, n.n_name,
         sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18, 6))) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  GROUP BY r.r_name, n.n_name
)
SELECT r_name, n_name,
       CAST(round(val, 2) AS DOUBLE) AS revenue,
       round(CAST(val AS DOUBLE)
             / CAST(sum(val) OVER (PARTITION BY r_name) AS DOUBLE), 6)
         AS share_of_region,
       round(CAST(sum(val) OVER (PARTITION BY r_name) AS DOUBLE)
             / CAST(sum(val) OVER () AS DOUBLE), 6) AS region_share_of_total
FROM rev
"""


@register("share_of_parent", share_of_parent_oracle)
def share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level percent-of-parent rollup (the hierarchy-share report):
    each nation's share of its region and each region's share of the
    total, from ONE (region, nation)-keyed aggregate. Shares divide two
    doubles cast from the SAME exact DECIMAL sums, so numerator/
    denominator are engine-identical before the one rounded division
    (non-terminating ratios — outside the integer-ratio half-tie class).

    Round-8 spelling: the region and grand totals are AGGREGATES of the
    nations-sized relation joined back with broadcast hints — not window
    functions — so no Exchange SinglePartition exists in the plan at all
    (this query used to carry the plan audit's ``share_of_parent``
    allowlist entry; DECIMAL sums are exact, so regrouping cannot change
    a value and the oracle hash is untouched)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    agg = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("val"))
    )
    region_tot = agg.groupBy("r_name").agg(F.sum("val").alias("rtot"))
    total = agg.agg(F.sum("val").alias("gtot"))
    return (
        agg.join(F.broadcast(region_tot), "r_name")
        .join(F.broadcast(total))
        .select(
            "r_name",
            "n_name",
            F.round("val", 2).cast("double").alias("revenue"),
            F.round(
                F.col("val").cast("double") / F.col("rtot").cast("double"), 6
            ).alias("share_of_region"),
            F.round(
                F.col("rtot").cast("double") / F.col("gtot").cast("double"), 6
            ).alias("region_share_of_total"),
        )
    )


# ---------------------------------------------------------------------------
# Exact percentiles by DOMAIN COUNTING (the 4th quantile strategy)
# ---------------------------------------------------------------------------

counting_median_oracle = """
WITH cnts AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, count(*) AS c
  FROM lineitem GROUP BY 1, 2
), cum AS (
  SELECT l_returnflag, qty, c,
         sum(c) OVER (
           PARTITION BY l_returnflag ORDER BY qty
         ) AS cumc,
         sum(c) OVER (PARTITION BY l_returnflag) AS n
  FROM cnts
)
SELECT l_returnflag,
       CAST(min(CASE WHEN 2 * cumc >= n     THEN qty END) AS BIGINT) AS p50,
       CAST(min(CASE WHEN 4 * cumc >= n     THEN qty END) AS BIGINT) AS p25,
       CAST(min(CASE WHEN 4 * cumc >= 3 * n THEN qty END) AS BIGINT) AS p75,
       CAST(max(n) AS BIGINT) AS n
FROM cum
GROUP BY l_returnflag
"""


@register("counting_median", counting_median_oracle)
def counting_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles by DOMAIN COUNTING — the 4th quantile
    strategy next to the sort-based exact (`quantile_summary`), the GK
    sketch (percentile_approx), and the deterministic sample
    (`sampled_quantiles`): when the value domain is small (quantities,
    star ratings, ages, bucketed scores), aggregate to (group, value)
    counts FIRST, then take running sums over the domain-sized count
    table. At 100 TB the data-sized stage is one combinable groupBy —
    the window runs over ≤|domain| rows per group, so the exact
    percentile costs no sort of the data, ever. All arithmetic is
    integer (cuts at 2·cum ≥ n, 4·cum ≥ n, 4·cum ≥ 3n — lower-median
    convention), so both engines agree exactly."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("qty")
    )
    cnts = li.groupBy("l_returnflag", "qty").agg(F.count("*").alias("c"))
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("qty")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("l_returnflag")
    cum = cnts.select(
        "l_returnflag",
        "qty",
        F.sum("c").over(wc).alias("cumc"),
        F.sum("c").over(wn).alias("n"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("qty")))  # noqa: E731
    return cum.groupBy("l_returnflag").agg(
        pick(2 * F.col("cumc") >= F.col("n")).alias("p50"),
        pick(4 * F.col("cumc") >= F.col("n")).alias("p25"),
        pick(4 * F.col("cumc") >= 3 * F.col("n")).alias("p75"),
        F.max("n").alias("n"),
    )


# ---------------------------------------------------------------------------
# Fulfillment latency percentiles (domain counting over lag days)
# ---------------------------------------------------------------------------

fulfillment_latency_oracle = """
WITH lag AS (
  SELECT o_orderpriority AS priority,
         CAST(floor(epoch_ms(CAST(l_shipdate AS TIMESTAMP)) / 86400000.0)
              - floor(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 86400000.0)
              AS BIGINT) AS days
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
), cnts AS (
  SELECT priority, days, count(*) AS c FROM lag GROUP BY 1, 2
), cum AS (
  SELECT priority, days, c,
         sum(c) OVER (PARTITION BY priority ORDER BY days) AS cumc,
         sum(c) OVER (PARTITION BY priority) AS n,
         sum(days * c) OVER (PARTITION BY priority) AS sumd
  FROM cnts
)
SELECT priority,
       CAST(max(n) AS BIGINT) AS n_items,
       round(CAST(max(sumd) AS DOUBLE) / max(n), 6) AS mean_days,
       CAST(min(CASE WHEN 2 * cumc >= n THEN days END) AS BIGINT) AS p50,
       CAST(min(CASE WHEN 10 * cumc >= 9 * n THEN days END) AS BIGINT)
         AS p90,
       CAST(min(CASE WHEN 100 * cumc >= 99 * n THEN days END) AS BIGINT)
         AS p99
FROM cum GROUP BY priority
"""


@register("fulfillment_latency_percentiles", fulfillment_latency_oracle)
def fulfillment_latency_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency SLA report per order priority: exact
    p50/p90/p99 of (ship day − order day) by DOMAIN COUNTING — the
    `counting_median` strategy over the lag-days domain (bounded by the
    fulfillment policy, ~0–122 days, at ANY data scale). The ops-review
    readout that tells a team whether '1-URGENT' actually ships faster
    at the tail, not just on average.

    Scale shape: one orderkey-keyed join + ONE combinable
    (priority, days) count; the running sums scan ≤|priorities|·|days|
    rows. All cuts are integer inequalities (2·cum ≥ n, 10·cum ≥ 9n,
    100·cum ≥ 99n — lower-percentile convention), exact cross-engine;
    the mean is one IEEE division of exact integer sums."""
    from ..functions.timeutil import epoch_ms

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    day = lambda c: F.floor(  # noqa: E731
        epoch_ms(F.col(c).cast("timestamp")) / 86400000
    ).cast("bigint")
    lag = od.join(li, od.o_orderkey == li.l_orderkey).select(
        "priority", (day("l_shipdate") - day("o_orderdate")).alias("days")
    )
    cnts = lag.groupBy("priority", "days").agg(F.count("*").alias("c"))
    wc = (
        Window.partitionBy("priority")
        .orderBy("days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("priority")
    cum = cnts.select(
        "priority",
        "days",
        F.sum("c").over(wc).alias("cumc"),
        F.sum("c").over(wn).alias("n"),
        F.sum(F.col("days") * F.col("c")).over(wn).alias("sumd"),
    )
    pick = lambda cond: F.min(F.when(cond, F.col("days")))  # noqa: E731
    return cum.groupBy("priority").agg(
        F.max("n").alias("n_items"),
        F.round(F.max("sumd").cast("double") / F.max("n"), 6).alias(
            "mean_days"
        ),
        pick(2 * F.col("cumc") >= F.col("n")).alias("p50"),
        pick(10 * F.col("cumc") >= 9 * F.col("n")).alias("p90"),
        pick(100 * F.col("cumc") >= 99 * F.col("n")).alias("p99"),
    )


# ---------------------------------------------------------------------------
# ABC inventory classification (distributed cumulative-share ranking)
# ---------------------------------------------------------------------------

abc_oracle = """
WITH rev AS (
  SELECT l_partkey,
         sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_c
  FROM lineitem GROUP BY 1
), cum AS (
  SELECT l_partkey, rev_c,
         sum(rev_c) OVER (ORDER BY rev_c DESC, l_partkey) AS cumc,
         sum(rev_c) OVER () AS tot
  FROM rev
), classed AS (
  SELECT CASE WHEN 5 * cumc <= 4 * tot THEN 'A'
              WHEN 20 * cumc <= 19 * tot THEN 'B'
              ELSE 'C' END AS abc_class,
         rev_c, tot
  FROM cum
)
SELECT abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       round(CAST(sum(rev_c) AS DOUBLE) / max(tot), 6) AS rev_share
FROM classed GROUP BY abc_class
"""


@register("abc_classification", abc_oracle)
def abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory analysis: parts ranked by revenue descending, split at
    cumulative share ≤80 % (A) / ≤95 % (B) / rest (C) — the classic
    Pareto stocking-policy classes, reported as class sizes + revenue
    shares. Class membership is decided by INTEGER inequalities on exact
    cents (5·cum ≤ 4·tot, 20·cum ≤ 19·tot — the boundary-crossing part
    falls to the next class), so the cut can never flip on float noise.

    Scale shape: the data-sized stages are one part-keyed revenue
    aggregate and the `functions/ranking.py` range-partition kernel —
    the global cumulative sum is per-partition offsets (O(P) collected)
    + pid-PARTITIONED running sums; no single-task sort of the part
    table at any scale (the zipf_law_fit lesson)."""
    from ..functions.ranking import range_partition_offsets
    from ..session import shuffle_partition_count

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")).alias(
            "rev_c"
        )
    )
    n_parts = shuffle_partition_count(spark)
    ranged, _, offsets_df, totals = range_partition_offsets(
        rev.withColumn("neg_rev", -F.col("rev_c")),
        ["neg_rev", "l_partkey"],
        [("revsum", F.sum("rev_c"))],
        n_parts,
    )
    tot = totals["revsum"]
    lw = (
        Window.partitionBy("pid")
        .orderBy("neg_rev", "l_partkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        ranged.withColumn("lcum", F.sum("rev_c").over(lw))
        .join(F.broadcast(offsets_df), "pid")
        .select(
            "rev_c", (F.col("off_revsum") + F.col("lcum")).alias("cumc")
        )
    )
    classed = cum.select(
        F.when(5 * F.col("cumc") <= 4 * F.lit(tot), "A")
        .when(20 * F.col("cumc") <= 19 * F.lit(tot), "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev_c",
    )
    return classed.groupBy("abc_class").agg(
        F.count("*").alias("n_parts"),
        F.round(F.sum("rev_c").cast("double") / float(tot), 6).alias(
            "rev_share"
        ),
    )
