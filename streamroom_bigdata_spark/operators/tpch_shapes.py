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


# --- Q7: cross-nation trade volume by ship year ----------------------------

q7_oracle = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INT) AS yr,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18, 6))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
WHERE sn.n_name <> cn.n_name
GROUP BY supp_nation, cust_nation, yr
"""


@register("q7_volume_shipping", q7_oracle)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape (volume shipping): discounted revenue flowing between every
    ordered pair of DISTINCT nations, by ship year. Two independent dim
    chains hang off the fact — supplier→nation on l_suppkey and
    orders→customer→nation on l_orderkey. All dims are AQE-broadcast, so
    the only exchange is the final (supp, cust, yr)-keyed aggregate, and
    map-side partials collapse the fact scan to ≤ |nations|²·|years| rows
    per task. DECIMAL accumulation of the double product keeps the sum
    engine-exact (the product itself is one IEEE multiply — deterministic)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


# --- Q8: nation market share within a region -------------------------------

q8_oracle = """
SELECT CAST(year(o.o_orderdate) AS INT) AS yr,
       round(
         CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                       THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                 AS DECIMAL(18, 6))
                       ELSE CAST(0 AS DECIMAL(18, 6)) END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18, 6))) AS DOUBLE),
         6) AS mkt_share
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn  ON cn.n_nationkey = c.c_nationkey
JOIN region r   ON r.r_regionkey = cn.n_regionkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn  ON sn.n_nationkey = s.s_nationkey
WHERE p.p_type = 'PROMO' AND r.r_name = 'EUROPE'
GROUP BY yr
"""


@register("q8_market_share", q8_oracle)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): NATION_3's share of PROMO-part
    revenue sold into EUROPE, per order year. The share is a conditional
    sum over the same joined fact — ONE aggregate computes numerator and
    denominator together (no second scan, no self-join). Selective dim
    filters (p_type, r_name) reach the dim scans as pushed filters and
    prune the fact via the broadcast hash joins' runtime side. Both sums
    are exact DECIMAL; the final divide is one IEEE double op, rounded to
    stabilize the last ulp across engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = (
        load_table(spark, sf_dir, "region")
        .filter(F.col("r_name") == "EUROPE")
        .select("r_regionkey")
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .join(r, F.col("cn_region") == F.col("r_regionkey"))
        .join(s := load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"), li.l_suppkey == s.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", rev).otherwise(zero)
                ).cast("double")
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


# --- Q17: small-quantity-order revenue (correlated scalar subquery) --------

q17_oracle = """
SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18, 2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#13'
  AND l.l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@register("q17_small_qty_revenue", q17_oracle)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape (small-quantity revenue): lineitems of one brand whose
    quantity is below 20% of that part's average quantity. The correlated
    scalar subquery decorrelates into a per-part aggregate joined back on
    partkey — expressed directly as groupBy + join, which is exactly the
    plan a decorrelating optimizer produces. The threshold is computed
    over ALL lineitems of the part (matching the subquery's scope), and
    brand filtering happens via the part-dim join. Quantities are
    integer-valued doubles, so the avg is exact under any summation order
    — the 0.2× threshold compares identically on both engines.

    100 TB note: the per-part avg shuffles (partkey, partial sum/count)
    pairs — map-side combine makes that part-sized, and AQE broadcasts the
    filtered brand dim. One partkey-keyed shuffle total."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(brand, li.l_partkey == brand.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / F.lit(7.0)
            )
            .cast("double")
            .alias("avg_yearly")
        )
    )


# --- Q18: large-volume orders (HAVING subquery) ----------------------------

q18_oracle = """
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 250
)
SELECT c.c_name, o.o_orderkey,
       CAST(year(o.o_orderdate) AS INT) AS yr,
       o.o_totalprice, b.total_qty
FROM big b
JOIN orders o   ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
"""


@register("q18_large_orders", q18_oracle)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape (large-volume orders): orders whose total quantity tops
    250 (≈ the 99th percentile), with their customer. The classic spelling
    is an IN-subquery with HAVING; the idiomatic plan computes the
    per-order sums ONCE, filters them (HAVING → post-agg filter), and
    joins the survivors to orders/customer — the quantity total rides
    along instead of being recomputed by a second lineitem scan.
    Quantities are integer-valued doubles → the sum is order-insensitive
    exact. The HAVING filter cuts the agg output to ~1% of orders before
    either join, so both joins are broadcast-sized at any SF where orders
    ≫ survivors."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.year("o_orderdate").cast("int").alias("yr"),
            "o_totalprice",
            "total_qty",
        )
    )


# --- Q21: the lone-late-supplier shape (EXISTS + NOT EXISTS) ---------------

# Adapted to the fixture schema: no commit/receipt dates, so "late" is a
# ship-vs-order-date gap over 365 days. The oracle keeps the textbook
# EXISTS / NOT EXISTS correlated spelling; the Spark side is the
# decorrelated one-pass form (per-order supplier/late counts), which is
# the plan a decorrelating optimizer reaches — same semantics, one fact
# aggregation instead of three correlated rescans.
q21_oracle = """
WITH sl AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY l.l_orderkey, l.l_suppkey
)
SELECT s.s_name, count(*) AS numwait
FROM sl t JOIN supplier s ON s.s_suppkey = t.l_suppkey
WHERE t.late = 1
  AND EXISTS (SELECT 1 FROM sl u
              WHERE u.l_orderkey = t.l_orderkey
                AND u.l_suppkey <> t.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM sl v
                  WHERE v.l_orderkey = t.l_orderkey
                    AND v.l_suppkey <> t.l_suppkey AND v.late = 1)
GROUP BY s.s_name
"""


@register("q21_late_solo_supplier", q21_oracle)
def q21_late_solo_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape (suppliers who kept orders waiting): per supplier, how
    many multi-supplier orders were late SOLELY because of them. The
    EXISTS ("another supplier participated") and NOT EXISTS ("no other
    supplier was late") decorrelate into one per-order aggregate over the
    (order, supplier, late) table: n_supp > 1 ∧ n_late = 1 ∧ I'm-the-late-
    one. `max(late_supp) when n_late = 1` is well-defined (the max over a
    single element), so one orderkey-keyed aggregate replaces both
    correlated subqueries; the supplier-name roll-up is supplier-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    late_flag = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"),
        1,
    ).otherwise(0)
    sl = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late_flag).alias("late"))
    )
    per_order = sl.groupBy("l_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("late").alias("n_late"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    culprits = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late") == 1)
    ).select("late_supp")
    return (
        culprits.join(s, culprits.late_supp == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


# --- Q2: minimum-unit-price supplier (correlated min subquery) -------------

q2_oracle = """
WITH offers AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(CAST(l.l_extendedprice AS DOUBLE)
             / CAST(l.l_quantity AS DOUBLE)) AS unit_price
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  JOIN region r   ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
  GROUP BY l.l_partkey, l.l_suppkey
)
SELECT p.p_partkey, p.p_brand, s.s_name,
       CAST(round(CAST(o.unit_price AS DECIMAL(18, 8)), 6) AS DOUBLE)
         AS unit_price
FROM part p
JOIN offers o   ON o.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = o.l_suppkey
WHERE p.p_size <= 10
  AND o.unit_price = (SELECT min(o2.unit_price) FROM offers o2
                      WHERE o2.l_partkey = p.p_partkey)
"""


@register("q2_min_price_supplier", q2_oracle)
def q2_min_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (minimum-cost supplier, adapted — the fixture has no
    partsupp, so 'cost' is the best unit price a EUROPE supplier ever
    shipped the part at): a correlated min subquery selects, per part,
    the supplier(s) achieving the per-part minimum.

    The oracle keeps the textbook correlated spelling; here the
    decorrelation is explicit — a per-part min window over the SAME
    (part, supplier) aggregate the offer table needs, so the min
    join-back rides the exchange that already exists. min/= on doubles
    is engine-exact (no summation order involved)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey", "s_name")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).select(
        "p_partkey", "p_brand"
    )
    offers = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double")
            ).alias("unit_price")
        )
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("min_price", F.min("unit_price").over(w)).filter(
        F.col("unit_price") == F.col("min_price")
    )
    return (
        best.join(p, best.l_partkey == p.p_partkey)
        .join(
            load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name"),
            best.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            F.round(F.col("unit_price").cast("decimal(18,8)"), 6)
            .cast("double")
            .alias("unit_price"),
        )
    )


# --- Q11: important parts (global-scalar HAVING threshold) -----------------

q11_oracle = """
WITH pv AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18, 6)))
           AS val
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(round(val, 2) AS DOUBLE) AS part_value
FROM pv
WHERE val * 10000 > (SELECT sum(val) FROM pv) * 7
"""


@register("q11_important_parts", q11_oracle)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape (important stock, adapted to the revenue fact): parts
    whose total revenue exceeds 0.07% of ALL revenue (the fixture spreads revenue over 2000 parts, so the TPC-H 0.01% spelling would keep everything and 0.1% nothing) — a per-group
    aggregate compared against a global scalar of the same aggregate.

    The threshold comparison stays in exact DECIMAL arithmetic
    (``val * 10000 > total * 7``, no float fraction), so the kept-set is
    engine-identical even at boundary values — the round-7 precision
    rule. The global total is a 1-row broadcast over the SAME part-keyed
    aggregate (computed once; Spark reuses the exchange), so the plan is
    one fact-sized shuffle + an output-sized filter."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    pv = li.groupBy("l_partkey").agg(F.sum(rev).alias("val"))
    total = pv.agg(F.sum("val").alias("total"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("val") * 10000 > F.col("total") * 7)
        .select(
            "l_partkey",
            F.round("val", 2).cast("double").alias("part_value"),
        )
    )


# --- Q15: top supplier (aggregate view + global max) -----------------------

q15_oracle = """
WITH revenue AS (
  SELECT l_suppkey,
         CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18, 6))), 2) AS DOUBLE)
           AS total_revenue
  FROM lineitem
  WHERE year(l_shipdate) = 1997
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


@register("q15_top_supplier", q15_oracle)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape (top supplier): revenue-per-supplier view over one ship
    year, returning the supplier(s) whose revenue equals the view's max.
    The year predicate uses year() (not a timestamp literal) so NTZ/LTZ
    parsing differences can't shift the window. Equality is on the
    ROUNDED revenue — ties keep every argmax row deterministically on
    both engines. The max is a 1-row broadcast; the revenue view's
    supplier-keyed exchange is computed once and reused."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1997
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    revenue = li.groupBy("l_suppkey").agg(
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --- Q19: disjunctive-predicate revenue ------------------------------------

q19_oracle = """
SELECT CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18, 6))), 2) AS DOUBLE) AS revenue
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 30)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 40)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 50)
"""


@register("q19_disjunctive_revenue", q19_oracle)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape (disjunctive pushdown): an OR of three conjunctive
    (brand, size, quantity) range clauses across the join. Catalyst
    splits the disjunction: the union of per-side implications
    (brand IN (...) on part, quantity ranges on lineitem) pushes into
    BOTH scans while the full predicate evaluates after the join —
    the scan reads a fraction of each table even though no single
    conjunct applies globally. One broadcast join + a single-row
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    joined = li.join(p, li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    clause = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & q.between(1, 30)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 25)
        & q.between(10, 40)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & q.between(20, 50)
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return joined.filter(clause).agg(
        F.round(F.sum(rev), 2).cast("double").alias("revenue")
    )


# --- Q20: dominant suppliers (nested aggregate EXISTS) ---------------------

q20_oracle = """
WITH sp AS (
  SELECT l_suppkey, l_partkey, sum(CAST(l_quantity AS DOUBLE)) AS qty
  FROM lineitem GROUP BY l_suppkey, l_partkey
), pt AS (
  SELECT l_partkey, sum(qty) AS total_qty FROM sp GROUP BY l_partkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
WHERE EXISTS (
  SELECT 1 FROM sp JOIN pt ON pt.l_partkey = sp.l_partkey
  WHERE sp.l_suppkey = s.s_suppkey AND sp.qty * 100 > pt.total_qty * 15
)
"""


@register("q20_dominant_suppliers", q20_oracle)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape (suppliers holding excess share, adapted): suppliers who
    shipped more than 15% of some part's total quantity — an EXISTS over
    a two-level aggregation. The oracle keeps the correlated EXISTS; here
    it is a semi join against the qualifying (supplier, part) rows.

    Precision: per-(supplier, part) quantity sums are sums of small
    integers stored as doubles — exact in IEEE well past this scale
    (< 2^53) and reorder-safe, so the 15% comparison (spelled with
    integer multipliers, no float division) is engine-identical. The
    part-total is a second aggregate OVER the first (sp is
    part-partitionable), and the semi join output is supplier-sized."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("double")).alias("qty")
    )
    w = Window.partitionBy("l_partkey")
    qualifying = sp.withColumn(
        "total_qty", F.sum("qty").over(w)
    ).filter(F.col("qty") * 100 > F.col("total_qty") * 15)
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(
        qualifying.select(F.col("l_suppkey").alias("s_suppkey")),
        "s_suppkey",
        "left_semi",
    )


# --- Q3: shipping-priority top-10 (join + top-k on aggregated revenue) -----

q3_oracle = """
SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18, 6))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderstatus = 'O'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", q3_oracle)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape (shipping priority, adapted — open status stands in for
    the missing shipdate cutoffs): top-10 open BUILDING-segment orders by
    discounted revenue. Customer filter pushes to its scan and broadcasts;
    the only fact-sized exchange is the per-order aggregate;
    TakeOrderedAndProject keeps 10 with (rounded revenue, orderkey)
    deterministic order."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("o_orderdate"))
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --- Q4: order-priority checking (EXISTS late line) ------------------------

q4_oracle = """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
)
GROUP BY o.o_orderpriority
"""


@register("q4_priority_check", q4_oracle)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape (order-priority checking): orders having at least one
    line shipped after the order date, counted per priority. The EXISTS
    is a LEFT SEMI join on orderkey with the non-equi ship-late predicate
    in the join condition — one orderkey-keyed shuffle pair, then a
    priority-sized aggregate."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --- Q5: local-supplier volume (region-closed star) ------------------------

q5_oracle = """
SELECT n.n_name, CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                                     AS DECIMAL(18, 6))), 2) AS DOUBLE)
                   AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA' AND year(CAST(o.o_orderdate AS TIMESTAMP)) = 1997
GROUP BY n.n_name
"""


@register("q5_local_volume", q5_oracle)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape (local supplier volume): revenue where the supplier and
    the customer share a nation inside one region — the star join whose
    distinguishing feature is the EXTRA equality (s_nationkey =
    c_nationkey) closing the snowflake into a cycle. Dims broadcast; the
    nation-closure predicate rides the supplier join condition so no
    post-join filter materializes the open pairs."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        F.year(F.col("o_orderdate").cast("timestamp")) == 1997
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (s.s_nationkey == c.c_nationkey),
        )
        .join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
    )


# --- Q6: forecast-revenue change (pure scan aggregate) ---------------------

q6_oracle = """
SELECT CAST(round(sum(CAST(l_extendedprice * l_discount
                           AS DECIMAL(18, 6))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE year(l_shipdate) = 1997
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", q6_oracle)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape (forecast revenue change): the pure predicate-pushdown
    aggregate — three range filters reach the parquet scan (min/max row-
    group pruning territory at 100 TB) and the single-row DECIMAL sum
    collapses map-side. No join, no data-sized shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.year("l_shipdate") == 1997)
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * F.col("l_discount")).cast(
                        "decimal(18,6)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
    )


# --- Q9: product-type profit (cost-proxy profit by nation/year) ------------

q9_oracle = """
SELECT n.n_name AS nation, CAST(year(l.l_shipdate) AS INT) AS yr,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - 0.6 * p.p_retailprice * l.l_quantity
                           AS DECIMAL(18, 6))), 2) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, yr
"""


@register("q9_product_profit", q9_oracle)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (product-type profit, adapted — no partsupp, so unit cost
    is proxied as 60% of p_retailprice): per supplier-nation per ship
    year, profit on red parts. The selective p_name LIKE filter pushes
    to the part scan and shrinks the broadcast; one fact-sized exchange
    for the (nation, yr) aggregate, DECIMAL accumulation throughout."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(n, s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("int").alias("yr"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


# --- Q10: returned-item losses (top-20 customers) --------------------------

q10_oracle = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(round(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                           AS DECIMAL(18, 6))), 2) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R' AND year(CAST(o.o_orderdate AS TIMESTAMP)) = 1997
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


@register("q10_returned_items", q10_oracle)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape (returned-item report): the 20 customers losing the most
    revenue to returns in one order year. Return-flag filter pushes to
    the fact scan; customer-keyed aggregate then top-20 via
    TakeOrderedAndProject on (rounded revenue, custkey)."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.year(F.col("o_orderdate").cast("timestamp")) == 1997
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- Q12: late-line priority mix (conditional aggregation) -----------------

q12_oracle = """
SELECT CAST(year(l.l_shipdate) AS INT) AS ship_yr,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS high_line_count,
       sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS low_line_count
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate > o.o_orderdate
GROUP BY ship_yr
"""


@register("q12_late_priority_mix", q12_oracle)
def q12_late_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipmode/priority mix, adapted — ship year stands in
    for the missing shipmode): for late-shipped lines, how many belong to
    high- vs low-priority orders, per ship year. The non-equi lateness
    predicate evaluates inside the join; both CASE branches come out of
    ONE conditional aggregate pass (the Q8 trick)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            o,
            (li.l_orderkey == o.o_orderkey)
            & (li.l_shipdate > o.o_orderdate),
        )
        .groupBy(F.year("l_shipdate").cast("int").alias("ship_yr"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --- Q14: promo revenue share (conditional / total ratio) ------------------

q14_oracle = """
SELECT CAST(round(
         100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                               THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                         AS DECIMAL(18, 6))
                               ELSE CAST(0 AS DECIMAL(18, 6)) END) AS DOUBLE)
         / CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18, 6))) AS DOUBLE),
       4) AS DOUBLE) AS promo_revenue_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE year(l.l_shipdate) = 1997
"""


@register("q14_promo_share", q14_oracle)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape (promotion effect): PROMO-part revenue as a percentage
    of total revenue in one ship year — numerator and denominator from
    ONE conditional aggregate (no second scan or self-join), both
    accumulated in exact DECIMAL and divided once as doubles."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.year("l_shipdate") == 1997
    ).select("l_partkey", "l_extendedprice", "l_discount")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    zero = F.lit(0).cast("decimal(18,6)")
    agg = li.join(p, li.l_partkey == p.p_partkey).agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).alias("promo"),
        F.sum(rev).alias("total"),
    )
    return agg.select(
        F.round(
            100.0 * F.col("promo").cast("double") / F.col("total").cast("double"),
            4,
        )
        .cast("double")
        .alias("promo_revenue_pct")
    )
