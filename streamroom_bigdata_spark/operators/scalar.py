"""Scalar function surface (SURVEY.md §2.8).

Reference-observed functions (F1-F11: concat/trim/lower/split/contains/
date-format/pow/sqrt/arithmetic/json/cast) plus the [EXT] surface mandated
for the fixtures: date parts, math, string/regex, JSON extraction, null
handling. All built-in ``pyspark.sql.functions`` — JVM-side, whole-stage
codegen, no Python in the data path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table


@register(
    "date_functions",
    """
    SELECT CAST(year(o_orderdate) AS INT)    AS order_year,
           CAST(month(o_orderdate) AS INT)   AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           count(*)                          AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_price,
           CAST(min(day(o_orderdate)) AS INT)   AS first_dom,
           CAST(max(dayofyear(o_orderdate)) AS INT) AS last_doy
    FROM orders
    GROUP BY 1, 2, 3
    """,
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction + grouping (F6 [EXT]): year/month/quarter/day/
    dayofyear on the order date."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.quarter("o_orderdate").alias("order_quarter"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).alias("total_price"),
            F.min(F.dayofmonth("o_orderdate")).alias("first_dom"),
            F.max(F.dayofyear("o_orderdate")).alias("last_doy"),
        )
    )


@register(
    "date_trunc_buckets",
    """
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month,
           count(*) AS n_shipments,
           round(sum(l_quantity), 2) AS qty,
           CAST(max(datediff('day', date_trunc('month', l_shipdate), l_shipdate))
                AS INT) AS max_day_offset
    FROM lineitem
    GROUP BY 1
    """,
)
def date_trunc_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc bucketing + datediff (F6 [EXT]) — calendar-month rollup of
    shipments."""
    li = load_table(spark, sf_dir, "lineitem")
    month = F.date_trunc("month", "l_shipdate")
    return (
        li.groupBy(month.alias("ship_month"))
        .agg(
            F.count("*").alias("n_shipments"),
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.max(
                F.datediff(F.col("l_shipdate"), F.date_trunc("month", "l_shipdate"))
            ).alias("max_day_offset"),
        )
    )


@register(
    "string_functions",
    """
    SELECT upper(p_brand) AS brand_upper,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           count(*) AS n,
           CAST(max(length(p_name)) AS INT) AS max_name_len,
           CAST(sum(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_widgets,
           min(substring(p_name, 1, 3)) AS min_prefix
    FROM part
    GROUP BY 1, 2
    """,
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String surface (F2-F5 [EXT]): upper, regexp_extract, length, LIKE,
    substring."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(
            F.upper("p_brand").alias("brand_upper"),
            F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        )
        .agg(
            F.count("*").alias("n"),
            F.max(F.length("p_name")).alias("max_name_len"),
            F.sum(
                F.when(F.col("p_name").like("%widget%"), 1).otherwise(0)
            ).cast("bigint").alias("n_widgets"),
            F.min(F.substring("p_name", 1, 3)).alias("min_prefix"),
        )
    )


@register(
    "split_concat",
    """
    SELECT string_split(p_name, ' ')[1] AS first_word,
           concat(p_brand, ':', p_type) AS brand_type,
           count(*) AS n
    FROM part
    GROUP BY 1, 2
    """,
)
def split_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + element access + concat (F1/F5) — the reference's CSV
    line.split(';') parse shape (producer.scala:82) as column expressions."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.groupBy(
            F.split("p_name", " ").getItem(0).alias("first_word"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        )
        .agg(F.count("*").alias("n"))
    )


@register(
    "json_extraction",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
           CAST(max(CAST(json_extract(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from a string column (F10 [EXT]) — the same
    from_json/get_json_object primitive the reference's wire format relies on
    (consumer.scala:53)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).cast("bigint").alias("sum_k"),
        F.max(k).alias("max_k"),
    )


@register(
    "variant_extraction",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INT) AS k_val,
           CAST(json_extract(props, '$.missing') AS INT) AS missing_val
    FROM events
    """,
)
def variant_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VariantType (F10 [EXT]):
    ``parse_json`` decodes the JSON string ONCE into the binary variant
    encoding; ``variant_get`` then path-extracts without re-parsing — the
    scale answer to repeated ``get_json_object`` calls, each of which
    re-parses the string. Missing paths yield null (``try_variant_get``),
    matching SQL JSON-path semantics in the DuckDB oracle."""
    events = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return events.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k_val"),
        F.try_variant_get(v, "$.missing", "int").alias("missing_val"),
    )


@register(
    "math_functions",
    """
    SELECT l_linenumber,
           round(avg(abs(l_discount - l_tax)), 6) AS avg_abs_diff,
           round(sum(ln(l_extendedprice)), 4) AS sum_log_price,
           round(max(power(l_quantity, 2)), 2) AS max_qty_sq,
           CAST(min(ceil(l_extendedprice / 1000)) AS DOUBLE) AS min_price_k,
           CAST(max(floor(l_extendedprice / 1000)) AS DOUBLE) AS max_price_k
    FROM lineitem
    GROUP BY l_linenumber
    """,
)
def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math surface (F7-F9 [EXT]): abs/ln/pow/ceil/floor + arithmetic."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linenumber").agg(
        F.round(F.avg(F.abs(F.col("l_discount") - F.col("l_tax"))), 6).alias(
            "avg_abs_diff"
        ),
        F.round(F.sum(F.log(F.col("l_extendedprice"))), 4).alias("sum_log_price"),
        F.round(F.max(F.pow("l_quantity", F.lit(2))), 2).alias("max_qty_sq"),
        F.min(F.ceil(F.col("l_extendedprice") / 1000)).cast("double").alias(
            "min_price_k"
        ),
        F.max(F.floor(F.col("l_extendedprice") / 1000)).cast("double").alias(
            "max_price_k"
        ),
    )


@register(
    "null_handling",
    """
    SELECT next_type,
           count(*) AS n,
           CAST(sum(CASE WHEN next_type IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null
    FROM (
      SELECT coalesce(lead(event_type) OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ), 'END') AS next_type
      FROM events
    )
    GROUP BY next_type
    """,
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce / isNull handling (P6 [EXT]) over a window-produced null."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.coalesce(F.lead("event_type").over(w), F.lit("END")).alias(
                "next_type"
            )
        )
        .groupBy("next_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("next_type").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
        )
    )


@register(
    "cast_projection",
    """
    SELECT CAST(floor(o_totalprice) AS BIGINT) AS price_int,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS date_str
    FROM orders
    WHERE o_totalprice > 450000
    """,
)
def cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit casts in projection (P1/P2/F11) — the reference's
    string→int Mongo-read casts (processing.scala:33-54)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_totalprice") > 450000).select(
        F.floor("o_totalprice").cast("bigint").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderdate").cast("date").cast("string").alias("date_str"),
    )


@register(
    "array_functions",
    """
    SELECT doc_id,
           array_to_string(
             list_sort(list_distinct(string_split(text, ' ')))[1:5], ' '
           ) AS first_toks,
           CAST(len(string_split(text, ' ')) AS INT) AS n_toks,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           list_sort(list_distinct(string_split(text, ' ')))[
             len(list_distinct(string_split(text, ' ')))] AS max_tok
    FROM documents
    """,
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/list scalar surface (F-EXT): distinct, sort, slice, contains,
    element_at — all built-in array expressions over tokenized text.

    The slice result is re-joined to a string because the driver's value
    comparator canonicalizes through pandas, which cannot hash raw
    ``array<string>`` cells — every registered query must emit scalar
    columns only."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    uniq_sorted = F.array_sort(F.array_distinct(toks))
    return docs.select(
        "doc_id",
        F.array_join(F.slice(uniq_sorted, 1, 5), " ").alias("first_toks"),
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(uniq_sorted, F.size(uniq_sorted)).alias("max_tok"),
    )


@register(
    "try_cast_surface",
    """
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
           TRY_CAST(event_type AS INT) AS type_as_int,
           coalesce(TRY_CAST(json_extract_string(props, '$.k') AS INT), -1)
             AS k_or_default
    FROM events
    """,
)
def try_cast_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe casting surface (F11-EXT): Spark 4 runs ANSI mode, where a
    bad cast RAISES — try_cast is the null-on-failure escape hatch, here
    over JSON-extracted fields (numeric payload parses; the event_type
    string never does)."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return events.select(
        "event_id",
        k.alias("k_int"),
        F.col("event_type").try_cast("int").alias("type_as_int"),
        F.coalesce(k, F.lit(-1)).alias("k_or_default"),
    )


props_map_oracle = """
WITH kv AS (
  SELECT event_type, k,
         CAST(json_extract_string(props, '$.' || k) AS BIGINT) AS v
  FROM (
    SELECT event_type, props, unnest(json_keys(props)) AS k FROM events
  )
)
SELECT event_type, k AS prop_key,
       count(*) AS n,
       round(CAST(sum(v) AS DOUBLE) / count(*), 4) AS avg_value
FROM kv
GROUP BY event_type, k
"""


@register("props_map_explode", props_map_oracle)
def props_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (F10 completion): parse the props JSON into a
    ``map<string,string>``, EXPLODE it into (key, value) rows — generic
    over whatever keys appear — and aggregate per (event_type, key). The
    oracle explodes the same maps via json_keys + json_extract_string
    (DuckDB has no json_each table function). Integer value sums keep the
    average exact and order-independent."""
    events = load_table(spark, sf_dir, "events")
    kv = events.select(
        "event_type",
        F.explode(
            F.from_json("props", "map<string,string>")
        ).alias("prop_key", "v"),
    )
    return kv.groupBy("event_type", "prop_key").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("v").cast("bigint")).cast("double") / F.count("*"), 4
        ).alias("avg_value"),
    )


hof_surface_oracle = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0.0)) AS INT) AS n_pos,
       round(CAST(list_aggregate(
           list_transform(embedding, x -> abs(CAST(x AS DOUBLE))), 'sum'
       ) AS DOUBLE), 4) AS l1_norm,
       round(CAST(list_aggregate(
           list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0), 'sum'
       ) AS DOUBLE), 4) AS doubled_sum
FROM embeddings
WHERE vec_id < 200
"""


@register("hof_surface", hof_surface_oracle)
def hof_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function surface (F-EXT): transform / filter /
    aggregate lambdas over the embedding arrays — the declarative
    array-algebra door (Spark HOFs ≡ DuckDB list_* lambdas). Folds run in
    ARRAY order on both engines, so the float sums are deterministic
    without decimal tricks (unlike group aggregates, whose partial order
    is engine-chosen). HOF lambdas evaluate interpreted per element —
    fine on this cold path; the hot-path vector math lives in
    functions/vector.py as codegen column algebra (BASELINE.md round-2
    scorer decision)."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return emb.select(
        "vec_id",
        F.size(
            F.filter("embedding", lambda e: e > 0.0)
        ).alias("n_pos"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda e: F.abs(e.cast("double"))),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ),
            4,
        ).alias("l1_norm"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda e: e.cast("double") * 2.0),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ),
            4,
        ).alias("doubled_sum"),
    )


# --- LISTAGG / string_agg surface -------------------------------------------

listagg_oracle = """
SELECT n.n_name,
       string_agg(s.s_name, ',' ORDER BY s.s_name) AS supplier_csv,
       count(*) AS n_suppliers
FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY n.n_name
"""


@register("listagg_suppliers", listagg_oracle)
def listagg_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg parity: per-nation CSV of supplier names in a
    DETERMINISTIC order. collect_list's element order is partition-arrival
    order (nondeterministic under retries/AQE), so the portable spelling
    sorts the collected array before joining — same contract as SQL's
    string_agg(... ORDER BY). Group state is bounded by suppliers-per-
    nation; for unbounded groups prefer exploded rows over giant strings."""
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_list("s_name"))).alias(
                "supplier_csv"
            ),
            F.count("*").alias("n_suppliers"),
        )
    )
