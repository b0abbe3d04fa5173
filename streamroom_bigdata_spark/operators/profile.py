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


# ---------------------------------------------------------------------------
# Count-min sketch (point-query frequency estimation)
# ---------------------------------------------------------------------------

#: sketch depth (independent hash rows) and width (buckets per row).
CMS_DEPTH = 4
CMS_WIDTH = 256

#: tokens whose frequency the registered query estimates (the point
#: queries); estimates are compared against the exact counts in-plan.
CMS_QUERY_TOKENS = ("join", "hash", "vector", "stream", "window", "spark")

_CMS_TOKENS_SQL = ", ".join(f"'{t}'" for t in CMS_QUERY_TOKENS)


def _cms_bucket_sql(expr: str, seed: int) -> str:
    from ..functions.hashing import sql_hash64

    seeded = f"concat('s{seed}:', {expr})"
    return f"({sql_hash64(seeded)} % {CMS_WIDTH})"


count_min_oracle = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), cells AS (
  SELECT u.seed,
         CASE u.seed
           {" ".join(f"WHEN {s} THEN {_cms_bucket_sql('tok', s)}" for s in range(CMS_DEPTH))}
         END AS bucket,
         count(*) AS cell
  FROM toks, (SELECT unnest([{", ".join(str(s) for s in range(CMS_DEPTH))}]) AS seed) u
  GROUP BY u.seed, bucket
), queries AS (
  SELECT q.tok, s.seed,
         CASE s.seed
           {" ".join(f"WHEN {s} THEN {_cms_bucket_sql('q.tok', s)}" for s in range(CMS_DEPTH))}
         END AS bucket
  FROM (SELECT unnest([{_CMS_TOKENS_SQL}]) AS tok) q,
       (SELECT unnest([{", ".join(str(s) for s in range(CMS_DEPTH))}]) AS seed) s
), est AS (
  SELECT q.tok, min(c.cell) AS est_count
  FROM queries q JOIN cells c ON c.seed = q.seed AND c.bucket = q.bucket
  GROUP BY q.tok
), truth AS (
  SELECT tok, count(*) AS true_count FROM toks
  WHERE tok IN ({_CMS_TOKENS_SQL})
  GROUP BY tok
)
SELECT t.tok, t.true_count, e.est_count,
       e.est_count - t.true_count AS overestimate
FROM truth t JOIN est e USING (tok)
"""


@register("count_min_tokens", count_min_oracle)
def count_min_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation over the token stream
    (Cormode/Muthukrishnan): DEPTH independent portable-hash rows of
    WIDTH counters; a point query reads one counter per row and takes the
    min — overestimate-only error bounded by ~2N/WIDTH with probability
    1 - 2^-DEPTH.

    The sketch is DETERMINISTIC given the hash family, so the whole
    operator (build + point queries + comparison against exact counts) is
    DuckDB-oracle-checkable — unlike HLL, whose estimator is engine-
    specific (that one is property-tested instead, see
    distinct_sketch_by_group).

    Scale: the build is one (seed, bucket)-keyed aggregate over the
    exploded tokens — map-side partials collapse every task's stream to
    <= DEPTH×WIDTH cells, the exchange carries only those partials, and
    the finished sketch is a 1024-row relation ANY stream size reduces
    to (the mergeability that makes it a streaming/pre-agg natural).
    Point queries broadcast-join the sketch."""
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))

    def bucket(col, seed: int):
        return F.pmod(
            portable_hash64(F.concat(F.lit(f"s{seed}:"), col)),
            F.lit(CMS_WIDTH),
        )

    seeded = toks.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        bucket(F.col("tok"), s).alias("bucket"),
                    )
                    for s in range(CMS_DEPTH)
                ]
            )
        ).alias("sb")
    ).select("sb.seed", "sb.bucket")
    cells = seeded.groupBy("seed", "bucket").agg(F.count("*").alias("cell"))

    q_rows = [
        (tok, s)
        for tok in CMS_QUERY_TOKENS
        for s in range(CMS_DEPTH)
    ]
    queries = docs.sparkSession.createDataFrame(
        q_rows, "tok string, seed int"
    )
    # per-seed bucket must use the row's own seed: branch via CASE
    bucket_expr = None
    for s in range(CMS_DEPTH):
        clause = bucket(F.col("tok"), s)
        bucket_expr = (
            F.when(F.col("seed") == s, clause)
            if bucket_expr is None
            else bucket_expr.when(F.col("seed") == s, clause)
        )
    queries = queries.select("tok", "seed", bucket_expr.alias("bucket"))

    est = (
        queries.join(cells, ["seed", "bucket"])
        .groupBy("tok")
        .agg(F.min("cell").alias("est_count"))
    )
    truth = (
        toks.filter(F.col("tok").isin(*CMS_QUERY_TOKENS))
        .groupBy("tok")
        .agg(F.count("*").alias("true_count"))
    )
    return truth.join(est, "tok").select(
        "tok",
        "true_count",
        "est_count",
        (F.col("est_count") - F.col("true_count")).alias("overestimate"),
    )


# ---------------------------------------------------------------------------
# Hash-partition balance diagnostic
# ---------------------------------------------------------------------------

from ..functions.hashing import sql_hash64  # noqa: E402

PB_BUCKETS = 32

partition_balance_oracle = f"""
WITH b AS (
  SELECT ({sql_hash64("CAST(l_orderkey AS VARCHAR)")} % {PB_BUCKETS}) AS bucket,
         count(*) AS n_rows
  FROM lineitem GROUP BY bucket
)
SELECT CAST(count(*) AS INT) AS n_buckets,
       CAST(min(n_rows) AS BIGINT) AS min_rows,
       CAST(max(n_rows) AS BIGINT) AS max_rows,
       round(avg(CAST(n_rows AS DOUBLE)), 4) AS avg_rows,
       round(CAST(max(n_rows) AS DOUBLE)
             / avg(CAST(n_rows AS DOUBLE)), 4) AS max_over_avg
FROM b
"""


@register("partition_balance", partition_balance_oracle)
def partition_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-space balance diagnostic: how evenly a candidate shuffle key
    spreads over PB_BUCKETS hash buckets — the question to ask BEFORE
    keying a 100 TB shuffle on a column (`max_over_avg` near 1.0 = safe;
    large = a hot key, reach for `functions/skew`). Uses the portable
    hash so the diagnostic itself is oracle-exact; Spark's real
    partitioner (murmur3) differs in constants but not in the balance
    this measures for a high-cardinality key. One bucket-sized aggregate
    + a single-row summary."""
    from ..functions.hashing import portable_hash64

    li = load_table(spark, sf_dir, "lineitem")
    b = li.groupBy(
        F.pmod(
            portable_hash64(F.col("l_orderkey").cast("string")),
            F.lit(PB_BUCKETS),
        ).alias("bucket")
    ).agg(F.count("*").alias("n_rows"))
    n = F.col("n_rows").cast("double")
    return b.agg(
        F.count("*").cast("int").alias("n_buckets"),
        F.min("n_rows").alias("min_rows"),
        F.max("n_rows").alias("max_rows"),
        F.round(F.avg(n), 4).alias("avg_rows"),
        F.round(F.max("n_rows").cast("double") / F.avg(n), 4).alias(
            "max_over_avg"
        ),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) sketch — cross-source corpus overlap
# ---------------------------------------------------------------------------

#: sketch size per source; estimator std-error ~ 1/sqrt(K)
KMV_K = 256


def _kmv_sql() -> str:
    from ..functions.hashing import sql_hash64

    from .dedup import SHINGLE_N, sql_shingles

    return f"""
WITH toks AS (
  SELECT doc_id, source, text, string_split(text, ' ') AS toks FROM documents
), expl AS (
  SELECT source, unnest({sql_shingles(SHINGLE_N)}) AS s FROM toks
), sh AS (
  SELECT DISTINCT source, {sql_hash64('s')} AS h FROM expl
), sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM sh
  ) WHERE rn <= {KMV_K}
), srcs AS (
  SELECT DISTINCT source FROM sk
), pairs AS (
  SELECT a.source AS sa, b.source AS sb
  FROM srcs a JOIN srcs b ON a.source < b.source
), u AS (
  SELECT p.sa, p.sb, s1.h FROM pairs p JOIN sk s1 ON s1.source = p.sa
  UNION
  SELECT p.sa, p.sb, s2.h FROM pairs p JOIN sk s2 ON s2.source = p.sb
), m AS (
  SELECT sa, sb, h FROM (
    SELECT sa, sb, h,
           row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn
    FROM u
  ) WHERE rn <= {KMV_K}
)
SELECT m.sa AS source_a, m.sb AS source_b,
       CAST(sum(CASE WHEN k1.h IS NOT NULL AND k2.h IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_in_sketch,
       round(sum(CASE WHEN k1.h IS NOT NULL AND k2.h IS NOT NULL
                      THEN 1 ELSE 0 END)::DOUBLE / count(*), 6) AS jaccard_est
FROM m
LEFT JOIN sk k1 ON k1.source = m.sa AND k1.h = m.h
LEFT JOIN sk k2 ON k2.source = m.sb AND k2.h = m.h
GROUP BY 1, 2
"""


@register("kmv_source_overlap", _kmv_sql())
def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source corpus overlap by KMV (k-minimum-values) sketch: each
    source's shingle-set is summarized by its KMV_K smallest portable
    shingle hashes, and for every source pair the Jaccard is estimated as
    |both-sketches ∩ merged-sketch| / |merged-sketch| — the data-governance
    question ("how much does the new crawl overlap what we have?") answered
    WITHOUT a corpus-sized pairwise compare, with std-error ~1/√K. When the
    true union is smaller than K the estimator degrades gracefully to the
    EXACT Jaccard (the merged sketch IS the union).

    Data-sized work = one distinct (source, shingle-hash) exchange plus a
    per-source bottom-K window; everything after the sketch is K·|sources|
    rows. At 100 TB the bottom-K window's per-source sort is the honest
    exact cost — the two-phase cheap path (per-partition K-smallest heap
    via mapPartitions, then merge) trades that for an extra tiny shuffle.
    Sketches are mergeable (min of mins), so per-shard sketches roll up —
    same property the HLL family above exploits."""
    from pyspark.sql import Window

    from .dedup import SHINGLE_N

    from ..functions.hashing import portable_hash64

    # explode-THEN-build-THEN-hash as flat codegen projections: shingle
    # strings assembled inside an F.transform lambda run INTERPRETED per
    # element (the round-1 perf trap exploded_shingles_of documents) —
    # measured here 57 s → 11 s cold at sf≈1 for the same result. The
    # global distinct on (source, h) subsumes shingle_col's per-doc
    # distinct; the sentinel -1 branch reproduces its short-doc whole-text
    # fallback, so the hash set is identical to the oracle's.
    n = SHINGLE_N
    toks = load_table(spark, sf_dir, "documents").select(
        "source", "text", F.split("text", " ").alias("toks")
    )
    idx = F.when(
        F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - n)
    ).otherwise(F.array(F.lit(-1)))
    s = F.when(
        F.col("i") >= 0,
        F.concat_ws(
            " ", *[F.element_at("toks", F.col("i") + j + 1) for j in range(n)]
        ),
    ).otherwise(F.col("text"))
    sh = (
        toks.select("source", "text", "toks", F.explode(idx).alias("i"))
        .select("source", portable_hash64(s).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        sh.select("source", "h", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= KMV_K)
        .select("source", "h")
    )
    # K·|sources| flat rows consumed by FIVE downstream subtrees (srcs,
    # both union branches, k1, k2): without materialization each consumer
    # re-runs the corpus-sized explode+distinct+window sketch build —
    # measured 5.5 s warm → 1.3 s with the cache at sf0.1. Flat schema, so
    # the nested-columnar cache trap (round-1 gotcha) doesn't apply; the
    # cached relation is sketch-sized at ANY corpus scale.
    sk = sk.cache()
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.alias("a")
        .join(srcs.alias("b"), F.col("a.source") < F.col("b.source"))
        .select(F.col("a.source").alias("sa"), F.col("b.source").alias("sb"))
    )
    s1 = sk.select(F.col("source").alias("sa"), "h")
    s2 = sk.select(F.col("source").alias("sb"), "h")
    u = (
        pairs.join(s1, "sa").select("sa", "sb", "h")
        .union(pairs.join(s2, "sb").select("sa", "sb", "h"))
        .distinct()
    )
    wm = Window.partitionBy("sa", "sb").orderBy("h")
    m = (
        u.select("sa", "sb", "h", F.row_number().over(wm).alias("rn"))
        .filter(F.col("rn") <= KMV_K)
        .drop("rn")
    )
    k1 = sk.select(F.col("source").alias("sa"), "h", F.lit(1).alias("in_a"))
    k2 = sk.select(F.col("source").alias("sb"), "h", F.lit(1).alias("in_b"))
    both = F.sum(
        F.when(F.col("in_a").isNotNull() & F.col("in_b").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        m.join(k1, ["sa", "h"], "left")
        .join(k2, ["sb", "h"], "left")
        .groupBy(F.col("sa").alias("source_a"), F.col("sb").alias("source_b"))
        .agg(
            both.cast("long").alias("n_shared_in_sketch"),
            F.round(both.cast("double") / F.count("*"), 6).alias("jaccard_est"),
        )
    )


# ---------------------------------------------------------------------------
# KMV cumulative distinct-user growth curve (round-10)
# ---------------------------------------------------------------------------

KMV_CUM_K = 128


def _kmv_cum_sql() -> str:
    from ..functions.hashing import sql_hash64

    h = sql_hash64("CAST(user_id AS VARCHAR)")
    return f"""
WITH fs AS MATERIALIZED (
  SELECT user_id, min(CAST(ts AS DATE)) AS first_seen, {h} AS h
  FROM events GROUP BY user_id
), days AS MATERIALIZED (
  SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
), sk AS MATERIALIZED (
  SELECT first_seen, h FROM (
    SELECT first_seen, h,
           row_number() OVER (PARTITION BY first_seen ORDER BY h) AS rn
    FROM fs
  ) WHERE rn <= {KMV_CUM_K}
), nd AS MATERIALIZED (
  SELECT first_seen, CAST(count(*) AS BIGINT) AS c FROM fs GROUP BY first_seen
), ex AS MATERIALIZED (
  SELECT d.day, CAST(sum(n.c) AS BIGINT) AS exact_users
  FROM days d JOIN nd n ON n.first_seen <= d.day GROUP BY d.day
), cum AS MATERIALIZED (
  SELECT d.day, s.h FROM days d JOIN sk s ON s.first_seen <= d.day
), kth AS MATERIALIZED (
  SELECT day, max(CASE WHEN rn = {KMV_CUM_K} THEN h END) AS hk
  FROM (
    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
    FROM cum
  ) GROUP BY day
)
SELECT e.day, e.exact_users,
       round(CASE WHEN e.exact_users < {KMV_CUM_K}
                  THEN CAST(e.exact_users AS DOUBLE)
                  ELSE ({KMV_CUM_K} - 1) * 1152921504606846976.0 / k.hk
             END, 2) AS kmv_estimate,
       round(abs(CASE WHEN e.exact_users < {KMV_CUM_K}
                      THEN CAST(e.exact_users AS DOUBLE)
                      ELSE ({KMV_CUM_K} - 1) * 1152921504606846976.0 / k.hk
                 END - e.exact_users) / e.exact_users, 4) AS rel_err
FROM ex e JOIN kth k ON k.day = e.day
"""


@register("kmv_daily_cumulative", _kmv_cum_sql())
def kmv_daily_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-users-to-date per day, estimated by a cumulative KMV
    sketch and compared against the exact count — the corpus-growth
    monitoring curve, and the MERGEABILITY demo: the per-day partial
    sketches (K smallest new-user hashes per first-seen day) union into
    each day's cumulative sketch, which is sound because a hash ranked
    past K within its own day is dominated by K smaller same-day hashes
    and can never enter the global K minimum. Nothing day-crossing is
    ever user-sized: the union is |days| × K rows and the exact curve is
    a |days|²-bounded cumulative count — the data-sized stages are one
    user groupBy and one first-seen-day count.

    Determinism: the portable 60-bit hash is engine-identical, ranks are
    integer, and the estimator (K-1)·2⁶⁰/h₍K₎ divides identical doubles;
    days whose cumulative count is under K report the exact count (the
    standard underfull-sketch convention)."""
    from pyspark.sql import Window

    from ..functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events")
    fs = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_seen")
    ).select(
        "first_seen",
        portable_hash64(F.col("user_id").cast("string")).alias("h"),
    )
    days = ev.select(F.to_date("ts").alias("day")).distinct()
    wday = Window.partitionBy("first_seen").orderBy("h")
    sk = (
        fs.withColumn("rn", F.row_number().over(wday))
        .filter(F.col("rn") <= KMV_CUM_K)
        .select("first_seen", "h")
    )
    nd = fs.groupBy("first_seen").agg(F.count("*").alias("c"))
    ex = (
        days.join(F.broadcast(nd), nd.first_seen <= days.day)
        .groupBy("day")
        .agg(F.sum("c").alias("exact_users"))
    )
    cum = days.join(F.broadcast(sk), sk.first_seen <= days.day).select(
        "day", "h"
    )
    wcum = Window.partitionBy("day").orderBy("h")
    kth = (
        cum.withColumn("rn", F.row_number().over(wcum))
        .groupBy("day")
        .agg(
            F.max(
                F.when(F.col("rn") == KMV_CUM_K, F.col("h"))
            ).alias("hk")
        )
    )
    est = F.when(
        F.col("exact_users") < KMV_CUM_K,
        F.col("exact_users").cast("double"),
    ).otherwise(
        (KMV_CUM_K - 1) * F.lit(1152921504606846976.0) / F.col("hk")
    )
    return ex.join(kth, "day").select(
        "day",
        "exact_users",
        F.round(est, 2).alias("kmv_estimate"),
        F.round(
            F.abs(est - F.col("exact_users")) / F.col("exact_users"), 4
        ).alias("rel_err"),
    )
