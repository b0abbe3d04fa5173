"""Deterministic sampling operators for LLM-data pipelines (SURVEY.md §2.11).

Training-data curation needs REPRODUCIBLE samples: the same corpus must yield
the same subset on every run, engine, and cluster size — `rand()` sampling
can't promise that. Both operators key on the portable md5-prefix hash
(functions/hashing.py), so they are oracle-checkable in DuckDB and stable
under repartitioning, task retries, and engine swaps.

- ``bernoulli_sample``: keep a row iff hash(key) mod 100 < pct. One scan, no
  shuffle, no state — at 100 TB this is a pushed-down filter over the scan.
- ``stratified_sample``: exactly min(n, |stratum|) rows per stratum — the
  hash orders each stratum and a per-stratum window rank keeps the first n.
  One shuffle on the stratum key; the window's partial top-k keeps only n
  rows per partition before the final rank, so a giant stratum never
  materializes.
- ``sample_topk_hash``: exactly k rows global — ``orderBy(h).limit(k)``,
  which Catalyst rewrites to TakeOrderedAndProject (per-partition top-k +
  driver merge of k·P rows, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import (
    portable_hash64,
    portable_hash_mod,
    sql_hash64,
    sql_hash_mod,
)
from ..registry import register
from ..sources import load_table

SAMPLE_PCT = 10          # bernoulli: keep ~10% of documents
STRATUM_N = 25           # stratified: rows kept per (lang, source) stratum
GLOBAL_K = 100           # top-k-hash: exact global sample size

_KEY = "CAST(doc_id AS VARCHAR)"


bernoulli_sample_oracle = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {sql_hash_mod(_KEY, 100)} < {SAMPLE_PCT}
"""


@register("bernoulli_sample", bernoulli_sample_oracle)
def bernoulli_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~SAMPLE_PCT% Bernoulli sample keyed on doc_id — a pure
    filter (no shuffle); reproducible across runs/engines/cluster sizes,
    unlike ``df.sample()``."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        portable_hash_mod(F.col("doc_id").cast("string"), 100) < SAMPLE_PCT
    ).select("doc_id", "lang", "source", "n_chars")


stratified_sample_oracle = f"""
SELECT lang, source, doc_id
FROM (
  SELECT lang, source, doc_id,
         row_number() OVER (
           PARTITION BY lang, source
           ORDER BY {sql_hash_mod(_KEY)}, doc_id
         ) AS rnk
  FROM documents
)
WHERE rnk <= {STRATUM_N}
"""


@register("stratified_sample", stratified_sample_oracle)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly min(STRATUM_N, |stratum|) docs per (lang, source) stratum:
    hash-ordered window rank within each stratum. One shuffle on the stratum
    key; the rank's partial top-k bounds per-partition state to STRATUM_N
    rows per stratum."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        portable_hash_mod(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= STRATUM_N)
        .select("lang", "source", "doc_id")
    )


sample_topk_hash_oracle = f"""
SELECT doc_id, lang, source
FROM documents
ORDER BY {sql_hash_mod(_KEY)}, doc_id
LIMIT {GLOBAL_K}
"""


@register("sample_topk_hash", sample_topk_hash_oracle)
def sample_topk_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size global deterministic sample: the GLOBAL_K smallest hashes.
    orderBy+limit → TakeOrderedAndProject: each partition keeps k rows, the
    driver merges k·P — no global sort, no single-partition exchange."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            portable_hash_mod(F.col("doc_id").cast("string")).alias("_h"),
        )
        .orderBy("_h", "doc_id")
        .limit(GLOBAL_K)
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (round-7): A-ES / Efraimidis-
# Spirakis — key_i = u_i^(1/w_i) with u_i a deterministic uniform, top-k
# by key. Inclusion probability scales with weight; the whole draw is one
# TakeOrderedAndProject over per-row arithmetic, so it is reproducible
# across runs/engines/cluster sizes like every sampler here.
# ---------------------------------------------------------------------------

WEIGHTED_K = 100
_U_MOD = 1 << 30  # uniform resolution; (h mod M + 1) / (M + 1) ∈ (0, 1]

weighted_sample_oracle = f"""
WITH keyed AS (
  SELECT o_orderkey, o_custkey, o_totalprice,
         pow(({sql_hash_mod('CAST(o_orderkey AS VARCHAR)', _U_MOD)} + 1.0)
             / {_U_MOD + 1}.0,
             1.0 / o_totalprice) AS es_key
  FROM orders
  WHERE o_totalprice > 0.0
)
SELECT o_orderkey, o_custkey, o_totalprice, round(es_key, 10) AS es_key
FROM keyed
ORDER BY es_key DESC, o_orderkey
LIMIT {WEIGHTED_K}
"""


@register("weighted_sample", weighted_sample_oracle)
def weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{WEIGHTED_K} weighted sample of orders, weight ∝ o_totalprice
    (A-ES): P(inclusion) rises with weight, no replacement, and the draw
    is a pure function of the data — the deterministic uniform comes from
    the portable hash, so the SAME rows are drawn on any engine or
    cluster layout. Plan: per-row pow + TakeOrderedAndProject (partial
    top-k per partition, k·P-row driver merge — no full sort at 100 TB)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 0.0
    )
    u = (
        portable_hash_mod(F.col("o_orderkey").cast("string"), _U_MOD) + 1.0
    ) / float(_U_MOD + 1)
    es_key = F.pow(u, 1.0 / F.col("o_totalprice"))
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.round(es_key, 10).alias("es_key"),
        )
        .orderBy(F.desc("es_key"), "o_orderkey")
        .limit(WEIGHTED_K)
    )


# ---------------------------------------------------------------------------
# Sampled quantiles (the deterministic-sample scale path for percentiles)
# ---------------------------------------------------------------------------

SQ_SAMPLE_MOD = 10  # keep hash(key) % 10 == 0 → deterministic ~10% sample
SQ_PCTS = (0.25, 0.5, 0.75, 0.95, 0.99)

_SQ_KEY = "concat(CAST(l_orderkey AS VARCHAR), ':', CAST(l_linenumber AS VARCHAR))"

sampled_quantiles_oracle = f"""
WITH s AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DOUBLE) AS price
  FROM lineitem
  WHERE {sql_hash_mod(_SQ_KEY, SQ_SAMPLE_MOD)} = 0
)
SELECT l_returnflag,
       count(*) AS n_sampled,
       {", ".join(
           f"round(quantile_cont(price, {p}), 2) AS p{int(p * 100)}"
           for p in SQ_PCTS
       )}
FROM s GROUP BY l_returnflag
"""


@register("sampled_quantiles", sampled_quantiles_oracle)
def sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles over a DETERMINISTIC hash sample — the third quantile
    strategy next to the exact sort-based percentile (`quantile_summary`)
    and the GK sketch (percentile_approx, property-tested): sample with
    the portable hash (reproducible across engines/cluster sizes/retries,
    unlike rand()), then run the exact interpolated percentile on the
    sample. At 100 TB the sample filter is pushed into the scan and the
    exact percentile sorts 1/mod of the data — the classic trade when a
    sketch's rank guarantee isn't portable but a seeded sample's is.
    Sampling error vs the full-data quantiles is property-tested
    (tests/test_wave3.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    s = li.filter(portable_hash_mod(key, SQ_SAMPLE_MOD) == 0).select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("price")
    )
    pcts = F.array(*[F.lit(p) for p in SQ_PCTS])
    agg = s.groupBy("l_returnflag").agg(
        F.count("*").alias("n_sampled"),
        F.percentile("price", pcts).alias("qs"),
    )
    return agg.select(
        "l_returnflag",
        "n_sampled",
        *[
            F.round(F.col("qs")[i], 2).alias(f"p{int(p * 100)}")
            for i, p in enumerate(SQ_PCTS)
        ],
    )


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (training-data ordering)
# ---------------------------------------------------------------------------

#: shards per epoch — at 100 TB this would be O(10k) so each shard's window
#: partition holds ~corpus/N_SHARDS rows and shards map 1:1 to output files
EPOCH_SHARDS = 8
#: epoch seed folded into the hash: changing it re-deals every document to a
#: new (shard, position) without any RNG state
EPOCH_SEED = "epoch-1"

_EPOCH_KEY = f"concat(CAST(doc_id AS VARCHAR), '|{EPOCH_SEED}')"

epoch_shard_order_oracle = f"""
WITH h AS (
  SELECT doc_id, {sql_hash64(_EPOCH_KEY)} AS h FROM documents
)
SELECT doc_id,
       h % {EPOCH_SHARDS} AS shard,
       CAST(row_number() OVER (
              PARTITION BY h % {EPOCH_SHARDS} ORDER BY h, doc_id
            ) AS BIGINT) AS pos
FROM h
"""


@register("epoch_shard_order", epoch_shard_order_oracle)
def epoch_shard_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for a training epoch: every document
    gets a (shard, position) from the portable hash of (doc_id, epoch seed)
    — the exact order a data loader would stream, reproducible across runs,
    engines, and cluster sizes, with NO RNG state to coordinate. Changing
    ``EPOCH_SEED`` re-deals the whole corpus (a fresh permutation per
    epoch); a seeded ``rand()`` cannot promise that under repartitioning or
    task retries.

    Plan: one codegen hash projection → one shuffle on ``shard`` → per-shard
    window ``row_number`` ordered by (hash, doc_id). Shards are the unit of
    parallelism AND the output layout (shard = output file), so at 100 TB
    EPOCH_SHARDS is set O(10k) to bound each window partition at
    corpus/N_SHARDS rows; no global sort is ever paid. Reference has no
    ordering operator (435-LoC scope, SURVEY §0)."""
    h = portable_hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit(f"|{EPOCH_SEED}"))
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", h.alias("h"), F.pmod(h, F.lit(EPOCH_SHARDS)).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return docs.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# Contiguous global IDs without a global sort
# ---------------------------------------------------------------------------

GID_SHARDS = 8
_GID_KEY = "concat(CAST(doc_id AS VARCHAR), '|gid')"

contiguous_global_ids_oracle = f"""
WITH h AS (
  SELECT doc_id, {sql_hash64(_GID_KEY)} AS h FROM documents
)
SELECT doc_id,
       h % {GID_SHARDS} AS shard,
       CAST(row_number() OVER (ORDER BY h % {GID_SHARDS}, h, doc_id)
            AS BIGINT) AS global_id
FROM h
"""


@register("contiguous_global_ids", contiguous_global_ids_oracle)
def contiguous_global_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense 1..N global sample numbering WITHOUT a global sort — the
    classic at-scale replacement for `row_number() OVER (ORDER BY ...)`
    (single-partition funnel) and `monotonically_increasing_id` (gaps):
    hash-shard the rows, number within each shard, then add each shard's
    cumulative offset computed from a GID_SHARDS-row count table. The
    oracle states the SEMANTICS as the naive global row_number; the plan
    never materializes that sort.

    Offsets come from a tiny shard×shard triangular self-join (≤ S² rows)
    instead of an unpartitioned window, so no stage — not even a
    bounded-input one — funnels through one partition. At 100 TB:
    S=O(10k) shards bounds every per-shard window at corpus/S rows, the
    offset table stays thousands of rows, and the whole numbering costs
    one shard shuffle + one broadcast join."""
    h = portable_hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit("|gid"))
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", h.alias("h"), F.pmod(h, F.lit(GID_SHARDS)).alias("shard")
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    numbered = docs.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )
    cnts = docs.groupBy("shard").agg(F.count("*").alias("cnt"))
    a = cnts.select(F.col("shard"), F.col("cnt"))
    b = cnts.select(
        F.col("shard").alias("b_shard"), F.col("cnt").alias("b_cnt")
    )
    offsets = (
        a.join(b, F.col("b_shard") < F.col("shard"), "left")
        .groupBy("shard")
        .agg(F.coalesce(F.sum("b_cnt"), F.lit(0)).alias("offset"))
    )
    return numbered.join(F.broadcast(offsets), "shard").select(
        "doc_id",
        "shard",
        (F.col("offset") + F.col("pos")).alias("global_id"),
    )


# ---------------------------------------------------------------------------
# Hash-based negative sampling (round-11): training-pair generation
# ---------------------------------------------------------------------------

#: negative candidates drawn per customer
NEG_SAMPLES_K = 3


def _negative_sampling_sql() -> str:
    from ..functions.hashing import sql_hash64

    h = sql_hash64(f"concat(CAST(p.o_custkey AS VARCHAR), '|neg', "
                   f"CAST(k.k AS VARCHAR))")
    return f"""
WITH pos AS (
  SELECT DISTINCT o.o_custkey, l.l_partkey
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
), custs AS (
  SELECT DISTINCT o_custkey FROM pos
), np AS (
  SELECT CAST(count(*) AS BIGINT) AS n_parts FROM part
), cand AS (
  SELECT p.o_custkey, k.k,
         ({h}) % np.n_parts + 1 AS neg_partkey
  FROM custs p, (SELECT unnest(range(0, {NEG_SAMPLES_K})) AS k) k, np
)
SELECT c.o_custkey, CAST(c.k AS INT) AS k, c.neg_partkey
FROM cand c
LEFT JOIN pos ON pos.o_custkey = c.o_custkey
            AND pos.l_partkey = c.neg_partkey
WHERE pos.l_partkey IS NULL
"""


@register("negative_sampling_pairs", _negative_sampling_sql())
def negative_sampling_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for training-pair generation: for
    every customer with purchase history, NEG_SAMPLES_K candidate
    part keys drawn by salted portable hash over the part-key space, with
    candidates that collide with the customer's ACTUAL purchases dropped
    by anti-join — the (user, positive, negatives) triple a ranking/
    recommendation trainer consumes, with the reproducibility property
    random sampling lacks (same corpus → same negatives, any cluster
    size, any partitioning).

    Scale shape: positives are one distinct (cust, part) exchange;
    candidates are |custs|×K rows built from a 1-row part-count
    broadcast; the rejection is one key-partitioned LEFT ANTI join on
    exactly the candidate key. Collision losses are ~|positives per
    user| / |parts| — report-side, a trainer resamples k+K if it needs
    exact-K."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pos = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    custs = pos.select("o_custkey").distinct()
    np_ = part.agg(F.count("*").alias("n_parts"))
    ks = spark.range(NEG_SAMPLES_K).select(F.col("id").cast("int").alias("k"))
    h = portable_hash64(
        F.concat(
            F.col("o_custkey").cast("string"),
            F.lit("|neg"),
            F.col("k").cast("string"),
        )
    )
    cand = (
        custs.join(F.broadcast(ks))
        .crossJoin(F.broadcast(np_))
        .select(
            "o_custkey",
            "k",
            (F.pmod(h, F.col("n_parts")) + 1).alias("neg_partkey"),
        )
    )
    # Explicit aliases on BOTH sides: cand derives its o_custkey lineage
    # from pos (custs = pos.select(...).distinct()), so the attribute
    # spelling cand.o_custkey == pos.o_custkey triggers Spark's
    # "trivially true equals predicate" warning and leans on dataset-id
    # disambiguation — correct today, but the one construction a Spark
    # upgrade could silently re-resolve. Aliased qualifiers are
    # unambiguous by name.
    c = cand.alias("c")
    p = pos.alias("p")
    return c.join(
        p,
        (F.col("c.o_custkey") == F.col("p.o_custkey"))
        & (F.col("c.neg_partkey") == F.col("p.l_partkey")),
        "left_anti",
    ).select("c.o_custkey", "c.k", "c.neg_partkey")


# ---------------------------------------------------------------------------
# Group-aware k-fold assignment (no customer straddles two folds)
# ---------------------------------------------------------------------------

KFOLD_K = 5
_KF_KEY = "concat('kf:', CAST(o_custkey AS VARCHAR))"

group_kfold_oracle = f"""
WITH assigned AS (
  SELECT o_custkey,
         CAST({sql_hash64(_KF_KEY)} % {KFOLD_K} AS INT) AS fold,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
)
SELECT fold,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM assigned GROUP BY fold
"""


@register("group_kfold_assign", group_kfold_oracle)
def group_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware k-fold split: every order lands in the fold of ITS
    CUSTOMER (fold = salted portable hash of custkey mod K), so no
    customer's history straddles train and validation — the leakage
    hygiene `train_val_split` (row-level) cannot give when rows of one
    entity correlate. Same-corpus determinism at any cluster size /
    partitioning (the `negative_sampling_pairs` reproducibility
    property); the per-fold balance table (customers, orders, revenue)
    is the skew audit run before trusting the split.

    Shape: fold assignment is per-row hash algebra in codegen; ONE
    combinable fold aggregate (K groups, count-distinct via partial
    sets bounded by |customers|). Exact integers everywhere."""
    orders = load_table(spark, sf_dir, "orders")
    assigned = orders.select(
        "o_custkey",
        F.pmod(
            portable_hash64(
                F.concat(F.lit("kf:"), F.col("o_custkey").cast("string"))
            ),
            F.lit(KFOLD_K),
        )
        .cast("int")
        .alias("fold"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    return assigned.groupBy("fold").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    )

# ---------------------------------------------------------------------------
# Weighted reservoir sampling without replacement (Efraimidis-Spirakis)
# ---------------------------------------------------------------------------

WRS_K = 100
_WRS_U_MOD = 1_000_000


def _wrs_oracle() -> str:
    from ..functions.hashing import sql_hash64

    key = "concat('wr:', CAST(doc_id AS VARCHAR))"
    u = f"(({sql_hash64(key)} % {_WRS_U_MOD}) + 0.5) / {_WRS_U_MOD}.0"
    return f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         round(ln({u}) / n_chars, 8) AS log_key
  FROM documents WHERE n_chars > 0
)
SELECT doc_id, n_chars, log_key,
       CAST(row_number() OVER (ORDER BY log_key DESC, doc_id) AS INT)
         AS sample_rank
FROM keyed
ORDER BY log_key DESC, doc_id
LIMIT {WRS_K}
"""


@register("weighted_reservoir_sample", _wrs_oracle())
def weighted_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-Res):
    each document draws key u^(1/w) from a salted-hash uniform u and
    weight w = n_chars; the top-K keys are the sample — inclusion
    probability proportional to weight, no replacement, and (unlike
    `weighted_sample`'s with-replacement draw) no document twice. The
    log-key spelling ln(u)/w avoids pow() underflow at large weights;
    keys are ROUNDED to 8 before the top-K boundary (the rake_keywords
    ulp rule) with doc_id tie-break. Deterministic at any partitioning —
    the same-corpus-same-sample property the k-fold/negative-sampling
    family shares.

    Shape: per-row hash algebra in codegen + ONE top-K TakeOrdered
    (K-bounded at any scale); nothing else moves."""
    from ..functions.hashing import portable_hash64

    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    u = (
        F.pmod(
            portable_hash64(
                F.concat(F.lit("wr:"), F.col("doc_id").cast("string"))
            ),
            F.lit(_WRS_U_MOD),
        )
        + 0.5
    ) / float(_WRS_U_MOD)
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.round(F.log(u) / F.col("n_chars"), 8).alias("log_key"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("log_key"), F.asc("doc_id"))
    return (
        keyed.orderBy(F.desc("log_key"), F.asc("doc_id"))
        .limit(WRS_K)
        .withColumn("sample_rank", F.row_number().over(w).cast("int"))
    )
