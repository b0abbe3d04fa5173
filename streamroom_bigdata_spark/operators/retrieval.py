"""Ranked retrieval over the documents corpus — BM25 keyword scoring and
reciprocal-rank-fusion hybrid search (keyword + embedding).

These are the retrieval primitives an LLM data pipeline runs next to its
dedup/curation stages (mining domain corpora, building eval sets, choosing
few-shot candidates). Reference parity: the reference engine has no ranked
retrieval; this follows the public BM25 (Robertson/Spärck Jones, the Lucene
practical formula) and RRF (Cormack/Clarke/Büttcher 2009).

Determinism across engines: every per-term partial score is produced by a
conditional aggregate (at most one non-null element), the document score is
a FIXED-ORDER sum of those partials, and rankings order by the ROUNDED
score with doc_id tiebreak — identical doubles from identical integers on
both engines, no float-reorder noise (the same discipline as the round-7
precision sweep).

Scale: tf is one (doc, term)-keyed aggregate over the exploded tokens of
query terms only (the `tok IN TERMS` filter cuts the explode to the posting
lists); df/avgdl are term-count- and 1-row-sized broadcasts; ranking is
TakeOrderedAndProject (distributed top-k, never a global window over the
corpus). RRF fuses the two top-K candidate LISTS (the standard formulation),
so its windows run over <= K rows — bounded and allowlisted.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.localdf import local_df
from ..registry import register
from ..sources import load_table

#: BM25 parameters (the Lucene defaults) and the fixed keyword query.
BM25_K1 = 1.2
BM25_B = 0.75
QUERY_TERMS = ("vector", "hash", "join")
BM25_TOPK = 50

#: RRF constant (Cormack et al.'s k=60) and per-modality candidate depth.
RRF_K = 60
RRF_CAND = 100
RRF_TOPK = 20

#: anchor embedding for the vector side of the hybrid query.
ANCHOR_VEC_ID = 0

_TERMS_SQL = ", ".join(f"'{t}'" for t in QUERY_TERMS)


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) for every document matching >= 1 query term."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("toks")
    )
    lens = docs.select("doc_id", F.size("toks").alias("dl"))
    glob = lens.agg(
        F.count("*").alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"),
    )
    tf = (
        docs.select("doc_id", F.explode("toks").alias("tok"))
        .filter(F.col("tok").isin(*QUERY_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n = F.col("n_docs").cast("double")
    idf = F.log(
        1.0 + (n - F.col("df") + 0.5) / (F.col("df") + 0.5)
    ).alias("idf")
    # df_t and glob are |terms|- and 1-row-sized at ANY corpus scale —
    # broadcast is structurally justified, not a stats guess
    scored_terms = (
        tf.join(lens, "doc_id")
        .join(F.broadcast(df_t), "tok")
        .join(F.broadcast(glob.select(F.col("avgdl"), F.col("n_docs"))))
        .withColumn("idf", idf)
        .withColumn(
            "s",
            F.col("idf")
            * (F.col("tf") * (BM25_K1 + 1.0))
            / (
                F.col("tf")
                + BM25_K1
                * (
                    1.0
                    - BM25_B
                    + BM25_B * F.col("dl").cast("double") / F.col("avgdl")
                )
            ),
        )
    )
    # fixed-order sum of per-term partials (each conditional max has at
    # most one non-null input) — engine-deterministic double arithmetic
    per_term = [
        F.max(F.when(F.col("tok") == t, F.col("s"))).alias(f"_s{i}")
        for i, t in enumerate(QUERY_TERMS)
    ]
    total: Column = F.lit(0.0)
    agg = scored_terms.groupBy("doc_id").agg(*per_term)
    for i in range(len(QUERY_TERMS)):
        total = total + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
    return agg.select("doc_id", total.alias("score"))


_BM25_SCORED_SQL = f"""
  WITH toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  ), lens AS (
    SELECT doc_id, len(toks) AS dl FROM toks
  ), gstats AS (
    SELECT count(*) AS n_docs, avg(CAST(dl AS DOUBLE)) AS avgdl FROM lens
  ), tf AS (
    SELECT doc_id, tok, count(*) AS tf
    FROM (SELECT doc_id, unnest(toks) AS tok FROM toks)
    WHERE tok IN ({_TERMS_SQL})
    GROUP BY doc_id, tok
  ), df_t AS (
    SELECT tok, count(*) AS df FROM tf GROUP BY tok
  ), st AS (
    SELECT tf.doc_id, tf.tok,
           ln(1.0 + (CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5))
             * (tf * ({BM25_K1} + 1.0))
             / (tf + {BM25_K1} * (1.0 - {BM25_B}
                + {BM25_B} * CAST(dl AS DOUBLE) / avgdl)) AS s
    FROM tf JOIN lens USING (doc_id) JOIN df_t USING (tok), gstats
  ), agg AS (
    SELECT doc_id,
           {", ".join(f"max(CASE WHEN tok = '{t}' THEN s END) AS _s{i}"
                      for i, t in enumerate(QUERY_TERMS))}
    FROM st GROUP BY doc_id
  )
  SELECT doc_id,
         {" + ".join(f"coalesce(_s{i}, 0.0)" for i in range(len(QUERY_TERMS)))}
           AS score
  FROM agg
"""

bm25_oracle = f"""
WITH scored AS ({_BM25_SCORED_SQL})
SELECT doc_id, round(score, 6) AS score
FROM scored
ORDER BY round(score, 6) DESC, doc_id
LIMIT {BM25_TOPK}
"""


@register("bm25_search", bm25_oracle)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k keyword retrieval for a fixed multi-term query. Plan:
    posting-list-sized tf aggregate, broadcast df/avgdl, fixed-order
    per-term score sum, TakeOrderedAndProject top-k — no global window,
    no full-corpus shuffle beyond the (doc, term) tf aggregate."""
    scored = _bm25_scored(spark, sf_dir)
    return (
        scored.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOPK)
    )


_COSINE_SQL = """
  list_dot_product(a.emb, q.emb)
    / (sqrt(list_dot_product(a.emb, a.emb))
       * sqrt(list_dot_product(q.emb, q.emb)))
"""

rrf_oracle = f"""
WITH corpus AS (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), q AS (
  SELECT emb FROM corpus WHERE vec_id = {ANCHOR_VEC_ID}
), vec_scored AS (
  SELECT a.vec_id AS doc_id, round({_COSINE_SQL}, 6) AS cos
  FROM corpus a, q
  WHERE a.vec_id <> {ANCHOR_VEC_ID}
), vec_top AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY cos DESC, doc_id) AS r_vec
  FROM vec_scored
  ORDER BY cos DESC, doc_id LIMIT {RRF_CAND}
), text_scored AS ({_BM25_SCORED_SQL}),
text_top AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS r_text
  FROM text_scored
  ORDER BY round(score, 6) DESC, doc_id LIMIT {RRF_CAND}
), fused AS (
  SELECT coalesce(t.doc_id, v.doc_id) AS doc_id,
         -- mirror the Spark side's DECIMAL(18,10) detour exactly so a
         -- double sitting ~5e-11 below a 6th-decimal half boundary is
         -- first snapped HALF_UP at the 10th decimal in BOTH engines
         round(CAST(coalesce(1.0 / ({RRF_K} + r_text), 0.0)
               + coalesce(1.0 / ({RRF_K} + r_vec), 0.0)
               AS DECIMAL(18,10)), 6) AS rrf_score
  FROM text_top t FULL OUTER JOIN vec_top v ON t.doc_id = v.doc_id
)
SELECT doc_id, rrf_score
FROM fused
ORDER BY rrf_score DESC, doc_id
LIMIT {RRF_TOPK}
"""


@register("rrf_hybrid_search", rrf_oracle)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank-fusion hybrid retrieval: fuse the BM25 top-100 and
    the embedding-cosine top-100 (vs the anchor vector) by
    sum(1/(60+rank)), the parameter-free fusion that wins TREC pools.

    Scale: both candidate lists come from TakeOrderedAndProject (each
    side's rounded score + doc_id tiebreak), so no corpus-sized window
    exists; rank assignment and the fusion join run over <= 100-row
    relations (the windows there are bounded — allowlisted in the plan
    audit). The cosine scan is one map stage over the embeddings."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    anchor = emb.filter(F.col("vec_id") == ANCHOR_VEC_ID).select(
        F.col("emb").alias("q_emb")
    )
    dot = F.aggregate(
        F.zip_with("emb", "q_emb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.zip_with(c, c, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    vec_scored = (
        emb.filter(F.col("vec_id") != ANCHOR_VEC_ID)
        .join(F.broadcast(anchor))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(dot / (nrm("emb") * nrm("q_emb")), 6).alias("cos"),
        )
    )
    vec_top = (
        vec_scored.orderBy(F.col("cos").desc(), "doc_id")
        .limit(RRF_CAND)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("cos").desc(), "doc_id"))
            .alias("r_vec"),
        )
    )
    text_top = (
        _bm25_scored(spark, sf_dir)
        .select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(RRF_CAND)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.col("score").desc(), "doc_id"))
            .alias("r_text"),
        )
    )
    fused = (
        text_top.join(vec_top, "doc_id", "full_outer")
        .select(
            "doc_id",
            # reciprocal-of-integer sums are terminating binaries that
            # can tie exactly at the 6th decimal (1/128 = .0078125) —
            # round via DECIMAL so both engines break the tie HALF_UP
            F.round(
                (
                    F.coalesce(1.0 / (RRF_K + F.col("r_text")), F.lit(0.0))
                    + F.coalesce(1.0 / (RRF_K + F.col("r_vec")), F.lit(0.0))
                ).cast("decimal(18,10)"),
                6,
            )
            .cast("double")
            .alias("rrf_score"),
        )
    )
    return fused.orderBy(F.col("rrf_score").desc(), "doc_id").limit(RRF_TOPK)


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance re-ranking of a cosine candidate pool
# ---------------------------------------------------------------------------

MMR_QUERY_ID = 0
MMR_CAND = 20  # candidate pool (exact top-k by cosine)
MMR_K = 10  # reranked results
MMR_LAMBDA = 0.7

_MMR_COS = """
  list_dot_product({a}.emb, {b}.emb)
    / (sqrt(list_dot_product({a}.emb, {a}.emb))
       * sqrt(list_dot_product({b}.emb, {b}.emb)))
"""


def _mmr_oracle() -> str:
    lam, oml = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    parts = [
        f"""
WITH corpus AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
), q AS (SELECT emb FROM corpus WHERE vec_id = {MMR_QUERY_ID}),
cand AS MATERIALIZED (
  SELECT c.vec_id, round({_MMR_COS.format(a='q', b='c')}, 6) AS rel, c.emb
  FROM corpus c, q WHERE c.vec_id <> {MMR_QUERY_ID}
  ORDER BY rel DESC, c.vec_id LIMIT {MMR_CAND}
), sim AS MATERIALIZED (
  SELECT a.vec_id AS a, b.vec_id AS b,
         round({_MMR_COS.format(a='a', b='b')}, 6) AS s
  FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
),
p1 AS MATERIALIZED (
  SELECT vec_id, rel, {lam!r} * rel AS score FROM cand
  ORDER BY score DESC, vec_id LIMIT 1
), sel1 AS (SELECT vec_id FROM p1)"""
    ]
    for k in range(2, MMR_K + 1):
        parts.append(
            f""", p{k} AS MATERIALIZED (
  SELECT c.vec_id, c.rel,
         {lam!r} * c.rel - {oml!r} * (
           SELECT max(s.s) FROM sim s
           WHERE s.a = c.vec_id AND s.b IN (SELECT vec_id FROM sel{k - 1})
         ) AS score
  FROM cand c WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{k - 1})
  ORDER BY score DESC, vec_id LIMIT 1
), sel{k} AS (
  SELECT vec_id FROM sel{k - 1} UNION ALL SELECT vec_id FROM p{k}
)"""
        )
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS mmr_rank, vec_id, rel AS relevance,"
        f" round(score, 6) AS mmr_score FROM p{k}"
        for k in range(1, MMR_K + 1)
    )
    parts.append("\n" + sel)
    return "".join(parts)


@register("mmr_rerank", _mmr_oracle())
def mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance (Carbonell-Goldstein) re-ranking of the
    exact cosine top-20 for one query: greedily pick argmax
    λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s) — the diversity-aware result
    list `cosine_topk` alone cannot give (its top-k around a dense query
    is near-duplicates of one answer; MMR trades relevance for coverage,
    λ=0.7). The retrieval-side cousin of `k_center_diversity` (pure
    diversity, no query).

    Determinism: rel and pairwise sims are quantized to 6 BEFORE the
    greedy (k-center convention); driver pairwise dots use SEQUENTIAL
    summation — the same operand order as DuckDB's list_dot_product —
    and ties break on min vec_id.

    Scale: the data-sized stage is ONE mapInPandas corpus scan + a
    top-20 aggregate (the cosine_topk shape); the greedy runs on the
    BOUNDED 20-row pool on the driver (documented bounded collect —
    20·(64+1) doubles), pairwise sims 20² driver floats. At 100 TB only
    the candidate scan grows."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    qvec = np.array(
        emb.filter(F.col("vec_id") == MMR_QUERY_ID).collect()[0]["emb"]
    )
    qn = float(np.sqrt((qvec * qvec).sum()))

    def score(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf["emb"].to_numpy())
            rel = x @ qvec / (np.sqrt((x * x).sum(axis=1)) * qn)
            rel = np.floor(np.abs(rel) * 1e6 + 0.5) / 1e6 * np.sign(rel)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "rel": rel})

    scored = emb.filter(F.col("vec_id") != MMR_QUERY_ID).mapInPandas(
        score,
        T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField("rel", T.DoubleType()),
            ]
        ),
    )
    # top-20 pool: a K-row sort-limit aggregate (Spark TakeOrdered), then
    # the bounded driver-side greedy
    pool_ids = [
        r.vec_id
        for r in scored.orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(MMR_CAND)
        .collect()
    ]
    pool = {
        r.vec_id: (r.rel, list(r.emb))
        for r in scored.join(
            emb, "vec_id"
        ).filter(F.col("vec_id").isin(pool_ids)).collect()
    }

    def sdot(a, b):  # sequential order == DuckDB list_dot_product
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    def r6(x):
        return math.floor(abs(x) * 1e6 + 0.5) / 1e6 * (1 if x >= 0 else -1)

    sims = {}
    for a in pool_ids:
        for b in pool_ids:
            if a != b:
                va, vb = pool[a][1], pool[b][1]
                sims[(a, b)] = r6(
                    sdot(va, vb)
                    / (math.sqrt(sdot(va, va)) * math.sqrt(sdot(vb, vb)))
                )
    selected: list[int] = []
    out = []
    lam, oml = MMR_LAMBDA, 1.0 - MMR_LAMBDA
    for rank in range(1, MMR_K + 1):
        best = None
        for d in pool_ids:
            if d in selected:
                continue
            pen = max(sims[(d, s)] for s in selected) if selected else 0.0
            sc = lam * pool[d][0] - oml * pen if selected else lam * pool[d][0]
            key = (-sc, d)
            if best is None or key < best[0]:
                best = (key, d, sc)
        _, d, sc = best
        selected.append(d)
        # r6, not Python round(): round() is half-to-even while the oracle's
        # DuckDB round and rel/sims use floor(|x|·1e6 + 0.5); 0.7·rel with
        # rel a 1e-6 multiple lands ON .0000005 boundaries for ~10% of values
        out.append((rank, int(d), float(pool[d][0]), r6(sc)))
    schema = T.StructType(
        [
            T.StructField("mmr_rank", T.IntegerType(), False),
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("relevance", T.DoubleType(), False),
            T.StructField("mmr_score", T.DoubleType(), False),
        ]
    )
    return local_df(spark, out, schema)

