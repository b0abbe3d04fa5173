"""Distributed k-means (Lloyd's) over the embeddings table — the ML
clustering primitive of an LLM-data pipeline (corpus topic bucketing, IVF
codebook training, SemDeDup's cluster stage), with an EXACT cross-engine
oracle.

Determinism design (what makes a float-iterative algorithm hash-checkable):
- fixed init: centroids 0..K-1 are the embeddings of vec_id 0..K-1;
- every per-(vector, centroid) distance is an identical fold in both
  engines (same long-format join, same multiply), ROUNDED to 6 dp before
  the argmin, so partial-aggregation reorder noise (~1e-13) can't flip an
  assignment;
- argmin is a row_number over (dist, cid) — deterministic on ties;
- new centroids are per-dimension means ROUNDED to 6 dp before the next
  iteration (the same absorb-then-proceed discipline as the pagerank
  unrolled oracle);
- empty clusters keep their previous centroid (LEFT JOIN + coalesce on
  both engines).

Scale shape: everything is long-format column algebra. The distance stage
is emb_long ⋈ centroids on the dimension index — centroids are K×DIM rows
(512 here), a broadcast at any corpus size; the per-(vec, cid) sum and the
per-(cid, pos) mean are the only data-sized aggregates, both map-side
combinable. K iterations = K chained plans; the per-iteration state that
crosses the driver is NOTHING (the centroid relation stays distributed and
tiny). At 100 TB you would add a lineage checkpoint every few rounds
exactly as `connected_components` does — with ITERS=5 the plan stays
shallow enough without."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources import load_table

KM_K = 8
KM_ITERS = 5
KM_DIM = 64


def _kmeans_oracle() -> str:
    parts = [
        f"""
WITH emb_long AS (
  SELECT vec_id, unnest(generate_series(1, {KM_DIM})) AS pos,
         list_extract(embedding::DOUBLE[], unnest(generate_series(1, {KM_DIM}))) AS val
  FROM embeddings
), c0 AS (
  SELECT vec_id AS cid, pos, round(val, 6) AS val
  FROM emb_long WHERE vec_id < {KM_K}
)"""
    ]
    for i in range(KM_ITERS):
        parts.append(
            f""", d{i} AS (
  SELECT e.vec_id, c.cid,
         round(sum((e.val - c.val) * (e.val - c.val)), 6) AS dist
  FROM emb_long e JOIN c{i} c ON c.pos = e.pos
  GROUP BY e.vec_id, c.cid
), a{i} AS (
  SELECT vec_id, cid AS cl, dist FROM (
    SELECT vec_id, cid, dist,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM d{i}
  ) WHERE rn = 1
), m{i} AS (
  SELECT a.cl AS cid, e.pos, round(avg(e.val), 6) AS val
  FROM a{i} a JOIN emb_long e ON e.vec_id = a.vec_id
  GROUP BY a.cl, e.pos
), c{i + 1} AS (
  SELECT c.cid, c.pos, coalesce(m.val, c.val) AS val
  FROM c{i} c LEFT JOIN m{i} m ON m.cid = c.cid AND m.pos = c.pos
)"""
        )
    last = KM_ITERS - 1
    parts.append(
        f"""
SELECT a.vec_id, CAST(a.cl AS INT) AS cluster, a.dist AS sq_dist
FROM a{last} a"""
    )
    return "".join(parts)


@register("kmeans_clusters", _kmeans_oracle())
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means assignment after KM_ITERS Lloyd iterations (see module
    docstring for the determinism and scale design)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    emb_long = emb.select(
        "vec_id", F.posexplode("emb").alias("pos0", "val")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "val")
    cents = (
        emb_long.filter(F.col("vec_id") < KM_K)
        .select(
            F.col("vec_id").alias("cid"),
            "pos",
            F.round("val", 6).alias("val"),
        )
    )
    assign = None
    for _ in range(KM_ITERS):
        e = emb_long.alias("e")
        c = cents.alias("c")
        # no forced broadcast: the centroid side is K×DIM rows (512) at any
        # corpus size, and AQE broadcasts it from measured stats — a hint
        # here would also multiply through the unrolled-lineage plan (the
        # iteration chain embeds earlier iterations' subtrees)
        dist = (
            e.join(c, F.col("e.pos") == F.col("c.pos"))
            .groupBy(F.col("e.vec_id").alias("vec_id"), F.col("c.cid").alias("cid"))
            .agg(
                F.round(
                    F.sum(
                        (F.col("e.val") - F.col("c.val"))
                        * (F.col("e.val") - F.col("c.val"))
                    ),
                    6,
                ).alias("dist")
            )
        )
        w = Window.partitionBy("vec_id").orderBy("dist", "cid")
        assign = (
            dist.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", F.col("cid").alias("cl"), "dist")
        )
        means = (
            assign.join(emb_long, "vec_id")
            .groupBy(F.col("cl").alias("cid"), "pos")
            .agg(F.round(F.avg("val"), 6).alias("mval"))
        )
        cents = (
            cents.join(means, ["cid", "pos"], "left")
            .select(
                "cid", "pos", F.coalesce("mval", "val").alias("val")
            )
        )
    return assign.select(
        "vec_id",
        F.col("cl").cast("int").alias("cluster"),
        F.col("dist").alias("sq_dist"),
    )
