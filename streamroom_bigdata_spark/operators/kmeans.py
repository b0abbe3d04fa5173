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

Scale shape (round-8 rework, the MLlib/Lloyd's canonical form): centroids
live on the DRIVER between rounds — K×DIM doubles (512 here; a few MB even
at K=64k, DIM=1k — ship via spark broadcast past closure size), shipped to
executors inside the mapInPandas closure. Each non-final round is ONE
vectorized numpy scan over the embeddings (distances + argmin + in-batch
per-cluster partial sums — the map-side combine done explicitly) emitting
at most K×DIM rows per Arrow batch, then a K×DIM-bounded groupBy and a
K×DIM-row collect. The final round is a pure scan emitting assignments. No
data-sized shuffle exists anywhere; per-round driver state is
bounded-by-construction like the Bloom partials the repo already collects.

Why not the previous all-DataFrame chain (r7): 5 chained join plans whose
per-round subtrees nest (centroids feed both the distance join and the
next update), so Catalyst re-plans a growing tree and the distance stage
shuffles n×K aggregate rows per round — measured 11.2 s cold sf0.1 and
18.5 s cold / 11.5 s warm at sf≈1 (10× data → 1.6× time: pure overhead).
This shape measures ~4× faster cold at sf0.1 and scales with the scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.localdf import local_df
from ..registry import register
from ..sources import load_table

KM_K = 8
KM_ITERS = 5
KM_DIM = 64


def _kmeans_train_sql() -> str:
    """The shared Lloyd-training CTE chain, ending at assignments
    a{KM_ITERS-1} / distances d{KM_ITERS-1} / codebook c{KM_ITERS-1} —
    reused verbatim by the kmeans oracle and the round-13 cluster-quality
    oracles (silhouette, Davies-Bouldin) so the metrics can never score a
    different model than the clustering they grade."""
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
    return "".join(parts)


def _kmeans_oracle() -> str:
    last = KM_ITERS - 1
    return _kmeans_train_sql() + (
        f"""
SELECT a.vec_id, CAST(a.cl AS INT) AS cluster, a.dist AS sq_dist
FROM a{last} a"""
    )


def _round6(a):
    """HALF_UP decimal rounding to 6 places, vectorized — the same
    convention as Spark's F.round and DuckDB's round (numpy's own round is
    half-EVEN; exact .5 cases are unreachable for binary doubles at 1e-6
    scale, but matching the convention keeps the ulp-boundary behavior
    aligned with the oracle)."""
    import numpy as np

    return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6


def _assign_of(C: "np.ndarray"):
    """(n, K) rounded squared distances + first-min argmin — ties go
    to the lowest cid exactly like the oracle's row_number ORDER BY
    (dist, cid)."""

    def inner(X):
        D = _round6(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
        return D, D.argmin(axis=1)

    return inner


def _kmeans_train(emb: DataFrame) -> "np.ndarray":
    """Run the KM_ITERS−1 Lloyd updates and return the final (K, DIM)
    centroid matrix — the driver-held training loop shared by
    `kmeans_clusters` and the round-13 cluster-quality metrics (one
    model, scored and graded identically)."""
    import numpy as np
    import pandas as pd

    # init: centroids 0..K-1 are the (rounded) embeddings of vec_id 0..K-1
    # — a K-row bounded collect, mirroring the oracle's c0 CTE
    init = emb.filter(F.col("vec_id") < KM_K).collect()
    cents = {int(r.vec_id): _round6(np.asarray(r.emb, dtype=np.float64)) for r in init}

    cids = sorted(cents)  # 0..K-1; argmin index == cid by construction
    for _ in range(KM_ITERS - 1):
        C = np.stack([cents[c] for c in cids])
        dist_fn = _assign_of(C)

        def partials(batches, _fn=dist_fn):
            # explicit map-side combine: per-cluster (sum, count) per
            # Arrow batch — at most K×DIM rows out per batch in
            for pdf in batches:
                X = np.stack(pdf["emb"].to_numpy())
                _, cl = _fn(X)
                out = []
                for cid in np.unique(cl):
                    sel = X[cl == cid]
                    s = sel.sum(axis=0)
                    n = sel.shape[0]
                    out.append(
                        pd.DataFrame(
                            {
                                "cid": int(cid),
                                "pos": np.arange(1, s.size + 1),
                                "s": s,
                                "n": n,
                            }
                        )
                    )
                yield pd.concat(out) if out else pd.DataFrame(
                    {"cid": [], "pos": [], "s": [], "n": []}
                )

        stats = (
            emb.mapInPandas(partials, "cid int, pos int, s double, n long")
            .groupBy("cid", "pos")
            .agg(F.sum("s").alias("s"), F.sum("n").alias("n"))
            .collect()  # bounded: K×DIM rows
        )
        for r in stats:  # empty clusters keep their previous centroid
            cents[r.cid][r.pos - 1] = _round6(np.float64(r.s / r.n))

    return np.stack([cents[c] for c in cids])


@register("kmeans_clusters", _kmeans_oracle())
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means assignment after KM_ITERS Lloyd iterations (see module
    docstring for the determinism and scale design — driver-held
    centroids, one vectorized scan per round, K×DIM-bounded shuffles)."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    C = _kmeans_train(emb)
    final_fn = _assign_of(C)

    def assignments(batches, _fn=final_fn):
        for pdf in batches:
            X = np.stack(pdf["emb"].to_numpy())
            D, cl = _fn(X)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "cluster": cl.astype("int32"),
                    "sq_dist": D[np.arange(len(cl)), cl],
                }
            )

    return emb.mapInPandas(
        assignments, "vec_id long, cluster int, sq_dist double"
    )


# ---------------------------------------------------------------------------
# Cluster-quality metrics over the SAME trained model (round 13)
# ---------------------------------------------------------------------------


def _silhouette_oracle() -> str:
    last = KM_ITERS - 1
    return _kmeans_train_sql() + f""", dd AS (
  SELECT d.vec_id, a.cl, d.cid, sqrt(d.dist) AS dist
  FROM d{last} d JOIN a{last} a USING (vec_id)
), ab AS (
  SELECT vec_id, cl,
         max(CASE WHEN cid = cl THEN dist END) AS a,
         min(CASE WHEN cid <> cl THEN dist END) AS b
  FROM dd GROUP BY vec_id, cl
), s AS (
  SELECT cl,
         CASE WHEN greatest(a, b) > 0
              THEN CAST(floor(abs((b - a) / greatest(a, b)) * 1000000 + 0.5)
                        AS BIGINT)
                   * CASE WHEN b >= a THEN 1 ELSE -1 END
              ELSE 0 END AS s_micro
  FROM ab
)
SELECT CAST(cl AS INT) AS cluster, CAST(count(*) AS BIGINT) AS n,
       round(sum(s_micro) / (1000000.0 * count(*)), 6) AS mean_silhouette
FROM s GROUP BY cl
"""


@register("silhouette_simplified", _silhouette_oracle())
def silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simplified (centroid-based) silhouette per k-means cluster: for
    each point, a = distance to its OWN centroid, b = distance to the
    nearest OTHER centroid, s = (b − a)/max(a, b) — the cluster-quality
    readout for the model `kmeans_clusters` ships (shared `_kmeans_train`
    loop and `_kmeans_train_sql` oracle chain, so the metric can never
    grade a different model). Full silhouette needs pairwise point
    distances (O(n²) — the reason the centroid form is THE production
    variant, Hruschka et al.); centroid distances make it one scan.

    Determinism: distances are sqrt of the 6-dp-rounded squared
    distances (identical IEEE both engines); per-point s quantizes to
    micro-units (floor(|s|·1e6 + 0.5)·sign) BEFORE the mean, so the
    per-cluster sums are exact integers. Shape: the kmeans training
    scans + ONE final mapInPandas scan emitting (cluster, s_micro),
    K-group combinable aggregate."""
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    C = _kmeans_train(emb)
    fn = _assign_of(C)

    def score(batches, _fn=fn):
        for pdf in batches:
            X = np.stack(pdf["emb"].to_numpy())
            D, cl = _fn(X)
            Dr = np.sqrt(D)
            idx = np.arange(len(cl))
            a = Dr[idx, cl]
            masked = Dr.copy()
            masked[idx, cl] = np.inf
            b = masked.min(axis=1)
            m = np.maximum(a, b)
            with np.errstate(invalid="ignore", divide="ignore"):
                s = np.where(m > 0, (b - a) / m, 0.0)
            s_micro = (
                np.sign(s) * np.floor(np.abs(s) * 1e6 + 0.5)
            ).astype(np.int64)
            yield pd.DataFrame({"cluster": cl.astype("int32"),
                                "s_micro": s_micro})

    scored = emb.mapInPandas(score, "cluster int, s_micro long")
    return scored.groupBy("cluster").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum("s_micro") / (1000000.0 * F.count("*")), 6
        ).alias("mean_silhouette"),
    )


def _db_oracle() -> str:
    last = KM_ITERS - 1
    return _kmeans_train_sql() + f""", ci AS (
  SELECT cid, pos,
         CAST(floor(abs(val) * 1000000 + 0.5) AS BIGINT)
         * CASE WHEN val >= 0 THEN 1 ELSE -1 END AS vi
  FROM c{last}
), cd AS (
  SELECT a.cid AS i, b.cid AS j,
         CAST(sum((a.vi - b.vi) * (a.vi - b.vi)) AS BIGINT) AS d2
  FROM ci a JOIN ci b ON a.pos = b.pos AND a.cid <> b.cid
  GROUP BY a.cid, b.cid
), sig AS (
  SELECT cl, CAST(count(*) AS BIGINT) AS n,
         CAST(floor((2.0 * sum(dm) + count(*)) / (2.0 * count(*)))
              AS BIGINT) AS sigma_micro
  FROM (
    SELECT cl, CAST(floor(sqrt(dist) * 1000000 + 0.5) AS BIGINT) AS dm
    FROM a{last}
  ) GROUP BY cl
)
SELECT CAST(s1.cl AS INT) AS cluster, s1.n,
       round(s1.sigma_micro / 1000000.0, 6) AS sigma,
       round(max((s1.sigma_micro + s2.sigma_micro)
                 / sqrt(CAST(cd.d2 AS DOUBLE))), 6) AS r_max
FROM sig s1
JOIN cd ON cd.i = s1.cl
JOIN sig s2 ON s2.cl = cd.j
GROUP BY s1.cl, s1.n, s1.sigma_micro
"""


@register("davies_bouldin_index", _db_oracle())
def davies_bouldin_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Davies-Bouldin cluster-separation profile over the SAME trained
    k-means model: per cluster, its dispersion σ (mean member-to-centroid
    distance) and R_max = max over other clusters of (σᵢ + σⱼ)/d(cᵢ, cⱼ)
    — the worst compactness-vs-separation ratio (the DB index is the mean
    of this column; a cluster with R_max ≫ 1 overlaps a neighbor). The
    BETWEEN-cluster complement of `silhouette_simplified`'s per-point
    view.

    Determinism: per-point distances quantize to micro-units and σ is
    the exact half-up integer division floor((2Σ + n)/(2n)); centroid
    coordinates (6-dp decimals) recover to EXACT ints, so every pairwise
    d² is an exact BIGINT and each ratio is ONE identical IEEE division
    — max/mean over bit-identical doubles can't diverge. Empty clusters
    drop on both engines (no members ⇒ no σ row).

    Shape: the kmeans training scans + one mapInPandas scan collapsing
    to K (cluster, Σd_micro, n) rows; the K×K ratio matrix is driver
    work over ≤ K² = 64 numbers."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    C = _kmeans_train(emb)
    fn = _assign_of(C)

    def dmic(batches, _fn=fn):
        for pdf in batches:
            X = np.stack(pdf["emb"].to_numpy())
            D, cl = _fn(X)
            d = np.sqrt(D[np.arange(len(cl)), cl])
            yield pd.DataFrame(
                {
                    "cluster": cl.astype("int32"),
                    "dm": np.floor(d * 1e6 + 0.5).astype(np.int64),
                }
            )

    sums = (
        emb.mapInPandas(dmic, "cluster int, dm long")
        .groupBy("cluster")
        .agg(F.sum("dm").alias("s"), F.count("*").alias("n"))
        .collect()  # bounded: K rows
    )
    sigma = {
        int(r.cluster): (
            int(r.n),
            math.floor((2.0 * int(r.s) + int(r.n)) / (2.0 * int(r.n))),
        )
        for r in sums
    }
    ci = np.sign(C) * np.floor(np.abs(C) * 1e6 + 0.5)  # exact int coords
    rows = []
    for i, (ni, si) in sorted(sigma.items()):
        r_max = None
        for j, (_, sj) in sorted(sigma.items()):
            if j == i:
                continue
            d2 = float(((ci[i] - ci[j]) ** 2).sum())
            r = (si + sj) / math.sqrt(d2)
            if r_max is None or r > r_max:
                r_max = r
        rows.append(
            (
                i,
                ni,
                math.floor(si / 1e6 * 1e6 + 0.5) / 1e6,
                math.floor(abs(r_max) * 1e6 + 0.5) / 1e6,
            )
        )
    schema = T.StructType(
        [
            T.StructField("cluster", T.IntegerType(), False),
            T.StructField("n", T.LongType(), False),
            T.StructField("sigma", T.DoubleType(), False),
            T.StructField("r_max", T.DoubleType(), False),
        ]
    )
    return local_df(emb.sparkSession, rows, schema)
