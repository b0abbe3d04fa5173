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


def _round6(a):
    """HALF_UP decimal rounding to 6 places, vectorized — the same
    convention as Spark's F.round and DuckDB's round (numpy's own round is
    half-EVEN; exact .5 cases are unreachable for binary doubles at 1e-6
    scale, but matching the convention keeps the ulp-boundary behavior
    aligned with the oracle)."""
    import numpy as np

    return np.sign(a) * np.floor(np.abs(a) * 1e6 + 0.5) / 1e6


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
    # init: centroids 0..K-1 are the (rounded) embeddings of vec_id 0..K-1
    # — a K-row bounded collect, mirroring the oracle's c0 CTE
    init = emb.filter(F.col("vec_id") < KM_K).collect()
    cents = {int(r.vec_id): _round6(np.asarray(r.emb, dtype=np.float64)) for r in init}

    def assign_of(C: "np.ndarray"):
        """(n, K) rounded squared distances + first-min argmin — ties go
        to the lowest cid exactly like the oracle's row_number ORDER BY
        (dist, cid)."""

        def inner(X):
            D = _round6(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
            return D, D.argmin(axis=1)

        return inner

    cids = sorted(cents)  # 0..K-1; argmin index == cid by construction
    for _ in range(KM_ITERS - 1):
        C = np.stack([cents[c] for c in cids])
        dist_fn = assign_of(C)

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

    C = np.stack([cents[c] for c in cids])
    final_fn = assign_of(C)

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
