"""Persistent, incrementally-maintained ANN index (SURVEY.md §2.28).

The round-13 verdict's last missing production piece of the similarity
stack: every ``ann_*`` query re-trains its codebooks/centroids in-session,
but the index you can afford at 100 TB is one you NEVER rebuild. This
module composes the two disciplines the repo already owns —

- the manifest-table commit protocol (``sources/manifest_table.py``):
  atomic generations, blind O(batch) appends, time travel;
- the incremental-probe pattern (``operators/incdedup.py``): probe cost
  follows the batch, never the history —

into a train-once → commit → probe-committed → ingest-incrementally
IVF-PQ index:

- ``ann_index_build``   trains PQ codebooks + IVF centroids on the BUILD
  corpus (the shared ``_pq_train`` / ``_centroids_of`` kernels from
  operators/similarity.py, so a committed index can never disagree with a
  fresh in-session one over the same corpus), encodes it, and commits
  THREE manifest tables: ``codebooks`` (M·K·SUB = 1024 int rows, frozen),
  ``centroids`` (K list vectors, frozen), ``codes`` (8 small-int rows per
  vector, list_id-clustered).
- ``ann_index_ingest``  encodes a NEW batch against the FROZEN codebooks/
  centroids (two bounded manifest reads + one mapInPandas scan over the
  batch) and blind-appends its code rows — O(batch) work and O(batch)
  committed bytes, the incdedup discipline; training is never re-run.
- ``ann_index_probe``   answers queries from the COMMITTED index alone:
  codebooks (1024 rows) and centroids (K rows) come off the manifest,
  the probed list_ids are collected (|Q|·n_probe, bounded) and pushed
  into the codes parquet scan as an ``IN`` filter — because build/ingest
  stage code rows ``repartition(list_id).sortWithinPartitions``, row-group
  min/max stats skip every unprobed list's bytes. No corpus float is ever
  read; scoring is the same broadcast-ADC + combinable-sum plan as
  ``ann_ivfpq_cosine``. ``generation=`` time-travels to any retained
  commit (probe yesterday's index while today's batch lands).

Round 15 completes the index's PRODUCTION lifecycle (SURVEY.md §2.30):

- ``ann_index_probe(..., where=...)``: FILTERED search — metadata columns
  are carried into the codes table at build/ingest (``meta_cols``), so a
  predicate restricts the candidate set INSIDE the same row-group-skipped
  parquet scan BEFORE top-k. Post-filtering a top-k silently returns
  fewer than k under selective predicates; the candidate-restricted form
  returns exactly k whenever the probed lists hold k matches.
- ``ann_index_delete``: committed takedown — the manifest copy-on-write
  delete applied to the codes table; probes at HEAD exclude the vectors,
  ``generation=`` time travel still answers pre-delete.
- ``ann_index_drift``: the staleness readout — per-batch mean PQ
  quantization error (exact int64 ADC distance to the FROZEN codebooks)
  and inverted-list occupancy skew, the "retrain now?" gate an
  ingest-never-retrains index must self-report (the embedding-space twin
  of drift_psi_event_types).
- ``streaming_ann_probe_sink``: the SERVING twin — a query-vector stream
  enriched with committed-index neighbors per micro-batch, the index
  generation re-resolved per batch so a mid-stream ingest is picked up.

Correctness gates (all oracle-checked):
- ``ann_index_probe_committed``: build-from-full-corpus then probe ==
  the independent SQL replay of fresh ``ann_ivfpq_cosine`` — committed
  and in-session indexes are bit-equal over the same corpus.
- ``ann_index_incremental``: build on batch₀ (vec_id mod 3 = 0), ingest
  batch₁, batch₂, probe — == a full SQL replay that trains on batch₀ and
  encodes EVERYTHING against the frozen last-round codebooks (equality
  with a frozen-codebook rebuild: the ingest-never-retrains invariant).
- ``ann_index_timetravel_probe``: probing ``generation=0`` of the chained
  index == the same replay restricted to batch₀ candidates.
- ``ann_index_generations``: the commit ledger itself — per-generation
  vector/code-row deltas == per-batch corpus counts (blind appends add
  exactly 8·|batch| rows, never a copy).

Reference lens: the reference has no persistent index at all
(processing.scala:29-149 recomputes its scores per run); this is to L3
what ``incremental_neardup_pairs`` (§2.26 R3) was to L2.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.localdf import local_df
from ..functions.vector import as_double
from ..registry import register
from ..sources import load_table
from ..sources.manifest_table import (
    manifest_append,
    manifest_clone,
    manifest_delete,
    manifest_history,
    manifest_read,
    manifest_write,
)
from .similarity import (
    DIM,
    N_PROBE,
    PQ_ITERS,
    PQ_K,
    PQ_M,
    QUERY_IDS,
    TOP_K,
    _PQ_SUB,
    _centroids_of,
    _duck_cosine,
    _ivfpq_oracle,
    _nearest_lists,
    _pq_codes,
    _pq_quant,
    _pq_train,
    _pq_train_sql,
)

_CODEBOOKS = "codebooks"
_CENTROIDS = "centroids"
_CODES = "codes"


# ---------------------------------------------------------------------------
# index maintenance API
# ---------------------------------------------------------------------------


def _encode_against(emb: DataFrame, C: list["np.ndarray"]) -> DataFrame:
    """One vectorized mapInPandas scan: each vector → its PQ_M
    (vec_id, m, cid) code rows against the (frozen) codebooks riding the
    closure — exact int64 distances, first-min ties (``_pq_codes``)."""
    Cs = [c.copy() for c in C]

    def encode(batches, _Cs=Cs):
        for pdf in batches:
            if pdf.empty:
                continue
            X = _pq_quant(np.stack(pdf["emb"].to_numpy()))
            codes = _pq_codes(X, _Cs)
            n = X.shape[0]
            yield pd.DataFrame(
                {
                    "vec_id": np.repeat(pdf["vec_id"].to_numpy(), PQ_M),
                    "m": np.tile(np.arange(PQ_M, dtype=np.int32), n),
                    "cid": codes.ravel().astype(np.int32),
                }
            )

    return emb.mapInPandas(encode, "vec_id long, m int, cid int")


def _code_rows(
    emb: DataFrame,
    C: list["np.ndarray"],
    cent: DataFrame,
    meta_cols: tuple[str, ...] = (),
):
    """(vec_id, list_id, m, cid[, meta...]) rows for a corpus slice: PQ
    codes joined with the nearest-frozen-centroid list assignment, then
    CLUSTERED by list_id before staging so a probe's list filter maps
    onto parquet row-group min/max skipping. ``meta_cols`` (present on
    ``emb``) ride along on every code row — small typed columns the
    filtered probe pushes into the SAME scan (8 copies per vector, the
    price of join-free predicate pushdown; cluster by (list_id, meta) at
    build time if one predicate dominates). Every join side grows with
    the slice — shuffle_hash pinned (the sf≈10 audit rule)."""
    flat = emb.select("vec_id", "emb")
    codes = _encode_against(flat, C)
    assigned = _nearest_lists(flat, cent, "vec_id", "emb", keep=1, with_emb=False)
    out = codes.hint("shuffle_hash").join(assigned.hint("shuffle_hash"), "vec_id")
    if meta_cols:
        out = out.hint("shuffle_hash").join(
            emb.select("vec_id", *meta_cols).hint("shuffle_hash"), "vec_id"
        )
    return (
        out.select("vec_id", "list_id", "m", "cid", *meta_cols)
        .repartition("list_id")
        .sortWithinPartitions("list_id", "vec_id", "m")
    )


def ann_index_build(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    meta_cols: tuple[str, ...] = (),
) -> int:
    """Train on — and encode — the build corpus ``emb`` (columns
    ``vec_id``, ``emb: array<double>``, ``label``), committing the three
    index tables as generation-0 manifests. Codebook seeds are the PQ_K
    LOWEST vec_ids of the build corpus (== the registered in-session
    seeding on a full 0-based corpus). ``meta_cols`` names filter columns
    of ``emb`` to denormalize into the codes table for predicate-filtered
    probes. Returns the codes generation."""
    flat = emb.select("vec_id", "emb")
    C = _pq_train(flat, init_df=flat.orderBy("vec_id").limit(PQ_K))
    # local_df (functions/localdf.py): the pickled-list path cost ~6 s of
    # serialized per-slice Python-worker round trips under coalesce(1) —
    # measured as HALF of the ann_index_probe_committed gate (guide §4)
    cb = local_df(
        spark,
        [
            (m, cid, pos + 1, int(C[m][cid][pos]))
            for m in range(PQ_M)
            for cid in range(C[m].shape[0])
            for pos in range(_PQ_SUB)
        ],
        "m int, cid int, pos int, val long",
    ).coalesce(1)
    cent = _centroids_of(emb.select("label", "emb")).coalesce(1)
    manifest_write(spark, f"{index_dir}/{_CODEBOOKS}", cb)
    manifest_write(spark, f"{index_dir}/{_CENTROIDS}", cent)
    return manifest_write(
        spark,
        f"{index_dir}/{_CODES}",
        _code_rows(
            emb.select("vec_id", "emb", *meta_cols),
            C,
            manifest_read(spark, f"{index_dir}/{_CENTROIDS}"),
            meta_cols,
        ),
    )


def _read_codebooks(spark: SparkSession, index_dir: str) -> list["np.ndarray"]:
    """The frozen codebooks off the manifest — 1024 rows, bounded by
    design (M·K·SUB ints), the only driver transfer an ingest/probe pays
    besides the K centroid rows."""
    rows = manifest_read(spark, f"{index_dir}/{_CODEBOOKS}").collect()
    k = max(r.cid for r in rows) + 1
    C = [np.zeros((k, _PQ_SUB), dtype=np.int64) for _ in range(PQ_M)]
    for r in rows:
        C[r.m][r.cid][r.pos - 1] = int(r.val)
    return C


def ann_index_ingest(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    meta_cols: tuple[str, ...] = (),
    extra: dict | None = None,
) -> int:
    """Encode a new batch (``vec_id``, ``emb``) against the FROZEN
    codebooks + centroids and blind-append its 8·|batch| code rows as a
    new generation — O(batch) compute and committed bytes; the existing
    index is never read row-wise, let alone rewritten. ``meta_cols`` must
    match the build-time choice (parquet schema evolution tolerates a
    miss, but filtered probes see null metadata on the odd batch).
    ``extra`` rides into the commit record (the streaming sink's replay
    gate). Returns the new codes generation."""
    C = _read_codebooks(spark, index_dir)
    cent = manifest_read(spark, f"{index_dir}/{_CENTROIDS}")
    return manifest_append(
        spark,
        f"{index_dir}/{_CODES}",
        _code_rows(emb.select("vec_id", "emb", *meta_cols), C, cent, meta_cols),
        extra=extra,
    )


def ann_index_probe(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    n_probe: int = N_PROBE,
    k: int = TOP_K,
    generation: int | None = None,
    exclude_self: bool = True,
    where: str | None = None,
) -> DataFrame:
    """Top-k ADC search over the committed index: ``queries`` is a
    (query_id, q_emb) frame, collected (bounded: a probe batch is |Q|
    queries — the registered set is 5). Query→list assignment replicates
    ``_nearest_lists``'s exact arithmetic (6-dp-quantized cosine, stable
    ties to the lowest list_id) driver-side on the K committed centroids;
    the probed list_ids push into the codes scan as an IN filter so
    list-clustered row groups outside the probe are never read. Scoring
    is all JVM-side: codes ⋈ broadcast(query lists) ⋈ broadcast(640-row
    integer ADC table) → combinable sum → per-query top-k window.

    ``where`` is a SQL predicate over the codes table's metadata columns
    (``meta_cols`` at build/ingest) restricting the CANDIDATE set before
    top-k — filtered vector search. It lands in the SAME parquet scan as
    the list IN filter (both push down; test-asserted), so the selective
    path costs less, never more. Top-k after restriction returns exactly
    k whenever the probed lists hold k matching vectors — the correct
    filtered-search contract; post-filtering an unfiltered top-k instead
    silently under-fills (BASELINE.md round-15 note quantifies it)."""
    qrows = sorted(queries.collect(), key=lambda r: r.query_id)
    qids = np.array([int(r.query_id) for r in qrows], dtype=np.int64)
    Xq = np.stack([np.asarray(r.q_emb, dtype=np.float64) for r in qrows])
    C = _read_codebooks(spark, index_dir)

    crows = sorted(
        manifest_read(spark, f"{index_dir}/{_CENTROIDS}").collect(),
        key=lambda r: r.list_id,
    )
    lids = np.array([int(r.list_id) for r in crows], dtype=np.int64)
    Cm = np.stack([np.asarray(r.c_emb, dtype=np.float64) for r in crows])
    Cn = Cm / np.sqrt((Cm * Cm).sum(axis=1, keepdims=True))
    S = Xq @ Cn.T / np.sqrt((Xq * Xq).sum(axis=1, keepdims=True))
    S = np.sign(S) * np.floor(np.abs(S) * 1e6 + 0.5) / 1e6
    order = np.argsort(-S, axis=1, kind="stable")[:, : min(n_probe, len(lids))]
    qlists = [
        (int(q), int(l)) for q, ls in zip(qids, lids[order]) for l in ls
    ]
    qlist_df = local_df(spark, qlists, "query_id long, list_id int")

    # integer ADC lookup relation: M×K×|Q| rows, the only broadcast
    Q = _pq_quant(Xq)
    lut_rows = []
    for m in range(PQ_M):
        L = C[m] @ Q[:, m * _PQ_SUB : (m + 1) * _PQ_SUB].T
        for cid in range(C[m].shape[0]):
            for qi, qid in enumerate(qids):
                lut_rows.append((m, cid, int(qid), int(L[cid, qi])))
    lut_df = local_df(
        spark, lut_rows, "m int, cid int, query_id long, dot_i long"
    )

    probed = sorted({lid for _, lid in qlists})
    codes = manifest_read(spark, f"{index_dir}/{_CODES}", generation).filter(
        F.col("list_id").isin(probed)  # parquet row-group skip
    )
    if where is not None:
        codes = codes.filter(F.expr(where))  # same scan, same pushdown
    cand = codes.join(F.broadcast(qlist_df), "list_id")
    if exclude_self:
        cand = cand.filter(F.col("vec_id") != F.col("query_id"))
    scored = (
        cand.join(F.broadcast(lut_df), ["m", "cid", "query_id"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("dot_i").alias("est_i"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("est_i"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("est_i").cast("double") / F.lit(1.0e12)).alias("est_cosine"),
            "rnk",
        )
    )


def ann_index_delete(
    spark: SparkSession, index_dir: str, ids: DataFrame
) -> int:
    """Committed takedown: remove ``ids``' vectors (a frame carrying
    ``vec_id``) from the index as ONE copy-on-write generation of the
    codes table — the manifest-table row delete (sources/
    manifest_table.py) composed with the index, closing the governance
    hole where a deduped or taken-down document's vectors stayed
    probe-visible forever. Probes at HEAD exclude the vectors the moment
    the commit lands (atomic — readers see pre- or post-delete, never a
    mix); ``generation=`` time travel still answers pre-delete until
    vacuum; codebooks/centroids stay frozen (a delete never retrains,
    exactly like ingest). Cost is one rewrite of the CODES table — 8
    small-int rows per vector, 32× smaller than the float corpus — so
    batch takedowns at 100 TB rewrite gigabytes, not the corpus; the
    rewrite doubles as a compaction (one clustered dir replaces the
    append chain). Returns the new codes generation."""
    return manifest_delete(
        spark, f"{index_dir}/{_CODES}", ids.select("vec_id"), "vec_id"
    )


def ann_index_drift(
    spark: SparkSession, index_dir: str, emb: DataFrame
) -> DataFrame:
    """Index staleness readout — the "retrain now?" gate an
    ingest-never-retrains index must self-report (frozen codebooks +
    centroids degrade as the corpus drifts; nothing else measures it).
    ``emb`` carries (vec_id, emb, generation) — each vector tagged with
    the ingest batch it arrived in. Per generation, in the module's
    exact-integer discipline:

    - ``mean_qerr``: mean PQ quantization error — the exact int64
      squared distance of each vector's quantized subvectors to their
      nearest FROZEN codebook centroids (the ADC residual; rises as new
      batches leave the build epoch's distribution), round-half-up via
      integral DIV over decimal(38,0) sums.
    - ``max_list_share_micro``: the batch's hottest inverted list's
      occupancy share in micro-units — coarse-quantizer skew (a drifted
      corpus piles into few lists, eroding the IVF pruning ratio).

    One vectorized mapInPandas scan computes the residuals (codebooks
    ride the closure — 1024 ints); occupancy reads the COMMITTED codes
    (one m=0 row per vector), joined to the generation tags with both
    corpus-growing sides shuffle_hash-pinned. Nothing data-sized is
    collected or broadcast. Compare against the build generation's row:
    a sustained mean_qerr climb or share spike is the rebuild trigger —
    the embedding-space twin of ``drift_psi_event_types``."""
    C = _read_codebooks(spark, index_dir)
    Cs = [c.copy() for c in C]

    def resid(batches, _Cs=Cs):
        for pdf in batches:
            if pdf.empty:
                continue
            X = _pq_quant(np.stack(pdf["emb"].to_numpy()))
            tot = np.zeros(X.shape[0], dtype=np.int64)
            for m in range(PQ_M):
                Xm = X[:, m * _PQ_SUB : (m + 1) * _PQ_SUB]
                D = ((Xm[:, None, :] - _Cs[m][None, :, :]) ** 2).sum(axis=2)
                tot += D.min(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy(),
                    "g": pdf["generation"].to_numpy(),
                    "qerr": tot,
                }
            )

    errs = emb.mapInPandas(resid, "vec_id long, g int, qerr long")
    qg = errs.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("qerr").cast("decimal(38,0)")).alias("s"),
    )
    lists = (
        manifest_read(spark, f"{index_dir}/{_CODES}")
        .filter(F.col("m") == 0)
        .select("vec_id", "list_id")
    )
    occ = (
        lists.hint("shuffle_hash")
        .join(
            emb.select("vec_id", F.col("generation").alias("g")).hint(
                "shuffle_hash"
            ),
            "vec_id",
        )
        .groupBy("g", "list_id")
        .agg(F.count("*").alias("cnt"))
        .groupBy("g")
        .agg(F.max("cnt").alias("maxc"))
    )
    return qg.join(occ, "g").select(
        F.col("g").cast("int").alias("generation"),
        F.col("n").cast("bigint").alias("n_vectors"),
        F.expr("CAST((2 * s + n) DIV (2 * n) AS BIGINT)").alias("mean_qerr"),
        F.expr(
            "CAST((2 * CAST(maxc AS DECIMAL(38,0)) * 1000000 + n) "
            "DIV (2 * n) AS BIGINT)"
        ).alias("max_list_share_micro"),
    )


# ---------------------------------------------------------------------------
# registered correctness gates
# ---------------------------------------------------------------------------

_INC_PRED = "vec_id % 3 = 0"  # the chained-commit build slice


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double("embedding").alias("emb"), "label"
    )


def _queries_of(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id").isin(*QUERY_IDS)).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("q_emb")
    )


# per-session chain cache: the chain-backed gate queries (incremental,
# timetravel, generations, filtered, drift, probe_only — and, via a
# shallow clone, the delete gate) read different facets of the SAME
# deterministic 3-commit chain — build it once per (session, sf_dir)
_CHAIN_DIRS: dict[tuple[int, str], str] = {}


def _incremental_chain(spark: SparkSession, sf_dir: str) -> str:
    key = (id(spark), sf_dir)
    cached = _CHAIN_DIRS.get(key)
    if cached and os.path.isdir(os.path.join(cached, _CODES)):
        return cached
    emb = _emb(spark, sf_dir)
    idx = tempfile.mkdtemp(prefix="sr_ann_index_")
    # label rides into the codes table (meta_cols) so the filtered-probe
    # gate exercises join-free predicate pushdown on the shared chain
    ann_index_build(spark, idx, emb.filter(F.expr(_INC_PRED)), ("label",))
    for b in (1, 2):
        ann_index_ingest(
            spark, idx, emb.filter(F.col("vec_id") % 3 == b), ("label",)
        )
    _CHAIN_DIRS[key] = idx
    return idx


_DEL_PRED = "vec_id % 7 = 2"  # the takedown batch (≈14% of the corpus)
_DELETED_DIRS: dict[tuple[int, str], str] = {}


def _deleted_chain(spark: SparkSession, sf_dir: str) -> str:
    """The delete gate's index: a SHALLOW CLONE of the shared chain
    (manifest records only — zero data copied) with one
    ``ann_index_delete`` commit on top. The clone keeps the shared chain
    probe-pristine for the other gates while the delete gate exercises
    the real copy-on-write path end-to-end."""
    key = (id(spark), sf_dir)
    cached = _DELETED_DIRS.get(key)
    if cached and os.path.isdir(cached):
        return cached
    base = _incremental_chain(spark, sf_dir)
    idx = tempfile.mkdtemp(prefix="sr_ann_deleted_")
    for t in (_CODEBOOKS, _CENTROIDS, _CODES):
        manifest_clone(spark, f"{base}/{t}", f"{idx}/{t}")
    ann_index_delete(
        spark, idx, _emb(spark, sf_dir).filter(F.expr(_DEL_PRED))
    )
    _DELETED_DIRS[key] = idx
    return idx


def _cent_assigned_sql(corpus_pred: str = "TRUE") -> str:
    """The chained index's coarse-quantizer replay: batch₀-trained
    per-label centroids + every corpus vector's nearest-list assignment
    (``corpus_pred`` restricts which vectors are assigned at all —
    time travel, filtered probes, committed deletes). Shared by the
    incremental-probe and drift oracles so they can never disagree on
    list membership."""
    return f""", cent AS (
  SELECT label AS list_id, list(cv ORDER BY dim) AS c_emb
  FROM (
    SELECT label, i AS dim, avg(emb[i + 1]) AS cv
    FROM c, unnest(range(0, {DIM})) AS u(i)
    WHERE vec_id % 3 = 0
    GROUP BY label, i
  )
  GROUP BY label
), assigned AS (
  SELECT vec_id, list_id
  FROM (
    SELECT c.vec_id, cent.list_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY round({_duck_cosine('c.emb', 'cent.c_emb')}, 6) DESC,
                      cent.list_id
           ) AS c_rnk
    FROM c CROSS JOIN cent
    WHERE ({corpus_pred})
  )
  WHERE c_rnk <= 1
)"""


def _inc_oracle(corpus_pred: str = "TRUE") -> str:
    """Frozen-codebook replay: train PQ on the batch₀ slice, encode ALL
    vectors against the final codebook (``ae`` from ``_pq_train_sql``),
    coarse-quantize against batch₀-trained centroids, ADC-score the
    probed candidates. ``corpus_pred`` restricts the candidate corpus
    (time travel to the pre-ingest generation; a metadata predicate for
    the filtered probe; takedown exclusion for the committed delete)."""
    last = PQ_ITERS - 1
    return _pq_train_sql(train_pred=_INC_PRED) + _cent_assigned_sql(
        corpus_pred
    ) + f""", qiv AS (
  SELECT query_id, list_id
  FROM (
    SELECT c.vec_id AS query_id, cent.list_id,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY round({_duck_cosine('c.emb', 'cent.c_emb')}, 6) DESC,
                      cent.list_id
           ) AS c_rnk
    FROM c CROSS JOIN cent
    WHERE c.vec_id IN {QUERY_IDS}
  )
  WHERE c_rnk <= {N_PROBE}
), cand AS (
  SELECT qiv.query_id, a.vec_id AS neighbor_id
  FROM qiv JOIN assigned a USING (list_id)
  WHERE a.vec_id <> qiv.query_id
), qpq AS (
  SELECT vec_id AS query_id, m, pos, val FROM nl
  WHERE vec_id IN {QUERY_IDS}
), adc AS MATERIALIZED (
  SELECT q.query_id, cc.m, cc.cid, sum(q.val * cc.val) AS dot_i
  FROM qpq q JOIN c{last} cc ON cc.m = q.m AND cc.pos = q.pos
  GROUP BY q.query_id, cc.m, cc.cid
), est AS (
  SELECT cd.query_id, cd.neighbor_id, sum(a.dot_i) AS est_i
  FROM cand cd
  JOIN ae co ON co.vec_id = cd.neighbor_id
  JOIN adc a ON a.query_id = cd.query_id AND a.m = co.m AND a.cid = co.cl
  GROUP BY cd.query_id, cd.neighbor_id
)
SELECT query_id, neighbor_id, est_cosine, CAST(rnk AS INT) AS rnk
FROM (
  SELECT query_id, neighbor_id,
         CAST(est_i AS DOUBLE) / 1000000000000.0 AS est_cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY est_i DESC, neighbor_id) AS rnk
  FROM est
)
WHERE rnk <= {TOP_K}"""


@register("ann_index_probe_committed", _ivfpq_oracle())
def ann_index_probe_committed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the index from the FULL corpus, commit it, probe it — the
    result must equal a fresh in-session ``ann_ivfpq_cosine`` (the
    oracle IS the ivfpq SQL replay): a committed index answers exactly
    what the index you'd train today would answer."""
    emb = _emb(spark, sf_dir)
    idx = tempfile.mkdtemp(prefix="sr_ann_idxfull_")
    ann_index_build(spark, idx, emb)
    return ann_index_probe(spark, idx, _queries_of(emb))


@register("ann_index_incremental", _inc_oracle())
def ann_index_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance story end-to-end: train+build on batch₀
    (vec_id mod 3 = 0), INGEST batches 1 and 2 against the frozen
    codebooks, probe the 3-generation index. Equal to the SQL replay
    that encodes the whole corpus with batch₀'s codebooks — proving
    ingest is pure encode-and-append, never a retrain."""
    return ann_index_probe(
        spark, _incremental_chain(spark, sf_dir), _queries_of(_emb(spark, sf_dir))
    )


@register("ann_index_timetravel_probe", _inc_oracle(corpus_pred="c." + _INC_PRED))
def ann_index_timetravel_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe ``generation=0`` of the SAME chained index — only batch₀'s
    vectors answer, byte-for-byte the pre-ingest index state (immutable
    generation dirs): yesterday's index stays queryable while today's
    batch commits."""
    return ann_index_probe(
        spark,
        _incremental_chain(spark, sf_dir),
        _queries_of(_emb(spark, sf_dir)),
        generation=0,
    )


_GENS_ORACLE = """
SELECT CAST(vec_id % 3 AS INT) AS generation,
       CAST(count(*) AS BIGINT) AS vectors_added,
       CAST(count(*) * 8 AS BIGINT) AS code_rows_added
FROM embeddings
GROUP BY 1
"""


@register("ann_index_generations", _GENS_ORACLE)
def ann_index_generations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The commit ledger of the chained index: per-generation row deltas
    from ``manifest_history`` must equal the per-batch corpus counts —
    each ingest committed exactly 8·|batch| rows (blind append), never a
    rewrite of history."""
    hist = manifest_history(
        spark, f"{_incremental_chain(spark, sf_dir)}/{_CODES}"
    )
    rows, prev = [], 0
    for rec in hist:
        added = int(rec["n_rows"]) - prev
        prev = int(rec["n_rows"])
        rows.append((int(rec["generation"]), added // PQ_M, added))
    return local_df(
        spark, rows, "generation int, vectors_added long, code_rows_added long"
    )


_FILTER_WHERE = "label IN (0, 2, 4, 6, 8)"


@register(
    "ann_index_probe_filtered",
    _inc_oracle(corpus_pred="c.label IN (0, 2, 4, 6, 8)"),
)
def ann_index_probe_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search over the committed chain — the #1
    production ask an unfiltered index can't serve ("nearest neighbors
    WHERE source = 'web'"): the label predicate restricts the candidate
    set INSIDE the codes scan (metadata denormalized at build/ingest;
    both the list IN filter and the predicate reach PushedFilters —
    test-asserted) BEFORE the top-k, so every query still returns k
    matching neighbors. The oracle is the exact frozen-codebook replay
    with the same predicate on the candidate corpus. Post-filtering the
    unfiltered top-k instead returns ~half of k under this 50% predicate
    (quantified in tests + BASELINE.md round-15 note)."""
    return ann_index_probe(
        spark,
        _incremental_chain(spark, sf_dir),
        _queries_of(_emb(spark, sf_dir)),
        where=_FILTER_WHERE,
    )


@register(
    "ann_index_delete_probe",
    _inc_oracle(corpus_pred=f"NOT (c.{_DEL_PRED})"),
)
def ann_index_delete_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Committed takedown end-to-end: shallow-clone the chain, commit
    ``ann_index_delete`` of the vec_id % 7 = 2 batch, probe HEAD — equal
    to the frozen-codebook replay whose candidate corpus EXCLUDES the
    deleted ids (a taken-down vector stops being anyone's neighbor the
    commit it's deleted; its pre-delete generations stay time-travelable
    — ledger + travel asserted in tests/test_annindex.py)."""
    return ann_index_probe(
        spark, _deleted_chain(spark, sf_dir), _queries_of(_emb(spark, sf_dir))
    )


def _drift_oracle() -> str:
    """Replay of the staleness readout: ``de`` (every vector's exact
    integer distances to the frozen final codebook, from the shared
    training chain) gives the per-vector quantization residual; the
    shared cent/assigned CTEs give list occupancy; both roll up per
    ingest batch with the same round-half-up integer division."""
    return _pq_train_sql(train_pred=_INC_PRED) + _cent_assigned_sql() + """, qe AS (
  SELECT vec_id, sum(md) AS qerr
  FROM (SELECT vec_id, m, min(dist) AS md FROM de GROUP BY vec_id, m)
  GROUP BY vec_id
), qg AS (
  SELECT vec_id % 3 AS g, count(*) AS n, sum(qerr) AS s FROM qe GROUP BY 1
), occ AS (
  SELECT g, max(cnt) AS maxc FROM (
    SELECT vec_id % 3 AS g, list_id, count(*) AS cnt
    FROM assigned GROUP BY 1, 2
  ) GROUP BY 1
)
SELECT CAST(g AS INT) AS generation,
       CAST(n AS BIGINT) AS n_vectors,
       CAST((2 * s + n) // (2 * n) AS BIGINT) AS mean_qerr,
       CAST((2 * CAST(maxc AS HUGEINT) * 1000000 + n) // (2 * n) AS BIGINT)
         AS max_list_share_micro
FROM qg JOIN occ USING (g)"""


@register("ann_index_drift", _drift_oracle())
def ann_index_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chained index's staleness report: per ingest batch
    (generation = vec_id mod 3, the chain's commit key), mean frozen-
    codebook quantization error and hottest-list occupancy share — both
    exact-integer, both vs the batch₀ build epoch's row. The fixture's
    batches are i.i.d. slices of one corpus, so the gate's value is the
    INVARIANT (residuals computable from commits alone, exactly
    replayable in SQL); BASELINE.md interprets the fixture's numbers."""
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        "emb",
        (F.col("vec_id") % 3).cast("int").alias("generation"),
    )
    return ann_index_drift(spark, _incremental_chain(spark, sf_dir), emb)


@register("ann_index_probe_only", _inc_oracle())
def ann_index_probe_only(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PROBE-economics twin of ``ann_index_incremental`` — same plan,
    same oracle, registered separately so the bench HEADLINE can track
    the production number (probe a committed index that already exists:
    bench.py pre-builds the session chain as layout prep, the
    ensure_star_bucketed precedent) while ``ann_index_probe_committed``
    keeps timing the full build+commit+probe gate. The round-14 verdict
    flagged exactly this split: the gate query is a BUILD benchmark by
    design; the claim users care about (2.0 s warm probe at sf≈10 vs
    13.0 s retraining) needs a first-class headline row."""
    return ann_index_probe(
        spark, _incremental_chain(spark, sf_dir), _queries_of(_emb(spark, sf_dir))
    )


def streaming_ann_index_sink(index_dir: str, meta_cols: tuple[str, ...] = ()):
    """foreachBatch sink: every micro-batch of (vec_id, embedding) rows
    encodes against the index's FROZEN codebooks/centroids and commits
    one blind-append generation — the streaming twin of
    ``ann_index_ingest`` (same per-batch work, same committed bytes; the
    micro-batch boundary simply becomes the generation boundary). The
    index must already exist (built offline by ``ann_index_build`` — at
    100 TB training is a batch job; the stream only ever encodes).

    Replay-idempotent (round-14 ADVICE fix): blind append is
    at-least-once on its own — a crash-replayed micro-batch would
    re-append its 8 rows/vector and the duplicates would DOUBLE-SUM in
    the probe's ADC groupBy, corrupting rankings. The sink therefore
    records the applied ``batch_id`` in each commit record (the Delta
    txnAppId/txnVersion idea, via ``manifest_append(extra=...)``) and
    skips any batch at or below the high-water mark — foreachBatch ids
    are monotonic per checkpoint, so a replay is exactly "id ≤ last".
    One stream per index: restarting with a FRESH checkpoint resets ids
    to 0, which this gate would read as replays — resume from the old
    checkpoint or build a new index. Replay tested (double-apply
    commits nothing) alongside the batch-agreement test in
    tests/test_annindex.py."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        applied = max(
            (
                int(rec.get("batch_id", -1))
                for rec in manifest_history(spark, f"{index_dir}/{_CODES}")
            ),
            default=-1,
        )
        if int(batch_id) <= applied:
            return  # crash-replayed micro-batch: already committed
        emb = batch_df.select(
            "vec_id", as_double("embedding").alias("emb"), *meta_cols
        )
        ann_index_ingest(
            spark, index_dir, emb, meta_cols, extra={"batch_id": int(batch_id)}
        )

    return sink


def streaming_ann_probe_sink(
    index_dir: str,
    out_dir: str,
    n_probe: int = N_PROBE,
    k: int = TOP_K,
    where: str | None = None,
):
    """The SERVING twin (the last cell of the L3 streaming matrix —
    ``streaming_ann_index_sink`` covered ingest): a query-vector stream
    is enriched with committed-index neighbors per micro-batch. Each
    batch's (vec_id, embedding) rows become the probe set of ONE
    ``ann_index_probe`` call — the index generation is re-resolved off
    the manifest per batch, so an ingest landing mid-stream is served by
    the very next micro-batch (stream_static_enrich semantics, where the
    static side is the committed index, not a parquet snapshot).

    Results land at ``out_dir/batch-<id>`` with mode=overwrite — a
    crash-replayed batch overwrites its own directory byte-for-byte
    instead of duplicating rows, so the sink is replay-idempotent
    without a high-water mark (probes are reads; only the output needs
    fencing). Per-batch cost is the bounded probe plan: |Q| queries
    collected, codebooks + centroids off the manifest, one
    IN-filter-pushed codes scan — nothing corpus-sized moves.
    Streaming-vs-batch agreement and mid-stream-ingest visibility are
    tested in tests/test_annindex.py."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        queries = batch_df.select(
            F.col("vec_id").alias("query_id"),
            as_double("embedding").alias("q_emb"),
        )
        ann_index_probe(
            spark, index_dir, queries, n_probe=n_probe, k=k, where=where
        ).write.mode("overwrite").parquet(
            f"{out_dir.rstrip('/')}/batch-{int(batch_id)}"
        )

    return sink


def ann_index_compact(spark: SparkSession, index_dir: str) -> int:
    """Pay down the ingest append chain: rewrite the codes table's CURRENT
    generation as ONE freshly list_id-clustered commit. A long-lived index
    accumulates one data dir per ingested batch; each probe then opens
    every generation's files and the row-group skipping that
    ``repartition(list_id).sortWithinPartitions`` bought at build time
    decays (a batch's rows for one list are scattered across its own
    small files). Compaction is just another commit (atomic,
    concurrent-reader-safe, undoable via ``generation=`` time travel —
    the manifest_compact discipline), but unlike the generic
    ``manifest_compact`` (a plain coalesce) it RE-CLUSTERS by list_id so
    probes regain full row-group pruning. Codebooks/centroids are frozen
    single commits and never need it. Run on a cadence proportional to
    ingest frequency — the incdedup manifest guidance, applied to L3.
    Returns the new codes generation."""
    codes = (
        manifest_read(spark, f"{index_dir}/{_CODES}")
        .repartition("list_id")
        .sortWithinPartitions("list_id", "vec_id", "m")
    )
    return manifest_write(spark, f"{index_dir}/{_CODES}", codes)
