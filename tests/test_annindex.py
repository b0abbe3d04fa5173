"""Persistent ANN index (operators/annindex.py): the maintenance
invariants the SQL oracles can't see — generation accounting, time
travel, frozen-codebook equality between chained and one-shot indexes,
and the probed-list pushdown reaching the parquet scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators.annindex import (
    _CODES,
    _emb,
    _queries_of,
    ann_index_build,
    ann_index_ingest,
    ann_index_probe,
)
from streamroom_bigdata_spark.operators.similarity import PQ_M
from streamroom_bigdata_spark.sources.manifest_table import (
    manifest_history,
    manifest_read,
)

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def chain(spark, tmp_path_factory):
    """A 3-commit chain (build on batch0, ingest batch1, batch2) plus the
    corpus frame, shared by every test in the module. Built with
    meta_cols=("label",) like the registered chain, so filtered probes
    are exercised on the same layout. Tests that COMMIT to an index
    (compact, delete) must run on a shallow clone (``_clone_index``),
    never on this fixture."""
    emb = _emb(spark, SF_SMOKE)
    idx = str(tmp_path_factory.mktemp("annidx"))
    ann_index_build(
        spark, idx, emb.filter(F.col("vec_id") % 3 == 0), ("label",)
    )
    for b in (1, 2):
        ann_index_ingest(
            spark, idx, emb.filter(F.col("vec_id") % 3 == b), ("label",)
        )
    return idx, emb


def test_ingest_appends_exactly_pqm_rows_per_vector(spark, chain):
    idx, emb = chain
    counts = {
        b: emb.filter(F.col("vec_id") % 3 == b).count() for b in range(3)
    }
    hist = manifest_history(spark, f"{idx}/{_CODES}")
    assert [rec["generation"] for rec in hist] == [0, 1, 2]
    prev = 0
    for b, rec in enumerate(hist):
        added = rec["n_rows"] - prev
        prev = rec["n_rows"]
        assert added == PQ_M * counts[b]


def test_codes_cover_corpus_exactly_once(spark, chain):
    idx, emb = chain
    codes = manifest_read(spark, f"{idx}/{_CODES}")
    per_vec = codes.groupBy("vec_id").count().collect()
    assert len(per_vec) == emb.count()
    assert all(r["count"] == PQ_M for r in per_vec)
    # one list assignment per vector, constant across its code rows
    assert (
        codes.groupBy("vec_id")
        .agg(F.countDistinct("list_id").alias("nl"))
        .filter(F.col("nl") != 1)
        .count()
        == 0
    )


def test_chained_probe_equals_oneshot_frozen_codebook_index(
    spark, chain, tmp_path
):
    """Build a SECOND index in one shot from batch0's training slice but
    ingest the rest in ONE batch — probing it must equal probing the
    3-commit chain: generation layout is invisible to queries."""
    idx, emb = chain
    idx2 = str(tmp_path / "oneshot")
    ann_index_build(spark, idx2, emb.filter(F.col("vec_id") % 3 == 0))
    ann_index_ingest(spark, idx2, emb.filter(F.col("vec_id") % 3 != 0))
    q = _queries_of(emb)
    a = sorted(map(tuple, ann_index_probe(spark, idx, q).collect()))
    b = sorted(map(tuple, ann_index_probe(spark, idx2, q).collect()))
    assert a == b


def test_timetravel_probe_sees_only_its_generation(spark, chain):
    idx, emb = chain
    q = _queries_of(emb)
    g0 = ann_index_probe(spark, idx, q, generation=0)
    # every neighbor at generation 0 is a batch-0 vector
    assert g0.filter(F.col("neighbor_id") % 3 != 0).count() == 0
    # and generation 1 adds batch-1 vectors but never batch-2 ones
    g1 = ann_index_probe(spark, idx, q, generation=1)
    assert g1.filter(F.col("neighbor_id") % 3 == 2).count() == 0
    assert g1.filter(F.col("neighbor_id") % 3 == 1).count() > 0


def test_probe_list_filter_reaches_parquet_scan(spark, chain):
    idx, emb = chain
    plan = ann_index_probe(spark, idx, _queries_of(emb))._jdf.queryExecution(
    ).executedPlan().toString()
    assert "PushedFilters" in plan and "In(list_id" in plan


def test_probe_k_and_self_exclusion(spark, chain):
    idx, emb = chain
    q = _queries_of(emb)
    out = ann_index_probe(spark, idx, q, k=3).collect()
    assert all(r.rnk <= 3 for r in out)
    assert all(r.neighbor_id != r.query_id for r in out)
    incl = ann_index_probe(spark, idx, q, k=3, exclude_self=False)
    # with self-matches allowed, each query's own vector scores maximal
    # ADC similarity and must surface at rank 1
    top = {r.query_id: r.neighbor_id for r in incl.filter("rnk = 1").collect()}
    assert all(q_id == n_id for q_id, n_id in top.items())


def test_streaming_ingest_agrees_with_batch_chain(spark, chain, tmp_path):
    """Streaming the non-build batches through the foreachBatch sink
    produces a probe-identical index to the batch ingest chain — the
    micro-batch boundary is just a generation boundary."""
    import os

    from streamroom_bigdata_spark.operators.annindex import (
        streaming_ann_index_sink,
    )
    from streamroom_bigdata_spark.sources import load_table

    idx_batch, emb = chain
    # offline build on batch0, as in the chain fixture
    idx_stream = str(tmp_path / "stream_idx")
    ann_index_build(spark, idx_stream, emb.filter(F.col("vec_id") % 3 == 0))

    # stage batches 1 and 2 as two parquet files with distinct mtimes
    # (file-source micro-batch order follows mtime — verify-skill gotcha)
    raw = load_table(spark, SF_SMOKE, "embeddings")
    src = tmp_path / "stream_src"
    for b in (1, 2):
        part = str(src / f"b{b}")
        raw.filter(F.col("vec_id") % 3 == b).coalesce(1).write.parquet(part)
        for root, _, files in os.walk(part):
            for fn in files:
                os.utime(os.path.join(root, fn), (1000 + b, 1000 + b))
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(streaming_ann_index_sink(idx_stream))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    qdf = _queries_of(emb)
    a = sorted(map(tuple, ann_index_probe(spark, idx_batch, qdf).collect()))
    b = sorted(map(tuple, ann_index_probe(spark, idx_stream, qdf).collect()))
    assert a == b


def _clone_index(spark, src: str, dst: str) -> str:
    """Shallow-clone all three index tables — gate/test plumbing for
    mutating commits (compact, delete) without touching the shared
    module fixture (round-14 ADVICE fix: the compaction test used to
    mutate the fixture and depend on lexical test order)."""
    from streamroom_bigdata_spark.operators.annindex import (
        _CENTROIDS,
        _CODEBOOKS,
    )
    from streamroom_bigdata_spark.sources.manifest_table import manifest_clone

    for t in (_CODEBOOKS, _CENTROIDS, _CODES):
        manifest_clone(spark, f"{src}/{t}", f"{dst}/{t}")
    return dst


def test_compaction_is_probe_invisible_and_recluster_real(
    spark, chain, tmp_path
):
    """ann_index_compact collapses the 3-generation append chain into one
    re-clustered commit: probe results are byte-identical, the pre-compact
    state stays time-travelable, and the list filter still reaches the
    parquet scan. Runs against a SHALLOW CLONE of the module chain so the
    fixture stays pristine in any test order."""
    from streamroom_bigdata_spark.operators.annindex import (
        ann_index_compact,
    )
    from streamroom_bigdata_spark.sources.manifest_table import (
        _generation_dirs,
        manifest_history,
    )

    base, emb = chain
    idx = _clone_index(spark, base, str(tmp_path / "compact_clone"))
    q = _queries_of(emb)
    before = sorted(map(tuple, ann_index_probe(spark, idx, q).collect()))
    gen = ann_index_compact(spark, idx)
    after = sorted(map(tuple, ann_index_probe(spark, idx, q).collect()))
    assert before == after
    hist = manifest_history(spark, f"{idx}/{_CODES}")
    assert hist[-1]["generation"] == gen
    # the chain's three data dirs collapsed to one
    assert len(_generation_dirs(hist[-1])) == 1
    assert len(_generation_dirs(hist[-2])) == 3
    # row count preserved exactly
    assert hist[-1]["n_rows"] == hist[-2]["n_rows"]
    # pre-compact generation still answers via time travel
    g2 = sorted(
        map(
            tuple,
            ann_index_probe(spark, idx, q, generation=gen - 1).collect(),
        )
    )
    assert g2 == before
    # pushdown still live on the compacted layout
    plan = ann_index_probe(spark, idx, q)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "In(list_id" in plan


# --- round 15: filtered probe / committed delete / drift / replay ---------


def test_filtered_probe_pushdown_and_exact_k(spark, chain):
    """The metadata predicate reaches the SAME parquet scan as the list
    filter, every neighbor satisfies it, and the candidate-restricted
    top-k still returns exactly k — while post-filtering the unfiltered
    top-k under-fills (the wrong spelling filtered search must avoid)."""
    from streamroom_bigdata_spark.operators.similarity import TOP_K

    idx, emb = chain
    q = _queries_of(emb)
    pred = "label IN (0, 2, 4, 6, 8)"
    out = ann_index_probe(spark, idx, q, where=pred)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "In(list_id" in plan and "In(label" in plan

    rows = out.collect()
    n_queries = q.count()
    assert len(rows) == n_queries * TOP_K  # exactly k per query
    labels = {
        r.vec_id: r.label for r in emb.select("vec_id", "label").collect()
    }
    assert all(labels[r.neighbor_id] % 2 == 0 for r in rows)

    # post-filtering the unfiltered top-k silently returns fewer than k
    unfiltered = ann_index_probe(spark, idx, q).collect()
    post = [r for r in unfiltered if labels[r.neighbor_id] % 2 == 0]
    assert len(post) < len(rows)


def test_delete_is_committed_undoable_and_ledgered(spark, chain, tmp_path):
    """ann_index_delete on a shallow clone: HEAD probes exclude the
    deleted vectors, the ledger records exactly -8 rows per deleted
    vector, time travel still answers pre-delete, and compact-after-
    delete keeps results stable."""
    from streamroom_bigdata_spark.operators.annindex import (
        ann_index_compact,
        ann_index_delete,
    )
    from streamroom_bigdata_spark.operators.similarity import PQ_M

    base, emb = chain
    idx = _clone_index(spark, base, str(tmp_path / "del_clone"))
    q = _queries_of(emb)
    before = sorted(map(tuple, ann_index_probe(spark, idx, q).collect()))

    doomed = emb.filter(F.col("vec_id") % 7 == 2).select("vec_id")
    n_doomed = doomed.count()
    gen = ann_index_delete(spark, idx, doomed)

    hist = manifest_history(spark, f"{idx}/{_CODES}")
    assert hist[-1]["generation"] == gen
    assert hist[-2]["n_rows"] - hist[-1]["n_rows"] == PQ_M * n_doomed

    after = ann_index_probe(spark, idx, q)
    assert after.filter(F.col("neighbor_id") % 7 == 2).count() == 0
    # the source chain is untouched (clone isolation)
    assert (
        ann_index_probe(spark, base, q)
        .filter(F.col("neighbor_id") % 7 == 2)
        .count()
        > 0
    )
    # pre-delete generation still answers byte-for-byte
    travel = sorted(
        map(tuple, ann_index_probe(spark, idx, q, generation=gen - 1).collect())
    )
    assert travel == before
    # compaction after a delete preserves the post-delete answers
    post_del = sorted(map(tuple, after.collect()))
    ann_index_compact(spark, idx)
    assert (
        sorted(map(tuple, ann_index_probe(spark, idx, q).collect()))
        == post_del
    )


def test_drift_report_exact_and_accounted(spark, chain):
    """ann_index_drift: per-batch rows cover the corpus exactly, the
    mean quantization residual matches a local exact-integer recompute
    against the committed codebooks, and occupancy shares are sane."""
    import numpy as np

    from streamroom_bigdata_spark.operators.annindex import (
        _read_codebooks,
        ann_index_drift,
    )
    from streamroom_bigdata_spark.operators.similarity import (
        _PQ_SUB,
        PQ_M,
        _pq_quant,
    )

    idx, emb = chain
    tagged = emb.select(
        "vec_id", "emb", (F.col("vec_id") % 3).cast("int").alias("generation")
    )
    rows = {r.generation: r for r in ann_index_drift(spark, idx, tagged).collect()}
    assert sorted(rows) == [0, 1, 2]
    assert sum(r.n_vectors for r in rows.values()) == emb.count()
    assert all(0 <= r.max_list_share_micro <= 1_000_000 for r in rows.values())

    # exact recompute of one batch's mean residual, driver-side
    C = _read_codebooks(spark, idx)
    batch = sorted(
        emb.filter(F.col("vec_id") % 3 == 1).collect(), key=lambda r: r.vec_id
    )
    X = _pq_quant(np.stack([np.asarray(r.emb, dtype=np.float64) for r in batch]))
    tot = 0
    for m in range(PQ_M):
        Xm = X[:, m * _PQ_SUB : (m + 1) * _PQ_SUB]
        D = ((Xm[:, None, :] - C[m][None, :, :]) ** 2).sum(axis=2)
        tot += int(D.min(axis=1).sum())
    n = len(batch)
    assert rows[1].mean_qerr == (2 * tot + n) // (2 * n)


def test_streaming_ingest_sink_skips_replayed_batch(spark, chain, tmp_path):
    """The replay gate: re-applying a micro-batch at or below the
    committed high-water mark commits NOTHING (no duplicate code rows,
    no new generation); the next batch id applies normally."""
    from streamroom_bigdata_spark.operators.annindex import (
        streaming_ann_index_sink,
    )
    from streamroom_bigdata_spark.sources import load_table

    _, emb = chain
    idx = str(tmp_path / "replay_idx")
    ann_index_build(spark, idx, emb.filter(F.col("vec_id") % 3 == 0))
    sink = streaming_ann_index_sink(idx)
    raw = load_table(spark, SF_SMOKE, "embeddings")
    b1 = raw.filter(F.col("vec_id") % 3 == 1)

    sink(b1, 0)
    gens_after_first = [
        r["generation"] for r in manifest_history(spark, f"{idx}/{_CODES}")
    ]
    n_after_first = manifest_history(spark, f"{idx}/{_CODES}")[-1]["n_rows"]

    sink(b1, 0)  # crash replay: same batch id
    hist = manifest_history(spark, f"{idx}/{_CODES}")
    assert [r["generation"] for r in hist] == gens_after_first
    assert hist[-1]["n_rows"] == n_after_first
    assert hist[-1]["batch_id"] == 0

    sink(raw.filter(F.col("vec_id") % 3 == 2), 1)  # next batch applies
    hist = manifest_history(spark, f"{idx}/{_CODES}")
    assert hist[-1]["batch_id"] == 1
    assert hist[-1]["n_rows"] > n_after_first


def test_streaming_probe_sink_serves_and_sees_midstream_ingest(
    spark, chain, tmp_path
):
    """The serving twin: streamed queries get committed-index neighbors
    identical to a batch probe, and because the index generation is
    re-resolved per micro-batch, an ingest landing BETWEEN batches is
    visible to the next one (two availableNow runs share a checkpoint:
    run 1 probes the pre-ingest index, run 2 the post-ingest one)."""
    import os

    from streamroom_bigdata_spark.operators.annindex import (
        streaming_ann_probe_sink,
    )
    from streamroom_bigdata_spark.sources import load_table

    _, emb = chain
    idx = str(tmp_path / "serve_idx")
    ann_index_build(spark, idx, emb.filter(F.col("vec_id") % 3 == 0))
    ann_index_ingest(spark, idx, emb.filter(F.col("vec_id") % 3 == 1))

    raw = load_table(spark, SF_SMOKE, "embeddings")
    src = tmp_path / "qsrc"
    out = str(tmp_path / "qout")
    ckpt = str(tmp_path / "qckpt")

    def run_once(qfile: str, vec_pred):
        part = str(src / qfile)
        raw.filter(vec_pred).coalesce(1).write.parquet(part)
        stream = spark.readStream.schema(raw.schema).parquet(str(src) + "/*")
        q = (
            stream.writeStream.foreachBatch(streaming_ann_probe_sink(idx, out))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    qids = [int(r.query_id) for r in _queries_of(emb).collect()]
    run_once("q1", F.col("vec_id").isin(qids[:3]))
    batch_dirs = sorted(os.listdir(out))
    assert len(batch_dirs) == 1
    served1 = sorted(
        map(tuple, spark.read.parquet(f"{out}/{batch_dirs[0]}").collect())
    )
    expect1 = sorted(
        map(
            tuple,
            ann_index_probe(
                spark, idx, _queries_of(emb).filter(F.col("query_id").isin(qids[:3]))
            ).collect(),
        )
    )
    assert served1 == expect1

    # mid-stream ingest: batch 2 lands, THEN the remaining queries stream
    ann_index_ingest(spark, idx, emb.filter(F.col("vec_id") % 3 == 2))
    run_once("q2", F.col("vec_id").isin(qids[3:]))
    new_dir = [d for d in sorted(os.listdir(out)) if d not in batch_dirs]
    assert len(new_dir) == 1
    served2 = sorted(
        map(tuple, spark.read.parquet(f"{out}/{new_dir[0]}").collect())
    )
    expect2 = sorted(
        map(
            tuple,
            ann_index_probe(
                spark, idx, _queries_of(emb).filter(F.col("query_id").isin(qids[3:]))
            ).collect(),
        )
    )
    assert served2 == expect2
    # run 2 must see batch-2 vectors — proof the generation re-resolved
    assert any(t[1] % 3 == 2 for t in served2)
