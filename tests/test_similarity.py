"""Similarity search, UDAF, and multimodal plumbing tests (L3/L5, D2-D4)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import multimodal, similarity
from streamroom_bigdata_spark.sources import load_table


def test_bruteforce_topk_matches_numpy(spark, sf_dir):
    emb = {
        r.vec_id: np.array(r.embedding, dtype="float64")
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    got = {}
    for r in similarity.cosine_topk(spark, sf_dir).collect():
        got.setdefault(r.query_id, []).append((r.rnk, r.neighbor_id, r.cosine))
    for qid in similarity.QUERY_IDS:
        q = emb[qid]
        sims = {
            vid: float(np.dot(q, v) / (np.linalg.norm(q) * np.linalg.norm(v)))
            for vid, v in emb.items()
            if vid != qid
        }
        expected = sorted(
            ((round(s, 6), vid) for vid, s in sims.items()),
            key=lambda t: (-t[0], t[1]),
        )[: similarity.TOP_K]
        got_q = sorted(got[qid])
        assert [vid for _, vid in expected] == [nid for _, nid, _ in got_q]


def test_lsh_recall_vs_bruteforce(spark, sf_dir):
    exact = {}
    for r in similarity.cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in similarity.ann_lsh_cosine(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(approx.get(q, set()) & exact[q]) / len(exact[q]) for q in exact
    ]
    # approximate op: same-bucket candidates must recover a useful fraction
    assert sum(recalls) / len(recalls) >= 0.2
    # and every approx neighbor must be a genuine corpus vector (no dups)
    for q, ns in approx.items():
        assert q not in ns


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with nprobe=3 of 10 inverted lists must recover a substantial
    fraction of the exact top-k (no guarantees on near-orthogonal fixture
    vectors, but well above the 30% nprobe/k floor in practice)."""
    exact = {}
    for r in similarity.cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    approx = {}
    for r in similarity.ann_ivf_cosine(spark, sf_dir).collect():
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [
        len(approx.get(q, set()) & ns) / len(ns) for q, ns in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.25
    for q, ns in approx.items():
        assert q not in ns and len(ns) <= similarity.TOP_K


def test_pq_recall_and_code_fidelity(spark, sf_dir):
    """PQ scores the whole corpus through 8 4-bit codes: recall@10 must
    clear a useful floor (coarse codes, no candidate pruning — the
    memory-bounded tradeoff), self is excluded, exactly TOP_K rows per
    query, and every estimated cosine is a plausible unit-dot (|est|
    bounded by ~1 plus quantization slack)."""
    exact = {}
    for r in similarity.cosine_topk(spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    rows = similarity.ann_pq_cosine(spark, sf_dir).collect()
    approx: dict[int, set[int]] = {}
    for r in rows:
        approx.setdefault(r.query_id, set()).add(r.neighbor_id)
        assert abs(r.est_cosine) <= 1.05
    recalls = [
        len(approx.get(q, set()) & ns) / len(ns) for q, ns in exact.items()
    ]
    assert sum(recalls) / len(recalls) >= 0.15
    for q, ns in approx.items():
        assert q not in ns and len(ns) == similarity.TOP_K


def test_near_dup_lsh_subset_of_exact(spark, sf_dir):
    """Every LSH-candidate pair is a true near-dup (no false positives after
    the exact re-filter) and recall is above the sign-LSH theoretical floor
    ((1 - theta/pi)^n_planes ~ 0.16 at cosine 0.4 with 4 planes)."""
    exact = {
        (r.vec_a, r.vec_b) for r in similarity.embedding_near_dup(spark, sf_dir).collect()
    }
    approx = {
        (r.vec_a, r.vec_b)
        for r in similarity.embedding_near_dup_lsh(spark, sf_dir).collect()
    }
    assert approx <= exact
    assert len(approx) / len(exact) >= 0.1


def test_centroid_udaf_matches_builtin(spark, sf_dir):
    builtin = {
        (r.label, r.dim): r.centroid_val
        for r in similarity.embedding_centroids(spark, sf_dir).collect()
    }
    udaf = similarity.embedding_centroid_udaf(spark, sf_dir).collect()
    for r in udaf:
        for dim, v in enumerate(r.centroid):
            assert abs(builtin[(r.label, dim)] - round(v, 6)) < 1e-5


def test_vector_norms_unit_length(spark, sf_dir):
    rows = similarity.vector_norms(spark, sf_dir).collect()
    # fixture embeddings are unit-normalized
    assert all(abs(r.l2_norm - 1.0) < 1e-3 for r in rows)
    anchor = [r for r in rows if r.vec_id == 0][0]
    assert abs(anchor.dot_to_anchor - 1.0) < 1e-3


def test_multimodal_payload_roundtrip(spark, sf_dir):
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    assets = multimodal.multimodal_table(spark, sf_dir).collect()
    for r in assets[:20]:
        assert bytes(r.payload).decode("utf-8") == docs[r.asset_id]
        assert r.meta.n_chars == len(docs[r.asset_id])


def test_decode_features_deterministic_stub(spark, sf_dir):
    rows = {r.asset_id: r for r in multimodal.multimodal_decode_features(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    for doc_id, text in list(docs.items())[:20]:
        b = text.encode("utf-8")
        r = rows[doc_id]
        assert r.n_bytes == len(b)
        assert r.first_byte == b[0]
        assert r.last_byte == b[-1]
        assert r.byte_checksum == sum(b) % 1_000_000_007
        assert r.mean_byte_micro == (sum(b) * 1_000_000) // len(b)


def test_decode_image_compressed_formats_still_gate():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_decode_image_ppm_with_comments():
    """Real PPM parse: comments and arbitrary header whitespace are legal;
    channel means come from de-interleaved raster bytes."""
    raster = bytes([10, 20, 30, 110, 120, 130, 210, 220, 230, 0, 0, 0])
    payload = b"P6 # a comment\n# another\n 3\t1 # w h\n255\n" + raster
    out = multimodal.decode_image(payload)
    assert out["format"] == "ppm" and (out["width"], out["height"]) == (3, 1)
    # hand-checked wrong-stride trap: means must de-interleave R,G,B
    assert out["mean_r_micro"] == ((10 + 110 + 210 + 0) * 1_000_000) // 3
    assert out["mean_g_micro"] == ((20 + 120 + 220) * 1_000_000) // 3
    assert out["mean_b_micro"] == ((30 + 130 + 230) * 1_000_000) // 3


def test_decode_image_bmp_bottom_up_padded_rows():
    """Real BMP parse: 3x2 24bpp — BGR byte order, 4-byte row padding, and
    bottom-up row order must all be honored (means are order-insensitive, so
    use per-channel-distinct values to catch BGR/RGB swaps)."""
    # rows as seen top-down, RGB tuples
    px = [[(1, 2, 3), (4, 5, 6), (7, 8, 9)],
          [(10, 11, 12), (13, 14, 15), (16, 17, 18)]]
    w, h = 3, 2
    stride = (w * 3 + 3) & ~3  # 12 -> 12; use w=3 -> 9 -> padded 12
    raster = b""
    for row in reversed(px):  # bottom-up on disk
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)  # BGR
        raster += line + b"\x00" * (stride - len(line))
    data_off = 14 + 40
    header = (
        b"BM" + (data_off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00" + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
        + b"\x00" * 16
    )
    out = multimodal.decode_image(header + raster)
    assert out["format"] == "bmp" and (out["width"], out["height"]) == (3, 2)
    n = w * h
    assert out["mean_r_micro"] == (sum(r for row in px for (r, _, _) in row) * 1_000_000) // n
    assert out["mean_g_micro"] == (sum(g for row in px for (_, g, _) in row) * 1_000_000) // n
    assert out["mean_b_micro"] == (sum(b for row in px for (_, _, b) in row) * 1_000_000) // n


def test_multimodal_image_decode_matches_manual(spark, sf_dir):
    """End-to-end: the in-plan PPM assembly + mapInPandas decode agrees with
    a driver-side reimplementation over the raw fixture text."""
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    rows = {r.asset_id: r for r in multimodal.multimodal_image_decode(spark, sf_dir).collect()}
    n_checked = 0
    for doc_id, text in docs.items():
        b = text.encode("utf-8")
        if len(b) < 48 or len(b) != len(text):  # short or non-ASCII: excluded
            assert doc_id not in rows
            continue
        r = rows[doc_id]
        assert (r.width, r.height, r.n_pixels, r.format) == (4, 4, 16, "ppm")
        for off, col in ((0, r.mean_r_micro), (1, r.mean_g_micro), (2, r.mean_b_micro)):
            assert col == (sum(b[:48][off::3]) * 1_000_000) // 16
        n_checked += 1
        if n_checked >= 20:
            break
    assert n_checked > 0


def test_multimodal_non_ascii_excluded_on_both_engines(spark, tmp_path):
    """Planted non-ASCII regression (r9 ADVICE): a doc whose char length
    passes the threshold but whose byte length differs (multi-byte UTF-8)
    must be excluded by BOTH the Spark query and the DuckDB oracle — the
    old byte-filter/char-oracle pair diverged on exactly this row."""
    import duckdb
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a" * 200, "é" * 200, "zz"],  # ascii / non-ascii / short
            "lang": ["en", "fr", "en"],
            "source": ["t", "t", "t"],
            "n_chars": [200, 200, 2],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    for fn, oracle in (
        (multimodal.multimodal_wav_decode, multimodal.wav_decode_oracle),
        (multimodal.multimodal_image_decode, multimodal.image_decode_oracle),
    ):
        got = {r.asset_id: r for r in fn(spark, str(tmp_path)).collect()}
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
        )
        want = {r[0]: r for r in con.execute(oracle).fetchall()}
        con.close()
        assert set(got) == set(want) == {1}, fn.__name__
        # values agree on the surviving ASCII doc (last two stat columns)
        assert tuple(got[1])[-2:] == tuple(want[1])[-2:], fn.__name__

    # frame_sample (multi-row output): the non-ASCII doc's 200 chars pass
    # the char threshold but its 400 payload bytes would yield DIFFERENT
    # frame boundaries — the guard must drop it identically on both sides
    got_rows = sorted(
        tuple(r)
        for r in multimodal.multimodal_frame_sample(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    want_rows = sorted(
        tuple(r) for r in con.execute(multimodal.frame_sample_oracle).fetchall()
    )
    con.close()
    assert {r[0] for r in got_rows} == {1}
    assert got_rows == want_rows


def test_pandas_scorers_agree_with_hof(spark):
    """D2: the Arrow-batched numpy scorers and the HOF column algebra are the
    same float64 math — agreement to 1e-9 on deterministic vectors."""
    from streamroom_bigdata_spark.functions.vector import (
        cosine,
        cosine_pandas,
        dot,
        dot_pandas,
    )

    rows = [
        (
            i,
            [float((i * 7 + j) % 13) - 6.0 for j in range(8)],
            [float((i * 5 + j) % 11) - 5.0 for j in range(8)],
        )
        for i in range(64)
    ]
    df = spark.createDataFrame(rows, "id int, a array<double>, b array<double>")
    got = df.select(
        cosine(F.col("a"), F.col("b")).alias("ch"),
        cosine_pandas("a", "b").alias("cp"),
        dot(F.col("a"), F.col("b")).alias("dh"),
        dot_pandas("a", "b").alias("dp"),
    ).collect()
    for r in got:
        assert abs(r.ch - r.cp) < 1e-9
        assert abs(r.dh - r.dp) < 1e-9


def test_embedding_near_dup_size_guard(spark, sf_dir, monkeypatch):
    """The exact O(n²) baseline must refuse oversized inputs instead of
    silently submitting a quadratic plan."""
    monkeypatch.setattr(similarity, "EMBEDDING_NEAR_DUP_MAX_ROWS", 1)
    with pytest.raises(ValueError, match="O\\(n²\\) exact baseline"):
        similarity.embedding_near_dup(spark, sf_dir)


def test_semantic_dedup_clusters_consistent_with_pair_graph(spark, sf_dir):
    """Every LSH near-dup pair must land in one component; representatives
    are the component min and exactly the keep-flagged rows."""
    labels = {
        r.vec_id: (r.representative, r.keep)
        for r in similarity.semantic_dedup_clusters(spark, sf_dir).collect()
    }
    pairs = similarity.embedding_near_dup_lsh(spark, sf_dir).collect()
    assert len(pairs) > 0 and len(labels) > 0
    for p in pairs:
        assert labels[p.vec_a][0] == labels[p.vec_b][0]
    for vec_id, (rep, keep) in labels.items():
        assert rep <= vec_id
        assert keep == (rep == vec_id)
    # one keep per component
    comps = {rep for rep, _ in labels.values()}
    keeps = {v for v, (rep, keep) in labels.items() if keep}
    assert keeps == comps


def test_arrow_and_codegen_norms_agree(spark):
    """mapInArrow twin returns the same rounded norms as the HOF/codegen
    vector_norms path (shared DuckDB oracle is the cross-engine arbiter;
    this pins the two in-repo paths to each other)."""
    from streamroom_bigdata_spark.operators.similarity import (
        vector_norms,
        vector_norms_arrow,
    )

    sf = "/root/testdata/sf0.001"
    a = {
        (r.vec_id, r.label, r.l2_norm)
        for r in vector_norms_arrow(spark, sf).collect()
    }
    b = {
        (r.vec_id, r.label, r.l2_norm)
        for r in vector_norms(spark, sf).select(
            "vec_id", "label", "l2_norm"
        ).collect()
    }
    assert a == b


def test_decode_wav_chunk_walk_and_signed_samples():
    """The parser must WALK chunks (a LIST chunk before fmt), unpack
    signed int16 (negative samples), and refuse non-PCM — no Spark
    needed, the decoder is plain Python."""
    import struct

    import pytest

    from streamroom_bigdata_spark.operators.multimodal import decode_wav

    samples = [100, -200, 32767, -32768]
    data = struct.pack("<4h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    list_chunk = b"LIST" + struct.pack("<I", 4) + b"INFO"
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(list_chunk) + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + list_chunk
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    out = decode_wav(payload)
    assert out["n_samples"] == 4 and out["sample_rate"] == 8000
    assert out["peak_abs"] == 32768
    abs_sum = 100 + 200 + 32767 + 32768
    assert out["mean_abs_micro"] == abs_sum * 1_000_000 // 4
    assert out["duration_micro"] == 4 * 1_000_000 // 8000

    bad_fmt = struct.pack("<HHIIHH", 85, 1, 8000, 16000, 2, 16)  # MP3 tag
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(bad_fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(bad_fmt)) + bad_fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError):
        decode_wav(bad)
    with pytest.raises(NotImplementedError):
        decode_wav(b"OggS" + bytes(40))


def test_random_projection_jl_is_linear_and_norm_preserving(spark, tmp_path):
    """JL projection: exact linearity (proj(a+b) = proj(a)+proj(b) — it's a
    fixed matrix) and norm concentration (projected norms within a broad
    band of the original) on planted vectors."""
    import numpy as np

    from streamroom_bigdata_spark.operators.similarity import (
        JL_IN_DIM,
        random_projection_jl,
    )

    rng = np.random.default_rng(3)
    a = rng.standard_normal(JL_IN_DIM)
    b = rng.standard_normal(JL_IN_DIM)
    rows = [
        (0, [float(x) for x in a]),
        (1, [float(x) for x in b]),
        (2, [float(x) for x in a + b]),
    ]
    spark.createDataFrame(rows, "vec_id long, embedding array<float>") \
        .write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))

    out = {r.vec_id: np.array(r[1:]) for r in
           random_projection_jl(spark, str(tmp_path)).collect()}
    # linearity to rounding precision
    assert np.allclose(out[0] + out[1], out[2], atol=3e-6)
    # norm concentration: E[|proj|^2] = |x|^2 for the ±1/sqrt(k) matrix
    for vid, orig in ((0, a), (1, b)):
        # float32 storage loses ~1e-7 relative precision; band is generous
        ratio = np.linalg.norm(out[vid]) / np.linalg.norm(orig)
        assert 0.3 < ratio < 3.0, (vid, ratio)


def test_audio_features_kernel_planted_signals():
    """Pure-kernel checks: constant signal → RMS = value, crest 1, zcr 0;
    alternating ± square wave → crest 1, every step a crossing."""
    from streamroom_bigdata_spark.operators.multimodal import audio_features

    const = audio_features([100] * 16)
    assert const["rms"] == 100.0 and const["crest"] == 1.0
    assert const["zero_crossings"] == 0 and const["zcr"] == 0.0
    assert const["energy_flux"] == 1.0

    square = audio_features([100, -100] * 8)
    assert square["rms"] == 100.0 and square["crest"] == 1.0
    assert square["zero_crossings"] == 15 and square["zcr"] == 1.0

    # one loud frame among silence-ish frames → flux = loud/quiet energy
    burst = audio_features([1] * 8 + [10] * 8)
    assert burst["energy_flux"] == 100.0  # (8·100)/(8·1)
    assert burst["peak"] == 10


def test_audio_features_roundtrip_through_real_wav(spark):
    """End-to-end: build a real RIFF payload, decode with the shared
    chunk walk, and check the features on the known byte pattern."""
    from streamroom_bigdata_spark.operators.multimodal import (
        _WAV_DATA,
        _wav_header,
        audio_features,
        decode_wav_samples,
    )

    text = "ab" * 32  # LE int16 samples: 97 + 256·98 = 25185, constant
    payload = _wav_header(_WAV_DATA) + text[: _WAV_DATA // 1].encode()[:_WAV_DATA]
    rate, samples = decode_wav_samples(payload)
    assert rate == 8000
    assert samples == [25185] * 32
    feats = audio_features(samples)
    assert feats["rms"] == 25185.0
    assert feats["crest"] == 1.0 and feats["zero_crossings"] == 0


def test_audio_features_silence_yields_nulls(spark):
    """Degenerate all-zero signal: crest and energy flux are undefined →
    None (and SQL NULL through the Arrow path), never NaN."""
    from streamroom_bigdata_spark.operators.multimodal import audio_features

    silent = audio_features([0] * 16)
    assert silent["rms"] == 0.0
    assert silent["crest"] is None
    assert silent["energy_flux"] is None
    assert silent["zero_crossings"] == 0


def test_pca_power_iteration_matches_numpy(spark, monkeypatch):
    """Planted matrix with one dominant direction: 5 fixed rounds land on
    numpy's top eigenvector of XᵀX (up to the shared sign) and its
    eigenvalue, well inside output precision."""
    import numpy as np

    rng = np.random.default_rng(7)
    direction = rng.normal(size=similarity.DIM)
    direction /= np.linalg.norm(direction)
    scores = rng.normal(scale=10.0, size=200)
    noise = rng.normal(scale=0.1, size=(200, similarity.DIM))
    x = np.outer(scores, direction) + noise
    df = spark.createDataFrame(
        [(i, [float(v) for v in row], 0) for i, row in enumerate(x)],
        "vec_id long, embedding array<float>, label int",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.similarity.load_table",
        lambda spark_, sf_, name: df,
    )
    out = sorted(
        similarity.pca_power_iteration(spark, "ignored").collect(),
        key=lambda r: r.dim,
    )
    got = np.array([r.loading for r in out])
    # replay against float32-quantized X (what the Spark/duckdb read sees)
    x32 = x.astype("float32").astype("float64")
    gram = x32.T @ x32
    evals, evecs = np.linalg.eigh(gram)
    top = evecs[:, -1]
    if np.dot(top, got) < 0:
        top = -top
    assert np.max(np.abs(got - top)) < 1e-4
    assert abs(out[0].eigenvalue - evals[-1]) / evals[-1] < 1e-4
