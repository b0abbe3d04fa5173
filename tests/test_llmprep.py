"""Property tests for the training-data prep operators (operators/llmprep.py).

Hash-parity with DuckDB is the driver's job (tools/check_oracle.py); these
pin the semantic invariants the hashes can't express."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import llmprep
from streamroom_bigdata_spark.sources import load_table


def test_pack_sequences_budget_invariants(spark, sf_dir):
    """Every doc lands in exactly one sequence; a sequence's tokens exceed
    the budget by at most its final document (streaming-pack guarantee);
    within a (source, shard) group sequence ids are dense from 0."""
    packed = llmprep.pack_sequences(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    assert sum(r.n_docs for r in packed) == n_docs

    max_doc_tokens = docs.select(
        F.max(F.size(F.split("text", " ")))
    ).first()[0]
    for r in packed:
        assert r.total_tokens <= llmprep.PACK_BUDGET + max_doc_tokens
    by_group: dict[tuple, list[int]] = {}
    for r in packed:
        by_group.setdefault((r.source, r.shard), []).append(r.seq_id)
    for seqs in by_group.values():
        assert sorted(seqs) == list(range(len(seqs)))


def test_pack_sequences_fills_before_opening_new(spark, sf_dir):
    """Non-final sequences in a group are at least budget-full minus the
    max doc size — packing never opens a new sequence early."""
    packed = llmprep.pack_sequences(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    max_doc_tokens = docs.select(F.max(F.size(F.split("text", " ")))).first()[0]
    last = packed.groupBy("source", "shard").agg(F.max("seq_id").alias("last_seq"))
    nonfinal = packed.join(last, ["source", "shard"]).filter(
        F.col("seq_id") < F.col("last_seq")
    )
    bad = nonfinal.filter(
        F.col("total_tokens") < llmprep.PACK_BUDGET - max_doc_tokens
    ).count()
    assert bad == 0


def test_repetition_signals_bounds(spark, sf_dir):
    rows = llmprep.repetition_signals(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert len(rows) == docs.filter(F.size(F.split("text", " ")) >= 2).count()
    for r in rows:
        assert r.total_bigrams == r.distinct_bigrams or r.dup_bigram_frac > 0
        assert 0 < r.top_bigram_frac <= 1.0
        assert 0 <= r.dup_bigram_frac < 1.0
        assert r.top_bigram_count <= r.total_bigrams
        assert r.distinct_bigrams <= r.total_bigrams


def test_contamination_excludes_benchmark_and_bounds(spark, sf_dir):
    rows = llmprep.contamination_trigrams(spark, sf_dir).collect()
    for r in rows:
        assert r.doc_id % llmprep.BENCH_MOD != 0
        assert 0 <= r.n_contaminated <= r.n_grams
        assert 0.0 <= r.contamination_frac <= 1.0


def test_embedding_quantize_error_bound(spark, sf_dir):
    """Reconstruction error of symmetric int8 quantization is bounded by
    scale/2 per element, and no quantized magnitude exceeds 127."""
    rows = llmprep.embedding_quantize(spark, sf_dir).collect()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n_vecs
    for r in rows:
        assert r.max_abs_err <= r.scale / 2 + 1e-6
        assert r.sum_q_abs <= 127 * 64
        assert 0 <= r.n_saturated <= 64


def test_train_val_split_partitions_corpus(spark, sf_dir):
    rows = llmprep.train_val_split(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    total = {"train": 0, "val": 0}
    for r in rows:
        total[r.split] += r.n_docs
    frac = total["train"] / (total["train"] + total["val"])
    assert 0.8 < frac < 0.97  # ~TRAIN_PCT% with hash noise


def test_source_mix_sample_rates_follow_weights(spark, sf_dir):
    from streamroom_bigdata_spark.functions.hashing import portable_hash_mod

    docs = load_table(spark, sf_dir, "documents")
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    kept = {
        r.source: r.n
        for r in llmprep.source_mix_sample(spark, sf_dir)
        .groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    pcts = {
        r.source: 20 + r.h
        for r in docs.select("source", portable_hash_mod(F.col("source"), 81).alias("h"))
        .distinct().collect()
    }
    for src, total in totals.items():
        rate = kept.get(src, 0) / total
        # hash noise at n≈tens..hundreds per source: generous tolerance
        assert abs(rate - pcts[src] / 100) < 0.25


def test_dedup_source_priority_covers_corpus_and_agrees_with_exact(spark, sf_dir):
    out = llmprep.dedup_source_priority(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    rows = out.collect()
    assert sum(r.n_copies for r in rows) == docs.count()
    # same duplicate-group structure as dedup_exact, different keep policy
    from streamroom_bigdata_spark.operators.dedup import dedup_exact

    assert len(rows) == dedup_exact(spark, sf_dir).count()


def test_quality_gate_dynamic_keeps_top_three_quartiles(spark, sf_dir):
    out = llmprep.quality_gate_dynamic(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    kept = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, total in totals.items():
        frac = kept.get(src, 0) / total
        assert 0.5 < frac <= 0.8  # ~75%, tie-dependent
    # every kept row really is at or above its source's 25th percentile rank
    assert out.filter(F.col("pr") < 0.25).count() == 0


def test_chunking_covers_and_overlaps(spark, sf_dir):
    """Every token of every doc appears in at least one chunk; consecutive
    chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE tokens; reassembling
    chunk 0's stride-prefixes + the final chunk reproduces the document."""
    chunks = llmprep.chunk_documents(spark, sf_dir)
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").collect()}
    by_doc: dict = {}
    for r in chunks.collect():
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = (r.chunk_text, r.n_tokens)
    assert set(by_doc) == set(docs)
    for doc_id, text in list(docs.items())[:40]:
        toks = text.split(" ")
        got = by_doc[doc_id]
        assert sorted(got) == list(range(len(got)))  # dense chunk ids
        rebuilt: list = []
        for cid in sorted(got):
            ctoks = got[cid][0].split(" ")
            assert got[cid][1] == len(ctoks) <= llmprep.CHUNK_TOKENS
            rebuilt = rebuilt[: cid * llmprep.CHUNK_STRIDE] + ctoks
        assert rebuilt == toks


def test_curation_v2_stats_are_consistent(spark, sf_dir):
    rows = llmprep.curation_pipeline_v2(spark, sf_dir).collect()
    n_docs_total = sum(r.n_docs for r in rows)
    mixed = llmprep.source_mix_sample(spark, sf_dir).count()
    assert 0 < n_docs_total < mixed  # gate + dedup must both bite
    for r in rows:
        assert r.n_chunks >= r.n_docs          # >= 1 chunk per kept doc
        assert r.total_chunk_tokens >= r.n_chunks  # chunks are non-empty


def test_polymorphic_udtf_schema_follows_argument(spark):
    """D5+ (Spark 4 analyze()): the UDTF's output schema is computed at
    plan time from the literal n — 2-gram and 3-gram calls get different
    column sets; rows agree with a driver-side recompute."""
    from streamroom_bigdata_spark.operators.text import ngrams_udtf

    spark.udtf.register("ngrams_poly", ngrams_udtf())
    two = spark.sql(
        "SELECT * FROM ngrams_poly('a b c d', 2)"
    )
    three = spark.sql(
        "SELECT * FROM ngrams_poly('a b c d', 3)"
    )
    assert two.columns == ["pos", "g1", "g2", "gram"]
    assert three.columns == ["pos", "g1", "g2", "g3", "gram"]
    assert [r.gram for r in two.orderBy("pos").collect()] == [
        "a b", "b c", "c d"
    ]
    assert [r.gram for r in three.orderBy("pos").collect()] == [
        "a b c", "b c d"
    ]


def test_temperature_mix_upweights_small_sources(spark, tmp_path):
    """α=0.5 mixing: the keep RATE of a small source must exceed that of a
    large one (that's the whole point vs proportional sampling), and with
    a budget larger than the corpus every rate caps at 1.0 (everything
    kept)."""
    rows = [(i, f"text {i}", "en", "big" if i < 450 else "small", 10)
            for i in range(500)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    kept = llmprep.temperature_mix_sample(spark, str(tmp_path)).collect()
    n_kept = {"big": 0, "small": 0}
    for r in kept:
        n_kept[r.source] += 1
    rate_big, rate_small = n_kept["big"] / 450, n_kept["small"] / 50
    assert rate_small > rate_big, (n_kept, rate_big, rate_small)
    # determinism: identical output on a second run
    again = {(r.doc_id, r.source) for r in
             llmprep.temperature_mix_sample(spark, str(tmp_path)).collect()}
    assert again == {(r.doc_id, r.source) for r in kept}


def test_temperature_mix_budget_above_corpus_keeps_all(spark, tmp_path):
    """MIX_TARGET ≥ |corpus| ⇒ every source rate hits the least(1.0, ...)
    cap and the sample is the whole corpus."""
    rows = [(i, f"text {i}", "en", f"s{i % 3}", 10) for i in range(60)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    assert llmprep.temperature_mix_sample(spark, str(tmp_path)).count() == 60


def test_curation_v4_subset_and_budget(spark, sf_dir):
    """v4 ⊆ v3 (the new stages only REMOVE), the mixed sample respects the
    V4_MIX_TARGET budget scale, and the draw is deterministic."""
    from streamroom_bigdata_spark.operators.curation import (
        V4_MIX_TARGET,
        curation_pipeline_v3,
        curation_pipeline_v4,
    )

    v3_ids = {r.doc_id for r in curation_pipeline_v3(spark, sf_dir).collect()}
    v4 = curation_pipeline_v4(spark, sf_dir).collect()
    v4_ids = {r.doc_id for r in v4}
    assert v4_ids <= v3_ids
    # Bernoulli draw against a target: allow wide slack, reject blowups
    assert len(v4) <= 2 * V4_MIX_TARGET
    again = {r.doc_id for r in curation_pipeline_v4(spark, sf_dir).collect()}
    assert again == v4_ids


def test_token_budget_apportion_sums_exactly_and_breaks_ties(spark, tmp_path):
    """3 sources with token counts 1/1/1 and budget B: floor quotas leave
    B mod 3 leftover units, which go to the lexicographically-first
    sources (equal remainders); quotas always sum to the budget exactly."""
    from streamroom_bigdata_spark.operators.llmprep import (
        APPORTION_BUDGET,
        token_budget_apportion,
    )

    docs = [
        (0, "a", "en", "s_b", 1),
        (1, "b", "en", "s_a", 1),
        (2, "c", "en", "s_c", 1),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.source: r for r in token_budget_apportion(spark, str(tmp_path)).collect()}
    assert sum(r.allocated for r in rows.values()) == APPORTION_BUDGET
    # B = 1_000_000, 3 sources x 1 token: floor = 333333, leftover 1 ->
    # goes to the lexicographically-first source among equal remainders
    assert rows["s_a"].allocated == 333334
    assert rows["s_b"].allocated == 333333
    assert rows["s_c"].allocated == 333333


def test_bigram_logprob_hand_computed(spark, monkeypatch):
    """Single planted doc 'a b a b': bigram counts (a,b)=2 (b,a)=1,
    prev totals a=2 b=1, vocab 2 → mean of ln(3/4), ln(2/3), ln(3/4)."""
    import math

    from streamroom_bigdata_spark.operators import llmprep

    df = spark.createDataFrame(
        [(0, "a b a b", "en", "src0", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.llmprep.load_table",
        lambda spark_, sf_, name: df,
    )
    out = llmprep.bigram_logprob_quality(spark, "ignored").collect()
    assert len(out) == 1 and out[0].n_bigrams == 3
    expect = (math.log(3 / 4) + math.log(2 / 3) + math.log(3 / 4)) / 3
    assert abs(out[0].avg_logprob - round(expect, 6)) < 2e-6


def test_bpe_merges_match_python_replay(spark, monkeypatch):
    """The classic Sennrich corpus replayed through a reference Python BPE
    trainer with the same tie-break (count DESC, pair ASC) and greedy
    leftmost-non-overlapping merge — learned merge table matches exactly;
    an 'aaaa' word pins the overlap parity rule."""
    from streamroom_bigdata_spark.operators import llmprep

    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["aaaa"] * 4
    )
    df = spark.createDataFrame(
        [(0, " ".join(corpus), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.llmprep.load_table",
        lambda spark_, sf_, name: df,
    )
    out = sorted(
        (r.merge_round, r.left_sym, r.right_sym, r.pair_count)
        for r in llmprep.bpe_train_merges(spark, "ignored").collect()
    )

    from collections import Counter

    words = Counter(corpus)
    seqs = {w: list(w) for w in words}
    expect = []
    for rnd in range(1, llmprep.BPE_ROUNDS + 1):
        pairs = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        (a, b), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        expect.append((rnd, a, b, c))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    assert out == sorted(expect)
    # the aaaa word must have contributed overlap-free counts somewhere:
    # ('a','a') appears 3 times per occurrence in pair COUNTING but merges
    # twice — the parity rule; assert the reference replay agreed with the
    # engine on every round, which the equality above already pins.


def test_bpe_encode_matches_python_replay(spark, monkeypatch):
    """bpe_encode_docs replayed in pure Python on the same Sennrich+
    'aaaa' corpus: train merges (reference trainer above), encode every
    word by greedy leftmost application, assign ids by lexicographic
    rank over the final symbol vocabulary, concatenate in token order —
    the engine's id stream, token count, and subword count must match
    exactly (two docs pin per-doc assembly order)."""
    from collections import Counter

    from streamroom_bigdata_spark.operators import llmprep

    doc0 = ["low"] * 3 + ["newest", "aaaa", "lower"]
    doc1 = ["widest", "aaaa", "aaaa", "low"]
    df = spark.createDataFrame(
        [
            (0, " ".join(doc0), "en", "s", 1),
            (1, " ".join(doc1), "en", "s", 1),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.llmprep.load_table",
        lambda spark_, sf_, name: df,
    )
    out = {
        r.doc_id: r for r in llmprep.bpe_encode_docs(spark, "ignored").collect()
    }

    words = Counter(doc0 + doc1)
    seqs = {w: list(w) for w in words}
    for _ in range(llmprep.BPE_ROUNDS):
        pairs = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += words[w]
        (a, b), _c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, syms in seqs.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            seqs[w] = merged
    vocab = {s: i + 1 for i, s in enumerate(sorted({s for v in seqs.values() for s in v}))}
    for doc_id, toks in ((0, doc0), (1, doc1)):
        ids = [vocab[s] for t in toks for s in seqs[t]]
        row = out[doc_id]
        assert row.n_toks == len(toks)
        assert row.n_syms == len(ids)
        assert row.ids == " ".join(str(i) for i in ids)
