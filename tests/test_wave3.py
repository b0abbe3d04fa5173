"""Round-7 third-wave operators: winnowing fingerprints, FastSS ED<=1
join, Markov transitions, A/B z-test.

The DuckDB oracles already pin exact results on the fixtures; these tests
pin the ALGORITHMIC guarantees the fixtures can't exercise — the winnowing
detection theorem on planted shared runs, and FastSS losslessness on
insert/delete pairs (every c_name has the same length, so the registered
query only ever sees substitutions).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators.fuzzyjoin import ed1_self_join
from streamroom_bigdata_spark.operators.text import (
    WINNOW_K,
    WINNOW_W,
    _winnow_fp_rows,
)

SF = "/root/testdata/sf0.01"


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[len(b)]


def test_winnowing_detects_planted_shared_run(spark):
    """Winnowing theorem: any shared run of >= w + k - 1 consecutive
    tokens yields at least one common fingerprint, wherever it sits."""
    rng = random.Random(7)
    vocab = [f"v{i}" for i in range(500)]
    shared = [rng.choice(vocab) for _ in range(WINNOW_K + WINNOW_W - 1)]
    rows = []
    for doc_id in range(20):
        pre = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        post = [rng.choice(vocab) for _ in range(rng.randint(5, 40))]
        rows.append((doc_id, " ".join(pre + shared + post)))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    fps: dict[int, set] = {}
    for r in _winnow_fp_rows(df).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    common = set.intersection(*fps.values())
    assert common, "planted shared run must produce a shared fingerprint"


def test_winnowing_density(spark):
    """Selected distinct fingerprints are a small fraction of the shingle
    count (expected ~2/(w+1) before dedup) — the compression that makes
    the index shippable."""
    rng = random.Random(11)
    toks = [f"v{rng.randrange(400)}" for _ in range(2000)]
    df = spark.createDataFrame(
        [(0, " ".join(toks))], "doc_id int, text string"
    )
    n = _winnow_fp_rows(df).count()
    n_shingles = len(toks) - WINNOW_K + 1
    assert n < n_shingles * 0.75


def test_ed1_join_lossless_with_insertions(spark):
    """FastSS blocking finds EVERY ED<=1 pair on a workload with
    substitutions, insertions, and deletions (brute force is the truth)."""
    rng = random.Random(3)
    base = [
        "".join(rng.choice("abcde") for _ in range(rng.randint(4, 9)))
        for _ in range(40)
    ]
    mutated = []
    for s in base:
        p = rng.randrange(len(s))
        mutated.append(s[:p] + rng.choice("abcde") + s[p:])      # insertion
        mutated.append(s[:p] + s[p + 1 :])                        # deletion
        mutated.append(s[:p] + rng.choice("xyz") + s[p + 1 :])    # substitution
    names = sorted(set(base + mutated) - {""})
    df = spark.createDataFrame([(s,) for s in names], "s string")
    got = {
        (r["name_a"], r["name_b"], r["dist"])
        for r in ed1_self_join(df, "s").collect()
    }
    want = {
        (a, b, _levenshtein(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if _levenshtein(a, b) <= 1
    }
    assert got == want


def test_markov_rows_normalize(spark):
    from streamroom_bigdata_spark.operators.behavior import markov_transitions

    out = markov_transitions(spark, SF)
    sums = (
        out.groupBy("prev_type")
        .agg(F.sum("p_next").alias("s"), F.sum("n_trans").alias("n"))
        .collect()
    )
    assert sums
    for r in sums:
        assert abs(r["s"] - 1.0) < 1e-4, r


def test_ab_test_counts_consistent(spark):
    from streamroom_bigdata_spark.operators.behavior import ab_test_proportions

    row = ab_test_proportions(spark, SF).collect()[0]
    total = (
        spark.read.parquet(f"{SF}/events.parquet").count()
    )
    assert row["n_a"] + row["n_b"] == total
    assert 0 < row["conv_a"] < row["n_a"]
    assert 0 < row["conv_b"] < row["n_b"]
    assert row["z_score"] is not None


def test_bm25_matches_python_reference(spark):
    """Exact replication: BM25 top-k recomputed in pure Python from the
    token lists must equal the distributed result (scores to 6 dp)."""
    import math

    from streamroom_bigdata_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        BM25_TOPK,
        QUERY_TERMS,
        bm25_search,
    )

    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {
        t: sum(1 for toks in docs.values() if t in toks) for t in QUERY_TERMS
    }
    scores = {}
    for doc_id, toks in docs.items():
        s = 0.0
        for t in QUERY_TERMS:
            tf = toks.count(t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(toks) / avgdl)
            )
        if s > 0:
            scores[doc_id] = round(s, 6)
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:BM25_TOPK]
    got = [
        (r["doc_id"], r["score"]) for r in bm25_search(spark, SF).collect()
    ]
    assert got == want


def test_rrf_fuses_both_modalities(spark):
    from streamroom_bigdata_spark.operators.retrieval import (
        RRF_TOPK,
        rrf_hybrid_search,
    )

    rows = rrf_hybrid_search(spark, SF).collect()
    assert len(rows) == RRF_TOPK
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    # a doc present in both top-100 lists scores at least 2/(60+100)
    assert scores[0] > 1.0 / 160


def test_count_min_overestimates_only(spark):
    from streamroom_bigdata_spark.operators.profile import (
        CMS_WIDTH,
        count_min_tokens,
    )

    rows = count_min_tokens(spark, SF).collect()
    assert rows
    total_tokens = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split("text", " ")))
        .count()
    )
    for r in rows:
        assert r["overestimate"] >= 0, r
        # CMS error bound: overestimate <= 2N/w with prob 1 - 2^-depth;
        # allow 4x slack so the test never flakes on the fixture
        assert r["overestimate"] <= 4 * 2 * total_tokens / CMS_WIDTH, r


def test_sampled_quantiles_error_bound(spark):
    """The deterministic 10% sample's quantiles track the full-data exact
    quantiles (loose DKW-style tolerance on this fixture)."""
    from streamroom_bigdata_spark.operators.sampling import (
        SQ_PCTS,
        sampled_quantiles,
    )

    got = {r["l_returnflag"]: r for r in sampled_quantiles(spark, SF).collect()}
    pcts = list(SQ_PCTS)
    full = {
        r["l_returnflag"]: r["qs"]
        for r in spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(
            F.percentile(
                F.col("l_extendedprice").cast("double"),
                F.array(*[F.lit(p) for p in pcts]),
            ).alias("qs")
        )
        .collect()
    }
    for flag, row in got.items():
        assert row["n_sampled"] > 100
        for i, p in enumerate(pcts):
            exact = full[flag][i]
            sampled = row[f"p{int(p * 100)}"]
            assert abs(sampled - exact) / exact < 0.15, (flag, p, sampled, exact)


def test_lateral_matches_window_topk(spark):
    """Catalyst's decorrelated LATERAL equals the window top-k spelling."""
    from pyspark.sql import Window

    from streamroom_bigdata_spark.operators.relational import lateral_top_orders

    got = {
        (r["c_custkey"], r["o_orderkey"]) for r in lateral_top_orders(spark, SF).collect()
    }
    cust = spark.read.parquet(f"{SF}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    want = {
        (r["o_custkey"], r["o_orderkey"])
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .collect()
    }
    assert got == want


def test_recursive_month_spine_continuity(spark):
    """The recursive spine is gapless month-by-month, covers the data's
    span exactly, and its counts reconcile with the total order count."""
    from streamroom_bigdata_spark.operators.changes import recursive_month_spine

    rows = sorted(
        recursive_month_spine(spark, SF).collect(), key=lambda r: r["month"]
    )
    months = [r["month"] for r in rows]
    for a, b in zip(months, months[1:]):
        nxt = (a.year + (a.month == 12), a.month % 12 + 1)
        assert (b.year, b.month) == nxt, (a, b)
    total = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r["n_orders"] for r in rows) == total
    assert any(r["n_orders"] == 0 for r in rows) or len(months) >= 12


def test_kmeans_assignment_sane(spark):
    """Every vector assigned exactly once to one of K clusters with a
    nonnegative distance; multiple clusters survive 5 iterations."""
    from streamroom_bigdata_spark.operators.kmeans import KM_K, kmeans_clusters

    rows = kmeans_clusters(spark, SF).collect()
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert len(rows) == n_emb
    assert len({r["vec_id"] for r in rows}) == n_emb
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(KM_K))
    assert len(clusters) >= 2
    assert all(r["sq_dist"] >= 0 for r in rows)


def test_curation_v3_decontamination_invariants(spark):
    """v3 output: no benchmark docs, no doc sharing >= CONTAM_MIN_SHARED
    fingerprints with the benchmark set, and v3 ⊆ v1 minus benchmark."""
    from streamroom_bigdata_spark.operators.curation import (
        BENCHMARK_MAX_ID,
        CONTAM_MIN_SHARED,
        curation_pipeline,
        curation_pipeline_v3,
    )
    from streamroom_bigdata_spark.operators.text import _winnow_fp_rows

    v3 = {r["doc_id"] for r in curation_pipeline_v3(spark, SF).collect()}
    v1 = {r["doc_id"] for r in curation_pipeline(spark, SF).collect()}
    assert all(d >= BENCHMARK_MAX_ID for d in v3)
    assert v3 <= v1

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    fps: dict[int, set] = {}
    for r in _winnow_fp_rows(docs).collect():
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    bench_fps = set().union(
        *[fps.get(d, set()) for d in range(BENCHMARK_MAX_ID)]
    )
    for d in v3:
        assert len(fps.get(d, set()) & bench_fps) < CONTAM_MIN_SHARED, d


def test_round6_matches_decimal_half_up():
    """kmeans' vectorized HALF_UP rounding helper agrees with the exact
    decimal HALF_UP reference (what Spark's F.round and DuckDB's round
    implement) across magnitudes, signs, and near-boundary values —
    hypothesis-style sweep without the Spark session."""
    import decimal
    import random

    import numpy as np

    from streamroom_bigdata_spark.operators.kmeans import _round6

    def ref(x: float) -> float:
        return float(
            decimal.Decimal(repr(x)).quantize(
                decimal.Decimal("0.000001"), rounding=decimal.ROUND_HALF_UP
            )
        )

    rng = random.Random(1234)
    cases = [0.0, 1e-7, -1e-7, 0.1234565, -0.1234565, 123.4567894999]
    cases += [rng.uniform(-100, 100) for _ in range(5000)]
    # values engineered near the 6th-decimal boundary
    cases += [round(rng.uniform(0, 1), 6) + 4.9e-7 for _ in range(2000)]
    got = _round6(np.array(cases))
    for x, g in zip(cases, got):
        assert f"{g:.6f}" == f"{ref(x):.6f}", (x, g, ref(x))
