"""Property tests for the Hamming fuzzy join (operators/fuzzyjoin.py).

The DuckDB oracle proves engine agreement on the fixture; these tests
prove LOSSLESSNESS of the interleaved banding against a brute-force
reference on adversarial random data (clustered mutations, mixed
lengths), where blocking bugs actually hide.
"""

from __future__ import annotations

import random

from pyspark.sql import Row

from streamroom_bigdata_spark.operators.fuzzyjoin import (
    HAMMING_K,
    hamming_self_join,
)


def _brute(rows: list[tuple[int, str]], k: int) -> set[tuple[int, int, int]]:
    out = set()
    for i, (ida, sa) in enumerate(rows):
        for idb, sb in rows[i + 1 :]:
            if len(sa) != len(sb):
                continue
            d = sum(1 for x, y in zip(sa, sb) if x != y)
            if d <= k:
                lo, hi = min(ida, idb), max(ida, idb)
                out.add((lo, hi, d))
    return out


def _mutate(s: str, n: int, rng: random.Random) -> str:
    chars = list(s)
    for p in rng.sample(range(len(s)), n):
        chars[p] = rng.choice("abcxyz0189")
    return "".join(chars)


def test_hamming_join_equals_brute_force_with_planted_typos(spark):
    rng = random.Random(7)
    base = ["prefix-" + "".join(rng.choice("abc019") for _ in range(8))
            for _ in range(40)]
    rows, next_id = [], 0
    for s in base:
        rows.append((next_id, s)); next_id += 1
        # planted near-misses: 1, 2 (in) and 3 (out) mutations, including
        # ADJACENT mutated positions (same contiguous segment — the case
        # contiguous blocking would also catch; interleaving must too)
        for n in (1, 2, 3):
            rows.append((next_id, _mutate(s, n, rng))); next_id += 1
    # mixed lengths must never pair
    rows.append((next_id, "short")); next_id += 1
    rows.append((next_id, "prefix-toolonggg9")); next_id += 1

    df = spark.createDataFrame([Row(id=i, s=s) for i, s in rows])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in hamming_self_join(df, "id", "s", HAMMING_K).collect()
    }
    assert got == _brute(rows, HAMMING_K)


def test_adjacent_mutations_always_caught(spark):
    """Both mutations inside one contiguous third of the string — the
    pigeonhole argument only works because bands are interleaved, and this
    pins exactly that."""
    s = "0123456789abcdef"
    t = list(s); t[3] = "X"; t[4] = "Y"  # adjacent positions
    rows = [(1, s), (2, "".join(t))]
    df = spark.createDataFrame([Row(id=i, s=v) for i, v in rows])
    got = hamming_self_join(df, "id", "s", HAMMING_K).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in got] == [(1, 2, 2)]


def test_long_strings_use_interpreted_fallback_correctly(spark):
    """Strings longer than 8*(k+1) bytes can't pack each band into a
    64-bit integer — the per-row fallback branch must still be exact."""
    rng = random.Random(11)
    base = ["L" * 10 + "".join(rng.choice("ab01") for _ in range(20))
            for _ in range(15)]  # 30 chars > 24
    rows, nid = [], 0
    for s in base:
        rows.append((nid, s)); nid += 1
        for n in (1, 2, 3):
            rows.append((nid, _mutate(s, n, rng))); nid += 1
    df = spark.createDataFrame([Row(id=i, s=s) for i, s in rows])
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in hamming_self_join(df, "id", "s", HAMMING_K).collect()
    }
    assert got == _brute(rows, HAMMING_K)


def test_jaccard_prefix_filter_is_lossless(spark):
    """AllPairs prefix filtering vs brute-force Jaccard on random token
    sets with planted overlaps — losslessness is the theorem under test
    (prefix length n - ceil(t*n) + 1, rare-first global order)."""
    from streamroom_bigdata_spark.operators.fuzzyjoin import (
        JAC_T_DEN,
        JAC_T_NUM,
        jaccard_prefix_self_join,
    )

    rng = random.Random(3)
    vocab = [f"tok{i}" for i in range(60)]
    sets, rows = [], []
    for i in range(50):
        base = rng.sample(vocab, rng.randint(4, 14))
        sets.append((i, set(base)))
        rows.append((i, sorted(set(base))))
    # planted: high-overlap copies (drop/add one token)
    nid = 50
    for i in range(0, 50, 5):
        mod = set(rows[i][1])
        mod.discard(next(iter(mod)))
        mod.add(rng.choice(vocab))
        sets.append((nid, mod))
        rows.append((nid, sorted(mod)))
        nid += 1

    expected = set()
    for i, (ida, sa) in enumerate(sets):
        for idb, sb in sets[i + 1 :]:
            inter = len(sa & sb)
            union = len(sa | sb)
            if inter * JAC_T_DEN >= union * JAC_T_NUM:
                lo, hi = min(ida, idb), max(ida, idb)
                expected.add((lo, hi, round(inter / union, 6)))

    tokens = spark.createDataFrame(
        [Row(doc_id=i, s=tok) for i, toks in rows for tok in toks]
    )
    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_prefix_self_join(tokens).collect()
    }
    assert got == expected
