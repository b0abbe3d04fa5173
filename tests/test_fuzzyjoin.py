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
