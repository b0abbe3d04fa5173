"""Property-based tests (SURVEY.md §5.4): hypothesis-generated inputs for
the invariants that matter independent of fixture data. Spark-backed
properties keep example counts small (each example runs real jobs); the
numpy-level Bloom properties run at full example counts."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators.bloom import BloomSketch
from streamroom_bigdata_spark.streaming.ingest import parse_wire, tag_entity, to_wire_json
from streamroom_bigdata_spark.schemas import ENTITIES

SPARK_SETTINGS = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    keys=st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=500)
)
@settings(max_examples=50, deadline=None)
def test_bloom_never_false_negative(keys):
    sk = BloomSketch(expected_items=max(len(keys), 16), fpp=0.01)
    arr = np.array(keys, dtype=np.int64)
    sk._set(arr.astype(np.uint64))
    assert sk.contains(arr).all()


@given(
    values=st.lists(
        st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=60
    ),
    k=st.integers(min_value=1, max_value=10),
)
@SPARK_SETTINGS
def test_topk_equals_sort_then_head(spark, values, k):
    """orderBy(desc).limit(k) (TakeOrderedAndProject) must equal the naive
    sorted()[:k] — the distributed top-k rewrite may not change results."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], "id int, v int")
    got = [r.v for r in df.orderBy(F.desc("v"), F.asc("id")).limit(k).collect()]
    expected = [v for v, _ in sorted(((v, i) for i, v in enumerate(values)), key=lambda t: (-t[0], t[1]))[:k]]
    assert got == expected


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 20), st.integers(-5, 5)), min_size=1, max_size=50
    )
)
@SPARK_SETTINGS
def test_dedup_idempotent(spark, rows):
    df = spark.createDataFrame(rows, "k int, v int")
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    assert once.count() == twice.count() == df.select("k").distinct().count()


@given(
    booking_id=st.text(
        alphabet=st.characters(whitelist_categories=("L", "N"), max_codepoint=0x024F),
        min_size=1,
        max_size=20,
    ),
    students=st.integers(min_value=0, max_value=10_000),
)
@SPARK_SETTINGS
def test_wire_roundtrip_preserves_fields(spark, booking_id, students):
    """S2/S5 round-trip: any unicode-ish id and any int survive
    csv→json→from_json unchanged, and absent entity fields stay null."""
    schema, _key = ENTITIES["fixed_booking"]
    df = spark.createDataFrame(
        [(booking_id, "S1", "C1", "2024-01-01", "08:00", "10:00", students)], schema
    )
    parsed = parse_wire(to_wire_json(tag_entity(df, "fixed_booking"))).collect()[0]
    assert parsed.booking_id == booking_id
    assert parsed.students == students
    assert parsed.source_type == "fixed_booking"
    assert parsed.capacity is None


@given(
    n_events=st.integers(min_value=1, max_value=60),
    n_users=st.integers(min_value=1, max_value=5),
    gap_min=st.integers(min_value=1, max_value=120),
)
@SPARK_SETTINGS
def test_sessionize_invariants(spark, n_events, n_users, gap_min):
    """Sessions PARTITION the events: counts sum to N; per user, session
    intervals are disjoint and consecutive sessions are > gap apart."""
    import datetime as dt

    from streamroom_bigdata_spark.operators.sessions import sessionize

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (
            i % n_users,
            i,
            t0 + dt.timedelta(minutes=(i * 17) % (gap_min * 4 * n_events)),
            float(i),
        )
        for i in range(n_events)
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    sessions = sessionize(df, gap_ms=gap_min * 60_000).collect()
    assert sum(s.n_events for s in sessions) == n_events
    by_user = {}
    for s in sessions:
        assert s.session_start <= s.session_end
        by_user.setdefault(s.user_id, []).append(s)
    for sess in by_user.values():
        sess.sort(key=lambda s: s.session_start)
        for a, b in zip(sess, sess[1:]):
            gap = (b.session_start - a.session_end).total_seconds() / 60
            assert gap > gap_min  # strictly more than the threshold apart


@given(n_parts=st.integers(min_value=1, max_value=9))
@SPARK_SETTINGS
def test_bernoulli_sample_stable_under_partitioning(spark, n_parts):
    """The hash sample must select the SAME rows regardless of physical
    partitioning — the retry/cluster-size-independence guarantee rand()
    sampling cannot give."""
    from streamroom_bigdata_spark.functions.hashing import portable_hash_mod

    base = spark.range(0, 500).withColumn(
        "keep", portable_hash_mod(F.col("id").cast("string"), 100) < 10
    )
    expected = {r.id for r in base.filter("keep").collect()}
    got = {
        r.id
        for r in base.repartition(n_parts).filter("keep").collect()
    }
    assert got == expected


def test_hll_sketches_merge_losslessly(spark, sf_dir):
    """DataSketches HLL: the union of per-group sketches must estimate the
    SAME value as one global sketch (mergeability — what makes sketch
    columns reusable across rollups), and land within the standard ~2%
    relative error of the exact distinct count at lgk=12."""
    from streamroom_bigdata_spark.operators.profile import (
        distinct_sketch_by_group,
        union_sketch_estimate,
    )
    from streamroom_bigdata_spark.sources import load_table

    events = load_table(spark, sf_dir, "events")
    merged = union_sketch_estimate(
        distinct_sketch_by_group(events, "event_type", "user_id")
    ).first().estimate
    direct = events.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
    ).first()[0]
    exact = events.select("user_id").distinct().count()
    assert merged == direct
    assert abs(merged - exact) / exact < 0.05


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=40,
    )
)
@SPARK_SETTINGS
def test_connected_components_match_union_find(spark, edges):
    """Pointer-doubling label propagation must produce exactly the
    components a reference union-find computes, for arbitrary graphs
    (self-loops and duplicate edges included)."""
    from streamroom_bigdata_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    )
    got = {r.id: r.component for r in connected_components(pairs).collect()}

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    members: dict[int, list[int]] = {}
    for a, b in edges:
        for x in (a, b):
            members.setdefault(find(x), []).append(x)
    expected = {
        x: min(xs) for root, xs in members.items() for x in xs
    }
    assert got == expected


def test_weighted_sample_overrepresents_heavy_rows(spark):
    """A-ES weighted sampling: the drawn sample's mean weight exceeds the
    population mean (weight-proportional inclusion), keys are valid, and
    the draw is deterministic across invocations."""
    from streamroom_bigdata_spark.operators.sampling import weighted_sample

    sf = "/root/testdata/sf0.01"
    a = weighted_sample(spark, sf).collect()
    b = weighted_sample(spark, sf).collect()
    assert [r.o_orderkey for r in a] == [r.o_orderkey for r in b]
    assert len(a) == 100
    assert all(0.0 < r.es_key <= 1.0 for r in a)
    from streamroom_bigdata_spark.sources import load_table

    pop_mean = (
        load_table(spark, sf, "orders").agg({"o_totalprice": "avg"}).collect()[0][0]
    )
    sample_mean = sum(r.o_totalprice for r in a) / len(a)
    assert sample_mean > pop_mean


# --- round-10 revenue-ops invariants ----------------------------------------


@given(
    events=st.lists(
        st.tuples(
            st.integers(0, 3),                    # user_id
            st.sampled_from(["click", "view", "purchase"]),
            st.integers(0, 20),                   # day offset
            st.integers(1, 500),                  # value cents
        ),
        min_size=1,
        max_size=30,
    )
)
@SPARK_SETTINGS
def test_attribution_conserves_credit(spark, events):
    """Both attribution models must CONSERVE revenue: the summed credit
    equals the summed value of exactly the purchases that have ≥1 touch in
    their 7-day window — no credit invented, none lost (the invariant that
    holds for any weighting scheme that sums to 1 per purchase)."""
    import datetime as dt

    from streamroom_bigdata_spark.operators import revops

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(days=d, minutes=i), u, ty, c / 100.0, "{}")
        for i, (u, ty, d, c) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    rewired = revops.multi_touch_attribution.__wrapped__ if hasattr(
        revops.multi_touch_attribution, "__wrapped__"
    ) else revops.multi_touch_attribution

    # route the planted frame through the operator
    import streamroom_bigdata_spark.operators.revops as mod

    orig = mod.load_table
    mod.load_table = lambda spark_, sf_, name: df
    try:
        out = rewired(spark, "ignored").collect()
    finally:
        mod.load_table = orig

    # expected: purchases with >=1 click/view touch in (p_ts-7d, p_ts]
    pts = [(r[0], r[2], r[1], r[3], r[4]) for r in rows]
    total_expected = 0.0
    for eid, u, ts, ty, v in pts:
        if ty != "purchase":
            continue
        has_touch = any(
            tu == u and tty in ("click", "view")
            and tts <= ts and tts > ts - dt.timedelta(days=7)
            for _, tu, tts, tty, _ in pts
        )
        if has_touch:
            total_expected += v
    got_linear = sum(r.credit_linear for r in out)
    got_u = sum(r.credit_u for r in out)
    assert got_linear == pytest.approx(total_expected, abs=2e-4)
    assert got_u == pytest.approx(total_expected, abs=2e-4)


@given(
    parts=st.lists(
        st.tuples(st.integers(1, 8), st.integers(1, 20)),  # (size, price)
        min_size=1,
        max_size=25,
    )
)
@SPARK_SETTINGS
def test_pareto_equals_bruteforce(spark, parts):
    """The bounded-domain skyline must equal the O(n²) brute-force
    non-dominated set for ANY catalog."""
    from streamroom_bigdata_spark.operators import revops
    import streamroom_bigdata_spark.operators.revops as mod

    rows = [
        (i, f"n{i}", "b", "t", s, float(p)) for i, (s, p) in enumerate(parts)
    ]
    df = spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    orig = mod.load_table
    mod.load_table = lambda spark_, sf_, name: df
    try:
        got = sorted(
            r.p_partkey
            for r in revops.pareto_frontier_parts(spark, "ignored").collect()
        )
    finally:
        mod.load_table = orig

    def dominated(a, b):  # b dominates a
        return (
            b[1] <= a[1] and b[2] <= a[2] and (b[1] < a[1] or b[2] < a[2])
        )

    tuples = [(i, s, p) for i, (s, p) in enumerate(parts)]
    expected = sorted(
        i
        for i, s, p in tuples
        if not any(dominated((i, s, p), o) for o in tuples if o[0] != i)
    )
    assert got == expected


# --- Kendall τ-b / Mann-Kendall vs brute force (round-11) --------------------


def _brute_kendall(rev, cnt):
    """τ-b numerator/denominator terms from the textbook definition."""
    import math

    n = len(rev)
    s = sum(
        ((rev[j] > rev[i]) - (rev[j] < rev[i]))
        * ((cnt[j] > cnt[i]) - (cnt[j] < cnt[i]))
        for i in range(n)
        for j in range(i + 1, n)
    )
    n0 = n * (n - 1) // 2
    t1 = sum(
        1 for i in range(n) for j in range(i + 1, n) if rev[i] == rev[j]
    )
    t2 = sum(
        1 for i in range(n) for j in range(i + 1, n) if cnt[i] == cnt[j]
    )
    den = math.sqrt((n0 - t1) * (n0 - t2))
    return s, (s / den if den else None)


@given(
    counts=st.lists(st.integers(min_value=1, max_value=4), min_size=3, max_size=10),
    cents=st.lists(st.integers(min_value=1, max_value=5), min_size=3, max_size=10),
)
@SPARK_SETTINGS
def test_kendall_tau_matches_brute_force(spark, counts, cents):
    """Distributed τ-b (day-pair join + tie groupBys) equals the O(n²)
    textbook computation on arbitrary small integer series — including
    heavy ties in either variable and the fully-tied NULL degenerate."""
    import datetime as dt

    from unittest import mock

    from streamroom_bigdata_spark.operators import quant

    m = min(len(counts), len(cents))
    counts, cents = counts[:m], cents[:m]
    rows, ok = [], 0
    for d, (n, price) in enumerate(zip(counts, cents), start=1):
        for _ in range(n):
            ok += 1
            rows.append((ok, 1, "O", float(price), dt.datetime(2024, 1, d), "x"))
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with mock.patch(
        "streamroom_bigdata_spark.operators.quant.load_table",
        lambda spark_, sf_, name: df,
    ):
        r = quant.kendall_tau_daily(spark, "x").collect()[0]
    rev = [n * p * 100 for n, p in zip(counts, cents)]  # cents per day
    s, tau = _brute_kendall(rev, counts)
    assert r.conc_minus_disc == s
    if tau is None:
        assert r.tau_b is None
    else:
        assert abs(r.tau_b - round(tau, 6)) < 2e-6


@given(
    cents=st.lists(
        st.integers(min_value=100, max_value=10_000_000), min_size=7, max_size=14
    ),
)
@SPARK_SETTINGS
def test_bollinger_flag_matches_numpy(spark, cents):
    """The 128-bit integer breakout inequality equals the float definition
    |rev − mean| > 2·sd recomputed in numpy on arbitrary cent series
    (numpy evaluated away from the knife edge: the integer form IS the
    ground truth at equality, so only clear cases are asserted)."""
    import datetime as dt

    from unittest import mock

    import numpy as np

    from streamroom_bigdata_spark.operators import quant

    rows = [
        (d, 1, "O", c / 100.0, dt.datetime(2024, 1, d), "x")
        for d, c in enumerate(cents, start=1)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with mock.patch(
        "streamroom_bigdata_spark.operators.quant.load_table",
        lambda spark_, sf_, name: df,
    ):
        got = {r.d: r.breakout
               for r in quant.bollinger_daily_revenue(spark, "x").collect()}
    arr = np.array(cents, dtype=np.float64)
    for i in range(6, len(arr)):
        w = arr[i - 6 : i + 1]
        mean, sd = w.mean(), w.std(ddof=1)
        lhs, rhs = abs(arr[i] - mean), 2 * sd
        if abs(lhs - rhs) > 1e-6 * max(rhs, 1.0):  # skip knife-edge cases
            d = (dt.date(2024, 1, i + 1) - dt.date(1970, 1, 1)).days
            assert got[d] == (lhs > rhs), (i, lhs, rhs)
