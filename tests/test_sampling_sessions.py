"""Sampling determinism/shape and sessionization semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators.sampling import (
    GLOBAL_K,
    STRATUM_N,
    bernoulli_sample,
    sample_topk_hash,
    stratified_sample,
)
from streamroom_bigdata_spark.operators.sessions import sessionize


def test_bernoulli_sample_deterministic_and_filter_only(spark, sf_dir):
    a = {r.doc_id for r in bernoulli_sample(spark, sf_dir).collect()}
    b = {r.doc_id for r in bernoulli_sample(spark, sf_dir).collect()}
    assert a == b and len(a) > 0
    # pure filter over the scan — no exchange anywhere in the plan
    plan = bernoulli_sample(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_caps_every_stratum(spark, sf_dir):
    out = stratified_sample(spark, sf_dir)
    per = out.groupBy("lang", "source").count().collect()
    assert all(r["count"] <= STRATUM_N for r in per)
    # deterministic
    assert sorted(map(tuple, out.collect())) == sorted(
        map(tuple, stratified_sample(spark, sf_dir).collect())
    )


def test_sample_topk_hash_exact_size_no_global_sort(spark, sf_dir):
    out = sample_topk_hash(spark, sf_dir)
    assert out.count() == GLOBAL_K
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # distributed top-k, no full sort


def test_sessionize_splits_on_gap(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: events at 0, 10, 20 min (one session), then 60, 65 (second)
        (1, 1, ts(0), 1.0),
        (1, 2, ts(10), 2.0),
        (1, 3, ts(20), 3.0),
        (1, 4, ts(60), 4.0),
        (1, 5, ts(65), 5.0),
        # user 2: single event
        (2, 6, ts(0), 10.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    got = {
        (r.user_id, r.session_idx): (r.n_events, r.total_value)
        for r in sessionize(df).collect()
    }
    assert got == {(1, 1): (3, 6.0), (1, 2): (2, 9.0), (2, 1): (1, 10.0)}


def test_sessionize_boundary_gap_is_same_session(spark):
    # a gap of exactly the threshold does NOT split (strict > comparison)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, 1, t0, 1.0), (1, 2, t0 + dt.timedelta(minutes=30), 1.0)]
    df = spark.createDataFrame(
        rows, "user_id int, event_id int, ts timestamp, value double"
    )
    assert sessionize(df).count() == 1


def test_epoch_shard_order_is_a_permutation(spark, sf_dir):
    """Every document appears exactly once; positions are dense 1..n per
    shard; shards are in [0, EPOCH_SHARDS); re-running yields the identical
    assignment (determinism is the operator's whole contract)."""
    from streamroom_bigdata_spark.operators.sampling import (
        EPOCH_SHARDS,
        epoch_shard_order,
    )

    out = epoch_shard_order(spark, sf_dir)
    rows = out.collect()
    n_docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    )
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        assert 0 <= r.shard < EPOCH_SHARDS
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    again = {(r.doc_id, r.shard, r.pos) for r in epoch_shard_order(spark, sf_dir).collect()}
    assert again == {(r.doc_id, r.shard, r.pos) for r in rows}


def test_contiguous_global_ids_dense_and_order_consistent(spark, sf_dir):
    """global_id is a dense 1..N permutation and equals the naive global
    row_number over (shard, h, doc_id) — the semantics the shard-offset
    plan replaces without the single-partition sort."""
    from streamroom_bigdata_spark.operators.sampling import (
        contiguous_global_ids,
    )

    rows = contiguous_global_ids(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.global_id for r in rows) == list(range(1, n + 1))
    assert len({r.doc_id for r in rows}) == n
    # within a shard, ids are contiguous; shard blocks are ordered
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.global_id)
    prev_end = 0
    for shard in sorted(by_shard):
        ids = sorted(by_shard[shard])
        assert ids[0] == prev_end + 1 and ids[-1] == prev_end + len(ids)
        prev_end = ids[-1]


def test_negative_sampling_rejects_positives_and_bounds_k(spark, sf_dir):
    """Hash negatives never collide with a customer's actual purchases
    (the anti-join contract), at most NEG_SAMPLES_K per customer, and the
    draw is deterministic (same corpus → identical rows on a re-run)."""
    from pyspark.sql import functions as F

    from streamroom_bigdata_spark.operators.sampling import (
        NEG_SAMPLES_K,
        negative_sampling_pairs,
    )
    from streamroom_bigdata_spark.sources import load_table

    out = negative_sampling_pairs(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pos = (
        orders.join(li, li.l_orderkey == orders.o_orderkey)
        .select("o_custkey", F.col("l_partkey").alias("neg_partkey"))
        .distinct()
    )
    assert out.join(pos, ["o_custkey", "neg_partkey"]).count() == 0
    per = out.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
    assert per <= NEG_SAMPLES_K
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, negative_sampling_pairs(spark, sf_dir).collect()))
    assert a == b


def test_decision_stump_curve_invariants(spark, sf_dir):
    """Every threshold row partitions the same population (n_l + n_r
    constant), Gini stays in [0, 0.5], and left counts are monotone in
    the threshold."""
    from streamroom_bigdata_spark.operators.mlfit import (
        decision_stump_returns,
    )

    rows = sorted(
        decision_stump_returns(spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert rows
    total = rows[0].n_l + rows[0].n_r
    prev_nl = 0
    for r in rows:
        assert r.n_l + r.n_r == total
        assert 0.0 <= r.weighted_gini <= 0.5
        assert r.n_l >= prev_nl
        prev_nl = r.n_l
