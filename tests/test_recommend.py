"""Flagship query semantics (reference parity: processing.scala:101-129)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamroom_bigdata_spark.plans.recommend import (
    AVAIL_BOOKED,
    AVAIL_FREE,
    TOP_K,
    recommend_rmse,
    recommend_rooms,
)


def test_topk_per_request(spark, sf_dir):
    df = recommend_rooms(spark, sf_dir).cache()
    rows = df.collect()
    assert rows, "flagship query returned no rows"
    per_req = {}
    for r in rows:
        per_req.setdefault(r.request_size, []).append(r)
    for size, recs in per_req.items():
        assert len(recs) <= TOP_K
        ranks = sorted(r.rank for r in recs)
        assert ranks == list(range(1, len(recs) + 1))
        scores = [r.final_score for r in sorted(recs, key=lambda r: r.rank)]
        assert scores == sorted(scores, reverse=True)
        # feasibility filter: capacity >= requested size (processing.scala:79)
        assert all(r.capacity >= size for r in recs)


def test_score_blend_weights(spark, sf_dir):
    # final = 0.5*1.0 + 0.3*collab + 0.2*avail (processing.scala:110-115)
    for r in recommend_rooms(spark, sf_dir).collect():
        expected = 0.5 + 0.3 * r.collab_score + 0.2 * r.availability_score
        assert abs(r.final_score - expected) < 1e-4
        assert r.availability_score in (AVAIL_BOOKED, AVAIL_FREE)
        assert 0.0 <= r.collab_score <= 1.0


def test_unbooked_room_gets_free_score(spark, sf_dir):
    # a partkey never seen in lineitem must get usage 0 / avail FREE
    # (left join + na.fill path, processing.scala:104-105)
    df = recommend_rooms(spark, sf_dir)
    zero_usage = df.filter(F.col("usage_count") == 0).collect()
    for r in zero_usage:
        assert r.collab_score == 0.0
        assert r.availability_score == AVAIL_FREE


def test_rmse_in_plan(spark, sf_dir):
    row = recommend_rmse(spark, sf_dir).collect()[0]
    assert row.n_recommendations > 0
    assert row.rmse >= 0.0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert "recommend_rooms" in qs
    assert set(oracles) <= set(qs)
