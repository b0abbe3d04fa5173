"""As-of / range join semantics (J5-J6)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import asof


def _key(r):
    return (r.purchase_id, r.user_id, r.purchase_ts, r.purchase_value,
            r.last_view_value, r.last_view_ts)


def test_asof_variants_agree(spark, sf_dir):
    a = sorted(map(_key, asof.asof_join(spark, sf_dir).collect()))
    b = sorted(map(_key, asof.asof_join_pandas(spark, sf_dir).collect()))
    assert a == b


def test_asof_view_precedes_purchase(spark, sf_dir):
    for r in asof.asof_join(spark, sf_dir).collect():
        if r.last_view_ts is not None:
            assert r.last_view_ts <= r.purchase_ts


def test_asof_synthetic_exact_match_and_no_match(spark):
    # exact-timestamp view must match ('<=' semantics); purchase with no
    # prior view must yield nulls
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "view", 10.0, "{}"),
        (2, t0, 7, "purchase", 99.0, "{}"),           # same instant as view
        (3, t0 - dt.timedelta(hours=1), 8, "purchase", 5.0, "{}"),  # no view
        (4, t0, 9, "view", 1.0, "{}"),
        (5, t0, 9, "view", 2.0, "{}"),                # tie: higher id wins
        (6, t0 + dt.timedelta(seconds=1), 9, "purchase", 3.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r.purchase_id: r for r in asof.asof_join(spark, d).collect()}
    assert out[2].last_view_value == 10.0          # exact ts matches
    assert out[3].last_view_value is None          # nothing before
    assert out[6].last_view_value == 2.0           # tie -> highest event_id


def test_range_join_strict_window(spark, sf_dir):
    for r in asof.range_join_attribution(spark, sf_dir).collect():
        assert 0 < r.gap_ms <= 30 * 60 * 1000


def test_interval_overlap_bounds(spark, sf_dir):
    for r in asof.interval_overlap_pairs(spark, sf_dir).collect():
        assert r.event_a < r.event_b
        assert 0 < r.overlap_ms <= 3 * 60 * 1000


def test_cogroup_asof_matches_window_form(spark, sf_dir):
    """D-surface cogroup: the two-relation pandas form must equal the
    window (pure DataFrame) as-of join row for row."""
    from streamroom_bigdata_spark.operators.asof import (
        asof_join,
        asof_join_cogroup,
    )

    a = {tuple(r) for r in asof_join(spark, sf_dir).collect()}
    b = {tuple(r) for r in asof_join_cogroup(spark, sf_dir).collect()}
    assert a == b and len(a) > 0
