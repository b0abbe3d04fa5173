"""Resample/forward-fill semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import timeseries
from streamroom_bigdata_spark.sources import load_table


def test_resample_ffill_grid_and_fill_semantics(spark, sf_dir):
    out = timeseries.resample_ffill_hourly(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")

    # no nulls: every grid point starts after the user's first observation
    assert out.filter(F.col("value").isNull()).count() == 0

    # spot-check one user end to end against a driver-side replay
    uid = events.select("user_id").first().user_id
    evs = sorted(
        (r.ts, r.value)
        for r in events.filter(F.col("user_id") == uid).collect()
    )
    got = {
        r.grid_ts: r.value
        for r in out.filter(F.col("user_id") == uid).collect()
    }
    mn, mx = evs[0][0], evs[-1][0]
    first_grid = (mn.replace(minute=0, second=0, microsecond=0)
                  + dt.timedelta(hours=1))
    # grid covers [first full hour after mn, mx], hourly, exactly
    expect_grid = []
    g = first_grid
    while g <= mx:
        expect_grid.append(g)
        g += dt.timedelta(hours=1)
    assert sorted(got) == expect_grid

    # forward fill: value at g is the max-tie-broken last event at ts <= g
    by_ts: dict = {}
    for ts, v in evs:
        by_ts[ts] = max(by_ts.get(ts, float("-inf")), v)
    obs = sorted(by_ts.items())
    for g in expect_grid[:50]:
        want = None
        for ts, v in obs:
            if ts <= g:
                want = v
            else:
                break
        assert got[g] == want


def test_seasonal_decompose_recovers_planted_weekly_pattern(spark, monkeypatch):
    """Flat trend 100 + weekday bump on dow 0 → seasonal absorbs the bump,
    residual ~0, decomposition sums back to y."""
    import datetime as dt

    from pyspark.sql import functions as F  # noqa: F401
    from streamroom_bigdata_spark.operators import timeseries as ts

    rows = []
    eid = 0
    base = dt.date(2024, 1, 1)
    for d in range(28):
        day = base + dt.timedelta(days=d)
        dow = (day - dt.date(1970, 1, 1)).days % 7
        v = 100.0 + (70.0 if dow == 0 else 0.0)
        rows.append((eid, dt.datetime.combine(day, dt.time(12)), 1, "click", v, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.timeseries.load_table",
        lambda s_, d_, n_: df,
    )
    out = ts.seasonal_decompose_daily(spark, "x").collect()
    assert len(out) == 28
    for r in out:
        assert r.y == pytest.approx(r.trend + r.seasonal + r.residual, abs=2e-4)
    mid = [r for r in out if dt.date(2024, 1, 8) <= r.day <= dt.date(2024, 1, 21)]
    bumped = [r for r in mid if r.dow == 0]
    flat = [r for r in mid if r.dow != 0]
    assert all(r.seasonal > 30 for r in bumped)
    assert all(r.seasonal < 0 for r in flat)  # seasonal means sum ≈ 0


def test_cusum_changepoint_finds_planted_level_shift(spark, monkeypatch):
    """Daily mean 10 for days 1-14, then 20 for days 15-28 → the CUSUM
    trough sits at the last pre-shift day and the side means recover the
    two levels."""
    import datetime as dt

    from streamroom_bigdata_spark.operators import timeseries as ts

    rows = []
    eid = 0
    base = dt.date(2024, 1, 1)
    for d in range(28):
        day = base + dt.timedelta(days=d)
        v = 10.0 if d < 14 else 20.0
        rows.append((eid, dt.datetime.combine(day, dt.time(9)), 1, "click", v, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.timeseries.load_table",
        lambda s_, d_, n_: df,
    )
    r = ts.cusum_changepoint(spark, "x").collect()[0]
    assert r.changepoint_day == dt.date(2024, 1, 14)
    assert r.mean_before == pytest.approx(10.0)
    assert r.mean_after == pytest.approx(20.0)


def test_holt_linear_matches_reference_recurrence(spark, monkeypatch):
    """Planted daily series replayed through the textbook recurrence in
    Python — level/trend/forecast agree to output precision, anchor row
    has no forecast."""
    rows = [
        (i, dt.datetime(2024, 1, d, 1), 1, "click", float(v), "{}")
        for i, (d, v) in enumerate(
            [(1, 10.0), (2, 14.0), (3, 12.0), (4, 20.0), (5, 18.0)]
        )
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.timeseries.load_table",
        lambda spark_, sf_, name: df,
    )
    out = sorted(
        timeseries.holt_linear_forecast(spark, "ignored").collect(),
        key=lambda r: r.day,
    )
    a, b_ = timeseries.HOLT_ALPHA, timeseries.HOLT_BETA
    l, b = 10.0, 0.0
    expect = [(10.0, 0.0, None)]
    for y in (14.0, 12.0, 20.0, 18.0):
        f = l + b
        l_new = a * y + (1 - a) * (l + b)
        b = b_ * (l_new - l) + (1 - b_) * b
        l = l_new
        expect.append((l, b, f))
    assert out[0].forecast is None and out[0].abs_err is None
    for r, (el, eb, ef) in zip(out, expect):
        assert abs(r.level - el) < 1e-4
        assert abs(r.trend - eb) < 1e-4
        if ef is not None:
            assert abs(r.forecast - ef) < 1e-4


def test_sax_motifs_cover_series_and_alphabet(spark, sf_dir):
    """Motif census invariants on the fixture: every motif is a 3-letter
    word over {a,b,c,d}, windows total days-2, and both tails of the
    alphabet appear somewhere (the z-spread of real daily sums crosses
    the outer breakpoints)."""
    out = timeseries.sax_daily_motifs(spark, sf_dir).collect()
    days = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("d"))
        .distinct()
        .count()
    )
    assert sum(r.n_windows for r in out) == days - 2
    letters = {c for r in out for c in r.motif}
    assert letters <= {"a", "b", "c", "d"}
    assert all(len(r.motif) == 3 for r in out)


def test_sax_constant_series_is_null_not_abort(spark, monkeypatch):
    """Identical daily sums give sd = 0 → NULL z → every day buckets 'd'
    (the 1-day degenerate path), never an ANSI DIVIDE_BY_ZERO abort."""
    rows = [
        (i, dt.datetime(2024, 1, 1 + i, 1), 1, "m", 5.0, "{}")
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.timeseries.load_table",
        lambda spark_, sf_, name: df,
    )
    out = timeseries.sax_daily_motifs(spark, "ignored").collect()
    assert sum(r.n_windows for r in out) == 4
    assert {r.motif for r in out} == {"ddd"}
