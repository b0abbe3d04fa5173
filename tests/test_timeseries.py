"""Resample/forward-fill semantics (operators/timeseries.py)."""

from __future__ import annotations

import datetime as dt

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
