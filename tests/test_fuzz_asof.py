"""As-of join fuzz: the generic union-window asof_backward vs DuckDB's
NATIVE ASOF JOIN on randomized tables — ties at equal timestamps, empty
groups, left-before-any-right, and multi-group interleavings."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from streamroom_bigdata_spark.operators.asof import asof_backward

# right side: unique (grp, t) — DuckDB ASOF JOIN tie-breaks among equal
# right timestamps arbitrarily, so equality of semantics is only defined
# on tie-free right sides (asof_backward itself resolves such ties
# deterministically by payload order; that extra guarantee is its own
# unit test below)
rows_strategy = st.tuples(
    st.lists(  # right: (grp, t) pairs, deduped
        st.tuples(st.integers(0, 3), st.integers(0, 30)),
        min_size=0,
        max_size=25,
        unique=True,
    ),
    st.lists(  # left: (grp, t), duplicates allowed
        st.tuples(st.integers(0, 3), st.integers(0, 30)),
        min_size=1,
        max_size=25,
    ),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows_strategy)
def test_asof_backward_matches_duckdb_native(spark, data):
    right_rows, left_rows = data
    right = [(g, t, float(100 * g + t)) for g, t in right_rows]
    left = [(i, g, t) for i, (g, t) in enumerate(left_rows)]

    con = duckdb.connect()
    con.execute("CREATE TABLE r (grp BIGINT, t BIGINT, px DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", right) if right else None
    con.execute("CREATE TABLE l (id BIGINT, grp BIGINT, t BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", left)
    want = sorted(
        con.execute(
            "SELECT l.id, r.px FROM l ASOF LEFT JOIN r "
            "ON l.grp = r.grp AND l.t >= r.t"
        ).fetchall()
    )

    ldf = spark.createDataFrame(left, "id long, grp long, t long")
    rdf = spark.createDataFrame(
        right or [], "grp long, t long, px double"
    )
    got = sorted(
        (row.id, row.right_px)
        for row in asof_backward(ldf, rdf, by="grp", on="t",
                                 right_cols=["px"]).collect()
    )
    assert got == want


def test_asof_backward_tie_resolution_is_deterministic(spark):
    """Two right rows at the SAME timestamp: asof_backward picks the
    greatest payload struct (documented order), every run."""
    ldf = spark.createDataFrame([(1, 0, 10)], "id long, grp long, t long")
    rdf = spark.createDataFrame(
        [(0, 10, 1.0), (0, 10, 9.0), (0, 5, 4.0)], "grp long, t long, px double"
    )
    for _ in range(3):
        rows = asof_backward(ldf, rdf, by="grp", on="t",
                             right_cols=["px"]).collect()
        assert rows[0].right_px == 9.0


def test_asof_backward_unmatched_left_gets_nulls(spark):
    ldf = spark.createDataFrame([(1, 0, 3)], "id long, grp long, t long")
    rdf = spark.createDataFrame([(0, 5, 1.0)], "grp long, t long, px double")
    rows = asof_backward(ldf, rdf, by="grp", on="t", right_cols=["px"]).collect()
    assert rows[0].right_px is None


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=rows_strategy)
def test_asof_forward_matches_duckdb_native(spark, data):
    from streamroom_bigdata_spark.operators.asof import asof_forward

    right_rows, left_rows = data
    right = [(g, t, float(100 * g + t)) for g, t in right_rows]
    left = [(i, g, t) for i, (g, t) in enumerate(left_rows)]

    con = duckdb.connect()
    con.execute("CREATE TABLE r (grp BIGINT, t BIGINT, px DOUBLE)")
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", right) if right else None
    con.execute("CREATE TABLE l (id BIGINT, grp BIGINT, t BIGINT)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", left)
    want = sorted(
        con.execute(
            "SELECT l.id, r.px FROM l ASOF LEFT JOIN r "
            "ON l.grp = r.grp AND l.t <= r.t"
        ).fetchall()
    )

    ldf = spark.createDataFrame(left, "id long, grp long, t long")
    rdf = spark.createDataFrame(right or [], "grp long, t long, px double")
    got = sorted(
        (row.id, row.right_px)
        for row in asof_forward(ldf, rdf, by="grp", on="t",
                                right_cols=["px"]).collect()
    )
    assert got == want
