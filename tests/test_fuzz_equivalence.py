"""Randomized Spark-vs-DuckDB query-equivalence fuzzing (SURVEY.md §5).

The fixed oracle set (tools/check_oracle.py) pins 101 hand-written
queries; this fuzzer samples the NEIGHBORHOOD around them: hypothesis
generates small filter+group+aggregate queries over lineitem, renders ONE
SQL text, and asserts Spark (via ``df.filter(sql_pred)`` + aggregate
expressions) and DuckDB agree row for row. Catches operator-semantics
drift (null ordering, numeric typing, predicate edge cases) that a fixed
set can miss.

Kept cheap: sf0.001 (~6k rows), bounded example count, shared sessions.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from streamroom_bigdata_spark.sources import load_table

SF_DIR = "/root/testdata/sf0.001"

GROUP_COLS = ("l_returnflag", "l_linestatus", "l_linenumber")
NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
AGGS = ("sum", "min", "max", "count", "avg")
OPS = ("<", "<=", ">", ">=", "=", "<>")

# constants chosen to straddle each column's actual range
CONSTS = {
    "l_quantity": (1.0, 10.0, 25.0, 50.0),
    "l_extendedprice": (1000.0, 20000.0, 60000.0),
    "l_discount": (0.0, 0.04, 0.08),
    "l_tax": (0.0, 0.04, 0.08),
}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


query_strategy = st.builds(
    lambda g, ac, a, fc, op, ci, conj: {
        "group": g,
        "agg": a,
        "agg_col": ac,
        "pred_col": fc,
        "op": op,
        "const_i": ci,
        "conj": conj,
    },
    g=st.sampled_from(GROUP_COLS),
    ac=st.sampled_from(NUM_COLS),
    a=st.sampled_from(AGGS),
    fc=st.sampled_from(NUM_COLS),
    op=st.sampled_from(OPS),
    ci=st.integers(min_value=0, max_value=3),
    conj=st.none() | st.sampled_from(NUM_COLS),
)


def _render(q) -> tuple[str, str, str]:
    const = CONSTS[q["pred_col"]][q["const_i"] % len(CONSTS[q["pred_col"]])]
    pred = f"{q['pred_col']} {q['op']} {const}"
    if q["conj"] is not None:
        c2 = CONSTS[q["conj"]][0]
        pred += f" AND {q['conj']} >= {c2}"
    if q["agg"] == "count":
        agg_sql = "CAST(count(*) AS BIGINT)"
    else:
        agg_sql = f"round({q['agg']}({q['agg_col']}), 6)"
    return pred, agg_sql, q["group"]


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=query_strategy)
def test_random_agg_query_agrees(spark, duck, q):
    pred, agg_sql, group = _render(q)
    sql = (
        f"SELECT {group} AS g, {agg_sql} AS v "
        f"FROM lineitem WHERE {pred} GROUP BY 1"
    )
    want = sorted(map(tuple, duck.sql(sql).fetchall()))

    df = load_table(spark, SF_DIR, "lineitem").filter(pred)
    got = sorted(
        (r.g, r.v)
        for r in df.groupBy(F.col(group).alias("g"))
        .agg(F.expr(agg_sql).alias("v"))
        .collect()
    )
    assert got == want, f"divergence for: {sql}"


# ---------------------------------------------------------------------------
# Shared-SQL-text fuzz: the SAME rendered SQL runs through spark.sql and
# DuckDB — exercising the dialect-portable surface (windows over a unique
# order key, CASE WHEN buckets, HAVING) beyond the DataFrame-API fuzz above.
# ---------------------------------------------------------------------------

# ranking/offset functions use the frameless window `wo` — Spark rejects an
# explicit frame on lag/row_number/rank where DuckDB tolerates one (a real
# dialect difference this fuzzer surfaced); only the running sum frames
WIN_FNS = (
    "row_number() OVER wo",
    "rank() OVER wo",
    "CAST(lag(l_linenumber) OVER wo AS INT)",
    "round(sum(l_quantity) OVER w, 6)",
)

sql_query_strategy = st.builds(
    lambda part, wfn, bucket_col, ci, having: {
        "part": part,
        "wfn": wfn,
        "bucket_col": bucket_col,
        "const_i": ci,
        "having": having,
    },
    part=st.sampled_from(GROUP_COLS),
    wfn=st.sampled_from(WIN_FNS),
    bucket_col=st.sampled_from(NUM_COLS),
    ci=st.integers(min_value=0, max_value=3),
    having=st.booleans(),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=sql_query_strategy)
def test_shared_sql_text_agrees(spark, duck, q):
    consts = CONSTS[q["bucket_col"]]
    c = consts[q["const_i"] % len(consts)]
    win_sql = (
        f"SELECT l_orderkey, l_linenumber, {q['wfn']} AS wv, "
        f"CASE WHEN {q['bucket_col']} > {c} THEN 'hi' ELSE 'lo' END AS bucket "
        f"FROM lineitem "
        # the fixture has duplicate (l_orderkey, l_linenumber) rows, so the
        # sort key must be total over every column the query consumes —
        # remaining ties are then full duplicates, which no aggregate can
        # distinguish (the fuzzer itself caught this as tie nondeterminism)
        f"WINDOW wo AS (PARTITION BY {q['part']} "
        f"ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        f"l_discount, l_tax), "
        f"w AS (PARTITION BY {q['part']} "
        f"ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice, "
        f"l_discount, l_tax "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
    )
    having = "HAVING count(*) > 3 " if q["having"] else ""
    sql = (
        f"SELECT bucket, CAST(count(*) AS BIGINT) AS n, "
        f"round(sum(wv), 6) AS sum_wv "
        f"FROM ({win_sql}) GROUP BY 1 {having}"
    )
    want = sorted(map(tuple, duck.sql(sql).fetchall()))

    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    got = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want, f"divergence for: {sql}"


# ---------------------------------------------------------------------------
# Join + null-path fuzz: equi-join orders⋈lineitem with NULLIF-injected
# nulls in the aggregate — exercises join duplicate semantics and the
# engines' shared null-skipping aggregate rules (the fixture itself has no
# nulls, so NULLIF manufactures them deterministically).
# ---------------------------------------------------------------------------

JOIN_AGGS = ("sum", "avg", "min", "count")

join_query_strategy = st.builds(
    lambda how, agg, ac, ci, nullify: {
        "how": how,
        "agg": agg,
        "agg_col": ac,
        "const_i": ci,
        "nullify": nullify,
    },
    how=st.sampled_from(("JOIN", "LEFT JOIN")),
    agg=st.sampled_from(JOIN_AGGS),
    ac=st.sampled_from(("l_quantity", "l_discount")),
    ci=st.integers(min_value=0, max_value=3),
    nullify=st.booleans(),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=join_query_strategy)
def test_join_with_null_paths_agrees(spark, duck, q):
    consts = CONSTS[q["agg_col"]]
    c = consts[q["const_i"] % len(consts)]
    expr = f"NULLIF({q['agg_col']}, {c})" if q["nullify"] else q["agg_col"]
    if q["agg"] == "count":
        agg_sql = f"CAST(count({expr}) AS BIGINT)"  # count skips nulls
    else:
        agg_sql = f"round({q['agg']}({expr}), 6)"
    sql = (
        f"SELECT o.o_orderstatus AS g, {agg_sql} AS v "
        f"FROM orders o {q['how']} lineitem l ON o.o_orderkey = l.l_orderkey "
        f"GROUP BY 1"
    )
    want = sorted(map(tuple, duck.sql(sql).fetchall()))

    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("orders")
    got = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want, f"divergence for: {sql}"


# ---------------------------------------------------------------------------
# Predicate-subquery + set-operation fuzz: IN / NOT IN / EXISTS / NOT EXISTS
# with NULLIF-injected nulls on the inner side (NOT IN against a null row is
# the classic three-valued-logic trap — the whole outer result empties), and
# INTERSECT / EXCEPT / UNION dedup semantics. Shared SQL text both engines.
# ---------------------------------------------------------------------------

QUANTIFIERS = ("IN", "NOT IN", "EXISTS", "NOT EXISTS")
SETOPS = ("INTERSECT", "EXCEPT", "UNION")

subq_strategy = st.builds(
    lambda quant, ci, nullify: {"quant": quant, "const_i": ci, "nullify": nullify},
    quant=st.sampled_from(QUANTIFIERS),
    ci=st.integers(min_value=0, max_value=3),
    nullify=st.booleans(),
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=subq_strategy)
def test_predicate_subquery_agrees(spark, duck, q):
    consts = CONSTS["l_quantity"]
    c = consts[q["const_i"] % len(consts)]
    key = "NULLIF(l_orderkey, 7)" if q["nullify"] else "l_orderkey"
    if q["quant"] in ("IN", "NOT IN"):
        pred = (
            f"o_orderkey {q['quant']} "
            f"(SELECT {key} FROM lineitem WHERE l_quantity < {c})"
        )
    else:
        pred = (
            f"{q['quant']} (SELECT 1 FROM lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity < {c})"
        )
    sql = (
        f"SELECT o_orderstatus AS g, CAST(count(*) AS BIGINT) AS n "
        f"FROM orders o WHERE {pred} GROUP BY 1"
    )
    want = sorted(map(tuple, duck.sql(sql).fetchall()))
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("orders")
    got = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want, f"divergence for: {sql}"


setop_strategy = st.builds(
    lambda op, ci, cj: {"op": op, "ci": ci, "cj": cj},
    op=st.sampled_from(SETOPS),
    ci=st.integers(min_value=0, max_value=3),
    cj=st.integers(min_value=0, max_value=3),
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(q=setop_strategy)
def test_set_operation_agrees(spark, duck, q):
    ca = CONSTS["l_quantity"][q["ci"] % 4]
    cb = CONSTS["l_extendedprice"][q["cj"] % 3]
    sql = (
        f"SELECT CAST(n AS BIGINT) AS n FROM ("
        f"SELECT l_orderkey AS n FROM lineitem WHERE l_quantity < {ca} "
        f"{q['op']} "
        f"SELECT l_orderkey FROM lineitem WHERE l_extendedprice < {cb})"
    )
    want = sorted(map(tuple, duck.sql(sql).fetchall()))
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    got = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want, f"divergence for: {sql}"


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ci=st.integers(min_value=0, max_value=5), null_both=st.booleans())
def test_null_safe_join_agrees(spark, duck, ci, null_both):
    """IS NOT DISTINCT FROM (null-safe equality, Spark `<=>`): null keys
    MATCH each other, unlike plain `=` — injected nulls on one or both
    sides must produce identical match counts in both engines."""
    k = 1 + ci  # an orderkey present in the fixture
    left_key = f"NULLIF(o_orderkey, {k})"
    right_key = f"NULLIF(l_orderkey, {k})" if null_both else "l_orderkey"
    sql = (
        f"SELECT CAST(count(*) AS BIGINT) AS n, "
        f"CAST(count(l_quantity) AS BIGINT) AS n_right "
        f"FROM orders o JOIN lineitem l "
        f"ON {left_key} IS NOT DISTINCT FROM {right_key}"
    )
    want = sorted(map(tuple, duck.sql(sql).fetchall()))
    load_table(spark, SF_DIR, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, SF_DIR, "orders").createOrReplaceTempView("orders")
    got = sorted(map(tuple, spark.sql(sql).collect()))
    assert got == want, f"divergence for: {sql}"
