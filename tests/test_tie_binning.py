"""Tie-at-boundary property tests for the decile-binning family
(round-13 brief #3; the defect class behind the round-12 judge's
`gains_chart_stopword` sf0.1 hash FAIL).

The hazard: assigning equi-depth bins by comparing a heavily-tied score
against INTERPOLATED double boundaries (`p <= quantile_cont(q)`). When a
boundary lands exactly ON a tied value, a 1-ulp cross-engine
interpolation difference flips the ENTIRE tie-run between adjacent bins
— green at one scale, wrong at another, because tie-run sizes and
boundary positions move with n.

These tests plant a 20-row corpus whose 5-doc tie-run straddles an
interpolated boundary EXACTLY (the knife-edge the old spelling sat on),
then pin:

1. the old rule is ulp-UNSTABLE: perturbing the boundary by one ulp in
   either direction changes decile membership (this is the red-on-old-
   spelling witness — the old code cannot pass this property);
2. the shipped rank-cut rule ((10·cum − 1) div n over per-distinct-value
   counts) never splits the tie-run and produces IDENTICAL rows on
   Spark and DuckDB over the same planted parquet.

Same pinning for `lorenz_curve_deciles`, migrated preventively in
round 13 (integer cents shrink but don't eliminate the ulp window).
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from streamroom_bigdata_spark.operators.distribution import (
    _lorenz_sql,
    lorenz_curve_deciles,
)
from streamroom_bigdata_spark.operators.quality import (
    _gains_sql,
    gains_chart_stopword,
)

# 20 two-token docs: 8 score 0.0, a 5-doc TIE-RUN at 0.5 (ranks 9-13 —
# straddles the interpolated median, which lands exactly ON 0.5), 7 at
# 1.0. Three of the tied docs are 'en' so the positive count varies
# within the run and a split run would change n_pos per decile, not
# just n_docs.
_GAINS_DOCS = (
    [("xx yy", "de")] * 8
    + [("the yy", "en")] * 3
    + [("the zz", "fr")] * 2
    + [("the a", "en")] * 7
)


def _interp_quantiles(sorted_vals, qs):
    """The linear-interpolation rule shared by Spark `percentile` and
    DuckDB `quantile_cont` (and numpy 'linear'): position q·(n−1)."""
    n = len(sorted_vals)
    out = []
    for q in qs:
        pos = q * (n - 1)
        lo = math.floor(pos)
        frac = pos - lo
        hi = min(lo + 1, n - 1)
        out.append(sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo]))
    return out


def _old_rule_deciles(vals, bounds):
    """The retired spelling: decile = min(9, 9 − #{b : p <= b})."""
    return [
        min(9, 9 - sum(1 for b in bounds if p <= b)) for p in vals
    ]


def test_old_interpolated_boundary_rule_is_ulp_unstable():
    """The red-on-old-spelling witness: on the planted corpus one
    interpolated boundary equals the tied score 0.5 EXACTLY, and
    perturbing that boundary by a single ulp — the cross-engine
    disagreement actually observed at sf0.1 — moves all 5 tied docs to
    a different decile. A binning rule whose output changes under 1-ulp
    boundary noise is not engine-portable; the old gains/lorenz code
    was exactly this rule."""
    scores = sorted(
        (1.0 if t.startswith("the a") else (0.5 if "the" in t else 0.0))
        for t, _ in _GAINS_DOCS
    )
    qs = [0.1 * k for k in range(1, 10)]
    bounds = _interp_quantiles(scores, qs)
    knife = [b for b in bounds if b == 0.5]
    assert knife, "planted corpus must put a boundary exactly ON the tie"

    base = _old_rule_deciles([0.5], bounds)[0]
    up = [math.nextafter(b, math.inf) if b == 0.5 else b for b in bounds]
    down = [math.nextafter(b, -math.inf) if b == 0.5 else b for b in bounds]
    d_up = _old_rule_deciles([0.5], up)[0]
    d_down = _old_rule_deciles([0.5], down)[0]
    # one ulp either way flips the whole 5-doc tie-run's decile
    assert d_up != d_down
    assert base in (d_up, d_down)


def _write_parquet(path, names, cols):
    pq.write_table(pa.table(dict(zip(names, cols))), path)


def test_gains_rank_binning_tie_run_never_splits_and_engines_agree(
    spark, tmp_path
):
    """The shipped rule on the same knife-edge corpus: the 5-doc 0.5
    tie-run lands WHOLE in one decile ((10·13 − 1) div 20 = 6), and
    Spark rows == DuckDB oracle rows exactly."""
    texts = [t for t, _ in _GAINS_DOCS]
    langs = [lg for _, lg in _GAINS_DOCS]
    _write_parquet(
        str(tmp_path / "documents.parquet"),
        ["doc_id", "text", "lang", "source", "n_chars"],
        [
            list(range(1, len(texts) + 1)),
            texts,
            langs,
            ["t"] * len(texts),
            [len(t) for t in texts],
        ],
    )
    got = {
        (r.decile, r.n_docs, r.n_pos)
        for r in gains_chart_stopword(spark, str(tmp_path)).collect()
    }
    # tie-run whole: decile 6 holds exactly the 5 tied docs (3 positive)
    assert (6, 5, 3) in got
    assert (3, 8, 0) in got and (9, 7, 7) in got

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path / 'documents.parquet'}'"
    )
    oracle = {
        (int(r[0]), int(r[1]), int(r[2]))
        for r in con.execute(_gains_sql()).fetchall()
    }
    assert {(d, nd, np_) for d, nd, np_ in got} == oracle


def test_lorenz_rank_binning_tie_run_never_splits_and_engines_agree(
    spark, tmp_path
):
    """Same property for the preventively-migrated lorenz: 20 customers,
    a 6-customer tie-run at 10.00 revenue straddling the median rank
    (cum 9..14; (10·14 − 1) div 20 = 6, and cum 15 opens decile 7) —
    whole run alone in decile 6, Spark == DuckDB."""
    cents = [100 * (k + 1) for k in range(8)] + [1000] * 6 + [
        2000 + 100 * k for k in range(6)
    ]
    n = len(cents)
    _write_parquet(
        str(tmp_path / "orders.parquet"),
        ["o_orderkey", "o_custkey", "o_totalprice"],
        [list(range(1, n + 1)), list(range(1, n + 1)),
         [c / 100.0 for c in cents]],
    )
    rows = {
        (r.decile, r.n_customers)
        for r in lorenz_curve_deciles(spark, str(tmp_path)).collect()
    }
    assert (6, 6) in rows  # the tie-run, unsplit and alone in its decile

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path / 'orders.parquet'}'"
    )
    oracle = {
        (int(r[0]), int(r[1]))
        for r in con.execute(_lorenz_sql()).fetchall()
    }
    assert rows == oracle
