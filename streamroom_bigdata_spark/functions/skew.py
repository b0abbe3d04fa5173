"""Skew-mitigation helpers (SURVEY.md 100 TB design notes).

AQE's skew-join splitting handles most skew at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); these helpers
cover the cases AQE can't re-plan:

- ``salted_count``: two-phase aggregation for a groupBy whose key
  distribution is pathological (one key ≫ everything else). Phase 1
  aggregates on (key, salt) — the hot key's rows spread over ``n_salts``
  reducers; phase 2 merges the per-salt partials. Exact same result as a
  plain groupBy, guaranteed by construction and tested.
- ``salted_join_left``: replicate-broadcast salting for a skewed equi-join
  when the small side is too big to broadcast whole but its hot-key rows
  can be replicated: the big side gets a random salt in [0, n), the small
  side is exploded n ways, and the join key becomes (key, salt).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame, n_salts: int, col_name: str = "_salt", cols=None
) -> DataFrame:
    """Deterministic salt in [0, n_salts): xxhash64 over the row's columns.
    Content-derived, so it is stable across task retries/recomputation —
    monotonically_increasing_id is NOT (a partial stage retry can renumber
    rows and duplicate/lose them through a salted join, SPARK-23207 class).

    Caveat: identical rows share a salt. For ``salted_count`` that's
    harmless (the pre-aggregate collapses them). For ``salted_join_left``,
    do NOT project the big side down to just the join key first — keep (or
    pass via ``cols``) a high-cardinality column so the hot key's rows
    actually spread; if the hot key's rows are full duplicates, the right
    fix is to pre-aggregate them into (row, weight) before joining, not to
    salt."""
    cols = [F.col(c) for c in (cols or df.columns)]
    return df.withColumn(
        col_name, F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")
    )


def salted_count(
    df: DataFrame, key, n_salts: int = 16, count_col: str = "cnt"
) -> DataFrame:
    """groupBy(key).count() resistant to a hot key: pre-aggregate on
    (key, salt), then merge. Two small shuffles instead of one skewed one."""
    keys = [key] if isinstance(key, (str, Column)) else list(key)
    partial = (
        with_salt(df, n_salts)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias(count_col))


def salted_join_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    hot: list | None = None,
) -> DataFrame:
    """Skewed inner equi-join: salt the big side, explode the small side
    n_salts ways, join on (key, salt). Every output row appears exactly once
    (each big row carries one salt; the small side covers all salts).

    ``hot``: when given (see :func:`detect_hot_keys`), only those keys are
    salted and only their small-side rows are replicated — the small side
    grows by len(hot)*(n_salts-1) rows instead of n_salts×, which is the
    difference between a constant-size fixup and replicating a 100 TB-scale
    dimension eight-fold."""
    if hot is not None:
        big_s = with_hot_salt(big, key, hot, n_salts)
        small_s = small.withColumn(
            "_salt",
            F.explode(
                F.when(
                    F.col(key).isin(hot),
                    F.array(*[F.lit(i) for i in range(n_salts)]),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
    else:
        big_s = with_salt(big, n_salts)
        small_s = small.withColumn(
            "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
        )
    return big_s.join(small_s, [key, "_salt"]).drop("_salt")


def detect_hot_keys(
    df: DataFrame,
    key: str,
    n_top: int = 16,
    sample_fraction: float = 0.01,
    min_sampled: int = 1_000,
) -> list:
    """Cheap sampled hot-key detection: the (at most ``n_top``) keys whose
    count in a ``sample_fraction`` sample is at least ``min_sampled`` —
    i.e. roughly min_sampled/sample_fraction true rows. One O(sample) scan,
    returns a tiny driver-side list to feed :func:`with_hot_salt` /
    :func:`salted_join_left`. At 100 TB this is the pattern: pay a 1%
    sampled count once, then salt only what is actually hot — salting
    EVERY key multiplies the downstream group count by n_salts (measured
    in tools/skew_rehearsal.py: a grouped-pandas stage went 7 s → 31 s
    when all keys were salted 16×)."""
    rows = (
        df.sample(fraction=sample_fraction, seed=7)
        .groupBy(key)
        .count()
        .filter(F.col("count") >= min_sampled)
        .orderBy(F.desc("count"))
        .limit(n_top)
        .collect()
    )
    return [r[0] for r in rows]


def with_hot_salt(
    df: DataFrame,
    key: str,
    hot: list,
    n_salts: int,
    col_name: str = "_salt",
    cols=None,
) -> DataFrame:
    """Content-derived salt applied ONLY to the listed hot keys; every
    other key gets salt 0. Downstream (key, salt) group count grows by
    len(hot)*(n_salts-1) instead of n_salts× — salt surgically, not
    globally."""
    if not hot:
        return df.withColumn(col_name, F.lit(0))
    salted = with_salt(df, n_salts, col_name="_salt_all", cols=cols)
    return salted.withColumn(
        col_name,
        F.when(F.col(key).isin(hot), F.col("_salt_all")).otherwise(F.lit(0)),
    ).drop("_salt_all")
