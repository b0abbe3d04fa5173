"""As-of and range/interval joins (SURVEY.md §2.3 J5-J6).

Vanilla Spark has no native as-of join; the reference's domain needs one
(latest booking state before a time — its schema carries start/end times,
consumer.scala:29-30, but the code never implements slot checking). Two
implementations are provided:

- ``asof_join`` — pure DataFrame composition: union both sides with a side
  marker, one window pass per key carrying the last quote forward
  (``F.last(..., ignorenulls=True)``). ONE hash shuffle on the join key,
  bounded per-key state — this is the 100 TB path.
- ``asof_join_pandas`` — ``applyInPandas`` + ``pd.merge_asof`` per key group:
  the Arrow-vectorized UDF fallback pattern for semantics built-ins can't
  express. Same output contract, same oracle.

Range joins run as an equi-join on the key with the time-range predicate in
the join condition, so the shuffle is still hash-partitioned by key; Spark
evaluates the range residual inside the join. For keyless range joins at
scale, bucketize time (``F.window``) and equi-join on the bucket.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.timeutil import epoch_ms
from ..registry import register
from ..sources import load_table

_ASOF_ORACLE = """
WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('view', 'purchase')
), w AS (
  SELECT *,
         last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER win
           AS last_view_value,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER win
           AS last_view_ts
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       value AS purchase_value, last_view_value, last_view_ts
FROM w WHERE side = 1
"""


def _asof_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "view", 0).otherwise(1).alias("side"),
    )


@register("asof_join", _ASOF_ORACLE)
def asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (J6): for each purchase, the latest view by the same user
    at-or-before the purchase time. Views sort before purchases at equal
    timestamps (side marker), giving '<=' semantics; ties between views
    resolve to the highest event_id — fully deterministic."""
    u = _asof_inputs(spark, sf_dir)
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    view_value = F.when(F.col("side") == 0, F.col("value"))
    view_ts = F.when(F.col("side") == 0, F.col("ts"))
    return (
        u.withColumn("last_view_value", F.last(view_value, ignorenulls=True).over(win))
        .withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(win))
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
            "last_view_value",
            "last_view_ts",
        )
    )


@register("asof_join_pandas", _ASOF_ORACLE)
def asof_join_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics via grouped ``pd.merge_asof`` (D3 pattern):
    per-key pandas groups over Arrow — the escape hatch for operators the
    DataFrame algebra can't express. Matches ``asof_join`` bit-for-bit."""
    u = _asof_inputs(spark, sf_dir)

    schema = (
        "purchase_id long, user_id long, purchase_ts timestamp, "
        "purchase_value double, last_view_value double, last_view_ts timestamp"
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "side", "event_id"], kind="mergesort")
        views = pdf[pdf["side"] == 0]
        buys = pdf[pdf["side"] == 1]
        out = pd.DataFrame(
            {
                "purchase_id": buys["event_id"],
                "user_id": buys["user_id"],
                "purchase_ts": buys["ts"],
                "purchase_value": buys["value"],
            }
        )
        if views.empty:
            out["last_view_value"] = pd.Series(dtype="float64")
            out["last_view_ts"] = pd.Series(dtype="datetime64[us]")
            return out
        merged = pd.merge_asof(
            buys[["ts"]].reset_index(drop=True).assign(_row=range(len(buys))),
            views[["ts", "value"]].rename(
                columns={"ts": "last_view_ts", "value": "last_view_value"}
            ),
            left_on="ts",
            right_on="last_view_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        out = out.reset_index(drop=True)
        out["last_view_value"] = merged["last_view_value"]
        out["last_view_ts"] = merged["last_view_ts"]
        return out

    return u.groupBy("user_id").applyInPandas(merge, schema)


@register("asof_join_cogroup", _ASOF_ORACLE)
def asof_join_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as-of semantics through the COGROUP pandas API: views and
    purchases stay two relations, co-partitioned per key into one
    ``applyInPandas(lambda left, right: ...)`` — the two-input UDF shape
    (pairwise reconciliation, custom joins) the single-input grouped-map
    can't express without a pre-union. One co-partitioned shuffle per
    side on user_id; matches ``asof_join`` bit-for-bit (same oracle)."""
    events = load_table(spark, sf_dir, "events")
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", "value"
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    schema = (
        "purchase_id long, user_id long, purchase_ts timestamp, "
        "purchase_value double, last_view_value double, last_view_ts timestamp"
    )

    def merge(views_pdf: pd.DataFrame, buys_pdf: pd.DataFrame) -> pd.DataFrame:
        buys_pdf = buys_pdf.sort_values(["ts", "event_id"], kind="mergesort")
        out = pd.DataFrame(
            {
                "purchase_id": buys_pdf["event_id"],
                "user_id": buys_pdf["user_id"],
                "purchase_ts": buys_pdf["ts"],
                "purchase_value": buys_pdf["value"],
            }
        )
        if views_pdf.empty or buys_pdf.empty:
            out["last_view_value"] = pd.Series(dtype="float64")
            out["last_view_ts"] = pd.Series(dtype="datetime64[us]")
            return out
        # ties among views at one ts: merge_asof takes the LAST sorted row,
        # i.e. the highest event_id — same tiebreak as the window form
        views_pdf = views_pdf.sort_values(["ts", "event_id"], kind="mergesort")
        merged = pd.merge_asof(
            buys_pdf[["ts"]].reset_index(drop=True),
            views_pdf[["ts", "value"]].rename(
                columns={"ts": "last_view_ts", "value": "last_view_value"}
            ),
            left_on="ts",
            right_on="last_view_ts",
            direction="backward",
            allow_exact_matches=True,
        )
        out = out.reset_index(drop=True)
        out["last_view_value"] = merged["last_view_value"]
        out["last_view_ts"] = merged["last_view_ts"]
        return out

    return (
        views.groupBy("user_id")
        .cogroup(buys.groupBy("user_id"))
        .applyInPandas(merge, schema)
    )


@register(
    "range_join_attribution",
    """
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           epoch_ms(CAST(p.ts AS TIMESTAMP)) - epoch_ms(CAST(c.ts AS TIMESTAMP))
             AS gap_ms,
           round(p.value, 2) AS purchase_value
    FROM events c
    JOIN events p
      ON c.user_id = p.user_id
     AND p.ts > c.ts
     AND CAST(p.ts AS TIMESTAMP) <= CAST(c.ts AS TIMESTAMP) + INTERVAL 30 MINUTE
    WHERE c.event_type = 'click' AND p.event_type = 'purchase'
    """,
)
def range_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (J5): click→purchase attribution within a 30-minute window.
    Equi on user_id (hash shuffle) with the time range as a join residual —
    never a cartesian. Strict '>' on the lower bound avoids self-pairing."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    buys = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("p_value"),
    )
    joined = clicks.join(
        buys,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
        ),
    )
    return joined.select(
        "click_id",
        "purchase_id",
        F.col("c_user").alias("user_id"),
        (epoch_ms("purchase_ts") - epoch_ms("click_ts")).alias("gap_ms"),
        F.round("p_value", 2).alias("purchase_value"),
    )


@register(
    "interval_overlap_pairs",
    """
    WITH iv AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS s,
             CAST(ts AS TIMESTAMP) + INTERVAL 3 MINUTE AS e
      FROM events
    )
    SELECT a.user_id, a.event_id AS event_a, b.event_id AS event_b,
           epoch_ms(least(a.e, b.e)) - epoch_ms(greatest(a.s, b.s))
             AS overlap_ms
    FROM iv a
    JOIN iv b
      ON a.user_id = b.user_id
     AND a.event_id < b.event_id
     AND a.s < b.e AND b.s < a.e
    """,
)
def interval_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join (J5) — the reference domain's room
    double-booking check ([start,end) slot overlap, consumer.scala:29-30)
    generalized: same-key event intervals [ts, ts+3min) that overlap.
    The (a.s < b.e AND b.s < a.e) predicate is the canonical open-interval
    overlap; event_id ordering halves the pair space."""
    events = load_table(spark, sf_dir, "events")
    iv = events.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 3 MINUTES")).alias("e"),
    )
    a = iv.alias("a")
    b = iv.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_id") < F.col("b.event_id"))
            & (F.col("a.s") < F.col("b.e"))
            & (F.col("b.s") < F.col("a.e")),
        )
        .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("event_a"),
            F.col("b.event_id").alias("event_b"),
            (
                epoch_ms(F.least("a.e", "b.e"))
                - epoch_ms(F.greatest("a.s", "b.s"))
            ).alias("overlap_ms"),
        )
    )


ASOF_TOLERANCE_MIN = 60

_ASOF_TOLERANCE_ORACLE = f"""
SELECT purchase_id, user_id, purchase_ts, purchase_value,
       CASE WHEN last_view_ts >= purchase_ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
            THEN last_view_value END AS last_view_value,
       CASE WHEN last_view_ts >= purchase_ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
            THEN last_view_ts END AS last_view_ts
FROM ({_ASOF_ORACLE})
"""


@register("asof_join_tolerance", _ASOF_TOLERANCE_ORACLE)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (J6, pandas merge_asof's
    ``tolerance=``): a view older than ASOF_TOLERANCE_MIN before the
    purchase doesn't attribute. Same single-shuffle window plan as
    ``asof_join`` with a post-projection — stale matches null out, no extra
    exchange."""
    base = asof_join(spark, sf_dir)
    fresh = F.col("last_view_ts") >= F.col("purchase_ts") - F.expr(
        f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTES"
    )
    return base.select(
        "purchase_id",
        "user_id",
        "purchase_ts",
        "purchase_value",
        F.when(fresh, F.col("last_view_value")).alias("last_view_value"),
        F.when(fresh, F.col("last_view_ts")).alias("last_view_ts"),
    )


def asof_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic BACKWARD as-of join (round-7 composable core): every left
    row picks the right row with the greatest ``on`` <= its own, within
    the same ``by`` group — ``right_cols`` arrive null when nothing
    precedes. The union-window pattern: both sides union into one frame
    (right rows sort BEFORE left rows at equal ``on``, giving <=
    semantics), ONE window pass carries the latest right payload forward,
    left rows filter out. One shuffle on ``by`` total — the sorted-merge
    cost shape at 100 TB; ties among right rows at the same ``on`` resolve
    deterministically by payload-struct order (fuzz-tested against
    DuckDB's native ASOF JOIN on tie-free right sides)."""
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    rw = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        r_payload.alias("_r"),
    )
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    lw = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rw.schema["_r"].dataType).alias("_r"),
        l_payload.alias("_lpay"),
    )
    u = rw.withColumn(
        "_lpay", F.lit(None).cast(lw.schema["_lpay"].dataType)
    ).unionByName(lw)
    win = (
        Window.partitionBy("_by")
        .orderBy("_on", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(win))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_lpay.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"right_{c}") for c in right_cols]
    return matched.select(*out_cols)


_ASOF_FWD_ORACLE = """
WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('view', 'purchase')
), w AS (
  SELECT *,
         last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER win
           AS next_view_value,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER win
           AS next_view_ts
  FROM u
  WINDOW win AS (PARTITION BY user_id ORDER BY ts DESC, side, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       value AS purchase_value, next_view_value, next_view_ts
FROM w WHERE side = 1
"""


@register("asof_join_forward", _ASOF_FWD_ORACLE)
def asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (J6 completion): for each purchase, the
    EARLIEST view by the same user at-or-after the purchase time — the
    mirror of `asof_join` (same union-frame pattern, time-descending
    scan). Views sort before purchases at equal timestamps in the
    descending order too, so an exactly-simultaneous view matches both
    directions consistently; ties among equal-ts views resolve to the
    LOWEST event_id. Still ONE user-keyed shuffle."""
    u = _asof_inputs(spark, sf_dir)
    win = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "side", F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    view_value = F.when(F.col("side") == 0, F.col("value"))
    view_ts = F.when(F.col("side") == 0, F.col("ts"))
    return (
        u.withColumn("next_view_value", F.last(view_value, ignorenulls=True).over(win))
        .withColumn("next_view_ts", F.last(view_ts, ignorenulls=True).over(win))
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
            "next_view_value",
            "next_view_ts",
        )
    )


_ASOF_NEAREST_ORACLE = """
WITH u AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, value,
         CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side
  FROM events WHERE event_type IN ('view', 'purchase')
), w AS (
  SELECT *,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER back
           AS back_ts,
         last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER back
           AS back_value
  FROM u
  WINDOW back AS (PARTITION BY user_id ORDER BY ts, side, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), w2 AS (
  SELECT *,
         last_value(CASE WHEN side = 0 THEN ts END IGNORE NULLS) OVER fwd
           AS fwd_ts,
         last_value(CASE WHEN side = 0 THEN value END IGNORE NULLS) OVER fwd
           AS fwd_value
  FROM w
  WINDOW fwd AS (PARTITION BY user_id ORDER BY ts DESC, side, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, user_id, ts AS purchase_ts,
       CASE
         WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
         WHEN fwd_ts IS NULL THEN 'backward'
         WHEN back_ts IS NULL THEN 'forward'
         WHEN epoch_ms(ts) - epoch_ms(back_ts)
              <= epoch_ms(fwd_ts) - epoch_ms(ts) THEN 'backward'
         ELSE 'forward'
       END AS direction,
       CASE
         WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
         WHEN fwd_ts IS NULL THEN back_value
         WHEN back_ts IS NULL THEN fwd_value
         WHEN epoch_ms(ts) - epoch_ms(back_ts)
              <= epoch_ms(fwd_ts) - epoch_ms(ts) THEN back_value
         ELSE fwd_value
       END AS nearest_view_value
FROM w2 WHERE side = 1
"""


@register("asof_join_nearest", _ASOF_NEAREST_ORACLE)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (J6 completion): each purchase matches its
    temporally closest view in either direction, ties to the backward
    match (the pandas ``merge_asof(direction='nearest')`` semantic).
    Both direction scans run over the SAME user-keyed exchange (one
    shuffle, two sorts); the pick is pure column algebra on epoch
    milliseconds (NTZ/LTZ-tolerant via the shared ``epoch_ms``)."""
    u = _asof_inputs(spark, sf_dir)
    back = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), "side", F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    view_value = F.when(F.col("side") == 0, F.col("value"))
    view_ts = F.when(F.col("side") == 0, F.col("ts"))
    d = (
        u.withColumn("back_ts", F.last(view_ts, ignorenulls=True).over(back))
        .withColumn("back_value", F.last(view_value, ignorenulls=True).over(back))
        .withColumn("fwd_ts", F.last(view_ts, ignorenulls=True).over(fwd))
        .withColumn("fwd_value", F.last(view_value, ignorenulls=True).over(fwd))
        .filter(F.col("side") == 1)
    )
    back_closer = (
        epoch_ms(F.col("ts")) - epoch_ms(F.col("back_ts"))
    ) <= (epoch_ms(F.col("fwd_ts")) - epoch_ms(F.col("ts")))
    direction = (
        F.when(F.col("back_ts").isNull() & F.col("fwd_ts").isNull(), F.lit(None).cast("string"))
        .when(F.col("fwd_ts").isNull(), F.lit("backward"))
        .when(F.col("back_ts").isNull(), F.lit("forward"))
        .when(back_closer, F.lit("backward"))
        .otherwise(F.lit("forward"))
    )
    nearest_value = (
        F.when(F.col("back_ts").isNull() & F.col("fwd_ts").isNull(), F.lit(None).cast("double"))
        .when(F.col("fwd_ts").isNull(), F.col("back_value"))
        .when(F.col("back_ts").isNull(), F.col("fwd_value"))
        .when(back_closer, F.col("back_value"))
        .otherwise(F.col("fwd_value"))
    )
    return d.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        direction.alias("direction"),
        nearest_value.alias("nearest_view_value"),
    )


def asof_forward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    right_cols: list[str],
) -> DataFrame:
    """Generic FORWARD as-of join: every left row picks the right row with
    the SMALLEST ``on`` >= its own within the ``by`` group — the mirror of
    :func:`asof_backward` (same union-window pattern, time-descending
    scan; right rows still sort before left rows at equal ``on`` so the
    boundary is inclusive). Ties among right rows at the same ``on``
    resolve deterministically by payload-struct order. One shuffle on
    ``by``; fuzz-tested against DuckDB's native ASOF JOIN (<= direction)
    on tie-free right sides."""
    r_payload = F.struct(*[F.col(c) for c in right_cols])
    rw = right.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(0).alias("_side"),
        r_payload.alias("_r"),
    )
    l_payload = F.struct(*[F.col(c) for c in left.columns])
    lw = left.select(
        F.col(by).alias("_by"),
        F.col(on).alias("_on"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(rw.schema["_r"].dataType).alias("_r"),
        l_payload.alias("_lpay"),
    )
    u = rw.withColumn(
        "_lpay", F.lit(None).cast(lw.schema["_lpay"].dataType)
    ).unionByName(lw)
    win = (
        Window.partitionBy("_by")
        .orderBy(F.col("_on").desc(), "_side", F.col("_r").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    matched = (
        u.withColumn("_m", F.last("_r", ignorenulls=True).over(win))
        .filter(F.col("_side") == 1)
    )
    out_cols = [F.col(f"_lpay.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_m.{c}").alias(f"right_{c}") for c in right_cols]
    return matched.select(*out_cols)
