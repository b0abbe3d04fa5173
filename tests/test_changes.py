"""Invariant tests for the temporal change analytics (operators/changes.py).

The DuckDB oracles prove engine agreement; these tests prove the SEMANTIC
invariants the oracles can't see — interval algebra of the SCD2 output,
island maximality, window containment of the rolling actives, PSI algebra.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators.changes import (
    drift_psi_event_types,
    gaps_islands_activity,
    mode_event_type,
    rolling_active_users,
    scd2_type_history,
)
from streamroom_bigdata_spark.sources import load_table

from conftest import SF_SMOKE


def test_scd2_intervals_partition_each_users_timeline(spark):
    rows = scd2_type_history(spark, SF_SMOKE).collect()
    ev = load_table(spark, SF_SMOKE, "events")
    n_users = ev.select("user_id").distinct().count()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user) == n_users
    for user, segs in by_user.items():
        segs.sort(key=lambda r: r.valid_from_ms)
        # exactly one open (current) interval, and it is the last one
        assert [bool(s.is_current) for s in segs] == [False] * (
            len(segs) - 1
        ) + [True]
        # half-open intervals chain with no gap and no overlap
        for a, b in zip(segs, segs[1:]):
            assert a.valid_to_ms == b.valid_from_ms
        # consecutive runs carry DIFFERENT attribute values (compression)
        for a, b in zip(segs, segs[1:]):
            assert a.event_type != b.event_type


def test_scd2_reconstructs_event_types(spark):
    """Every event's type equals the type of the SCD2 interval covering it."""
    segs = scd2_type_history(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events").select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        F.col("event_type").alias("actual_type"),
    )
    covered = ev.join(segs, "user_id").filter(
        (F.col("ms") >= F.col("valid_from_ms"))
        & (F.col("valid_to_ms").isNull() | (F.col("ms") < F.col("valid_to_ms")))
    )
    # every event has exactly one covering interval...
    assert covered.count() == ev.count()
    # ...and it predicts the event's type
    assert (
        covered.filter(F.col("actual_type") != F.col("event_type")).count()
        == 0
    )


def test_islands_are_maximal_and_consistent(spark):
    rows = gaps_islands_activity(spark, SF_SMOKE).collect()
    seen = {}
    for r in rows:
        days = (r.island_end - r.island_start).days + 1
        assert days == r.n_days  # consecutive: span length == day count
        seen.setdefault(r.user_id, []).append(r)
    for user, islands in seen.items():
        islands.sort(key=lambda r: r.island_start)
        for a, b in zip(islands, islands[1:]):
            # maximality: adjacent islands are separated by a real gap
            assert (b.island_start - a.island_end).days >= 2


def test_rolling_actives_brackets_daily_actives(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    daily = {
        r.day: r.dau
        for r in ev.select(
            F.col("ts").cast("timestamp").cast("date").alias("day"), "user_id"
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("dau"))
        .collect()
    }
    total_users = ev.select("user_id").distinct().count()
    rolling = {
        r.day: r.active_7d
        for r in rolling_active_users(spark, SF_SMOKE).collect()
    }
    assert set(rolling) == set(daily)
    for day, active in rolling.items():
        assert daily[day] <= active <= total_users


def test_psi_terms_match_recomputed_probabilities(spark):
    rows = drift_psi_event_types(spark, SF_SMOKE).collect()
    tot_a, tot_b = sum(r.cnt_a for r in rows), sum(r.cnt_b for r in rows)
    for r in rows:
        p, q = r.cnt_a / tot_a, r.cnt_b / tot_b
        assert math.isclose(r.psi_term, (p - q) * math.log(p / q), abs_tol=5e-8)
    # PSI index (sum of terms) is finite and non-negative by construction
    assert sum(r.psi_term for r in rows) >= -1e-12


def test_mode_is_argmax_with_lexicographic_ties(spark):
    counts = {}
    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "event_type")
    for r in ev.groupBy("user_id", "event_type").count().collect():
        counts.setdefault(r.user_id, {})[r.event_type] = r["count"]
    for r in mode_event_type(spark, SF_SMOKE).collect():
        per_user = counts[r.user_id]
        best = min(
            per_user.items(), key=lambda kv: (-kv[1], kv[0])
        )  # max count, then lexicographically first
        assert (r.top_type, r.cnt) == best


def test_mutual_information_independent_and_dependent(spark, tmp_path):
    """Exactly independent (lang, source) counts ⇒ every PMI is 0; a
    diagonal (lang determines source, equal mass) ⇒ Σ mi_contrib = ln 2."""
    from streamroom_bigdata_spark.operators.changes import (
        mutual_information_lang_source,
    )

    # independent: counts are the exact product of marginals (40 = 2x2 grid
    # with 10 docs per cell x marginal shares 1:1)
    rows, i = [], 0
    for lang in ("en", "de"):
        for src in ("web", "book"):
            for _ in range(10):
                rows.append((i, f"t {i}", lang, src, 5))
                i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = mutual_information_lang_source(spark, str(tmp_path)).collect()
    assert len(out) == 4
    assert all(r.pmi == 0.0 and r.mi_contrib == 0.0 for r in out)

    # perfectly dependent diagonal: I(lang; source) = ln 2
    rows = [(i, f"t {i}", "en", "web", 5) for i in range(20)] + [
        (20 + i, f"t {20 + i}", "de", "book", 5) for i in range(20)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = mutual_information_lang_source(spark, str(tmp_path)).collect()
    assert len(out) == 2
    assert abs(sum(r.mi_contrib for r in out) - math.log(2)) < 1e-5
