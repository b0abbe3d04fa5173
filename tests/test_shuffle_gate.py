"""The shuffle-regression gate's tolerance logic (tools/shuffle_audit.py
diff_books): red on the round-12/13 bug class (a corpus-growing join side
slipping into a broadcast; a pair-stage explosion), green on AQE jitter.
The measured-plant leg (reverting a real shuffle_hash pin and watching the
gate go red) is run once per round in close_round dry-run form and booked
in BASELINE.md."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from tools.shuffle_audit import diff_books


def _q(broadcast=0.0, rows=0, shuffles=3):
    return {
        "shuffles": shuffles,
        "shuffle_mib": 1.0,
        "shuffle_rows": rows,
        "broadcast_mib": broadcast,
        "scan_rows": 100,
    }


def test_planted_broadcast_regression_is_red():
    # the bpe_encode_docs incident, scaled to sf0.1: a pinned 0-MiB side
    # reverts to a ~300 MiB auto-broadcast
    prev = {"bpe_encode_docs": _q(broadcast=0.0, rows=1_000_000)}
    cur = {"bpe_encode_docs": _q(broadcast=316.8, rows=1_000_000)}
    bad = diff_books(prev, cur)
    assert len(bad) == 1 and "broadcast" in bad[0]


def test_pair_stage_explosion_is_red():
    prev = {"near_dup_pairs": _q(rows=777_000)}
    cur = {"near_dup_pairs": _q(rows=78_400_000)}  # the quadratic signature
    bad = diff_books(prev, cur)
    assert len(bad) == 1 and "shuffle rows" in bad[0]


def test_noise_and_modest_growth_are_green():
    prev = {
        "a": _q(broadcast=12.0, rows=500_000),
        "b": _q(broadcast=0.0, rows=50_000),
    }
    cur = {
        "a": _q(broadcast=17.5, rows=900_000),  # < ×1.5+8 and < ×2+200k
        "b": _q(broadcast=6.0, rows=240_000),  # small abs growth, tolerated
    }
    assert diff_books(prev, cur) == []


def test_new_and_removed_queries_do_not_trip():
    prev = {"gone": _q(broadcast=500.0)}
    cur = {"fresh": _q(broadcast=500.0)}  # new query sets its own baseline
    assert diff_books(prev, cur) == []


def test_multiple_violations_all_reported():
    prev = {"a": _q(), "b": _q()}
    cur = {"a": _q(broadcast=100.0), "b": _q(rows=10_000_000)}
    assert len(diff_books(prev, cur)) == 2


# ---------------------------------------------------------------------------
# Absolute pins (round 16): revert-proof upper bounds for the shared-subtree
# wins — a planted revert of _capped_contrib (11 shuffles / 67.5 MiB at
# sf0.1) must go red even when both diffed books carry the reverted shape.
# ---------------------------------------------------------------------------

from tools.shuffle_audit import PINNED_MAX_SF01, check_pins


def test_planted_capped_contrib_revert_is_red():
    cur = {"jaccard_links": _q(shuffles=11)}
    cur["jaccard_links"]["shuffle_mib"] = 67.5  # the r14 pre-fix shape
    bad = check_pins(cur)
    assert len(bad) == 2
    assert any("shuffles" in b for b in bad)
    assert any("shuffle_mib" in b for b in bad)


def test_pinned_queries_at_measured_shape_are_green():
    cur = {
        "jaccard_links": {"shuffles": 5, "shuffle_mib": 38.6},
        "kmv_source_overlap": {"shuffles": 1},
        "theil_sen_daily_trend": {"shuffles": 3},
    }
    assert check_pins(cur) == []


def test_unpinned_and_absent_queries_do_not_trip():
    assert check_pins({"fresh_query": _q(shuffles=99)}) == []
    assert check_pins({}) == []


def test_every_pin_names_a_real_metric():
    legal = {"shuffles", "shuffle_mib", "shuffle_rows", "broadcast_mib",
             "scan_rows"}
    for lims in PINNED_MAX_SF01.values():
        assert set(lims) <= legal
