"""`repeated_substring_spans` — the cross-ALIGNMENT property that
motivates the operator (round-13 brief #7): a duplicated run that
straddles `block_dup_stats`'s fixed BLOCK_K block boundaries is
invisible to block dedup but MUST be found, with its exact extent, by
the sliding-gram seed-and-extend protocol.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from streamroom_bigdata_spark.operators.dedup import (
    BLOCK_K,
    SUB_L,
    block_dup_stats,
    repeated_substring_spans,
)

# a 10-token run shared by two docs at offsets 0 and 3 — misaligned
# modulo BLOCK_K (8), so NO fixed 8-token block of doc B equals any
# block of doc A; filler tokens are all distinct so the run is the only
# repeat
_RUN = [f"dup{i}" for i in range(10)]
_DOC_A = _RUN + [f"a{i}" for i in range(6)]  # run at p=0..9
_DOC_B = [f"b{i}" for i in range(3)] + _RUN + [f"c{i}" for i in range(3)]
# run at p=3..12


def _plant(tmp_path):
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": [" ".join(_DOC_A), " ".join(_DOC_B)],
                "lang": ["en", "en"],
                "source": ["t", "t"],
                "n_chars": [len(" ".join(_DOC_A)), len(" ".join(_DOC_B))],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_block_dedup_misses_the_misaligned_run(spark, tmp_path):
    """Control: both docs are ≥ BLOCK_K tokens, yet no non-overlapping
    8-block coincides across the 3-token offset — block dedup reports
    ZERO duplicated blocks."""
    assert len(_DOC_A) >= BLOCK_K and len(_DOC_B) >= BLOCK_K
    _plant(tmp_path)
    rows = {
        r.doc_id: r.dup_blocks
        for r in block_dup_stats(spark, str(tmp_path)).collect()
    }
    assert all(v == 0 for v in rows.values()), rows


def test_substring_spans_find_exact_extent_at_any_alignment(
    spark, tmp_path
):
    """The operator recovers the WHOLE 10-token run in both docs — one
    region, dup_tokens = 10 = max_region_len — despite the offsets
    differing by 3 (any alignment) and the run spanning a block
    boundary."""
    assert len(_RUN) >= SUB_L
    _plant(tmp_path)
    got = {
        r.doc_id: (r.n_regions, r.dup_tokens, r.max_region_len)
        for r in repeated_substring_spans(spark, str(tmp_path)).collect()
    }
    assert got == {1: (1, 10, 10), 2: (1, 10, 10)}
