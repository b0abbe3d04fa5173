"""Incremental corpus near-dup (operators/incdedup.py) + the blind-append
manifest commit path it rides on (sources/manifest_table.manifest_append).

The load-bearing property: the union of probe outputs over ANY batch
partitioning of a corpus equals the full-recompute ``near_dup_pairs`` on
that corpus — each pair emitted exactly once, by the batch that completes
it — across chained manifest commits, with no text re-read after its own
batch.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import dedup, incdedup
from streamroom_bigdata_spark.sources import load_table
from streamroom_bigdata_spark.sources.manifest_table import (
    manifest_append,
    manifest_compact,
    manifest_read,
    manifest_vacuum,
    manifest_write,
)


def _pairs(df) -> dict[tuple[int, int], float]:
    return {(r.doc_a, r.doc_b): r.jaccard for r in df.collect()}


def test_chained_probes_equal_full_recompute(spark, sf_dir, tmp_path):
    """Three chained commits (doc_id mod 3): union of the three probe
    outputs == full-corpus near_dup_pairs, pair for pair, jaccard for
    jaccard — the emit-exactly-once invariant."""
    idx = str(tmp_path / "idx")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got: dict[tuple[int, int], float] = {}
    for b in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == b)
        probe = _pairs(incdedup.neardup_probe_pairs(spark, idx, batch))
        # exactly-once: no probe may re-emit a pair an earlier one found
        assert not set(probe) & set(got)
        got.update(probe)
        incdedup.neardup_index_ingest(spark, idx, batch)
    assert got == _pairs(dedup.near_dup_pairs(spark, sf_dir))


def test_probe_plan_pinned_to_build_time_generation(spark, sf_dir, tmp_path):
    """A probe DataFrame collected AFTER later ingests must still see the
    index as of its build (manifest_read pins the immutable generation
    dirs at plan time) — the laziness-safety contract the registered
    3-batch query relies on."""
    idx = str(tmp_path / "idx")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    b0 = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    incdedup.neardup_index_ingest(spark, idx, b0)
    lazy_probe = incdedup.neardup_probe_pairs(spark, idx, b1)  # not collected
    eager = _pairs(incdedup.neardup_probe_pairs(spark, idx, b1))
    incdedup.neardup_index_ingest(spark, idx, b1)  # mutates the index
    assert _pairs(lazy_probe) == eager


def test_manifest_append_is_o_batch_and_time_travels(spark, tmp_path):
    """Append commits stage only their own rows (no copy of the table),
    reads see the union, time travel sees each prefix, vacuum keeps every
    dir a retained generation references, and compact pays the chain
    down to one dir."""
    t = str(tmp_path / "t")
    df = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    g0 = manifest_write(spark, t, df(0, 5))
    g1 = manifest_append(spark, t, df(5, 8))
    g2 = manifest_append(spark, t, df(8, 10))
    assert (g0, g1, g2) == (0, 1, 2)
    assert manifest_read(spark, t).count() == 10
    assert manifest_read(spark, t, generation=1).count() == 8
    assert manifest_read(spark, t, generation=0).count() == 5
    # the appended generations share gen-0's dir: vacuum keeping the last
    # 2 generations must NOT break them (gen-0 dir still referenced)
    manifest_vacuum(spark, t, keep=2)
    assert manifest_read(spark, t).count() == 10
    assert manifest_read(spark, t, generation=1).count() == 8
    with pytest.raises(FileNotFoundError):
        manifest_read(spark, t, generation=0)
    # compact collapses the append chain into one fresh dir
    manifest_compact(spark, t, n_files=1)
    manifest_vacuum(spark, t, keep=1)
    assert manifest_read(spark, t).count() == 10


def test_reingest_via_append_duplicates_by_design(spark, tmp_path):
    """Blind append has no key semantics: appending the same rows twice
    doubles them — the documented contract that tells pipelines with
    replay risk to use manifest_upsert instead."""
    t = str(tmp_path / "t")
    rows = spark.range(3).select(F.col("id").alias("k"))
    manifest_write(spark, t, rows)
    manifest_append(spark, t, rows)
    assert manifest_read(spark, t).count() == 6
