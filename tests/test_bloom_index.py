"""Per-file Bloom sidecar index (sources/bloom_index.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamroom_bigdata_spark.sources.bloom_index import (
    bloom_pruned_read,
    build_bloom_sidecars,
)
from streamroom_bigdata_spark.sources.maintenance import (
    write_range_partitioned,
)


def _clustered_table(spark, tmp_path, n=20_000, files=16):
    """Keys clustered by the range layout, so each key lives in ~1 file —
    the layout half of the layout+index synergy."""
    d = str(tmp_path / "indexed")
    df = spark.range(0, n, 1, 8).select(
        (F.col("id") % 500).alias("k"), F.col("id").alias("v")
    )
    write_range_partitioned(df, d, "k", files)
    return d


def test_pruned_read_matches_full_scan(spark, tmp_path):
    d = _clustered_table(spark, tmp_path)
    n_files = build_bloom_sidecars(spark, d, "k")
    assert n_files == 16

    probes = [3, 250, 499]
    got = {
        (r.k, r.v) for r in bloom_pruned_read(spark, d, "k", probes).collect()
    }
    want = {
        (r.k, r.v)
        for r in spark.read.parquet(d).filter(F.col("k").isin(probes)).collect()
    }
    assert got == want and len(want) > 0


def test_pruned_read_opens_few_files(spark, tmp_path):
    d = _clustered_table(spark, tmp_path)
    build_bloom_sidecars(spark, d, "k")
    pruned = bloom_pruned_read(spark, d, "k", [42])
    # the clustered layout puts key 42 in one file; FPs may add a couple
    opened = pruned.select(F.input_file_name()).distinct().count()
    assert 1 <= opened <= 3


def test_absent_value_reads_nothing(spark, tmp_path):
    d = _clustered_table(spark, tmp_path)
    build_bloom_sidecars(spark, d, "k")
    out = bloom_pruned_read(spark, d, "k", [987_654_321])
    assert out.count() == 0
    # schema preserved for downstream composition
    assert set(out.columns) == {"k", "v"}


def test_sidecar_invisible_to_plain_reads(spark, tmp_path):
    d = _clustered_table(spark, tmp_path)
    before = spark.read.parquet(d).count()
    build_bloom_sidecars(spark, d, "k")
    assert spark.read.parquet(d).count() == before
    assert set(spark.read.parquet(d).columns) == {"k", "v"}
