"""Z-order layout: bit-level correctness and the skipping-effectiveness
claim (Morton buckets are tight in BOTH dims; a one-column sort is not)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import layout


def test_interleave_known_vectors(spark):
    """interleave(x=0b11, y=0b01) = bits x0→0, y0→1, x1→2, y1→3 =
    0b0111 = 7; quadrant property: the top interleaved bits are the top
    bits of (y, x)."""
    df = spark.createDataFrame([(3, 1), (0, 0), (65535, 65535)], "x long, y long")
    out = df.select(
        layout.interleave_bits(F.col("x"), F.col("y")).alias("z")
    ).collect()
    assert [r.z for r in out] == [7, 0, (1 << 32) - 1]


def test_scale_to_bits_endpoints(spark):
    df = spark.createDataFrame([(0,), (50,), (100,)], "v long")
    out = df.select(
        layout.scale_to_bits(F.col("v"), F.lit(0), F.lit(100)).alias("s")
    ).collect()
    vals = [r.s for r in out]
    assert vals[0] == 0 and vals[2] == 65535
    assert 0 < vals[1] < 65535


def test_zorder_buckets_tighter_than_single_column_sort(spark, tmp_path):
    """On a 64×64 uniform grid, Z-order buckets cover small rectangles in
    BOTH dims; bucketing the same rows by partkey alone leaves each bucket
    spanning the FULL suppkey range. Average covered area must be at
    least 4× smaller for Z-order."""
    n = 64
    rows = [(p, s) for p in range(1, n + 1) for s in range(1, n + 1)]
    spark.createDataFrame(rows, "l_partkey long, l_suppkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))

    prof = layout.zorder_layout(spark, str(tmp_path)).collect()
    assert sum(r.n for r in prof) == n * n
    z_area = sum(
        (r.part_max - r.part_min + 1) * (r.supp_max - r.supp_min + 1)
        for r in prof
    ) / len(prof)

    # same bucket COUNT, but keyed on partkey order alone
    df = spark.createDataFrame(rows, "l_partkey long, l_suppkey long")
    nb = len(prof)
    flat = (
        df.withColumn("bucket", F.floor((F.col("l_partkey") - 1) / (n / nb)))
        .groupBy("bucket")
        .agg(
            F.min("l_partkey").alias("pmin"),
            F.max("l_partkey").alias("pmax"),
            F.min("l_suppkey").alias("smin"),
            F.max("l_suppkey").alias("smax"),
        )
        .collect()
    )
    flat_area = sum(
        (r.pmax - r.pmin + 1) * (r.smax - r.smin + 1) for r in flat
    ) / len(flat)
    assert z_area * 4 <= flat_area, (z_area, flat_area)
