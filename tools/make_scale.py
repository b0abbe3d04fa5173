"""Synthesize a larger scale factor from an existing fixture directory.

Facts (lineitem, orders, events, documents, embeddings) are replicated
``factor`` times with key-space shifts so uniqueness and join consistency
hold; dimensions (customer, supplier, part, nation, region) are copied
unchanged — the realistic shape of growth (facts grow, dims don't).
Document text gets a per-copy suffix token so shingle-based near-dup does
not see every copy as a duplicate of its original.

Usage:
    python tools/make_scale.py [src_sf_dir] [dst_dir] [factor]

Then:  SPARK_GRAFT_SF_DIR=<dst_dir> python bench.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_synth"
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

KEY_OFFSET = 10_000_000_000  # far above any fixture key


def main() -> int:
    from pyspark.sql import functions as F

    from streamroom_bigdata_spark.schemas import FIXTURE_TABLES
    from streamroom_bigdata_spark.session import get_spark
    from streamroom_bigdata_spark.sources import load_table

    spark = get_spark(
        "make_scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )

    # per-table: columns to shift by copy_index * KEY_OFFSET
    shifts = {
        "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey"],
        "events": ["event_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }

    for name in FIXTURE_TABLES:
        src = load_table(spark, SRC, name)
        if name not in shifts:
            src.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")
            continue
        copied = src.crossJoin(
            spark.range(FACTOR).select(F.col("id").alias("_copy"))
        )
        for col in shifts[name]:
            copied = copied.withColumn(
                col, F.col(col) + F.col("_copy") * F.lit(KEY_OFFSET)
            )
        if name == "documents":
            # perturb text per copy so copies aren't trivial near-duplicates
            copied = copied.withColumn(
                "text", F.concat_ws(" ", "text", F.concat(F.lit("copytag"), "_copy"))
            )
        if name == "events":
            # spread users too, so per-user state grows sublinearly
            copied = copied.withColumn(
                "user_id", F.col("user_id") + F.col("_copy") * F.lit(1000)
            )
        copied.drop("_copy").write.mode("overwrite").parquet(
            f"{DST}/{name}.parquet"
        )
        print(f"{name}: x{FACTOR}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
