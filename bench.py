"""Benchmark harness (driver contract).

Runs the headline queries from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock seconds across the headline set (each query
executed to completion via ``count()`` — full plan execution, no driver-side
result materialization cost in the number). Per-query seconds are under
``queries``. Run with ``python bench.py``; pass query names as argv to bench a
subset.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one representative per operator family (SURVEY.md §2) —
# scan+agg, star join, window top-k, flagship recommendation, as-of and
# interval joins, exact + near dedup, similarity search, text analysis.
HEADLINE = [
    "pricing_summary",        # A6 multi-agg scan (TPC-H Q1 shape)
    "star_join_revenue",      # J3 fact ⋈ 4 dims
    "topk_per_brand",         # W1 window rank top-k
    "recommend_rooms",        # flagship hybrid scoring query
    "asof_join",              # J6 as-of via window
    "range_join_attribution", # J5 interval join
    "dedup_exact",            # L1 hash dedup
    "near_dup_pairs",         # L2 MinHash-LSH band join
    "cosine_topk",            # L3 brute-force similarity
    "ann_lsh_cosine",         # L3 ANN scale path
    "text_quality",           # L4 quality scoring
    "token_frequencies",      # D5 tokenize + count
    "running_totals",         # W3 frame aggregates
    "rollup_orders",          # A7 rollup
]


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    only = sys.argv[1:]
    names = only or HEADLINE

    from streamroom_bigdata_spark import registry
    from streamroom_bigdata_spark.session import get_spark

    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = registry.queries()

    # Warm the JVM + parquet footers + Arrow/Python worker pool once so
    # per-query numbers measure the query, not session startup. Neither
    # warm-up query is in the headline set, so every headline number below is
    # an equally cold first run (on warm workers, as on a long-lived cluster).
    qs["global_stats"](spark, sf_dir).count()

    # touch every fixture table once (parquet footers + page cache) so no
    # headline query pays first-read IO that its peers don't
    from streamroom_bigdata_spark.schemas import FIXTURE_TABLES
    from streamroom_bigdata_spark.sources import load_table

    for t in FIXTURE_TABLES:
        load_table(spark, sf_dir, t).count()

    # one trivial pandas-UDF pass over every core, so the per-core Python
    # worker fork cost lands here instead of in the first pandas query
    n_part = spark.sparkContext.defaultParallelism
    spark.range(0, n_part * 10, 1, n_part).mapInPandas(
        lambda it: it, "id long"
    ).count()

    timings: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    m = re.match(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = float(m.group(1)) if m else 0.0
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
