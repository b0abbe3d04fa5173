"""Measured shuffle audit: EXECUTED-plan metrics per headline query.

PLANS.md counts exchanges statically; this tool runs each headline query
(sf0.1 by default) and reads the AQE-final executed plan's SQL metrics —
actual shuffle bytes/records written, broadcast sizes, and rows scanned.
The number that matters at 100 TB is bytes-through-the-shuffle per query,
and it is measured here, not inferred.

Usage:
    python tools/shuffle_audit.py [sf_dir] [query ...] [--write]
    # --write → SHUFFLES.md; query names default to bench.py's HEADLINE
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

_pos = [a for a in sys.argv[1:] if not a.startswith("-")]
SF_DIR = _pos[0] if _pos else "/root/testdata/sf0.1"
ONLY = _pos[1:]  # optional query subset (default: bench HEADLINE)
WRITE = "--write" in sys.argv

HEADER = (
    "| query | shuffles | shuffle MiB | shuffle rows | broadcast MiB | "
    "rows scanned |\n|---|---|---|---|---|---|"
)


def _metrics(node) -> dict:
    vals = {}
    it = node.metrics().iterator()
    while it.hasNext():
        kv = it.next()
        vals[kv._1()] = kv._2().value()
    return vals


def _walk(node, acc) -> None:
    name = node.nodeName()
    m = _metrics(node)
    if name == "Exchange":
        acc["shuffles"] += 1
        acc["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
        acc["shuffle_rows"] += m.get("shuffleRecordsWritten", 0)
    elif name == "BroadcastExchange":
        acc["broadcast_bytes"] += m.get("dataSize", 0)
    elif name.startswith("Scan"):
        acc["scan_rows"] += m.get("numOutputRows", 0)
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), acc)
    if name.endswith("QueryStage"):
        _walk(node.plan(), acc)


def main() -> int:
    from bench import HEADLINE

    from streamroom_bigdata_spark import registry
    from streamroom_bigdata_spark.session import get_spark

    spark = get_spark(
        "shuffle_audit", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    qs = registry.queries()
    lines = [HEADER]
    for name in (ONLY or HEADLINE):
        df = qs[name](spark, SF_DIR)
        df.collect()
        root = df._jdf.queryExecution().executedPlan()
        # unwrap AdaptiveSparkPlanExec to the final, metric-bearing plan
        final = (
            root.executedPlan()
            if root.nodeName() == "AdaptiveSparkPlan"
            else root
        )
        acc = {
            "shuffles": 0,
            "shuffle_bytes": 0,
            "shuffle_rows": 0,
            "broadcast_bytes": 0,
            "scan_rows": 0,
        }
        _walk(final, acc)
        lines.append(
            "| {} | {} | {:.2f} | {:,} | {:.2f} | {:,} |".format(
                name,
                acc["shuffles"],
                acc["shuffle_bytes"] / 1048576,
                acc["shuffle_rows"],
                acc["broadcast_bytes"] / 1048576,
                acc["scan_rows"],
            )
        )
    table = "\n".join(lines)
    if WRITE:
        with open("SHUFFLES.md", "w") as f:
            f.write(
                "# Measured shuffle audit (tools/shuffle_audit.py at "
                f"{SF_DIR})\n\n"
                "Executed-plan SQL metrics per headline query — actual "
                "bytes/records through each shuffle and broadcast, after "
                "AQE's final re-plan. Complements PLANS.md (static "
                "exchange counts): a query is scale-safe when shuffle "
                "bytes are a small, output-proportional fraction of rows "
                "scanned.\n\n" + table + "\n\n"
                "Reading notes: partial (map-side) aggregation is why "
                "pricing_summary scans 600k rows but shuffles 6; every "
                "broadcast here is AQE-chosen, not hinted (the plan-audit "
                "guard test forbids forced broadcasts over fact-derived "
                "relations), so a side that grows past the threshold at "
                "larger SF falls back to a shuffle join automatically — "
                "near_dup_pairs' band table is the big one to watch and is "
                "exactly the side the hot-bucket cap bounds.\n"
            )
        print("wrote SHUFFLES.md")
    else:
        print(table)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
