"""Fixture-schema drift canary.

The driver regenerates /root/testdata each round; a silent schema change
there (round 5: events.ts flipped from tz-aware to tz-naive timestamp[us],
which Spark 4 reads as TIMESTAMP_NTZ and which broke every epoch call site)
should fail ONE loud test naming the drifted column — not scatter analysis
errors across queries, tests, and the bench.

The canary pins the physical parquet schema (pyarrow, no Spark session
needed — runs in milliseconds) for all 10 fixture tables. If it fails:
  1. diff the message to see which column drifted;
  2. audit operators touching that column (timestamps: everything must go
     through streamroom_bigdata_spark.functions.timeutil.epoch_ms, which is
     NTZ/LTZ-tolerant);
  3. update EXPECTED below to the new ground truth.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_CANARY_SF", "/root/testdata/sf0.01")

# tz=None on a timestamp type means Spark 4 will infer TIMESTAMP_NTZ when
# spark.sql.parquet.inferTimestampNTZ.enabled=true (its default). Session
# factory disables the inference; operators cast at the call site.
EXPECTED: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int32"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int32"),
        ("n_name", "string"),
        ("n_regionkey", "int32"),
    ],
    "customer": [
        ("c_custkey", "int64"),
        ("c_name", "string"),
        ("c_nationkey", "int32"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "int64"),
        ("s_name", "string"),
        ("s_nationkey", "int32"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "int64"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int32"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "int64"),
        ("o_custkey", "int64"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp[us]"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "int64"),
        ("l_partkey", "int64"),
        ("l_suppkey", "int64"),
        ("l_linenumber", "int32"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp[us]"),
    ],
    "events": [
        ("event_id", "int64"),
        ("ts", "timestamp[us]"),
        ("user_id", "int64"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "int64"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "int64"),
    ],
    "embeddings": [
        ("vec_id", "int64"),
        ("embedding", "list<element: float>"),
        ("label", "int32"),
    ],
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_schema_unchanged(table: str) -> None:
    path = f"{SF_DIR}/{table}.parquet"
    if not os.path.exists(path):
        pytest.skip(f"fixture dir {SF_DIR} absent")
    schema = pq.read_schema(path)
    actual = [(f.name, str(f.type)) for f in schema]
    assert actual == EXPECTED[table], (
        f"FIXTURE DRIFT in {path}:\n"
        f"  expected: {EXPECTED[table]}\n"
        f"  actual:   {actual}\n"
        "The driver regenerated the fixtures with a different schema. "
        "Audit operators reading the drifted column(s) — timestamp columns "
        "must only be consumed via functions/timeutil.epoch_ms (NTZ/LTZ-"
        "tolerant) — then update EXPECTED in this test."
    )


def test_events_ts_timezone_discipline() -> None:
    """Pin the NTZ/LTZ question explicitly: events.ts is currently written
    timezone-NAIVE (tz=None). If this flips to tz-aware, Spark reads LTZ
    everywhere and the epoch_ms cast becomes a no-op (fine) — but oracle
    timestamps may shift unless the session timezone stays UTC."""
    path = f"{SF_DIR}/events.parquet"
    if not os.path.exists(path):
        pytest.skip(f"fixture dir {SF_DIR} absent")
    field = pq.read_schema(path).field("ts")
    assert field.type.tz is None, (
        f"events.ts is now tz-aware ({field.type}); Spark will read it as "
        "TIMESTAMP_LTZ. Verify oracle agreement (session tz must stay UTC) "
        "and update this canary."
    )
