"""Data-quality validation: every rule fires on planted bad rows, clean
rows pass, reasons arrays compose."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from streamroom_bigdata_spark.operators import quality


def _frame(spark):
    orders = spark.createDataFrame(
        [
            # (key, custkey, status, total, date)       expected reasons
            (1, 10, "O", 100.0, dt.datetime(1996, 1, 1)),   # clean
            (2, 10, "X", 100.0, dt.datetime(1996, 1, 1)),   # bad status
            (3, 10, "O", -5.0, dt.datetime(1996, 1, 1)),    # bad total
            (4, 10, "O", 100.0, dt.datetime(2003, 1, 1)),   # bad date
            (5, 99, "O", 100.0, dt.datetime(1996, 1, 1)),   # orphan cust
            (6, 99, "X", 0.0, dt.datetime(1903, 1, 1)),     # all four
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp",
    )
    cust = spark.createDataFrame([(10,)], "c_custkey long").select(
        F.col("c_custkey").alias("_c_key")
    )
    return orders.join(cust, orders.o_custkey == F.col("_c_key"), "left")


def test_each_rule_fires_and_composes(spark):
    marked = quality.validate(_frame(spark), quality.order_rules())
    reasons = {
        r.o_orderkey: sorted(r.dq_reasons) for r in marked.collect()
    }
    assert reasons[1] == []
    assert reasons[2] == ["known_status"]
    assert reasons[3] == ["positive_total"]
    assert reasons[4] == ["date_in_range"]
    assert reasons[5] == ["customer_exists"]
    assert reasons[6] == [
        "customer_exists", "date_in_range", "known_status", "positive_total"
    ]


def test_quarantine_and_summary_agree(spark, sf_dir):
    quar = quality.dq_orders_quarantine(spark, sf_dir)
    summ = {r.rule: r.n_violations for r in quality.dq_orders_summary(spark, sf_dir).collect()}
    exploded = dict(
        quar.select(F.explode(F.split("dq_reasons", ",")).alias("r"))
        .groupBy("r").count().collect()
    )
    assert exploded == summ


def test_validate_applies_to_streams(spark, tmp_path):
    """The same one-pass rule projection runs unchanged on a STREAMING
    frame (stateless projection + stream-static referential join) — DQ at
    ingest is the identical code path as batch DQ."""
    import json
    import os

    import pandas as pd

    from streamroom_bigdata_spark.sources.readers import stream_file_source

    ddl = ("o_orderkey long, o_custkey long, o_orderstatus string, "
           "o_totalprice double, o_orderdate timestamp")
    rows = [
        {"o_orderkey": 1, "o_custkey": 10, "o_orderstatus": "O",
         "o_totalprice": 5.0, "o_orderdate": "1996-01-01T00:00:00"},
        {"o_orderkey": 2, "o_custkey": 99, "o_orderstatus": "X",
         "o_totalprice": -1.0, "o_orderdate": "1996-01-01T00:00:00"},
    ]
    src = tmp_path / "dq_src"
    src.mkdir()
    pd.DataFrame(rows).to_json(src / "b0.json", orient="records", lines=True,
                               date_format="iso")
    stream = stream_file_source(spark, str(src), ddl, fmt="json")
    cust = spark.createDataFrame([(10,)], "c_custkey long").select(
        F.col("c_custkey").alias("_c_key")
    )
    marked = quality.validate(
        stream.join(cust, stream.o_custkey == F.col("_c_key"), "left"),
        quality.order_rules(),
    ).select("o_orderkey", F.array_join(F.sort_array("dq_reasons"), ",").alias("r"))
    q = (
        marked.writeStream.format("memory").queryName("dq_stream_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {r.o_orderkey: r.r for r in spark.sql("select * from dq_stream_sink").collect()}
    assert got == {1: "", 2: "customer_exists,known_status,positive_total"}


def test_null_values_are_violations(spark):
    """NULL in a validated column is a quarantine hit, not a silent pass
    (three-valued-logic regression: when(~NULL) drops the mark)."""
    orders = spark.createDataFrame(
        [(1, 10, None, None, None)],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp",
    )
    cust = spark.createDataFrame([(10,)], "c_custkey long").select(
        F.col("c_custkey").alias("_c_key")
    )
    joined = orders.join(cust, orders.o_custkey == F.col("_c_key"), "left")
    marked = quality.validate(joined, quality.order_rules()).collect()[0]
    assert sorted(marked.dq_reasons) == [
        "date_in_range", "known_status", "positive_total"
    ]


def test_observe_counts_ride_the_consuming_job(spark, sf_dir):
    """observe(): metrics come from the SAME action that consumed the
    frame (no second scan) and agree with an explicit recount."""
    marked = quality._marked_orders(spark, sf_dir)
    observed, obs = quality.observed_quarantine(marked)
    kept = observed.filter(F.size("dq_reasons") == 0).count()
    got = obs.get
    assert got["rows_seen"] == marked.count()
    assert got["rows_violating"] == marked.filter(F.size("dq_reasons") > 0).count()
    assert kept == got["rows_seen"] - got["rows_violating"]


def test_observe_metrics_single_pass(spark, sf_dir):
    """df.observe: the metrics surface from the SAME action that consumes
    the frame — values match an independent recomputation, with no second
    scan coded anywhere."""
    from streamroom_bigdata_spark.functions.telemetry import (
        observed_quality_metrics,
    )
    from streamroom_bigdata_spark.sources import load_table
    from pyspark.sql import functions as F

    orders = load_table(spark, sf_dir, "orders")
    inst, obs = observed_quality_metrics(orders, "o_totalprice")
    written = inst.filter(F.col("o_totalprice") >= 0).count()  # ONE action
    got = obs.get
    ref = orders.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("nn"),
        F.sum(F.col("o_totalprice").cast("double")).alias("t"),
    ).collect()[0]
    assert got["n_rows"] == ref["n"] >= written
    assert got["n_nulls"] == ref["nn"]
    assert abs(got["total"] - ref["t"]) < 1e-6 * abs(ref["t"])


# --- Character entropy (round-11) -------------------------------------------


def test_char_entropy_known_values(spark, monkeypatch):
    """'aabb' has exactly 1 bit/char; a single repeated char has 0 —
    both below the quality floor; a mixed-alphabet string lands in the
    ok band."""
    from streamroom_bigdata_spark.operators import quality

    docs = spark.createDataFrame(
        [
            (1, "aabb", "en", "s", 4),
            (2, "aaaaaa", "en", "s", 6),
            (3, "the quick brown fox jumps over the lazy dog 0123456789",
             "en", "s", 55),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.quality.load_table",
        lambda spark_, sf_, name: docs,
    )
    rows = {r.doc_id: r for r in
            quality.char_entropy_quality(spark, "x").collect()}
    assert rows[1].entropy_bits == pytest.approx(1.0, abs=1e-9)
    assert not rows[1].entropy_ok
    assert rows[2].entropy_bits == pytest.approx(0.0, abs=1e-9)
    assert not rows[2].entropy_ok
    assert rows[2].distinct_chars == 1
    assert rows[3].entropy_ok
    assert rows[3].n_chars_counted == 54
