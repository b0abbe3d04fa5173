"""Semantic pins for the round-13 wave — planted-data properties the
oracle equality can't express (the oracle agreeing doesn't prove the
STATISTIC means what it claims)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from streamroom_bigdata_spark.operators.kmeans import KM_K
from streamroom_bigdata_spark.operators.multimodal import (
    _WAV_DATA,
    WAV_FRAME,
    silence_segments,
)
from streamroom_bigdata_spark.operators.revops import price_index_laspeyres
from streamroom_bigdata_spark.operators.stats import logrank_test_conversion
from streamroom_bigdata_spark.operators.text import (
    good_turing_unseen_mass,
    token_burstiness,
)


def _docs(tmp_path, texts, langs=None, sources=None):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(1, n + 1)),
                "text": texts,
                "lang": langs or ["en"] * n,
                "source": sources or ["t"] * n,
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )


def test_burstiness_separates_clumped_from_even(spark, tmp_path):
    """'topic' appears 5× in each of 4 docs (clumped); 'glue' once in
    every one of 20 docs (even). Same corpus frequency (20), but the
    Fano factor must rank topic ≫ glue ≈ 1 − 20/20 adjusted — i.e.
    topic's fano strictly larger."""
    texts = []
    for i in range(20):
        words = ["glue", "fill1", "fill2"]  # shared fillers keep vocab ≤ 20
        if i < 4:
            words += ["topic"] * 5
        texts.append(" ".join(words))
    _docs(tmp_path, texts)
    import streamroom_bigdata_spark.operators.text as txt

    old = txt.BURST_MIN_DF
    txt.BURST_MIN_DF = 1
    try:
        rows = {r.tok: r.fano for r in token_burstiness(spark, str(tmp_path)).collect()}
    finally:
        txt.BURST_MIN_DF = old
    # module-level constant is baked into the registered oracle, but the
    # Spark callable reads it at build time — compare Spark-side only here
    assert rows["topic"] > rows["glue"]
    # even token: var/mean of (1×20, 0×0) = 1 − cf/N... exactly (20·20 −
    # 400)/(20·20) = 0 — glue appears EXACTLY once per doc → fano 0
    assert rows["glue"] == 0.0


def test_good_turing_singleton_mass(spark, tmp_path):
    """A 10-token doc with 6 singleton tokens and two doubletons:
    unseen_mass = 6/10, n2 = 2."""
    _docs(tmp_path, ["a b c d e f g g h h"])
    r = good_turing_unseen_mass(spark, str(tmp_path)).collect()[0]
    assert r.n_tokens == 10 and r.vocab == 8
    assert r.n1 == 6 and r.n2 == 2
    assert abs(r.unseen_mass - 0.6) < 1e-9


def test_silence_segments_kernel_runs_and_threshold():
    """8 loud samples then 16 zero samples then 8 loud: frames of 8 →
    [loud, silent, silent, loud]; one 2-frame segment."""
    samples = [1000] * 8 + [0] * 16 + [1000] * 8
    out = silence_segments(samples)
    assert out == {
        "n_frames": 4,
        "silent_frames": 2,
        "n_segments": 1,
        "longest_segment": 2,
    }
    assert WAV_FRAME == 8 and _WAV_DATA == 64


def test_logrank_identical_arms_is_null(spark, tmp_path):
    """Events engineered so both arms share the exact same duration
    distribution → O−E = 0 and z = 0 (the null is exactly attainable
    because ties are symmetric)."""
    import pandas as pd

    rows = []
    eid = 0
    for user in range(1, 41):  # 20 even + 20 odd, mirrored behavior
        base = pd.Timestamp("2024-01-01")
        rows.append((eid, user, "view", 1.0, base))
        eid += 1
        # half of each arm converts on day (user//2 % 5 + 1) — parity-
        # symmetric so both arms share the duration distribution
        if (user // 2) % 2 == 0:
            rows.append(
                (
                    eid,
                    user,
                    "purchase",
                    500.0,
                    base + pd.Timedelta(days=(user // 4) % 5 + 1),
                )
            )
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "value", "ts"]
    )
    pq.write_table(pa.Table.from_pandas(pdf), str(tmp_path / "events.parquet"))
    r = logrank_test_conversion(spark, str(tmp_path)).collect()[0]
    assert r.o_minus_e == 0.0
    assert r.z_score == 0.0


def test_price_index_constant_prices_is_one(spark, tmp_path):
    """Two months, same unit price per brand, different quantities →
    Laspeyres = Paasche = Fisher = 1.0 in the second month."""
    import pandas as pd

    li = pd.DataFrame(
        {
            "l_partkey": [1, 2, 1, 2],
            "l_shipdate": pd.to_datetime(
                ["2024-01-10", "2024-01-20", "2024-02-10", "2024-02-20"]
            ).date,  # date32, not TIMESTAMP(NANOS) — Spark rejects nanos
            "l_quantity": [10.0, 5.0, 20.0, 2.0],
            "l_extendedprice": [100.0, 250.0, 200.0, 100.0],
        }
    )
    part = pd.DataFrame(
        {"p_partkey": [1, 2], "p_brand": ["BrandA", "BrandB"]}
    )
    pq.write_table(pa.Table.from_pandas(li), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.Table.from_pandas(part), str(tmp_path / "part.parquet"))
    rows = {
        r.month: (r.laspeyres, r.paasche, r.fisher)
        for r in price_index_laspeyres(spark, str(tmp_path)).collect()
    }
    assert rows[202401] == (1.0, 1.0, 1.0)
    assert rows[202402] == (1.0, 1.0, 1.0)


def test_kmeans_shared_model_constant():
    """The cluster-quality metrics grade the model kmeans ships: KM_K
    pins the contract (silhouette/DB oracles unroll the same chain)."""
    assert KM_K == 8
