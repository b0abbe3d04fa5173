"""Governance wave (k-anonymity, Cohen's kappa, PII density) — planted-data
checks beyond the DuckDB oracle equivalence."""

from __future__ import annotations

import pytest

from streamroom_bigdata_spark import registry
from streamroom_bigdata_spark.operators import governance


def _patch(monkeypatch, tables: dict):
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.governance.load_table",
        lambda spark_, sf_, name: tables[name],
    )


def _customers(spark, rows):
    """rows: (nationkey, mktsegment) — one customer per row"""
    return spark.createDataFrame(
        [(i, f"c{i}", n, 0.0, s) for i, (n, s) in enumerate(rows)],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )


def _docs(spark, rows):
    """rows: (lang, source, text)"""
    return spark.createDataFrame(
        [(i, t, la, so, len(t)) for i, (la, so, t) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


# --- k-anonymity -------------------------------------------------------------


def test_k_anonymity_planted_buckets(spark, monkeypatch):
    """Classes of size 1, 3, and 6 land in the three risk buckets with
    exact row shares over the 10-row table."""
    rows = (
        [(1, "A")] * 1 + [(2, "B")] * 3 + [(3, "C")] * 6
    )
    _patch(monkeypatch, {"customer": _customers(spark, rows)})
    got = {
        r.k_bucket: (r.n_classes, r.n_rows, r.row_share, r.min_k, r.max_k)
        for r in governance.k_anonymity_profile(spark, "ignored").collect()
    }
    assert got == {
        "k=1 (unique)": (1, 1, 0.1, 1, 1),
        "k=2-4": (1, 3, 0.3, 3, 3),
        "k=5-9": (1, 6, 0.6, 6, 6),
    }


# --- Cohen's kappa ------------------------------------------------------------


def test_kappa_planted_confusion(spark, monkeypatch):
    """Gold en/de split 3/1; detector: English text scores en, German text
    scores de, one English doc mislabeled de in gold → hand-computed κ.

    Texts are built from profile bigrams so the heuristic's verdict is
    forced: 'the then ' repeats en-profile bigrams; 'eich eich ' de ones."""
    en_text = "the then there " * 3
    de_text = "eich eichen geich " * 3
    docs = _docs(
        spark,
        [
            ("en", "s", en_text),
            ("en", "s", en_text),
            ("en", "s", de_text),  # detector says de → disagreement
            ("de", "s", de_text),
        ],
    )
    _patch(monkeypatch, {"documents": docs})
    [r] = governance.lang_id_agreement_kappa(spark, "ignored").collect()
    # confusion: gold en→(en 2, de 1); gold de→(de 1)
    # po = 3/4; marginals gold (en 3, de 1), pred (en 2, de 2)
    # pe = (3*2 + 1*2)/16 = 0.5 → kappa = (0.75-0.5)/0.5 = 0.5
    assert (r.n_docs, r.n_agree) == (4, 3)
    assert r.observed_agreement == pytest.approx(0.75)
    assert r.expected_agreement == pytest.approx(0.5)
    assert r.kappa == pytest.approx(0.5)


def test_kappa_degenerate_pe_is_null_not_abort(spark, monkeypatch):
    """All gold and all predictions a single identical label → pe = 1;
    kappa must be NULL, not an ANSI divide-by-zero abort."""
    docs = _docs(spark, [("en", "s", "the then there " * 3)] * 3)
    _patch(monkeypatch, {"documents": docs})
    [r] = governance.lang_id_agreement_kappa(spark, "ignored").collect()
    assert r.observed_agreement == 1.0
    assert r.expected_agreement == 1.0
    assert r.kappa is None


# --- PII density ----------------------------------------------------------------


def test_pii_density_planted(spark, monkeypatch):
    docs = _docs(
        spark,
        [
            ("en", "web", "contact a@b.com and c@d.org today"),
            ("en", "web", "call 555-123-4567 now"),
            ("en", "web", "clean document"),
            ("en", "wiki", "clean document"),
        ],
    )
    _patch(monkeypatch, {"documents": docs})
    got = {
        r.source: (
            r.n_docs, r.total_emails, r.total_phones, r.docs_with_pii,
            r.emails_per_1k_docs, r.phones_per_1k_docs,
        )
        for r in governance.pii_density_by_source(spark, "ignored").collect()
    }
    assert got == {
        "web": (3, 2, 1, 2, 2000 / 3, 1000 / 3),
        "wiki": (1, 0, 0, 0, 0.0, 0.0),
    }


def test_pii_density_patterns_match_redactor(spark, sf_dir):
    """The density report and pii_redact share regex constants — assert the
    import linkage (a drifted copy would silently disagree)."""
    from streamroom_bigdata_spark.operators import text

    assert governance.PII_EMAIL is text.PII_EMAIL
    assert governance.PII_PHONE is text.PII_PHONE


# --- plan shapes ------------------------------------------------------------------


def test_pii_density_single_exchange(spark, sf_dir):
    plan = (
        registry.queries()["pii_density_by_source"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert len(
        [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    ) == 1
    assert "Exchange SinglePartition" not in plan


def test_kappa_has_no_python_worker(spark, sf_dir):
    """Detection must stay the codegen'd column expression — no
    Arrow/Python eval node in the plan."""
    plan = (
        registry.queries()["lang_id_agreement_kappa"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
