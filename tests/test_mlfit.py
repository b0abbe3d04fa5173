"""Model-fitting operators (naive Bayes, two-factor OLS, Zipf/Heaps fits)
— planted-data checks beyond the DuckDB oracle equivalence."""

from __future__ import annotations

import hashlib
import math

from streamroom_bigdata_spark.operators import mlfit

_DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _docs(spark, rows):
    """rows: (doc_id, lang, text)"""
    return spark.createDataFrame(
        [(i, t, lang, "src0", len(t)) for i, lang, t in rows], _DOC_SCHEMA
    )


def _patch(monkeypatch, df):
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.mlfit.load_table",
        lambda spark_, sf_, name: df,
    )


def _is_test(doc_id: int) -> bool:
    """Python twin of the portable salted hash split used by the operator."""
    h = int(hashlib.md5(f"{doc_id}|nb".encode()).hexdigest()[:15], 16)
    return h % 100 < mlfit.NB_TEST_PCT


def test_naive_bayes_separable_vocab_is_diagonal(spark, monkeypatch):
    """Fully disjoint vocabularies per language → every held-out document
    classified correctly: the confusion matrix is diagonal and accounts
    for exactly the hash-held-out docs."""
    rows = []
    for i in range(80):
        if i % 2 == 0:
            rows.append((i, "aa", "foo foo bar foo"))
        else:
            rows.append((i, "bb", "baz qux baz baz"))
    n_test = {"aa": 0, "bb": 0}
    for i, lang, _ in rows:
        if _is_test(i):
            n_test[lang] += 1
    # the planted split must exercise both phases for both classes
    assert all(v > 0 for v in n_test.values())
    _patch(monkeypatch, _docs(spark, rows))
    out = mlfit.naive_bayes_lang(spark, "ignored").collect()
    got = {(r.true_lang, r.pred_lang): r.n_docs for r in out}
    assert got == {
        ("aa", "aa"): n_test["aa"],
        ("bb", "bb"): n_test["bb"],
    }


def test_naive_bayes_out_of_vocab_doc_is_dropped(spark, monkeypatch):
    """A held-out doc whose tokens never occur in training joins to no
    model row and drops from the confusion matrix (the documented
    multinomial convention)."""
    oov_id = next(i for i in range(1000) if _is_test(i))
    rows = [(oov_id, "aa", "zz zz")]
    nid = 0
    for _ in range(40):
        while _is_test(nid) or nid == oov_id:
            nid += 1
        rows.append((nid, "aa", "foo bar"))
        nid += 1
    _patch(monkeypatch, _docs(spark, rows))
    out = mlfit.naive_bayes_lang(spark, "ignored").collect()
    assert out == []


def test_ols_two_factor_recovers_planted_plane(spark, monkeypatch):
    """Noise-free y = 10 + 2*quantity + 3*discount over a full factorial
    grid → exact coefficients and R² = 1."""
    rows = [
        (float(q), float(d) / 10.0, 10.0 + 2.0 * q + 3.0 * d / 10.0)
        for q in range(1, 6)
        for d in range(0, 5)
    ]
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_extendedprice double"
    )
    _patch(monkeypatch, df)
    r = mlfit.ols_two_factor(spark, "ignored").collect()[0]
    assert r.n == 25
    assert r.b_quantity == 2.0
    assert r.b_discount == 3.0
    assert r.intercept == 10.0
    assert r.r2 == 1.0


def test_zipf_fit_exact_inverse_law(spark, monkeypatch):
    """Counts 12/6/4/3 at ranks 1/2/3/4 lie exactly on c = 12/rank →
    exponent 1, intercept ln 12, R² = 1."""
    text = " ".join(["a"] * 12 + ["b"] * 6 + ["c"] * 4 + ["d"] * 3)
    _patch(monkeypatch, _docs(spark, [(0, "aa", text)]))
    r = mlfit.zipf_law_fit(spark, "ignored").collect()[0]
    assert r.n_types == 4
    assert r.zipf_exponent == 1.0
    assert abs(r.log_c0 - round(math.log(12.0), 6)) < 1e-9
    assert r.r2 == 1.0


def test_heaps_fit_all_unique_tokens_is_linear(spark, monkeypatch):
    """Docs of all-distinct tokens (V = N exactly) → β = 1, k = 1, R² = 1."""
    rows = [
        (0, "aa", "t1 t2"),
        (1, "aa", "u1 u2 u3 u4"),
        (2, "aa", "v1 v2 v3 v4 v5 v6 v7 v8"),
    ]
    _patch(monkeypatch, _docs(spark, rows))
    r = mlfit.heaps_law_fit(spark, "ignored").collect()[0]
    assert r.n_docs == 3
    assert r.heaps_beta == 1.0
    assert r.heaps_k == 1.0
    assert r.r2 == 1.0


def test_logreg_gd_matches_python_replay(spark, monkeypatch):
    """Planted separable table replayed through the identical 3-step GD in
    plain Python (same round-6 standardization, same update order) —
    weights and loss agree to output precision, and the learned quantity
    weight is positive (high quantity ⇒ return in the plant)."""
    import math

    rows = []
    for i in range(60):
        q = float(10 + (i % 40))
        d = (i % 10) / 100.0
        flag = "R" if q >= 30.0 else "N"
        rows.append((q, d, flag))
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_returnflag string"
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.mlfit.load_table",
        lambda spark_, sf_, name: df,
    )
    out = mlfit.logreg_gd_returns(spark, "ignored").collect()[0]

    n = len(rows)
    m1 = round(sum(r[0] for r in rows) / n, 6)
    m2 = round(sum(r[1] for r in rows) / n, 6)
    s1 = round(
        math.sqrt(sum((r[0] - sum(x[0] for x in rows) / n) ** 2 for r in rows)
                  / (n - 1)), 6)
    s2 = round(
        math.sqrt(sum((r[1] - sum(x[1] for x in rows) / n) ** 2 for r in rows)
                  / (n - 1)), 6)
    feats = [((r[0] - m1) / s1, (r[1] - m2) / s2,
              1.0 if r[2] == "R" else 0.0) for r in rows]
    w = [0.0, 0.0, 0.0]
    for _ in range(mlfit.LOGREG_STEPS):
        g = [0.0, 0.0, 0.0]
        for x1, x2, y in feats:
            p = 1.0 / (1.0 + math.exp(-(w[0] + w[1] * x1 + w[2] * x2)))
            g[0] += p - y
            g[1] += (p - y) * x1
            g[2] += (p - y) * x2
        w = [wi - mlfit.LOGREG_LR * (gi / n) for wi, gi in zip(w, g)]
    loss = sum(
        -(y * math.log(1.0 / (1.0 + math.exp(-(w[0] + w[1] * x1 + w[2] * x2))))
          + (1 - y) * math.log(1.0 - 1.0 / (1.0 + math.exp(-(w[0] + w[1] * x1
                                                             + w[2] * x2)))))
        for x1, x2, y in feats
    ) / n
    assert out.n == n
    assert abs(out.w_intercept - round(w[0], 6)) < 2e-6
    assert abs(out.w_quantity - round(w[1], 6)) < 2e-6
    assert abs(out.w_discount - round(w[2], 6)) < 2e-6
    assert abs(out.log_loss - round(loss, 6)) < 2e-6
    assert out.w_quantity > 0.2


def test_gmm_em_matches_python_replay(spark, monkeypatch):
    """Planted bimodal values replayed through the identical 3-step EM in
    plain Python (same round-6 moment init, same update order) — params
    and log-likelihood agree to output precision, and the two recovered
    means straddle the planted clusters."""
    import datetime as dt

    lo = [4.0 + 0.1 * i for i in range(30)]
    hi = [48.0 + 0.2 * i for i in range(30)]
    vals = lo + hi
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 28), 1, "metric", v, "{}")
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.mlfit.load_table",
        lambda spark_, sf_, name: df,
    )
    out = mlfit.gmm_em_1d(spark, "ignored").collect()[0]

    n = len(vals)
    mean = sum(vals) / n
    m = round(mean, 6)
    s = round(math.sqrt(sum((v - mean) ** 2 for v in vals) / (n - 1)), 6)
    w1, mu1, s1, mu2, s2 = 0.5, m - s, s, m + s, s
    sq2pi = mlfit._SQRT_2PI

    def dens(x, mu, sig):
        return math.exp(-((x - mu) ** 2) / (2 * sig * sig)) / (sig * sq2pi)

    for _ in range(mlfit.GMM_STEPS):
        n2 = sx2 = sxx2 = sx1 = sxx1 = 0.0
        for x in vals:
            r2 = ((1 - w1) * dens(x, mu2, s2)) / (
                w1 * dens(x, mu1, s1) + (1 - w1) * dens(x, mu2, s2)
            )
            n2 += r2
            sx2 += r2 * x
            sxx2 += r2 * x * x
            sx1 += (1 - r2) * x
            sxx1 += (1 - r2) * x * x
        n1 = n - n2
        w1 = n1 / n
        mu1, mu2 = sx1 / n1, sx2 / n2
        s1 = math.sqrt(sxx1 / n1 - mu1 * mu1)
        s2 = math.sqrt(sxx2 / n2 - mu2 * mu2)
    assert out.n == n
    assert abs(out.w1 - round(w1, 6)) < 2e-5
    assert abs(out.mu1 - round(mu1, 4)) < 2e-3
    assert abs(out.sigma1 - round(s1, 4)) < 2e-3
    assert abs(out.mu2 - round(mu2, 4)) < 2e-3
    assert abs(out.sigma2 - round(s2, 4)) < 2e-3
    assert out.mu1 < 20.0 < out.mu2  # components straddle the plant


def test_ols_collinear_is_null_not_abort(spark, monkeypatch):
    """Constant discount zeroes the covariance determinant → NULL
    coefficients under ANSI mode, never a DIVIDE_BY_ZERO abort."""
    rows = [(float(q), 0.05, 10.0 + 2.0 * q) for q in range(1, 8)]
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_extendedprice double"
    )
    _patch(monkeypatch, df)
    r = mlfit.ols_two_factor(spark, "ignored").collect()[0]
    assert r.n == 7
    assert r.b_quantity is None and r.r2 is None


def test_logreg_zero_variance_feature_is_null_not_abort(spark, monkeypatch):
    """A constant feature column standardizes to NULL → NULL weights,
    never an ANSI abort in the first gradient pass."""
    rows = [(5.0, 0.01 * i, "R" if i % 2 else "N") for i in range(10)]
    df = spark.createDataFrame(
        rows, "l_quantity double, l_discount double, l_returnflag string"
    )
    _patch(monkeypatch, df)
    r = mlfit.logreg_gd_returns(spark, "ignored").collect()[0]
    assert r.w_quantity is None and r.log_loss is None


def test_gmm_constant_values_is_null_not_abort(spark, monkeypatch):
    """All-equal values give σ = 0 at init → NULL parameters, never a
    DIVIDE_BY_ZERO abort in the E-step densities."""
    import datetime as dt

    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 5), 1, "m", 7.0, "{}")
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    monkeypatch.setattr(
        "streamroom_bigdata_spark.operators.mlfit.load_table",
        lambda spark_, sf_, name: df,
    )
    r = mlfit.gmm_em_1d(spark, "ignored").collect()[0]
    assert r.n == 20
    assert r.mu1 is None and r.sigma2 is None
