"""Data-governance / dataset-evaluation operators (round 10; SURVEY.md
§2.22): re-identification risk (k-anonymity), classifier-vs-gold agreement
(Cohen's kappa), and PII exposure density.

A pipeline that ships training data needs release gates, not just
transforms: the reference's consumer writes raw user events straight to a
store (`consumer.scala:61-91`); these are the reports a governance review
runs over the same data before any release. All three are
aggregate-shaped: one data-sized shuffle, then arithmetic over
DOMAIN-bounded relations (QI combos, label pairs, sources), so the output
and every intermediate past the first aggregate are fleet-size-independent.

Cross-engine determinism: every ratio here is a single IEEE division of
exact integers (counts), never a rounded float accumulation — both engines
produce the bit-identical double, so the comparator's 6-decimal
normalization sees identical strings without any half-up/half-even
rounding hazard (the `ltv_cohort_curve` lesson applied by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import shuffle_partition_count
from ..sources import load_table
from .text import _lang_id_sql, detected_lang_col

# ---------------------------------------------------------------------------
# k-anonymity risk profile
# ---------------------------------------------------------------------------

#: quasi-identifier columns for the customer table — the attacker-joinable
#: attributes (location + market segment)
K_ANON_QI = ("c_nationkey", "c_mktsegment")

_K_BUCKET_SQL = """
CASE WHEN k = 1 THEN 'k=1 (unique)'
     WHEN k < 5 THEN 'k=2-4'
     WHEN k < 10 THEN 'k=5-9'
     ELSE 'k>=10' END
"""

k_anonymity_oracle = f"""
WITH classes AS (
  SELECT {', '.join(K_ANON_QI)}, CAST(count(*) AS BIGINT) AS k
  FROM customer GROUP BY {', '.join(K_ANON_QI)}
), total AS (
  SELECT CAST(sum(k) AS BIGINT) AS n_total FROM classes
)
SELECT {_K_BUCKET_SQL} AS k_bucket,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(sum(k) AS BIGINT) AS n_rows,
       CAST(sum(k) AS BIGINT) / CAST(n_total AS DOUBLE) AS row_share,
       min(k) AS min_k, max(k) AS max_k
FROM classes CROSS JOIN total
GROUP BY k_bucket, n_total
"""


@register("k_anonymity_profile", k_anonymity_oracle)
def k_anonymity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk report over the customer quasi-identifiers
    (nation, market segment): every row is k-anonymous within its
    equivalence class of identically-QI'd rows; the report histograms
    class sizes into re-identification risk buckets (k=1 means a unique,
    directly re-identifiable combination).

    Scale shape: ONE data-sized shuffle (customer → QI-combo count with
    map-side partials); the class relation is QI-DOMAIN-bounded
    (|nations|×|segments| here), so the total and the bucket rollup are
    arithmetic over a tiny table. row_share is a single integer division —
    bit-identical cross-engine unrounded."""
    customer = load_table(spark, sf_dir, "customer")
    classes = customer.groupBy(*K_ANON_QI).agg(F.count("*").alias("k"))
    total = classes.agg(F.sum("k").alias("n_total"))
    return (
        classes.join(F.broadcast(total))  # QI-domain-bounded relation
        .withColumn("k_bucket", F.expr(_K_BUCKET_SQL))
        .groupBy("k_bucket", "n_total")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("k").alias("n_rows"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .select(
            "k_bucket",
            "n_classes",
            "n_rows",
            (F.col("n_rows") / F.col("n_total").cast("double")).alias(
                "row_share"
            ),
            "min_k",
            "max_k",
        )
    )


# ---------------------------------------------------------------------------
# Cohen's kappa: language-ID heuristic vs the stored gold label
# ---------------------------------------------------------------------------

kappa_oracle = f"""
WITH det AS ({_lang_id_sql('documents')}),
cells AS (
  SELECT lang AS gold, detected_lang AS pred, CAST(count(*) AS BIGINT) AS n
  FROM det GROUP BY 1, 2
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN gold = pred THEN n ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM cells
), gold_m AS (
  SELECT gold AS label, CAST(sum(n) AS BIGINT) AS n_gold FROM cells GROUP BY 1
), pred_m AS (
  SELECT pred AS label, CAST(sum(n) AS BIGINT) AS n_pred FROM cells GROUP BY 1
), chance AS (
  SELECT CAST(sum(g.n_gold * p.n_pred) AS BIGINT) AS sum_products
  FROM gold_m g JOIN pred_m p ON g.label = p.label
)
SELECT t.n_docs, t.n_agree,
       t.n_agree / CAST(t.n_docs AS DOUBLE) AS observed_agreement,
       c.sum_products / CAST(t.n_docs AS DOUBLE) / t.n_docs
         AS expected_agreement,
       (t.n_agree / CAST(t.n_docs AS DOUBLE)
          - c.sum_products / CAST(t.n_docs AS DOUBLE) / t.n_docs)
         / nullif(1 - c.sum_products / CAST(t.n_docs AS DOUBLE) / t.n_docs,
                  0) AS kappa
FROM tot t CROSS JOIN chance c
"""


@register("lang_id_agreement_kappa", kappa_oracle)
def lang_id_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the n-gram language-ID heuristic and the
    stored gold `lang` label — chance-corrected agreement, the standard
    classifier-vs-annotator evaluation a curation pipeline gates on before
    trusting an automatic labeler (κ = (p_o − p_e)/(1 − p_e), with p_e
    from the marginal products).

    Scale shape: the data-sized stage is the (gold, pred) cell count (one
    shuffle over the codegen'd detection expression — no Python worker);
    everything after runs on the |labels|²-bounded confusion relation:
    marginals, an exact INTEGER sum of marginal products, and three IEEE
    divisions — unrounded, so both engines emit the bit-identical double.
    κ is NULL (not an ANSI abort) in the degenerate p_e = 1 case."""
    docs = load_table(spark, sf_dir, "documents")
    n_parts = shuffle_partition_count(spark)
    cells = (
        # repartition BEFORE the 40-string-op detection projection: a
        # small-file corpus reads as ONE input split, serializing the
        # expensive per-row work in a single task (measured 3.5 s → 1.4 s
        # warm at sf0.1 — the theil_sen round-robin lesson); at real scale
        # many files parallelize the scan and the exchange cost stays
        # text-proportional either way
        docs.repartition(n_parts, "doc_id")
        .select(
            F.col("lang").alias("gold"),
            detected_lang_col().alias("pred"),
        )
        .groupBy("gold", "pred")
        .agg(F.count("*").alias("n"))
        # NOT localCheckpoint-pinned: the three consumers (totals + both
        # marginals) statically instantiate the detection subtree three
        # times, but its partial-agg exchange is runtime-REUSED (measured:
        # pinning changed warm time by <2% while doubling cold time by
        # splitting execution into two codegen-compiled jobs)
    )
    tot = cells.agg(
        F.sum("n").alias("n_docs"),
        F.sum(F.when(F.col("gold") == F.col("pred"), F.col("n")).otherwise(0)).alias(
            "n_agree"
        ),
    )
    gold_m = cells.groupBy(F.col("gold").alias("label")).agg(
        F.sum("n").alias("n_gold")
    )
    pred_m = cells.groupBy(F.col("pred").alias("label")).agg(
        F.sum("n").alias("n_pred")
    )
    chance = (
        gold_m.join(pred_m, "label")
        .agg(F.sum(F.col("n_gold") * F.col("n_pred")).alias("sum_products"))
    )
    n_docs_d = F.col("n_docs").cast("double")
    po = F.col("n_agree") / n_docs_d
    pe = F.col("sum_products") / n_docs_d / F.col("n_docs")
    return tot.join(F.broadcast(chance)).select(
        "n_docs",
        "n_agree",
        po.alias("observed_agreement"),
        pe.alias("expected_agreement"),
        ((po - pe) / F.nullif(F.lit(1) - pe, F.lit(0))).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# PII exposure density by source
# ---------------------------------------------------------------------------

# reuse the shared PII patterns (emails / NNN-NNN-NNNN phones) so the
# density report and the redactor can never disagree about what counts
from .text import PII_EMAIL, PII_PHONE  # noqa: E402

pii_density_oracle = f"""
WITH per_doc AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
           AS n_emails,
         CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
           AS n_phones
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_emails) AS BIGINT) AS total_emails,
       CAST(sum(n_phones) AS BIGINT) AS total_phones,
       CAST(sum(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS docs_with_pii,
       (1000 * CAST(sum(n_emails) AS BIGINT)) / CAST(count(*) AS DOUBLE)
         AS emails_per_1k_docs,
       (1000 * CAST(sum(n_phones) AS BIGINT)) / CAST(count(*) AS DOUBLE)
         AS phones_per_1k_docs
FROM per_doc GROUP BY source
"""


@register("pii_density_by_source", pii_density_oracle)
def pii_density_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure report: per ingestion source, how many documents carry
    emails/phones and the density per 1 000 docs — the ranking a curation
    team uses to decide which sources need redaction (`pii_redact`) or
    exclusion before release. Same shared regexes as the redactor, so the
    report and the scrubber cannot disagree.

    Scale shape: one pushed-projection scan with codegen'd regex counts,
    ONE |sources|-bounded aggregate with map-side partials; densities are
    single integer divisions (unrounded, engine-identical)."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), 0))
        .cast("bigint")
        .alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), 0))
        .cast("bigint")
        .alias("n_phones"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_emails").alias("total_emails"),
        F.sum("n_phones").alias("total_phones"),
        F.sum(
            ((F.col("n_emails") + F.col("n_phones")) > 0).cast("bigint")
        ).alias("docs_with_pii"),
        (
            (F.lit(1000) * F.sum("n_emails")) / F.count("*").cast("double")
        ).alias("emails_per_1k_docs"),
        (
            (F.lit(1000) * F.sum("n_phones")) / F.count("*").cast("double")
        ).alias("phones_per_1k_docs"),
    )


# ---------------------------------------------------------------------------
# l-diversity (round-11): sensitive-value diversity within each QI class
# ---------------------------------------------------------------------------

#: required distinct-l for the pass flag (the conventional minimum)
L_DIVERSITY_L = 3

l_diversity_oracle = f"""
WITH joined AS (
  SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority AS sv
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
), cnt AS (
  SELECT c_nationkey, c_mktsegment, sv, CAST(count(*) AS BIGINT) AS n
  FROM joined GROUP BY 1, 2, 3
), shared AS (
  SELECT c_nationkey, c_mktsegment, n,
         n / CAST(sum(n) OVER (PARTITION BY c_nationkey, c_mktsegment)
                  AS DOUBLE) AS p
  FROM cnt
), cls AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(sum(n) AS BIGINT) AS n_orders,
         CAST(count(*) AS BIGINT) AS distinct_l,
         sum(-p * ln(p)) AS h
  FROM shared GROUP BY c_nationkey, c_mktsegment
)
SELECT c_nationkey, c_mktsegment, n_orders, distinct_l,
       round(exp(h), 4) AS entropy_l,
       distinct_l >= {L_DIVERSITY_L} AS meets_l
FROM cls
"""


@register("l_diversity_profile", l_diversity_oracle)
def l_diversity_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity of each quasi-identifier class (k-anonymity's stronger
    sibling — a class can be large yet still leak if every member shares
    the same sensitive value): per (nation, segment) class, the distinct
    count AND entropy-l (exp of the Shannon entropy — the effective number
    of sensitive values an attacker faces) of the order-priority
    distribution of the class's orders, with the conventional l≥3 flag.

    Scale shape: one key-partitioned customer⋈orders join, then a
    combinable (QI, sensitive) count; everything after runs on the
    QI×|priorities| DOMAIN table. The windowed per-class total is over
    that bounded relation, not data."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(
        orders, orders.o_custkey == customer.c_custkey
    ).select("c_nationkey", "c_mktsegment", F.col("o_orderpriority").alias("sv"))
    cnt = joined.groupBy("c_nationkey", "c_mktsegment", "sv").agg(
        F.count("*").alias("n")
    )
    from pyspark.sql import Window

    wcls = Window.partitionBy("c_nationkey", "c_mktsegment")
    p = F.col("n") / F.sum("n").over(wcls).cast("double")
    cls = cnt.withColumn("p", p).groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.count("*").cast("long").alias("distinct_l"),
        F.sum(-F.col("p") * F.log("p")).alias("h"),
    )
    return cls.select(
        "c_nationkey",
        "c_mktsegment",
        "n_orders",
        "distinct_l",
        F.round(F.exp("h"), 4).alias("entropy_l"),
        (F.col("distinct_l") >= L_DIVERSITY_L).alias("meets_l"),
    )


# ---------------------------------------------------------------------------
# Round-14: t-closeness — the distributional member of the anonymity triad
# ---------------------------------------------------------------------------

T_CLOSENESS_T = 0.2  # conventional closeness threshold

t_closeness_oracle = """
WITH joined AS (
  SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority AS sv
  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
), cnt AS (
  SELECT c_nationkey, c_mktsegment, sv, CAST(count(*) AS BIGINT) AS n
  FROM joined GROUP BY 1, 2, 3
), gsv AS (
  SELECT sv, CAST(sum(n) AS BIGINT) AS gn FROM cnt GROUP BY sv
), tot AS (
  SELECT CAST(sum(gn) AS BIGINT) AS big_n FROM gsv
), cls AS (
  SELECT c_nationkey, c_mktsegment, CAST(sum(n) AS BIGINT) AS cn
  FROM cnt GROUP BY 1, 2
), grid AS (
  SELECT cls.c_nationkey, cls.c_mktsegment, cls.cn, g.sv, g.gn,
         coalesce(c.n, 0) AS n
  FROM cls CROSS JOIN gsv g
  LEFT JOIN cnt c ON c.c_nationkey = cls.c_nationkey
                 AND c.c_mktsegment = cls.c_mktsegment AND c.sv = g.sv
)
SELECT c_nationkey, c_mktsegment, cn AS class_n,
       floor(CAST(sum(abs(CAST(n AS HUGEINT) * big_n
                          - CAST(gn AS HUGEINT) * cn)) AS DOUBLE)
             / (2.0 * CAST(cn AS DOUBLE) * big_n) * 1000000 + 0.5)
         / 1000000 AS tvd,
       CAST(sum(abs(CAST(n AS HUGEINT) * big_n
                    - CAST(gn AS HUGEINT) * cn)) AS DOUBLE)
         / (2.0 * CAST(cn AS DOUBLE) * big_n) > 0.2 AS breaches_t
FROM grid CROSS JOIN tot
GROUP BY c_nationkey, c_mktsegment, cn, big_n
"""


@register("t_closeness_profile", t_closeness_oracle)
def t_closeness_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS of each quasi-identifier class — the distributional
    member completing the anonymity triad (k-anonymity: classes big
    enough; l-diversity: enough DISTINCT sensitive values; t-closeness:
    the class's sensitive DISTRIBUTION within t of the global one — a
    class can pass both k and l yet still leak via a skewed mix, Li et
    al. 2007). Categorical sensitive attribute → the EMD ground distance
    is uniform and t is the total variation distance ½Σ|p_class − p_glob|.

    Exactness: |n_cs/n_c − N_s/N| clears denominators to the exact
    integer |n_cs·N − N_s·n_c| (HUGEINT/DECIMAL) summed per class, one
    double division at the end — no float distribution ever compared.
    Scale shape: one key-partitioned customer⋈orders join + one
    combinable (QI, sv) count; the class×sv GRID (absent sensitive
    values must contribute p_class = 0) and everything after are
    QI-domain-bounded relations."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = customer.join(
        orders, orders.o_custkey == customer.c_custkey
    ).select(
        "c_nationkey", "c_mktsegment", F.col("o_orderpriority").alias("sv")
    )
    cnt = joined.groupBy("c_nationkey", "c_mktsegment", "sv").agg(
        F.count("*").alias("n")
    )
    glob = cnt.groupBy("sv").agg(F.sum("n").alias("gn"))
    cls = cnt.groupBy("c_nationkey", "c_mktsegment").agg(
        F.sum("n").alias("cn")
    )
    big_n = int(glob.agg(F.sum("gn")).collect()[0][0])
    grid = (
        cls.crossJoin(F.broadcast(glob))
        .join(
            cnt.withColumnRenamed("n", "n_cs"),
            ["c_nationkey", "c_mktsegment", "sv"],
            "left",
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "cn",
            "gn",
            F.coalesce(F.col("n_cs"), F.lit(0)).alias("n"),
        )
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    num = F.abs(dec(F.col("n")) * big_n - dec(F.col("gn")) * F.col("cn"))
    tvd = F.col("s").cast("double") / (
        2.0 * F.col("cn").cast("double") * big_n
    )
    return (
        grid.groupBy("c_nationkey", "c_mktsegment", "cn")
        .agg(F.sum(num).alias("s"))
        .select(
            "c_nationkey",
            "c_mktsegment",
            F.col("cn").cast("long").alias("class_n"),
            (F.floor(tvd * 1000000 + 0.5) / 1000000).alias("tvd"),
            (tvd > T_CLOSENESS_T).alias("breaches_t"),
        )
    )


# ---------------------------------------------------------------------------
# McNemar's paired classifier test (round-15)
# ---------------------------------------------------------------------------


def _mcnemar_sql() -> str:
    from .quality import EN_STOPWORDS

    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH det AS ({_lang_id_sql('documents')}),
paired AS (
  SELECT CAST(d.detected_lang = d.lang AS INT) AS ca,
         CAST((CASE WHEN len(list_filter(string_split(doc.text, ' '),
                                         t -> list_contains([{stop}], t))) > 0
                    THEN 'en' ELSE 'und' END) = d.lang AS INT) AS cb
  FROM det d JOIN documents doc USING (doc_id)
)
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(ca * (1 - cb)) AS BIGINT) AS a_only_correct,
       CAST(sum((1 - ca) * cb) AS BIGINT) AS b_only_correct,
       round(CAST((abs(sum(ca * (1 - cb)) - sum((1 - ca) * cb)) - 1)
                  * (abs(sum(ca * (1 - cb)) - sum((1 - ca) * cb)) - 1)
                  AS DOUBLE)
             / nullif(sum(ca * (1 - cb)) + sum((1 - ca) * cb), 0), 6)
         AS mcnemar_chi2
FROM paired
"""


@register("mcnemar_lang_classifiers", _mcnemar_sql())
def mcnemar_lang_classifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test between the two language classifiers this repo
    ships — the bigram-profile heuristic (A) and the stopword-presence
    English detector (B) — against the gold `lang` label: does A beat B
    on the SAME documents, or do their errors just shuffle around?
    Accuracy deltas ignore pairing; McNemar reads only the DISCORDANT
    pairs (b = A-right-B-wrong, c = A-wrong-B-right) and computes the
    continuity-corrected χ²₁ = (|b−c|−1)²/(b+c) — the correct paired
    comparison `lang_id_agreement_kappa` (agreement, not superiority)
    does not answer.

    Exactness: both classifiers are integer-exact deterministic column
    expressions (the κ detection expression + a token-membership test
    identical to the brier/ECE scorer); b, c are exact counts and χ² is
    one integer-ratio division.

    Shape: one codegen detection scan → 4-cell reduce; nothing bigger
    than a constant crosses a shuffle."""
    from .quality import EN_STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    pred_b = F.when(
        F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))) > 0,
        F.lit("en"),
    ).otherwise(F.lit("und"))
    paired = docs.select(
        (detected_lang_col() == F.col("lang")).cast("int").alias("ca"),
        (pred_b == F.col("lang")).cast("int").alias("cb"),
    )
    b = F.sum(F.col("ca") * (1 - F.col("cb")))
    c = F.sum((1 - F.col("ca")) * F.col("cb"))
    return paired.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        b.cast("bigint").alias("a_only_correct"),
        c.cast("bigint").alias("b_only_correct"),
        F.round(
            ((F.abs(b - c) - 1) * (F.abs(b - c) - 1)).cast("double")
            / F.nullif((b + c).cast("double"), F.lit(0.0)),
            6,
        ).alias("mcnemar_chi2"),
    )
