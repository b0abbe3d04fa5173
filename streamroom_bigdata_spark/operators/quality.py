"""Data-quality validation (round-7; SURVEY.md §2.15): declarative rule
checks with row-level quarantine — the expectations/constraints surface
(à la Deequ / dbt tests / Delta constraints) every production pipeline
bolts onto ingest.

Design: rules are named boolean Columns evaluated in ONE pass — each row
gets the array of rule names it violates; the quarantine is the non-empty
slice. Referential rules are left joins whose null-extension marks the
orphan. No second scan, no per-rule jobs: k rules cost one projection over
the fact scan plus one dim join per referential rule (AQE-broadcast when
small). At 100 TB the quarantine output is violation-sized, the summary is
rule-count-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.localdf import local_df
from ..registry import register
from ..sources import load_table

_ALLOWED_STATUS = ("F", "O", "P")
# fixture dates span 1995-01..2001-08; the range rule flags the 2001 tail
# (~9% of orders) — a realistic "stale feed" quarantine slice
_MIN_DATE, _MAX_DATE = "1992-01-01", "2000-12-31"


def validate(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """Append a ``dq_reasons`` array column: names of violated rules (rule
    Column TRUE ⇒ row passes). A rule evaluating to NULL — a NULL in the
    validated column — is a VIOLATION, not a pass: under three-valued
    logic ``when(~NULL)`` silently drops the mark, and a quarantine that
    waves NULLs through is the one bug a DQ operator cannot have. One
    projection; empty array ⇒ clean row."""
    marks = [
        F.when(~F.coalesce(cond, F.lit(False)), F.lit(name))
        for name, cond in sorted(rules.items())
    ]
    return df.withColumn(
        "dq_reasons",
        F.filter(F.array(*marks), lambda x: x.isNotNull()),
    )


def order_rules() -> dict[str, Column]:
    """The orders-table rule set (referential rule joined in by caller)."""
    return {
        "positive_total": F.col("o_totalprice") > 0.0,
        "known_status": F.col("o_orderstatus").isin(*_ALLOWED_STATUS),
        "date_in_range": F.col("o_orderdate").between(_MIN_DATE, _MAX_DATE),
        "customer_exists": F.col("_c_key").isNotNull(),
    }


# NULL-as-violation mirrors validate(): every rule wrapped in
# coalesce(cond, FALSE) before negation. Shared by both oracles.
_RULES_SQL = f"""[
           CASE WHEN NOT coalesce(o.o_totalprice > 0.0, FALSE)
                THEN 'positive_total' END,
           CASE WHEN NOT coalesce(o.o_orderstatus IN ('F','O','P'), FALSE)
                THEN 'known_status' END,
           CASE WHEN NOT coalesce(o.o_orderdate BETWEEN
                  DATE '{_MIN_DATE}' AND DATE '{_MAX_DATE}', FALSE)
                THEN 'date_in_range' END,
           CASE WHEN c.c_custkey IS NULL THEN 'customer_exists' END
         ]"""

dq_quarantine_oracle = f"""
WITH marked AS (
  SELECT o.o_orderkey,
         list_sort(list_filter({_RULES_SQL}, x -> x IS NOT NULL)) AS dq_reasons
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
)
SELECT o_orderkey, array_to_string(dq_reasons, ',') AS dq_reasons
FROM marked WHERE len(dq_reasons) > 0
"""


def _marked_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders left-joined to the customer key and rule-marked — the shared
    input of quarantine and summary (one definition, no drift)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("_c_key")
    )
    return validate(
        orders.join(cust, orders.o_custkey == F.col("_c_key"), "left"),
        order_rules(),
    )


@register("dq_orders_quarantine", dq_quarantine_oracle)
def dq_orders_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows of ``orders`` violating any rule, with the sorted list of
    violated rule names — the quarantine feed. Rules: positive total,
    known status code, date in the valid range, referential integrity to
    ``customer`` (orphan detection via null-extended left join)."""
    marked = _marked_orders(spark, sf_dir)
    return marked.filter(F.size("dq_reasons") > 0).select(
        "o_orderkey",
        # comma-joined sorted reasons: scalar column for the driver
        # comparator (repo convention — no array-typed query outputs)
        F.array_join(F.sort_array("dq_reasons"), ",").alias("dq_reasons"),
    )


dq_summary_oracle = f"""
WITH marked AS (
  SELECT unnest(list_filter({_RULES_SQL}, x -> x IS NOT NULL)) AS rule
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
), counts AS (
  SELECT rule, count(*) AS n_violations FROM marked GROUP BY rule
), total AS (
  SELECT count(*) AS n FROM orders
)
SELECT c.rule, c.n_violations,
       round(CAST(c.n_violations AS DOUBLE) / t.n, 6) AS violation_rate
FROM counts c, total t
"""


@register("dq_orders_summary", dq_summary_oracle)
def dq_orders_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule violation counts + rates over ``orders`` — the health
    dashboard number. Explode of the per-row reason array then a
    rule-count-sized aggregation; the total is a 1-row combine reused via
    a broadcast-sized cross join."""
    marked = _marked_orders(spark, sf_dir)
    counts = (
        marked.select(F.explode("dq_reasons").alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").alias("n_violations"))
    )
    orders = load_table(spark, sf_dir, "orders")
    # no broadcast hint: `total` is a 1-row aggregate but derives from the
    # FACT table — the repo invariant forbids forced broadcasts above
    # fact-derived relations (AQE broadcasts the single row at runtime)
    total = orders.agg(F.count("*").alias("n"))
    return counts.join(total).select(
        "rule",
        "n_violations",
        F.round(F.col("n_violations").cast("double") / F.col("n"), 6).alias(
            "violation_rate"
        ),
    )


def observed_quarantine(marked: DataFrame):
    """(observed DataFrame, Observation) — Spark's ``observe()`` surface:
    row count + violation count ride the SAME job as whatever action
    consumes the frame (accumulator-backed, zero extra scan), where
    dq_orders_summary pays a second aggregation pass. The caller runs any
    action on the returned frame, then reads ``observation.get`` — the
    in-flight health counter every ingest pipeline wants next to its sink.
    """
    from pyspark.sql import Observation

    obs = Observation("dq")
    observed = marked.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum((F.size("dq_reasons") > 0).cast("long")).alias("rows_violating"),
    )
    return observed, obs


# ---------------------------------------------------------------------------
# Precision/recall threshold scan (round-11): classifier-eval surface
# ---------------------------------------------------------------------------

#: function words whose density separates English from the other corpus
#: languages — the score under evaluation
EN_STOPWORDS = (
    "the", "a", "of", "and", "to", "in", "is", "it", "for", "on",
    "as", "at", "by", "an",
)
#: scan thresholds: 0.00 .. 0.30 step 0.02 (16 operating points)
PR_THRESHOLDS = [round(k * 0.02, 2) for k in range(16)]


def _pr_curve_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    ts = ", ".join(repr(t) for t in PR_THRESHOLDS)
    return f"""
WITH scored AS (
  SELECT lang = 'en' AS is_pos,
         len(list_filter(string_split(text, ' '),
                         t -> list_contains([{stop}], t)))::DOUBLE
           / len(string_split(text, ' ')) AS score
  FROM documents WHERE length(text) > 0
), th AS (SELECT CAST(unnest([{ts}]) AS DOUBLE) AS threshold),
agg AS (
  SELECT t.threshold,
         CAST(sum(CASE WHEN s.score >= t.threshold THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pred_pos,
         CAST(sum(CASE WHEN s.score >= t.threshold AND s.is_pos
                       THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN s.is_pos THEN 1 ELSE 0 END) AS BIGINT) AS pos
  FROM scored s, th t GROUP BY t.threshold
)
SELECT threshold, n_pred_pos,
       round(tp / CAST(nullif(n_pred_pos, 0) AS DOUBLE), 6) AS precision,
       round(tp / CAST(nullif(pos, 0) AS DOUBLE), 6) AS recall,
       round(2.0 * tp / CAST(nullif(n_pred_pos + pos, 0) AS DOUBLE), 6) AS f1
FROM agg
"""


@register("pr_curve_stopword_en", _pr_curve_sql())
def pr_curve_stopword_en(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision/recall/F1 threshold scan of the English-stopword-density
    score against the gold ``lang`` label — the classifier-evaluation
    operator every filter a curation pipeline ships needs BEFORE its
    threshold is frozen (roc_auc_quality ranks the score; this names the
    operating points). F1 uses the algebraic identity
    2·tp/(pred_pos + pos), so the degenerate thresholds (nothing
    predicted, no positives) are NULL via one nullif on both engines.

    Scale shape: per-document scoring is one codegen HOF pass (no token
    explode, no shuffle); the scan is a |docs| × 16 broadcast-domain
    product feeding one combinable per-threshold aggregate — the
    periodogram_daily shape on a threshold domain."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.split("text", " ")
    score = (
        F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))).cast("double")
        / F.size(toks)
    )
    scored = docs.select(
        (F.col("lang") == "en").alias("is_pos"), score.alias("score")
    )
    th = local_df(spark, [(t,) for t in PR_THRESHOLDS], "threshold double")
    agg = (
        scored.join(F.broadcast(th))
        .groupBy("threshold")
        .agg(
            F.sum((F.col("score") >= F.col("threshold")).cast("long"))
            .cast("long").alias("n_pred_pos"),
            F.sum(
                ((F.col("score") >= F.col("threshold")) & F.col("is_pos"))
                .cast("long")
            ).cast("long").alias("tp"),
            F.sum(F.col("is_pos").cast("long")).cast("long").alias("pos"),
        )
    )
    return agg.select(
        "threshold",
        "n_pred_pos",
        F.round(
            F.col("tp") / F.nullif(F.col("n_pred_pos"), F.lit(0)).cast("double"),
            6,
        ).alias("precision"),
        F.round(
            F.col("tp") / F.nullif(F.col("pos"), F.lit(0)).cast("double"), 6
        ).alias("recall"),
        F.round(
            2.0 * F.col("tp")
            / F.nullif(F.col("n_pred_pos") + F.col("pos"), F.lit(0)).cast(
                "double"
            ),
            6,
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# Character-level entropy (gibberish / encoding-junk detector)
# ---------------------------------------------------------------------------

#: below ~2.5 bits/char natural text degenerates into repeated-character
#: runs or single-token spam; above ~5.2 it is base64/hex/binary spill —
#: both ends are junk a pretraining filter drops (Gopher-style heuristic
#: bounds, chosen inside the fixture's observed 3.9-4.4 band).
CHAR_ENTROPY_MIN = 2.5
CHAR_ENTROPY_MAX = 5.2

char_entropy_oracle = f"""
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i
  FROM documents
  WHERE length(text) > 0
),
chars AS (
  SELECT doc_id, substring(text, CAST(i AS INT), 1) AS ch FROM pos
),
cnt AS (
  SELECT doc_id, ch, count(*) AS n FROM chars GROUP BY doc_id, ch
),
tot AS (
  SELECT doc_id, sum(n) AS tn, count(*) AS n_distinct FROM cnt
  GROUP BY doc_id
),
ent AS (
  SELECT c.doc_id,
         -sum((c.n / CAST(t.tn AS DOUBLE))
              * log2(c.n / CAST(t.tn AS DOUBLE))) AS h,
         max(t.tn) AS n_chars_counted,
         max(t.n_distinct) AS n_distinct
  FROM cnt c JOIN tot t ON t.doc_id = c.doc_id
  GROUP BY c.doc_id
)
SELECT doc_id,
       CAST(n_chars_counted AS BIGINT) AS n_chars_counted,
       CAST(n_distinct AS BIGINT) AS distinct_chars,
       round(h, 6) AS entropy_bits,
       (h >= {CHAR_ENTROPY_MIN} AND h <= {CHAR_ENTROPY_MAX})
         AS entropy_ok
FROM ent
"""


@register("char_entropy_quality", char_entropy_oracle)
def char_entropy_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char) with a
    two-sided quality flag: repeated-character spam collapses toward 0,
    base64/binary spill climbs past ~5.2 — the encoding-junk detector
    the token-level quality signals (`text_quality`, `gopher_signals`)
    cannot see because junk often TOKENIZES cleanly. The standard cheap
    pretraining filter next to lang-ID.

    Scale shape: the character explode is the data-sized stage (the
    token-explode class — fully parallel, shuffles only the combinable
    (doc, char) counts whose cardinality is ≤ |docs|·|alphabet|);
    per-doc entropy is a doc-keyed combinable aggregate over the
    alphabet-bounded count rows. Entropy terms are ratios of exact
    integer counts; the flag compares against fixed literals of the same
    double value on both engines (knife-edge-safe only to the summation
    order — counts are alphabet-sized, ~70 terms, and the fixture band
    sits far from both bounds)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # empty docs MUST be excluded on both engines: Spark's
        # sequence(1, 0) defaults to step -1 and yields [1, 0] (two
        # phantom empty-char rows, entropy 0), while DuckDB's
        # range(1, 1) is empty and omits the doc — filtering is the
        # only spelling with identical semantics (matches pr_curve's
        # length(text) > 0 guard above).
        .filter(F.length("text") > 0)
    )
    # substring with a COLUMN start position needs the expr() spelling
    chars = docs.select(
        "doc_id", F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"), "text"
    ).select("doc_id", F.expr("substring(text, i, 1)").alias("ch"))
    cnt = chars.groupBy("doc_id", "ch").agg(F.count("*").alias("n"))
    tot = cnt.groupBy("doc_id").agg(
        F.sum("n").alias("tn"), F.count("*").alias("n_distinct")
    )
    p = F.col("n") / F.col("tn").cast("double")
    ent = (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id")
        .agg(
            (-F.sum(p * F.log2(p))).alias("h"),
            F.max("tn").alias("n_chars_counted"),
            F.max("n_distinct").alias("n_distinct"),
        )
    )
    return ent.select(
        "doc_id",
        F.col("n_chars_counted").cast("bigint").alias("n_chars_counted"),
        F.col("n_distinct").cast("bigint").alias("distinct_chars"),
        F.round("h", 6).alias("entropy_bits"),
        (
            (F.col("h") >= CHAR_ENTROPY_MIN) & (F.col("h") <= CHAR_ENTROPY_MAX)
        ).alias("entropy_ok"),
    )


# ---------------------------------------------------------------------------
# Brier score decomposition of the stopword-density "probability"
# ---------------------------------------------------------------------------

BRIER_BINS = 10


def _brier_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH scored AS (
  SELECT CAST(lang = 'en' AS INT) AS y,
         len(list_filter(string_split(text, ' '),
                         t -> list_contains([{stop}], t)))::DOUBLE
           / len(string_split(text, ' ')) AS p
  FROM documents WHERE length(text) > 0
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         sum((p - y) * (p - y)) AS brier_sum
  FROM scored
), binned AS (
  SELECT least(CAST(floor(p * {BRIER_BINS}) AS INT), {BRIER_BINS - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS n_bin,
         CAST(sum(y) AS BIGINT) AS pos_bin,
         sum(p) AS p_sum
  FROM scored GROUP BY 1
)
SELECT b.bin,
       b.n_bin,
       round(b.p_sum / b.n_bin, 6) AS mean_score,
       round(CAST(b.pos_bin AS DOUBLE) / b.n_bin, 6) AS event_rate,
       round(b.n_bin * (b.p_sum / b.n_bin - CAST(b.pos_bin AS DOUBLE) / b.n_bin)
                     * (b.p_sum / b.n_bin - CAST(b.pos_bin AS DOUBLE) / b.n_bin)
             / t.n, 6) AS reliability_term,
       round(b.n_bin * (CAST(b.pos_bin AS DOUBLE) / b.n_bin
                        - CAST(t.n_pos AS DOUBLE) / t.n)
                     * (CAST(b.pos_bin AS DOUBLE) / b.n_bin
                        - CAST(t.n_pos AS DOUBLE) / t.n)
             / t.n, 6) AS resolution_term,
       round(t.brier_sum / t.n, 6) AS brier,
       round((CAST(t.n_pos AS DOUBLE) / t.n)
             * (1.0 - CAST(t.n_pos AS DOUBLE) / t.n), 6) AS uncertainty
FROM binned b, tot t
"""


@register("brier_score_decomposition", _brier_sql())
def brier_score_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score for the stopword-density
    score read as P(doc is English): per probability bin, the
    reliability term n_k(p̄_k − ȳ_k)²/N (calibration error — is a "0.3"
    really right 30% of the time?) and the resolution term
    n_k(ȳ_k − ȳ)²/N (discrimination), beside the overall Brier and the
    label uncertainty ȳ(1−ȳ). `roc_auc_quality` ranks the score and
    `pr_curve_stopword_en` names operating points; this answers the
    third evaluation question — is the score CALIBRATED as a
    probability — which decides whether thresholds transfer across
    corpora. (Rel − Res + Unc reproduces the Brier of the bin-averaged
    forecast; the raw-score Brier is reported alongside.)

    Shape: per-doc scoring in one codegen HOF pass, then ONE combinable
    bin aggregate (≤10 groups) + a 1-row total broadcast — nothing
    data-sized crosses a shuffle."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.split("text", " ")
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        (
            F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))).cast(
                "double"
            )
            / F.size(toks)
        ).alias("p"),
    )
    tot = scored.agg(
        F.count("*").alias("n"),
        F.sum("y").alias("n_pos"),
        F.sum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "brier_sum"
        ),
    )
    binned = scored.groupBy(
        F.least(
            F.floor(F.col("p") * BRIER_BINS).cast("int"),
            F.lit(BRIER_BINS - 1),
        ).alias("bin")
    ).agg(
        F.count("*").alias("n_bin"),
        F.sum("y").alias("pos_bin"),
        F.sum("p").alias("p_sum"),
    )
    j = binned.crossJoin(F.broadcast(tot))
    p_bar = F.col("p_sum") / F.col("n_bin")
    y_bar = F.col("pos_bin").cast("double") / F.col("n_bin")
    y_glob = F.col("n_pos").cast("double") / F.col("n")
    return j.select(
        "bin",
        "n_bin",
        F.round(p_bar, 6).alias("mean_score"),
        F.round(y_bar, 6).alias("event_rate"),
        F.round(
            F.col("n_bin") * (p_bar - y_bar) * (p_bar - y_bar) / F.col("n"), 6
        ).alias("reliability_term"),
        F.round(
            F.col("n_bin") * (y_bar - y_glob) * (y_bar - y_glob) / F.col("n"),
            6,
        ).alias("resolution_term"),
        F.round(F.col("brier_sum") / F.col("n"), 6).alias("brier"),
        F.round(y_glob * (1.0 - y_glob), 6).alias("uncertainty"),
    )

# ---------------------------------------------------------------------------
# Cumulative gains chart for the stopword-density classifier
# ---------------------------------------------------------------------------



def _gains_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH scored AS (
  SELECT CAST(lang = 'en' AS INT) AS y,
         len(list_filter(string_split(text, ' '),
                         t -> list_contains([{stop}], t)))::DOUBLE
           / len(string_split(text, ' ')) AS p
  FROM documents WHERE length(text) > 0
), vals AS (
  SELECT p, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos
  FROM scored GROUP BY p
), tot0 AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vals
), runs AS (
  SELECT cnt, pos,
         sum(cnt) OVER (ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM vals
), binned AS (
  SELECT CAST((10 * r.cum - 1) // t.n AS INT) AS decile, r.cnt, r.pos
  FROM runs r, tot0 t
), agg AS (
  SELECT decile, CAST(sum(cnt) AS BIGINT) AS n_docs,
         CAST(sum(pos) AS BIGINT) AS n_pos
  FROM binned GROUP BY decile
), tot AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS n, CAST(sum(n_pos) AS BIGINT) AS pos
  FROM agg
)
SELECT a.decile, a.n_docs, a.n_pos,
       round(CAST(a.n_pos AS DOUBLE) / a.n_docs, 6) AS pos_rate,
       round(sum(CAST(a.n_pos AS DOUBLE)) OVER (ORDER BY a.decile DESC)
             / t.pos, 6) AS cum_pos_share,
       round((CAST(a.n_pos AS DOUBLE) / a.n_docs)
             / (CAST(t.pos AS DOUBLE) / t.n), 6) AS lift
FROM agg a, tot t
"""


@register("gains_chart_stopword", _gains_sql())
def gains_chart_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains/lift chart of the stopword-density classifier:
    documents bucketed into score deciles, and per decile the positive
    rate, its lift over base rate, and the cumulative share of all
    positives captured from the top decile down — the "how deep must I
    screen to catch X% of English docs" readout; the business-curve leg
    of the evaluation family (roc ranks, pr names points, brier
    calibrates, gains BUDGETS).

    Deciles are assigned by integer RANK CUTS, never by comparing the
    score against interpolated double boundaries: stopword density is a
    ratio of small integers and ties heavily (dozens of docs share
    exactly 1/29), and at sf0.1 a 1-ulp Spark-`percentile` vs DuckDB-
    `quantile_cont` interpolation difference flipped a 7-doc tie-run
    between deciles 8/9 (round-12 judge finding). The fix is the
    `pareto_cutoff_exact` spelling: collapse to per-DISTINCT-score
    counts, inclusive cumulative count `cum` via the ranking kernel,
    decile = (10·cum − 1) div n — pure integers, tie-runs never split,
    bit-identical on any engine (equal rationals like 1/29 and 2/58
    produce bit-identical IEEE doubles, so the distinct-value collapse
    itself is portable).

    Shape: one codegen scoring pass, a value-domain-sized distinct
    collapse, O(P) ranking offsets, a 10-group combinable aggregate,
    and a 10-row cumulative."""
    from pyspark.sql import Window

    from ..functions.ranking import range_partition_offsets
    from ..session import shuffle_partition_count

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.split("text", " ")
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        (
            F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))).cast(
                "double"
            )
            / F.size(toks)
        ).alias("p"),
    )
    vals = scored.groupBy("p").agg(
        F.count("*").alias("cnt"), F.sum("y").alias("pos")
    )
    ranged, _, offsets_df, totals = range_partition_offsets(
        vals, ["p"], [("rows", F.sum("cnt"))], shuffle_partition_count(spark)
    )
    n = int(totals["rows"])
    wloc = (
        Window.partitionBy("pid")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    binned = (
        ranged.withColumn("cum_local", F.sum("cnt").over(wloc))
        .join(F.broadcast(offsets_df), "pid")
        .select(
            "cnt",
            "pos",
            F.expr(f"CAST((10 * (off_rows + cum_local) - 1) DIV {n} AS INT)")
            .alias("decile"),
        )
    )
    agg = binned.groupBy("decile").agg(
        F.sum("cnt").alias("n_docs"), F.sum("pos").alias("n_pos")
    )
    tot = agg.agg(F.sum("n_docs").alias("n"), F.sum("n_pos").alias("pos"))
    w = Window.orderBy(F.desc("decile")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return agg.crossJoin(F.broadcast(tot)).select(
        "decile",
        "n_docs",
        "n_pos",
        F.round(F.col("n_pos").cast("double") / F.col("n_docs"), 6).alias(
            "pos_rate"
        ),
        F.round(
            F.sum(F.col("n_pos").cast("double")).over(w) / F.col("pos"), 6
        ).alias("cum_pos_share"),
        F.round(
            (F.col("n_pos").cast("double") / F.col("n_docs"))
            / (F.col("pos").cast("double") / F.col("n")),
            6,
        ).alias("lift"),
    )


# ---------------------------------------------------------------------------
# Hosmer-Lemeshow goodness-of-fit (round 13): calibration TEST on rank bins
# ---------------------------------------------------------------------------


def _hl_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH scored AS (
  SELECT CAST(lang = 'en' AS INT) AS y,
         len(list_filter(string_split(text, ' '),
                         t -> list_contains([{stop}], t)))::DOUBLE
           / len(string_split(text, ' ')) AS p
  FROM documents WHERE length(text) > 0
), q AS (
  SELECT y, p,
         CAST(floor(p * 1000000 + 0.5) AS BIGINT) AS pq
  FROM scored
), vals AS (
  SELECT p, CAST(count(*) AS BIGINT) AS cnt, CAST(sum(y) AS BIGINT) AS pos,
         CAST(sum(pq) AS BIGINT) AS pqs
  FROM q GROUP BY p
), tot0 AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vals
), runs AS (
  SELECT cnt, pos, pqs,
         sum(cnt) OVER (ORDER BY p
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM vals
), agg AS (
  SELECT CAST((10 * r.cum - 1) // t.n AS INT) AS decile,
         CAST(sum(r.cnt) AS BIGINT) AS n_docs,
         CAST(sum(r.pos) AS BIGINT) AS obs_pos,
         CAST(sum(r.pqs) AS BIGINT) AS exp_micro
  FROM runs r, tot0 t
  GROUP BY 1
)
SELECT decile, n_docs, obs_pos,
       round(exp_micro / 1000000.0, 6) AS exp_pos,
       round(CASE WHEN exp_micro > 0 AND exp_micro < n_docs * 1000000
                  THEN (obs_pos - exp_micro / 1000000.0)
                       * (obs_pos - exp_micro / 1000000.0) * n_docs
                       / ((exp_micro / 1000000.0)
                          * (n_docs - exp_micro / 1000000.0))
                  END, 6) AS hl_term
FROM agg
"""


@register("hosmer_lemeshow_gof", _hl_sql())
def hosmer_lemeshow_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosmer-Lemeshow calibration goodness-of-fit of the
    stopword-density score read as P(en): per equal-depth score decile,
    observed vs expected positives and the χ² contribution
    (O−E)²·n/(E·(n−E)) — the TEST companion to
    `brier_score_decomposition` (decomposes) and `gains_chart_stopword`
    (budgets); a decile with a large term is WHERE the score lies.

    Deciles come from the same integer rank-cut kernel the round-13
    gains fix installed ((10·cum − 1) div n over per-distinct-score
    counts — tie-runs never split, no interpolated boundaries). The
    expected count E = Σp is order-sensitive as a double sum, so p is
    quantized to micro-units ONCE (floor(p·1e6 + 0.5)) and E
    accumulates as an EXACT integer; every division happens once, on
    exact ints, identically in both engines. Degenerate bins (E = 0 or
    E = n) yield SQL NULL terms rather than ±inf.

    Shape: one scoring pass, a value-domain distinct collapse, O(P)
    ranking offsets, a 10-group combinable aggregate."""
    from pyspark.sql import Window

    from ..functions.ranking import range_partition_offsets
    from ..session import shuffle_partition_count

    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.split("text", " ")
    p = (
        F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))).cast("double")
        / F.size(toks)
    )
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        p.alias("p"),
        F.floor(p * 1000000 + 0.5).cast("bigint").alias("pq"),
    )
    vals = scored.groupBy("p").agg(
        F.count("*").alias("cnt"),
        F.sum("y").alias("pos"),
        F.sum("pq").alias("pqs"),
    )
    ranged, _, offsets_df, totals = range_partition_offsets(
        vals, ["p"], [("rows", F.sum("cnt"))], shuffle_partition_count(spark)
    )
    n = int(totals["rows"])
    wloc = (
        Window.partitionBy("pid")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    agg = (
        ranged.withColumn("cum_local", F.sum("cnt").over(wloc))
        .join(F.broadcast(offsets_df), "pid")
        .select(
            "cnt",
            "pos",
            "pqs",
            F.expr(f"CAST((10 * (off_rows + cum_local) - 1) DIV {n} AS INT)")
            .alias("decile"),
        )
        .groupBy("decile")
        .agg(
            F.sum("cnt").alias("n_docs"),
            F.sum("pos").alias("obs_pos"),
            F.sum("pqs").alias("exp_micro"),
        )
    )
    e = F.col("exp_micro") / 1000000.0
    o = F.col("obs_pos")
    nd = F.col("n_docs")
    return agg.select(
        "decile",
        "n_docs",
        "obs_pos",
        F.round(e, 6).alias("exp_pos"),
        F.round(
            F.when(
                (F.col("exp_micro") > 0)
                & (F.col("exp_micro") < nd * 1000000),
                (o - e) * (o - e) * nd / (e * (nd - e)),
            ),
            6,
        ).alias("hl_term"),
    )


# ---------------------------------------------------------------------------
# Expected / maximum calibration error (round-15)
# ---------------------------------------------------------------------------


def _ece_sql() -> str:
    stop = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return f"""
WITH scored AS (
  SELECT CAST(lang = 'en' AS INT) AS y,
         len(list_filter(string_split(text, ' '),
                         t -> list_contains([{stop}], t)))::DOUBLE
           / len(string_split(text, ' ')) AS p
  FROM documents WHERE length(text) > 0
), binned AS (
  SELECT least(CAST(floor(p * {BRIER_BINS}) AS INT), {BRIER_BINS - 1}) AS bin,
         CAST(count(*) AS BIGINT) AS n_bin,
         CAST(sum(y) AS BIGINT) AS pos_bin,
         sum(p) AS p_sum
  FROM scored GROUP BY 1
)
SELECT CAST(sum(n_bin) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_bins_used,
       round(sum(n_bin * abs(p_sum / n_bin
                             - CAST(pos_bin AS DOUBLE) / n_bin))
             / sum(n_bin), 6) AS ece,
       round(max(abs(p_sum / n_bin - CAST(pos_bin AS DOUBLE) / n_bin)), 6)
         AS mce
FROM binned
"""


@register("ece_calibration", _ece_sql())
def ece_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected and maximum calibration error of the stopword-density
    score read as P(doc is English) — the L1 calibration readout modern
    model-eval reports quote (Guo et al. 2017): ECE = Σ n_k/N·|p̄_k−ȳ_k|
    over fixed-width probability bins, MCE the worst bin's gap.
    `brier_score_decomposition` (same bins, same score) reports Murphy's
    SQUARED reliability, which down-weights many-small-gap regimes; ECE
    is the number a threshold-transfer decision actually reads, and MCE
    bounds the worst-case lie of the score. Shares BRIER_BINS and the
    binning spelling with the Brier query so the two can never disagree
    on bin membership.

    Shape: per-doc scoring in one codegen HOF pass, ONE combinable
    ≤10-group bin aggregate, one bin-domain reduce — nothing data-sized
    crosses a shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.split("text", " ")
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("y"),
        (
            F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS))).cast(
                "double"
            )
            / F.size(toks)
        ).alias("p"),
    )
    binned = scored.groupBy(
        F.least(
            F.floor(F.col("p") * BRIER_BINS).cast("int"),
            F.lit(BRIER_BINS - 1),
        ).alias("bin")
    ).agg(
        F.count("*").alias("n_bin"),
        F.sum("y").alias("pos_bin"),
        F.sum("p").alias("p_sum"),
    )
    gap = F.abs(
        F.col("p_sum") / F.col("n_bin")
        - F.col("pos_bin").cast("double") / F.col("n_bin")
    )
    return binned.agg(
        F.sum("n_bin").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_bins_used"),
        F.round(F.sum(F.col("n_bin") * gap) / F.sum("n_bin"), 6).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
    )
