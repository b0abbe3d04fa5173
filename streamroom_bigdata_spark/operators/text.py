"""Text-analysis operators for LLM-data pipelines (SURVEY.md §2.11 L4, D5).

Everything in the oracle-checked path is built-in column expressions (split/
regexp/aggregate) — JVM-side, codegen'd, no Python per row. The language-ID
heuristic is the one Pandas-UDF operator here (dictionary scoring doesn't
compose from built-ins cleanly); it is Arrow-vectorized and rows-only checked
plus property-tested.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import FP_MOD, portable_hash_mod, sql_hash_mod
from ..registry import register
from ..sources import load_table

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@register(
    "text_stats",
    """
    SELECT doc_id, lang,
           CAST(length(text) AS INT) AS n_chars,
           CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
           round(length(replace(text, ' ', ''))::DOUBLE
                 / len(string_split(text, ' ')), 4) AS avg_token_len,
           CAST(len(list_distinct(string_split(text, ' '))) AS INT)
             AS n_unique_tokens
    FROM documents
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics (L4): length, token count, mean
    token length, vocabulary size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        "lang",
        F.length("text").cast("int").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
            .cast("double")
            / F.size(toks),
            4,
        ).alias("avg_token_len"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
    )


_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


QUALITY_MIN_TOKENS = 20
QUALITY_SW_RANGE = (0.05, 0.6)
QUALITY_MIN_UNIQUE = 0.2


def stopword_ratio_col():
    # multiset stopword count (array_intersect would dedup) -> filter
    toks = F.split("text", " ")
    return (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
        / F.size(toks)
    )


def unique_ratio_col():
    toks = F.split("text", " ")
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def is_quality_col():
    """The quality gate as one boolean column — the single definition the
    scoring query AND the curation pipeline share (operators/curation.py)."""
    return (
        (F.size(F.split("text", " ")) >= QUALITY_MIN_TOKENS)
        & stopword_ratio_col().between(*QUALITY_SW_RANGE)
        & (unique_ratio_col() >= QUALITY_MIN_UNIQUE)
    )


@register(
    "text_quality",
    f"""
    SELECT doc_id,
           round(stopword_ratio, 6) AS stopword_ratio,
           round(unique_ratio, 6) AS unique_ratio,
           CAST(n_tokens >= {QUALITY_MIN_TOKENS}
                AND stopword_ratio BETWEEN {QUALITY_SW_RANGE[0]}
                                       AND {QUALITY_SW_RANGE[1]}
                AND unique_ratio >= {QUALITY_MIN_UNIQUE} AS BOOLEAN)
             AS is_quality
    FROM (
      SELECT doc_id,
             len(list_filter(toks, t -> t IN ({_SW_LIST})))::DOUBLE
               / len(toks) AS stopword_ratio,
             len(list_distinct(toks))::DOUBLE / len(toks) AS unique_ratio,
             len(toks) AS n_tokens
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring (L4): stopword ratio + vocabulary diversity gates —
    the Gopher-style heuristic filter shape, as pure column algebra."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(stopword_ratio_col(), 6).alias("stopword_ratio"),
        F.round(unique_ratio_col(), 6).alias("unique_ratio"),
        is_quality_col().alias("is_quality"),
    )


#: keep the top KEEP_NUM/KEEP_DEN of each language's docs by quality score
QP_KEEP_NUM, QP_KEEP_DEN = 3, 10

quality_percentile_keep_oracle = f"""
WITH scored AS (
  SELECT doc_id, lang,
         len(list_distinct(toks))::DOUBLE / len(toks) AS uniq
  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents)
), ranked AS (
  SELECT doc_id, lang, uniq,
         row_number() OVER (
           PARTITION BY lang ORDER BY uniq DESC, doc_id
         ) AS rn,
         count(*) OVER (PARTITION BY lang) AS cnt
  FROM scored
)
SELECT doc_id, lang, CAST(rn AS BIGINT) AS q_rank,
       round(uniq, 6) AS unique_ratio
FROM ranked WHERE rn * {QP_KEEP_DEN} <= cnt * {QP_KEEP_NUM}
"""


@register("quality_percentile_keep", quality_percentile_keep_oracle)
def quality_percentile_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-percentile curation: keep each language's top
    30% of documents by vocabulary diversity. Filtering by a WITHIN-LANG
    percentile instead of a global score threshold is how multilingual
    curation avoids high-resource languages (whose score distributions
    differ) crowding out the rest of the mix.

    The cut is pure integer arithmetic (rn·10 ≤ cnt·3) — no float
    percentile boundary to diverge across engines; score ties break on
    doc_id so the kept set is deterministic. Plan: one scan computing the
    score in codegen → one lang-partitioned window. At 100 TB a per-lang
    full sort is the honest cost of an EXACT percentile; the cheap variant
    swaps the window for a per-lang `percentile_approx` threshold joined
    back as a filter (same shape as `sampled_quantiles`), trading
    exactness at the cut line for a sort-free plan."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", unique_ratio_col().alias("uniq")
    )
    w = Window.partitionBy("lang").orderBy(F.desc("uniq"), "doc_id")
    cw = Window.partitionBy("lang")
    return (
        docs.select(
            "doc_id",
            "lang",
            "uniq",
            F.row_number().over(w).cast("long").alias("q_rank"),
            F.count("*").over(cw).alias("cnt"),
        )
        .filter(F.col("q_rank") * QP_KEEP_DEN <= F.col("cnt") * QP_KEEP_NUM)
        .select(
            "doc_id", "lang", "q_rank", F.round("uniq", 6).alias("unique_ratio")
        )
    )


@register(
    "token_frequencies",
    """
    SELECT tok, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n DESC, tok
    LIMIT 20
    """,
)
def token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token frequencies via explode (D5 — the UDTF-like one-row→many
    expansion done with built-ins), deterministic top-20."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )


def tokenize_udtf():
    """True Python UDTF (Spark 4, Arrow-backed) emitting (pos, tok) rows per
    document — the D5 surface in its table-function form. Row-at-a-time
    Python: registered ONLY as the agreement oracle for the explode path
    above, never in the hot path (explode+split stays in whole-stage
    codegen; see the lang_id UDF precedent)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            if text is None:
                return
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    return Tokenize


@register(
    "token_count_regex",
    """
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]'))
                AS INT) AS n_bpe_ish_tokens,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers
    FROM documents
    """,
)
def token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting (L4): alpha runs, digit runs, and standalone
    punctuation as separate tokens — the regex pre-tokenizer shape used by
    byte-pair encoders."""
    docs = load_table(spark, sf_dir, "documents")
    pat = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(pat), 0)).alias(
            "n_bpe_ish_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), 0)).alias(
            "n_numbers"
        ),
    )


@register(
    "doc_fingerprints",
    f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT,
               list_transform(string_split(text, ' '),
                              x -> {sql_hash_mod("x")})),
             (acc, h) -> (acc * 131 + h) % {FP_MOD}
           ) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (L4): polynomial
    accumulation over token hashes, exact int64 arithmetic (ANSI-safe via
    mod-reduction) — identical in DuckDB, so oracle-hashable."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.transform(
        F.split("text", " "), lambda x: portable_hash_mod(x)
    )
    fp = F.aggregate(
        toks,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 131 + h) % FP_MOD,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


@register(
    "lang_source_profile",
    """
    SELECT lang, source, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY lang, source
    """,
)
def lang_source_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus profile (L4 reporting shape)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# Language-ID heuristic (Pandas UDF path — rows-only + property tests)
# ---------------------------------------------------------------------------

#: tiny per-language character-bigram profiles (public-knowledge heuristic:
#: score text bigrams against each profile, argmax wins; 'en' profile is the
#: richest since the fixture corpus is English-ish)
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
    "de": ("en", "er", "ch", "de", "ei", "ie", "in", "te", "nd", "ge"),
    "fr": ("es", "le", "de", "en", "re", "nt", "on", "er", "te", "ou"),
    "es": ("de", "la", "os", "el", "en", "es", "ar", "ue", "ra", "as"),
    "zh": (),  # non-latin scripts would be detected by codepoint range
}


#: langs scored, in the UDF's sorted-iteration order (first max wins ties)
_SCORED_LANGS = tuple(sorted(k for k, v in _LANG_PROFILES.items() if v))


def _sql_hits(low: str, lang: str) -> str:
    """SQL expression (Spark SQL == DuckDB) counting profile-bigram
    occurrences in ``low`` via the replace-length trick. Valid because no
    profile bigram self-overlaps (first char != last char) or contains
    whitespace, so non-overlapping substring count == the sliding-window
    bigram count the scoring model defines."""
    terms = [
        f"(length({low}) - length(replace({low}, '{bg}', ''))) // 2"
        for bg in _LANG_PROFILES[lang]
    ]
    return "(" + " + ".join(terms) + ")"


def _lang_id_sql(table_expr: str) -> str:
    """The whole language-ID heuristic as one portable SQL query: bigram
    hit counts per profile (integer column algebra), total valid bigrams =
    non-whitespace chars minus word runs (each run of length L contributes
    L-1 in-word bigrams), integer-exact threshold (frac > 0.05 ⇔
    20*hits > total) and first-in-sorted-order argmax tie-break."""
    hits = ", ".join(
        f"{_sql_hits('low', lang)} AS h_{lang}" for lang in _SCORED_LANGS
    )
    greatest = "greatest(" + ", ".join(f"h_{lang}" for lang in _SCORED_LANGS) + ")"
    argmax = " ".join(
        f"WHEN h_{lang} = {greatest} THEN '{lang}'"
        for lang in _SCORED_LANGS[:-1]
    )
    return f"""
WITH base AS (
  SELECT doc_id, lang, lower(coalesce(text, '')) AS low FROM {table_expr}
), feat AS (
  SELECT doc_id, lang,
         length(regexp_replace(low, '\\s', '', 'g'))
           - len(regexp_extract_all(low, '[^\\s]+')) AS total,
         {hits}
  FROM base
)
SELECT doc_id, lang,
       CASE WHEN total <= 0 THEN 'und'
            WHEN {greatest} * 20 <= total THEN 'und'
            {argmax}
            ELSE '{_SCORED_LANGS[-1]}' END AS detected_lang
FROM feat
"""


def lang_id_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The original Arrow-batched Pandas-UDF scorer — per-row Python, kept
    ONLY as the agreement-test oracle for the column-algebra plan below
    (tests/test_dedup_text.py). Never the registered hot path: at 100 TB a
    per-character Python loop is the slowest operator per byte."""
    docs = load_table(spark, sf_dir, "documents")

    profiles = {k: set(v) for k, v in _LANG_PROFILES.items() if v}

    @F.pandas_udf("string")
    def detect(texts: pd.Series) -> pd.Series:
        def score(text: str) -> str:
            if not text:
                return "und"
            bigrams: dict[str, int] = {}
            lowered = text.lower()
            for i in range(len(lowered) - 1):
                bg = lowered[i : i + 2]
                if bg.strip() == bg and len(bg) == 2:
                    bigrams[bg] = bigrams.get(bg, 0) + 1
            if not bigrams:
                return "und"
            best_lang, best = "und", -1.0
            for lang in sorted(profiles):
                hits = sum(n for bg, n in bigrams.items() if bg in profiles[lang])
                frac = hits / sum(bigrams.values())
                if frac > best:
                    best_lang, best = lang, frac
            return best_lang if best > 0.05 else "und"

        return texts.map(score)

    return docs.select(
        "doc_id", "lang", detect(F.col("text")).alias("detected_lang")
    )


def detected_lang_col(text_col: str = "text") -> Column:
    """The language-ID heuristic as a single Column expression (shared by
    `lang_id_heuristic` and the governance agreement readout): per-profile
    bigram hit counts, total valid bigrams from run arithmetic,
    integer-exact 5% threshold, deterministic argmax — whole-stage codegen
    end to end, no Python worker.

    Hit counts are ONE zero-width-lookahead ``regexp_count`` per language
    (round 16; guide §1.2 per-task work): ``(?=(?:th|he|...))`` matches at
    every position where a profile bigram starts, so the count equals the
    replace-length-trick sum the oracle SQL uses — per-profile bigrams are
    pairwise distinct (two alternatives cannot match at one position) and
    never self-overlap (first char != last char, the `_sql_hits`
    invariant), verified value-equal on overlap-heavy cases. The previous
    spelling ran 40 replace+length pairs — 40 full string copies per row
    and the dominant share of this expression's whole-stage-codegen
    compile (~2 s cold); 4 literal-alternation regex scans replace them."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))

    def hits(lang: str) -> Column:
        pat = "(?=(?:" + "|".join(_LANG_PROFILES[lang]) + "))"
        return F.regexp_count(low, F.lit(pat)).cast("long")

    h = {lang: hits(lang) for lang in _SCORED_LANGS}
    total = (
        F.length(F.regexp_replace(low, r"\s", ""))
        - F.regexp_count(low, F.lit(r"\S+"))
    ).cast("long")
    maxh = F.greatest(*h.values())
    detected = F.when(total <= 0, "und").when(maxh * 20 <= total, "und")
    for lang in _SCORED_LANGS[:-1]:
        detected = detected.when(h[lang] == maxh, lang)
    return detected.otherwise(_SCORED_LANGS[-1])


@register("lang_id_heuristic", _lang_id_sql("documents"))
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram language-ID heuristic (L4) as pure column algebra (40
    codegen'd string ops; see :func:`detected_lang_col`). The retired
    per-row UDF (:func:`lang_id_udf`) is the agreement oracle; the DuckDB
    oracle runs the identical SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", "lang", detected_lang_col().alias("detected_lang")
    )


TFIDF_TOP_K = 3

tf_idf_oracle = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2
), dfreq AS (
  SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf,
         round(tf.tf * ln(n.n_docs::DOUBLE / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING (tok) CROSS JOIN n
)
SELECT doc_id, tok, tf, tfidf, CAST(rnk AS INT) AS rnk
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY tfidf DESC, tok
  ) AS rnk
  FROM scored
)
WHERE rnk <= {TFIDF_TOP_K}
"""


@register("tf_idf", tf_idf_oracle)
def tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-TFIDF_TOP_K most characteristic terms per document (L4).

    Plan shape: one token explode feeds both the term-frequency aggregate
    (shuffle on (doc_id, tok)) and the document-frequency aggregate (two-
    phase distinct on tok); the corpus size is a broadcast 1-row aggregate,
    never a driver round-trip. The tf⋈df join shuffles on tok — at 100 TB
    the token key is Zipf-skewed, which AQE's skew-join split handles; the
    final per-document rank reuses a window partial top-k. Scoring stays
    integer/double column algebra inside whole-stage codegen."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # tf has exactly one row per (doc, tok), so document frequency is a plain
    # row count of tf per token — no separate count_distinct pipeline
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "tok", "tf", "tfidf", "rnk")
    )


gopher_signals_oracle = """
SELECT doc_id,
       round((length(text) - (len(string_split(text, ' ')) - 1))::DOUBLE
             / len(string_split(text, ' ')), 6) AS mean_word_len,
       round(len(list_filter(string_split(text, ' '),
                             t -> regexp_full_match(t, '[A-Za-z]+')))::DOUBLE
             / len(string_split(text, ' ')), 6) AS alpha_word_ratio,
       round((length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE
             / length(text), 6) AS digit_char_ratio
FROM documents
WHERE length(text) > 0
"""


@register("gopher_signals", gopher_signals_oracle)
def gopher_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style document quality signals (L4): mean word length, purely
    alphabetic word fraction, digit character fraction. Mean word length is
    computed as (chars − separators) / words — plain string algebra, no
    per-token loop; the alpha-word test is the one per-element predicate
    (cheap single regex per token)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.split("text", " ")
    n_toks = F.size(toks)
    mean_word_len = (
        (F.length("text") - (n_toks - F.lit(1))).cast("double") / n_toks
    )
    alpha_ratio = (
        F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))).cast("double")
        / n_toks
    )
    digit_ratio = (
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[0-9]", ""))
        ).cast("double")
        / F.length("text")
    )
    return docs.select(
        "doc_id",
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        F.round(digit_ratio, 6).alias("digit_char_ratio"),
    )


# PII patterns kept to syntax Java regex and RE2 share (no backrefs or
# lookaround): emails, NNN-NNN-NNNN phones, and 9+-digit runs.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_LONG_DIGITS = "[0-9]{9,}"

pii_redact_oracle = f"""
SELECT doc_id,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{PII_EMAIL}', '<EMAIL>', 'g'),
           '{PII_PHONE}', '<PHONE>', 'g'),
         '{PII_LONG_DIGITS}', '<ID>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS INT) AS n_phones
FROM documents
"""


@register("pii_redact", pii_redact_oracle)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (L4): replace emails / phones / long digit runs with
    typed placeholders and count what was found — one pass of chained
    regexp_replace, fully inside whole-stage codegen. (The fixture corpus
    contains no PII, so fixture counts are zero; semantics are unit-tested
    on synthetic rows in tests/test_dedup_text.py.)"""
    return redact_pii(load_table(spark, sf_dir, "documents"))


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text_col, PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_LONG_DIGITS,
        "<ID>",
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(text_col, F.lit(PII_EMAIL), 0)).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(text_col, F.lit(PII_PHONE), 0)).alias(
            "n_phones"
        ),
    )


HH_CAPACITY = 64   # Misra-Gries counters per partition
HH_TOP_K = 10


def heavy_hitter_candidates(
    tokens: DataFrame, col: str = "tok", capacity: int = HH_CAPACITY
) -> DataFrame:
    """Per-partition Misra-Gries summaries: each partition emits at most
    ``capacity`` candidate values. The MG guarantee is frequency-relative:
    a value with frequency > n_p/(capacity+1) WITHIN a partition survives
    that partition's summary, so the candidate union contains every value
    whose global share exceeds ~1/(capacity+1). It does NOT guarantee the
    full top-k when the k-th value's share is below that bound — size
    ``capacity`` ≫ k for the expected skew (e.g. for natural-language
    tokens, whose rank-k share follows Zipf ≈ 0.1/k, capacity ≥ ~10·k).
    Shuffle/driver traffic is O(partitions × capacity), independent of data
    size."""

    def mg(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col]:
                if v in counters:
                    counters[v] += 1
                elif len(counters) < capacity:
                    counters[v] = 1
                else:
                    # decrement-all step (dict rebuild keeps it O(capacity))
                    counters = {
                        key: c - 1 for key, c in counters.items() if c > 1
                    }
        yield pd.DataFrame({col: list(counters.keys())})

    return tokens.mapInPandas(mg, f"{col} string").distinct()


heavy_hitter_oracle = f"""
SELECT tok, n
FROM (
  SELECT tok, count(*) AS n,
         row_number() OVER (ORDER BY count(*) DESC, tok) AS rk
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
)
WHERE rk <= {HH_TOP_K}
"""


@register("heavy_hitter_tokens", heavy_hitter_oracle)
def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass heavy hitters (the 100 TB top-k-frequent shape): pass 1 —
    Misra-Gries candidates per partition (bounded memory, no shuffle);
    pass 2 — exact count of ONLY the candidate set (semi-join then groupBy
    on a tiny key domain), take top-k. Counts are exact; completeness of
    the top-k holds when the k-th value's global share exceeds
    ~1/(HH_CAPACITY+1) (see :func:`heavy_hitter_candidates` — capacity 64
    vs k=10 leaves ~6× headroom over the Zipf rank-10 share), which the
    fixture satisfies, so the oracle is the plain exact top-k SQL;
    candidate-set completeness is additionally property-tested in
    tests/test_dedup_text.py."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    cands = heavy_hitter_candidates(tokens)
    return (
        tokens.join(F.broadcast(cands), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(HH_TOP_K)
    )


def ngrams_udtf():
    """POLYMORPHIC Python UDTF (Spark 4 ``analyze`` static method): emits
    n-gram rows whose OUTPUT SCHEMA depends on the constant ``n`` argument
    — columns g1..gn plus the gram string. ``analyze`` runs at plan time
    on the literal argument and returns the computed schema, the D5+
    surface `@udtf(returnType=...)` cannot express. Same hot-path caveat
    as tokenize_udtf: agreement-oracle / API-surface role only."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            if not isinstance(n.value, int) or n.value < 1:
                raise ValueError("n must be a positive integer literal")
            fields = [StructField("pos", IntegerType())]
            fields += [
                StructField(f"g{i + 1}", StringType()) for i in range(n.value)
            ]
            fields.append(StructField("gram", StringType()))
            return AnalyzeResult(schema=StructType(fields))

        def eval(self, text: str, n: int):
            if text is None:
                return
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                window = toks[i : i + n]
                yield (i, *window, " ".join(window))

    return NGrams


token_positions_oracle = """
SELECT doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT)
         AS pos,
       unnest(string_split(text, ' ')) AS tok
FROM documents
WHERE doc_id < 100
"""


@register("token_positions", token_positions_oracle)
def token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (F-surface completion): ``posexplode`` emits
    (pos, tok) preserving array order — the lateral-with-ordinality shape
    (DuckDB spells it generate_subscripts; WITH ORDINALITY is
    unimplemented there). Output is token-count-sized; the doc_id filter
    pushes to the scan."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )


# ---------------------------------------------------------------------------
# Winnowing (MOSS-style local fingerprints) — contamination detection
# ---------------------------------------------------------------------------

#: shingle width (TOKENS) and winnowing window (shingles). Any shared run
#: of >= WINNOW_K + WINNOW_W - 1 consecutive tokens is GUARANTEED to
#: contribute at least one common fingerprint (the winnowing theorem) —
#: the token-n-gram overlap protocol LLM decontamination uses (GPT-3's
#: 13-gram spelling), with winnowing compressing the index ~2/(w+1).
WINNOW_K = 5
WINNOW_W = 4

#: fingerprints appearing in more than this many documents are boilerplate
#: (the shingle analogue of stopwords) and are excluded from pairing.
WINNOW_MAX_DF = 50
#: minimum shared fingerprints for a reported overlap pair.
WINNOW_MIN_SHARED = 3

# shared long-format fingerprint CTE: shingle starts exploded per doc,
# hashed flat, sliding-window min per position, distinct per doc. The
# window frame is ROWS [CURRENT, W-1 FOLLOWING] in BOTH engines, so the
# trailing partial windows select identical suffix minima.
_FP_ROWS_SQL = f"""
  toks AS (
    SELECT doc_id, string_split(text, ' ') AS toks FROM documents
  ), sh AS (
    SELECT doc_id,
           unnest(generate_series(0, len(toks) - {WINNOW_K})) AS pos,
           toks
    FROM toks WHERE len(toks) >= {WINNOW_K}
  ), hashed AS (
    SELECT doc_id, pos,
           {sql_hash_mod(f"array_to_string(toks[pos+1:pos+{WINNOW_K}], ' ')")} AS h
    FROM sh
  ), wmin AS (
    SELECT doc_id,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
             AS fp
    FROM hashed
  ), fp AS (
    SELECT DISTINCT doc_id, fp FROM wmin
  )
"""

winnow_oracle = f"""
WITH {_FP_ROWS_SQL}
SELECT doc_id,
       CAST(len(list_sort(list(fp))) AS INT) AS n_fps,
       array_to_string(list_sort(list(fp)), ',') AS fps
FROM fp GROUP BY doc_id
"""


def _winnow_fp_rows(docs: DataFrame) -> DataFrame:
    """Distinct winnowing fingerprints in long format (doc_id, fp):
    WINNOW_K-token shingles, hashed, min of every WINNOW_W-shingle window.

    Shape (the load-bearing perf decision, round-11 rework): TOKENS are
    exploded flat (pure codegen), each shingle string is assembled from
    lead() offsets over the doc-keyed position sort, and the hash is a
    flat codegen projection. The round-1 lesson was that md5/conv chains
    inside higher-order-function lambdas run interpreted per element; the
    sf≈10 rehearsal found the REMAINING lambda — the slice+concat_ws
    building the shingle strings inside F.transform — was itself the
    scale wall (149 s of a 164 s warm run for the explode alone at sf≈10;
    this lead()-spelled form assembles IDENTICAL shingle strings, so
    every fingerprint hash and oracle is unchanged, inside whole-stage
    codegen). The lead() pass and the min-window below share ONE
    (doc_id, pos) exchange+sort — Catalyst pipelines both Window nodes on
    the same spec.

    Docs shorter than WINNOW_K tokens are filtered HERE (not only at call
    sites): they produce no complete shingle (trailing lead() is NULL),
    and the DuckDB oracle (_FP_ROWS_SQL) applies the identical
    ``len(toks) >= K`` predicate, so every caller agrees with its oracle
    regardless of input corpus."""
    from pyspark.sql import Window

    toks = F.split("text", " ")
    docs = docs.filter(F.size(toks) >= WINNOW_K)
    tok = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    )
    wl = Window.partitionBy("doc_id").orderBy("pos")
    leads = [F.lead("tok", j).over(wl) for j in range(1, WINNOW_K)]
    # trailing positions lack a full shingle: the last lead is NULL there
    # (split() never yields NULL tokens, so NULL ⟺ off-the-end)
    sh = tok.select(
        "doc_id",
        "pos",
        F.concat_ws(" ", F.col("tok"), *leads).alias("shingle"),
        leads[-1].isNotNull().alias("_full"),
    ).filter(F.col("_full"))
    hashed = sh.select(
        "doc_id", "pos", portable_hash_mod(F.col("shingle")).alias("h")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    return (
        hashed.select("doc_id", F.min("h").over(w).alias("fp"))
        .distinct()
    )


@register("winnowing_fingerprints", winnow_oracle)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm) over token shingles: hash every WINNOW_K-token
    shingle, keep the minimum of each WINNOW_W-window. Unlike the
    whole-document rolling hash (`doc_fingerprints`), the selected set is
    LOCAL — two documents sharing any run of >= k+w-1 consecutive tokens
    share a fingerprint wherever the run sits — the property train/test
    contamination detection needs (`contamination_trigrams` is the exact
    full-index variant; winnowing ships ~2/(w+1) of it).

    Plan: explode → codegen hash → one doc-keyed sliding-frame min →
    distinct + per-doc collect; at 100 TB every stage carries
    shingle-count-sized flat rows and partitions by doc or (doc, fp)."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= WINNOW_K
    )
    fps = _winnow_fp_rows(docs)
    # fps serialized as a joined string: the driver comparator hashes
    # scalar columns only (registry contract test)
    return fps.groupBy("doc_id").agg(
        F.size(F.sort_array(F.collect_set("fp"))).alias("n_fps"),
        F.array_join(F.sort_array(F.collect_set("fp")), ",").alias("fps"),
    )


winnow_overlap_oracle = f"""
WITH {_FP_ROWS_SQL}, fpr AS (
  SELECT doc_id, fp
  FROM (SELECT doc_id, fp,
               count(*) OVER (PARTITION BY fp) AS df
        FROM fp)
  WHERE df <= {WINNOW_MAX_DF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       count(*) AS n_shared
FROM fpr a JOIN fpr b USING (fp)
WHERE a.doc_id < b.doc_id
GROUP BY doc_a, doc_b
HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


@register("winnow_overlap_pairs", winnow_overlap_oracle)
def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document contamination pairs from shared winnowing
    fingerprints: document pairs sharing >= WINNOW_MIN_SHARED selected
    fingerprints, candidates generated by a fingerprint-keyed
    equi-self-join — never all pairs.

    Boilerplate guard: fingerprints present in more than WINNOW_MAX_DF
    documents (license headers, templates — the shingle stopwords) are
    dropped BEFORE pairing, which bounds each bucket's pair contribution
    at C(MAX_DF, 2) and keeps the join output-bound (the same hot-bucket
    discipline as the MinHash LSH path). The document-frequency filter is
    a count-over-window on the SAME fp-keyed exchange the self-join
    needs, so both join inputs are one reusable subtree. At 100 TB the
    df-filter is the difference between linear and quadratic."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split("text", " ")) >= WINNOW_K
    )
    fp = _winnow_fp_rows(docs)
    fpr = (
        fp.withColumn("df", F.count("*").over(Window.partitionBy("fp")))
        .filter(F.col("df") <= WINNOW_MAX_DF)
        .drop("df")
    )
    a = fpr.alias("a")
    b = fpr.alias("b")
    # pin the shuffle-hash self-join: an AQE broadcast of one side (8 MiB
    # at sf0.1) re-evaluates the winnowing subtree for the build side and
    # grows linearly with the corpus; the pinned join keeps both sides on
    # the ONE fp-keyed exchange (ReuseExchange) at any scale
    return (
        a.hint("shuffle_hash").join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= WINNOW_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# Vocabulary build + token-id encoding (tokenizer-prep infrastructure)
# ---------------------------------------------------------------------------

#: vocabulary size; tokens outside the top-VOCAB_MAX map to OOV id 0
VOCAB_MAX = 256

_VOCAB_CTE = f"""
tf AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), cnt AS (
  SELECT tok, count(*) AS freq FROM tf GROUP BY tok
), top AS (
  SELECT tok, freq FROM cnt ORDER BY freq DESC, tok LIMIT {VOCAB_MAX}
), vocab AS (
  SELECT a.tok, a.freq,
         1 + (SELECT count(*) FROM top b
              WHERE b.freq > a.freq OR (b.freq = a.freq AND b.tok < a.tok))
           AS id
  FROM top a
)"""

vocab_top_tokens_oracle = f"""
WITH {_VOCAB_CTE}
SELECT tok, CAST(freq AS BIGINT) AS freq, CAST(id AS BIGINT) AS id FROM vocab
"""


def _vocab_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
    )
    top = cnt.orderBy(F.desc("freq"), "tok").limit(VOCAB_MAX)
    b = top.select(
        F.col("tok").alias("b_tok"), F.col("freq").alias("b_freq")
    )
    before = (F.col("b_freq") > F.col("freq")) | (
        (F.col("b_freq") == F.col("freq")) & (F.col("b_tok") < F.col("tok"))
    )
    return (
        top.join(b, before, "left")
        .groupBy("tok", "freq")
        .agg((1 + F.count("b_tok")).alias("id"))
    )


@register("vocab_top_tokens", vocab_top_tokens_oracle)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic vocabulary build: the VOCAB_MAX most frequent corpus
    tokens, id = frequency rank with lexicographic tiebreak — the
    reproducible token→id table a tokenizer-prep pipeline derives from its
    own corpus. The data-sized stage is one combinable token-count
    aggregate; the top-K is TakeOrderedAndProject (per-partition heads,
    K·P-row driver merge, no global sort), and ranking within the K
    survivors is a K²-pair triangular join — NO unpartitioned window
    anywhere, so nothing funnels through one task at any corpus scale."""
    return _vocab_frame(spark, sf_dir).select(
        "tok", "freq", F.col("id").cast("long").alias("id")
    )


vocab_encode_docs_oracle = f"""
WITH {_VOCAB_CTE}, toks AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), pos AS (
  SELECT doc_id, unnest(range(0, len(toks))) AS pos, toks FROM toks
), tok_pos AS (
  SELECT doc_id, pos, toks[CAST(pos + 1 AS BIGINT)] AS tok FROM pos
)
SELECT t.doc_id,
       array_to_string(list(CAST(coalesce(v.id, 0) AS BIGINT)
                            ORDER BY t.pos), ' ') AS ids
FROM tok_pos t LEFT JOIN vocab v ON v.tok = t.tok
GROUP BY t.doc_id
"""


@register("vocab_encode_docs", vocab_encode_docs_oracle)
def vocab_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-id encoding: every document becomes its array of vocabulary
    ids in token order, out-of-vocabulary tokens mapping to the OOV bucket
    (id 0) — the step that turns a curated text corpus into the integer
    sequences a training pipeline packs (see `pack_sequences`). Plan:
    posexplode preserves positions, the token→id map joins on (AQE
    broadcasts the VOCAB_MAX-row side on measured size — no forced hint),
    and per-doc order is restored with array_sort over (pos, id) structs —
    deterministic, unlike bare collect_list. One doc-keyed shuffle for the
    reassembly; ids are ints, so the shuffled bytes are a fraction of the
    text they encode."""
    vocab = _vocab_frame(spark, sf_dir).select("tok", "id")
    docs = load_table(spark, sf_dir, "documents")
    tok_pos = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    enc = tok_pos.join(vocab, "tok", "left").select(
        "doc_id", "pos", F.coalesce("id", F.lit(0)).cast("long").alias("id")
    )
    return enc.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "id"))),
                lambda s: s["id"].cast("string"),
            ),
            " ",
        ).alias("ids")
    )


# ---------------------------------------------------------------------------
# Bigram collocation extraction (PMI)
# ---------------------------------------------------------------------------

#: minimum bigram frequency before PMI is trusted (rare-pair PMI explodes)
COLLOC_MIN = 5
#: collocations reported
COLLOC_K = 50

collocations_oracle = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
), bigrams AS (
  SELECT a.tok AS tok1, b.tok AS tok2
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
), bc AS (
  SELECT tok1, tok2, CAST(count(*) AS BIGINT) AS c_xy
  FROM bigrams GROUP BY tok1, tok2
), uc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY tok
), totals AS (
  SELECT (SELECT sum(c) FROM uc) AS n_uni, (SELECT sum(c_xy) FROM bc) AS n_bi
)
SELECT tok1, tok2, c_xy,
       round(ln((CAST(c_xy AS DOUBLE) / n_bi)
                / ((CAST(u1.c AS DOUBLE) / n_uni)
                   * (CAST(u2.c AS DOUBLE) / n_uni))), 6) AS pmi
FROM bc JOIN uc u1 ON u1.tok = bc.tok1
        JOIN uc u2 ON u2.tok = bc.tok2, totals
WHERE c_xy >= {COLLOC_MIN}
ORDER BY pmi DESC, tok1, tok2
LIMIT {COLLOC_K}
"""


@register("bigram_collocations", collocations_oracle)
def bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{COLLOC_K} bigram collocations by pointwise mutual information —
    token pairs that co-occur far above chance ("new york", "machine
    learning"), the phrase-mining step a tokenizer-vocabulary or stopword
    pipeline runs before merges. PMI = ln(P(xy) / (P(x)P(y))) over
    adjacent-token bigrams, floored at {COLLOC_MIN} occurrences so
    rare-pair PMI noise never surfaces.

    Plan: one posexplode → doc-keyed lead() for adjacency, combinable
    bigram/unigram counts (the two data-sized exchanges ride the SAME
    token-shaped rows), two hash joins of the bigram table against the
    unigram table (vocabulary-sized, AQE picks broadcast when it fits),
    1-row totals broadcast, TakeOrderedAndProject for the top-k — no
    global sort. The PMI double is the same IEEE expression tree both
    engines evaluate on identical integers; ordering is on the ROUNDED
    value with a lexicographic tiebreak, so the k-boundary is
    deterministic cross-engine."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.select(
        F.col("tok").alias("tok1"), F.lead("tok").over(w).alias("tok2")
    ).filter(F.col("tok2").isNotNull())
    bc = bigrams.groupBy("tok1", "tok2").agg(F.count("*").alias("c_xy"))
    uc = toks.groupBy("tok").agg(F.count("*").alias("c"))
    totals = uc.agg(F.sum("c").alias("n_uni")).crossJoin(
        bc.agg(F.sum("c_xy").alias("n_bi"))
    )
    u1 = uc.select(F.col("tok").alias("tok1"), F.col("c").alias("c1"))
    u2 = uc.select(F.col("tok").alias("tok2"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log(
            (F.col("c_xy").cast("double") / F.col("n_bi"))
            / (
                (F.col("c1").cast("double") / F.col("n_uni"))
                * (F.col("c2").cast("double") / F.col("n_uni"))
            )
        ),
        6,
    )
    return (
        bc.filter(F.col("c_xy") >= COLLOC_MIN)
        .join(u1, "tok1")
        .join(u2, "tok2")
        .crossJoin(F.broadcast(totals))
        .select("tok1", "tok2", "c_xy", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "tok1", "tok2")
        .limit(COLLOC_K)
    )


# ---------------------------------------------------------------------------
# Tokenizer fertility profile per (lang, source)
# ---------------------------------------------------------------------------

_FERT_PAT = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


@register(
    "tokenizer_fertility",
    f"""
    WITH per_doc AS (
      SELECT lang, source,
             CAST(len(regexp_extract_all(text, '{_FERT_PAT}')) AS BIGINT)
               AS toks,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
             CAST(length(text) AS BIGINT) AS chars
      FROM documents WHERE length(text) > 0
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(toks) AS BIGINT) AS n_tokens,
           round(CAST(sum(toks) AS DOUBLE) / sum(words), 6)
             AS tokens_per_word,
           round(100.0 * sum(toks) / sum(chars), 6) AS tokens_per_100_chars
    FROM per_doc
    GROUP BY lang, source
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per (lang, source): BPE-ish regex tokens per
    whitespace word and per 100 characters — the compression-rate readout
    a pretraining team checks before committing a tokenizer to a corpus
    mix (high fertility on a slice = that slice pays more sequence budget
    per word; the per-slice table is what `token_budget_apportion`
    allocates FROM). Reuses the `token_count_regex` pre-tokenizer shape.

    Shape: one stage — regex counts are per-row projections inside
    whole-stage codegen, then ONE combinable (lang, source) aggregate;
    ratios of exact BIGINT sums → round-6 hash-stable."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    per_doc = docs.select(
        "lang",
        "source",
        F.size(F.regexp_extract_all("text", F.lit(_FERT_PAT), 0))
        .cast("long")
        .alias("toks"),
        F.size(F.split("text", " ")).cast("long").alias("words"),
        F.length("text").cast("long").alias("chars"),
    )
    return per_doc.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("toks").alias("n_tokens"),
        F.round(
            F.sum("toks").cast("double") / F.sum("words"), 6
        ).alias("tokens_per_word"),
        F.round(100.0 * F.sum("toks") / F.sum("chars"), 6).alias(
            "tokens_per_100_chars"
        ),
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (stopword-delimited phrases, degree/frequency)
# ---------------------------------------------------------------------------

RAKE_TOP = 20
#: reuse the evaluation stopword list (operators/quality.py) as the RAKE
#: delimiter set — one shared definition, embedded in both engines
from .quality import EN_STOPWORDS as _RAKE_STOPS  # noqa: E402

_RAKE_STOPS_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)


def _rake_oracle() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, t.pos, t.tok
  FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
    FROM documents
  ) t(doc_id, tok, pos)
), content AS (
  SELECT doc_id, pos, tok,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos)
           AS island
  FROM tok WHERE tok NOT IN ({_RAKE_STOPS_SQL}) AND tok <> ''
), phrases AS (
  SELECT doc_id, island,
         string_agg(tok, ' ' ORDER BY pos) AS phrase,
         CAST(count(*) AS BIGINT) AS plen
  FROM content GROUP BY doc_id, island
), words AS (
  SELECT c.tok, p.plen
  FROM content c JOIN phrases p
    ON p.doc_id = c.doc_id AND p.island = c.island
), wscore AS (
  SELECT tok, CAST(sum(plen) AS BIGINT) AS deg,
         CAST(count(*) AS BIGINT) AS freq
  FROM words GROUP BY tok
), pscore AS (
  SELECT p.phrase,
         sum(CAST(w.deg AS DOUBLE) / w.freq) AS score
  FROM phrases p
  JOIN content c ON c.doc_id = p.doc_id AND c.island = p.island
  JOIN wscore w ON w.tok = c.tok
  GROUP BY p.doc_id, p.island, p.phrase
)
SELECT phrase,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       round(max(score), 6) AS score
FROM pscore
GROUP BY phrase
ORDER BY round(max(score), 6) DESC, phrase
LIMIT {RAKE_TOP}
"""


@register("rake_keywords", _rake_oracle())
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010) over the corpus:
    stopword-delimited phrases via GAPS-AND-ISLANDS (consecutive
    non-stopword tokens share island = pos − row_number, the
    `gaps_islands_activity` kernel applied to text), word score =
    degree/frequency (degree = Σ phrase length over a word's
    occurrences), phrase score = Σ member word scores; top-20 phrases.
    The unsupervised complement of `tf_idf` (which needs a background
    corpus) and `bigram_collocations` (fixed length 2 — RAKE phrases are
    variable-length).

    Scale: token posexplode is the data-sized stage; islands ride the
    doc-PARTITIONED window (per-doc sequences, never corpus-wide);
    word/phrase scores are two combinable vocabulary-bounded aggregates.
    Scores are sums of positive int ratios → round-6 hash-stable."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tok = docs.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    w = Window.partitionBy("doc_id").orderBy("pos")
    content = tok.filter(
        (~F.col("tok").isin(*_RAKE_STOPS)) & (F.col("tok") != "")
    ).withColumn("island", F.col("pos") - F.row_number().over(w))
    phrases = content.groupBy("doc_id", "island").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("phrase"),
        F.count("*").alias("plen"),
    )
    # scale shape: phrase STRINGS never ride the hot shuffles. Scores are
    # computed over (doc_id, island, tok, plen) — plen from a string-free
    # island-length groupBy, NOT the phrases frame — and the phrase text
    # is attached by ONE final island-keyed join of two island-sized
    # relations. shuffle_hash pins throughout: all the join sides here are
    # corpus/vocabulary-sized (AQE auto-broadcast 360 MiB at sf≈1 in the
    # first spelling — not a 100 TB shape).
    ilen = content.groupBy("doc_id", "island").agg(
        F.count("*").alias("plen")
    )
    cw = content.select("doc_id", "island", "tok").join(
        ilen.hint("shuffle_hash"), ["doc_id", "island"]
    )
    wscore = cw.groupBy("tok").agg(
        F.sum("plen").alias("deg"), F.count("*").alias("freq")
    )
    pnum = (
        cw.join(wscore.hint("shuffle_hash"), "tok")
        .groupBy("doc_id", "island")
        .agg(
            F.sum(F.col("deg").cast("double") / F.col("freq")).alias("score")
        )
    )
    pscore = pnum.join(phrases.hint("shuffle_hash"), ["doc_id", "island"])
    return (
        pscore.groupBy("phrase")
        .agg(
            F.count("*").alias("n_occurrences"),
            # the top-k boundary orders on the ROUNDED score: raw doubles
            # may differ in the last ulp across engines, and a boundary
            # tie must break on (rounded score, phrase) identically
            F.round(F.max("score"), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("phrase"))
        .limit(RAKE_TOP)
    )


# ---------------------------------------------------------------------------
# Good-Turing unseen mass (round 13): vocabulary-coverage estimator
# ---------------------------------------------------------------------------

good_turing_oracle = """
WITH tok AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), tf AS (
  SELECT source, tok, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY source, tok
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
       CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
       round(CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / sum(c), 6) AS unseen_mass,
       round(CASE WHEN sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) > 0
                  THEN 2.0 * sum(CASE WHEN c = 2 THEN 1 ELSE 0 END)
                       / sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                  END, 6) AS gt_singleton_mult
FROM tf GROUP BY source
"""


@register("good_turing_unseen_mass", good_turing_oracle)
def good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing estimate of the UNSEEN-token probability mass per
    source: P(next token is out-of-vocabulary) ≈ n₁/N (tokens seen
    exactly once over total tokens — Good 1953), plus the Good-Turing
    count multiplier 2·n₂/n₁ that re-estimates singleton frequency. The
    vocabulary-coverage readout a tokenizer/LM pipeline reads before
    freezing a vocab: a source with high unseen mass is still producing
    novel tokens and will fragment under the trained vocab — the
    forward-looking complement of `heaps_law_fit` (growth curve so far)
    and `tokenizer_fertility` (damage already done).

    Shape: one explode + ONE combinable (source, token) groupBy, then a
    source-count-sized frequency-of-frequencies aggregate — nothing
    beyond the token-count shuffle at any scale. Integer counts; one
    rounded division per output."""
    tok = load_table(spark, sf_dir, "documents").select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    )
    tf = tok.groupBy("source", "tok").agg(F.count("*").alias("c"))
    n1 = F.sum((F.col("c") == 1).cast("long"))
    n2 = F.sum((F.col("c") == 2).cast("long"))
    return tf.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("vocab"),
        n1.alias("n1"),
        n2.alias("n2"),
        F.round(n1.cast("double") / F.sum("c"), 6).alias("unseen_mass"),
        F.round(
            F.when(n1 > 0, 2.0 * n2 / n1), 6
        ).alias("gt_singleton_mult"),
    )


# ---------------------------------------------------------------------------
# Token burstiness (round 13): Fano factor of per-doc counts per token
# ---------------------------------------------------------------------------

#: minimum document frequency for a token to be scored (rate-limits the
#: output to tokens with enough evidence; the relation stays vocab-sized)
BURST_MIN_DF = 20
BURST_TOP = 20

burstiness_oracle = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), percnt AS (
  SELECT tok, doc_id, CAST(count(*) AS BIGINT) AS c
  FROM tok GROUP BY tok, doc_id
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), stats AS (
  SELECT tok,
         CAST(count(*) AS BIGINT) AS df,
         CAST(sum(c) AS BIGINT) AS cf,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM percnt GROUP BY tok HAVING count(*) >= {BURST_MIN_DF}
)
SELECT s.tok, s.df, s.cf,
       round((CAST(s.s2 AS DOUBLE) * d.n_docs - CAST(s.cf AS DOUBLE) * s.cf)
             / (CAST(d.n_docs AS DOUBLE) * s.cf), 6) AS fano
FROM stats s, nd d
ORDER BY fano DESC, s.tok
LIMIT {BURST_TOP}
"""


@register("token_burstiness", burstiness_oracle)
def token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor, var/mean over ALL docs including zeros)
    of each frequent token's per-document count: content words clump —
    they recur within the few docs that mention them (Fano ≫ 1) —
    while function words spread evenly (Fano ≈ 1, the Poisson line) —
    Church & Gale's burstiness, the signal that separates topical terms
    from glue BEFORE any stopword list exists (feeds stopword-free
    keyword extraction and the quality family's lexical features).

    Zeros never materialize: with N docs, counts c over mentioning docs
    give mean = cf/N and E[x²] = Σc²/N, so var/mean =
    (N·Σc² − cf²)/(N·cf) — exact integers up to one final division.
    Top-{BURST_TOP} boundary ordered on the ROUNDED score (cross-engine
    ulp rule), token as tiebreak.

    Shape: explode → ONE combinable (token, doc) groupBy → vocab-sized
    per-token aggregate with a DF floor; 1-row doc count broadcast; the
    top-k is a TakeOrdered, never a sort."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    percnt = tok.groupBy("tok", "doc_id").agg(F.count("*").alias("c"))
    stats = (
        percnt.groupBy("tok")
        .agg(
            F.count("*").alias("df"),
            F.sum("c").alias("cf"),
            F.sum(F.col("c") * F.col("c")).alias("s2"),
        )
        .filter(F.col("df") >= BURST_MIN_DF)
    )
    nd = docs.agg(F.count("*").alias("n_docs"))
    scored = stats.crossJoin(F.broadcast(nd)).select(
        "tok",
        "df",
        "cf",
        F.round(
            (
                F.col("s2").cast("double") * F.col("n_docs")
                - F.col("cf").cast("double") * F.col("cf")
            )
            / (F.col("n_docs").cast("double") * F.col("cf")),
            6,
        ).alias("fano"),
    )
    # TakeOrdered boundary on the ROUNDED score (the rake_keywords rule)
    return scored.orderBy(F.desc("fano"), F.asc("tok")).limit(BURST_TOP)
