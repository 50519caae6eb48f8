"""Text-analysis operators for the training-data pipeline, over `documents`.

- lang-ID: stopword-hit n-gram heuristic with a deterministic argmax
- quality scoring: length / punctuation / stopword / casing ratios
- token counting: whitespace tokens + a BPE-ish regex tokenizer
- document fingerprinting: md5 word hashes -> 3-gram polynomial window
  hashes -> winnowing-style min fingerprint

All JVM-side column expressions (no Python UDFs); every ratio is a single
double division so the value is reduction-order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import table

_WORDS = r"split(lower(trim(text)), '\\s+')"
SQL_WORDS = r"regexp_split_to_array(lower(trim(text)), '\s+')"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un"],
    "es": ["el", "la", "los", "y", "es", "un"],
    "zh": ["de", "shi", "le", "zai", "he"],
}
LANGS = sorted(STOPWORDS)  # deterministic argmax tie-break order

BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def _hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"size(filter({_WORDS}, w -> array_contains(array({lst}), w)))"


def _sql_hits(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({SQL_WORDS}, w -> list_contains([{lst}], w)))"


def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "lang", *[F.expr(_hits(l)).alias(f"s_{l}") for l in LANGS]
    )
    # deterministic argmax: first language (alphabetical) with the max score
    pred = F.lit(None).cast("string")
    best = F.greatest(*[F.col(f"s_{l}") for l in LANGS])
    for l in reversed(LANGS):
        pred = F.when(F.col(f"s_{l}") == best, F.lit(l)).otherwise(pred)
    return scored.select(
        "doc_id",
        pred.alias("lang_pred"),
        "lang",
        (pred == F.col("lang")).alias("is_match"),
    )


_SQL_BEST = "greatest(" + ", ".join(f"s_{l}" for l in LANGS) + ")"
_SQL_PRED = (
    "CASE "
    + " ".join(f"WHEN s_{l} = {_SQL_BEST} THEN '{l}'" for l in LANGS)
    + " END"
)
SQL_TEXT_LANGID = f"""
SELECT doc_id, {_SQL_PRED} AS lang_pred, lang,
       ({_SQL_PRED} = lang) AS is_match
FROM (SELECT doc_id, lang,
             {', '.join(f'{_sql_hits(l)} AS s_{l}' for l in LANGS)}
      FROM documents)
"""


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    return (
        d.select(
            "doc_id",
            F.expr(f"size({_WORDS})").alias("n_words"),
            F.length("text").alias("n_chars"),
            F.expr("regexp_count(text, '[.,;:!?]')").alias("n_punct"),
            F.expr("regexp_count(text, '[A-Z]')").alias("n_upper"),
            F.expr(f"size(filter({_WORDS}, w -> array_contains(array({en}), w)))").alias("n_stop"),
            # token counting folded in (former text_tokens entry; same grain):
            # whitespace tokens == n_words, BPE-ish regex tokens below
            F.regexp_count(F.col("text"), F.lit(BPE_RE)).alias("bpe_tokens"),
        )
        .withColumn("avg_word_len", F.col("n_chars").cast("double") / F.col("n_words"))
        .withColumn("punct_ratio", F.col("n_punct").cast("double") / F.col("n_chars"))
        .withColumn("stopword_ratio", F.col("n_stop").cast("double") / F.col("n_words"))
        .withColumn("upper_ratio", F.col("n_upper").cast("double") / F.col("n_chars"))
        .withColumn(
            "quality",
            (F.col("stopword_ratio") * 2.0 + F.col("punct_ratio") * 1.0)
            - F.col("upper_ratio") * 0.5,
        )
    )


SQL_TEXT_QUALITY = rf"""
SELECT *,
       (stopword_ratio * 2.0 + punct_ratio * 1.0) - upper_ratio * 0.5 AS quality
FROM (
  SELECT doc_id, n_words, n_chars, n_punct, n_upper, n_stop, bpe_tokens,
         CAST(n_chars AS DOUBLE) / n_words AS avg_word_len,
         CAST(n_punct AS DOUBLE) / n_chars AS punct_ratio,
         CAST(n_stop AS DOUBLE) / n_words AS stopword_ratio,
         CAST(n_upper AS DOUBLE) / n_chars AS upper_ratio
  FROM (
    SELECT doc_id,
           len({SQL_WORDS}) AS n_words,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
           len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
           {_sql_hits('en')} AS n_stop,
           len(regexp_extract_all(text, '{BPE_RE}')) AS bpe_tokens
    FROM documents
  )
)
"""


# word hash: first 8 md5 hex chars as int64 (engine-portable)
_WHASH = "transform(" + _WORDS + ", w -> cast(conv(substring(md5(w), 1, 8), 16, 10) as bigint))"
# 3-word polynomial window hashes mod a prime, winnowing-style min
_WINDOWS = (
    f"CASE WHEN size({_WORDS}) >= 3 THEN "
    f"transform(sequence(1, size({_WORDS}) - 2), i -> "
    f"(element_at(hs, i) * 31 + element_at(hs, i + 1) * 17 + element_at(hs, i + 2)) % 1000003) "
    "ELSE array(cast(0 as bigint)) END"
)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    return (
        d.withColumn("hs", F.expr(_WHASH))
        .withColumn("wh", F.expr(_WINDOWS))
        .select(
            "doc_id",
            F.array_min("wh").alias("fingerprint"),
            F.size(F.array_distinct("wh")).alias("n_distinct_windows"),
        )
    )


SQL_TEXT_FINGERPRINT = f"""
SELECT doc_id, list_min(wh) AS fingerprint,
       len(list_distinct(wh)) AS n_distinct_windows
FROM (
  SELECT doc_id,
         CASE WHEN len(hs) >= 3 THEN
           [(hs[i] * 31 + hs[i + 1] * 17 + hs[i + 2]) % 1000003
            FOR i IN generate_series(1, len(hs) - 2)]
         ELSE [CAST(0 AS BIGINT)] END AS wh
  FROM (
    SELECT doc_id,
           [CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT) FOR w IN {SQL_WORDS}] AS hs
    FROM documents
  )
)
"""


# ---------------------------------------------------------------------------
# corpus retention: the keep/drop decision stage a training-data pipeline
# runs before tokenization — composes the near-dup fingerprint, length gate
# and quality score into one verdict per document with a reason.
# ---------------------------------------------------------------------------

MIN_WORDS = 15     # drop docs shorter than this many whitespace tokens
QUALITY_T = 0.05   # drop docs scoring below this on the quality heuristic
# drop-reason precedence: a near-duplicate is dropped as such even if it is
# also short/low-quality (dedup runs first in a real pipeline)


def corpus_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document keep/drop verdict. Plan at scale: one projection computes
    every signal (words/quality/fingerprint), then ONE shuffle on the
    high-cardinality fingerprint key with `min(doc_id) over (partition by
    fingerprint)` to pick each group's keeper. The earlier groupBy+join-back
    formulation re-evaluated the computed-array fingerprint expressions
    through the self-join (the interpreted-lambda inlining cliff): 115 s at
    sf0.1 vs 1.2 s for this single-pass window — the window partitions on a
    hash-valued key (never a global window) and evaluates every signal
    exactly once before the exchange."""
    d = table(spark, sf_dir, "documents")
    en = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    base = (
        d.withColumn("hs", F.expr(_WHASH))
        .withColumn("wh", F.expr(_WINDOWS))
        .select(
            "doc_id",
            "lang",
            F.array_min("wh").alias("fingerprint"),
            F.expr(f"size({_WORDS})").alias("n_words"),
            F.length("text").alias("n_chars"),
            F.expr("regexp_count(text, '[.,;:!?]')").alias("n_punct"),
            F.expr("regexp_count(text, '[A-Z]')").alias("n_upper"),
            F.expr(f"size(filter({_WORDS}, w -> array_contains(array({en}), w)))").alias("n_stop"),
            # token counting folded in (former text_tokens entry; same grain):
            # whitespace tokens == n_words, BPE-ish regex tokens below
            F.regexp_count(F.col("text"), F.lit(BPE_RE)).alias("bpe_tokens"),
        )
        .withColumn(
            "quality",
            (F.col("n_stop").cast("double") / F.col("n_words") * 2.0
             + F.col("n_punct").cast("double") / F.col("n_chars"))
            - F.col("n_upper").cast("double") / F.col("n_chars") * 0.5,
        )
    )
    reason = (
        F.when(F.col("doc_id") != F.col("keeper_id"), F.lit("near_duplicate"))
        .when(F.col("n_words") < MIN_WORDS, F.lit("too_short"))
        .when(F.col("quality") < QUALITY_T, F.lit("low_quality"))
        .otherwise(F.lit("kept"))
    )
    w = Window.partitionBy("fingerprint")
    return (
        base.withColumn("keeper_id", F.min("doc_id").over(w))
        .withColumn("drop_reason", reason)
        .select(
            "doc_id", "lang", "fingerprint", "keeper_id", "n_words", "quality",
            (F.col("drop_reason") == "kept").alias("keep"), "drop_reason",
        )
    )


SQL_CORPUS_RETENTION = f"""
WITH base AS (
  SELECT doc_id, lang, list_min(wh) AS fingerprint, n_words, n_chars,
         n_punct, n_upper, n_stop,
         (CAST(n_stop AS DOUBLE) / n_words * 2.0
          + CAST(n_punct AS DOUBLE) / n_chars)
          - CAST(n_upper AS DOUBLE) / n_chars * 0.5 AS quality
  FROM (
    SELECT doc_id, lang,
           CASE WHEN len(hs) >= 3 THEN
             [(hs[i] * 31 + hs[i + 1] * 17 + hs[i + 2]) % 1000003
              FOR i IN generate_series(1, len(hs) - 2)]
           ELSE [CAST(0 AS BIGINT)] END AS wh,
           len({SQL_WORDS}) AS n_words,
           length(text) AS n_chars,
           len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
           len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
           {_sql_hits('en')} AS n_stop
    FROM (
      SELECT doc_id, lang, text,
             [CAST(('0x' || substring(md5(w), 1, 8)) AS BIGINT)
              FOR w IN {SQL_WORDS}] AS hs
      FROM documents
    )
  )
),
keepers AS (
  SELECT fingerprint, min(doc_id) AS keeper_id FROM base GROUP BY fingerprint
),
verdict AS (
  SELECT b.doc_id, b.lang, b.fingerprint, k.keeper_id, b.n_words, b.quality,
         CASE WHEN b.doc_id != k.keeper_id THEN 'near_duplicate'
              WHEN b.n_words < {MIN_WORDS} THEN 'too_short'
              WHEN b.quality < {QUALITY_T} THEN 'low_quality'
              ELSE 'kept' END AS drop_reason
  FROM base b JOIN keepers k USING (fingerprint)
)
SELECT doc_id, lang, fingerprint, keeper_id, n_words, quality,
       (drop_reason = 'kept') AS keep, drop_reason
FROM verdict
"""


QUERIES = {
    "text_langid": text_langid,
    "text_quality": text_quality,
    "corpus_retention": corpus_retention,
}

ORACLES = {
    "text_langid": SQL_TEXT_LANGID,
    "text_quality": SQL_TEXT_QUALITY,
    "corpus_retention": SQL_CORPUS_RETENTION,
}
