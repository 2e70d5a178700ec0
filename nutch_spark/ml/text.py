"""Text analysis for large-scale training-data pipelines.

All operators are pure JVM column expressions over the ``documents``
table (doc_id, text, lang, source, n_chars) — no Python in the hot
path — and each has an exactly-equivalent ANSI-SQL oracle (DuckDB) in
``__spark_entry__.oracle_sql``:

- token counting (whitespace + a BPE-ish word/punct regex),
- quality scoring (length / alpha-ratio / stopword-ratio features),
- language ID (stopword-marker n-gram heuristic),
- document fingerprinting (normalized-text MD5, the text analogue of
  the crawl signature T12/T13).

At 100 TB these are narrow map-side transforms: no shuffle, fully
pipelined with the parquet scan, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker stopwords (distinctive, whitespace-delimited)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with", "that"],
    "de": ["der", "die", "und", "nicht"],
    "fr": ["les", "des", "est", "une"],
    "es": ["los", "las", "que", "para"],
}

_WORD_SPLIT = r"\s+"
# BPE-ish: words, numbers, or single punctuation marks
_BPE_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, _WORD_SPLIT))
    )


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words + numbers + punctuation marks,
    the usual cheap proxy for BPE token budgeting."""
    return F.size(F.regexp_extract_all(text, F.lit(_BPE_TOKEN), 0))


def _count_occurrences(text_lc: Column, word: str) -> Column:
    """Occurrences of a whitespace-delimited word (portable arithmetic:
    split-by-word length minus 1)."""
    return F.size(F.split(text_lc, rf"\b{word}\b")) - 1


def marker_counts(text: Column) -> dict[str, Column]:
    t = F.lower(text)
    return {
        lang: sum((_count_occurrences(t, w) for w in words), F.lit(0))
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax of language marker-word counts; 'und' (undetermined) when
    no marker hits."""
    counts = marker_counts(text)
    best = F.greatest(*counts.values())
    expr = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:  # insertion order = tie-break priority
        expr = expr.when(counts[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def quality_features(text: Column) -> dict[str, Column]:
    """Length, alpha ratio, punctuation ratio, stopword ratio, mean word
    length — the standard cheap quality signals."""
    t = F.coalesce(text, F.lit(""))
    n_chars = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^.,;:!?]", ""))
    n_tokens = token_count(t)
    n_stop = sum((_count_occurrences(F.lower(t), w) for w in LANG_MARKERS["en"]), F.lit(0))
    safe = F.when(n_chars > 0, n_chars).otherwise(F.lit(1))
    safe_tok = F.when(n_tokens > 0, n_tokens).otherwise(F.lit(1))
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "alpha_ratio": F.round(n_alpha.cast("double") / safe, 6),
        "punct_ratio": F.round(n_punct.cast("double") / safe, 6),
        "stopword_ratio": F.round(n_stop.cast("double") / safe_tok, 6),
        "mean_word_len": F.round(n_alpha.cast("double") / safe_tok, 6),
    }


def quality_score(text: Column) -> Column:
    """Scalar quality score in [0,1]: weighted blend of the features
    (deterministic, portable arithmetic)."""
    f = quality_features(text)
    length_score = F.least(f["n_chars"].cast("double") / 500.0, F.lit(1.0))
    score = (
        0.4 * length_score
        + 0.3 * F.least(f["alpha_ratio"] * 1.25, F.lit(1.0))
        + 0.2 * F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
        + 0.1 * (1.0 - F.least(f["punct_ratio"] * 10.0, F.lit(1.0)))
    )
    return F.round(score, 6)


def normalized_text(text: Column) -> Column:
    """Lowercase + whitespace-collapse canonical form."""
    return F.regexp_replace(F.trim(F.lower(F.coalesce(text, F.lit("")))), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Document fingerprint = MD5 of the normalized text (the rolling-hash
    document fingerprint; also the exact-dedup key)."""
    return F.md5(normalized_text(text))


def analyze(documents: DataFrame) -> DataFrame:
    """One wide pass: all text-analysis columns."""
    t = F.col("text")
    feats = quality_features(t)
    return documents.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        lang_id(t).alias("lang_pred"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
        *[v.alias(k) for k, v in feats.items() if k not in ("n_tokens",)],
    )
