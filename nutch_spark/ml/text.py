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
    """Whitespace token count (NULL text counts 0 — size(NULL) would
    return -1 and poison downstream length filters)."""
    t = F.trim(F.coalesce(text, F.lit("")))
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, _WORD_SPLIT))
    )


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words + numbers + punctuation marks,
    the usual cheap proxy for BPE token budgeting (NULL text counts 0)."""
    return F.size(F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(_BPE_TOKEN), 0))


def _count_occurrences(text_lc: Column, word: str) -> Column:
    """Occurrences of a whitespace-delimited word (portable arithmetic:
    split-by-word length minus 1)."""
    return F.size(F.split(text_lc, rf"\b{word}\b")) - 1


def marker_counts(text: Column) -> dict[str, Column]:
    # NULL text counts 0 for every marker (split(NULL) has size -1,
    # which would skew the lang-ID argmax to -2 per word)
    t = F.lower(F.coalesce(text, F.lit("")))
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


# ---------------------------------------------------------------------------
# Gopher-style quality rules (Rae et al. 2021, "Scaling Language Models:
# ... Gopher" appendix A1.1 — the de-facto standard pre-training text
# filter battery). Pure JVM column arithmetic, one map-side pass.
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_features(text: Column) -> dict[str, Column]:
    """The rule inputs: word stats, symbol/word ratio, bullet and
    ellipsis line fractions, alpha-word fraction, required-stopword
    hits, duplicate-line fractions."""
    t = F.coalesce(text, F.lit(""))
    words = F.split(F.trim(t), r"\s+")
    n_words = F.when(F.length(F.trim(t)) == 0, F.lit(0)).otherwise(F.size(words))
    safe_w = F.when(n_words > 0, n_words).otherwise(F.lit(1)).cast("double")
    word_chars = F.aggregate(
        words, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    n_hash = F.size(F.split(t, "#", -1)) - 1
    n_ellipsis = F.size(F.split(t, r"\.\.\.", -1)) - 1
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = sum(
        (F.when(F.lower(t).rlike(rf"\b{w}\b"), 1).otherwise(0) for w in GOPHER_STOPWORDS),
        F.lit(0),
    )
    lines = F.split(t, "\n", -1)
    n_lines = F.size(lines)
    safe_l = F.when(n_lines > 0, n_lines).otherwise(F.lit(1)).cast("double")
    bullet_lines = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    ellipsis_lines = F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$")))
    line_chars = F.aggregate(lines, F.lit(0), lambda acc, l: acc + F.length(l))
    uniq_line_chars = F.aggregate(
        F.array_distinct(lines), F.lit(0), lambda acc, l: acc + F.length(l)
    )
    safe_c = F.when(line_chars > 0, line_chars).otherwise(F.lit(1)).cast("double")
    return {
        "n_words": n_words,
        "mean_word_len": F.round(word_chars.cast("double") / safe_w, 6),
        "symbol_word_ratio": F.round((n_hash + n_ellipsis).cast("double") / safe_w, 6),
        "bullet_line_frac": F.round(bullet_lines.cast("double") / safe_l, 6),
        "ellipsis_line_frac": F.round(ellipsis_lines.cast("double") / safe_l, 6),
        "alpha_word_frac": F.round(alpha_words.cast("double") / safe_w, 6),
        "stop_hits": stop_hits,
        "dup_line_frac": F.round(
            (n_lines - F.size(F.array_distinct(lines))).cast("double") / safe_l, 6
        ),
        "dup_line_char_frac": F.round(
            (line_chars - uniq_line_chars).cast("double") / safe_c, 6
        ),
    }


def gopher_quality(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Gopher rule battery + the pass verdict
    (A1.1 thresholds: 50<=words<=100000, 3<=mean word len<=10,
    symbol/word<=0.1, bullets<=90% of lines, ellipses<=30% of lines,
    >=80% words alphabetic, >=2 required stopwords, <=30% duplicate
    lines, <=20% chars in duplicate lines)."""
    f = gopher_features(F.col(text_col))
    passes = (
        (f["n_words"] >= 50) & (f["n_words"] <= 100_000)
        & (f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 10)
        & (f["symbol_word_ratio"] <= 0.1)
        & (f["bullet_line_frac"] <= 0.9)
        & (f["ellipsis_line_frac"] <= 0.3)
        & (f["alpha_word_frac"] >= 0.8)
        & (f["stop_hits"] >= 2)
        & (f["dup_line_frac"] <= 0.3)
        & (f["dup_line_char_frac"] <= 0.2)
    )
    return documents.select(
        "doc_id",
        *[v.alias(k) for k, v in f.items()],
        passes.alias("gopher_pass"),
    )


def _word_ngrams(words: Column, n: int | Column) -> Column:
    """Overlapping word n-grams as strings (space-joined). Guarded:
    Spark's sequence(1, 0) is the DESCENDING [1, 0], not empty."""
    nc = F.lit(n) if isinstance(n, int) else n
    return F.when(F.size(words) < nc, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (nc - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, nc)),
        )
    )


def gopher_repetition(
    documents: DataFrame,
    text_col: str = "text",
    top_ns: tuple = (2, 3, 4),
    dup_ns: tuple = (5, 6),
) -> DataFrame:
    """The repetition half of the Gopher battery (Rae et al. 2021
    A1.1): per document,

    - ``top{n}gram_char_frac``: characters covered by all occurrences
      of the single most frequent word n-gram (ties -> lexicographically
      smallest gram), divided by the text length, for n in ``top_ns``;
    - ``dup{n}gram_char_frac``: characters covered by every n-gram that
      occurs more than once, divided by the text length, for n in
      ``dup_ns``.

    One explode + hash aggregation keyed (doc_id, n, gram) — the
    standard distributed shape; counts never leave the executors and
    the per-doc result joins back broadcast-style. Deterministic and
    ANSI-SQL replayable (char coverage = length(gram) * occurrences)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.split(F.trim(t), r"\s+")
    base = documents.select(
        "doc_id",
        F.length(t).alias("_len"),
        F.when(F.length(F.trim(t)) == 0, F.array().cast("array<string>"))
        .otherwise(words)
        .alias("_words"),
    )
    # ONE scan of base fans out every n level (no per-n union branches
    # re-splitting the text): explode the n values first, then build the
    # grams from the carried _words array with a single lambda (nested
    # per-n lambdas in one expression mis-bind their variables). The
    # per-n features come back through a single conditional aggregation
    # + one join — not one join per n (each was a full shuffle on doc_id)
    ns = sorted(set(top_ns) | set(dup_ns))
    exploded = (
        base.select(
            "doc_id",
            "_words",
            F.explode(F.array(*[F.lit(n) for n in ns])).alias("n"),
        )
        .select(
            "doc_id",
            "n",
            F.explode(_word_ngrams(F.col("_words"), F.col("n"))).alias("gram"),
        )
    )
    counts = exploded.groupBy("doc_id", "n", "gram").agg(F.count("*").alias("c"))

    from pyspark.sql import Window

    w = Window.partitionBy("doc_id", "n").orderBy(F.desc("c"), F.asc("gram"))
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    chars = F.length("gram") * F.col("c")
    feats = ranked.groupBy("doc_id").agg(
        *[
            F.max(F.when((F.col("n") == n) & (F.col("_rn") == 1), chars)).alias(f"_t{n}")
            for n in top_ns
        ],
        *[
            F.sum(F.when((F.col("n") == n) & (F.col("c") > 1), chars)).alias(f"_d{n}")
            for n in dup_ns
        ],
    )
    out = base.select("doc_id", "_len").join(feats, "doc_id", "left")
    safe = F.when(F.col("_len") > 0, F.col("_len")).otherwise(F.lit(1)).cast("double")
    return out.select(
        "doc_id",
        *[
            F.round(F.coalesce(F.col(f"_t{n}"), F.lit(0)).cast("double") / safe, 6)
            .alias(f"top{n}gram_char_frac")
            for n in top_ns
        ],
        *[
            F.round(F.coalesce(F.col(f"_d{n}"), F.lit(0)).cast("double") / safe, 6)
            .alias(f"dup{n}gram_char_frac")
            for n in dup_ns
        ],
    )
