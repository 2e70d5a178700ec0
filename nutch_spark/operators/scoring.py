"""Scoring-filter plugins beyond OPIC/LinkRank/depth (§2.9 scoring
extension point): scoring-orphan and scoring-similarity.

- scoring-orphan (``scoring-orphan/.../OrphanScoringFilter.java:60-103``):
  during the CrawlDb update, a page with inlinks gets its last-seen
  stamp (metadata ``_orphan_`` = unix seconds) refreshed; a page
  without inlinks whose stamp has aged past ``mark.orphan.after`` is
  set db_orphan (permanent delete candidate), past ``mark.gone.after``
  db_gone (index removal). The reference checks orphan FIRST — with the
  default gone<orphan spans a page passes through gone before orphan —
  replicated exactly.

- scoring-similarity (``scoring-similarity/.../cosine/Model.java`` +
  ``CosineSimilarity.java:40-63``): focused-crawl priority = cosine
  similarity between the page's term-frequency vector and a broadcast
  gold-standard profile (lowercased standard tokens, stopwords
  dropped). Documented deviation: no Porter stemming (a Lucene
  tokenizer detail; the profile is plain TF here), matching this repo's
  JEXL→Spark-SQL substitution policy.

Scale: orphan is one url-keyed join (inlink counts from the linkdb
side, partial-aggregated before the shuffle); similarity is one
explode + one hash aggregation with the gold vector folded in as a
broadcast map literal — no Python anywhere.
"""

from __future__ import annotations

import math
import re
from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.schema import STATUS_DB_GONE, STATUS_DB_ORPHAN

ORPHAN_KEY = "_orphan_"
DEFAULT_GONE_AFTER = 30 * 24 * 3600
DEFAULT_ORPHAN_AFTER = 40 * 24 * 3600


def orphan_update(
    crawldb: DataFrame,
    inlink_counts: DataFrame,
    now_s: int,
    *,
    gone_after: int = DEFAULT_GONE_AFTER,
    orphan_after: int = DEFAULT_ORPHAN_AFTER,
) -> DataFrame:
    """Apply OrphanScoringFilter.updateDbScore to every crawldb row.

    ``inlink_counts``: (url, n_inlinks) — any row present with
    n_inlinks > 0 counts as "has inlinks this update".
    """
    joined = crawldb.join(
        inlink_counts.select("url", "n_inlinks"), "url", "left"
    )
    has_inlinks = F.coalesce(F.col("n_inlinks"), F.lit(0)) > 0
    last_seen = F.element_at(F.col("metadata"), ORPHAN_KEY).cast("long")
    elapsed = F.lit(now_s) - last_seen
    new_status = (
        F.when(has_inlinks, F.col("status"))
        .when(last_seen.isNull(), F.col("status"))
        .when(elapsed > orphan_after, F.lit(STATUS_DB_ORPHAN).cast("int"))
        .when(elapsed > gone_after, F.lit(STATUS_DB_GONE).cast("int"))
        .otherwise(F.col("status"))
    )
    new_meta = F.when(
        has_inlinks,
        F.map_concat(
            # NULL metadata would null the whole map_concat and the
            # last-seen stamp would never be recorded
            F.coalesce(F.col("metadata"), F.expr("map()").cast("map<string,string>")),
            F.create_map(F.lit(ORPHAN_KEY), F.lit(str(now_s))),
        ),
    ).otherwise(F.col("metadata"))
    return (
        joined.withColumn("status", new_status)
        .withColumn("metadata", new_meta)
        .drop("n_inlinks")
    )


_TOKEN_RE = r"[a-z0-9]+"


def _term_freqs(text: str, stopwords: frozenset[str]) -> dict[str, int]:
    tf: dict[str, int] = {}
    for w in re.findall(_TOKEN_RE, text.lower()):
        if w not in stopwords:
            tf[w] = tf.get(w, 0) + 1
    return tf


def similarity_scores(
    parse_text: DataFrame,
    gold_text: str,
    *,
    stopwords: tuple[str, ...] = (),
    text_col: str = "text",
) -> DataFrame:
    """(url, score) — cosine similarity of each page against the gold
    standard, Model.computeCosineSimilarity semantics: dot product over
    shared terms / (||doc|| * ||gold||); 0 when either vector is empty.

    The gold TF vector is compiled driver-side (it is one document) and
    folded into the plan as a map literal; the document side is one
    explode + one (url, word) hash aggregation + one url rollup.
    """
    stop = frozenset(w.lower() for w in stopwords)
    gold = _term_freqs(gold_text, stop)
    gold_norm = math.sqrt(sum(v * v for v in gold.values()))

    words = F.expr(f"regexp_extract_all(lower({text_col}), '{_TOKEN_RE}', 0)")
    if stop:
        stop_arr = F.array(*[F.lit(w) for w in sorted(stop)])
        words = F.filter(words, lambda w: ~F.array_contains(stop_arr, w))
    tokens = parse_text.select("url", F.explode(words).alias("word"))
    counts = tokens.groupBy("url", "word").agg(F.count("*").alias("tf"))

    if gold:
        gold_map = F.create_map(
            *chain.from_iterable(
                (F.lit(k), F.lit(float(v))) for k, v in sorted(gold.items())
            )
        )
    else:
        gold_map = F.expr("map()").cast("map<string,double>")
    gtf = F.coalesce(F.element_at(gold_map, F.col("word")), F.lit(0.0))
    per_url = counts.groupBy("url").agg(
        F.sum(F.col("tf") * gtf).alias("dot"),
        F.sum(F.col("tf") * F.col("tf")).alias("norm2"),
    )
    denom = F.sqrt(F.col("norm2").cast("double")) * F.lit(gold_norm)
    score = F.when(denom > 0, F.col("dot") / denom).otherwise(F.lit(0.0))
    out = parse_text.select("url").join(per_url, "url", "left")
    return out.select(
        "url",
        F.round(F.coalesce(score, F.lit(0.0)), 6).alias("score"),
    )


# ---------------------------------------------------------------------------
# scoring-link (LinkAnalysisScoringFilter.java:32-81): take page scores
# from link analysis (webgraph LinkRank / ScoreUpdater in this repo)
# instead of OPIC distribution. New pages start at 0; the generator
# sort is score * initSort (same expression as OPIC); the indexer boost
# is a plain normalization factor times the db score, NOT the OPIC
# pow(score, indexer.score.power) damping.
# ---------------------------------------------------------------------------

LINK_INITIAL_SCORE = 0.0


def link_generator_sort(score: Column, init_sort: Column | float) -> Column:
    """LinkAnalysisScoringFilter.generatorSortValue:47-50."""
    return score * init_sort


def link_indexer_score(
    db_score: Column,
    init_score: Column | float = 1.0,
    *,
    normalized_score: float = 1.0,
) -> Column:
    """LinkAnalysisScoringFilter.indexerScore:53-60 — null db row keeps
    the incoming initScore, else ``link.analyze.normalize.score`` *
    score."""
    return F.coalesce(
        F.lit(float(normalized_score)) * db_score,
        init_score if isinstance(init_score, Column) else F.lit(float(init_score)),
    )


def opic_indexer_score(
    db_score: Column,
    init_score: Column | float = 1.0,
    *,
    score_power: float = 0.5,
) -> Column:
    """OPICScoringFilter.indexerScore:176-183 — pow(score, power) *
    initScore damping (``indexer.score.power`` default 0.5)."""
    init = init_score if isinstance(init_score, Column) else F.lit(float(init_score))
    return F.coalesce(F.pow(db_score, F.lit(score_power)) * init, init)


# ---------------------------------------------------------------------------
# scoring-metadata (MetadataScoringFilter.java:43-147): configured keys
# ride the datum -> content -> parse metadata chain, and parse keys are
# stamped onto every outlink datum. In this engine content and parse
# metadata are map columns on the same parse row, so the two pass-*
# hooks collapse to one map merge; the outlink hop is the same
# segment-scale join the urlmeta plugin uses.
# ---------------------------------------------------------------------------


def metadata_to_parse(
    df: DataFrame,
    keys: list[str],
    *,
    datum_meta: str = "metadata",
    parse_meta: str = "parse_metadata",
) -> DataFrame:
    """passScoreBeforeParsing:95-108 + passScoreAfterParsing:118-130
    fused: copy each configured key present in the datum metadata into
    the parse metadata (copied value wins, as the reference's set()
    overwrites)."""
    if not keys:
        return df
    key_arr = F.array(*[F.lit(k) for k in keys])
    copied = F.map_filter(
        F.map_from_arrays(
            key_arr,
            F.transform(key_arr, lambda k: F.element_at(F.col(datum_meta), k)),
        ),
        lambda _, v: v.isNotNull(),
    )
    merged = F.map_concat(
        F.coalesce(F.col(parse_meta), F.expr("map()").cast("map<string,string>")),
        copied,
    )  # LAST_WIN session policy => copied overwrites
    return df.withColumn(parse_meta, merged)


def metadata_to_outlinks(
    crawl_parse: DataFrame, parse_meta: DataFrame, keys: list[str]
) -> DataFrame:
    """distributeScoreToOutlinks:62-84 — every outlink datum inherits
    the configured parse-metadata keys of its source page. Delegates to
    the urlmeta join (identical shape: one from_url-keyed join over the
    segment's link rows only).

    ``parse_meta``: (url, parse_metadata) of the parsed pages.
    """
    from nutch_spark.operators.urlmeta import propagate_url_meta

    parents = parse_meta.select(
        "url", F.col("parse_metadata").alias("metadata")
    )
    return propagate_url_meta(crawl_parse, parents, keys)
