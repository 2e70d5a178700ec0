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

from pyspark.sql import DataFrame
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
            F.col("metadata"),
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
