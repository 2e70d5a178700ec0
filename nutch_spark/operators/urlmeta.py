"""urlmeta plugin — tag propagation from parent pages to outlinks.

Re-expresses ``urlmeta/.../URLMetaScoringFilter.java``: a configured
list of metadata keys (``urlmeta.tags``) is copied from the parent
datum onto every outlink datum at parse time
(``distributeScoreToOutlinks``, :71-99), so tags injected with the
seeds (e.g. a campaign id, a source label, a license class) ride along
the whole crawl frontier and reach the indexer.

Spark shape mirrors operators/depth.py (the depth plugin is the same
scoring-filter extension point):

- ``propagate_url_meta``: segment-scale join of link rows to their
  parent datum on ``from_url``; each configured key present on the
  parent is stamped into the link row's metadata (parent value wins
  over any pre-existing link value, as the reference overwrites).
- ``patch_new_url_meta``: updatedb's link aggregation is metadata-free
  (orderable structs), so newly discovered URLs take their tags from a
  deterministic per-key aggregation over their in-segment link rows —
  the **minimum** value per key. *Documented deviation:* the reference
  keeps whichever linked datum the reducer's priority queue ranks
  first; min-per-key is input-order-independent (replay invariant).

Existing URLs keep their tags through updatedb untouched (keep-old /
success metadata paths)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.schema import STATUS_LINKED


def propagate_url_meta(
    crawl_parse: DataFrame, parents: DataFrame, keys: list[str]
) -> DataFrame:
    """Stamp each configured key from the parent datum onto its link
    rows. ``parents``: (url, metadata) of the fetched datums. Non-link
    rows pass through untouched."""
    if not keys:
        return crawl_parse
    is_link = F.col("status") == STATUS_LINKED
    links = crawl_parse.filter(is_link)
    rest = crawl_parse.filter(~is_link)

    p = parents.select(
        F.col("url").alias("_p_url"), F.col("metadata").alias("_p_meta")
    )
    key_arr = F.array(*[F.lit(k) for k in keys])
    # parent value wins; keys absent on the parent are left as-is
    tag_map = F.map_filter(
        F.map_from_arrays(
            key_arr, F.transform(key_arr, lambda k: F.element_at("_p_meta", k))
        ),
        lambda _, v: v.isNotNull(),
    )
    stamped = (
        links.join(p, links["from_url"] == p["_p_url"], "left")
        .withColumn(
            "metadata",
            F.when(
                F.col("_p_meta").isNotNull(),
                F.map_concat(
                    # drop only keys the parent actually provides (re-added
                    # from tag_map); configured keys ABSENT on the parent
                    # stay as-is on the link row
                    F.map_filter(
                        F.col("metadata"),
                        lambda k, _: F.element_at(tag_map, k).isNull(),
                    ),
                    tag_map,
                ),
            ).otherwise(F.col("metadata")),
        )
        .drop("_p_url", "_p_meta")
    )
    return rest.unionByName(stamped.select(*rest.columns))


def patch_new_url_meta(
    merged: DataFrame,
    old_db: DataFrame | None,
    segment_rows: DataFrame,
    keys: list[str],
) -> DataFrame:
    """After ``updatedb``: newly discovered URLs receive, for each
    configured key, the minimum value over their in-segment link rows
    (deterministic stand-in for the reference's top-ranked linked
    datum)."""
    if not keys:
        return merged
    is_link = F.col("status") == STATUS_LINKED
    agg = segment_rows.filter(is_link).groupBy("url").agg(
        *[
            F.min(F.element_at("metadata", F.lit(k))).alias(f"_t_{i}")
            for i, k in enumerate(keys)
        ]
    )
    if old_db is not None:
        agg = agg.join(old_db.select("url"), "url", "left_anti")
    tag_map = F.map_filter(
        F.map_from_arrays(
            F.array(*[F.lit(k) for k in keys]),
            F.array(*[F.col(f"_t_{i}") for i in range(len(keys))]),
        ),
        lambda _, v: v.isNotNull(),
    )
    patched = (
        merged.join(agg, "url", "left")
        .withColumn(
            "metadata",
            F.when(
                F.greatest(
                    *[F.col(f"_t_{i}").isNotNull() for i in range(len(keys))],
                    F.lit(False),
                    F.lit(False),
                ),
                F.map_concat(
                    # as in propagate_url_meta: only keys the link rows
                    # actually provide are replaced
                    F.map_filter(
                        F.col("metadata"),
                        lambda k, _: F.element_at(tag_map, k).isNull(),
                    ),
                    tag_map,
                ),
            ).otherwise(F.col("metadata")),
        )
        .drop(*[f"_t_{i}" for i in range(len(keys))])
    )
    return patched
