"""Depth-limited crawling — the scoring-depth plugin (§2.9 scoring
extension point).

Re-expresses ``scoring-depth/.../DepthScoringFilter.java`` over the
segment flow: every datum carries ``_depth_`` (hops from a seed,
injected = 1) and ``_maxdepth_`` metadata; a page whose depth has
reached its maxdepth contributes **no** outlinks
(``DepthScoringFilter.distributeScoreToOutlinks``, :92-140), every
surviving outlink is stamped with depth+1 (:128-138), and the
generator sort value is boosted by remaining depth:
``sort * (1 + maxdepth - depth)`` (:144-164).

Spark shape:
- ``inject_depth_meta``: map-only metadata stamp on the crawldb
  (injectedScore, :188-204) — seeds may override ``_maxdepth_`` per
  URL via seed-list metadata, and ``scoring.depth.override.pattern``
  re-stamps matching URLs (:78-87 + :109-120).
- ``depth_gate_outlinks``: one segment-scale join of link rows to
  their parent datum on ``from_url`` (the reference reads the parent
  depth from parse data; here the parent fetch datum carries it) —
  gate + stamp, no frontier-scale work.
- ``patch_new_url_depth``: newly discovered URLs take
  ``min(parent depth) + 1`` over all their in-segment parents —
  a deterministic BFS depth. *Documented deviation:* the reference
  takes the depth stamped by whichever linked datum its priority
  queue ranks first (top score); min-depth is order-independent
  (replay invariant) and is the tighter bound, so a URL is never
  retired earlier than the reference would retire it.
- ``depth_sort_value``: the generate-time boost, pure JVM columns.

Existing URLs keep their depth: the keep-old and success state-machine
paths carry old/fetch metadata through ``updatedb`` untouched, exactly
as the reference preserves datum metadata.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.schema import STATUS_LINKED

DEPTH_KEY = "_depth_"
MAX_DEPTH_KEY = "_maxdepth_"


def _int_meta(meta: Column, key: str, default: Column) -> Column:
    return F.coalesce(F.element_at(meta, key).cast("int"), default)


def inject_depth_meta(db: DataFrame, cfg: NutchConfig) -> DataFrame:
    """injectedScore: ``_depth_`` = 1, ``_maxdepth_`` = seed-provided
    value, else override pattern, else ``scoring.depth.max``."""
    meta = F.col("metadata")
    max_depth = _int_meta(meta, MAX_DEPTH_KEY, F.lit(cfg.scoring_depth_max))
    if cfg.scoring_depth_override_pattern:
        max_depth = F.when(
            F.col("url").rlike(cfg.scoring_depth_override_pattern),
            F.lit(cfg.scoring_depth_max_override),
        ).otherwise(max_depth)
    return db.withColumn(
        "metadata",
        F.map_concat(
            F.map_filter(meta, lambda k, _: ~k.isin(DEPTH_KEY, MAX_DEPTH_KEY)),
            F.map_from_arrays(
                F.array(F.lit(DEPTH_KEY), F.lit(MAX_DEPTH_KEY)),
                F.array(
                    _int_meta(meta, DEPTH_KEY, F.lit(1)).cast("string"),
                    max_depth.cast("string"),
                ),
            ),
        ),
    )


def depth_gate_outlinks(
    crawl_parse: DataFrame, parents: DataFrame, cfg: NutchConfig
) -> DataFrame:
    """Drop link rows whose parent is at its depth limit; stamp
    survivors with ``_depth_`` = parent+1 and the parent's
    ``_maxdepth_``. ``parents``: (url, metadata) of the fetched datums
    (the fetchlist carries the crawldb metadata through the segment).
    Non-link rows pass through untouched."""
    is_link = F.col("status") == STATUS_LINKED
    links = crawl_parse.filter(is_link)
    rest = crawl_parse.filter(~is_link)

    p = parents.select(
        F.col("url").alias("_p_url"),
        _int_meta(F.col("metadata"), DEPTH_KEY, F.lit(cfg.scoring_depth_max)).alias(
            "_p_depth"
        ),
        _int_meta(
            F.col("metadata"), MAX_DEPTH_KEY, F.lit(cfg.scoring_depth_max)
        ).alias("_p_max"),
    )
    if cfg.scoring_depth_override_pattern:
        p = p.withColumn(
            "_p_max",
            F.when(
                F.col("_p_url").rlike(cfg.scoring_depth_override_pattern),
                F.lit(cfg.scoring_depth_max_override),
            ).otherwise(F.col("_p_max")),
        )

    gated = (
        # INNER join is deliberate: a parent absent from ``parents`` has
        # unknown depth, and the reference drops ALL outlinks of a page
        # with missing depth metadata (DepthScoringFilter.java:96-100
        # "Missing depth, removing all outlinks") — same with _int_meta's
        # default below: depth==max fails the gate
        links.join(p, links["from_url"] == p["_p_url"], "inner")
        .filter(F.col("_p_depth") < F.col("_p_max"))
        .withColumn(
            "metadata",
            F.map_concat(
                F.col("metadata"),
                F.map_from_arrays(
                    F.array(F.lit(DEPTH_KEY), F.lit(MAX_DEPTH_KEY)),
                    F.array(
                        (F.col("_p_depth") + 1).cast("string"),
                        F.col("_p_max").cast("string"),
                    ),
                ),
            ),
        )
        .drop("_p_url", "_p_depth", "_p_max")
    )
    return rest.unionByName(gated.select(*rest.columns))


def patch_new_url_depth(
    merged: DataFrame,
    old_db: DataFrame | None,
    segment_rows: DataFrame,
    cfg: NutchConfig,
) -> DataFrame:
    """After ``updatedb``: newly discovered URLs (absent from the old
    crawldb) receive ``_depth_`` = min over the *stamped* depths of
    their in-segment link rows — the link aggregation in updatedb is
    metadata-free by design (orderable structs), so depth rides
    alongside in one extra segment-scale aggregation. A new URL whose
    link rows carry no depth at all (redirect targets: the fetcher's
    STATUS_LINKED datum has empty metadata) falls back to depth 1 with
    the default maxdepth — exactly ``DepthScoringFilter.initialScore``
    (:174-186), which the reference reducer applies to any new page."""
    is_link = F.col("status") == STATUS_LINKED
    has_depth = F.element_at(F.col("metadata"), DEPTH_KEY).isNotNull()
    dm = F.struct(
        F.element_at(F.col("metadata"), DEPTH_KEY).cast("int").alias("d"),
        _int_meta(F.col("metadata"), MAX_DEPTH_KEY, F.lit(cfg.scoring_depth_max)).alias("mx"),
    )
    link_depth = (
        segment_rows.filter(is_link)
        .select("url", F.when(has_depth, dm).alias("dm"))
        .groupBy("url")
        .agg(F.min("dm").alias("dm"))  # min stamped depth; null if none
        .select(
            "url",
            F.col("dm.d").alias("_l_depth"),
            F.col("dm.mx").alias("_l_max"),
            F.lit(True).alias("_l_seen"),
        )
    )
    if old_db is not None:
        link_depth = link_depth.join(old_db.select("url"), "url", "left_anti")
    patched = (
        merged.join(link_depth, "url", "left")
        .withColumn(
            "metadata",
            F.when(
                F.col("_l_seen").isNotNull()
                & F.element_at(F.col("metadata"), DEPTH_KEY).isNull(),
                F.map_concat(
                    F.col("metadata"),
                    F.map_from_arrays(
                        F.array(F.lit(DEPTH_KEY), F.lit(MAX_DEPTH_KEY)),
                        F.array(
                            F.coalesce(F.col("_l_depth"), F.lit(1)).cast("string"),
                            F.coalesce(
                                F.col("_l_max"), F.lit(cfg.scoring_depth_max)
                            ).cast("string"),
                        ),
                    ),
                ),
            ).otherwise(F.col("metadata")),
        )
        .drop("_l_depth", "_l_max", "_l_seen")
    )
    return patched


def depth_sort_value(sort: Column, meta: Column, cfg: NutchConfig) -> Column:
    """generatorSortValue (:144-164): boost by remaining depth budget;
    a datum with no depth metadata is penalized to zero remaining
    (curDepth = curMaxDepth)."""
    max_depth = _int_meta(meta, MAX_DEPTH_KEY, F.lit(cfg.scoring_depth_max))
    depth = _int_meta(meta, DEPTH_KEY, max_depth)
    return (sort * (F.lit(1) + (max_depth - depth)).cast("float")).cast("float")
