"""CrawlDb merger (J4) — ``crawl/CrawlDbMerger.java:81-118``.

Merge N crawldbs per URL: the datum with the highest
``calculateLastFetchTime`` wins (0 for db_unfetched,
fetchTime - interval*1000 otherwise, AbstractFetchSchedule.java:163-170),
ties broken by higher fetchTime (isNewer, :107-111). Metadata is the
union across inputs with the newer datum's values taking precedence
(:92-98) — re-expressed as a fetch-time-ordered array of maps folded
with last-wins map_concat.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.operators.schedules import calculate_last_fetch_time
from nutch_spark.schema import STATUS_DB_UNFETCHED

from nutch_spark.schema import EMPTY_META_EXPR as _EMPTY_MAP


def merge_crawldbs(dbs: list[DataFrame], cfg: NutchConfig) -> DataFrame:
    assert dbs, "need at least one crawldb"
    unioned = reduce(
        lambda a, b: a.unionByName(b),
        # ordinal for the total tie-break below: the reference's isNewer
        # is strict, so on a full (lastFetchTime, fetchTime) tie the
        # first-iterated datum keeps the slot — emulated as "first db in
        # arg order wins" (negated ordinal inside max_by), then the
        # non-map datum fields, so replay is deterministic under any
        # partitioning (same policy as merge_segments below)
        [d.withColumn("_nord", F.lit(-i)) for i, d in enumerate(dbs)],
    )
    lft = calculate_last_fetch_time(
        F.col("status"), F.col("fetch_time"), F.col("fetch_interval"), STATUS_DB_UNFETCHED
    )
    unioned = unioned.withColumn("_lft", lft)

    data_cols = [c for c in unioned.columns if c not in ("url", "_nord")]
    datum = F.struct(*data_cols)
    orderable = F.struct(
        *[c for c, t in unioned.dtypes if c in data_cols and not t.startswith("map")]
    )
    # metadata union, newer (by fetch_time) wins: structs holding maps are
    # not orderable, so sort (ft, entry-array) structs and rebuild the map
    # with LAST_WIN dedup (map_from_entries honors spark.sql.mapKeyDedupPolicy)
    # precedence must follow the same (lastFetchTime, fetchTime) order
    # that picks the winning datum (isNewer, :107-111) — sorting by
    # fetch_time alone would let an unfetched-but-recent loser's
    # metadata override the fetched winner's; the (_nord, orderable)
    # tail keeps the fold order total on ties, matching the winner
    meta_entries = F.struct(
        F.col("_lft").alias("lft"),
        F.col("fetch_time").alias("ft"),
        F.col("_nord").alias("nord"),
        orderable.alias("d"),
        F.map_entries(F.coalesce(F.col("metadata"), F.expr(_EMPTY_MAP))).alias("entries"),
    )
    agg = unioned.groupBy("url").agg(
        F.max_by(
            datum, F.struct(F.col("_lft"), F.col("fetch_time"), F.col("_nord"), orderable)
        ).alias("best"),
        F.map_from_entries(
            F.flatten(
                F.transform(F.array_sort(F.collect_list(meta_entries)), lambda s: s["entries"])
            )
        ).alias("merged_meta"),
    )
    def out_col(c):
        if c == "url":
            return F.col("url")
        if c == "metadata":
            return F.col("merged_meta").alias("metadata")
        return F.col("best." + c).alias(c)

    return agg.select(*[out_col(c) for c in dbs[0].columns])


def merge_segments(segments: list[DataFrame], slice_size: int | None = None) -> DataFrame:
    """Segment merger (J7, ``segment/SegmentMerger.java:1-811``): union N
    segments' datum rows; per URL the row from the *latest generation*
    wins (max gen_time, tie-break max fetch_time — the merger's
    "newest segment wins" rule). ``slice_size`` re-slices the output
    into numbered slices like ``-slice`` (segment_id = row-hash bucket,
    cheap stand-in for the output-size slicing).
    """
    # total tie-break beyond (gen_time, fetch_time): the per-segment
    # ordinal (the reference breaks ties by segment name order — later
    # segment wins), then the non-map datum fields, so re-merging
    # already-merged slices is replay-deterministic
    unioned = reduce(
        lambda a, b: a.unionByName(b),
        [s.withColumn("_seg_ord", F.lit(i)) for i, s in enumerate(segments)],
    )
    data_cols = [c for c in unioned.columns if c not in ("url", "_seg_ord")]
    datum = F.struct(*data_cols)
    orderable = F.struct(
        *[c for c, t in unioned.dtypes if c in data_cols and not t.startswith("map")]
    )
    out = unioned.groupBy("url").agg(
        F.max_by(
            datum,
            F.struct(
                F.coalesce("gen_time", F.lit(0)).alias("g"),
                F.col("fetch_time"),
                F.col("_seg_ord"),
                orderable.alias("d"),
            ),
        ).alias("best")
    )
    cols = [F.col("url")] + [F.col("best." + c).alias(c) for c in data_cols]
    out = out.select(*cols)
    if slice_size:
        out = out.withColumn(
            "slice_id", F.pmod(F.xxhash64("url"), F.lit(slice_size)).cast("int")
        )
    return out


def merge_crawl_fetch(segments: list[DataFrame]) -> DataFrame:
    """crawl_fetch part resolution (``SegmentMerger.java:478-494``,
    ported TestSegmentMergerCrawlDatums): only real fetch statuses
    count — ``fetch_retry`` and ``fetch_notmodified`` are ignored
    (NUTCH-1520, NUTCH-1113) and ``linked`` discovery datums never
    clobber a fetch — and among the eligible datums the one from the
    latest segment (name order = our ordinal) wins. URLs with no
    eligible datum in any segment drop out of the merged crawl_fetch.

    Same single-shuffle shape as :func:`merge_segments`: the
    eligibility filter is map-side, then one ``groupBy(url).max_by``.
    """
    from nutch_spark.schema import (
        STATUS_FETCH_GONE,
        STATUS_FETCH_REDIR_PERM,
        STATUS_FETCH_REDIR_TEMP,
        STATUS_FETCH_SUCCESS,
    )

    # the fetch-status whitelist IS the retry/notmodified exclusion
    # (hasFetchStatus minus the two NUTCH-1520/1113 statuses)
    eligible = F.col("status").isin(
        STATUS_FETCH_SUCCESS,
        STATUS_FETCH_GONE,
        STATUS_FETCH_REDIR_TEMP,
        STATUS_FETCH_REDIR_PERM,
    )
    unioned = reduce(
        lambda a, b: a.unionByName(b),
        [s.withColumn("_seg_ord", F.lit(i)) for i, s in enumerate(segments)],
    ).filter(eligible)
    data_cols = [c for c in unioned.columns if c not in ("url", "_seg_ord")]
    # two eligible datums inside ONE segment: the reference keeps the
    # last in stream order, which a DataFrame doesn't carry — break the
    # tie totally on the non-map datum fields instead (documented
    # deviation, same policy as merge_segments) so replay is
    # deterministic under any partitioning
    orderable = F.struct(
        *[c for c, t in unioned.dtypes if c in data_cols and not t.startswith("map")]
    )
    out = unioned.groupBy("url").agg(
        F.max_by(
            F.struct(*data_cols), F.struct(F.col("_seg_ord"), orderable)
        ).alias("best")
    )
    return out.select("url", *[F.col("best." + c).alias(c) for c in data_cols])
