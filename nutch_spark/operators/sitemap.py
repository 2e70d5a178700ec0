"""SitemapProcessor (``util/SitemapProcessor.java:86-360``): parse
sitemap.xml / sitemap-index XML into CrawlDatum rows and merge them
into the CrawlDb.

Spark-first re-expression:

- XML parsing stays in the JVM: per-entry ``<url>...</url>`` blocks are
  isolated with ``regexp_extract_all`` (fields inside an entry are
  optional, so positional ``xpath()`` arrays over the whole document
  would mis-align), then each block is read with ``xpath_string`` —
  no Python in the parse path.
- The priority / changefreq / lastmod -> datum mapping mirrors
  ``SitemapProcessor.java:266-288`` (changefreq table verbatim;
  priority default 0.5 per crawler-commons; missing changefreq keeps
  the configured default interval — the reference leaves the datum's
  zero default and lets later updatedb passes repair it, a wart we
  do not reproduce).
- ``strict`` keeps only locs under the sitemap's base directory
  (crawler-commons ``SiteMapURL.isValid`` cross-submission check).
- The merge mirrors ``SitemapReducer`` (:325-360): existing crawldb
  rows always win (with ``overwrite=True`` — "DO NOT ENABLE" in the
  reference — score/interval/modified are copied over); new urls enter
  as ``db_unfetched``.

Scale: parsing is a map-side transform over (sitemap_url, content);
the merge is one full-outer join on url — same shuffle shape as inject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.schema import STATUS_DB_UNFETCHED

# SitemapProcessor.java:271-281
CHANGEFREQ_INTERVALS: dict[str, int] = {
    "always": 1,
    "hourly": 3600,
    "daily": 86400,
    "weekly": 604800,
    "monthly": 2592000,
    "yearly": 31536000,
    "never": (1 << 31) - 1,
}

DEFAULT_PRIORITY = 0.5  # crawler-commons SiteMapURL default


def _xp(block: Column, tag: str) -> Column:
    """Text of <tag> inside one wrapped entry block; NULL when absent."""
    v = F.xpath_string(block, F.lit(f"/url/{tag}"))
    return F.when(v == "", F.lit(None).cast("string")).otherwise(v)


def _interval_col(changefreq: Column, default_interval: int) -> Column:
    expr = None
    for name, secs in CHANGEFREQ_INTERVALS.items():
        c = F.lower(changefreq) == name
        expr = F.when(c, secs) if expr is None else expr.when(c, secs)
    return expr.otherwise(F.lit(default_interval)).cast("int")


def _lastmod_ms(lastmod: Column) -> Column:
    """W3C datetime -> epoch ms; date-only values are midnight UTC;
    missing/unparseable -> 0 (CrawlDatum modified default)."""
    ts = F.coalesce(
        # date-only first, pinned to UTC midnight (W3C sitemap dates are
        # timezone-less; session-timezone parsing would drift the epoch)
        F.try_to_timestamp(F.concat(lastmod, F.lit("T00:00:00+00:00"))),
        F.try_to_timestamp(lastmod),
    )
    return F.coalesce(F.unix_millis(ts), F.lit(0).cast("long"))


def parse_sitemaps(
    content: DataFrame,
    cfg: NutchConfig,
    *,
    strict: bool = True,
    url_col: str = "sitemap_url",
    content_col: str = "content",
) -> tuple[DataFrame, DataFrame]:
    """Parse fetched sitemap documents.

    ``content``: (sitemap_url, content) — the raw XML text.

    Returns ``(entries, index_refs)``:
    - entries: (url, score, fetch_interval, modified_time) datum fields
      for every <urlset> entry (SitemapProcessor.java:256-288);
    - index_refs: (sitemap_url) child sitemaps from <sitemapindex>
      files, for the caller to fetch and feed back in (the reference
      recurses inline, :294-308 — one level per pass here).
    """
    c = F.col(content_col)
    is_index = c.contains("<sitemapindex")

    urlset = content.filter(~is_index)
    blocks = F.regexp_extract_all(c, F.lit(r"(?s)<url>(.*?)</url>"), 1)
    e = urlset.select(
        F.col(url_col).alias("_sm_url"),
        F.explode(blocks).alias("_raw"),
    ).withColumn("_block", F.concat(F.lit("<url>"), F.col("_raw"), F.lit("</url>")))
    loc = _xp(F.col("_block"), "loc")
    entries = e.select(
        F.col("_sm_url"),
        loc.alias("url"),
        F.coalesce(
            _xp(F.col("_block"), "priority").cast("float"),
            F.lit(DEFAULT_PRIORITY).cast("float"),
        ).alias("score"),
        _interval_col(
            _xp(F.col("_block"), "changefreq"), cfg.db_fetch_interval_default
        ).alias("fetch_interval"),
        _lastmod_ms(_xp(F.col("_block"), "lastmod")).alias("modified_time"),
    ).filter(F.col("url").isNotNull())
    if strict:
        # cross-submission check: loc must live under the sitemap's
        # base directory (SiteMapURL.isValid)
        base = F.regexp_extract("_sm_url", r"^(.*/)[^/]*$", 1)
        entries = entries.filter(F.col("url").startswith(base))
    entries = entries.drop("_sm_url")

    idx = content.filter(is_index)
    iblocks = F.regexp_extract_all(c, F.lit(r"(?s)<sitemap>(.*?)</sitemap>"), 1)
    index_refs = (
        idx.select(F.explode(iblocks).alias("_raw"))
        .select(
            F.xpath_string(
                F.concat(F.lit("<url>"), F.col("_raw"), F.lit("</url>")),
                F.lit("/url/loc"),
            ).alias("sitemap_url")
        )
        .filter(F.col("sitemap_url") != "")
    )
    return entries, index_refs


def sitemap_merge(
    crawldb: DataFrame,
    entries: DataFrame,
    cfg: NutchConfig,
    now_ms: int,
    *,
    overwrite: bool = False,
) -> DataFrame:
    """SitemapReducer (:325-360): full-outer merge on url. Existing rows
    pass through (overwrite=True copies the sitemap's score / interval /
    modified onto them); new urls become db_unfetched datums fetchable
    now. Deterministic per-url dedup of entries (best by score, then
    interval, then modified, then url — the reference keeps an arbitrary
    'last' of equal keys)."""
    best = entries.groupBy("url").agg(
        F.max_by(
            F.struct("score", "fetch_interval", "modified_time"),
            F.struct("score", "fetch_interval", "modified_time"),
        ).alias("sm")
    )
    old = crawldb.alias("o")
    joined = old.join(best.alias("s"), "url", "full_outer")
    has_old = F.col("o.status").isNotNull()

    def merged(col_name: str, sm_col: Column, new_col: Column) -> Column:
        if overwrite:
            existing = F.coalesce(sm_col, F.col(f"o.{col_name}"))
        else:
            existing = F.col(f"o.{col_name}")
        return F.when(has_old, existing).otherwise(new_col)

    out_cols = [F.col("url")]
    for c in crawldb.columns:
        if c == "url":
            continue
        if c == "status":
            col = F.when(has_old, F.col("o.status")).otherwise(
                F.lit(STATUS_DB_UNFETCHED).cast("int")
            )
        elif c == "score":
            col = merged("score", F.col("s.sm.score"), F.col("s.sm.score"))
        elif c == "fetch_interval":
            col = merged(
                "fetch_interval", F.col("s.sm.fetch_interval"), F.col("s.sm.fetch_interval")
            )
        elif c == "modified_time":
            col = merged(
                "modified_time", F.col("s.sm.modified_time"), F.col("s.sm.modified_time")
            )
        elif c == "fetch_time":
            col = F.when(has_old, F.col("o.fetch_time")).otherwise(
                F.lit(now_ms).cast("long")
            )
        else:
            # new urls get fresh-datum defaults (SitemapProcessor builds a
            # new CrawlDatum, not nulls): retries=0, empty metadata,
            # modified_time=0; signature/gen_time/repr_url legitimately null
            if c == "retries":
                new_val = F.lit(0).cast("int")
            elif c == "metadata":
                new_val = F.expr("map()").cast("map<string,string>")
            elif c == "modified_time":
                new_val = F.lit(0).cast("long")
            else:
                new_val = F.lit(None)
            col = F.when(has_old, F.col(f"o.{c}")).otherwise(new_val)
        out_cols.append(col.alias(c))
    return joined.select(*out_cols)
