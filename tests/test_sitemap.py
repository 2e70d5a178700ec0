"""SitemapProcessor port (util/SitemapProcessor.java): XML parsing
(urlset + sitemapindex), changefreq/priority/lastmod mapping, strict
cross-submission check, and the crawldb merge rules."""

from pyspark.sql import functions as F

from nutch_spark import schema as S
from nutch_spark.config import NutchConfig
from nutch_spark.operators.sitemap import parse_sitemaps, sitemap_merge

CFG = NutchConfig()
NOW = 1_706_000_000_000

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://h1.example.com/a</loc>
    <lastmod>2024-01-15</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.75</priority>
  </url>
  <url><loc>http://h1.example.com/b</loc></url>
  <url>
    <loc>http://h1.example.com/c</loc>
    <changefreq>NEVER</changefreq>
  </url>
  <url><loc>http://evil.example.com/x</loc></url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://h2.example.com/sitemap_a.xml</loc></sitemap>
  <sitemap><loc>http://h2.example.com/sitemap_b.xml</loc></sitemap>
</sitemapindex>
"""


def content_df(spark, rows):
    return spark.createDataFrame(rows, "sitemap_url string, content string")


def test_parse_urlset_fields(spark):
    entries, refs = parse_sitemaps(
        content_df(spark, [("http://h1.example.com/sitemap.xml", URLSET)]), CFG
    )
    assert refs.count() == 0
    got = {r["url"]: r for r in entries.collect()}
    # strict: the cross-host loc is dropped (SiteMapURL.isValid)
    assert set(got) == {
        "http://h1.example.com/a",
        "http://h1.example.com/b",
        "http://h1.example.com/c",
    }
    a = got["http://h1.example.com/a"]
    assert a["score"] == 0.75
    assert a["fetch_interval"] == 86400  # daily
    assert a["modified_time"] == 1705276800000  # 2024-01-15T00:00:00Z
    b = got["http://h1.example.com/b"]
    assert b["score"] == 0.5  # crawler-commons default priority
    assert b["fetch_interval"] == CFG.db_fetch_interval_default
    assert b["modified_time"] == 0
    c = got["http://h1.example.com/c"]
    assert c["fetch_interval"] == (1 << 31) - 1  # NEVER, case-insensitive


def test_parse_non_strict_keeps_cross_host(spark):
    entries, _ = parse_sitemaps(
        content_df(spark, [("http://h1.example.com/sitemap.xml", URLSET)]),
        CFG,
        strict=False,
    )
    assert entries.filter(F.col("url") == "http://evil.example.com/x").count() == 1


def test_parse_sitemap_index(spark):
    entries, refs = parse_sitemaps(
        content_df(spark, [("http://h2.example.com/sitemap.xml", INDEX)]), CFG
    )
    assert entries.count() == 0
    assert sorted(r["sitemap_url"] for r in refs.collect()) == [
        "http://h2.example.com/sitemap_a.xml",
        "http://h2.example.com/sitemap_b.xml",
    ]


def _crawldb(spark):
    return spark.createDataFrame(
        [("http://h1.example.com/a", S.STATUS_DB_FETCHED, 111, 0, 2592000, 2.0, None,
          42, {}, None, None)],
        "url string, status int, fetch_time long, retries int, fetch_interval int,"
        " score float, signature string, modified_time long,"
        " metadata map<string,string>, gen_time long, repr_url string",
    )


def test_merge_existing_wins_new_unfetched(spark):
    entries, _ = parse_sitemaps(
        content_df(spark, [("http://h1.example.com/sitemap.xml", URLSET)]), CFG
    )
    out = {r["url"]: r for r in
           sitemap_merge(_crawldb(spark), entries, CFG, NOW).collect()}
    assert len(out) == 3
    # existing row untouched (overwrite=False — the reference default)
    a = out["http://h1.example.com/a"]
    assert (a["status"], a["score"], a["fetch_interval"], a["modified_time"],
            a["fetch_time"]) == (S.STATUS_DB_FETCHED, 2.0, 2592000, 42, 111)
    # new urls enter as db_unfetched with sitemap-provided fields
    b = out["http://h1.example.com/b"]
    assert b["status"] == S.STATUS_DB_UNFETCHED
    assert b["fetch_time"] == NOW and b["score"] == 0.5
    c = out["http://h1.example.com/c"]
    assert c["fetch_interval"] == (1 << 31) - 1


def test_merge_overwrite_copies_sitemap_fields(spark):
    entries, _ = parse_sitemaps(
        content_df(spark, [("http://h1.example.com/sitemap.xml", URLSET)]), CFG
    )
    out = {r["url"]: r for r in
           sitemap_merge(_crawldb(spark), entries, CFG, NOW, overwrite=True).collect()}
    a = out["http://h1.example.com/a"]
    # SitemapReducer:344-348 with overwrite: score/interval/modified copied
    assert (a["score"], a["fetch_interval"], a["modified_time"]) == (
        0.75, 86400, 1705276800000)
    assert a["status"] == S.STATUS_DB_FETCHED  # status still the original


def test_merge_new_urls_get_fresh_datum_defaults(spark):
    """SitemapProcessor builds a NEW CrawlDatum for unknown urls — so
    retries=0 (not null: updatedb's retry arithmetic would never
    exhaust a null counter), metadata={} (map_concat(null,..) nulls
    merges), modified_time=0."""
    entries, _ = parse_sitemaps(
        content_df(spark, [("http://h1.example.com/sitemap.xml", URLSET)]), CFG
    )
    out = {r["url"]: r for r in
           sitemap_merge(_crawldb(spark), entries, CFG, NOW).collect()}
    b = out["http://h1.example.com/b"]
    assert b["retries"] == 0
    assert b["metadata"] == {}
    assert b["modified_time"] == 0
    assert b["signature"] is None and b["gen_time"] is None
