"""OutlinkExtractor: plain-text URL extraction in document order
(parse/OutlinkExtractor.java:56-120; TestOutlinkExtractor
expectations: scheme-ful URLs found, bare www. hosts skipped)."""

from nutch_spark.operators.parse import text_outlinks


def _links(spark, text, anchor=""):
    df = spark.createDataFrame([("http://p/", text)], "url string, text string")
    return [
        (r["pos"], r["to_url"], r["anchor"])
        for r in text_outlinks(df, anchor=anchor)
        .orderBy("pos")
        .collect()
    ]


def test_http_urls_in_order_bare_www_skipped(spark):
    got = _links(
        spark,
        "Start at http://crawl.example.org/index.html is it found? "
        "What about www.plain-host.net at http://tiefe.example.de "
        "A longer URL could be http://deep.example.com/sub/dir/page.html",
    )
    assert got == [
        (0, "http://crawl.example.org/index.html", ""),
        (1, "http://tiefe.example.de", ""),
        (2, "http://deep.example.com/sub/dir/page.html", ""),
    ]


def test_other_schemes_and_anchor_passthrough(spark):
    got = _links(
        spark,
        "Get ftp://files.example.org or mailto:me@example.org now",
        anchor="anchor-text",
    )
    assert got == [
        (0, "ftp://files.example.org", "anchor-text"),
        (1, "mailto:me@example.org", "anchor-text"),
    ]


def test_empty_and_urlless_text(spark):
    assert _links(spark, "") == []
    assert _links(spark, "no links here, just words.") == []
