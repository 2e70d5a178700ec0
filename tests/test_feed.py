"""feed plugin: FeedParser fan-out semantics on handcrafted RSS/Atom
documents (TestFeedParser.java expectations: one parse row per entry
keyed by its link, plus the channel row)."""

from pyspark.sql import functions as F

from nutch_spark.operators.feed import feed_index_fields, parse_feed

RSS = (
    "<rss><channel><title>My <b>Feed</b></title>"
    "<link>http://example.com/</link>"
    "<description>All the news</description>"
    "<item><title>First <i>post</i></title>"
    "<link>http://example.com/a</link>"
    "<description>Hello <b>world</b></description>"
    "<author>alice</author>"
    "<category>news</category><category>tech</category>"
    "<pubDate>Mon, 05 Jan 2026 13:00:00 GMT</pubDate></item>"
    "<item><title>Second</title>"
    "<link>http://example.com/b</link>"
    "<description>Bye</description>"
    "<pubDate>Tue, 06 Jan 2026 00:30:00 GMT</pubDate></item>"
    "</channel></rss>"
)

ATOM = (
    '<feed><title>Atom Feed</title><link href="http://example.org/"/>'
    "<subtitle>stream</subtitle>"
    '<entry><title>Entry 1</title><link href="http://example.org/x"/>'
    "<summary>Sum <b>one</b></summary>"
    "<author><name>bob</name></author>"
    '<category term="alpha"/>'
    "<published>2026-01-05T13:00:00Z</published></entry>"
    "</feed>"
)


def test_rss_fan_out(spark):
    feeds = spark.createDataFrame(
        [("http://example.com/feed.xml", RSS)], "url string, xml string"
    )
    rows = {
        (r["url"], r["kind"]): r for r in parse_feed(feeds).collect()
    }
    a = rows[("http://example.com/a", "entry")]
    # stripTags drops markup from titles/descriptions
    assert a["title"] == "First post"
    assert a["text"] == "Hello world"
    assert a["author"] == "alice"
    assert a["tags"] == ["news", "tech"]
    # Mon, 05 Jan 2026 13:00:00 GMT
    assert a["published_ms"] == 1767618000000
    assert a["feed_link"] == "http://example.com/"
    b = rows[("http://example.com/b", "entry")]
    assert b["author"] is None and b["tags"] == []
    assert b["published_ms"] == 1767659400000
    # channel-level row (FeedParser.getParse:139-144)
    ch = rows[("http://example.com/feed.xml", "feed")]
    assert ch["title"] == "My Feed"
    assert ch["text"] == "All the news"


def test_atom_fan_out_and_index_fields(spark):
    feeds = spark.createDataFrame(
        [("http://example.org/feed.atom", ATOM)], "url string, xml string"
    )
    parsed = parse_feed(feeds)
    e = parsed.filter(F.col("kind") == "entry").collect()
    assert len(e) == 1
    assert e[0]["url"] == "http://example.org/x"
    assert e[0]["title"] == "Entry 1"
    assert e[0]["text"] == "Sum one"
    assert e[0]["author"] == "bob"
    assert e[0]["tags"] == ["alpha"]
    assert e[0]["published_ms"] == 1767618000000

    idx = feed_index_fields(parsed).collect()
    assert len(idx) == 1
    assert idx[0]["feed"] == "http://example.org/"
    assert idx[0]["tags"] == "alpha"


def test_entry_links_pass_outlink_chain(spark):
    bad = RSS.replace("http://example.com/b", "ftp://example.com/b")
    feeds = spark.createDataFrame(
        [("http://example.com/feed.xml", bad)], "url string, xml string"
    )
    # default regex filter chain vetoes non-http(s) schemes
    out = parse_feed(
        feeds, url_filter_rules=["-^(?!https?://)", "+."]
    )
    urls = {r["url"] for r in out.filter(F.col("kind") == "entry").collect()}
    assert urls == {"http://example.com/a"}


def test_rss_with_feed_mention_stays_rss(spark):
    tricky = RSS.replace(
        "<description>Bye</description>",
        "<description>Bye</description><feedburner:origLink>http://example.com/b0</feedburner:origLink>",
    )
    feeds = spark.createDataFrame(
        [("http://example.com/feed.xml", tricky)], "url string, xml string"
    )
    entries = parse_feed(feeds).filter(F.col("kind") == "entry").collect()
    # the literal '<feed' in the body must not flip the Atom branch
    assert {r["url"] for r in entries} == {
        "http://example.com/a",
        "http://example.com/b",
    }


def test_dates_are_session_timezone_proof(spark):
    feeds = spark.createDataFrame(
        [("http://example.com/feed.xml", RSS),
         ("http://example.org/feed.atom", ATOM)],
        "url string, xml string",
    )
    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Chicago")
        rows = {r["url"]: r for r in
                parse_feed(feeds).filter(F.col("kind") == "entry").collect()}
        assert rows["http://example.com/a"]["published_ms"] == 1767618000000
        assert rows["http://example.org/x"]["published_ms"] == 1767618000000
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
