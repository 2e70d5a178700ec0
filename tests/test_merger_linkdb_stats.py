"""CrawlDb merger (TestCrawlDbMerger.java:113-141 semantics), LinkDb
invert/merge, and readdb stats/topN."""

import pytest
from pyspark.sql import functions as F

from nutch_spark import schema as S
from nutch_spark.config import NutchConfig
from nutch_spark.operators.linkdb import invert_links, merge_linkdbs
from nutch_spark.operators.merger import merge_crawldbs
from nutch_spark.operators.stats import crawldb_stats, domain_stats, hostdb_update, top_n
from nutch_spark.schema import crawldb_schema

NOW = 1_700_000_000_000
CFG = NutchConfig()


def datum(url, status=S.STATUS_DB_FETCHED, fetch_time=NOW, interval=3600,
          score=1.0, meta=None):
    return (url, status, fetch_time, 0, interval, score, None, 0, meta or {}, None, None)


def db(spark, rows):
    return spark.createDataFrame(rows, crawldb_schema())


def test_merger_newest_last_fetch_wins_meta_union(spark):
    """calculateLastFetchTime = fetchTime - interval*1000 decides; metadata
    union with newer values winning (CrawlDbMerger.java:81-118)."""
    url = "http://m.example.com/"
    db1 = db(spark, [datum(url, fetch_time=NOW - 10_000, meta={"a": "1", "b": "db1"})])
    db2 = db(spark, [datum(url, fetch_time=NOW, meta={"b": "db2", "c": "3"})])
    row = merge_crawldbs([db1, db2], CFG).collect()[0]
    assert row["fetch_time"] == NOW
    assert row["metadata"] == {"a": "1", "b": "db2", "c": "3"}

    # unfetched rows have lastFetchTime 0: a fetched row always wins
    db3 = db(spark, [datum(url, status=S.STATUS_DB_UNFETCHED, fetch_time=NOW + 99_999)])
    row = merge_crawldbs([db1, db3], CFG).collect()[0]
    assert row["status"] == S.STATUS_DB_FETCHED

    # disjoint urls pass through
    db4 = db(spark, [datum("http://only.example.com/")])
    assert merge_crawldbs([db1, db4], CFG).count() == 2


def test_linkdb_invert_and_merge(spark):
    outlinks = spark.createDataFrame(
        [
            ("http://a.example.com/p", "http://b.example.com/x", "anchor-1" * 50),
            ("http://c.example.com/p", "http://b.example.com/x", "a2"),
            ("http://a.example.com/p", "http://a.example.com/internal", "a3"),
        ],
        "url string, to_url string, anchor string",
    )
    ldb = invert_links(outlinks, CFG)
    rows = {r["url"]: r["inlinks"] for r in ldb.collect()}
    # internal link ignored by default (linkdb.ignore.internal.links=true)
    assert set(rows) == {"http://b.example.com/x"}
    inl = rows["http://b.example.com/x"]
    assert {i["from_url"] for i in inl} == {"http://a.example.com/p", "http://c.example.com/p"}
    # anchor truncated to 100 chars
    assert max(len(i["anchor"]) for i in inl) == 100

    merged = merge_linkdbs(ldb, ldb, CFG)
    assert merged.count() == 1
    assert len(merged.collect()[0]["inlinks"]) == 2  # distinct across merge


def test_inlink_cap(spark):
    cfg = CFG.with_(linkdb_max_inlinks=5)
    outlinks = spark.createDataFrame(
        [(f"http://s{i}.example.com/", "http://t.example.com/", "a") for i in range(20)],
        "url string, to_url string, anchor string",
    )
    row = invert_links(outlinks, cfg).collect()[0]
    assert len(row["inlinks"]) == 5


def test_stats_and_topn(spark):
    rows = [
        datum(f"http://h{i % 3}.example.com/p{i}",
              status=S.STATUS_DB_FETCHED if i % 2 == 0 else S.STATUS_DB_UNFETCHED,
              score=float(i))
        for i in range(10)
    ]
    d = db(spark, rows)
    st = {r["status_name"]: r for r in crawldb_stats(d).collect()}
    assert st["db_fetched"]["count"] == 5
    assert st["db_unfetched"]["count"] == 5
    assert st["db_fetched"]["max_score"] == 8.0

    tn = top_n(d, 3).collect()
    assert [r["score"] for r in tn] == [9.0, 8.0, 7.0]

    tn_min = top_n(d, 10, min_score=8.0).collect()
    assert len(tn_min) == 2


def test_hostdb_and_domain_stats(spark):
    rows = [
        datum("http://a.example.com/1"),
        datum("http://a.example.com/2", status=S.STATUS_DB_UNFETCHED),
        datum("http://b.example.com/1", status=S.STATUS_DB_GONE),
    ]
    d = db(spark, rows)
    hosts = {r["host"]: r for r in hostdb_update(d, CFG).collect()}
    assert hosts["a.example.com"]["n_urls"] == 2
    assert hosts["a.example.com"]["n_db_fetched"] == 1
    assert hosts["a.example.com"]["n_tried"] == 1
    assert hosts["b.example.com"]["n_db_gone"] == 1

    doms = {r["key"]: r for r in domain_stats(d, "domain").collect()}
    assert doms["example.com"]["n_urls"] == 3
    assert doms["example.com"]["n_fetched"] == 1
    assert doms["example.com"]["n_unfetched"] == 1


def test_segment_stats(spark):
    from nutch_spark.operators.stats import segment_stats

    seg = spark.createDataFrame(
        [("a", 0x21, 100), ("b", 0x21, 200), ("c", 0x25, 150)],
        "url string, status int, fetch_time long",
    )
    rows = {r["status"]: r for r in segment_stats(seg).collect()}
    assert rows[0x21]["count"] == 2 and rows[0x21]["max_fetch_time"] == 200
    assert rows[0x25]["status_name"] == "fetch_gone"


def test_merge_metadata_follows_winner_order(spark):
    """Metadata precedence tracks (lastFetchTime, fetchTime) like the
    winning datum — an unfetched-but-recent loser must not override the
    fetched winner's values (CrawlDbMerger isNewer, :107-111)."""
    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.merger import merge_crawldbs

    cols = (
        "url string, status int, fetch_time long, retries int, fetch_interval int,"
        " score float, signature string, modified_time long,"
        " metadata map<string,string>, gen_time long, repr_url string"
    )
    # A: unfetched (lft=0) but newer fetch_time, metadata k=loser
    a = spark.createDataFrame(
        [("x", 1, 9_000, 0, 100, 1.0, None, 0, {"k": "loser"}, None, None)], cols
    )
    # B: fetched -> lft = 5000-100*1000 ... use small interval: lft>0 wins
    b = spark.createDataFrame(
        [("x", 2, 5_000, 0, 1, 1.0, None, 0, {"k": "winner"}, None, None)], cols
    )
    out = merge_crawldbs([a, b], NutchConfig()).collect()[0]
    assert out["status"] == 2  # fetched datum wins (lft 4000 > 0)
    assert out["metadata"]["k"] == "winner"


def test_dump_retry_score_filters_and_read_url(spark):
    from nutch_spark.operators.stats import dump, read_url

    db = spark.createDataFrame(
        [
            ("http://a/", 1, 0, 0.5),
            ("http://b/", 1, 2, 1.5),
            ("http://c/", 2, 3, 2.5),
        ],
        "url string, status int, retries int, score float",
    )
    assert {r["url"] for r in dump(db, min_retry=2).collect()} == {"http://b/", "http://c/"}
    assert {r["url"] for r in dump(db, max_score=1.5).collect()} == {"http://a/", "http://b/"}
    assert {r["url"] for r in dump(db, min_score=1.0, max_score=2.0).collect()} == {"http://b/"}
    (row,) = read_url(db, "http://c/").collect()
    assert row["status"] == 2 and row["retries"] == 3


def test_merge_crawldbs_full_tie_first_db_wins(spark):
    """Full (lastFetchTime, fetchTime) tie between dbs: the reference's
    strict isNewer keeps the first-iterated datum, emulated as 'first db
    in arg order wins' with a total datum tie-break — deterministic
    under any partitioning."""
    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.merger import merge_crawldbs

    schema = ("url string, status int, fetch_time long, retries int,"
              " fetch_interval int, score float, signature string,"
              " modified_time long, metadata map<string,string>,"
              " gen_time long, repr_url string")
    # both unfetched (lft=0), same fetch_time, different retries/score
    a = spark.createDataFrame(
        [("http://t/", 1, 100, 7, 3600, 9.0, None, 0, {"k": "a"}, None, None)], schema)
    b = spark.createDataFrame(
        [("http://t/", 1, 100, 2, 3600, 1.0, None, 0, {"k": "b"}, None, None)], schema)
    (r1,) = merge_crawldbs([a, b], NutchConfig()).collect()
    (r2,) = merge_crawldbs([a.repartition(8), b.repartition(3)], NutchConfig()).collect()
    assert r1["retries"] == 7 and r1["score"] == 9.0   # first db won
    assert r1["metadata"]["k"] == "a"                  # meta winner consistent
    assert r1 == r2                                    # replay-deterministic


def test_linkdb_merger_ported_matrix(spark):
    """TestLinkDbMerger.java:44-125 verbatim: two linkdbs where
    http://example.com/ appears in both — its merged inlinks are the
    union of both lists; single-db keys pass through untouched."""
    def ldb(spark, entries):
        return spark.createDataFrame(
            [(u, [(f, "") for f in froms]) for u, froms in entries],
            "url string, inlinks array<struct<from_url:string,anchor:string>>",
        )

    db1 = ldb(spark, [
        ("http://example.com/foo",
         ["http://example.com/100", "http://example.com/101"]),
        ("http://example.com/",
         ["http://example.com/110", "http://example.com/111"]),
    ])
    db2 = ldb(spark, [
        ("http://example.com/", ["http://foo.com/200", "http://foo.com/201"]),
        ("http://example.com/bar", ["http://foo.com/210", "http://foo.com/211"]),
    ])
    merged = merge_linkdbs(db1, db2, CFG)
    got = {r["url"]: sorted(i["from_url"] for i in r["inlinks"])
           for r in merged.collect()}
    assert got == {
        "http://example.com/foo":
            ["http://example.com/100", "http://example.com/101"],
        "http://example.com/":
            ["http://example.com/110", "http://example.com/111",
             "http://foo.com/200", "http://foo.com/201"],
        "http://example.com/bar":
            ["http://foo.com/210", "http://foo.com/211"],
    }
