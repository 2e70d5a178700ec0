"""ProtocolStatusStatistics + CrawlSummaryStats
(util/ProtocolStatusStatistics.java:118-160, CrawlSummaryStats.java:160-240)."""

from nutch_spark.operators.stats import (
    PROTOCOL_CODE_KEY,
    crawl_summary,
    protocol_status_stats,
    stamp_protocol_code,
)
from nutch_spark.schema import (
    STATUS_DB_UNFETCHED,
    STATUS_FETCH_GONE,
    STATUS_FETCH_SUCCESS,
)


def _db(spark):
    fetched = spark.createDataFrame(
        [
            ("http://a.com/1", STATUS_FETCH_SUCCESS),
            ("http://a.com/2", STATUS_FETCH_SUCCESS),
            ("http://b.com/3", STATUS_FETCH_GONE),
        ],
        "url string, status int",
    ).selectExpr("url", "status", "cast(map() as map<string,string>) as metadata")
    rest = spark.createDataFrame(
        [("http://b.com/4", STATUS_DB_UNFETCHED)], "url string, status int"
    ).selectExpr("url", "status", "cast(map() as map<string,string>) as metadata")
    return stamp_protocol_code(fetched).unionByName(rest)


def test_stamp_and_protocol_counts(spark):
    db = _db(spark)
    stamped = {r["url"]: r["metadata"] for r in db.collect()}
    assert stamped["http://a.com/1"][PROTOCOL_CODE_KEY] == "200"
    assert stamped["http://b.com/3"][PROTOCOL_CODE_KEY] == "404"
    # unstamped rows keep an empty map -> UNFETCHED bucket
    assert PROTOCOL_CODE_KEY not in stamped["http://b.com/4"]

    counts = {r["status_code"]: r["count"] for r in protocol_status_stats(db).collect()}
    assert counts == {"200": 2, "404": 1, "UNFETCHED": 1}


def test_crawl_summary_host_rollup(spark):
    rows = {
        (r["key"], r["status_name"], r["http_code"]): r["count"]
        for r in crawl_summary(_db(spark), mode="host").collect()
    }
    assert rows == {
        ("a.com", "fetch_success", 200): 2,
        ("b.com", "fetch_gone", 404): 1,
        ("b.com", "db_unfetched", -1): 1,
    }
