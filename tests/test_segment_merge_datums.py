"""Ported TestSegmentMergerCrawlDatums scenarios: crawl_fetch merge
resolution (SegmentMerger.java:478-494 — fetch beats linked, the
latest segment's fetch status wins, retry/notmodified never win)."""

from nutch_spark.operators.merger import merge_crawl_fetch
from nutch_spark.schema import (
    STATUS_FETCH_GONE,
    STATUS_FETCH_NOTMODIFIED,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_RETRY,
    STATUS_FETCH_SUCCESS,
    STATUS_LINKED,
)

URL = "http://site.example.org/"
REDIR = "http://site.example.org/i_redirect_to_the_root/"


def _seg(spark, rows):
    return spark.createDataFrame(rows, "url string, status int, fetch_time long")


def _final(spark, segs):
    out = {r["url"]: r["status"] for r in merge_crawl_fetch(segs).collect()}
    return out


def test_fixed_sequence(spark):
    # gone; gone-as-redirect (linked + redir row); success  -> success
    s1 = _seg(spark, [(URL, STATUS_FETCH_GONE, 10)])
    s2 = _seg(
        spark,
        [(URL, STATUS_LINKED, 20), (REDIR, STATUS_FETCH_REDIR_TEMP, 20)],
    )
    s3 = _seg(spark, [(URL, STATUS_FETCH_SUCCESS, 30)])
    got = _final(spark, [s1, s2, s3])
    assert got[URL] == STATUS_FETCH_SUCCESS
    assert got[REDIR] == STATUS_FETCH_REDIR_TEMP


def test_ends_with_redirect_keeps_last_fetch(spark):
    # a trailing redirect-only segment must NOT clobber the fetch status
    s1 = _seg(spark, [(URL, STATUS_FETCH_SUCCESS, 10)])
    s2 = _seg(
        spark,
        [(URL, STATUS_LINKED, 20), (REDIR, STATUS_FETCH_REDIR_TEMP, 20)],
    )
    got = _final(spark, [s1, s2])
    assert got[URL] == STATUS_FETCH_SUCCESS


def test_redirect_and_fetch_in_one_segment(spark):
    # linked datum written BEFORE the fetch datum in the same segment:
    # the fetch datum must be preferred
    s = _seg(
        spark,
        [
            (URL, STATUS_LINKED, 20),
            (URL, STATUS_FETCH_SUCCESS, 20),
            (REDIR, STATUS_FETCH_REDIR_TEMP, 20),
        ],
    )
    assert _final(spark, [s])[URL] == STATUS_FETCH_SUCCESS


def test_retry_and_notmodified_never_win(spark):
    # NUTCH-1520 / NUTCH-1113: later retry/notmodified segments are
    # ignored for the merged fetch status
    s1 = _seg(spark, [(URL, STATUS_FETCH_SUCCESS, 10)])
    s2 = _seg(spark, [(URL, STATUS_FETCH_RETRY, 20)])
    s3 = _seg(spark, [(URL, STATUS_FETCH_NOTMODIFIED, 30)])
    assert _final(spark, [s1, s2, s3])[URL] == STATUS_FETCH_SUCCESS
    # and a url with ONLY ineligible datums drops out entirely
    only_retry = _seg(spark, [("http://r.example.org/", STATUS_FETCH_RETRY, 5)])
    assert "http://r.example.org/" not in _final(spark, [only_retry])


def test_long_sequence_latest_eligible_wins(spark):
    # 20 segments cycling all six fetch statuses; expected final =
    # status of the LAST segment carrying an eligible fetch datum
    statuses = [0x21 + (i % 6) for i in range(19)] + [STATUS_FETCH_SUCCESS]
    segs = [_seg(spark, [(URL, s, i)]) for i, s in enumerate(statuses)]
    assert _final(spark, segs)[URL] == STATUS_FETCH_SUCCESS
