"""Dedup (TestCrawlDbDeduplication.java:78-160 semantics): keep-best by
score desc, fetchTime desc, decoded-url-length asc; optional
httpsOverHttp preference; losers -> db_duplicate; non-eligible rows
untouched."""

import pytest

from nutch_spark import schema as S
from nutch_spark.config import NutchConfig
from nutch_spark.operators.dedup import dedup
from nutch_spark.schema import crawldb_schema

NOW = 1_700_000_000_000


def datum(url, status=S.STATUS_DB_FETCHED, score=1.0, fetch_time=NOW, signature="s1"):
    return (url, status, fetch_time, 0, 2592000, score, signature, 0, {}, None, None)


def run(spark, rows, **cfg_kw):
    cfg = NutchConfig(**cfg_kw)
    db = spark.createDataFrame(rows, crawldb_schema())
    return {r["url"]: r["status"] for r in dedup(db, cfg).collect()}


def test_higher_score_wins(spark):
    got = run(spark, [
        datum("http://a.example.com/", score=2.0),
        datum("http://b.example.com/", score=1.0),
    ])
    assert got["http://a.example.com/"] == S.STATUS_DB_FETCHED
    assert got["http://b.example.com/"] == S.STATUS_DB_DUPLICATE


def test_newer_fetch_time_wins_on_score_tie(spark):
    got = run(spark, [
        datum("http://old.example.com/", fetch_time=NOW - 1000),
        datum("http://new.example.com/", fetch_time=NOW),
    ])
    assert got["http://new.example.com/"] == S.STATUS_DB_FETCHED
    assert got["http://old.example.com/"] == S.STATUS_DB_DUPLICATE


def test_shorter_decoded_url_wins_on_full_tie(spark):
    got = run(spark, [
        datum("http://x.example.com/a%20b%20c"),   # decodes to 'a b c' (len 25)
        datum("http://x.example.com/abcdefghijklm"),  # longer raw, len 33
    ])
    # decoded lengths: 'http://x.example.com/a b c'=26 < 33
    assert got["http://x.example.com/a%20b%20c"] == S.STATUS_DB_FETCHED
    assert got["http://x.example.com/abcdefghijklm"] == S.STATUS_DB_DUPLICATE


def test_https_over_http_preference(spark):
    got = run(
        spark,
        [
            datum("http://x.example.com/page"),
            datum("https://x.example.com/page"),
        ],
        dedup_compare_order="score,fetchTime,httpsOverHttp,urlLength",
    )
    assert got["https://x.example.com/page"] == S.STATUS_DB_FETCHED
    assert got["http://x.example.com/page"] == S.STATUS_DB_DUPLICATE


def test_different_signatures_not_duplicates(spark):
    got = run(spark, [
        datum("http://a.example.com/", signature="s1"),
        datum("http://b.example.com/", signature="s2"),
    ])
    assert set(got.values()) == {S.STATUS_DB_FETCHED}


def test_unfetched_and_null_signature_ignored(spark):
    got = run(spark, [
        datum("http://a.example.com/"),
        datum("http://u.example.com/", status=S.STATUS_DB_UNFETCHED),
        datum("http://n.example.com/", signature=None),
    ])
    assert got["http://u.example.com/"] == S.STATUS_DB_UNFETCHED
    assert got["http://n.example.com/"] == S.STATUS_DB_FETCHED
    assert got["http://a.example.com/"] == S.STATUS_DB_FETCHED


def test_notmodified_eligible(spark):
    got = run(spark, [
        datum("http://a.example.com/", status=S.STATUS_DB_NOTMODIFIED, score=2.0),
        datum("http://b.example.com/"),
    ])
    assert got["http://a.example.com/"] == S.STATUS_DB_NOTMODIFIED
    assert got["http://b.example.com/"] == S.STATUS_DB_DUPLICATE


def test_group_mode_host(spark):
    # same signature on different hosts: with host grouping, no duplicates
    got = run(
        spark,
        [datum("http://a.example.com/"), datum("http://b.example.com/")],
        dedup_group_mode="host",
    )
    assert set(got.values()) == {S.STATUS_DB_FETCHED}
