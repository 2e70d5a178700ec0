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


def _java_decoded_len(u: str) -> int:
    """Literal replay of DeduplicationJob.java:207-231's comparator key:
    java.net.URLDecoder.decode(u, UTF_8), whole-string fallback to the
    encoded URL on IllegalArgumentException (malformed % escape)."""
    import re
    from urllib.parse import unquote_plus

    # URLDecoder throws IAE if any '%' is not followed by two hex digits
    if re.search(r"%(?![0-9a-fA-F]{2})", u):
        return len(u.encode("utf-16-be")) // 2
    # '+' -> ' ' and strict %XX decode; malformed UTF-8 byte sequences
    # become U+FFFD in both decoders (errors='replace' / CodingErrorAction.REPLACE).
    # Java compares String.length() = UTF-16 code units (a supplementary
    # code point counts 2), not code points — hence the utf-16-be round-trip.
    return len(unquote_plus(u, errors="replace").encode("utf-16-be")) // 2


def test_decoded_url_len_matches_java_semantics(spark):
    """decoded_url_len is a pure-JVM column (no ArrowEvalPython node) and
    must equal the Java URLDecoder replay on escapes, multi-byte UTF-8,
    '+', and the invalid-escape whole-string fallback."""
    from pyspark.sql import functions as F

    from nutch_spark.operators.dedup import decoded_url_len

    urls = [
        "http://x.example.com/plain",
        "http://x.example.com/a%20b%20c",          # simple escapes
        "http://x.example.com/caf%C3%A9",          # 2-byte UTF-8 -> 1 char
        "http://x.example.com/%E2%82%AC/price",    # 3-byte UTF-8 -> 1 char
        "http://x.example.com/a+b+c",              # '+' -> space, same length
        "http://x.example.com/bad%zzescape",       # IAE -> encoded fallback
        "http://x.example.com/mixed%20and%zz",     # valid + invalid -> fallback
        "http://x.example.com/trailing%2",         # truncated escape -> fallback
        "http://x.example.com/%FF",                # lone invalid UTF-8 byte -> U+FFFD
        "http://x.example.com/%F0%9F%98%80",       # 4-byte UTF-8 -> surrogate PAIR (2 units)
        "http://x.example.com/\U0001F600/raw",     # literal supplementary code point
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        r["url"]: r["n"]
        for r in df.select("url", decoded_url_len(F.col("url")).alias("n")).collect()
    }
    for u in urls:
        assert got[u] == _java_decoded_len(u), u
    # and the plan is Python-free
    plan = (
        df.select(decoded_url_len(F.col("url")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "pythonUDF" not in plan and "ArrowEvalPython" not in plan
