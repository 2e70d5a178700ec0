"""WARC export (S8, WARCExporter.java) and indexing job (S9,
IndexerMapReduce + BasicIndexingFilter)."""

import os

from pyspark.sql import functions as F

from nutch_spark import schema as S
from nutch_spark.config import NutchConfig
from nutch_spark.operators.indexer import index_documents, write_jsonl
from nutch_spark.operators.warc import warc_records, write_warc

CFG = NutchConfig()
FT = 1_705_000_000_000


def content_df(spark):
    spans = [
        {"kind": "text", "text": "hello warc", "media_ref": None, "offset": 0},
        {"kind": "media", "text": "img", "media_ref": "http://h.example.com/i.img", "offset": 1},
    ]
    return spark.createDataFrame(
        [("http://h.example.com/a b", 1.0, FT, None, spans, True)],
        "url string, score float, fetch_time long, gen_time long,"
        " spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
        " is_canonical boolean",
    )


def test_warc_record_structure(spark):
    rec = warc_records(content_df(spark)).collect()[0]["record"]
    payload = "text\x1ehello warc\x1e\x1e0\x1fmedia\x1eimg\x1ehttp://h.example.com/i.img\x1e1"
    head, _, body = rec.partition("\r\n\r\n")
    lines = head.split("\r\n")
    assert lines[0] == "WARC/1.0"
    fields = dict(ln.split(": ", 1) for ln in lines[1:])
    assert fields["WARC-Type"] == "resource"
    assert int(fields["Content-Length"]) == len(payload.encode())
    assert fields["WARC-Target-URI"] == "http://h.example.com/a%20b"  # space escaped
    assert fields["WARC-Record-ID"].startswith("<urn:uuid:") and fields["WARC-Record-ID"].endswith(">")
    assert fields["WARC-Date"].endswith("Z") and "T" in fields["WARC-Date"]
    assert body == payload + "\r\n\r\n"
    # deterministic: same input -> same record (replay invariant)
    rec2 = warc_records(content_df(spark)).collect()[0]["record"]
    assert rec2 == rec


def test_write_warc_files(spark, tmp_path):
    out = str(tmp_path / "warc")
    write_warc(warc_records(content_df(spark)).repartition(1), out)
    files = [f for f in os.listdir(out) if f.endswith(".warc")]
    assert len(files) == 1
    data = open(os.path.join(out, files[0]), "rb").read().decode()
    assert data.startswith("WARC/1.0\r\nWARC-Type: warcinfo")
    assert data.count("WARC/1.0") == 2  # warcinfo + 1 resource record


def _db(spark):
    rows = [
        ("http://h1.example.com/a", S.STATUS_DB_FETCHED, FT, 0, 2592000, 2.0,
         "sigA", 0, {}, None, None),
        ("http://h1.example.com/b", S.STATUS_DB_NOTMODIFIED, FT, 0, 2592000, 1.0,
         "sigB", 0, {}, None, "http://canon.example.com/b"),
        ("http://h1.example.com/c", S.STATUS_DB_UNFETCHED, FT, 0, 2592000, 1.0,
         None, 0, {}, None, None),  # not indexable
        ("http://h1.example.com/d", S.STATUS_DB_GONE, FT, 0, 2592000, 1.0,
         None, 0, {}, None, None),  # not indexable
    ]
    return spark.createDataFrame(
        rows,
        "url string, status int, fetch_time long, retries int, fetch_interval int,"
        " score float, signature string, modified_time long,"
        " metadata map<string,string>, gen_time long, repr_url string",
    )


def test_index_documents_fields_and_skips(spark):
    ptext = spark.createDataFrame(
        [("http://h1.example.com/a", "Title text\x00with control\nchars " + "x" * 20000),
         ("http://h1.example.com/b", "b content"),
         ("http://h1.example.com/c", "never indexed")],
        "url string, text string",
    )
    docs = {r["url"]: r for r in index_documents(_db(spark), ptext, CFG).collect()}
    # only fetched/notmodified with parse text; repr_url preferred
    assert set(docs) == {"http://h1.example.com/a", "http://canon.example.com/b"}
    a = docs["http://h1.example.com/a"]
    assert a["domain"] == "example.com" and a["host"] == "h1.example.com"
    assert "\x00" not in a["content"] and "\n" not in a["content"]  # cleanField
    assert len(a["content"]) <= 10000 and len(a["title"]) <= 100
    assert a["tstamp"] == FT and a["digest"] == "sigA" and a["boost"] == 2.0
    b = docs["http://canon.example.com/b"]
    assert b["host"] == "canon.example.com"  # host of the repr url


def test_write_jsonl(spark, tmp_path):
    ptext = spark.createDataFrame(
        [("http://h1.example.com/a", "content a")], "url string, text string"
    )
    out = str(tmp_path / "idx")
    write_jsonl(index_documents(_db(spark), ptext, CFG), out)
    back = spark.read.json(out)
    assert back.count() == 1 and back.select("url").collect()[0][0] == "http://h1.example.com/a"


def test_subcollections_match_and_blacklist(spark):
    from nutch_spark.operators.indexer import subcollections_col
    from pyspark.sql import functions as F

    cols = [
        {"name": "news", "whitelist": ["/news/", "/breaking/"],
         "blacklist": ["/news/ads/"]},
        {"name": "shop", "whitelist": ["shop.example.com"]},
        {"name": "ci", "whitelist": ["/MiXeD/"], "case_insensitive": True},
    ]
    df = spark.createDataFrame(
        [("http://a.com/news/1",), ("http://a.com/news/ads/2",),
         ("http://shop.example.com/news/3",), ("http://b.com/mixed/x",),
         ("http://c.com/other",)],
        "url string",
    )
    out = {r["url"]: r["c"] for r in
           df.select("url", subcollections_col(F.col("url"), cols).alias("c")).collect()}
    assert out["http://a.com/news/1"] == ["news"]
    assert out["http://a.com/news/ads/2"] == []          # blacklisted
    assert out["http://shop.example.com/news/3"] == ["news", "shop"]
    assert out["http://b.com/mixed/x"] == ["ci"]         # case-insensitive
    assert out["http://c.com/other"] == []


def test_commoncrawl_record_shape(spark):
    import json

    from nutch_spark.operators.warc import commoncrawl_records

    pages = spark.createDataFrame(
        [("http://www.site.org/a/b?x=1", 1700000000000,
          'body with "quotes" and \\backslash')],
        "url string, fetch_time long, text string",
    )
    (r,) = commoncrawl_records(pages).collect()
    assert r["key"] == "org.site.www:http/a/b?x=1"
    doc = json.loads(r["record"])  # valid JSON with correct nesting
    assert doc["url"] == "http://www.site.org/a/b?x=1"
    assert doc["timestamp"] == "1700000000000"
    assert doc["request"]["client"]["robots"] == "classic"
    assert doc["response"]["server"]["hostname"] == "www.site.org"
    assert doc["response"]["body"] == 'body with "quotes" and \\backslash'
    assert doc["key"] == r["key"] and doc["imported"] == doc["timestamp"]


def test_route_documents_by_expression(spark):
    from nutch_spark.operators.indexer import route_documents

    docs = spark.createDataFrame(
        [("http://a/", 2.0, "en"), ("http://b/", 0.1, "de"),
         ("http://c/", 5.0, "de")],
        "url string, boost double, lang string",
    )
    routes = [
        # JexlExchange.match's context has ONLY `doc` (a bare variable
        # resolves NULL -> no match); both doc.<field> and the canonical
        # doc.getFieldValue form (exchanges.xml.template) work
        ("high_boost", "doc.boost >= 1.0"),
        ("german", "doc.getFieldValue('lang')=='de'"),
    ]
    out = {r["url"]: r["writers"] for r in
           route_documents(docs, routes).collect()}
    assert out["http://a/"] == ["high_boost"]
    assert out["http://b/"] == ["german"]
    assert out["http://c/"] == ["high_boost", "german"]
    # the earlier T14 SQL substitution stays behind dialect="sql"
    out = {r["url"]: r["writers"] for r in
           route_documents(docs, [("german", "lang = 'de'")],
                           dialect="sql").collect()}
    assert out["http://b/"] == ["german"]


def test_index_documents_parser_title_and_nutch_1004(spark):
    """BasicIndexingFilter:110-118 — when parse_text carries a parser
    title it is used (truncated to max_title); a zero-length title is
    not added (NUTCH-1004 -> NULL)."""
    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.indexer import index_documents

    db = spark.createDataFrame(
        [("http://h/a", 2, 1000, 0, 2592000, 1.0, "sig", 0, {}, None, None),
         ("http://h/b", 2, 1000, 0, 2592000, 1.0, "sig", 0, {}, None, None)],
        "url string, status int, fetch_time long, retries int,"
        " fetch_interval int, score float, signature string,"
        " modified_time long, metadata map<string,string>,"
        " gen_time long, repr_url string",
    )
    pt = spark.createDataFrame(
        [("http://h/a", "body text here", "My Title " + "x" * 200),
         ("http://h/b", "body text here", "")],
        "url string, text string, title string",
    )
    out = {r["url"]: r for r in index_documents(db, pt, NutchConfig()).collect()}
    assert out["http://h/a"]["title"] == ("My Title " + "x" * 200)[:100]
    assert out["http://h/a"]["content"].startswith("body text")
    assert out["http://h/b"]["title"] is None  # NUTCH-1004
