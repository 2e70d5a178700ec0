"""ARC ingestion (tools/arc/ArcSegmentCreator.java parity).

The reference has no unit tests for the arc package; these tests
exercise the documented record format (gzip-member concatenation,
header-line split — ArcRecordReader.java:286-304) and the mapper
semantics (filedesc skip, normalize+filter, datum fields —
ArcSegmentCreator.java:290-351).
"""

import gzip
import io

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators.arc import (
    arc_records,
    arc_segment,
    arc_text_spans,
    iter_arc_members,
    read_arc,
    split_arc_record,
)
from nutch_spark.schema import STATUS_FETCH_SUCCESS


def _gz(payload: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(payload)
    return buf.getvalue()


def _record(url: str, ip: str, date: str, mime: str, body: bytes) -> bytes:
    header = f"{url} {ip} {date} {mime} {len(body)}\n".encode()
    return _gz(header + body)


def _arc_file() -> bytes:
    return b"".join(
        [
            _gz(b"filedesc://test.arc 0.0.0.0 20260101000000 text/plain 76\n"
                b"1 0 InternetArchive\nURL IP-address Archive-date Content-type Archive-length\n"),
            _record("http://a.example.com/1", "10.0.0.1", "20260101010101",
                    "text/html", b"<html><body>hello</body></html>"),
            _record("http://B.Example.com/2", "10.0.0.2", "20260101020202",
                    "text/plain", b"plain text body"),
            _record("http://c.example.com/img.png", "10.0.0.3", "20260101030303",
                    "image/png", b"\x89PNG\r\n\x1a\n\x00binary\x00bytes"),
        ]
    )


def test_iter_arc_members_exact_boundaries():
    data = _arc_file()
    members = list(iter_arc_members(data))
    assert len(members) == 4
    assert members[0].startswith(b"filedesc://")
    # truncated trailing member is dropped, earlier members survive
    members_trunc = list(iter_arc_members(data[:-7]))
    assert len(members_trunc) == 3
    # pure garbage yields nothing
    assert list(iter_arc_members(b"not a gzip stream")) == []


def test_split_arc_record_header_payload():
    body = b"line1\nline2"
    header, raw = split_arc_record(
        b"http://x/ 1.2.3.4 20260101000000 text/plain 11\n" + body
    )
    assert header == "http://x/ 1.2.3.4 20260101000000 text/plain 11"
    assert raw == body


@pytest.fixture()
def arc_df(spark):
    return spark.createDataFrame([("memory://t.arc", _arc_file())],
                                 "path string, content binary")


def test_arc_records_fields_and_filedesc_skip(spark, arc_df):
    rows = {r["url"]: r for r in arc_records(arc_df).collect()}
    assert set(rows) == {
        "http://a.example.com/1", "http://B.Example.com/2",
        "http://c.example.com/img.png",
    }
    r = rows["http://a.example.com/1"]
    assert r["ip"] == "10.0.0.1"
    assert r["archive_date"] == "20260101010101"
    assert r["mime"] == "text/html"
    assert bytes(r["content"]) == b"<html><body>hello</body></html>"
    assert r["declared_len"] == len(b"<html><body>hello</body></html>")
    assert r["src"] == "memory://t.arc"
    # version block included on request
    with_desc = arc_records(arc_df, include_filedesc=True).collect()
    assert len(with_desc) == 4


def test_read_arc_binary_file(spark, tmp_path):
    (tmp_path / "part1.arc.gz").write_bytes(_arc_file())
    got = read_arc(spark, str(tmp_path)).collect()
    assert len(got) == 3


def test_arc_segment_datums_and_content(spark, arc_df):
    records = arc_records(arc_df)
    seg = arc_segment(records, now_ms=1_760_000_000_000, segment_name="s1")
    datums = {r["url"]: r for r in seg["crawl_fetch"].collect()}
    # SCOPE_FETCHER normalization lowercases the host
    assert "http://b.example.com/2" in datums
    d = datums["http://b.example.com/2"]
    assert d["status"] == STATUS_FETCH_SUCCESS
    assert d["fetch_time"] == 1_760_000_000_000
    assert d["fetch_interval"] == 2592000
    assert d["score"] == 1.0
    content = {r["url"]: r for r in seg["content"].collect()}
    assert content["http://b.example.com/2"]["metadata" if False else "archive_date"] == "20260101020202"
    assert content["http://a.example.com/1"]["segment"] == "s1"
    # metadata carries arc.url.version (the archive date)
    meta = {r["url"]: r["metadata"] for r in seg["crawl_fetch"].collect()}
    assert meta["http://a.example.com/1"]["arc.url.version"] == "20260101010101"


def test_arc_segment_resolve_mime(spark):
    """resolve_mime=True applies the MimeUtil stand-in per record —
    a gzip payload mislabeled text/html comes back application/gzip,
    correct labels survive (protocol/Content.java:85 semantics)."""
    data = b"".join([
        _record("http://a.example.com/1", "10.0.0.1", "20260101010101",
                "text/html", b"<html><body>hello</body></html>"),
        _record("http://b.example.com/archive", "10.0.0.2", "20260101020202",
                "text/html", b"\x1f\x8b\x08\x00not-really-but-magic-says-gzip"),
    ])
    df = spark.createDataFrame([("memory://m.arc", data)],
                               "path string, content binary")
    seg = arc_segment(arc_records(df), now_ms=0, resolve_mime=True,
                      url_filter_rules=[r"+."])
    mimes = {r["url"]: r["mime"] for r in seg["content"].collect()}
    assert mimes["http://a.example.com/1"] == "text/html"
    assert mimes["http://b.example.com/archive"] == "application/gzip"
    # default off: the mislabeled header survives untouched
    seg_raw = arc_segment(arc_records(df), now_ms=0, url_filter_rules=[r"+."])
    raw = {r["url"]: r["mime"] for r in seg_raw["content"].collect()}
    assert raw["http://b.example.com/archive"] == "text/html"


def test_arc_segment_url_filter(spark, arc_df):
    seg = arc_segment(
        arc_records(arc_df), now_ms=0, url_filter_rules=[r"-\.png$", r"+."]
    )
    urls = sorted(r["url"] for r in seg["crawl_fetch"].collect())
    assert urls == ["http://a.example.com/1", "http://b.example.com/2"]


def test_default_filter_drops_media_like_the_reference(spark, arc_df):
    # ArcSegmentCreator runs the regular URLFilters (:316) — the default
    # regex rules exclude image extensions, so .png never reaches the segment
    seg = arc_segment(arc_records(arc_df), now_ms=0)
    urls = sorted(r["url"] for r in seg["crawl_fetch"].collect())
    assert urls == ["http://a.example.com/1", "http://b.example.com/2"]


def test_arc_text_spans_bridges_to_document_model(spark, arc_df):
    # permissive filter so the media record survives to the span bridge
    seg = arc_segment(arc_records(arc_df), now_ms=0, url_filter_rules=["+."])
    spanned = arc_text_spans(seg["content"])
    rows = {r["url"]: r["spans"] for r in spanned.collect()}
    text = rows["http://a.example.com/1"]
    assert len(text) == 1 and text[0]["kind"] == "text"
    assert "hello" in text[0]["text"] and text[0]["media_ref"] is None
    img = rows["http://c.example.com/img.png"]
    assert img[0]["kind"] == "image/png"
    assert img[0]["media_ref"] == "http://c.example.com/img.png"
    assert img[0]["text"] is None


def test_arc_text_spans_statistical_charset(spark):
    """statistical=True: the trained sniffer detects an unlabeled
    cp1251 (Cyrillic) payload and decodes it correctly; UTF-8 stays
    UTF-8; below the threshold the header clue wins (same clue order
    as the reference's EncodingDetector walk)."""
    ru = (
        "Каждый человек имеет право на жизнь, на свободу и на личную "
        "неприкосновенность, а также на защиту своих интересов."
    )
    rows = [
        ("http://ru.example.com/1", "text/html", ru.encode("windows-1251")),
        ("http://en.example.com/1", "text/html", "héllo wörld".encode("utf-8")),
        (
            "http://hdr.example.com/1",
            "text/html; charset=KOI8-R",
            ru.encode("koi8-r"),
        ),
    ]
    content = spark.createDataFrame(rows, "url string, mime string, content binary")
    spanned = arc_text_spans(content, detect_charset=True, statistical=True)
    got = {r["url"]: r["spans"][0]["text"] for r in spanned.collect()}
    assert got["http://ru.example.com/1"] == ru        # sniffed cp1251
    assert got["http://en.example.com/1"] == "héllo wörld"
    assert got["http://hdr.example.com/1"] == ru       # koi8 sniffed or header

    # threshold above any ngram confidence: header clue must win
    spanned_hdr = arc_text_spans(
        content, detect_charset=True, statistical=True, min_confidence=99
    )
    got_hdr = {r["url"]: r["spans"][0]["text"] for r in spanned_hdr.collect()}
    assert got_hdr["http://hdr.example.com/1"] == ru   # header koi8-r decode
