"""parse-zip: archive fan-out, skip rules, and the per-archive text
accumulation (ZipTextExtractor.java:61-115, TestZipParser expectation:
archive text contains the entry text)."""

import io
import zipfile

from nutch_spark.operators.zip_parse import parse_zip, zip_entries


def _zip(entries):
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        for name, data in entries:
            zf.writestr(zipfile.ZipInfo(name, (2026, 1, 1, 0, 0, 0)), data)
    return buf.getvalue()


def _pages(spark, blobs):
    return spark.createDataFrame(blobs, "url string, content binary")


def test_entry_fan_out_and_skips(spark):
    z = _zip(
        [
            ("readme.txt", b"hello notes"),
            ("sub/", b""),          # directory: skipped
            ("noextension", b"x"),  # no '.': skipped (ZipTextExtractor:86)
            ("sub/page.html", b"<html><a href=\"/x.html\">L</a>Body</html>"),
        ]
    )
    entries, _ = parse_zip(_pages(spark, [("http://h/a.zip", z)]))
    got = {r["name"]: r for r in entries.collect()}
    assert set(got) == {"readme.txt", "sub/page.html"}
    r = got["readme.txt"]
    assert r["entry_url"] == "http://h/a.zip/readme.txt"
    assert r["mime"] == "text/plain" and r["text"] == "hello notes"
    assert r["size"] == 11 and r["outlinks"] == []
    h = got["sub/page.html"]
    assert h["text"] == "LBody"
    # href resolved against the entry URL's origin
    assert h["outlinks"] == ["http://h/x.html"]


def test_archive_text_accumulation_order(spark):
    z = _zip(
        [
            ("b.txt", b"two"),
            ("data.bin", b"\x00\x01"),  # no parser: listed, contributes nothing
            ("a.txt", b"one"),
        ]
    )
    entries, archives = parse_zip(_pages(spark, [("http://h/b.zip", z)]))
    assert entries.count() == 3
    a = archives.collect()[0]
    # archive order (not name order), unparseable entry absent
    assert a["text"] == "b.txt two a.txt one "


def test_bad_zip_yields_nothing(spark):
    out = zip_entries(_pages(spark, [("http://h/bad.zip", b"not a zip")]))
    assert out.count() == 0
