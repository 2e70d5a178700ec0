"""FileDumper + ResolveUrls (tools/FileDumper.java, ResolveUrls.java)."""

import hashlib
import os

from nutch_spark.operators.filedump import (
    create_file_name,
    detect_mime,
    file_dumper,
    resolve_urls,
    resolve_urls_summary,
    two_level_dir,
    url_md5,
)


def content_df(spark, rows):
    return spark.createDataFrame(rows, "url string, content binary, mime string")


FIX = [
    ("http://a.example.com/page.html", b"<html><body>x</body></html>", "text/html"),
    ("http://a.example.com/img/pic.png", b"\x89PNG\r\n\x1a\nxx", "image/png"),
    ("http://b.example.com/notes.txt", b"plain words", "text/plain"),
    ("http://b.example.com/", b"<html>root</html>", "text/html"),
]


def test_naming_scheme_matches_dumpfileutil():
    md5 = url_md5("http://a.example.com/page.html")
    assert md5 == hashlib.md5(b"http://a.example.com/page.html").hexdigest()
    # two-level fan-out = chars [0][8] / [16][24]
    assert two_level_dir(md5) == f"{md5[0]}{md5[8]}/{md5[16]}{md5[24]}"
    # 32-char base cap, 5-char ext cap, '?' stripped
    assert create_file_name("m", "b" * 40, "x" * 9) == "m_" + "b" * 32 + "." + "x" * 5
    assert create_file_name("m", "a?b", "ht?ml") == "m_ab.html"


def test_detect_mime_sniff():
    assert detect_mime(b"\x89PNG\r\n\x1a\n") == "image/png"
    assert detect_mime(b"\x1f\x8b\x08") == "application/gzip"
    assert detect_mime(b"  <!DOCTYPE html><html>") == "text/html"
    assert detect_mime(b"hello world") == "text/plain"
    assert detect_mime(b"\xff\xfe\x00\x01\x02\x80\xff") == "application/octet-stream"


def test_file_dumper_writes_fanout_files(spark, tmp_path):
    out = str(tmp_path / "dump")
    stats = file_dumper(content_df(spark, FIX), out)
    assert stats["files"] == 4
    assert stats["typeCounts"] == {"text/html": 2, "image/png": 1, "text/plain": 1}
    md5 = url_md5("http://a.example.com/page.html")
    expect = os.path.join(out, two_level_dir(md5), f"{md5}_page.html")
    assert os.path.exists(expect)
    with open(expect, "rb") as f:
        assert f.read() == b"<html><body>x</body></html>"
    # extension defaults to html for an extension-less url (FileDumper:182-186)
    md5_root = url_md5("http://b.example.com/")
    root = os.path.join(out, two_level_dir(md5_root), f"{md5_root}_.html")
    assert os.path.exists(root)


def test_file_dumper_mime_filter_and_stats_mode(spark, tmp_path):
    out = str(tmp_path / "dump2")
    stats = file_dumper(content_df(spark, FIX), out, mime_types=["image/png"])
    assert stats["files"] == 1
    assert stats["filteredCounts"] == {"image/png": 1}
    # stats-only mode writes nothing but counts everything
    stats2 = file_dumper(content_df(spark, FIX), None, mime_type_stats=True)
    assert stats2["files"] == 0
    assert stats2["typeCounts"]["text/html"] == 2


def test_file_dumper_reverse_url_dirs(spark, tmp_path):
    out = str(tmp_path / "rev")
    file_dumper(content_df(spark, FIX[:1]), out, reverse_url_dirs=True)
    sha = hashlib.sha256(b"http://a.example.com/page.html").hexdigest().upper()
    assert os.path.exists(os.path.join(out, "com/example/a", sha))


def test_resolve_urls_with_host_table(spark):
    urls = spark.createDataFrame(
        [("http://a.example.com/x",), ("http://dead.example.com/",)], "url string"
    )
    hosts = spark.createDataFrame([("a.example.com", "10.1.2.3")], "host string, ip string")
    out = resolve_urls(urls, resolver=hosts)
    got = {r["url"]: (r["ip"], r["resolved"]) for r in out.collect()}
    assert got["http://a.example.com/x"] == ("10.1.2.3", True)
    assert got["http://dead.example.com/"] == (None, False)
    s = resolve_urls_summary(out)
    assert s == {"total": 2, "resolved": 1, "errored": 1}


def test_resolve_urls_with_callable(spark):
    urls = spark.createDataFrame([("http://a.example.com/",)], "url string")
    out = resolve_urls(urls, resolver=lambda h: "127.0.0.1" if h else None)
    assert out.collect()[0]["ip"] == "127.0.0.1"
    # no resolver: everything unresolved (no network in this environment)
    none = resolve_urls(urls)
    assert resolve_urls_summary(none)["resolved"] == 0
