"""protocol-file: per-URL file: fetch semantics and the binaryFile
tree-scan path (File.java:100-170, FileResponse.java:100-310)."""

import os

from nutch_spark.data.file_protocol import fetch_file_urls, read_files


def _fetch(spark, rows, **kw):
    schema = "url string, mt long" if rows and len(rows[0]) == 2 else "url string"
    df = spark.createDataFrame(rows, schema)
    out = fetch_file_urls(df, modified_col="mt" if "mt" in df.columns else None, **kw)
    return {r["url"]: r for r in out.collect()}


def test_file_statuses(spark, tmp_path):
    f = tmp_path / "page.html"
    f.write_bytes(b"<html>hello world</html>")
    got = _fetch(
        spark,
        [("file:" + str(f), 0), ("file:" + str(tmp_path / "gone.txt"), 0)],
    )
    ok = got["file:" + str(f)]
    assert ok["status"] == 200 and ok["outcome"] == "success"
    assert bytes(ok["content"]) == b"<html>hello world</html>"
    assert ok["content_type"] == "text/html"
    assert ok["content_length"] == 24
    missing = got["file:" + str(tmp_path / "gone.txt")]
    assert missing["status"] == 404 and missing["outcome"] == "notfound"
    assert missing["content"] is None


def test_truncation_reports_full_length(spark, tmp_path):
    f = tmp_path / "big.txt"
    f.write_bytes(b"x" * 100)
    got = _fetch(spark, [("file:" + str(f), 0)], content_limit=10)
    r = got["file:" + str(f)]
    # FileResponse:210-231: content capped, Content-Length = true size
    assert len(bytes(r["content"])) == 10
    assert r["content_length"] == 100


def test_not_modified(spark, tmp_path):
    f = tmp_path / "a.txt"
    f.write_bytes(b"v1")
    future = int(os.path.getmtime(f) * 1000) + 10_000
    got = _fetch(spark, [("file:" + str(f), future)])
    assert got["file:" + str(f)]["status"] == 304
    assert got["file:" + str(f)]["outcome"] == "notmodified"


def test_directory_listing(spark, tmp_path):
    (tmp_path / "sub").mkdir()
    (tmp_path / "b.txt").write_bytes(b"bb")
    (tmp_path / "a.txt").write_bytes(b"a")
    got = _fetch(spark, [("file:" + str(tmp_path), 0)])
    r = got["file:" + str(tmp_path)]
    assert r["status"] == 200 and r["content_type"] == "text/html"
    html = bytes(r["content"]).decode()
    assert f"<title>Index of {tmp_path}</title>" in html
    # children sorted; dirs get trailing slash and '-' size
    assert html.index("<a href='a.txt'>") < html.index("<a href='b.txt'>")
    assert "<a href='sub/'>sub/</a>" in html and "\t-\n" in html
    assert html.count("\t2\n") == 1  # b.txt size column


def test_symlink_redirects_to_canonical(spark, tmp_path):
    real = tmp_path / "real.txt"
    real.write_bytes(b"data")
    link = tmp_path / "link.txt"
    link.symlink_to(real)
    got = _fetch(spark, [("file:" + str(link), 0)])
    r = got["file:" + str(link)]
    # followed in-process (File.getProtocolOutput redirect loop), the
    # canonical target surfaces as location
    assert r["status"] == 200
    assert r["location"] == "file:" + str(real)
    assert bytes(r["content"]) == b"data"


def test_read_files_tree_scan(spark, tmp_path):
    (tmp_path / "x.json").write_bytes(b'{"k":1}')
    (tmp_path / "y.css").write_bytes(b"body{}")
    out = {r["url"]: r for r in read_files(spark, str(tmp_path)).collect()}
    assert len(out) == 2
    x = out["file:" + str(tmp_path / "x.json")]
    assert x["content_type"] == "application/json"
    assert x["content_length"] == 7
    assert x["status"] == 200 and x["last_modified_ms"] > 0


def test_read_files_resolve_mime(spark, tmp_path):
    """resolve_mime=True runs extension+magic resolution: a .html file
    holding gzip bytes resolves application/gzip, an extensionless html
    file resolves text/html, a truthful .json file keeps its type."""
    (tmp_path / "fake.html").write_bytes(b"\x1f\x8b\x08\x00gzip-bytes")
    (tmp_path / "noext").write_bytes(b"<!doctype html><html></html>")
    (tmp_path / "x.json").write_bytes(b'{"k":1}')
    out = {
        r["url"].rsplit("/", 1)[-1]: r["content_type"]
        for r in read_files(spark, str(tmp_path), resolve_mime=True).collect()
    }
    assert out["fake.html"] == "application/gzip"
    assert out["noext"] == "text/html"
    assert out["x.json"] == "application/json"


def test_authority_and_dot_segments(spark, tmp_path):
    f = tmp_path / "auth.txt"
    f.write_bytes(b"ok")
    (tmp_path / "sub").mkdir()
    dotted = f"file:{tmp_path}/sub/../auth.txt"
    got = _fetch(
        spark,
        [("file://localhost" + str(f), 0), ("file://" + str(f), 0), (dotted, 0)],
    )
    # RFC-8089 authority forms resolve to the same absolute path
    assert got["file://localhost" + str(f)]["status"] == 200
    assert got["file://" + str(f)]["status"] == 200
    # dot segments redirect to the canonical URI (File.java:140-160)
    r = got[dotted]
    assert r["status"] == 200
    assert r["location"] == "file:" + str(f)


def test_all_miss_batch_content_is_null(spark, tmp_path):
    """A batch containing ONLY miss rows (no content key anywhere) must
    still yield NULL content, not b'' — pandas turns an all-NaN column
    into float64 and Arrow converts that to empty bytes unless the UDF
    forces object dtype."""
    urls = spark.createDataFrame(
        [(f"file:{tmp_path}/nope_{i}.txt",) for i in range(3)], "url string"
    ).coalesce(1)
    rows = fetch_file_urls(urls).collect()
    assert all(r["outcome"] == "notfound" for r in rows)
    assert all(r["content"] is None for r in rows)
