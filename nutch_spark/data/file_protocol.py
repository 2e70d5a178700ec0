"""protocol-file: the ``file:`` protocol as a Spark source.

Re-expresses ``protocol-file/.../File.java:100-170`` +
``FileResponse.java:100-310``. Two surfaces:

- :func:`read_files` — the crawl-a-filesystem-tree fast path: Spark's
  ``binaryFile`` datasource scans a glob executor-side (splittable,
  content column pruned unless read), each file becoming a 200 Content
  row with ``file.content.limit`` truncation, extension-detected mime,
  and the mtime as Last-Modified — what a whole-tree FreeGenerator +
  fetch would produce without per-URL dispatch.
- :func:`fetch_file_urls` — per-URL protocol semantics for a
  fetch list, as an Arrow-batched ``mapInPandas`` doing executor-side
  ``os.stat``/reads (the one place imperative I/O is the point):

  * missing file -> 404/NOTFOUND; unreadable -> 401/ACCESS_DENIED
    (FileResponse:144-152)
  * non-canonical path (symlink / dot segments) -> 300 redirect to the
    canonical URI, followed in-process up to ``max_redirects`` like
    File.getProtocolOutput:113-170, surfacing the final location
  * ``mtime <= datum.modified_time`` -> 304/NOTMODIFIED
    (FileResponse:172-177)
  * directory -> ``list2html`` index page (Index-of title, ``<a href>``
    per child, RFC-1123 mtimes, size column, optional ``../`` when
    ``file.crawl.parent``; FileResponse:277-310), children sorted for
    determinism (the reference leaves OS order — "fix me: we might
    want to sort"; we do)
  * regular file -> content truncated to ``file.content.limit``
    (-1 = unlimited, File.java:76), full length still reported.

Scale: both paths are partition-parallel over a shared filesystem
(HDFS/NFS/object-store fuse in production); no driver I/O anywhere.
"""

from __future__ import annotations

import os
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nutch_spark.data.httpdate import to_string as _http_date_str
from nutch_spark.operators.index_filters import detect_mime_by_url

_OUT_SCHEMA = (
    "url string, status int, outcome string, content binary, "
    "content_type string, content_length long, last_modified_ms long, "
    "location string"
)

# http code -> ProtocolStatus name (File.getProtocolOutput:113-170)
_OUTCOMES = {200: "success", 304: "notmodified", 401: "access_denied",
             404: "notfound", 300: "moved", 500: "exception"}


def _http_date(mtime: float) -> str:
    # HttpDateFormat.FORMAT via the shared util (net/protocols parity)
    return _http_date_str(int(mtime * 1000))


def _list2html(path: str, include_dotdot: bool) -> bytes:
    """FileResponse.list2html:277-310, children sorted."""
    out = ["<html><head>", f"<title>Index of {path}</title></head>\n",
           f"<body><h1>Index of {path}</h1><pre>\n"]
    if include_dotdot:
        out.append("<a href='../'>../</a>\t-\t-\t-\n")
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        time = _http_date(os.path.getmtime(full))
        if os.path.isdir(full):
            out.append(f"<a href='{name}/'>{name}/</a>\t{time}\t-\n")
        elif os.path.isfile(full):
            size = os.path.getsize(full)
            out.append(f"<a href='{name}'>{name}</a>\t{time}\t{size}\n")
    out.append("</pre></body></html>\n")
    return "".join(out).encode()


def _mime_of(path: str) -> str:
    from nutch_spark.operators.index_filters import _DEFAULT_MIME, _EXT_MIME

    ext = path.rsplit(".", 1)[-1].lower() if "." in os.path.basename(path) else ""
    return _EXT_MIME.get(ext, _DEFAULT_MIME)


def _fetch_one(
    url: str,
    modified_time_ms: int,
    content_limit: int,
    crawl_parents: bool,
    max_redirects: int,
) -> dict:
    loc = None
    path = url[len("file:"):] if url.startswith("file:") else url
    if path.startswith("//"):
        # RFC-8089 authority: file://localhost/etc/x, file:///etc/x —
        # drop the (empty or localhost) authority, keep the abs path
        rest = path[2:]
        cut = rest.find("/")
        if cut < 0:
            return dict(url=url, status=404, outcome="notfound", location=loc)
        path = rest[cut:]
    for _ in range(max_redirects + 1):
        if not os.path.exists(path):
            return dict(url=url, status=404, outcome="notfound", location=loc)
        if not os.access(path, os.R_OK):
            return dict(url=url, status=401, outcome="access_denied", location=loc)
        real = os.path.realpath(path)
        if real != path:
            # 300 -> follow to the canonical file (File.java:140-160)
            path, loc = real, "file:" + real
            continue
        mtime = os.path.getmtime(path)
        mtime_ms = int(mtime * 1000)
        if modified_time_ms and mtime_ms <= modified_time_ms:
            return dict(url=url, status=304, outcome="notmodified",
                        last_modified_ms=mtime_ms, location=loc)
        if os.path.isdir(path):
            body = _list2html(path, crawl_parents and path != "/")
            return dict(url=url, status=200, outcome="success", content=body,
                        content_type="text/html", content_length=len(body),
                        last_modified_ms=mtime_ms, location=loc)
        size = os.path.getsize(path)
        n = size if content_limit < 0 else min(size, content_limit)
        with open(path, "rb") as fh:
            body = fh.read(n)
        return dict(url=url, status=200, outcome="success", content=body,
                    content_type=_mime_of(path), content_length=size,
                    last_modified_ms=mtime_ms, location=loc)
    return dict(url=url, status=500, outcome="exception", location=loc)


def fetch_file_urls(
    urls: DataFrame,
    *,
    url_col: str = "url",
    modified_col: str | None = None,
    content_limit: int = 1024 * 1024,
    crawl_parents: bool = False,
    max_redirects: int = 5,
) -> DataFrame:
    """Per-URL file: protocol fetch (schema: url, status, outcome,
    content, content_type, content_length, last_modified_ms, location)."""
    cols = [url_col] + ([modified_col] if modified_col else [])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                mt = int(r[modified_col]) if modified_col and pd.notna(
                    r[modified_col]
                ) else 0
                rows.append(
                    _fetch_one(
                        r[url_col], mt, content_limit, crawl_parents,
                        max_redirects,
                    )
                )
            out = pd.DataFrame(
                rows,
                columns=["url", "status", "outcome", "content",
                         "content_type", "content_length",
                         "last_modified_ms", "location"],
            )
            # keys absent from a row dict become float NaN; in a batch
            # where a column is ALL NaN, Arrow converts float64->binary
            # as b'' instead of null — force object dtype with real None
            # so a 404's content is null regardless of batch composition
            out = out.astype(object).where(pd.notna(out), None)
            yield out

    return urls.select(*cols).mapInPandas(run, _OUT_SCHEMA)


def read_files(
    spark: SparkSession,
    path_glob: str,
    *,
    content_limit: int = 1024 * 1024,
    resolve_mime: bool = False,
) -> DataFrame:
    """Whole-tree scan via the binaryFile source: one 200 row per file.

    ``resolve_mime=True`` upgrades the extension-only content type to
    the full ``MimeUtil.autoResolveContentType`` decision (extension +
    payload magic, ``data/mimeutil.py`` — what the reference's Content
    constructor applies, protocol/Content.java:85): a ``.html`` file
    holding gzip bytes comes back application/gzip. Costs nothing extra
    when the content column is read anyway; with the default
    extension-only path Spark can prune the content column entirely
    for metadata-only queries, which is why it stays opt-in."""
    df = spark.read.format("binaryFile").load(path_glob)
    url = F.regexp_replace(F.col("path"), "^file:/+", "file:/")
    content = (
        F.col("content")
        if content_limit < 0
        else F.substring(F.col("content"), 1, content_limit)
    )
    if resolve_mime:
        from nutch_spark.data.mimeutil import auto_resolve_mime_col

        # no header in the file protocol: resolution = extension +
        # magic (typeName null, MimeUtil.java:158-183 path)
        mime = auto_resolve_mime_col(
            F.lit(None).cast("string"), F.col("path"), F.col("content")
        )
    else:
        mime = detect_mime_by_url(F.col("path"))
    return df.select(
        url.alias("url"),
        F.lit(200).cast("int").alias("status"),
        F.lit("success").alias("outcome"),
        content.alias("content"),
        mime.alias("content_type"),
        F.col("length").alias("content_length"),
        (F.unix_millis(F.col("modificationTime"))).alias("last_modified_ms"),
        F.lit(None).cast("string").alias("location"),
    )
