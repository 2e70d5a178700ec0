"""parse-zip: archive fan-out into per-entry parses.

Re-expresses ``parse-zip/.../ZipParser.java`` + ``ZipTextExtractor.java:
61-115``: each non-directory entry *with an extension* becomes a
sub-document at ``url + "/" + entryName`` with mime detected from the
name; parseable entries (text/html here) contribute their parsed text
to the archive's accumulated text as ``name + " " + text + " "`` in
archive order, and html entries' outlinks are collected onto the
archive (``extractText``:85-105). Unparseable entries (no parser for
the mime) are listed but contribute nothing, like the reference's
swallowed ParseException. Extension-less entries and directories are
skipped entirely (the ``i != -1`` guard / ``isDirectory``:68).

Spark-first split of labor: the *unzip* is the one genuinely
imperative step — stdlib ``zipfile`` over the binary content column in
an Arrow-batched ``mapInPandas`` (per-archive work, embarrassingly
parallel, no shuffle). Everything downstream — mime lookup, tag
stripping, href extraction + resolution, the per-archive text/outlink
roll-up — is JVM columns and one ``groupBy(url)``.
"""

from __future__ import annotations

import io
import zipfile
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.operators.feed import strip_tags
from nutch_spark.operators.index_filters import detect_mime_by_url
from nutch_spark.operators.js_parse import resolve_url

_ENTRY_SCHEMA = (
    "url string, idx int, name string, size long, content binary"
)


def zip_entries(
    pages: DataFrame, *, url_col: str = "url", content_col: str = "content"
) -> DataFrame:
    """Explode zip archives into (url, idx, name, size, content) rows —
    non-directory, extension-carrying entries in archive order."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = r[content_col]
                if raw is None:
                    continue
                try:
                    zf = zipfile.ZipFile(io.BytesIO(bytes(raw)))
                except zipfile.BadZipFile:
                    continue
                idx = 0
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    base = info.filename.rsplit("/", 1)[-1]
                    if "." not in base:
                        continue  # ZipTextExtractor:86 skips no-extension
                    rows.append(
                        dict(
                            url=r[url_col],
                            idx=idx,
                            name=info.filename,
                            size=info.file_size,
                            content=zf.read(info),
                        )
                    )
                    idx += 1
            yield pd.DataFrame(
                rows, columns=["url", "idx", "name", "size", "content"]
            )

    return pages.select(url_col, content_col).mapInPandas(run, _ENTRY_SCHEMA)


def parse_zip(
    pages: DataFrame, *, url_col: str = "url", content_col: str = "content"
) -> tuple[DataFrame, DataFrame]:
    """Returns (entries, archives).

    entries: url, idx, name, entry_url, mime, size, text (null when no
    parser exists for the mime), outlinks array<string>.
    archives: url, text (the reference's ``name + " " + text + " "``
    accumulation over parseable entries, archive order), outlinks.
    """
    e = zip_entries(pages, url_col=url_col, content_col=content_col)
    entry_url = F.concat(F.col("url"), F.lit("/"), F.col("name"))
    mime = detect_mime_by_url(F.col("name"))
    decoded = F.col("content").cast("string")
    text = (
        F.when(mime == "text/plain", decoded)
        .when(mime == "text/html", strip_tags(decoded))
    )
    hrefs = F.when(
        mime == "text/html",
        F.regexp_extract_all(decoded, F.lit('<a[^>]*href="([^"]*)"'), 1),
    ).otherwise(F.array().cast("array<string>"))
    entries = e.select(
        "url",
        "idx",
        "name",
        entry_url.alias("entry_url"),
        mime.alias("mime"),
        "size",
        text.alias("text"),
        F.transform(
            hrefs, lambda h: resolve_url(entry_url, h)
        ).alias("outlinks"),
    )
    part = F.when(
        F.col("text").isNotNull(),
        F.concat(F.col("name"), F.lit(" "), F.col("text"), F.lit(" ")),
    )
    archives = (
        entries.groupBy("url")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            part.isNotNull(),
                            F.struct(F.col("idx"), part.alias("part")),
                        )
                    )
                ).getField("part"),
                "",
            ).alias("text"),
            F.flatten(
                F.array_sort(
                    F.collect_list(F.struct(F.col("idx"), F.col("outlinks")))
                ).getField("outlinks")
            ).alias("outlinks"),
        )
    )
    return entries, archives
