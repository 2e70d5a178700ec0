"""parse-js: outlink extraction from JavaScript string literals.

Re-expresses ``parse-js/.../JSParseFilter.java:195-275``: candidate
URLs are quoted string literals with no whitespace/quote characters
inside (``STRING_PATTERN``:196-198), kept only when the whole literal
looks URL-ish — optional leading slash, then two non-space runs joined
by ``/`` or ``.`` (``URI_PATTERN``:200-202 under ``matches()``).
Survivors resolve like ``getJSLinks``:233-249: a ``www.`` literal gets
``http://`` prefixed, everything else resolves against the page URL,
and ``&amp;`` is unescaped.

Spark-first: one map-side pass of JVM ``regexp_extract_all`` + column
logic — no Python, no shuffle beyond the final per-page dedup.
Deviations (documented):

- the reference's backreference trick (``(\\*(?:"|'))…\\1``) is split
  into one pass per quote character so the same pattern runs on RE2
  engines (DuckDB oracle); escaped-quote literals (``\\"…\\"``) may
  differ — real-world JS rarely carries them.
- outlinks are deduped and sorted per page instead of scan-ordered
  (two extraction passes interleave); the reference's own test treats
  the result as a set.
- relative resolution implements RFC-3986 merge without dot-segment
  collapse (the URL normalizer chain downstream owns that), matching
  ``new URL(base, spec)`` for dot-free paths.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# candidate must wholly look like a URL: optional '/', two \S runs
# joined by '/' or '.' (URI_PATTERN under matches())
_URI_FULL = r"^/?[^\s]+?[/.][^\s]+$"
_SCHEME = r"^[a-zA-Z][a-zA-Z0-9+.-]*:"


def resolve_url(base: Column, spec: Column) -> Column:
    """java.net.URL(base, spec) for the shapes JS literals take."""
    origin = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)", 1)
    # directory of the base path; a path-less base gets '/'
    base_dir = F.when(
        F.regexp_extract(base, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*/", 0) != "",
        F.regexp_extract(base, r"^(.*/)[^/]*$", 1),
    ).otherwise(F.concat(origin, F.lit("/")))
    scheme = F.regexp_extract(base, r"^([a-zA-Z][a-zA-Z0-9+.-]*):", 1)
    return (
        F.when(spec.rlike(_SCHEME), spec)
        .when(spec.startswith("//"), F.concat(scheme, F.lit(":"), spec))
        .when(spec.startswith("/"), F.concat(origin, spec))
        .otherwise(F.concat(base_dir, spec))
    )


def js_outlinks(
    pages: DataFrame, *, url_col: str = "url", js_col: str = "script"
) -> DataFrame:
    """Extract (url, to_url) outlink pairs from JS content, deduped and
    sorted per page."""
    js = F.col(js_col)
    dq = F.regexp_extract_all(js, F.lit("\\\\*\"([^\\s\"']+?)\""), 1)
    sq = F.regexp_extract_all(js, F.lit("\\\\*'([^\\s\"']+?)'"), 1)
    cand = F.explode(F.array_distinct(F.concat(dq, sq))).alias("_cand")
    exploded = pages.select(F.col(url_col).alias("url"), cand).filter(
        F.col("_cand").rlike(_URI_FULL)
    )
    spec = F.col("_cand")
    resolved = F.when(
        spec.startswith("www."), F.concat(F.lit("http://"), spec)
    ).otherwise(resolve_url(F.col("url"), spec))
    return (
        exploded.select(
            "url", F.regexp_replace(resolved, "&amp;", "&").alias("to_url")
        )
        .distinct()
    )
