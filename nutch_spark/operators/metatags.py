"""HTML meta directives over the span payload — HTMLMetaProcessor port.

Re-expresses ``parse-html/.../HTMLMetaProcessor.java:40-220`` and the
directive consumption in ``HtmlParser.java:195-265`` over the
interleaved-docs span model. The corpus carries parsed span streams,
not raw HTML, so ``<meta>``/``<base>`` arrive as spans with
``kind='meta'`` and ``text='<name>:<content>'``:

- the producing HTML parser normalizes the ``name``/``property`` and
  ``http-equiv`` attributes into the single name slot (dispatch is by
  the reference's constant names anyway: ``robots`` is only ever a
  name/property meta, ``pragma``/``refresh`` only http-equiv —
  HTMLMetaProcessor.java:77-101,134-137);
- a content-less meta is just ``'<name>'`` (no colon) — like the
  reference's missing ``content`` attr it sets nothing
  (TestRobotsMetaProcessor case 9);
- ``media_ref`` may carry the producer's pre-resolved absolute target
  for ``refresh``/``base``; when absent the content is resolved against
  the page URL exactly like ``new URL(currURL, spec)``.

Directive semantics (HTMLMetaProcessor.java:101-126, case-insensitive
substring screens on the lowercased content):

- robots content contains ``none``     -> noindex + nofollow
- robots content contains ``noindex``  -> noindex
- robots content contains ``nofollow`` -> nofollow
- robots content contains ``noarchive``-> nocache
- robots content contains ``all``      -> nothing
- pragma content contains ``no-cache`` -> nocache
- refresh: time = content before ``';'`` parsed as int (parse failure
  drops the whole directive); target search only runs when a ``';'``
  exists: content after ``url=`` (any case; empty remainder -> the
  page itself) else after ``';'``, resolved; bare time or no ``';'``
  -> the page itself (HTMLMetaProcessor.java:146-193)
- base href: resolved against the page URL; the last ``<base>`` whose
  href resolves wins — an href-less or unresolvable one is skipped,
  keeping any earlier valid base (HTMLMetaProcessor.java:198-217)

Every screen is a JVM ``exists``/``filter`` fold over the span array —
one pass per doc, no Python, all expressible in ANSI SQL for the
DuckDB oracle.

Known corner deviations (documented, malformed-input only): Spark's
try_cast trims whitespace where Integer.parseInt throws, and a
malformed second refresh tag cannot inherit the first tag's refresh
flag to overwrite its href (HTMLMetaProcessor.java:160's re-read of
the sticky getRefresh()).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from nutch_spark.operators.js_parse import resolve_url

# Nutch.java:61 — the robots meta tag name
ROBOTS_METATAG = "robots"
# Nutch.java:67-76 — caching-forbidden parse-metadata key and policies
CACHING_FORBIDDEN_KEY = "caching.forbidden"
CACHING_FORBIDDEN_CONTENT = "content"
# Fetcher.java:97 — refresh faster than this is a temporary redirect
PERM_REFRESH_TIME = 5


def _meta_spans(spans: Column) -> Column:
    return F.filter(spans, lambda s: s["kind"] == F.lit("meta"))


def _name(s: Column) -> Column:
    """Lowercased tag name — the DOM walk lowercases attr names
    (HTMLMetaProcessor.java:79)."""
    return F.lower(F.regexp_extract(s["text"], r"^([^:]*)", 1))


def _content(s: Column) -> Column:
    """Raw content after the first ':'; '' when content-less (a missing
    content attr sets no directives, same as empty)."""
    return F.regexp_extract(s["text"], r"^[^:]*:(.*)$", 1)


def _robots_screen(metas: Column, token: str) -> Column:
    """Any robots meta whose lowercased content contains ``token`` —
    each tag's setters are sticky, so tags OR together. Takes the
    already-filtered meta spans so call sites share one derivation."""
    return F.exists(
        metas,
        lambda s: (_name(s) == F.lit(ROBOTS_METATAG))
        & (F.instr(F.lower(_content(s)), token) > 0),
    )


def meta_directives(spans: Column, url: Column) -> Column:
    """struct(no_index, no_follow, no_cache, base_href, refresh,
    refresh_time, refresh_href, robots) for one doc's span array."""
    metas = _meta_spans(spans)

    no_index = _robots_screen(metas, "noindex") | _robots_screen(metas, "none")
    no_follow = _robots_screen(metas, "nofollow") | _robots_screen(metas, "none")
    no_cache = _robots_screen(metas, "noarchive") | F.exists(
        metas,
        lambda s: (_name(s) == F.lit("pragma"))
        & (F.instr(F.lower(_content(s)), "no-cache") > 0),
    )

    # general tags keep document order; getMeta("robots") reads the
    # FIRST robots content (Metadata.get -> values[0]), which is what
    # IndexerMapReduce.java:279-285 screens for its noindex delete.
    # try_element_at: session runs ANSI mode, where element_at throws
    # on an empty array (docs with no such meta)
    robots = F.try_element_at(
        F.transform(
            F.filter(metas, lambda s: _name(s) == F.lit(ROBOTS_METATAG)),
            _content,
        ),
        F.lit(1),
    )

    # last <base> whose href RESOLVES wins: the reference only calls
    # setBaseHref when hrefNode != null AND the URL constructs
    # (HTMLMetaProcessor.java:198-217) — an href-less or unresolvable
    # <base> is ignored entirely, keeping any earlier valid one
    base_span = F.try_element_at(
        F.filter(
            metas,
            lambda s: (_name(s) == F.lit("base"))
            & (
                s["media_ref"].isNotNull()
                | ((_content(s) != F.lit(""))
                   & _resolve(url, _content(s)).isNotNull())
            ),
        ),
        F.lit(-1),
    )
    base_href = F.when(
        base_span.isNotNull(),
        F.coalesce(
            base_span["media_ref"], _resolve(url, _content(base_span))
        ),
    )

    # last parseable refresh wins
    refresh_spans = F.filter(
        metas,
        lambda s: (_name(s) == F.lit("refresh"))
        & F.regexp_extract(_content(s), r"^([^;]*)", 1)
        .try_cast("int")
        .isNotNull(),
    )
    rspan = F.try_element_at(refresh_spans, F.lit(-1))
    rcontent = _content(rspan)
    refresh = rspan.isNotNull()
    refresh_time = F.regexp_extract(rcontent, r"^([^;]*)", 1).try_cast("int")
    # target (HTMLMetaProcessor.java:159-193): the URL is only looked
    # for when a ';' exists; inside, 'url=' (any case, first hit) takes
    # everything after it — an EMPTY remainder means new URL("") throws
    # and new URL(currURL, "") resolves to the page itself; without
    # 'url=' the remainder after ';' is the spec. No ';' (bare time, or
    # 'url=' glued to the time) -> the page itself.
    has_semi = F.instr(rcontent, ";") > 0
    has_url_kw = F.instr(F.lower(rcontent), "url=") > 0
    after_url = F.regexp_extract(rcontent, r"(?i)url=(.*)$", 1)
    after_semi = F.regexp_extract(rcontent, r";(.*)$", 1)
    spec = F.when(has_semi & has_url_kw & (after_url != ""), after_url).when(
        has_semi & ~has_url_kw & (after_semi != ""), F.trim(after_semi)
    )
    refresh_href = F.when(
        refresh,
        F.coalesce(
            rspan["media_ref"],
            F.when(spec.isNotNull(), _resolve(url, spec)).otherwise(url),
        ),
    )

    full = F.struct(
        no_index.alias("no_index"),
        no_follow.alias("no_follow"),
        no_cache.alias("no_cache"),
        base_href.alias("base_href"),
        refresh.alias("refresh"),
        F.when(refresh, refresh_time).alias("refresh_time"),
        refresh_href.alias("refresh_href"),
        robots.alias("robots"),
    )
    # meta-less fast path: most of a web corpus carries no meta spans,
    # and the struct is evaluated wholesale per row (Catalyst keeps the
    # non-cheap projection un-collapsed), so one short-circuiting
    # `exists` scan spares every directive fold + regex for those rows.
    # Every directive is vacuous over zero metas, so the constant branch
    # is exactly what `full` evaluates to on an empty metas array.
    empty = F.struct(
        F.lit(False).alias("no_index"),
        F.lit(False).alias("no_follow"),
        F.lit(False).alias("no_cache"),
        F.lit(None).cast("string").alias("base_href"),
        F.lit(False).alias("refresh"),
        F.lit(None).cast("int").alias("refresh_time"),
        F.lit(None).cast("string").alias("refresh_href"),
        F.lit(None).cast("string").alias("robots"),
    )
    has_meta = F.exists(spans, lambda s: s["kind"] == F.lit("meta"))
    return F.when(has_meta, full).otherwise(empty)


def _resolve(base: Column, spec: Column) -> Column:
    """new URL(currURL, spec): absolute specs pass through, relative
    ones resolve against the page (js_parse.resolve_url is the shared
    java.net.URL twin)."""
    return resolve_url(base, spec)
