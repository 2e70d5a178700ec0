"""JEXL expression parity (T14 — the real-language upgrade).

Ports the reference's JEXL surface:
- ``util/JexlUtil.java:50-77`` (ISO-date rewrite, parse-failure -> error),
- ``index-jexl-filter/.../TestJexlIndexingFilter.java`` (allow / block /
  missing-config / invalid-expression),
- ``crawl/CrawlDatum.java:569-612`` (the CrawlDatum MapContext: status
  NAME, fetchTime, interval, score, signature, metadata keys with
  ``-`` -> ``_``),
plus unit coverage of the parser/compiler subset documented in
``nutch_spark/jexl.py``.
"""

import pytest
from pyspark.sql import functions as F

from nutch_spark.jexl import (
    JexlError,
    crawldatum_resolver,
    indexing_doc_resolver,
    jexl_column,
    jexl_filter_column,
    make_resolver,
    parse_jexl,
    rewrite_dates,
)
from nutch_spark.operators.indexer import jexl_index_filter


# --- JexlUtil date rewrite (JexlUtil.java:56-67) ---------------------------


def test_date_rewrite_to_epoch_millis():
    # 2016-03-20T00:00:00Z == 1458432000000 (the JexlUtil example date)
    assert rewrite_dates("fetchTime < 2016-03-20T00:00:00Z") == (
        "fetchTime < 1458432000000"
    )


def test_date_rewrite_replaces_all_occurrences_of_first_date():
    # Java String.replace replaces every occurrence of the first-found
    # date; a second DISTINCT date is left behind (single matcher.find()).
    two_same = "a > 2016-03-20T00:00:00Z && b < 2016-03-20T00:00:00Z"
    assert "2016" not in rewrite_dates(two_same)
    two_diff = "a > 2016-03-20T00:00:00Z && b < 2017-01-01T00:00:00Z"
    assert "2017-01-01T00:00:00Z" in rewrite_dates(two_diff)
    with pytest.raises(JexlError):
        parse_jexl(two_diff)  # leftover date is a parse error, as upstream


# --- parser unit tests ------------------------------------------------------


def test_parse_precedence_and_keywords():
    # 'a or b and c' groups as a or (b and c); keyword ops alias symbols
    assert parse_jexl("a or b and c") == parse_jexl("a || (b && c)")
    assert parse_jexl("x lt 3") == parse_jexl("x < 3")
    assert parse_jexl("x ge 3") == parse_jexl("x >= 3")
    assert parse_jexl("x ne null") == parse_jexl("x != null")
    assert parse_jexl("1 + 2 * 3") == (
        "bin", "+", ("num", 1), ("bin", "*", ("num", 2), ("num", 3))
    )


def test_parse_errors():
    for bad in ("doc.lang=<>:='en'",  # TestJexlIndexingFilter's invalid expr
                "a ==", "(a", "a b", ""):
        with pytest.raises(JexlError):
            parse_jexl(bad)
    with pytest.raises(JexlError):
        parse_jexl(None)


def test_string_escapes_keep_regex_backslashes():
    # JEXL's StringParser unescapes quotes/backslash but keeps unknown
    # escapes verbatim — '\d' must reach the regex engine as \d
    assert parse_jexl(r"url =~ '.*\d+'") == (
        "bin", "=~", ("var", ("url",)), ("str", r".*\d+")
    )
    assert parse_jexl(r"x == 'don\'t'")[3] == ("str", "don't")
    assert parse_jexl(r"x == 'a\\b'")[3] == ("str", "a\\b")
    # only the ACTIVE delimiter unescapes; \uXXXX decodes
    assert parse_jexl(r"x == 'don\"t'")[3] == ("str", 'don\\"t')
    assert parse_jexl(r'x == "don\'t"')[3] == ("str", "don\\'t")
    assert parse_jexl("x == '\\u0041'")[3] == ("str", "A")  # \uXXXX decodes
    assert parse_jexl("x == '\\uzz'")[3] == ("str", "\\uzz")  # not 4 hex: kept


def test_parse_dotted_and_indexed():
    assert parse_jexl("doc.lang") == ("var", ("doc", "lang"))
    assert parse_jexl("parseMeta['k']") == (
        "index", ("var", ("parseMeta",)), ("str", "k")
    )
    # exchange-jexl's canonical method-call form
    assert parse_jexl("doc.getFieldValue('host')") == (
        "call", ("var", ("doc",)), "getFieldValue", (("str", "host"),)
    )


def test_get_field_value_resolves_like_doc_field(indexed_doc):
    assert jexl_index_filter(
        indexed_doc, "doc.getFieldValue('lang')=='en'"
    ).count() == 1
    with pytest.raises(JexlError):
        jexl_index_filter(indexed_doc, "doc.someOtherMethod('x')").count()


# --- parser round-trip property ----------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _ATOMS = st.one_of(
        st.integers(min_value=0, max_value=10**12).map(lambda n: ("num", n)),
        st.floats(min_value=0.0, max_value=1e6, allow_nan=False)
        .map(lambda f: ("num", float(f"{f:.6g}"))),
        st.sampled_from(["x", "score", "fetchTime", "my_tag"])
        .map(lambda v: ("var", (v,))),
        st.text(alphabet="abcZ09_ .-", max_size=8).map(lambda s: ("str", s)),
        st.booleans().map(lambda b: ("bool", b)),
        st.just(("null",)),
    )

    def _exprs(children):
        bin_ops = st.sampled_from(
            ["||", "&&", "==", "!=", "<", "<=", ">", ">=", "+", "-", "*", "/", "%"]
        )
        return st.one_of(
            st.tuples(st.just("bin"), bin_ops, children, children),
            st.tuples(st.just("unary"), st.sampled_from(["!", "-"]), children),
            st.tuples(st.just("ternary"), children, children, children),
            st.tuples(st.just("elvis"), children, children),
        )

    _AST = st.recursive(_ATOMS, _exprs, max_leaves=12)

    def _render(node) -> str:
        # parenthesize everything: round-trip tests the tokenizer +
        # precedence-insensitive structural fidelity
        tag = node[0]
        if tag == "num":
            return repr(node[1])
        if tag == "str":
            body = node[1].replace("\\", "\\\\").replace("'", "\\'")
            return f"'{body}'"
        if tag == "bool":
            return "true" if node[1] else "false"
        if tag == "null":
            return "null"
        if tag == "var":
            return ".".join(node[1])
        if tag == "unary":
            return f"({node[1]} {_render(node[2])})"
        if tag == "bin":
            return f"({_render(node[2])} {node[1]} {_render(node[3])})"
        if tag == "ternary":
            return (f"({_render(node[1])} ? {_render(node[2])} "
                    f": {_render(node[3])})")
        if tag == "elvis":
            return f"({_render(node[1])} ?: {_render(node[2])})"
        raise AssertionError(node)

    @settings(max_examples=200, deadline=None)
    @given(_AST)
    def test_parser_round_trips_rendered_asts(ast):
        rendered = _render(ast)
        assert parse_jexl(rendered) == ast
except ImportError:  # pragma: no cover - hypothesis is baked in
    pass


# --- compile-to-Column semantics over the CrawlDatum context ----------------


@pytest.fixture()
def datums(spark):
    rows = [
        # url, status, fetch_time, retries, interval, score, sig, mod, meta
        ("http://a.example.com/1", 1, 1_458_000_000_000, 0, 2592000, 1.5,
         None, 0, {"my-tag": "news"}),
        ("http://b.example.com/2", 2, 1_459_000_000_000, 2, 2592000, 0.25,
         "ab" * 16, 0, {}),
        ("http://c.example.com/3", 3, 1_460_000_000_000, 1, 1296000, 4.0,
         None, 0, {"my_tag": "blog"}),
    ]
    return spark.createDataFrame(
        rows,
        "url string, status int, fetch_time long, retries int, "
        "fetch_interval int, score float, signature string, "
        "modified_time long, metadata map<string,string>",
    )


def _urls(df, expr):
    col = jexl_filter_column(expr, crawldatum_resolver())
    return sorted(r["url"] for r in df.filter(col).collect())


def test_status_is_the_status_name(datums):
    # CrawlDatum.java:576 exposes getStatusName(), not the byte
    assert _urls(datums, "status == 'db_fetched'") == [
        "http://b.example.com/2"
    ]
    assert _urls(datums, "status == 'db_unfetched' || status == 'db_gone'") == [
        "http://a.example.com/1", "http://c.example.com/3"
    ]


def test_date_literal_and_numeric_compare(datums):
    assert _urls(datums, "fetchTime < 2016-03-20T00:00:00Z") == [
        "http://a.example.com/1"
    ]
    assert _urls(datums, "score > 1.0 && retries lt 2") == [
        "http://a.example.com/1", "http://c.example.com/3"
    ]
    assert _urls(datums, "interval / 2 == 648000") == [
        "http://c.example.com/3"
    ]


def test_or_replays_jexl_left_to_right_strictness(datums):
    # JEXL strict+silent: a NULL left operand errors the script (row
    # dropped) even when the right side is true; a true left
    # short-circuits before a null right can error. Row a/c: signature
    # NULL -> 'signature == "x"' is fine (null-safe ==), but
    # 'score > signature' style null COMPARISONS make the operand null.
    # Use the metadata map: my_tag is NULL on row b.
    assert _urls(datums, "(my_tag == 'news') || retries == 2") == [
        "http://a.example.com/1", "http://b.example.com/2"
    ]
    # NULL-left comparison || true-right: dropped (b has no my_tag)
    assert _urls(datums, "(my_tag =~ 'n.*') || retries == 2") == [
        "http://a.example.com/1"
    ]
    # true-left || NULL-right: short-circuits, row kept
    assert _urls(datums, "retries == 2 || (my_tag =~ 'n.*')") == [
        "http://a.example.com/1", "http://b.example.com/2"
    ]


def test_and_replays_jexl_strictness_in_value_context(datums):
    # Spark's three-valued AND resurrects NULL && FALSE to FALSE; strict
    # JEXL errors the script to null. Identical under the IS TRUE row
    # gate, observable when && feeds a ternary. Row b has no my_tag, so
    # the =~ operand is NULL while 'retries == 99' is plain false:
    # JEXL nulls the whole script -> v must be NULL, not the else-branch.
    col = jexl_column(
        "((my_tag =~ 'n.*') && retries == 99) ? 1 : 2",
        crawldatum_resolver(),
    )
    vals = {r["url"]: r["v"] for r in datums.select("url", col.alias("v")).collect()}
    assert vals["http://b.example.com/2"] is None
    assert vals["http://a.example.com/1"] == 2  # true-left, false-right
    # false-left short-circuits before a null right can error
    col2 = jexl_column(
        "(retries == 99 && (my_tag =~ 'n.*')) ? 1 : 2", crawldatum_resolver()
    )
    vals2 = {r["url"]: r["v"] for r in datums.select("url", col2.alias("v")).collect()}
    assert vals2["http://b.example.com/2"] == 2
    # true-left, null-right errors (JEXL evaluates the right, gets null)
    col3 = jexl_column(
        "(retries == 2 && (my_tag =~ 'n.*')) ? 1 : 2", crawldatum_resolver()
    )
    vals3 = {r["url"]: r["v"] for r in datums.select("url", col3.alias("v")).collect()}
    assert vals3["http://b.example.com/2"] is None


def test_date_rewrite_invalid_calendar_date_is_jexl_error():
    # pattern-valid but calendar-invalid: must be JexlError, not ValueError
    with pytest.raises(JexlError):
        rewrite_dates("fetchTime < 2023-02-30T00:00:00Z")


def test_null_safe_equality(datums):
    # JEXL: 'x == null' is a null test; plain Spark '=' would 3VL it away
    assert _urls(datums, "signature == null") == [
        "http://a.example.com/1", "http://c.example.com/3"
    ]
    assert _urls(datums, "signature != null") == ["http://b.example.com/2"]


def test_regex_match_is_anchored(datums):
    # Java String.matches is whole-string: 'example' alone matches nothing
    assert _urls(datums, "url =~ 'example'") == []
    assert _urls(datums, "url =~ 'http://[ab].example.com/.*'") == [
        "http://a.example.com/1", "http://b.example.com/2"
    ]
    assert _urls(datums, "url !~ 'http://[ab].example.com/.*'") == [
        "http://c.example.com/3"
    ]
    with pytest.raises(JexlError):
        jexl_column("url =~ other", crawldatum_resolver())


def test_ternary_and_elvis(datums):
    got = datums.select(
        "url",
        jexl_column(
            "status == 'db_fetched' ? score * 2 : score",
            crawldatum_resolver(),
        ).alias("v"),
    )
    vals = {r["url"]: r["v"] for r in got.collect()}
    assert vals["http://b.example.com/2"] == 0.5
    assert vals["http://a.example.com/1"] == 1.5
    assert _urls(datums, "(signature ?: 'missing') == 'missing'") == [
        "http://a.example.com/1", "http://c.example.com/3"
    ]


def test_metadata_variables_with_dash_rewrite(datums):
    # CrawlDatum.java:601 registers Text metadata under key.replace('-','_'):
    # the variable my_tag must see both the 'my-tag' and 'my_tag' map keys
    assert _urls(datums, "my_tag == 'news'") == ["http://a.example.com/1"]
    assert _urls(datums, "my_tag == 'blog'") == ["http://c.example.com/3"]
    assert _urls(datums, "my_tag != null") == [
        "http://a.example.com/1", "http://c.example.com/3"
    ]


def test_metadata_key_mixing_dash_and_underscore(spark):
    # a key like 'my-tag_x' is exposed as variable my_tag_x — the whole
    # key space is dash-normalized, not just two spellings
    df = spark.createDataFrame(
        [("u1", {"my-tag_x": "v"}), ("u2", {})],
        "url string, metadata map<string,string>",
    )
    col = jexl_column("my_tag_x", crawldatum_resolver())
    got = {r["url"]: r["v"] for r in df.select("url", col.alias("v")).collect()}
    assert got == {"u1": "v", "u2": None}


def test_unknown_variable_raises():
    with pytest.raises(JexlError):
        jexl_column("doc.lang == 'en'", make_resolver({"url": F.col("url")}))


# --- TestJexlIndexingFilter port -------------------------------------------


@pytest.fixture()
def indexed_doc(spark):
    # the ported fixture: one doc with lang field + datum columns
    return spark.createDataFrame(
        [("http://nutch.apache.org/index.html", 2, 100, 0.5, "en",
          "The Foo Page", "this is a sample foo bar page. hope you enjoy it.")],
        "url string, status int, fetch_time long, score double, "
        "lang string, title string, text string",
    )


def test_allow_matching_document(indexed_doc):
    out = jexl_index_filter(indexed_doc, "doc.lang=='en'")
    assert out.count() == 1
    assert out.columns == indexed_doc.columns  # doc returned unmodified


def test_block_not_matching_documents(indexed_doc):
    ru = indexed_doc.withColumn("lang", F.lit("ru"))
    assert jexl_index_filter(ru, "doc.lang=='en'").count() == 0


def test_missing_configuration(indexed_doc):
    with pytest.raises(ValueError):
        jexl_index_filter(indexed_doc, None)


def test_invalid_expression(indexed_doc):
    with pytest.raises(JexlError):
        jexl_index_filter(indexed_doc, "doc.lang=<>:='en'").count()


def test_indexing_context_datum_names(indexed_doc):
    # status resolves to the NAME; title/text resolve flat (filter:68-69)
    out = jexl_index_filter(
        indexed_doc,
        "status == 'db_fetched' && fetchTime < 2016-03-20T00:00:00Z "
        "&& title =~ 'The .*' && doc.missing == null",
    )
    assert out.count() == 1
    assert jexl_index_filter(indexed_doc, "doc.missing == 'x'").count() == 0


# --- ReadHostDb context (ReadHostDb.java:96-131) ----------------------------


def test_hostdb_resolver(spark):
    from nutch_spark.operators.stats import read_hostdb

    hdb = spark.createDataFrame(
        [
            # host, urls, unfetched, fetched, gone, notmod, rtemp, rperm
            ("a.com", 10, 5, 4, 0, 1, 0, 0),
            ("b.com", 8, 8, 0, 0, 0, 0, 0),
            ("c.com", 6, 1, 2, 1, 0, 1, 1),
        ],
        "host string, n_urls long, n_db_unfetched long, n_db_fetched long, "
        "n_db_gone long, n_db_notmodified long, n_db_redir_temp long, "
        "n_db_redir_perm long",
    )
    def hosts(expr):
        return sorted(r["host"] for r in read_hostdb(hdb, jexl=expr).collect())

    # derived variables: ok = fetched + notModified, redirs = temp + perm
    assert hosts("ok > 0") == ["a.com", "c.com"]
    assert hosts("redirs == 2") == ["c.com"]
    assert hosts("unfetched == numRecords") == ["b.com"]
    # resolver-thread counters default to 0 when no fixture supplies them
    assert hosts("dnsFailures == 0 && connectionFailures == 0") == [
        "a.com", "b.com", "c.com"
    ]
    assert read_hostdb(hdb).count() == 3  # no expr -> pass-through


def test_indexing_context_unknown_bare_var_is_null(indexed_doc):
    # strict JEXL errors on an undefined variable; silent mode nulls the
    # script; the gate drops the row — never a compile-time error
    assert jexl_index_filter(indexed_doc, "nosuchvar == 'x'").count() == 0
    # null-safe == against null still matches
    assert jexl_index_filter(indexed_doc, "nosuchvar == null").count() == 1


def test_jexl_index_filter_rejects_unknown_dialect(indexed_doc):
    with pytest.raises(ValueError):
        jexl_index_filter(indexed_doc, "doc.lang=='en'", dialect="Jexl")


def test_hostdb_jexl_overrides(spark):
    # Generator.java:431-475: generate.max.count.expr /
    # generate.fetch.delay.expr evaluated over the HostDatum counters,
    # Math.round'ed into the per-host budget columns
    from nutch_spark.operators.generate import hostdb_jexl_overrides

    hdb = spark.createDataFrame(
        [("a.com", 9, 4, 0), ("b.com", 1, 0, 2)],
        "host string, n_db_unfetched long, n_db_fetched long, n_db_gone long",
    )
    out = hostdb_jexl_overrides(
        hdb,
        max_count_expr="unfetched > 4 ? 2 : 5",
        fetch_delay_expr="(fetched + gone) * 250 + 0.4",
    )
    rows = {r["host"]: r for r in out.collect()}
    assert rows["a.com"]["max_count"] == 2
    assert rows["b.com"]["max_count"] == 5
    assert rows["a.com"]["fetch_delay_ms"] == 1000  # round(1000.4)
    assert rows["b.com"]["fetch_delay_ms"] == 500
    # Math.round semantics: half rounds toward +inf, so -0.5 -> 0
    neg = hostdb_jexl_overrides(hdb, fetch_delay_expr="0 - 0.5")
    assert {r["fetch_delay_ms"] for r in neg.collect()} == {0}
    assert dict(out.dtypes)["max_count"] == "int"
    assert dict(out.dtypes)["fetch_delay_ms"] == "bigint"


# --- operator wiring ---------------------------------------------------------


def test_readdb_dump_jexl(datums):
    from nutch_spark.operators.stats import dump

    out = dump(datums, jexl="status == 'db_fetched' || score gt 3.0")
    assert sorted(r["url"] for r in out.collect()) == [
        "http://b.example.com/2", "http://c.example.com/3"
    ]


def test_generate_jexl_expr(spark, datums):
    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.generate import select_eligible

    df = datums.withColumn("gen_time", F.lit(None).cast("long"))
    cfg = NutchConfig()
    now = 1_470_000_000_000
    base = select_eligible(df, cfg, now)
    assert base.count() == 1  # only the db_unfetched row is eligible
    gated = select_eligible(df, cfg, now, jexl="score > 2.0")
    assert gated.count() == 0  # the unfetched row has score 1.5
    kept = select_eligible(df, cfg, now, jexl="my_tag == 'news'")
    assert [r["url"] for r in kept.collect()] == ["http://a.example.com/1"]
