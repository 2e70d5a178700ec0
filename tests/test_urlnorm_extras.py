"""Optional URL normalizers — golden pairs ported from the reference
plugin test suites (urlnormalizer-querystring/-ajax/-protocol/-slash/
-host: TestQuerystringURLNormalizer, TestAjaxURLNormalizer,
TestProtocolURLNormalizer, TestSlashURLNormalizer,
TestHostURLNormalizer). Pure-Python — no Spark session needed."""

from functools import partial

from nutch_spark.urls.normalizer import (
    ajax_normalize,
    apply_extra_normalizers,
    host_normalize,
    parse_kv_rules,
    protocol_normalize,
    querystring_normalize,
    slash_normalize,
)

PROTOCOLS = parse_kv_rules(
    """
example.org\thttp
example.net\thttp
example.io\thttps
example.nl\thttps
*.example.com\thttps
\thttps
invalid-rule1.example.top
invalid-rule2.example.top\thttps\thttp
invalid-rule3.example.top\t@mail
"""
)
SLASHES = parse_kv_rules("www.example.org +\nwww.example.net -")
HOSTS = parse_kv_rules(
    "*.example.com example.com\nwww.example.net example.net\n"
    "example.org www.example.org"
)


def test_querystring_sorts_params():
    n = querystring_normalize
    assert n("http://example.com/?c=d&a=b") == "http://example.com/?a=b&c=d"
    assert n("http://example.com/a/b/c") == "http://example.com/a/b/c"
    assert n("http://example.com:1234/a/b/c") == "http://example.com:1234/a/b/c"
    assert n("http://example.com:1234/a/b/c#ref") == "http://example.com:1234/a/b/c#ref"
    assert (
        n("http://example.com:1234/a/b/c?c=d&a=b#ref")
        == "http://example.com:1234/a/b/c?a=b&c=d#ref"
    )
    assert n("http://example.com/?c=d&a=b&a=c") == "http://example.com/?a=b&a=c&c=d"


def test_ajax_hashbang_roundtrip():
    n = ajax_normalize
    assert n("http://example.org/#!k=v") == "http://example.org/?_escaped_fragment_=k=v"
    assert (
        n("http://example.org/#!k=v&something=is wrong")
        == "http://example.org/?_escaped_fragment_=k=v%26something=is%20wrong"
    )
    assert (
        n("http://example.org/path.html?queryparam=queryvalue#!key1=value1&key2=value2")
        == "http://example.org/path.html?queryparam=queryvalue"
        "&_escaped_fragment_=key1=value1%26key2=value2"
    )
    # indexer scope maps back
    i = partial(ajax_normalize, scope="indexer")
    assert (
        i("http://example.org/?_escaped_fragment_=key=value")
        == "http://example.org/#!key=value"
    )
    assert (
        i("http://example.org/?key=value&_escaped_fragment_=key=value")
        == "http://example.org/?key=value#!key=value"
    )
    assert (
        i(
            "http://example.org/page.html?key=value"
            "&_escaped_fragment_=key=value%26something=is%20wrong"
        )
        == "http://example.org/page.html?key=value#!key=value&something=is wrong"
    )


def test_protocol_forcing():
    n = partial(protocol_normalize, rules=PROTOCOLS)
    assert n("https://example.org/") == "http://example.org/"
    assert n("https://example.net/x") == "http://example.net/x"
    assert n("http://example.io/x") == "https://example.io/x"
    assert n("http://www.example.com/") == "https://www.example.com/"  # wildcard
    assert n("http://example.com/") == "http://example.com/"  # bare domain: no match
    assert n("https://example.org:8080/") == "https://example.org:8080/"  # port set
    assert n("http://invalid-rule3.example.top/") == "http://invalid-rule3.example.top/"


def test_slash_policy():
    n = partial(slash_normalize, rules=SLASHES)
    assert n("http://example.org/") == "http://example.org/"  # unlisted
    assert n("http://www.example.org/") == "http://www.example.org/"  # root
    assert n("http://www.example.org/page") == "http://www.example.org/page/"
    assert (
        n("http://www.example.net/path/to/something/")
        == "http://www.example.net/path/to/something"
    )
    assert (
        n("http://www.example.org/page?a=b&c=d")
        == "http://www.example.org/page/?a=b&c=d"
    )
    assert (
        n("http://www.example.net/path/to/something/?a=b&c=d")
        == "http://www.example.net/path/to/something?a=b&c=d"
    )
    # no slash after a path with a file extension
    assert n("http://www.example.org/noise.mp3") == "http://www.example.org/noise.mp3"
    assert n("http://www.example.org/page.html") == "http://www.example.org/page.html"
    assert n("http://www.example.org/page.shtml") == "http://www.example.org/page.shtml"
    assert (
        n("http://www.example.org/this.is.not.an_extension")
        == "http://www.example.org/this.is.not.an_extension/"
    )


def test_host_rewrites():
    n = partial(host_normalize, rules=HOSTS)
    assert n("http://example.org/page.html") == "http://www.example.org/page.html"
    assert (
        n("http://www.example.net/path/to/something.html")
        == "http://example.net/path/to/something.html"
    )
    assert n("http://sub.example.com/x") == "http://example.com/x"  # wildcard
    assert n("http://example.com/?does=it&still=work") == "http://example.com/?does=it&still=work"


def test_extras_compose_as_chain():
    steps = [
        querystring_normalize,
        partial(protocol_normalize, rules=PROTOCOLS),
        partial(host_normalize, rules=HOSTS),
    ]
    out = apply_extra_normalizers("https://example.org/p?b=2&a=1", steps)
    assert out == "http://www.example.org/p?a=1&b=2"


def test_ajax_indexer_first_amp_quirk():
    """Reference-faithful quirk (AjaxURLNormalizer.java:138-151): the
    FIRST '&' splits query from the fragment pair, so extra parameters
    before _escaped_fragment_ leak into the rebuilt fragment — pinned
    so nobody 'fixes' us out of Java parity."""
    i = partial(ajax_normalize, scope="indexer")
    assert (
        i("http://h/p?a=1&b=2&_escaped_fragment_=k")
        == "http://h/p?a=1#!b=2&k"
    )
