"""JVM host/domain expressions (`host_expr` / `domain_expr`) must agree
exactly with their per-string Python twins (`get_host` / `get_domain`) —
these now feed the generate partition key, the fetch queue key, dedup
keys and webgraph/indexer domains, so any divergence re-keys politeness
or dedup groups silently."""

import pytest
from pyspark.sql import functions as F

from nutch_spark.urls.urlutil import (
    domain_expr,
    get_domain,
    get_host,
    host_expr,
)

URLS = [
    "http://host3.example.com/doc/42",
    "https://sub.a.example.com/x/y?q=1",
    "HTTP://UPPER.Example.COM/Path",
    "http://user:pw@a.example.com/x",          # userinfo stripped
    "http://user@a.com",                       # userinfo, no path
    "http://a.com:8080/x",                     # port excluded from host
    "http://a.com:8080",                       # port, no path
    "http://1.2.3.4/x",                        # IP host
    "http://1.2.3.4.5/x",                      # not an IP (5 octets)
    "http://256.1.1.1/x",                      # IP regex is width-only
    "http://a.co.uk/x",                        # 2-level public suffix
    "http://b.a.co.uk/x",
    "http://x.example/x",                      # 'example' suffix
    "http://foo.barbaz/x",                     # unknown TLD fallback
    "http://single/x",                         # single-label host
    "http://com/x",                            # bare suffix as host
    "http://a..com/x",                         # empty label
    "http://a.com./x",                          # trailing-dot host
    "http://a.com?q=1",                        # query before any slash
    "http://a.com#f",                          # fragment before any slash
    "http:///x",                               # empty host
    "http://",                                 # empty everything
    "ftp+weird-x.y://h.example.com/z",         # exotic scheme chars
    "notaurl",
    "mailto:user@a.com",                       # no ://
    "//a.com/x",                               # scheme-relative
    "http//a.com/x",                           # missing colon
    "",
    None,
    "http://a.com/x\n",                        # newline in path
    "http://ünïcode.example.com/x",            # non-ASCII host
]

# domain_expr also accepts bare hosts (no ://) like get_domain does
HOSTS = [
    "host3.example.com", "A.B.CO.UK", "1.2.3.4", "1.2.3.4.", "a.com.",
    "localhost", "com", "co.uk", "uk", "a..com", ".", "..", "x.y.z.co.jp",
]


def test_host_expr_matches_get_host(spark):
    df = spark.createDataFrame([(u,) for u in URLS], "url string")
    rows = df.select("url", host_expr(F.col("url")).alias("h")).collect()
    for r in rows:
        assert r["h"] == get_host(r["url"]), repr(r["url"])


@pytest.mark.parametrize("values", [URLS, HOSTS])
def test_domain_expr_matches_get_domain(spark, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    rows = df.select("v", domain_expr(F.col("v")).alias("d")).collect()
    for r in rows:
        assert r["d"] == get_domain(r["v"]), repr(r["v"])
