"""parse-js: JS string-literal outlink extraction
(JSParseFilter.java:195-275; TestJSParseFilter's pure-JS expectation —
exactly the URL-shaped literals survive)."""

from nutch_spark.operators.js_parse import js_outlinks

SCRIPT = """
function pick(form) {
    provider = form.elements['engine'].value;
    if (provider == "any") { provider = "one"; }
    if (provider == "one") {
        form.action = "http://search.example.com/p:crawl";
    } else if (provider == "two") {
        form.action = "http://search-two.example.org/crawl";
    }
    days = 90; // plain comment
    expires = "; expires=" + d.toGMTString();
    document.cookie = "engine=" + provider + "; path=/";
}
"""


def _links(spark, url, script):
    df = spark.createDataFrame([(url, script)], "url string, script string")
    return sorted(r["to_url"] for r in js_outlinks(df).collect())


def test_pure_js_extraction(spark):
    # only the two URL-shaped literals survive; 'engine', "any", "one",
    # "; path=/" (whitespace) and "engine=" (no /.) are all rejected
    assert _links(spark, "http://example.com/a.js", SCRIPT) == [
        "http://search-two.example.org/crawl",
        "http://search.example.com/p:crawl",
    ]


def test_resolution_branches(spark):
    script = (
        'a = "/root/x.html";\n'
        "b = 'img/y.png';\n"
        'c = "www.example.org/z";\n'
        'd = "//cdn.example.net/lib.js";\n'
        'e = "http://abs.example.com/q?a=1&amp;b=2";\n'
    )
    assert _links(spark, "http://h.example.com/dir/page.js", script) == [
        "http://abs.example.com/q?a=1&b=2",
        "http://cdn.example.net/lib.js",
        "http://h.example.com/dir/img/y.png",
        "http://h.example.com/root/x.html",
        "http://www.example.org/z",
    ]


def test_pathless_base_dir_join(spark):
    # a base with no path resolves dir-relative specs against '/'
    assert _links(spark, "http://h.example.com", 'x = "a/b.html";') == [
        "http://h.example.com/a/b.html"
    ]
