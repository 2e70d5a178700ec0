"""RegexURLFilter semantics: [+-]regex lines, first match wins, no match
=> reject (lib-regex-filter/RegexURLFilterBase expectations)."""

from nutch_spark.urls.filters import (
    CRAWL_RULES,
    PrefixURLFilter,
    RegexURLFilter,
    SuffixURLFilter,
    default_filter,
)


def test_default_rules():
    f = default_filter()
    assert f.accept("http://example.com/page.html")
    assert not f.accept("file:///etc/passwd")
    assert not f.accept("ftp://example.com/x")
    assert not f.accept("mailto:user@example.com")
    # media suffix deny
    assert not f.accept("http://example.com/logo.png")
    assert not f.accept("http://example.com/LOGO.JPG")
    # query chars deny
    assert not f.accept("http://example.com/p?x=1")
    assert not f.accept("http://example.com/p@2")
    # path loop deny
    assert not f.accept("http://example.com/a/b/a/c/a/d/")


def test_first_match_wins():
    f = RegexURLFilter(["+^http://good", "-^http://", "+."])
    assert f.accept("http://good.example.com/")
    assert not f.accept("http://bad.example.com/")
    assert f.accept("https://other.example.com/")


def test_no_match_rejects():
    f = RegexURLFilter(["+^https://only"])
    assert not f.accept("http://example.com/")


def test_none_rejected():
    assert not default_filter().accept(None)


def test_crawl_rules_accept_media_urls():
    f = RegexURLFilter(CRAWL_RULES)
    assert f.accept("http://h1.example.com/img/photo.jpg")
    assert f.accept("https://h1.example.com/doc/1")
    assert not f.accept("mailto:x@y.com")
    assert not f.accept("file:///x")


def test_prefix_suffix_filters():
    pf = PrefixURLFilter(["http://a.com/", "https://a.com/"])
    assert pf.accept("http://a.com/x")
    assert not pf.accept("http://b.com/x")
    sf = SuffixURLFilter([".pdf", ".exe"])
    assert sf.accept("http://a.com/x.html")
    assert not sf.accept("http://a.com/x.PDF")


def test_suffix_filter_case_insensitive_entries():
    """A mixed-case suffix entry ('.GIF') must still reject — suffixes
    are lowercased to match the lowercased URL."""
    sf = SuffixURLFilter([".GIF"])
    assert not sf.accept("http://x/a.gif")
    assert not sf.accept("http://x/a.GIF")
    assert sf.accept("http://x/a.html")
