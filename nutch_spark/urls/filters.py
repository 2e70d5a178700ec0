"""URL filter chain — first-veto conjunction of filters.

Re-expresses ``net/URLFilters.java:51-57`` (chain: first null wins) and
``lib-regex-filter/.../RegexURLFilterBase.java`` + ``urlfilter-regex``
(rule file of ``[+-]<regex>`` lines, **first matching rule wins**, no
match => reject). The default rule set mirrors
``conf/regex-urlfilter.txt.template`` — but note that template denies
media suffixes, which would veto our media-span outlinks; crawl
configs therefore pass an explicit rule list (SURVEY.md T5 caveat).

Prefix / suffix / domain filters (``urlfilter-prefix`` etc.) are
broadcast-set membership tests, vectorizable without regex.
"""

from __future__ import annotations

import re
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import functions as F

# conf/regex-urlfilter.txt.template (comment/blank lines removed)
DEFAULT_RULES: list[str] = [
    r"-^(?:file|ftp|mailto):",
    r"-(?i)\.(?:gif|jpg|png|ico|css|sit|eps|wmf|zip|ppt|mpg|xls|gz|rpm|tgz|mov|exe|jpeg|bmp|js)$",
    r"-[?*!@=]",
    r"-.*(/[^/]+)/[^/]+\1/[^/]+\1/",
    r"+.",
]

# rule set for crawl runs over the interleaved-docs corpus: accept http(s)
# on any host, reject everything else; media refs are first-class outlinks
# (parse-html/.../DOMContentUtils.java:84-97)
CRAWL_RULES: list[str] = [
    r"-^(?:file|ftp|mailto):",
    r"+^https?://",
    r"-.",
]


class RegexURLFilter:
    """First-match-wins accept/deny regex chain."""

    def __init__(self, rules: Sequence[str] | None = None):
        self._rules: list[tuple[bool, re.Pattern]] = []
        for line in rules if rules is not None else DEFAULT_RULES:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            sign = line[0]
            if sign not in "+-":
                raise ValueError(f"rule must start with + or -: {line!r}")
            self._rules.append((sign == "+", re.compile(line[1:])))

    def accept(self, url: str | None) -> bool:
        if url is None:
            return False
        for is_accept, pat in self._rules:
            if pat.search(url):
                return is_accept
        return False  # no match => reject (RegexURLFilterBase)


def default_filter() -> RegexURLFilter:
    return RegexURLFilter(DEFAULT_RULES)


def crawl_filter() -> RegexURLFilter:
    return RegexURLFilter(CRAWL_RULES)


class PrefixURLFilter:
    """urlfilter-prefix: accept iff url starts with any listed prefix."""

    def __init__(self, prefixes: Iterable[str]):
        self._prefixes = tuple(prefixes)

    def accept(self, url: str | None) -> bool:
        return url is not None and url.startswith(self._prefixes)


class SuffixURLFilter:
    """urlfilter-suffix: *reject* iff url ends with any listed suffix."""

    def __init__(self, suffixes: Iterable[str]):
        self._suffixes = tuple(suffixes)

    def accept(self, url: str | None) -> bool:
        return url is not None and not url.lower().endswith(self._suffixes)


def url_filter_udf(rules: Sequence[str] | None = None):
    """Arrow-batched pandas UDF: url -> boolean accept mask."""
    rule_list = list(rules) if rules is not None else list(DEFAULT_RULES)

    @F.pandas_udf("boolean")
    def _filt(urls: pd.Series) -> pd.Series:
        filt = RegexURLFilter(rule_list)  # compiled once per batch-worker
        return urls.map(filt.accept)

    return _filt
