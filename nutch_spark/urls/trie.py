"""Trie string matchers — parity with ``util/TrieStringMatcher.java``,
``util/PrefixStringMatcher.java`` and ``util/SuffixStringMatcher.java``.

The reference uses these inside ``urlfilter-prefix`` / ``urlfilter-suffix``
and the fast urlfilter so that matching N patterns costs O(len(input))
instead of O(N·len): one walk down a character trie, independent of how
many patterns were loaded (a denylist can carry 10^5-10^6 entries).

Semantics ported exactly (TrieStringMatcher.java:117-140):

- empty patterns are ignored (never match, even against empty input);
- ``matches``       — any pattern is a prefix/suffix of the input;
- ``shortestMatch`` — the matched pattern that ends earliest (prefix) /
  starts latest (suffix), or None;
- ``longestMatch``  — the longest matched pattern, or None.

Scale path: for a handful of literals, a chained JVM ``startswith`` /
``endswith`` OR stays in whole-stage codegen and is unbeatable; past
``JVM_LITERAL_CAP`` literals the chain's cost grows linearly with the
pattern count, so the dispatch switches to an Arrow-batched pandas UDF
that walks ONE broadcast trie per batch — O(len(url)) per row no matter
how many patterns, the same reason the reference builds the trie. The
matcher ships to executors by closure capture (it is a plain dict tree,
pickled once per worker), never per row.
"""

from __future__ import annotations

from collections.abc import Collection

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# past this many literal patterns the O(N) when-chain loses to the
# O(len) trie walk even with the Python/Arrow boundary tax (measured
# crossover is workload-dependent; 64 keeps short lists JVM-side and
# denylists on the trie)
JVM_LITERAL_CAP = 64

_TERMINAL = ""  # sentinel key marking a terminal node (no char is "")


class TrieStringMatcher:
    """Base trie (TrieStringMatcher.java:30-141). Children are a plain
    dict per node — Python's hash lookup replaces the reference's
    sorted-array binary search (an artifact of avoiding per-node
    HashMap allocations on the JVM, not a semantic)."""

    def __init__(self) -> None:
        self._root: dict = {}

    def _add(self, chars: str) -> None:
        """addPatternForward/-Backward (:117-140) after orientation:
        empty patterns are dropped by the length guard."""
        if not chars:
            return
        node = self._root
        for c in chars:
            node = node.setdefault(c, {})
        node[_TERMINAL] = True

    def matches(self, input: str) -> bool:  # noqa: A002 - reference name
        raise NotImplementedError

    def shortest_match(self, input: str) -> str | None:  # noqa: A002
        raise NotImplementedError

    def longest_match(self, input: str) -> str | None:  # noqa: A002
        raise NotImplementedError


class PrefixStringMatcher(TrieStringMatcher):
    """PrefixStringMatcher.java:33-89 — patterns inserted forward,
    input walked from the front."""

    def __init__(self, prefixes: Collection[str]):
        super().__init__()
        for p in prefixes:
            self._add(p)

    def matches(self, input: str) -> bool:  # noqa: A002
        node = self._root
        for c in input:
            node = node.get(c)
            if node is None:
                return False
            if _TERMINAL in node:
                return True
        return False

    def shortest_match(self, input: str) -> str | None:  # noqa: A002
        node = self._root
        for i, c in enumerate(input):
            node = node.get(c)
            if node is None:
                return None
            if _TERMINAL in node:
                return input[: i + 1]
        return None

    def longest_match(self, input: str) -> str | None:  # noqa: A002
        node = self._root
        result = None
        for i, c in enumerate(input):
            node = node.get(c)
            if node is None:
                break
            if _TERMINAL in node:
                result = input[: i + 1]
        return result


class SuffixStringMatcher(TrieStringMatcher):
    """SuffixStringMatcher.java:32-87 — patterns inserted reversed,
    input walked from the back."""

    def __init__(self, suffixes: Collection[str]):
        super().__init__()
        for s in suffixes:
            self._add(s[::-1])

    def matches(self, input: str) -> bool:  # noqa: A002
        node = self._root
        for c in reversed(input):
            node = node.get(c)
            if node is None:
                return False
            if _TERMINAL in node:
                return True
        return False

    def shortest_match(self, input: str) -> str | None:  # noqa: A002
        node = self._root
        for i, c in enumerate(reversed(input)):
            node = node.get(c)
            if node is None:
                return None
            if _TERMINAL in node:
                return input[len(input) - i - 1 :]
        return None

    def longest_match(self, input: str) -> str | None:  # noqa: A002
        node = self._root
        result = None
        for i, c in enumerate(reversed(input)):
            node = node.get(c)
            if node is None:
                break
            if _TERMINAL in node:
                result = input[len(input) - i - 1 :]
        return result


# ---------------------------------------------------------------------------
# column paths
# ---------------------------------------------------------------------------

def _trie_match_udf(matcher: TrieStringMatcher):
    @F.pandas_udf("boolean")
    def _mask(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: u is not None and matcher.matches(u))

    return _mask


def prefix_match_cond(url: Column, prefixes: Collection[str]) -> Column:
    """urlfilter-prefix's accept condition over a url column: TRUE iff
    the url starts with any non-empty listed prefix. JVM ``startswith``
    chain for small lists, broadcast-trie pandas UDF past
    JVM_LITERAL_CAP. NULL url => FALSE."""
    live = [p for p in prefixes if p]
    if not live:
        return F.lit(False)
    if len(live) <= JVM_LITERAL_CAP:
        cond = None
        for p in live:
            c = url.startswith(p)
            cond = c if cond is None else (cond | c)
        return F.coalesce(cond, F.lit(False))
    return _trie_match_udf(PrefixStringMatcher(live))(url)


def suffix_match_cond(
    url: Column, suffixes: Collection[str], case_insensitive: bool = True
) -> Column:
    """urlfilter-suffix's *match* condition (the filter REJECTS on
    match; callers negate). Lowercases both sides by default, matching
    the plugin's case-insensitive file format. NULL url => FALSE."""
    live = [s.lower() if case_insensitive else s for s in suffixes if s]
    if not live:
        return F.lit(False)
    target = F.lower(url) if case_insensitive else url
    if len(live) <= JVM_LITERAL_CAP:
        cond = None
        for s in live:
            c = target.endswith(s)
            cond = c if cond is None else (cond | c)
        return F.coalesce(cond, F.lit(False))
    matcher = SuffixStringMatcher(live)

    @F.pandas_udf("boolean")
    def _mask(urls: pd.Series) -> pd.Series:
        # Lowercase per-element: .str.lower() maps NULLs to NaN on some
        # pandas versions, which would slip past an `is not None` check.
        lower = case_insensitive
        return urls.map(
            lambda u: isinstance(u, str) and matcher.matches(u.lower() if lower else u)
        )

    return _mask(url)
