"""Trie matcher parity — randomized brute-force oracle ported from
``TestPrefixStringMatcher.java`` / ``TestSuffixStringMatcher.java``
(same rounds/sizes/alphabet, seeded for determinism), plus the column
dispatch paths (JVM literal chain vs broadcast-trie pandas UDF)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from nutch_spark.urls import trie as trie_mod
from nutch_spark.urls.trie import (
    PrefixStringMatcher,
    SuffixStringMatcher,
    prefix_match_cond,
    suffix_match_cond,
)

# TestPrefixStringMatcher.java:25-29 (TestSuffixStringMatcher mirrors)
NUM_TEST_ROUNDS = 20
MAX_TEST_PATTERNS = 100
MAX_PATTERN_LEN = 10
NUM_TEST_INPUTS_PER_ROUND = 100
MAX_INPUT_LEN = 20
ALPHABET = "abcd"  # the active alphabet in the reference test (:31-36)


def _rand_string(rng: random.Random, min_len: int, max_len: int) -> str:
    n = rng.randrange(min_len, max_len) if max_len > min_len else min_len
    return "".join(rng.choice(ALPHABET) for _ in range(n))


def test_prefix_matcher_random_oracle():
    rng = random.Random(20260821)
    for _ in range(NUM_TEST_ROUNDS):
        prefixes = [
            _rand_string(rng, 0, MAX_PATTERN_LEN)
            for _ in range(rng.randrange(MAX_TEST_PATTERNS))
        ]
        m = PrefixStringMatcher(prefixes)
        for _ in range(NUM_TEST_INPUTS_PER_ROUND):
            s = _rand_string(rng, 0, MAX_INPUT_LEN)
            hits = [p for p in prefixes if p and s.startswith(p)]
            assert m.matches(s) == bool(hits), (prefixes, s)
            if hits:
                assert m.shortest_match(s) == min(hits, key=len)
                assert m.longest_match(s) == max(hits, key=len)
            else:
                assert m.shortest_match(s) is None
                assert m.longest_match(s) is None


def test_suffix_matcher_random_oracle():
    rng = random.Random(20260822)
    for _ in range(NUM_TEST_ROUNDS):
        suffixes = [
            _rand_string(rng, 0, MAX_PATTERN_LEN)
            for _ in range(rng.randrange(MAX_TEST_PATTERNS))
        ]
        m = SuffixStringMatcher(suffixes)
        for _ in range(NUM_TEST_INPUTS_PER_ROUND):
            s = _rand_string(rng, 0, MAX_INPUT_LEN)
            hits = [p for p in suffixes if p and s.endswith(p)]
            assert m.matches(s) == bool(hits), (suffixes, s)
            if hits:
                assert m.shortest_match(s) == min(hits, key=len)
                assert m.longest_match(s) == max(hits, key=len)
            else:
                assert m.shortest_match(s) is None
                assert m.longest_match(s) is None


def test_empty_patterns_never_match():
    assert not PrefixStringMatcher([""]).matches("")
    assert not PrefixStringMatcher([""]).matches("a")
    assert not SuffixStringMatcher([""]).matches("anything")
    assert PrefixStringMatcher(["", "a"]).matches("ab")


# ---------------------------------------------------------------------------
# column dispatch
# ---------------------------------------------------------------------------

URLS = [
    "http://a.com/x", "https://a.com/", "http://b.org/f.PDF",
    "http://b.org/f.pdf", "ftp://c.net/", None, "",
]


@pytest.fixture()
def url_df(spark):
    return spark.createDataFrame([(u,) for u in URLS], "url string")


def _column_results(df, cond):
    return [r["m"] for r in df.select(cond.alias("m")).collect()]


def test_prefix_cond_jvm_path(url_df):
    got = _column_results(
        url_df, prefix_match_cond(F.col("url"), ["http://a.com/", "ftp://"])
    )
    assert got == [True, False, False, False, True, False, False]


def test_prefix_cond_trie_path_matches_jvm(url_df, monkeypatch):
    prefixes = ["http://a.com/", "ftp://", "https://"]
    jvm = _column_results(url_df, prefix_match_cond(F.col("url"), prefixes))
    monkeypatch.setattr(trie_mod, "JVM_LITERAL_CAP", 0)
    udf = _column_results(url_df, prefix_match_cond(F.col("url"), prefixes))
    assert jvm == udf


def test_suffix_cond_case_insensitive(url_df):
    got = _column_results(url_df, suffix_match_cond(F.col("url"), [".pdf"]))
    assert got == [False, False, True, True, False, False, False]


def test_suffix_cond_trie_path_matches_jvm(url_df, monkeypatch):
    sufs = [".pdf", ".exe", "/"]
    jvm = _column_results(url_df, suffix_match_cond(F.col("url"), sufs))
    monkeypatch.setattr(trie_mod, "JVM_LITERAL_CAP", 0)
    udf = _column_results(url_df, suffix_match_cond(F.col("url"), sufs))
    assert jvm == udf


def test_large_pattern_set_uses_trie(url_df):
    # >JVM_LITERAL_CAP distinct prefixes: still correct via the UDF path
    prefixes = [f"http://host{i}.com/" for i in range(100)] + ["http://a.com/"]
    got = _column_results(url_df, prefix_match_cond(F.col("url"), prefixes))
    assert got == [True, False, False, False, False, False, False]
