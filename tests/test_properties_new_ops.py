"""Property tests for the round-2 operators: the NB tokenizer against
a literal Java-semantics reference, JS outlink resolution invariants,
and crawl_fetch merge determinism under repartitioning."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nutch_spark.operators.js_parse import js_outlinks
from nutch_spark.operators.merger import merge_crawl_fetch
from nutch_spark.operators.nb_filter import nb_tokens


def _java_split_tokens(text: str) -> list[str]:
    """Literal port of Classify.java:61-62 tokenization semantics:
    strip non-alpha (keeping spaces), lowercase, String.split(" ")
    (interior empties kept, trailing empties dropped, "" -> [""])."""
    clean = re.sub(r"[^a-zA-Z ]", "", text).lower()
    if clean == "":
        return [""]
    parts = clean.split(" ")
    while parts and parts[-1] == "":
        parts.pop()
    return parts


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_categories=("Cs",)
            ),
            max_size=40,
        ),
        min_size=1,
        max_size=25,
    )
)
def test_nb_tokens_match_java_semantics(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, t string")
    got = {
        r["i"]: r["toks"]
        for r in df.select("i", nb_tokens(F.col("t")).alias("toks")).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _java_split_tokens(t), repr(t)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(
                list("abcXYZ0123456789/.-_?&=#: '\"\\\n\t")
            ),
            max_size=80,
        ),
        min_size=1,
        max_size=15,
    )
)
def test_js_outlinks_always_absolute(spark, scripts):
    df = spark.createDataFrame(
        [(f"http://base{i}.example.com/dir/p.js", s) for i, s in enumerate(scripts)],
        "url string, script string",
    )
    for r in js_outlinks(df).collect():
        # every resolved outlink is absolute and whitespace-free
        assert re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", r["to_url"]), r["to_url"]
        assert not re.search(r"\s", r["to_url"])


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),            # url id
            st.integers(0x21, 0x26),      # fetch status incl. ineligible
            st.integers(0, 3),            # segment
        ),
        min_size=1,
        max_size=30,
    )
)
def test_merge_crawl_fetch_partition_invariant(spark, rows):
    segs = {}
    for uid, status, seg in rows:
        segs.setdefault(seg, []).append((f"http://u{uid}/", status, seg * 100))
    dfs = [
        spark.createDataFrame(v, "url string, status int, fetch_time long")
        for _, v in sorted(segs.items())
    ]
    a = sorted(map(tuple, merge_crawl_fetch(dfs).collect()))
    b = sorted(
        map(
            tuple,
            merge_crawl_fetch(
                [d.repartition(7).sortWithinPartitions("status") for d in dfs]
            ).collect(),
        )
    )
    # the total tie-break makes the merge replay-deterministic under
    # any physical row order
    assert a == b
