"""WebGraph/LinkRank (A6), TextProfileSignature (T13), segment merger
(J7), FreeGenerator (S10)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.operators.generate import free_generate
from nutch_spark.operators.merger import merge_segments
from nutch_spark.operators.signatures import text_profile_signature
from nutch_spark.operators.webgraph import build_webgraph, linkrank, score_updater

CFG = NutchConfig()


def links_df(spark, pairs):
    return spark.createDataFrame(pairs, "url string, to_url string")


def test_webgraph_build(spark):
    g = build_webgraph(
        links_df(spark, [("a", "b"), ("a", "b"), ("a", "a"), ("b", "c"), ("a", "c")])
    )
    rows = {(r["src"], r["dst"]): r["outdeg"] for r in g.collect()}
    assert rows == {("a", "b"): 2, ("a", "c"): 2, ("b", "c"): 1}


def test_linkrank_sink_and_hub(spark):
    # star: a,b,c all link to hub; hub links back to a
    g = build_webgraph(
        links_df(spark, [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "a")])
    )
    scores = {r["url"]: r["score"] for r in
              linkrank(g, iterations=10, limit_domains=False).collect()}
    assert scores["hub"] > scores["a"] > scores["b"]  # a gets hub's score back
    assert scores["b"] == scores["c"]  # symmetric nodes equal
    # every score >= (1-d) + d*rankOne baseline
    base = 0.15 + 0.85 * (1.0 / 4)
    assert all(s >= base - 1e-9 for s in scores.values())


def test_linkrank_two_node_fixpoint(spark):
    # a <-> b symmetric: score converges toward (1-d) + d*(1/2 + s)
    g = build_webgraph(links_df(spark, [("a", "b"), ("b", "a")]))
    scores = {r["url"]: r["score"] for r in
              linkrank(g, iterations=10, limit_domains=False).collect()}
    assert scores["a"] == scores["b"]
    # fixpoint s = 0.15 + 0.85*(0.5 + s) has no finite solution < 1 loop;
    # just assert positive growth from initial 1.0 contributions
    assert scores["a"] > 1.0


def test_score_updater(spark):
    db = spark.createDataFrame(
        [("a", 1, 0.5), ("z", 1, 0.5)], "url string, status int, score float"
    )
    s = spark.createDataFrame([("a", 2.25)], "url string, score double")
    out = {r["url"]: r["score"] for r in score_updater(db, s).collect()}
    assert out["a"] == pytest.approx(2.25)
    assert out["z"] == 0.0  # cleared


def _java_profile_sig(text):
    # independent reimplementation of TextProfileSignature for the test
    import re
    toks = [t for t in re.findall(r"[a-z0-9]+", text.lower()) if len(t) > 2]
    counts = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    if not counts:
        return hashlib.md5(b"").hexdigest()
    maxf = max(counts.values())
    quant = int(maxf * 0.01 + 0.5)
    if quant < 2:
        quant = 2 if maxf > 1 else 1
    prof = []
    for t, c in counts.items():
        c = (c // quant) * quant
        if c >= quant:
            prof.append((t, c))
    prof.sort(key=lambda tc: (-tc[1], tc[0]))
    return hashlib.md5("\n".join(f"{t} {c}" for t, c in prof).encode()).hexdigest()


def test_text_profile_signature(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog the the",
        "aa bb c d",  # all tokens <= 2 chars -> empty profile
        "word word word other",
        "",
    ]
    d = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["signature"] for r in text_profile_signature(d).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _java_profile_sig(t), f"doc {i}"
    # same profile irrespective of word order
    d2 = spark.createDataFrame(
        [(0, "dog lazy the over jumps fox brown quick the the the")],
        "doc_id long, text string",
    )
    got2 = text_profile_signature(d2).collect()[0]["signature"]
    assert got2 == got[0]


def test_merge_segments_latest_wins(spark):
    cols = "url string, status int, fetch_time long, gen_time long"
    s1 = spark.createDataFrame([("a", 1, 100, 10), ("b", 2, 100, 10)], cols)
    s2 = spark.createDataFrame([("a", 2, 200, 20), ("c", 1, 50, 20)], cols)
    out = {r["url"]: (r["status"], r["fetch_time"]) for r in
           merge_segments([s1, s2]).collect()}
    assert out == {"a": (2, 200), "b": (2, 100), "c": (1, 50)}


def test_free_generate(spark):
    lines = spark.createDataFrame(
        [("http://h1.example.com/a\tnutch.score=3",),
         ("http://h1.example.com/a",),
         ("http://h2.example.com/b",),
         ("# comment",)],
        "value string",
    )
    fl = free_generate(spark, lines, CFG, 1_000, num_lists=2)
    rows = {r["url"]: r for r in fl.collect()}
    assert set(rows) == {"http://h1.example.com/a", "http://h2.example.com/b"}
    assert rows["http://h1.example.com/a"]["score"] == 3.0  # max_by dedup
    assert all(r["status"] == 1 and r["gen_time"] == 1_000 for r in rows.values())


def test_merge_segments_tie_break_by_segment_order(spark):
    """Equal (gen_time, fetch_time) ties resolve to the LATER segment
    (the reference's segment-name order), and re-merging a merged slice
    is a fixpoint — replay determinism."""
    cols = "url string, status int, fetch_time long, gen_time long"
    s1 = spark.createDataFrame([("a", 1, 100, 10)], cols)
    s2 = spark.createDataFrame([("a", 2, 100, 10)], cols)
    m = merge_segments([s1, s2])
    assert [(r["url"], r["status"]) for r in m.collect()] == [("a", 2)]
    # reversed input order flips the winner — ordinal is the tie key
    m_rev = merge_segments([s2, s1])
    assert [(r["url"], r["status"]) for r in m_rev.collect()] == [("a", 1)]
    # merging the merged output with itself changes nothing
    again = merge_segments([m, m])
    assert [(r["url"], r["status"]) for r in again.collect()] == [("a", 2)]


def test_link_dumper_inlink_detail(spark):
    from nutch_spark.operators.webgraph import link_dump_lines, link_dumper

    # a -> hub, b -> hub, hub -> a ; a also -> c
    g = build_webgraph(
        links_df(spark, [("a", "hub"), ("b", "hub"), ("hub", "a"), ("a", "c")])
    )
    scores = spark.createDataFrame(
        [("a", 2.0), ("b", 1.0), ("hub", 4.0), ("c", 0.5)], "url string, score double"
    )
    dump = {r["url"]: r["inlinks"] for r in link_dumper(g, scores=scores).collect()}
    # hub's inlinks carry each SOURCE node's full state
    hub = {ln["from_url"]: ln for ln in dump["hub"]}
    assert set(hub) == {"a", "b"}
    # a: 1 inlink (from hub), 2 outlinks (hub, c), score 2.0 -> outlink 1.0
    assert hub["a"]["num_inlinks"] == 1
    assert hub["a"]["num_outlinks"] == 2
    assert hub["a"]["inlink_score"] == 2.0
    assert hub["a"]["outlink_score"] == 1.0
    # b: 0 inlinks, 1 outlink, score 1.0 -> outlink 1.0
    assert hub["b"]["num_inlinks"] == 0
    assert hub["b"]["outlink_score"] == 1.0
    # c has one inlink from a
    assert [ln["from_url"] for ln in dump["c"]] == ["a"]
    # without scores, every node sits at the initial 1.0
    dump0 = {r["url"]: r["inlinks"] for r in link_dumper(g).collect()}
    assert {ln["inlink_score"] for ln in dump0["hub"]} == {1.0}
    # reader formatting (LinkDumper$Reader)
    lines = link_dump_lines(link_dumper(g, scores=scores), "c")
    assert lines[0] == "c:"
    assert lines[1] == ("  a - num inlinks: 1, num outlinks: 2, "
                        "inlink score: 2.0, outlink score: 1.0, metadata: {}")


def test_link_dumper_cap_is_deterministic(spark):
    from nutch_spark.operators.webgraph import link_dumper

    pairs = [(f"s{i:03d}", "t") for i in range(20)]
    g = build_webgraph(links_df(spark, pairs))
    dump = link_dumper(g, max_inlinks=5).filter("url = 't'").collect()[0]
    # first max_inlinks by ascending from_url (documented refinement of
    # the reference's nondeterministic reducer-order cap)
    assert [ln["from_url"] for ln in dump["inlinks"]] == [
        "s000", "s001", "s002", "s003", "s004"
    ]
