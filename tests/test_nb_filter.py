"""parsefilter-naivebayes: Classify.java/Train.java arithmetic ported
to handcrafted examples, plus the two-tier outlink gate
(NaiveBayesParseFilter.java:160-198)."""

import math

from pyspark.sql import functions as F

from nutch_spark.operators.nb_filter import (
    nb_classify,
    nb_outlink_gate,
    nb_tokens,
    nb_train,
)


def _train(spark):
    ex = spark.createDataFrame(
        [
            (0, "buy pills cheap pills"),
            (0, "casino bonus buy"),
            (1, "science research data"),
            (1, "research article science science"),
        ],
        "label int, text string",
    )
    return nb_train(ex)


def test_train_counters_match_reference(spark):
    model, stats = _train(spark)
    # Train.java:103-120: per-class example and token counts, shared vocab
    assert stats == {
        "numof_ir": 2,
        "numof_r": 2,
        "numwords_ir": 7,
        "numwords_r": 7,
        "vocab": 9,
    }
    freqs = {r["w"]: (r["freq_ir"], r["freq_r"]) for r in model.collect()}
    assert freqs["pills"] == (2, 0)
    assert freqs["science"] == (0, 3)
    assert freqs["buy"] == (2, 0)


def test_classify_matches_hand_computation(spark):
    model, stats = _train(spark)
    docs = spark.createDataFrame(
        [("u1", "buy pills"), ("u2", "science research"), ("u3", "unseen words")],
        "url string, text string",
    )
    out = {r["url"]: r for r in nb_classify(docs, model, stats).collect()}

    # Classify.java:92-108 replayed by hand for u1 ("buy pills"):
    d = math.log(7 + 9)
    prior = math.log(2) - math.log(4)
    p_ir = (math.log(2) + 1 - d) + (math.log(2) + 1 - d) + prior
    p_r = (1 - d) + (1 - d) + prior
    assert abs(out["u1"]["prob_ir"] - round(p_ir, 6)) < 1e-9
    assert abs(out["u1"]["prob_r"] - round(p_r, 6)) < 1e-9
    assert not out["u1"]["relevant"]
    assert out["u2"]["relevant"]
    # both-unseen text: identical sums in both classes, equal priors
    # -> tie, and Classify.java:110-113 classifies ties relevant
    assert out["u3"]["prob_ir"] == out["u3"]["prob_r"]
    assert out["u3"]["relevant"]


def test_tokenizer_reference_quirks(spark):
    df = spark.createDataFrame(
        [("a", "Foo9\nBar baz!"), ("b", ""), ("c", "   "), ("d", "a  b ")],
        "k string, t string",
    )
    toks = {
        r["k"]: r["toks"]
        for r in df.select("k", nb_tokens(F.col("t")).alias("toks")).collect()
    }
    # digits/newlines are removed (not blanked): Foo9\nBar fuses
    assert toks["a"] == ["foobar", "baz"]
    # "".split(" ") is [""] in Java; all-space collapses to empty array
    assert toks["b"] == [""]
    assert toks["c"] == []
    # interior empty tokens survive, trailing ones are dropped
    assert toks["d"] == ["a", "", "b"]


def test_outlink_gate_two_tier(spark):
    model, stats = _train(spark)
    pages = spark.createDataFrame(
        [("p1", "science research"), ("p2", "buy pills casino")],
        "url string, text string",
    )
    verdicts = nb_classify(pages, model, stats)
    outlinks = spark.createDataFrame(
        [
            ("p1", "http://x/anything"),
            ("p2", "http://x/keep-science-page"),
            ("p2", "http://x/junk"),
        ],
        "url string, to_url string",
    )
    kept = nb_outlink_gate(outlinks, verdicts, ["science"])
    got = sorted((r["url"], r["to_url"]) for r in kept.collect())
    # relevant p1 keeps everything; irrelevant p2 keeps only the
    # wordlist-matching target (filterUrl is case-sensitive contains)
    assert got == [
        ("p1", "http://x/anything"),
        ("p2", "http://x/keep-science-page"),
    ]
