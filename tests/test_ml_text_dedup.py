"""Training-data ops: text analysis, exact/minhash/simhash/jaccard dedup."""

import pytest
from pyspark.sql import functions as F

from nutch_spark.ml.dedup import (
    exact_dedup,
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_near_duplicates,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash32,
    simhash_near_duplicates,
    word_shingles,
)
from nutch_spark.ml.text import analyze, fingerprint, lang_id, quality_score, token_count


def docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_token_count_and_fingerprint(spark):
    d = docs(spark, ["one two  three", "", "  ", "one two three"])
    rows = d.select(
        "doc_id", token_count(F.col("text")).alias("n"), fingerprint(F.col("text")).alias("fp")
    ).collect()
    n = {r["doc_id"]: r["n"] for r in rows}
    assert n == {0: 3, 1: 0, 2: 0, 3: 3}
    fp = {r["doc_id"]: r["fp"] for r in rows}
    assert fp[0] == fp[3]  # whitespace-normalized equality
    assert fp[0] != fp[1]


def test_lang_id(spark):
    d = docs(spark, [
        "the cat and the dog with that hat",
        "der Hund und die Katze nicht",
        "les chats des villes est une",
        "los gatos las casas que para",
        "zzzz qqqq",
    ])
    got = [r[0] for r in d.select(lang_id(F.col("text"))).collect()]
    assert got == ["en", "de", "fr", "es", "und"]


def test_quality_score_ordering(spark):
    good = "The quick brown fox jumps over the lazy dog and runs far away. " * 10
    bad = "!!! ??? ... ;;; :::"
    d = docs(spark, [good, bad])
    rows = d.select("doc_id", quality_score(F.col("text")).alias("q")).collect()
    q = {r["doc_id"]: r["q"] for r in rows}
    assert q[0] > q[1]
    assert 0.0 <= q[1] <= q[0] <= 1.0


def test_analyze_shape(spark):
    d = docs(spark, ["The cat and the dog.", "short"])
    out = analyze(d)
    assert {"doc_id", "n_tokens", "n_bpe_tokens", "lang_pred", "quality",
            "fingerprint", "n_chars", "alpha_ratio", "punct_ratio",
            "stopword_ratio", "mean_word_len"} <= set(out.columns)
    assert out.count() == 2


def test_exact_dedup(spark):
    d = docs(spark, ["same text here", "SAME   text here", "different"])
    groups = exact_duplicates(d).collect()
    assert len(groups) == 1
    assert groups[0]["n_docs"] == 2
    assert groups[0]["keeper"] == 0
    kept = exact_dedup(d)
    assert kept.count() == 2
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 2]


BASE = ("the quick brown fox jumps over the lazy dog while the sun shines "
        "bright over the green hills and the river flows quietly")


def test_minhash_near_duplicates(spark):
    near = BASE.replace("quietly", "slowly")  # one-word change
    far = "completely unrelated content about spark window functions and parquet files"
    d = docs(spark, [BASE, near, far])
    cands = minhash_lsh_candidates(d, num_hashes=16, bands=8)
    pairs = {(r["doc_a"], r["doc_b"]) for r in cands.collect()}
    assert (0, 1) in pairs
    verified = minhash_near_duplicates(d, threshold=0.5, num_hashes=16, bands=8)
    vp = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in verified.collect()}
    assert (0, 1) in vp and vp[(0, 1)] >= 0.5
    assert all(p != (0, 2) and p != (1, 2) for p in vp)


def test_minhash_signature_properties(spark):
    d = docs(spark, [BASE, BASE, "other words entirely distinct"])
    sigs = d.select("doc_id", minhash_signature(F.col("text"), 8).alias("s")).collect()
    s = {r["doc_id"]: r["s"] for r in sigs}
    assert s[0] == s[1]  # identical text -> identical signature
    assert s[0] != s[2]
    assert len(s[0]) == 8


def test_ngram_jaccard_pairs(spark):
    near = BASE.replace("quietly", "slowly")
    d = docs(spark, [BASE, near, "unrelated stuff entirely here now"])
    pairs = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
             ngram_jaccard_pairs(d, threshold=0.3).collect()}
    assert list(pairs) == [(0, 1)]
    assert 0.3 <= pairs[(0, 1)] < 1.0


def test_simhash(spark):
    near = BASE + " extra"
    d = docs(spark, [BASE, near, "totally different words about nothing relevant"])
    rows = d.select("doc_id", simhash32(F.col("text")).alias("sh")).collect()
    sh = {r["doc_id"]: r["sh"] for r in rows}
    ham01 = bin(sh[0] ^ sh[1]).count("1")
    ham02 = bin(sh[0] ^ sh[2]).count("1")
    assert ham01 < ham02  # similar docs closer in Hamming space
    dups = simhash_near_duplicates(d, max_hamming=max(ham01, 1))
    got = {(r["doc_a"], r["doc_b"]) for r in dups.collect()}
    assert (0, 1) in got


def test_simhash64(spark):
    from nutch_spark.ml.dedup import simhash64, simhash64_near_duplicates

    near = BASE + " extra"
    d = docs(spark, [BASE, near, "totally different words about nothing relevant"])
    rows = d.select("doc_id", simhash64(F.col("text")).alias("s")).collect()
    sh = {r["doc_id"]: (r["s"]["sh_lo"], r["s"]["sh_hi"]) for r in rows}
    for lo, hi in sh.values():  # halves are 32-bit non-negative
        assert 0 <= lo < 2**32 and 0 <= hi < 2**32
    ham = lambda a, b: bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")
    assert ham(sh[0], sh[1]) < ham(sh[0], sh[2])
    dups = simhash64_near_duplicates(d, max_hamming=max(ham(sh[0], sh[1]), 1))
    got = {(r["doc_a"], r["doc_b"]) for r in dups.collect()}
    assert (0, 1) in got
    # empty/blank text fingerprints to (0, 0)
    z = docs(spark, [""]).select(simhash64(F.col("text")).alias("s")).collect()[0]["s"]
    assert (z["sh_lo"], z["sh_hi"]) == (0, 0)


def test_simhash64_matches_simhash32_low_half(spark):
    """The low half of simhash64 uses the same md5-prefix token hash as
    simhash32, so the two must agree bit-for-bit — the documented
    parity-twin relationship."""
    from nutch_spark.ml.dedup import simhash64

    d = docs(spark, [BASE, "short words", ""])
    rows = d.select(
        simhash32(F.col("text")).alias("s32"), simhash64(F.col("text")).alias("s64")
    ).collect()
    for r in rows:
        assert r["s32"] == r["s64"]["sh_lo"]


def test_simhash64_bucket_cap_bounds_adversarial_bucket(spark, caplog):
    """An adversarial corpus where every doc lands in one bucket (all
    empty -> fingerprint 0) must not go quadratic when bucket_cap is
    set: candidate pairs are bounded by bands * C(cap, 2), and the
    dropped memberships are logged, not silent."""
    import logging

    from nutch_spark.ml.dedup import simhash64_near_duplicates

    from nutch_spark.ml.capobs import flush_cap_drop_logs

    d = docs(spark, [""] * 30)
    with caplog.at_level(logging.WARNING, logger="nutch_spark.ml.dedup"):
        capped = simhash64_near_duplicates(d, max_hamming=3, bucket_cap=5)
        n_capped = capped.count()
        flush_cap_drop_logs()  # drop counts ride the action; join loggers
    assert n_capped == 5 * 4 // 2  # C(5,2) pairs, identical across 4 bands
    assert any(
        "dropped" in rec.getMessage()
        for rec in caplog.records
        if rec.name == "nutch_spark.ml.dedup"
    )
    uncapped = simhash64_near_duplicates(d, max_hamming=3)
    assert uncapped.count() == 30 * 29 // 2


def test_minhash_bucket_cap_bounds_adversarial_bucket(spark, caplog):
    """Cap parity with simhash64: a corpus of identical docs (all bands
    collide) must stay bounded under bucket_cap, with logged drops; and
    capping must not lose pairs in ordinary buckets below the cap."""
    import logging

    from nutch_spark.ml.capobs import flush_cap_drop_logs

    d = docs(spark, ["same text every time"] * 30)
    with caplog.at_level(logging.WARNING, logger="nutch_spark.ml.dedup"):
        capped = minhash_lsh_candidates(d, num_hashes=16, bands=4, bucket_cap=5)
        n_capped = capped.count()
        flush_cap_drop_logs()
    assert n_capped == 5 * 4 // 2  # C(5,2), identical across all bands
    assert any(
        "minhash_lsh_candidates" in rec.getMessage() and "dropped" in rec.getMessage()
        for rec in caplog.records
        if rec.name == "nutch_spark.ml.dedup"
    )
    assert minhash_lsh_candidates(d, num_hashes=16, bands=4).count() == 30 * 29 // 2

    # ordinary corpus below the cap: capped == uncapped (verified path)
    near = BASE.replace("quietly", "slowly")
    d2 = docs(spark, [BASE, near, "totally different words about parquet"])
    got = minhash_near_duplicates(d2, threshold=0.5, num_hashes=16, bands=8, bucket_cap=10)
    want = minhash_near_duplicates(d2, threshold=0.5, num_hashes=16, bands=8)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_bucket_cap_is_single_pass(spark):
    """Round-5 cap-cost contract: setting bucket_cap must not add a
    second pass over the banded data. Evidence on both axes: (a) plan
    construction launches ZERO Spark jobs (round 4 ran an eager
    .count() here), and (b) the drop counter is a CollectMetrics node
    riding the caller's own plan, above the ranking window."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    d = docs(spark, ["same text every time"] * 30)
    capped = minhash_lsh_candidates(d, num_hashes=16, bands=4, bucket_cap=5)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "capped plan construction ran Spark jobs"
    plan = capped._jdf.queryExecution().optimizedPlan().toString()
    assert "CollectMetrics" in plan
    # the cap filter must sit ABOVE the metrics node (metric sees the
    # uncapped rows) — CollectMetrics below any Filter on _rn
    assert plan.index("Filter") < plan.index("CollectMetrics")


def test_simhash32_bucket_cap(spark, caplog):
    import logging

    from nutch_spark.ml.dedup import simhash_near_duplicates

    from nutch_spark.ml.capobs import flush_cap_drop_logs

    d = docs(spark, [""] * 20)
    with caplog.at_level(logging.WARNING, logger="nutch_spark.ml.dedup"):
        assert simhash_near_duplicates(d, bucket_cap=4).count() == 4 * 3 // 2
        flush_cap_drop_logs()
    assert any(
        "simhash_near_duplicates" in rec.getMessage()
        for rec in caplog.records
        if rec.name == "nutch_spark.ml.dedup"
    )


def test_shingles(spark):
    d = docs(spark, ["a b c d", "a b"])
    rows = d.select("doc_id", word_shingles(F.col("text"), 3).alias("sh")).collect()
    sh = {r["doc_id"]: r["sh"] for r in rows}
    assert sh[0] == ["a b c", "b c d"]
    assert sh[1] == ["a b"]  # shorter than k: whole text


def test_gopher_quality_rules(spark):
    from nutch_spark.ml.text import gopher_quality

    good = ("the quick brown fox jumps over that lazy dog and keeps running "
            "with steady pace to be sure of the outcome and more of it " * 5)
    bullets = "\n".join(f"- item {i}" for i in range(20))
    dups = "\n".join(["same line of text here"] * 10 + ["unique one"])
    symbols = " ".join(["word###"] * 60)
    docs = spark.createDataFrame(
        [(1, good), (2, bullets), (3, dups), (4, symbols), (5, ""), (6, None)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_quality(docs).collect()}
    assert out[1]["gopher_pass"] is True
    assert out[1]["stop_hits"] >= 2 and out[1]["alpha_word_frac"] >= 0.8
    # 20/20 bullet lines > 0.9 threshold
    assert out[2]["bullet_line_frac"] == 1.0 and out[2]["gopher_pass"] is False
    # 9 duplicate lines of 11 > 0.3
    assert out[3]["dup_line_frac"] > 0.3 and out[3]["gopher_pass"] is False
    assert out[3]["dup_line_char_frac"] > 0.2
    # 3 hashes per word -> symbol/word ratio 3.0 > 0.1
    assert out[4]["symbol_word_ratio"] == 3.0 and out[4]["gopher_pass"] is False
    assert out[5]["n_words"] == 0 and out[5]["gopher_pass"] is False
    assert out[6]["n_words"] == 0  # null text


def test_gopher_repetition(spark):
    from nutch_spark.ml.text import gopher_repetition

    # "a b a b a b" -> top 2-gram "a b" occurs 3x, covers 9 chars of 11.
    rep = "a b a b a b"
    # all-distinct words: no gram repeats, every frac 0
    uniq = "one two three four five six seven eight nine ten"
    # duplicated 5-gram: the run "v w x y z" appears twice
    dup5 = "v w x y z q v w x y z"
    docs = spark.createDataFrame(
        [(1, rep), (2, uniq), (3, dup5), (4, ""), (5, None), (6, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in gopher_repetition(docs).collect()}
    assert out[1]["top2gram_char_frac"] == round(9 / 11, 6)
    assert out[2]["top2gram_char_frac"] > 0  # the single top gram still covers chars
    assert out[2]["dup5gram_char_frac"] == 0.0
    assert out[3]["dup5gram_char_frac"] == round(18 / 21, 6)
    assert out[3]["dup6gram_char_frac"] == 0.0
    for d in (4, 5, 6):  # empty/null/too-short: all zeros, no NULLs
        for c in out[d].asDict():
            if c != "doc_id":
                assert out[d][c] == 0.0


def test_token_counts_null_text_zero(spark):
    """NULL text counts 0 tokens (size(NULL) would be -1 and negative
    counts poison downstream length filters)."""
    from nutch_spark.ml.text import bpe_token_count, token_count

    df = spark.createDataFrame(
        [("a", None), ("b", ""), ("c", "two words")], "doc_id string, text string"
    )
    rows = {
        r["doc_id"]: (r["t"], r["b"])
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("t"),
            bpe_token_count(F.col("text")).alias("b"),
        ).collect()
    }
    assert rows["a"] == (0, 0)
    assert rows["b"] == (0, 0)
    assert rows["c"] == (2, 2)


def test_minhash_bands_must_divide():
    """bands not dividing num_hashes is a hard error, not a silent
    truncation of the signature."""
    import pytest

    from nutch_spark.ml.dedup import minhash_band_values

    with pytest.raises(ValueError, match="must divide"):
        minhash_band_values(F.lit("x"), num_hashes=16, bands=5)
