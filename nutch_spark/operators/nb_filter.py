"""parsefilter-naivebayes: focused-crawl outlink gate.

Re-expresses the reference's two-tier relevancy filter
(``parsefilter-naivebayes/.../NaiveBayesParseFilter.java:160-198``):
a page whose parse text classifies *relevant* keeps every outlink;
an *irrelevant* page keeps only outlinks whose URL contains one of
the configured wordlist terms (``filterUrl``, case-sensitive
``String.contains``), giving focused crawls a second chance on
promising links from off-topic hubs.

The classifier mirrors ``Classify.java:54-116`` and ``Train.java:68-145``
bit-for-bit, including the reference's idiosyncrasies:

- tokenization is ``replaceAll("[^a-zA-Z ]","").toLowerCase().split(" ")``
  — digits/punctuation (newlines included) are *removed*, not blanked,
  so ``foo\\nbar`` fuses to ``foobar``; interior empty tokens survive
  (Java ``split`` keeps them) and count toward ``numwords``; trailing
  empties are dropped (Java drops them; ``""`` yields one empty token).
- the smoothed per-word contribution is
  ``log(freq) + 1 - log(numwords_c + V)`` for a word seen in class c
  and ``1 - log(numwords_c + V)`` otherwise (Train skips ``""`` in the
  frequency maps but counts it in ``numwords`` and vocabulary).
- priors add ``log(numof_c) - log(numof_ir + numof_r)``; ties classify
  relevant (``Classify.java:110-113`` flips to "0" only when
  ``prob_ir > prob_r``).

Spark-first plan, no Python in the hot path:

- **train**: the heavy token explode is scanned ONCE into a cached
  per-word aggregate; the scalar counters (numwords, vocabulary) are
  derived from that vocabulary-sized result, not by re-scanning the
  corpus. The model is a (word, freq_ir, freq_r) DataFrame —
  broadcastable at any corpus scale because it grows with the
  dictionary, not the corpus.
- **classify**: explode page tokens, broadcast-join the model, one
  url-keyed aggregation summing the two log-likelihood columns. At
  100 TB this is a map-side join plus a single shuffle on url — the
  same shape as every other per-page operator here.
- **outlink gate**: pure column logic (``exists`` over a literal
  wordlist array with ``contains``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def nb_tokens(text: Column) -> Column:
    """Reference tokenizer (Train.java:100, Classify.java:61-62).

    Java ``split(" ")`` drops *trailing* empty tokens but keeps interior
    ones; ``"".split(" ")`` is ``[""]`` and an all-space string splits to
    an empty array.
    """
    clean = F.lower(F.regexp_replace(text, "[^a-zA-Z ]", ""))
    rtrimmed = F.regexp_replace(clean, " +$", "")
    return (
        F.when(clean == "", F.array(F.lit("")))
        .when(rtrimmed == "", F.array().cast("array<string>"))
        .otherwise(F.split(rtrimmed, " ", -1))
    )


def nb_train(examples: DataFrame) -> tuple[DataFrame, dict]:
    """Train on (label:int 0=irrelevant/1=relevant, text) rows.

    Returns ``(model, stats)``: model is (word, freq_ir, freq_r) for
    every non-empty word seen in either class (Train.java:103-120),
    stats carries the scalar counters the reference writes to its
    model file header (numof/numwords per class + vocabulary size,
    where the vocabulary *includes* the empty token if present —
    Train.java:108 adds to ``uniquewords`` before the ``""`` guard).
    """
    tok = examples.select("label", F.explode(nb_tokens(F.col("text"))).alias("w"))
    ex = examples.groupBy().agg(
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("numof_ir"),
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("numof_r"),
    )
    # ONE pass over the heavy token explode: aggregate per word first
    # (empty token included — it counts toward numwords and vocabulary),
    # cache the vocabulary-sized result, then derive the scalar stats
    # from it instead of re-scanning the corpus.
    per_word = (
        tok.groupBy("w")
        .agg(
            F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).alias("freq_ir"),
            F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).alias("freq_r"),
        )
        .cache()
    )
    tk = per_word.groupBy().agg(
        F.sum("freq_ir").alias("numwords_ir"),
        F.sum("freq_r").alias("numwords_r"),
        F.count("*").alias("vocab"),
    )
    stats = {**ex.first().asDict(), **tk.first().asDict()}
    model = per_word.filter(F.col("w") != "")
    return model, stats


def nb_classify(
    docs: DataFrame,
    model: DataFrame,
    stats: dict,
    *,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Score each doc; returns (id, prob_ir, prob_r, relevant).

    Log-probabilities are the reference's un-normalized sums
    (Classify.java:92-108); ``relevant`` is ``prob_r >= prob_ir``.
    Rounded to 6 dp for cross-engine hashing; the verdict itself is
    computed on the full-precision sums.
    """
    import math

    denom_ir = F.lit(float(stats["numwords_ir"] + stats["vocab"]))
    denom_r = F.lit(float(stats["numwords_r"] + stats["vocab"]))
    prior_ir = math.log(stats["numof_ir"]) - math.log(
        stats["numof_ir"] + stats["numof_r"]
    )
    prior_r = math.log(stats["numof_r"]) - math.log(
        stats["numof_ir"] + stats["numof_r"]
    )

    # explode_outer keeps token-less docs (all-space text): Java's loop
    # body never runs for them, so their contribution is the priors only.
    tok = docs.select(
        F.col(id_col).alias("_nb_id"),
        F.explode_outer(nb_tokens(F.col(text_col))).alias("w"),
    )
    j = tok.join(F.broadcast(model), "w", "left")
    seen_ir = F.coalesce(F.col("freq_ir"), F.lit(0)) > 0
    seen_r = F.coalesce(F.col("freq_r"), F.lit(0)) > 0
    c_ir = F.when(F.col("w").isNull(), F.lit(0.0)).when(
        seen_ir, F.log(F.col("freq_ir").cast("double")) + 1.0 - F.log(denom_ir)
    ).otherwise(1.0 - F.log(denom_ir))
    c_r = F.when(F.col("w").isNull(), F.lit(0.0)).when(
        seen_r, F.log(F.col("freq_r").cast("double")) + 1.0 - F.log(denom_r)
    ).otherwise(1.0 - F.log(denom_r))
    scored = j.groupBy("_nb_id").agg(
        (F.sum(c_ir) + F.lit(prior_ir)).alias("_p_ir"),
        (F.sum(c_r) + F.lit(prior_r)).alias("_p_r"),
    )
    return scored.select(
        F.col("_nb_id").alias(id_col),
        F.round("_p_ir", 6).alias("prob_ir"),
        F.round("_p_r", 6).alias("prob_r"),
        # Classify.java:110-113: "0" only when prob_ir strictly greater.
        (~(F.col("_p_ir") > F.col("_p_r"))).alias("relevant"),
    )


def nb_outlink_gate(
    outlinks: DataFrame,
    page_verdicts: DataFrame,
    wordlist: list[str],
    *,
    url_col: str = "url",
    to_col: str = "to_url",
) -> DataFrame:
    """Second-tier gate (NaiveBayesParseFilter.java:169-192).

    ``outlinks`` is (url, to_url, ...); pages judged relevant keep all
    outlinks, irrelevant pages keep only outlinks whose target URL
    contains a wordlist term (case-sensitive, ``filterUrl``:73-77).
    """
    wl = F.array(*[F.lit(w) for w in wordlist])
    keep = F.col("relevant") | F.exists(
        wl, lambda t: F.col(to_col).contains(t)
    )
    return (
        outlinks.join(
            F.broadcast(page_verdicts.select(url_col, "relevant")), url_col, "left"
        )
        .withColumn("relevant", F.coalesce(F.col("relevant"), F.lit(False)))
        .filter(keep)
        .drop("relevant")
    )
