"""Topology guarantees of the synthetic web (FIXTURES.md §1/§7):
duplicate-content pairs must actually share span signatures, and
redirect targets must be real corpus URLs (else the fixture never
exercises dedup or redirect-chain handling)."""

from pyspark.sql import functions as F

from nutch_spark.data.frontier import synth_web
from nutch_spark.operators.parse import span_signature


def test_fixture_guarantees(spark):
    web = synth_web(spark, n_docs=500, n_hosts=10)
    docs = web["docs"].withColumn("sig", span_signature(F.col("spans")))

    # spans are a pure function of content_key: same key == same signature
    assert (
        docs.groupBy("content_key")
        .agg(F.countDistinct("sig").alias("d"))
        .filter("d > 1")
        .count()
        == 0
    )
    # duplicate-content pairs exist (h%7 re-key produces multi-doc groups)
    dup_groups = docs.groupBy("sig").count().filter("count > 1").count()
    assert dup_groups > 10

    # every redirect target resolves to a corpus doc (exact url match,
    # private path included) — chains can then arise naturally
    oc = web["outcomes"]
    redir = oc.filter("redirect_to is not null")
    n = redir.count()
    assert n > 0
    resolved = redir.join(
        docs.select(F.col("doc_id").alias("redirect_to")), "redirect_to", "inner"
    ).count()
    assert resolved == n
