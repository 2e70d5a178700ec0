"""Deterministic synthetic web — the fetchable corpus for tests + bench.

Replaces the reference's Jetty-served fixture site
(``src/testresources/fetch-test-site``, used by TestFetcher.java:81-180)
with a generated corpus of the BASELINE.json input_hint shape:
an interleaved text+media docs table
``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``,
plus the robots / protocol-outcome / politeness fixtures of FIXTURES.md.

Everything is derived from ``spark.range`` + column expressions seeded
by ``xxhash64(id, seed)`` — no Python RNG, no driver-side loops; the
same code generates 10^3 docs for tests and 10^8+ for bench tiers
(narrow plan, embarrassingly parallel).

Topology guarantees (FIXTURES.md §1): duplicate-content pairs, redirect
chains, robots-blocked paths, gone/retry pages, cross-host links, and
one deliberately skewed host (id 0) with ``skew_factor`` times the
docs of a normal host.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SEED = 42


def _doc_hash(id_col, seed) -> F.Column:
    """The per-doc hash every topology decision derives from."""
    return F.abs(F.xxhash64(id_col, F.lit(seed)))


def _host_of(id_col, n_hosts: int, seed: int, skew_factor: int) -> F.Column:
    """Host assignment as a pure function of the doc id — shared by
    synth_docs and synth_outcomes so redirect targets / canonical-owner
    hosts can be recomputed WITHOUT a join. Skewed: the first
    ``skew_factor`` buckets all map to host 0."""
    bucket = F.pmod(_doc_hash(id_col, seed), F.lit(n_hosts - 1 + skew_factor))
    return F.when(bucket < skew_factor, F.lit(0)).otherwise(
        bucket - skew_factor + 1
    )


def _is_private(id_col, seed) -> F.Column:
    return F.pmod(_doc_hash(id_col, seed), 19) == 0


def doc_url(host_id, doc_id, private=None) -> F.Column:
    base = F.concat(
        F.lit("http://host"), host_id.cast("string"), F.lit(".example.com")
    )
    path = F.when(private, F.lit("/private/doc/")).otherwise(F.lit("/doc/")) if private is not None else F.lit("/doc/")
    return F.concat(base, path, doc_id.cast("string"))


def synth_docs(
    spark: SparkSession,
    n_docs: int,
    n_hosts: int,
    seed: int = DEFAULT_SEED,
    skew_factor: int = 10,
) -> DataFrame:
    """The docs table. Host assignment is skewed: host 0 owns
    ``skew_factor``/(skew_factor+n_hosts-1) of all docs."""
    df = spark.range(n_docs).withColumn("h", _doc_hash(F.col("id"), seed))
    df = df.withColumn("host_id", _host_of(F.col("id"), n_hosts, seed, skew_factor))
    df = df.withColumn("is_private", _is_private(F.col("id"), seed))
    df = df.withColumn("url", doc_url(F.col("host_id"), F.col("id"), F.col("is_private")))
    # duplicate-content pairs: docs where h%7==0 take content_key id/2 and
    # EVERY span field below is a pure function of content_key — so any
    # two docs sharing a content_key have bit-identical span arrays (and
    # span signatures). A doc X pairs with doc X/2 itself whenever X/2 is
    # not re-keyed in turn (6/7 of pairs); the rest still share spans with
    # every other doc of the same key.
    df = df.withColumn(
        "content_key",
        F.when(F.pmod(F.col("h"), 7) == 0, (F.col("id") / 2).cast("long")).otherwise(F.col("id")),
    )
    df = df.withColumn("is_canonical", F.pmod(F.col("h"), 23) != 0)

    # span count keyed on content_key, NOT the doc id, or dup pairs would
    # have different span counts and never share a signature
    n_spans = (
        F.pmod(F.abs(F.xxhash64(F.col("content_key"), F.lit(seed + 1))), 4) + 3
    ).cast("int")
    # link/media spans of duplicated content embed the CANONICAL owner's
    # host (mirror pages copy content verbatim, absolute links included);
    # for non-dup docs this is the doc's own host
    ck_host = _host_of(F.col("content_key"), n_hosts, seed, skew_factor)

    def span(kidx):
        sh = F.abs(F.xxhash64(F.col("content_key"), kidx, F.lit(seed + 2)))
        kind = (
            F.when(F.pmod(kidx, 3) == 0, F.lit("text"))
            .when(F.pmod(kidx, 3) == 1, F.lit("link"))
            .otherwise(F.lit("media"))
        )
        # link/media targets: ~70% same host, else cross-host; target doc id
        # derived from the span hash (dense in [0, n_docs))
        tgt_doc = F.pmod(sh, F.lit(n_docs))
        tgt_host = F.when(
            F.pmod(sh, 10) < 7, ck_host
        ).otherwise(F.pmod(sh, F.lit(n_hosts)))
        # media refs use media paths on the same doc-id space
        media_ref = (
            F.when(kind == "link", F.concat(
                F.lit("http://host"), tgt_host.cast("string"),
                F.lit(".example.com/doc/"), tgt_doc.cast("string")))
            .when(kind == "media", F.concat(
                F.lit("http://host"), tgt_host.cast("string"),
                F.lit(".example.com/media/"), tgt_doc.cast("string"), F.lit(".img")))
            .otherwise(F.lit(None).cast("string"))
        )
        text = F.when(
            kind == "text",
            F.concat(F.lit("text of "), F.col("content_key").cast("string"), F.lit(" s"), kidx.cast("string")),
        ).otherwise(F.concat(F.lit("anchor "), F.pmod(sh, 1000).cast("string")))
        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            kidx.cast("int").alias("offset"),
        )

    spans = F.transform(F.sequence(F.lit(0), n_spans - 1), lambda kidx: span(kidx))
    return df.select(
        F.col("url").alias("doc_id"),
        spans.alias("spans"),
        "host_id",
        "is_canonical",
        "content_key",
    )


def synth_robots(spark: SparkSession, n_hosts: int, seed: int = DEFAULT_SEED) -> DataFrame:
    """Robots fixtures (FIXTURES.md §5): every 13th host disallows
    /private/; every 17th has Crawl-Delay 40s (> fetcher.max.crawl.delay
    => skip-as-gone); every 11th a polite 8s delay; every 29th defers
    visits (robots 5xx)."""
    df = spark.range(n_hosts).select(
        F.concat(F.lit("host"), F.col("id").cast("string"), F.lit(".example.com")).alias("host"),
        F.when(F.pmod("id", 13) == 0, F.array(F.lit("/private/"))).otherwise(
            F.array().cast("array<string>")
        ).alias("disallow"),
        F.when(F.pmod("id", 17) == 0, F.lit(40.0))
        .when(F.pmod("id", 11) == 0, F.lit(8.0))
        .otherwise(F.lit(None).cast("double")).alias("crawl_delay"),
        (F.pmod("id", 29) == 0).alias("defer_visits"),
        F.lit(False).alias("forbid_all"),
    )
    return df


def synth_outcomes(
    docs: DataFrame,
    n_docs: int = 0,
    n_hosts: int = 0,
    seed: int = DEFAULT_SEED,
    skew_factor: int = 10,
) -> DataFrame:
    """Scripted protocol outcomes per URL (FIXTURES.md §7), deterministic:
    ~84% success, 4% gone, 3% notfound, 3% retry/exception, 3% moved,
    2% temp_moved, 1% notmodified. Redirect targets are REAL corpus
    URLs: a hash-chosen doc id in [0, n_docs) whose host/private path is
    recomputed with the same pure-function topology as synth_docs (no
    join needed) — chains arise whenever the target doc is itself
    moved. ``n_docs``/``n_hosts`` must match the synth_docs call (0
    falls back to a never-resolving target, only for legacy callers)."""
    h = F.abs(F.xxhash64("doc_id", F.lit(seed + 3)))
    b = F.pmod(h, 100)
    outcome = (
        F.when(b < 84, F.lit("success"))
        .when(b < 88, F.lit("gone"))
        .when(b < 91, F.lit("notfound"))
        .when(b < 93, F.lit("retry"))
        .when(b < 94, F.lit("exception"))
        .when(b < 97, F.lit("moved"))
        .when(b < 99, F.lit("temp_moved"))
        .otherwise(F.lit("notmodified"))
    )
    if n_docs > 0 and n_hosts > 0:
        tid = F.pmod(h, F.lit(n_docs))
        target = doc_url(
            _host_of(tid, n_hosts, seed, skew_factor), tid, _is_private(tid, seed)
        )
    else:
        target = F.concat(
            F.regexp_extract("doc_id", r"^(http://[^/]+)", 1),
            F.lit("/doc/"),
            F.pmod(h, 1_000_000).cast("string"),
        )
    redirect_to = F.when(
        outcome.isin("moved", "temp_moved"), target
    ).otherwise(F.lit(None).cast("string"))
    return docs.select(
        F.col("doc_id").alias("url"),
        outcome.alias("outcome"),
        redirect_to.alias("redirect_to"),
        (50 + F.pmod(h, 200)).cast("long").alias("latency_ms"),
    )


def synth_seeds(docs: DataFrame, per_host: int = 1) -> DataFrame:
    """Seed lines: the first ``per_host`` real docs of every host (the
    seeds must resolve in the corpus, like the reference's seed file
    pointing at the Jetty fixture site)."""
    from pyspark.sql import Window

    w = Window.partitionBy("host_id").orderBy("doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= per_host)
        .select(F.col("doc_id").alias("value"))
    )


def synth_web(
    spark: SparkSession,
    n_docs: int = 1000,
    n_hosts: int = 20,
    seed: int = DEFAULT_SEED,
    skew_factor: int = 10,
) -> dict[str, DataFrame]:
    docs = synth_docs(spark, n_docs, n_hosts, seed, skew_factor)
    return {
        "docs": docs,
        "robots": synth_robots(spark, n_hosts, seed),
        "outcomes": synth_outcomes(docs, n_docs, n_hosts, seed, skew_factor),
        "seeds": synth_seeds(docs),
    }
