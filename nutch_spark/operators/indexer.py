"""Indexing job (S9, ``indexer/IndexerMapReduce.java`` +
``index-basic/.../BasicIndexingFilter.java:72-131``): join the crawldb
datum with the parse output into NutchDocument rows, then hand them to
a pluggable writer.

Spark-first: the "job" is one join + column projection; the
IndexingFilter chain becomes composable column-producing functions. The
network writers (Solr/Elastic/Kafka, ``indexer-*`` plugins) are out of
scope in this sandbox — the shipped writer is the JSON-lines exchange
format every Nutch index writer ultimately serializes through, plus a
``DataFrameWriter`` passthrough so a real cluster can
``.format("kafka")``/``.format("es")`` the same rows.

Fields (BasicIndexingFilter): domain, host, url (repr-url preferred),
content (cleaned parse text, length-capped), title (first text span,
length-capped), tstamp (fetch time), plus digest (signature) and boost
(score) stamped by IndexerMapReduce itself (:305-320). Skips are the
reference's: only db_fetched/db_notmodified datums with a successful
parse are indexed (:197-214).

Scale: one shuffle (the url join); everything else is map-side JVM.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.schema import STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED
from nutch_spark.urls.urlutil import domain_udf


def _clean_field(c: Column) -> Column:
    """StringUtil.cleanField: strip control characters."""
    return F.regexp_replace(c, r"[\x00-\x1f\x7f]", " ")


def index_documents(
    crawldb: DataFrame,
    parse_text: DataFrame,
    cfg: NutchConfig,
    *,
    max_content: int = 10000,
    max_title: int = 100,
) -> DataFrame:
    """NutchDocument rows for indexable pages.

    ``parse_text``: (url, text) from the parse stage. Returns columns
    (url, domain, host, content, title, tstamp, digest, boost).
    """
    db = crawldb.filter(
        F.col("status").isin(STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED)
    )
    joined = db.join(parse_text.select("url", "text"), "url", "inner")
    url_out = F.coalesce(F.col("repr_url"), F.col("url"))
    host = F.lower(F.try_parse_url(url_out, F.lit("HOST")))
    content = _clean_field(F.substring(F.coalesce(F.col("text"), F.lit("")), 1, max_content))
    title = _clean_field(F.substring(F.coalesce(F.col("text"), F.lit("")), 1, max_title))
    return joined.select(
        url_out.alias("url"),
        domain_udf()(url_out).alias("domain"),
        host.alias("host"),
        content.alias("content"),
        title.alias("title"),
        F.col("fetch_time").alias("tstamp"),
        F.col("signature").alias("digest"),
        F.col("score").cast("float").alias("boost"),
    )


def write_jsonl(docs: DataFrame, out_dir: str) -> None:
    """The generic exchange sink: one JSON document per line (what the
    reference's index writers serialize before shipping)."""
    docs.write.mode("overwrite").json(out_dir)


def writer_passthrough(docs: DataFrame):
    """On a real cluster, plug any Spark sink:
    ``writer_passthrough(docs).format("kafka")...save()`` — the
    indexer-kafka/solr/es plugins become Spark connectors."""
    return docs.write


def subcollections_col(url: Column, collections: list[dict]) -> Column:
    """subcollection plugin (``subcollection/.../Subcollection.java:184-201``
    + ``SubcollectionIndexingFilter.java``): a URL belongs to a named
    collection when NO blacklist substring matches and ANY whitelist
    substring does; the indexer emits the matching collection names.

    ``collections``: [{"name", "whitelist": [...], "blacklist": [...],
    "case_insensitive": bool}] (the parsed subcollections.xml). Pure JVM
    ``contains`` chains over broadcast-size rule literals — zero Python,
    zero shuffle; returns array<string> of matching names in definition
    order (the reference's iteration order)."""
    names = []
    for c in collections:
        u = F.lower(url) if c.get("case_insensitive") else url
        def _c(s, cc=c):
            return F.lit(s.lower() if cc.get("case_insensitive") else s)
        black = [u.contains(_c(s)) for s in c.get("blacklist", [])]
        white = [u.contains(_c(s)) for s in c.get("whitelist", [])]
        # no blacklist hit AND some whitelist hit
        black_hit = (
            F.greatest(*black, F.lit(False), F.lit(False)) if black else F.lit(False)
        )
        white_hit = (
            F.greatest(*white, F.lit(False), F.lit(False)) if white else F.lit(False)
        )
        names.append(F.when(~black_hit & white_hit, F.lit(c["name"])))
    if not names:
        return F.array().cast("array<string>")
    return F.filter(F.array(*names), lambda x: x.isNotNull())


def route_documents(docs: DataFrame, routes: list[tuple[str, str]]) -> DataFrame:
    """Exchange component (``exchange/Exchanges.java`` +
    ``exchange-jexl``): route each index document to the writers whose
    expression matches. ``routes``: [(writer_id, spark-sql boolean
    expr over the doc columns)] — the documented engine-wide JEXL
    substitution (SURVEY T14). Adds ``writers`` array<string>; docs
    matching nothing get the empty array (the reference's default
    'no exchange matched' path drops them from every writer)."""
    names = F.array(
        *[
            F.when(F.expr(expr), F.lit(writer))
            for writer, expr in routes
        ]
    )
    return docs.withColumn(
        "writers", F.filter(names, lambda x: x.isNotNull())
    )
