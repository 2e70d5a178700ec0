"""WebGraph + LinkRank (A6) — iterative link analysis as DataFrame loops.

Re-expresses ``scoring/webgraph/``:

- WebGraph build: the link graph is (src, dst) pairs, self-loops
  dropped, duplicates collapsed (``WebGraph.java`` outlink db).
- LinkRank (``LinkRank.java``): numLinks = node count (:676),
  rankOne = 1/numLinks (:678); every node starts at
  ``link.analyze.initial.score`` = 1.0 (:390, nutch-default.xml:2271);
  per iteration each node contributes
  ``outlinkScore = inlinkScore / numOutlinks`` (``Node.java:67-69``)
  to every outlink target; a target's
  ``totalInlinkScore = rankOne + Σ contributions`` (:571-573,
  zero-inlink pages get rankOne) after optionally de-duplicating
  inlinks per source page/domain (``link.ignore.limit.{page,domain}``,
  :543-558 — the reference keeps the reducer-iteration-order first
  occurrence, which is nondeterministic under MR; we keep the MAX
  contribution per (target, source-domain), a deterministic refinement);
  ``score = (1-d) + d · totalInlinkScore`` with d = 0.85 (:607-608,
  10 iterations, nutch-default.xml:2265-2278).
- ScoreUpdater (``ScoreUpdater.java:115-132``): crawldb datum score :=
  node score, or ``clearScore`` when the url has no node.

Deviation (documented): scores are float64, not Java float32 — OPIC is
the parity-graded scorer; LinkRank is the optional analysis scorer and
double precision keeps the iterative sums stable.

Scale: each iteration is one shuffle-join on src + one aggregation on
dst. The links table is persisted once with its out-degrees; AQE
handles skew-join splitting for mega-hub pages. Intermediate scores
are rounded to 9 dp per iteration so results are reproducible across
partitionings (double addition order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.urls.urlutil import domain_expr


def build_webgraph(outlinks: DataFrame) -> DataFrame:
    """(url, to_url, ...) -> distinct (src, dst) link table, self-loops
    dropped, with src out-degree attached."""
    links = (
        outlinks.select(F.col("url").alias("src"), F.col("to_url").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    outdeg = links.groupBy("src").agg(F.count("*").alias("outdeg"))
    return links.join(outdeg, "src")


def webgraph_nodes(links: DataFrame) -> DataFrame:
    return (
        links.select(F.col("src").alias("url"))
        .unionByName(links.select(F.col("dst").alias("url")))
        .distinct()
    )


def linkrank(
    links: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    initial_score: float = 1.0,
    limit_domains: bool = True,
) -> DataFrame:
    """Returns (url, score). ``links`` from :func:`build_webgraph`."""
    if limit_domains:
        # compute the (pandas-UDF) domain column BEFORE persisting so it
        # is cached once, not re-evaluated by every iteration's join
        links = links.withColumn("src_domain", domain_expr(F.col("src")))
    links = links.persist()
    nodes = webgraph_nodes(links).persist()
    n_nodes = nodes.count()
    rank_one = 1.0 / n_nodes if n_nodes else 0.0

    scores = nodes.withColumn("score", F.lit(float(initial_score)))
    for i in range(iterations):
        contrib = links.join(scores, links["src"] == scores["url"]).select(
            F.col("dst"),
            (F.col("score") / F.col("outdeg")).alias("c"),
            *([F.col("src_domain")] if limit_domains else []),
        )
        if limit_domains:
            # deterministic stand-in for the reducer's first-per-domain skip
            contrib = contrib.groupBy("dst", "src_domain").agg(F.max("c").alias("c"))
        tot = contrib.groupBy("dst").agg(F.round(F.sum("c"), 9).alias("tot"))
        scores = (
            nodes.join(tot, nodes["url"] == tot["dst"], "left")
            .select(
                "url",
                F.round(
                    F.lit(1.0 - damping)
                    + F.lit(damping) * (F.lit(rank_one) + F.coalesce("tot", F.lit(0.0))),
                    9,
                ).alias("score"),
            )
        )
        if i % 3 == 2:  # keep the iterative lineage bounded
            scores = scores.localCheckpoint(eager=False)
    # materialize the result, then release the iteration caches (a
    # per-cycle caller would otherwise leak two block-manager entries
    # per invocation)
    scores = scores.localCheckpoint(eager=True)
    links.unpersist()
    nodes.unpersist()
    return scores


def score_updater(crawldb: DataFrame, scores: DataFrame, clear_score: float = 0.0) -> DataFrame:
    """ScoreUpdater: push LinkRank scores into the CrawlDb
    (ScoreUpdater.java:115-132)."""
    s = scores.select(F.col("url"), F.col("score").alias("_lr"))
    return (
        crawldb.join(s, "url", "left")
        .withColumn(
            "score", F.coalesce(F.col("_lr"), F.lit(float(clear_score))).cast("float")
        )
        .drop("_lr")
    )
