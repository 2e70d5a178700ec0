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


def link_dumper(
    links: DataFrame,
    scores: DataFrame | None = None,
    max_inlinks: int = 50000,
    initial_score: float = 1.0,
) -> DataFrame:
    """LinkDumper (``scoring/webgraph/LinkDumper.java:209-315``): the
    url -> inlink-detail database behind ``LinkDumper$Reader`` — for
    each url, every inlink with its SOURCE node's full scoring state
    (num in/outlinks, inlink score, outlink score = score/numOutlinks,
    ``Node.java:67-69``), so "why does this url rank this way" is one
    lookup. ``scores`` is the LinkRank output (absent -> every node at
    the initial score, like a pre-analysis nodeDb).

    The reference caps at 50000 inlinks per url in reducer iteration
    order (nondeterministic under MR; :300-309) — we keep the first
    ``max_inlinks`` by ascending from_url, a deterministic refinement.

    Scale: node stats are two aggregations over the persisted links
    table; the invert join shuffles on src, the final group on dst —
    the same two exchanges the LinkRank iteration already pays, with
    the per-url cap bounding mega-hub rows (the array for a url with
    10^7 inlinks is capped, not materialized)."""
    indeg = links.groupBy(F.col("dst").alias("url")).agg(
        F.count("*").alias("num_inlinks")
    )
    # links already carries outdeg per src (build_webgraph)
    node = (
        links.select(F.col("src").alias("url"), "outdeg").distinct()
        .join(indeg, "url", "full_outer")
        .select(
            "url",
            F.coalesce("num_inlinks", F.lit(0)).alias("num_inlinks"),
            F.coalesce("outdeg", F.lit(0)).alias("num_outlinks"),
        )
    )
    if scores is not None:
        node = node.join(scores.select("url", "score"), "url", "left").withColumn(
            "score", F.coalesce("score", F.lit(float(initial_score)))
        )
    else:
        node = node.withColumn("score", F.lit(float(initial_score)))
    node = node.withColumn(
        "outlink_score",
        F.when(
            F.col("num_outlinks") > 0,
            F.round(F.col("score") / F.col("num_outlinks"), 9),
        ).otherwise(F.lit(0.0)),
    )
    # Inverter (:213-277): attach the SOURCE node to each link, keyed by
    # the target (numOutlinks > 0 always holds for a link's src here)
    inv = links.select("src", "dst").join(
        node.select(
            F.col("url").alias("src"),
            F.struct(
                F.col("src").alias("from_url"),
                "num_inlinks",
                "num_outlinks",
                F.col("score").alias("inlink_score"),
                "outlink_score",
            ).alias("ln"),
        ),
        "src",
    )
    # Merger (:281-315): one array per url, capped
    return (
        inv.groupBy(F.col("dst").alias("url"))
        .agg(
            F.slice(
                F.array_sort(F.collect_list("ln")), 1, max_inlinks
            ).alias("inlinks")
        )
    )


def link_dump_lines(dump: DataFrame, url: str) -> list[str]:
    """LinkDumper$Reader (:79-112): the printable inlink detail for one
    url, one line per inlink in the reference's format."""
    row = dump.filter(F.col("url") == url).collect()
    lines = [f"{url}:"]
    if row:
        for ln in row[0]["inlinks"]:
            lines.append(
                f"  {ln['from_url']} - num inlinks: {ln['num_inlinks']},"
                f" num outlinks: {ln['num_outlinks']},"
                f" inlink score: {ln['inlink_score']},"
                f" outlink score: {ln['outlink_score']}, metadata: {{}}"
            )
    return lines


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
