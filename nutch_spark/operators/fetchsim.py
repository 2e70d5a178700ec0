"""Fetch stage — simulated protocol with exact politeness accounting.

The reference fetcher is a thread-pool simulator (QueueFeeder + N
FetcherThreads over per-host FetchItemQueues, ``fetcher/Fetcher.java:60-93``).
Data-parallel re-expression: the per-host politeness clock
(``FetchItemQueue.java:119-170``: nextFetchTime = lastFinish +
crawlDelay, 1 thread per queue) is a **prefix sum over each host group**
— computed here with JVM-side window functions, zero Python in the hot
path:

    start_i = cycle_start + Σ_{j<i} (latency_j + delay_ms) + backoff_i

ordered by the G3 url-hash interleave within each host. Robots gating
(``FetcherThread.java:319-381``), the protocol-status -> fetch-status
switch (:405-487), exception backoff / queue kill
(``FetchItemQueues.java:279-325``), and the fetch time limit
(``Fetcher.java:221-223``) are all column expressions; redirect
discovery (:556-670, ``http.redirect.max``=0 -> emit STATUS_LINKED for
the next cycle) adds one exploded output; the representative-URL choice
(``URLUtil.chooseRepr``) is the single small pandas UDF.

Scale: one shuffle (by host, for the window); robots is a broadcast
join (per-host table is small relative to the frontier); outcomes/docs
join on url. The per-host generate cap (G2) has already bounded any
host's rows, so the window partitions are bounded — the same skew bound
the reference relies on (Generator.java:509-552).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.schema import (
    META_VARIABLE_FETCH_DELAY,
    STATUS_FETCH_GONE,
    STATUS_FETCH_NOTMODIFIED,
    STATUS_FETCH_REDIR_PERM,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_RETRY,
    STATUS_FETCH_SUCCESS,
    STATUS_LINKED,
)
from nutch_spark.urls.urlutil import choose_repr, host_col

from nutch_spark.schema import EMPTY_META_EXPR as _EMPTY_MAP

OUTCOME_TO_STATUS = {
    "success": STATUS_FETCH_SUCCESS,
    "notmodified": STATUS_FETCH_NOTMODIFIED,
    "moved": STATUS_FETCH_REDIR_PERM,
    "temp_moved": STATUS_FETCH_REDIR_TEMP,
    "gone": STATUS_FETCH_GONE,
    "notfound": STATUS_FETCH_GONE,
    "access_denied": STATUS_FETCH_GONE,
    "retry": STATUS_FETCH_RETRY,
    "blocked": STATUS_FETCH_RETRY,
    "exception": STATUS_FETCH_RETRY,
}


def _status_from_outcome(outcome: Column) -> Column:
    expr = None
    for k, v in OUTCOME_TO_STATUS.items():
        expr = F.when(outcome == k, v) if expr is None else expr.when(outcome == k, v)
    return expr.otherwise(STATUS_FETCH_GONE)  # unknown URL => notfound


def _choose_repr_udf():
    @F.pandas_udf("string")
    def _cr(src: pd.Series, dst: pd.Series, temp: pd.Series) -> pd.Series:
        return pd.Series(
            [
                choose_repr(s, d, bool(t)) if d is not None else None
                for s, d, t in zip(src, dst, temp)
            ]
        )

    return _cr


def fetch(
    fetchlist: DataFrame,
    robots: DataFrame,
    outcomes: DataFrame,
    cfg: NutchConfig,
    cycle_start_ms: int,
    *,
    dns: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the simulated fetch.

    Returns ``(crawl_fetch, redirect_links)``:
    - crawl_fetch: crawldb-schema rows with fetch statuses and the
      politeness-simulated actual fetch_time;
    - redirect_links: STATUS_LINKED rows for redirect targets
      (next-cycle discovery, http.redirect.max=0 semantics) carrying
      ``repr_url``.

    ``dns``: (host, ip) fixture table, required for
    ``fetcher.queue.mode=byIP`` (the sandbox has no resolver; SURVEY A4).
    """
    # politeness queue id = host / domain / IP per fetcher.queue.mode
    # (FetchItem.create, fetcher/FetchItem.java:87-121). Robots rules
    # stay host-keyed in every mode, so `host` is the real host and
    # `_queue` the politeness unit.
    fl = fetchlist.withColumn("host", host_col(F.col("url")))
    if cfg.fetcher_queue_mode == "byIP":
        if dns is None:
            raise ValueError("fetcher.queue.mode=byIP requires a dns fixture (host, ip)")
        fl = fl.join(
            F.broadcast(dns.select(F.col("host"), F.col("ip").alias("_queue"))),
            "host",
            "left",
        )
        # unresolved host => item skipped entirely, no host-name fallback
        # (FetchItem.java:101-104)
        fl = fl.filter(F.col("_queue").isNotNull())
    elif cfg.fetcher_queue_mode == "byDomain":
        from nutch_spark.urls.urlutil import domain_expr

        fl = fl.withColumn("_queue", domain_expr(F.col("url")))
    else:
        fl = fl.withColumn("_queue", F.col("host"))

    fl = fl.join(F.broadcast(robots), "host", "left")
    fl = fl.join(outcomes, "url", "left")

    path = F.regexp_replace("url", r"^https?://[^/]*", "")

    def _best_match(col):
        # longest-matching rule prefix length, -1 when nothing matches
        arr = F.coalesce(col, F.array().cast("array<string>"))
        return F.coalesce(
            F.array_max(
                F.transform(
                    arr, lambda p: F.when(path.startswith(p), F.length(p)).otherwise(-1)
                )
            ),
            F.lit(-1),
        )

    if "allow" in robots.columns:
        # longest-match-wins with Allow winning ties (urls/robots.py
        # semantics, crawler-commons / SimpleRobotRulesParser)
        rule_denied = _best_match(F.col("disallow")) > _best_match(F.col("allow"))
    else:
        rule_denied = F.when(
            F.col("disallow").isNotNull(),
            F.exists("disallow", lambda p: path.startswith(p)),
        ).otherwise(F.lit(False))
    robots_denied = rule_denied | F.coalesce(F.col("forbid_all"), F.lit(False))
    delay_skip = F.coalesce(F.col("crawl_delay"), F.lit(0.0)) > cfg.fetcher_max_crawl_delay
    deferred = F.coalesce(F.col("defer_visits"), F.lit(False))
    is_exception = F.col("outcome") == "exception"

    status = (
        F.when(robots_denied | delay_skip, F.lit(STATUS_FETCH_GONE))
        .when(deferred, F.lit(STATUS_FETCH_RETRY))
        .otherwise(_status_from_outcome(F.col("outcome")))
    )
    # gated items never enter the host queue => zero politeness cost
    gated = robots_denied | delay_skip | deferred
    # per-host delay: the hostdb variable fetch delay raises the queue's
    # minimum delay (FetchItemQueue.java:94-111), and the robots
    # Crawl-Delay is then clamped to at least that minimum
    # (FetcherThread.java:369-376) — so when both are present the LARGER
    # wins (greatest skips nulls); neither present => fetcher.server.delay
    var_delay = F.element_at(
        F.coalesce(F.col("metadata"), F.expr(_EMPTY_MAP)),
        F.lit(META_VARIABLE_FETCH_DELAY),
    ).cast("long")
    robots_delay_ms = F.when(
        F.col("crawl_delay").isNotNull() & ~delay_skip,
        (F.col("crawl_delay") * 1000).cast("long"),
    )
    delay_ms = F.coalesce(
        F.greatest(var_delay, robots_delay_ms),
        F.lit(int(cfg.fetcher_server_delay * 1000)).cast("long"),
    )
    cost = F.when(gated, F.lit(0).cast("long")).otherwise(
        F.coalesce(F.col("latency_ms"), F.lit(0).cast("long")) + delay_ms
    )

    w = Window.partitionBy("_queue").orderBy("url_hash", "url")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    exc_before = F.coalesce(
        F.sum(F.when(is_exception & ~gated, 1).otherwise(0)).over(wprev), F.lit(0)
    )
    # exponential backoff: the k-th exception adds base*2^(k-1) ms of delay;
    # cumulative extra before item i = base*(2^k - 1)  (FetchItemQueues.java:279-325)
    backoff_ms = (
        F.lit(int(cfg.fetcher_exceptions_per_queue_delay * 1000))
        * (F.pow(F.lit(2.0), exc_before.cast("double")) - 1.0)
    ).cast("long")
    start_time = (
        F.lit(cycle_start_ms)
        + F.coalesce(F.sum(cost).over(wprev), F.lit(0).cast("long"))
        + backoff_ms
    )

    fl = (
        fl.withColumn("fetch_start", F.when(gated, F.lit(cycle_start_ms)).otherwise(start_time))
        .withColumn("exc_before", exc_before)
        .withColumn("fstatus", status)
        .withColumn("gated", gated)
    )

    # queue kill after too many exceptions (fetcher.max.exceptions.per.queue)
    if cfg.fetcher_max_exceptions_per_queue >= 0:
        fl = fl.filter(
            F.col("gated") | (F.col("exc_before") <= cfg.fetcher_max_exceptions_per_queue)
        )
    # F10 throughput killer (Fetcher.java:311-338): once check_after
    # minutes have elapsed, a run of `retries` consecutive wall seconds
    # in which the fetcher task completes fewer than `threshold` pages
    # empties the task's queues; items not yet started at the kill
    # instant are dropped without segment output (emptyQueues => they
    # stay db_unfetched; counter hitByThrougputThreshold). Re-expressed
    # on the virtual clock: per fetch partition, bucket completions by
    # second, locate the earliest bad run with a running-max window,
    # drop everything that starts after it.
    if cfg.fetcher_throughput_threshold_pages > 0:
        fl = _apply_throughput_killer(fl, cfg, cycle_start_ms)
        fl = fl.filter(~F.col("hit_throughput"))

    # fetch time limit: later items drain unprocessed (stay unfetched)
    if cfg.fetcher_timelimit_mins > 0:
        deadline = cycle_start_ms + cfg.fetcher_timelimit_mins * 60_000
        fl = fl.filter(F.col("gated") | (F.col("fetch_start") <= deadline))

    # no internal persist: callers materialize crawl_fetch/redirect_links
    # themselves, and an unreachable cached handle would leak one block-
    # manager entry per crawl cycle

    crawl_fetch = fl.select(
        "url",
        F.col("fstatus").cast("int").alias("status"),
        F.col("fetch_start").cast("long").alias("fetch_time"),
        F.col("retries").cast("int").alias("retries"),
        F.col("fetch_interval").cast("int").alias("fetch_interval"),
        F.col("score").cast("float").alias("score"),
        F.col("signature"),
        F.col("modified_time").cast("long").alias("modified_time"),
        F.coalesce(F.col("metadata"), F.expr(_EMPTY_MAP)).alias("metadata"),
        F.col("gen_time"),
        F.col("repr_url"),
        F.col("outcome"),
        F.col("host"),
    )

    redirs = fl.filter(
        F.col("fstatus").isin(STATUS_FETCH_REDIR_PERM, STATUS_FETCH_REDIR_TEMP)
        & F.col("redirect_to").isNotNull()
    )
    is_temp = F.col("fstatus") == STATUS_FETCH_REDIR_TEMP
    redirect_links = redirs.select(
        F.col("redirect_to").alias("url"),
        F.lit(STATUS_LINKED).cast("int").alias("status"),
        F.col("fetch_start").cast("long").alias("fetch_time"),
        F.lit(0).alias("retries"),
        F.col("fetch_interval").cast("int").alias("fetch_interval"),
        F.lit(0.0).cast("float").alias("score"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.expr(_EMPTY_MAP).alias("metadata"),
        F.lit(None).cast("long").alias("gen_time"),
        _choose_repr_udf()(F.col("url"), F.col("redirect_to"), is_temp).alias("repr_url"),
    )
    return crawl_fetch, redirect_links


def _apply_throughput_killer(
    fl: DataFrame, cfg: NutchConfig, cycle_start_ms: int
) -> DataFrame:
    """Adds ``hit_throughput``: True for items the throughput killer
    drains (Fetcher.java:311-338 semantics on the virtual clock).

    A wall second `s` (bucket [s*1000, s*1000+999] after cycle start) is
    *bad* when s >= check_after and the task completed < threshold pages
    in it; `retries` consecutive bad seconds kill the task's queues at
    the check instant (s+1)*1000, dropping every not-yet-started item.

    Scale shape: one groupBy per (partition, second) — cardinality
    bounded by partitions x timelimit seconds, tiny next to the
    fetchlist; the kill table is one row per partition (broadcast
    join back). Zero Python."""
    thr = cfg.fetcher_throughput_threshold_pages
    retries = cfg.fetcher_throughput_threshold_retries
    check_after_s = cfg.fetcher_throughput_check_after_mins * 60
    part = F.col("part_id") if "part_id" in fl.columns else F.lit(0)
    fl = fl.withColumn("_tk_part", part)
    end_sec = F.floor(
        (
            F.col("fetch_start")
            + F.coalesce(F.col("latency_ms"), F.lit(0).cast("long"))
            - F.lit(cycle_start_ms)
        )
        / 1000
    ).cast("long")
    counts = (
        fl.filter(~F.col("gated"))
        .select("_tk_part", end_sec.alias("_sec"))
        .groupBy("_tk_part", "_sec")
        .agg(F.count("*").alias("_n"))
    )
    # dense second grid: an empty second is a bad second, exactly like
    # the reference's 1 Hz check loop
    grid = (
        counts.groupBy("_tk_part")
        .agg(F.max("_sec").alias("_max_sec"))
        .select(
            "_tk_part", F.explode(F.sequence(F.lit(0).cast("long"), F.col("_max_sec"))).alias("_sec")
        )
        .join(counts, ["_tk_part", "_sec"], "left")
        .withColumn("_n", F.coalesce(F.col("_n"), F.lit(0)))
    )
    good = (F.col("_sec") < check_after_s) | (F.col("_n") >= thr)
    w = (
        Window.partitionBy("_tk_part")
        .orderBy("_sec")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = F.col("_sec") - F.coalesce(
        F.max(F.when(good, F.col("_sec"))).over(w), F.lit(-1).cast("long")
    )
    kills = (
        grid.withColumn("_run", run)
        .filter(F.col("_run") >= retries)
        .groupBy("_tk_part")
        .agg(F.min("_sec").alias("_kill_sec"))
    )
    fl = fl.join(F.broadcast(kills), "_tk_part", "left")
    kill_wall = F.lit(cycle_start_ms) + (F.col("_kill_sec") + 1) * 1000
    hit = (
        F.col("_kill_sec").isNotNull()
        & ~F.col("gated")
        & (F.col("fetch_start") >= kill_wall)
    )
    return fl.withColumn("hit_throughput", F.coalesce(hit, F.lit(False))).drop(
        "_tk_part", "_kill_sec"
    )


def fetched_content(crawl_fetch: DataFrame, docs: DataFrame) -> DataFrame:
    """Content table: successful fetches joined to the docs corpus
    (FetcherOutputFormat's ``content`` output, S5). Carries the fetch
    score for OPIC pass-through (``passScoreBeforeParsing``)."""
    ok = crawl_fetch.filter(F.col("status") == STATUS_FETCH_SUCCESS)
    return ok.select("url", "score", "fetch_time", "gen_time").join(
        docs.select(F.col("doc_id").alias("url"), "spans", "is_canonical"), "url", "inner"
    )
