"""F9 in-fetch outlink following (FetcherThread.java:840-886):
depth waves over live politeness queues, per-source-queue
``alreadyFetched`` hashCode dedup, per-page num.links cap (a capped-out
candidate does NOT claim its hash), optional same-host restriction.
The reference ships no test for this feature; these scenarios pin the
sequential-fold semantics the Java code implements."""

import pytest
from pyspark.sql import functions as F

from nutch_spark import schema as S
from nutch_spark.config import NutchConfig
from nutch_spark.operators.fetchsim import fetch_follow_outlinks
from nutch_spark.urls.urlutil import nutch_url_hash32

NOW = 1_700_000_000_000

FL_SCHEMA = (
    "url string, status int, fetch_time long, retries int, fetch_interval int,"
    " score float, signature string, modified_time long, metadata map<string,string>,"
    " gen_time long, repr_url string, url_hash int"
)


def fetchlist(spark, urls):
    rows = [
        (u, S.STATUS_DB_UNFETCHED, NOW - 10_000, 0, 2592000, 1.0, None, 0, {}, NOW,
         None, nutch_url_hash32(u))
        for u in urls
    ]
    return spark.createDataFrame(rows, FL_SCHEMA)


def robots_df(spark, rows=()):
    return spark.createDataFrame(
        list(rows),
        "host string, disallow array<string>, crawl_delay double,"
        " defer_visits boolean, forbid_all boolean",
    )


def outcomes_df(spark, urls, latency=100):
    return spark.createDataFrame(
        [(u, "success", None, latency) for u in urls],
        "url string, outcome string, redirect_to string, latency_ms long",
    )


def docs_df(spark, pages: dict[str, list[str]]):
    """pages: url -> ordered outlink targets (one link span each)."""
    rows = [
        (
            url,
            [("text", "body", None, 0)]
            + [("link", f"anchor {i}", tgt, i + 1) for i, tgt in enumerate(tgts)],
            True,
        )
        for url, tgts in pages.items()
    ]
    return spark.createDataFrame(
        rows,
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>, is_canonical boolean",
    )


def run(spark, seeds, pages, extra_fetchable=(), depth=1, **cfg_kw):
    cfg = NutchConfig(fetcher_follow_outlinks_depth=depth, **cfg_kw)
    fl = fetchlist(spark, seeds)
    fetchable = sorted({*pages.keys(), *extra_fetchable})
    cf, _ = fetch_follow_outlinks(
        fl, robots_df(spark), outcomes_df(spark, fetchable), docs_df(spark, pages),
        cfg, NOW,
    )
    return cf


H = "http://h.example.com"


def test_depth1_follows_same_host_targets(spark):
    pages = {f"{H}/a": [f"{H}/t1"], f"{H}/b": [f"{H}/t2"]}
    cf = run(spark, [f"{H}/a", f"{H}/b"], pages,
             extra_fetchable=[f"{H}/t1", f"{H}/t2"])
    rows = {r["url"]: r for r in cf.collect()}
    assert rows[f"{H}/t1"]["outlink_depth"] == 1
    assert rows[f"{H}/t2"]["outlink_depth"] == 1
    assert rows[f"{H}/t1"]["status"] == S.STATUS_FETCH_SUCCESS
    # followed items are CrawlDatum(STATUS_LINKED, interval): score 0.0
    assert rows[f"{H}/t1"]["score"] == 0.0
    assert rows[f"{H}/a"]["outlink_depth"] == 0


def test_wave1_drains_after_wave0_queue(spark):
    """Followed items append to the live queue: FIFO means every wave-1
    start >= the wave-0 end-of-queue clock, politeness spacing kept."""
    pages = {f"{H}/a": [f"{H}/t1"], f"{H}/b": [f"{H}/t2"]}
    cf = run(spark, [f"{H}/a", f"{H}/b"], pages,
             extra_fetchable=[f"{H}/t1", f"{H}/t2"])
    rows = cf.collect()
    w0_end = max(
        r["fetch_time"] for r in rows if r["outlink_depth"] == 0
    ) + 100 + int(NutchConfig().fetcher_server_delay * 1000)
    w1 = sorted(r["fetch_time"] for r in rows if r["outlink_depth"] == 1)
    assert w1[0] == w0_end
    assert w1[1] - w1[0] == 5100  # latency 100 + server delay 5000


def test_per_page_cap_first_n_in_span_order(spark):
    pages = {f"{H}/a": [f"{H}/t1", f"{H}/t2", f"{H}/t3"]}
    cf = run(spark, [f"{H}/a"], pages,
             extra_fetchable=[f"{H}/t{i}" for i in (1, 2, 3)],
             fetcher_follow_outlinks_num_links=2)
    followed = {r["url"] for r in cf.collect() if r["outlink_depth"] == 1}
    assert followed == {f"{H}/t1", f"{H}/t2"}


def test_capped_candidate_does_not_claim_hash(spark):
    """FetcherThread.java:869-873: only a FOLLOWED url enters
    alreadyFetched — a candidate dropped by the per-page cap stays
    followable by a later page of the same queue. (A first-occurrence
    window would wrongly claim it; the fold must not.)"""
    a, b = f"{H}/a", f"{H}/b"
    # queue order is the url-hash interleave: make `first` the page
    # whose cap drops T, `second` the page that should still follow it
    first, second = sorted([a, b], key=lambda u: (nutch_url_hash32(u), u))
    t = f"{H}/shared-target"
    pages = {first: [f"{H}/x1", f"{H}/x2", t], second: [t]}
    cf = run(spark, [a, b], pages,
             extra_fetchable=[f"{H}/x1", f"{H}/x2", t],
             fetcher_follow_outlinks_num_links=2)
    w1 = {r["url"] for r in cf.collect() if r["outlink_depth"] == 1}
    assert w1 == {f"{H}/x1", f"{H}/x2", t}
    # and exactly once: the second page's claim, not a duplicate
    assert cf.filter(F.col("url") == t).count() == 1


def test_cross_page_dedup_in_queue(spark):
    t = f"{H}/shared"
    pages = {f"{H}/a": [t], f"{H}/b": [t]}
    cf = run(spark, [f"{H}/a", f"{H}/b"], pages, extra_fetchable=[t])
    assert cf.filter(F.col("url") == t).count() == 1


def test_processed_page_hash_not_refollowed(spark):
    """Each parsed page claims its own hash (:844) — a link back to a
    page already processed in the same queue is not followed. (The
    reference WOULD refetch if the linker drains first — the doc calls
    this out — so the linker must be the later queue item here.)"""
    a, b = f"{H}/a", f"{H}/b"
    first, second = sorted([a, b], key=lambda u: (nutch_url_hash32(u), u))
    pages = {first: [f"{H}/t1"], second: [first]}  # later page links the earlier
    cf = run(spark, [a, b], pages, extra_fetchable=[f"{H}/t1"])
    # the earlier page was fetched at depth 0 and never again
    assert cf.filter(F.col("url") == first).count() == 1
    w1 = {r["url"] for r in cf.collect() if r["outlink_depth"] == 1}
    assert w1 == {f"{H}/t1"}


def test_ignore_external_toggle(spark):
    ext = "http://other.example.com/t"
    pages = {f"{H}/a": [ext]}
    cf = run(spark, [f"{H}/a"], pages, extra_fetchable=[ext])
    assert cf.filter(F.col("outlink_depth") == 1).count() == 0
    cf2 = run(spark, [f"{H}/a"], pages, extra_fetchable=[ext],
              fetcher_follow_outlinks_ignore_external=False)
    w1 = {r["url"] for r in cf2.collect() if r["outlink_depth"] == 1}
    assert w1 == {ext}


def test_depth2_chains_and_dedups_across_waves(spark):
    a, t1, t2 = f"{H}/a", f"{H}/t1", f"{H}/t2"
    # t1 (fetched at wave 1) links onward to t2 and back to a;
    # a's hash was claimed in wave 0, so only t2 is followed at wave 2
    pages = {a: [t1], t1: [t2, a]}
    cf = run(spark, [a], pages, extra_fetchable=[t2], depth=2)
    by_depth = {}
    for r in cf.collect():
        by_depth.setdefault(r["outlink_depth"], set()).add(r["url"])
    assert by_depth[0] == {a}
    assert by_depth[1] == {t1}
    assert by_depth[2] == {t2}


def test_idle_wave_keeps_queue_clock(spark):
    """A queue with no items in wave N must keep its clock: wave N+1
    items on it drain after its earlier schedule, not from cycle start
    (the reference FetchItemQueue keeps nextFetchTime for the run)."""
    B, C = "http://b.example.com", "http://c.example.com"
    # wave 0: b0 and c0; wave 1: b0 -> b1 (queue C idle); wave 2: b1 -> c1
    pages = {f"{B}/b0": [f"{B}/b1"], f"{B}/b1": [f"{C}/c1"]}
    cf = run(
        spark, [f"{B}/b0", f"{C}/c0"], pages,
        extra_fetchable=[f"{C}/c0", f"{C}/c1"], depth=2,
        fetcher_follow_outlinks_ignore_external=False,
    )
    rows = {r["url"]: r for r in cf.collect()}
    assert rows[f"{C}/c1"]["outlink_depth"] == 2
    c0_end = rows[f"{C}/c0"]["fetch_time"] + 100 + int(
        NutchConfig().fetcher_server_delay * 1000
    )
    # c1 starts at queue C's wave-0 end clock — NOT at cycle start
    assert rows[f"{C}/c1"]["fetch_time"] == c0_end


def test_exception_counter_carries_across_waves(spark):
    """FetchItemQueue's exception counter persists for the run: the
    purge fires ON the exception that makes excCount >= max
    (FetchItemQueues.java:306-311 — the triggering item keeps its
    status, the rest of the queue is emptied), and a queue blocked in
    wave 0 must not fetch followed items in wave 1 with a reset
    counter."""
    urls = [f"{H}/p{i}" for i in range(4)]
    order = sorted(urls, key=lambda u: (nutch_url_hash32(u), u))
    linker, excs = order[0], order[1:]  # linker drains first, then 3 exceptions
    t = f"{H}/followed-target"
    cfg = NutchConfig(
        fetcher_follow_outlinks_depth=1, fetcher_max_exceptions_per_queue=2,
    )
    fl = fetchlist(spark, urls)
    outcomes = spark.createDataFrame(
        [(linker, "success", None, 100)] + [(u, "exception", None, 100) for u in excs]
        + [(t, "success", None, 100)],
        "url string, outcome string, redirect_to string, latency_ms long",
    )
    cf, _ = fetch_follow_outlinks(
        fl, robots_df(spark), outcomes, docs_df(spark, {linker: [t]}), cfg, NOW,
    )
    rows = cf.collect()
    # wave 0: linker + the first TWO exceptions — the second exception
    # trips excCount(2) >= max(2) and purges the rest of the queue, so
    # the third (exc_before=2) is never fetched
    assert {r["url"] for r in rows if r["outlink_depth"] == 0} == {
        linker, excs[0], excs[1]
    }
    # wave 1: the queue stays blocked (carried counter 2 >= max 2,
    # queuesMaxExceptions semantics) -> the followed item is dropped
    assert [r for r in rows if r["outlink_depth"] == 1] == []


def test_trailing_exception_backoff_charged_to_next_wave(spark):
    """A trailing wave-0 exception's exponential backoff delays the
    first wave-1 item (the clock carries pending backoff, it is not
    silently dropped at the wave boundary)."""
    urls = [f"{H}/p{i}" for i in range(2)]
    order = sorted(urls, key=lambda u: (nutch_url_hash32(u), u))
    linker, exc = order[0], order[1]  # exception drains LAST in wave 0
    t = f"{H}/followed-target"
    cfg = NutchConfig(fetcher_follow_outlinks_depth=1)
    fl = fetchlist(spark, urls)
    outcomes = spark.createDataFrame(
        [(linker, "success", None, 100), (exc, "exception", None, 100),
         (t, "success", None, 100)],
        "url string, outcome string, redirect_to string, latency_ms long",
    )
    cf, _ = fetch_follow_outlinks(
        fl, robots_df(spark), outcomes, docs_df(spark, {linker: [t]}), cfg, NOW,
    )
    rows = {r["url"]: r for r in cf.collect()}
    delay = int(cfg.fetcher_server_delay * 1000)
    backoff = int(cfg.fetcher_exceptions_per_queue_delay * 1000)  # base*(2^1-2^0)
    w0_end = NOW + 2 * (100 + delay)
    assert rows[t]["fetch_time"] == w0_end + backoff


def test_wave1_drains_in_append_order_not_hash_order(spark):
    """Followed items drain in FIFO append order (source completion
    instant, then span pos) — not the wave-0 url-hash interleave."""
    a, b = f"{H}/a", f"{H}/b"
    first, second = sorted([a, b], key=lambda u: (nutch_url_hash32(u), u))
    # the EARLIER page follows t_late+t_early (span order), the later
    # page nothing: append order is (t_x, t_y) by span pos regardless of
    # the targets' own url hashes
    tx, ty = f"{H}/t-x", f"{H}/t-y"
    # pick names so that hash order of (tx, ty) is the REVERSE of span
    # order — the test then distinguishes the two drain policies
    if (nutch_url_hash32(tx), tx) < (nutch_url_hash32(ty), ty):
        span_targets = [ty, tx]  # append ty first, but hash order favors tx
    else:
        span_targets = [tx, ty]
    pages = {first: span_targets, second: []}
    cf = run(spark, [a, b], pages, extra_fetchable=[tx, ty])
    rows = {r["url"]: r for r in cf.collect() if r["outlink_depth"] == 1}
    assert rows[span_targets[0]]["fetch_time"] < rows[span_targets[1]]["fetch_time"]


def test_throughput_killer_sees_shared_timeline_across_waves(spark):
    """The reference's 1 Hz throughput check runs on ONE task clock: a
    follow wave judged only by its own completions would see the whole
    wave-0 period as empty seconds and spuriously kill itself."""
    a, b, t = f"{H}/a", f"{H}/b", f"{H}/t1"
    first = sorted([a, b], key=lambda u: (nutch_url_hash32(u), u))[0]
    # completions land at ~0.1s, ~5.2s (wave 0) and ~10.3s (wave 1):
    # max empty run is 4 consecutive seconds < retries=10 on the SHARED
    # timeline; wave 1 alone would show 10 empty seconds and die
    cf = run(
        spark, [a, b], {first: [t]}, extra_fetchable=[t],
        fetcher_throughput_threshold_pages=1,
        fetcher_throughput_threshold_retries=10,
        fetcher_throughput_check_after_mins=0,
    )
    w1 = {r["url"] for r in cf.collect() if r["outlink_depth"] == 1}
    assert w1 == {t}


def test_follow_wave_killer_judges_source_partition(spark):
    """Follow items inherit the SOURCE's fetcher task (partition): the
    slow task's throughput kill drops its own follow even though the
    other task's dense completion timeline would have spared it (a
    follow mis-assigned to partition 0 would be judged on the healthy
    grid and survive)."""
    slow, fast = "http://slowq.example.com", "http://fasth.example.com"
    t = f"{slow}/t1"
    fast_urls = [f"{fast}/doc/{i}" for i in range(12)]
    fl = fetchlist(spark, [f"{slow}/a"] + fast_urls).withColumn(
        "part_id",
        F.when(F.col("url").startswith(slow), F.lit(1)).otherwise(F.lit(0)),
    )
    # fast host: crawl-delay 0.9s -> one completion every second, its
    # task is never starved; slow host keeps the 5s server delay
    robots = robots_df(spark, [("fasth.example.com", None, 0.9, None, None)])
    outcomes = outcomes_df(spark, [f"{slow}/a", t] + fast_urls)
    cfg = NutchConfig(
        fetcher_follow_outlinks_depth=1,
        fetcher_throughput_threshold_pages=1,
        fetcher_throughput_threshold_retries=3,
        fetcher_throughput_check_after_mins=0,
    )
    cf, _ = fetch_follow_outlinks(
        fl, robots, outcomes, docs_df(spark, {f"{slow}/a": [t]}), cfg, NOW,
    )
    got = {r["url"] for r in cf.collect()}
    # task 1: a completes at 0.1s, the follow would start at 5.1s; secs
    # 1-3 are empty (run of 3) -> task killed at +4s -> follow dropped
    assert t not in got
    assert got == {f"{slow}/a", *fast_urls}


def test_depth_zero_config_rejected(spark):
    with pytest.raises(ValueError):
        fetch_follow_outlinks(
            fetchlist(spark, [f"{H}/a"]), robots_df(spark),
            outcomes_df(spark, []), docs_df(spark, {}), NutchConfig(), NOW,
        )
