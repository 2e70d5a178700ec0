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


def test_depth_zero_config_rejected(spark):
    with pytest.raises(ValueError):
        fetch_follow_outlinks(
            fetchlist(spark, [f"{H}/a"]), robots_df(spark),
            outcomes_df(spark, []), docs_df(spark, {}), NutchConfig(), NOW,
        )
