"""Port of TestGenerator.java (topN-by-score :79-107, generate.max.count
byHost :140-196 / byDomain :205-264, filter :273-302) plus the fork's
unfetched-only rule and the politeness-partitioning invariants — run in
both quota modes (windowed scale mode and parity replay mode)."""

import pytest
from pyspark.sql import functions as F

from nutch_spark import schema as S
from nutch_spark.config import NutchConfig
from nutch_spark.operators.generate import generate, mark_generated, select_eligible
from nutch_spark.schema import crawldb_schema
from nutch_spark.urls.urlutil import get_host, nutch_url_hash32

NOW = 1_700_000_000_000


def datum(url, score=1.0, status=S.STATUS_DB_UNFETCHED, fetch_time=NOW - 10_000,
          interval=1, gen_time=None):
    return (url, status, fetch_time, 0, interval, score, None, 0, {}, gen_time, None)


def db(spark, rows):
    return spark.createDataFrame(rows, crawldb_schema())


MODES = [False, True]  # parity_mode


@pytest.mark.parametrize("parity", MODES)
def test_generate_highest(spark, parity):
    rows = [datum(f"http://aaa/{i:03d}", score=float(i)) for i in range(101)]
    cfg = NutchConfig(generator_parity_mode=parity)
    out = generate(db(spark, rows), cfg, NOW, top_n=2, num_lists=1).collect()
    urls = sorted((r["url"] for r in out))
    assert len(out) == 2
    assert urls == ["http://aaa/099", "http://aaa/100"]


@pytest.mark.parametrize("parity", MODES)
@pytest.mark.parametrize("max_per_host", [1, 2, 3])
def test_generate_host_limit(spark, parity, max_per_host):
    rows = [
        datum("http://www.example.com/index1.html"),
        datum("http://www.example.com/index2.html"),
        datum("http://www.example.com/index3.html"),
    ]
    cfg = NutchConfig(generate_max_count=max_per_host, generator_parity_mode=parity)
    out = generate(db(spark, rows), cfg, NOW, top_n=1_000_000, num_lists=1).collect()
    assert len(out) == min(max_per_host, 3)


@pytest.mark.parametrize("parity", MODES)
@pytest.mark.parametrize("max_per_domain", [1, 2, 3])
def test_generate_domain_limit(spark, parity, max_per_domain):
    rows = [
        datum("http://a.example.com/index.html"),
        datum("http://b.example.com/index.html"),
        datum("http://c.example.com/index.html"),
    ]
    cfg = NutchConfig(
        generate_max_count=max_per_domain,
        generate_count_mode="domain",
        generator_parity_mode=parity,
    )
    out = generate(db(spark, rows), cfg, NOW, top_n=1_000_000, num_lists=1).collect()
    assert len(out) == min(max_per_domain, 3)


def test_generate_filter_on_off(spark):
    rows = [
        datum("http://www.example.com/index.html"),
        datum("http://www.example.net/index.html"),
        datum("http://www.example.org/index.html"),
    ]
    cfg = NutchConfig()
    # filter-all
    out = generate(db(spark, rows), cfg, NOW, url_filter_rules=["-."], num_lists=1)
    assert out.count() == 0
    # no filter
    out = generate(db(spark, rows), cfg, NOW, num_lists=1)
    assert out.count() == 3


def test_fork_rule_only_unfetched(spark):
    """The fork drops every non-unfetched status (Generator.java:234-237)."""
    rows = [
        datum("http://u.example.com/", status=S.STATUS_DB_UNFETCHED),
        datum("http://f.example.com/", status=S.STATUS_DB_FETCHED),
        datum("http://n.example.com/", status=S.STATUS_DB_NOTMODIFIED),
        datum("http://g.example.com/", status=S.STATUS_DB_GONE),
    ]
    out = generate(db(spark, rows), NutchConfig(), NOW, num_lists=1).collect()
    assert [r["url"] for r in out] == ["http://u.example.com/"]


def test_should_fetch_and_gen_delay(spark):
    rows = [
        datum("http://due.example.com/"),
        datum("http://future.example.com/", fetch_time=NOW + 1_000_000),
        # _ngt_ set recently: re-blocked for crawl.gen.delay (7 d)
        datum("http://blocked.example.com/", gen_time=NOW - 1000),
        # _ngt_ set long ago: eligible again
        datum("http://expired.example.com/", gen_time=NOW - 8 * 86400 * 1000),
    ]
    out = generate(db(spark, rows), NutchConfig(), NOW, num_lists=1).collect()
    assert sorted(r["url"] for r in out) == [
        "http://due.example.com/",
        "http://expired.example.com/",
    ]


@pytest.mark.parametrize("parity", MODES)
def test_segment_spill(spark, parity):
    """maxCount overflow spills into the next segment up to maxNumSegments,
    then drops (Generator.java:509-552)."""
    rows = [datum(f"http://spill.example.com/{i}", score=float(10 - i)) for i in range(10)]
    cfg = NutchConfig(generate_max_count=2, generator_parity_mode=parity)
    out = generate(
        db(spark, rows), cfg, NOW, top_n=1_000_000, max_num_segments=3, num_lists=1
    ).collect()
    assert len(out) == 6  # 2 per segment x 3 segments, 4 dropped
    by_seg = {}
    for r in out:
        by_seg.setdefault(r["segnum"], []).append(r["url"])
    assert {k: len(v) for k, v in by_seg.items()} == {1: 2, 2: 2, 3: 2}
    # highest scores land in segment 1
    assert sorted(by_seg[1]) == ["http://spill.example.com/0", "http://spill.example.com/1"]


def test_politeness_partitioning_and_interleave(spark):
    """G3 invariants: a host never spans two fetch partitions, and rows
    within a partition are ordered by the HashComparator url-hash."""
    rows = [
        datum(f"http://host{h}.example.com/p{i}", score=float(i))
        for h in range(8)
        for i in range(5)
    ]
    out = generate(db(spark, rows), NutchConfig(), NOW, num_lists=4)
    pdf = out.select("url", "part_id", "url_hash", F.spark_partition_id().alias("pid")).toPandas()
    # host -> single partition
    pdf["host"] = pdf["url"].map(get_host)
    assert (pdf.groupby("host")["pid"].nunique() == 1).all()
    assert (pdf.groupby("host")["part_id"].nunique() == 1).all()
    # url_hash column matches the reference hash; ascending within partition
    for u, h in zip(pdf["url"], pdf["url_hash"]):
        assert h == nutch_url_hash32(u)
    for _, grp in pdf.groupby("pid"):
        hashes = list(grp["url_hash"])
        assert hashes == sorted(hashes)


def test_mark_generated_roundtrip(spark):
    rows = [datum("http://m1.example.com/"), datum("http://m2.example.com/")]
    crawldb = db(spark, rows)
    cfg = NutchConfig()
    fl = generate(crawldb, cfg, NOW, top_n=1, num_lists=1)
    marked = mark_generated(crawldb, fl).collect()
    gen_times = {r["url"]: r["gen_time"] for r in marked}
    assert sum(1 for v in gen_times.values() if v == NOW) == 1
    assert sum(1 for v in gen_times.values() if v is None) == 1
    # a second generate within the gen delay yields nothing new
    marked_df = db(spark, [tuple(r) for r in marked])
    fl2 = generate(marked_df, cfg, NOW + 1000, num_lists=1)
    assert fl2.count() == 1  # only the unmarked URL


def test_hostdb_variable_budgets(spark):
    """Hostdb-driven per-host maxCount override + _variableFetchDelay_
    stamping (Generator.java:431-475) and its politeness effect
    (FetchItemQueue.java:94-111)."""
    from pyspark.sql import functions as F

    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.fetchsim import fetch
    from nutch_spark.operators.generate import generate

    cfg = NutchConfig(generate_max_count=3, fetch_partitions=2)
    rows = [
        (f"http://h{h}.example.com/doc/{i}", 1, 0, 0, 3600, 1.0 + i / 4.0,
         None, 0, {}, None, None)
        for h in (1, 2) for i in range(6)
    ]
    db = spark.createDataFrame(
        rows,
        "url string, status int, fetch_time long, retries int, fetch_interval int,"
        " score float, signature string, modified_time long,"
        " metadata map<string,string>, gen_time long, repr_url string",
    )
    hostdb = spark.createDataFrame(
        [("h1.example.com", 5, 100)],  # h1: cap 5 and a 100ms fetch delay
        "host string, max_count int, fetch_delay_ms long",
    )
    fl = generate(db, cfg, 1_000, top_n=100, num_lists=2, hostdb=hostdb)
    per_host = {r["h"]: r["count"] for r in
                fl.select(F.col("host_key").alias("h")).groupBy("h").count().collect()}
    assert per_host == {"h1.example.com": 5, "h2.example.com": 3}  # override vs default
    meta = {r["url"]: r["metadata"] for r in fl.collect()}
    h1 = [u for u in meta if "h1" in u]
    assert all(meta[u].get("_variableFetchDelay_") == "100" for u in h1)
    assert all("_variableFetchDelay_" not in meta[u] for u in meta if "h2" in u)

    # the delay flows into the politeness clock: h1 gaps 100ms, h2 gaps 5s
    robots = spark.createDataFrame(
        [], "host string, disallow array<string>, crawl_delay double,"
            " defer_visits boolean, forbid_all boolean")
    outcomes = fl.select(
        "url", F.lit("success").alias("outcome"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit(0).cast("long").alias("latency_ms"))
    cf, _ = fetch(fl, robots, outcomes, cfg, 0)
    times = {}
    for r in cf.collect():
        times.setdefault(r["url"].split(".")[0], []).append(r["fetch_time"])
    gaps = {h: sorted(set(t2 - t1 for t1, t2 in zip(sorted(ts), sorted(ts)[1:])))
            for h, ts in times.items()}
    assert gaps["http://h1"] == [100]
    assert gaps["http://h2"] == [5000]


def test_hostdb_budgets_parity_mode(spark):
    """Parity-mode replay honors hostdb per-host maxCount overrides the
    same way the windowed mode does."""
    from pyspark.sql import functions as F

    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.generate import generate

    cfg = NutchConfig(generate_max_count=3, fetch_partitions=2,
                      generator_parity_mode=True)
    rows = [
        (f"http://h{h}.example.com/doc/{i}", 1, 0, 0, 3600, 1.0 + i / 4.0,
         None, 0, {}, None, None)
        for h in (1, 2) for i in range(6)
    ]
    db = spark.createDataFrame(
        rows,
        "url string, status int, fetch_time long, retries int, fetch_interval int,"
        " score float, signature string, modified_time long,"
        " metadata map<string,string>, gen_time long, repr_url string",
    )
    hostdb = spark.createDataFrame(
        [("h1.example.com", 5, None)],
        "host string, max_count int, fetch_delay_ms long",
    )
    fl = generate(db, cfg, 1_000, top_n=100, num_lists=2, hostdb=hostdb)
    per_host = {r["h"]: r["count"] for r in
                fl.select(F.col("host_key").alias("h")).groupBy("h").count().collect()}
    assert per_host == {"h1.example.com": 5, "h2.example.com": 3}


def test_windowed_uncapped_hosts_spill_segments_like_parity(spark):
    """Hosts WITHOUT a hostdb cap (and config maxCount=-1) must spill
    across segments by rank exactly like the reference reducer loop —
    not be pinned to segment 1 where the per-segment budget silently
    drops everything past the limit (Generator.java:427-443)."""
    from pyspark.sql import functions as F

    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.generate import generate

    rows = [
        (f"http://h{h}.example.com/doc/{i}", 1, 0, 0, 3600, 1.0 + i / 4.0,
         None, 0, {}, None, None)
        for h in range(5) for i in range(5)
    ]  # 25 eligible rows, all from hosts absent in hostdb
    db = spark.createDataFrame(
        rows,
        "url string, status int, fetch_time long, retries int, fetch_interval int,"
        " score float, signature string, modified_time long,"
        " metadata map<string,string>, gen_time long, repr_url string",
    )
    hostdb = spark.createDataFrame(
        [("h9.example.com", 2, None)],  # no crawldb row matches
        "host string, max_count int, fetch_delay_ms long",
    )

    def counts(parity):
        cfg = NutchConfig(generate_max_count=-1, fetch_partitions=1,
                          generator_parity_mode=parity)
        fl = generate(db, cfg, 1_000, top_n=10, max_num_segments=3,
                      num_lists=1, hostdb=hostdb)
        return {r["segnum"]: r["count"]
                for r in fl.groupBy("segnum").count().collect()}

    windowed, parity = counts(False), counts(True)
    assert windowed == {1: 10, 2: 10, 3: 5}  # all 25 emitted, none dropped
    assert windowed == parity
