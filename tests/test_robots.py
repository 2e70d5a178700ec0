"""robots.txt parser + fetch-gate integration (F6)."""

from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.urls.robots import is_allowed, parse_robots_txt, robots_table

ROBOTS = """
# comments are ignored
User-agent: nutch-test
Disallow: /private/
Allow: /private/open/
Crawl-delay: 7

User-agent: othercrawler
Disallow: /

User-agent: *
Disallow: /all-agents/
"""


def test_agent_group_selection():
    r = parse_robots_txt(ROBOTS, ["nutch-test"])
    assert r["disallow"] == ["/private/"]
    assert r["allow"] == ["/private/open/"]
    assert r["crawl_delay"] == 7.0
    # unknown agent falls back to the wildcard group
    r2 = parse_robots_txt(ROBOTS, ["somebody-else"])
    assert r2["disallow"] == ["/all-agents/"] and r2["crawl_delay"] is None
    # agent matching is contains-based on the lowercased UA token
    r3 = parse_robots_txt(ROBOTS, ["NUTCH"])
    assert r3["disallow"] == ["/private/"]


def test_longest_match_allow_wins():
    dis, alw = ["/private/"], ["/private/open/"]
    assert not is_allowed("/private/secret", dis, alw)
    assert is_allowed("/private/open/doc", dis, alw)
    assert is_allowed("/public/x", dis, alw)
    # tie: Allow wins
    assert is_allowed("/private/", ["/private/"], ["/private/"])


def test_empty_and_forbid_all():
    assert parse_robots_txt("", ["a"]) == {
        "disallow": [], "allow": [], "crawl_delay": None
    }
    assert parse_robots_txt(None, ["a"])["disallow"] == []
    r = parse_robots_txt("User-agent: *\nDisallow: /", ["a"])
    assert r["disallow"] == ["/"]


def test_shared_group_multiple_agents():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x/"
    assert parse_robots_txt(txt, ["b"])["disallow"] == ["/x/"]


def test_robots_table_and_fetch_gate(spark):
    from nutch_spark.operators.fetchsim import fetch

    rt = spark.createDataFrame(
        [
            ("h1.example.com", ROBOTS),
            ("h2.example.com", "User-agent: *\nDisallow: /"),
            ("h3.example.com", ""),
        ],
        "host string, content string",
    )
    robots = robots_table(rt, ["nutch-test"])
    rows = {r["host"]: r for r in robots.collect()}
    assert rows["h1.example.com"]["crawl_delay"] == 7.0
    assert rows["h2.example.com"]["forbid_all"] is True
    assert rows["h3.example.com"]["disallow"] == []

    cfg = NutchConfig(fetch_partitions=2)
    urls = [
        "http://h1.example.com/private/secret",   # denied
        "http://h1.example.com/private/open/ok",  # allow overrides
        "http://h2.example.com/anything",         # forbid_all
        "http://h3.example.com/fine",             # empty robots
    ]
    fl = spark.createDataFrame([(u,) for u in urls], "url string").select(
        "url",
        F.lit(1).alias("status"), F.lit(0).cast("long").alias("fetch_time"),
        F.lit(0).alias("retries"), F.lit(3600).alias("fetch_interval"),
        F.lit(1.0).cast("float").alias("score"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.expr("cast(map() as map<string,string>)").alias("metadata"),
        F.lit(None).cast("long").alias("gen_time"),
        F.lit(None).cast("string").alias("repr_url"),
        F.lit(0).alias("part_id"), F.lit(0).alias("url_hash"),
    )
    outcomes = spark.createDataFrame(
        [(u, "success", None, 10) for u in urls],
        "url string, outcome string, redirect_to string, latency_ms long",
    )
    cf, _ = fetch(fl, robots, outcomes, cfg, 0)
    st = {r["url"]: r["status"] for r in cf.collect()}
    assert st["http://h1.example.com/private/secret"] == 0x25   # gone (denied)
    assert st["http://h1.example.com/private/open/ok"] == 0x21  # success
    assert st["http://h2.example.com/anything"] == 0x25
    assert st["http://h3.example.com/fine"] == 0x21
