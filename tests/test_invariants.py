"""Cross-cutting invariants: replay determinism, politeness partition
isolation, fetch-list interleave order (the crawl-ordering contract,
SURVEY §2.5)."""

from pyspark.sql import functions as F

import __spark_entry__ as E
from nutch_spark.config import NutchConfig
from nutch_spark.operators.generate import generate
from nutch_spark.urls.urlutil import nutch_url_hash32

SF = "/root/testdata/sf0.001"


def test_crawl_cycle_replay_determinism(spark):
    """Injected clocks + seeds => two runs of the full 2-cycle crawl
    produce identical CrawlDbs (north rule: deterministic replay)."""
    a = sorted(tuple(r) for r in E.q_crawl_cycle(spark, SF).collect())
    b = sorted(tuple(r) for r in E.q_crawl_cycle(spark, SF).collect())
    assert a == b and len(a) > 0


def test_politeness_partition_isolation_and_interleave(spark):
    """(a) a host never spans two fetch partitions (politeness unit =
    partition, URLPartitioner discipline); (b) within a partition the
    issue order is ascending HashComparator url-hash
    (Generator.java:605-635)."""
    cfg = NutchConfig(fetch_partitions=4, generate_num_reducers=4)
    db = E._crawldb(E._docs(spark, SF))
    fl = generate(db, cfg, E.GEN_NOW, top_n=1000, num_lists=4)

    # (a) host -> exactly one part_id
    spans = (
        fl.groupBy("host_key").agg(F.countDistinct("part_id").alias("n"))
        .agg(F.max("n")).collect()[0][0]
    )
    assert spans == 1

    # (b) per physical partition, rows come out sorted by url_hash
    def check(it):
        prev = None
        for row in it:
            h = row["url_hash"]
            assert prev is None or h >= prev, (prev, h)
            prev = row
            prev = h
        yield 1

    assert sum(fl.rdd.mapPartitions(check).collect()) == 4

    # and url_hash is the exact reference hash
    sample = fl.limit(20).collect()
    for r in sample:
        assert r["url_hash"] == nutch_url_hash32(r["url"])
