"""SparkSession factory for the crawl engine.

Local-mode defaults follow the sandbox (local[32], single JVM); on a
real cluster the same builder is used via ``spark-submit --py-files``
with master/memory supplied externally.

Physical-execution policy (SURVEY.md §4):
- AQE ON globally (runtime re-plan, skew-join splitting) — but the
  fetch stage repartitions by salted host and pins its partition count
  itself (politeness unit = partition), so AQE coalescing never merges
  two hosts into one politeness clock by accident: the fetch stage uses
  an explicit ``repartition(N, col)`` which AQE does not coalesce
  (user-specified repartitions are preserved by
  spark.sql.adaptive.coalescePartitions behavior for rebalance only).
- Arrow enabled: every per-row code path is an Arrow-batched pandas UDF.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "nutch_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    master = master or os.environ.get("NUTCH_SPARK_MASTER", "local[32]")
    cores = _parse_local_cores(master)
    shuffle_partitions = shuffle_partitions or (cores if cores else 64)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("NUTCH_SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # map_concat is "newer overrides older" throughout the engine
        # (metadata merge semantics, CrawlDbReducer.java:182-189)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    # env-supplied conf overrides (JSON object) — lets bench/probe child
    # processes A/B optimizer settings without code edits
    env_conf = os.environ.get("NUTCH_SPARK_EXTRA_CONF")
    if env_conf:
        import json

        for k, v in json.loads(env_conf).items():
            b = b.config(k, str(v))
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def _parse_local_cores(master: str) -> int | None:
    if master.startswith("local["):
        inner = master[len("local[") : -1]
        if inner == "*":
            return os.cpu_count() or 8
        try:
            return int(inner)
        except ValueError:
            return None
    return None
