"""fetched_content join-strategy probe.

The parse stage's dominant input is ``fetched_content(crawl_fetch,
docs)`` — topN fetched rows (narrow) inner-joined to the full docs
corpus carrying the heavy ``spans`` column. This probe stages the two
inputs once (at local[32], untimed), then times a full materialization
of the join at a chosen master under three strategies:

  smj    — status quo (whatever the optimizer picks)
  bloom  — runtime bloom filter thresholds opened so InjectRuntimeFilter
           could prune the docs scan pre-shuffle
  bcast  — explicit broadcast of the fetched side

FINDING (2026-08-20, 20M docs / 2M fetched / 128 parts, local[4]
pinned): all three execute as BroadcastHashJoin — the filtered
fetched-side scan estimate stays under the 64MB autoBroadcast
threshold, so the status-quo plan already broadcasts the narrow side
and the 20M-row docs corpus is NEVER shuffled (spans stay columnar in
the scan). Timings 15.3 / 13.4 / 12.6 s = page-cache warmup order, not
strategy. The probe is kept to regression-check that this stays true
if the fetched-side width or topN grows past the threshold.

Usage:
    NUTCH_BENCH_DOCS=20000000 NUTCH_BENCH_TOPN=2000000 \
    python tools/join_probe.py local[4] smj bloom bcast
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOOM_CONF = {
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "64MB",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "1GB",
    "spark.sql.optimizer.runtime.bloomFilter.maxNumItems": "8000000",
    "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems": "4000000",
}


def stage(tmp: str) -> None:
    from pyspark.sql import functions as F

    from nutch_spark.config import NutchConfig
    from nutch_spark.data.frontier import synth_web
    from nutch_spark.operators.fetchsim import fetch
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject_full
    from nutch_spark.session import get_spark

    n_docs = int(os.environ.get("NUTCH_BENCH_DOCS", 20_000_000))
    top_n = int(os.environ.get("NUTCH_BENCH_TOPN", 2_000_000))
    parts = int(os.environ.get("NUTCH_BENCH_SHUFFLE", 128))
    spark = get_spark(app_name="join_probe_stage", master="local[32]",
                      shuffle_partitions=parts)
    cfg = NutchConfig(fetch_partitions=parts, generate_num_reducers=parts)
    web = synth_web(spark, n_docs=n_docs, n_hosts=max(100, n_docs // 50))
    web["docs"].write.mode("overwrite").parquet(f"{tmp}/docs")
    docs = spark.read.parquet(f"{tmp}/docs")
    seeds = docs.select(F.col("doc_id").alias("value"))
    db = inject_full(spark, None, seeds, cfg, now_ms=1_704_000_000_000)
    fl = generate(db, cfg, 1_704_000_000_000, top_n=top_n, num_lists=parts)
    cf, _ = fetch(fl, web["robots"], web["outcomes"], cfg, 1_704_000_000_000)
    cf.write.mode("overwrite").parquet(f"{tmp}/crawl_fetch")
    spark.stop()


def run_one(master: str, strategy: str, tmp: str) -> None:
    from pyspark.sql import functions as F

    from nutch_spark.operators.fetchsim import fetched_content
    from nutch_spark.session import get_spark

    parts = int(os.environ.get("NUTCH_BENCH_SHUFFLE", 128))
    spark = get_spark(app_name=f"join_probe_{strategy}", master=master,
                      shuffle_partitions=parts)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    docs = spark.read.parquet(f"{tmp}/docs")
    cf = spark.read.parquet(f"{tmp}/crawl_fetch")
    if strategy == "bcast":
        from nutch_spark.operators import fetchsim

        cf = cf.hint("broadcast")  # hint survives the filter/select inside
    content = fetched_content(cf, docs)
    t0 = time.time()
    content.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    plan = content._jdf.queryExecution().executedPlan().toString()
    kind = ("bloom" if "might_contain" in plan else
            "bcast" if "BroadcastHashJoin" in plan else
            "smj" if "SortMergeJoin" in plan else "shj")
    print(json.dumps({"master": master, "strategy": strategy,
                      "executed_as": kind, "sec": round(dt, 2)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    argv = sys.argv[1:]
    if os.environ.get("_PROBE_CHILD"):
        run_one(argv[0], argv[1], argv[2])
        sys.exit(0)
    master = argv[0] if argv else "local[4]"
    strategies = argv[1:] or ["smj", "bloom", "bcast"]
    tmp = os.environ.get("JOIN_PROBE_DIR") or tempfile.mkdtemp(prefix="join_probe_")
    if not os.path.exists(f"{tmp}/crawl_fetch"):
        stage(tmp)
    try:
        for strat in strategies:
            env = dict(os.environ, _PROBE_CHILD="1")
            if strat == "bloom":
                env["NUTCH_SPARK_EXTRA_CONF"] = json.dumps(BLOOM_CONF)
            cmd = [sys.executable, __file__, master, strat, tmp]
            if os.environ.get("NUTCH_BENCH_PIN") == "1":
                from nutch_spark.session import _parse_local_cores

                n = _parse_local_cores(master) or 4
                cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0"] + cmd
            subprocess.run(cmd, env=env, check=True)
    finally:
        if not os.environ.get("JOIN_PROBE_DIR"):
            shutil.rmtree(tmp, ignore_errors=True)
