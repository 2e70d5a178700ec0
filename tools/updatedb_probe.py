"""Updatedb-stage scaling probe: per-variant timings at one parallelism level.

Round-3e showed updatedb as the last stage under 3x 1->4 speedup; the
round-3f version of this probe ran all variants in ONE child JVM in a
fixed order, which page-cache-warmed the later variants — its full-merge
local[4] number (55.3s, run last/warmest) contradicted the in-bench
cross-window evidence (split 47.1s in r3e vs merge 57-59s in r3g/r3h)
and drove the max_touched=0.15 dispatch the wrong way. This version
eliminates the order bias: staging runs ONCE (local[32], untimed), then
EVERY (master, variant) pair gets a fresh pinned child JVM that times
exactly bench.py's updatedb region for that one variant.

Variants:
  full   — plain single-shuffle merge (updatedb)
  fp     — fingerprint split (broadcast 64-bit hash set; its exchange IS
           reused under AQE — the round-3f "built twice" reading came
           from the pre-adaptive plan, isFinalPlan=false)
  bloom  — bloom-bitmap split (distributed bit_or build, ~MB broadcast
           row, pure-JVM k-hash probe; ~fpp of the untouched rows leak
           into the exact merge, result-identical)

Usage:
    NUTCH_BENCH_DOCS=20000000 NUTCH_BENCH_TOPN=2000000 \
    NUTCH_BENCH_SHUFFLE=128 NUTCH_BENCH_PIN=1 \
    python tools/updatedb_probe.py local[1] local[4] -- full fp bloom
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

DATUM_COLS = [
    "url", "status", "fetch_time", "retries", "fetch_interval", "score",
    "signature", "modified_time", "metadata", "gen_time", "repr_url",
]


def _cfg_and_session(master: str, app: str):
    from nutch_spark.config import NutchConfig
    from nutch_spark.session import get_spark, _parse_local_cores

    cores = _parse_local_cores(master) or 4
    parts = int(os.environ.get("NUTCH_BENCH_SHUFFLE", max(cores, 8)))
    spark = get_spark(app_name=app, master=master, shuffle_partitions=parts)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    return spark, NutchConfig(fetch_partitions=parts, generate_num_reducers=parts), parts


def stage(tmp: str) -> None:
    from pyspark.sql import functions as F

    from nutch_spark.data.frontier import synth_web
    from nutch_spark.operators.fetchsim import fetch, fetched_content
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject_full
    from nutch_spark.operators.parse import parse, materialize_parse_caches

    spark, cfg, parts = _cfg_and_session("local[32]", "updatedb_probe_stage")
    n_docs = int(os.environ.get("NUTCH_BENCH_DOCS", 2_000_000))
    n_hosts = max(100, n_docs // 50)
    top_n = int(os.environ.get("NUTCH_BENCH_TOPN", 200_000))

    def _swap(df, name):
        df.write.mode("overwrite").parquet(f"{tmp}/{name}")
        return spark.read.parquet(f"{tmp}/{name}")

    web = synth_web(spark, n_docs=n_docs, n_hosts=n_hosts)
    docs = _swap(web["docs"], "docs")
    seeds = docs.select(F.col("doc_id").alias("value"))
    db = _swap(
        inject_full(spark, None, seeds, cfg, now_ms=1_704_000_000_000), "crawldb_0"
    )
    fl = _swap(
        generate(db, cfg, 1_704_000_000_000, top_n=top_n, num_lists=parts),
        "fetchlist",
    )
    crawl_fetch, redirect_links = fetch(
        fl, web["robots"], web["outcomes"], cfg, 1_704_000_000_000
    )
    crawl_fetch = _swap(crawl_fetch, "crawl_fetch")
    redirect_links = _swap(redirect_links, "redirects")
    content = fetched_content(crawl_fetch, docs)
    handles: list = []
    parsed = parse(content, cfg, persist_handles=handles)
    materialize_parse_caches(handles)
    seg = (
        crawl_fetch.select(*DATUM_COLS)
        .unionByName(parsed["crawl_parse"].select(*DATUM_COLS))
        .unionByName(redirect_links.select(*DATUM_COLS))
    )
    seg.write.mode("overwrite").parquet(f"{tmp}/segment")
    for h in handles:
        h.unpersist()
    seg = spark.read.parquet(f"{tmp}/segment")
    stats = {
        "seg_rows": seg.count(),
        "seg_distinct_urls": seg.select("url").distinct().count(),
        "frontier": db.count(),
    }
    print(json.dumps({"staged": stats}), flush=True)
    spark.stop()


def run_one(master: str, variant: str, tmp: str) -> None:
    from nutch_spark.operators.updatedb import updatedb, updatedb_incremental

    spark, cfg, parts = _cfg_and_session(master, f"updatedb_probe_{variant}")
    db = spark.read.parquet(f"{tmp}/crawldb_0")
    seg = spark.read.parquet(f"{tmp}/segment")
    now2 = 1_704_000_000_000 + 3_600_000

    t0 = time.time()
    if variant == "full":
        out = updatedb(db, seg, cfg, now2)
    else:
        membership = {"fp": "fingerprint", "bloom": "bloom"}[variant]
        out = updatedb_incremental(db, seg, cfg, now2, membership=membership)
    out.write.mode("overwrite").parquet(f"{tmp}/crawldb_out_{variant}_{parts}")
    dt = time.time() - t0

    print(json.dumps({
        "master": master, "variant": variant, "parts": parts,
        "sec": round(dt, 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    argv = sys.argv[1:]
    if os.environ.get("_PROBE_CHILD"):
        run_one(argv[0], argv[1], os.environ["_PROBE_TMP"])
        sys.exit(0)
    if "--" in argv:
        i = argv.index("--")
        masters, variants = argv[:i], argv[i + 1:]
    else:
        masters, variants = argv or ["local[4]"], ["full", "fp", "bloom"]
    tmp = os.environ.get("_PROBE_TMP_KEEP") or tempfile.mkdtemp(prefix="updatedb_probe_")
    try:
        if not os.path.exists(f"{tmp}/segment"):
            stage(tmp)
        for m in masters:
            for v in variants:
                env = dict(os.environ, _PROBE_CHILD="1", _PROBE_TMP=tmp)
                cmd = [sys.executable, __file__, m, v]
                if os.environ.get("NUTCH_BENCH_PIN") == "1":
                    from nutch_spark.session import _parse_local_cores

                    n = _parse_local_cores(m) or 4
                    cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0"] + cmd
                subprocess.run(cmd, env=env, check=True)
    finally:
        if not os.environ.get("_PROBE_TMP_KEEP"):
            shutil.rmtree(tmp, ignore_errors=True)
