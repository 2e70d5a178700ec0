"""Parse-stage scaling probe: sub-step timings at one parallelism level.

The 1->4 scaling pairs (BENCH/MEASUREMENT_LOG.md r3b/r3c) show parse as
the outlier stage (2.2-2.6x speedup vs ~3.3x for its siblings). This
probe reproduces bench.py's c1_parse timed region — fetched_content
join -> parse() -> cache fills -> segment union write — on a smaller
fixture with per-sub-step timers, so the non-scaling component can be
localized instead of guessed.

Usage (same knobs as bench.py):
    NUTCH_BENCH_DOCS=2000000 NUTCH_BENCH_TOPN=200000 \
    NUTCH_BENCH_SHUFFLE=128 python tools/parse_probe.py local[1] local[4]

Prints one JSON line per master with sub-step seconds.
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


def run_one(master: str) -> None:
    from pyspark.sql import functions as F

    from nutch_spark.config import NutchConfig
    from nutch_spark.data.frontier import synth_web
    from nutch_spark.operators.fetchsim import fetch, fetched_content
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject_full
    from nutch_spark.operators.parse import parse
    from nutch_spark.session import get_spark, _parse_local_cores

    n_docs = int(os.environ.get("NUTCH_BENCH_DOCS", 2_000_000))
    n_hosts = max(100, n_docs // 50)
    top_n = int(os.environ.get("NUTCH_BENCH_TOPN", 200_000))
    cores = _parse_local_cores(master) or 4
    parts = int(os.environ.get("NUTCH_BENCH_SHUFFLE", max(cores, 8)))
    spark = get_spark(
        app_name="parse_probe", master=master, shuffle_partitions=parts
    )
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    cfg = NutchConfig(fetch_partitions=parts, generate_num_reducers=parts)

    tmp = tempfile.mkdtemp(prefix="parse_probe_")

    def _swap(df, name):
        path = f"{tmp}/{name}"
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    # ---- untimed staging: inject -> generate -> fetch ----------------
    web = synth_web(spark, n_docs=n_docs, n_hosts=n_hosts)
    docs = _swap(web["docs"], "docs")
    seeds = docs.select(F.col("doc_id").alias("value"))
    db = inject_full(spark, None, seeds, cfg, now_ms=1_704_000_000_000)
    db = _swap(db, "crawldb_0")
    fl = _swap(
        generate(db, cfg, 1_704_000_000_000, top_n=top_n, num_lists=parts),
        "fetchlist",
    )
    crawl_fetch, redirect_links = fetch(
        fl, web["robots"], web["outcomes"], cfg, 1_704_000_000_000
    )
    crawl_fetch = _swap(crawl_fetch, "crawl_fetch")
    redirect_links = _swap(redirect_links, "redirects")

    datum_cols = [
        "url", "status", "fetch_time", "retries", "fetch_interval", "score",
        "signature", "modified_time", "metadata", "gen_time", "repr_url",
    ]

    # ---- timed parse region, sub-stepped ------------------------------
    sub: dict[str, float] = {}
    t_stage = time.time()

    t0 = time.time()
    content = fetched_content(crawl_fetch, docs)
    handles: list = []
    parsed = parse(content, cfg, persist_handles=handles)
    sub["plan_build"] = time.time() - t0

    # fill each handle separately (materialize_parse_caches body, timed
    # per handle)
    for i, h in enumerate(handles):
        t0 = time.time()
        h.count()
        sub[f"fill_{i}"] = time.time() - t0

    t0 = time.time()
    seg = (
        crawl_fetch.select(*datum_cols)
        .unionByName(parsed["crawl_parse"].select(*datum_cols))
        .unionByName(redirect_links.select(*datum_cols))
    )
    seg.write.mode("overwrite").parquet(f"{tmp}/segment")
    sub["segment_write"] = time.time() - t0

    for h in handles:
        h.unpersist()
    sub["parse_total"] = time.time() - t_stage

    print(json.dumps({
        "master": master,
        "n_docs": n_docs,
        "top_n": top_n,
        "parts": parts,
        "sub": {k: round(v, 2) for k, v in sub.items()},
    }), flush=True)
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    masters = sys.argv[1:] or ["local[4]"]
    if os.environ.get("_PROBE_CHILD"):
        run_one(masters[0])
    else:
        for m in masters:
            # fresh JVM per level, like bench.py --scaling
            env = dict(os.environ, _PROBE_CHILD="1")
            cmd = [sys.executable, __file__, m]
            if os.environ.get("NUTCH_BENCH_PIN") == "1":
                from nutch_spark.session import _parse_local_cores

                n = _parse_local_cores(m) or 4
                # cap the whole process tree at N CPUs (see bench.py:
                # local[N] caps task slots, not Python workers/GC threads)
                cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0"] + cmd
            subprocess.run(cmd, env=env, check=True)
