"""Updatedb-stage scaling probe: sub-step timings at one parallelism level.

The round-3e 1->4 pair (BENCH/MEASUREMENT_LOG.md) shows updatedb as the
last stage under 3x speedup (2.82x vs ~3.4x siblings). This probe
reproduces bench.py's updatedb timed region — updatedb_incremental over
the staged crawldb_0 + cycle-1 segment, written to parquet — with
sub-step timers and a full-merge A/B, so the non-scaling component can
be localized.

Staging (inject -> generate -> fetch -> parse -> segment) runs ONCE in
the parent at local[32] unpinned into a shared temp dir; each probe
level then runs in a fresh pinned child JVM over the identical files.

Usage:
    NUTCH_BENCH_DOCS=20000000 NUTCH_BENCH_TOPN=2000000 \
    NUTCH_BENCH_SHUFFLE=128 NUTCH_BENCH_PIN=1 \
    python tools/updatedb_probe.py local[1] local[4]
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


def run_one(master: str, tmp: str) -> None:
    from pyspark.sql import functions as F

    from nutch_spark.operators.updatedb import updatedb, updatedb_incremental
    from nutch_spark.urls.urlseen import FingerprintSet

    spark, cfg, parts = _cfg_and_session(master, "updatedb_probe")
    db = spark.read.parquet(f"{tmp}/crawldb_0")
    seg = spark.read.parquet(f"{tmp}/segment")
    now2 = 1_704_000_000_000 + 3_600_000
    sub: dict[str, float] = {}

    # -- sub-step: the membership build alone (distinct is the parallel
    # part; the broadcast hash-relation build is driver-serial and only
    # shows up inside the split jobs — approximate it by forcing one
    # broadcast join action over a 1-row probe frame)
    t0 = time.time()
    fset = FingerprintSet(seg.select("url"))
    fset._fp.write.format("noop").mode("overwrite").save()
    sub["fp_distinct"] = time.time() - t0

    t0 = time.time()
    touched, untouched = fset.split(db)
    touched.write.format("noop").mode("overwrite").save()
    sub["split_semi_noop"] = time.time() - t0

    # -- the bench's timed region, exactly (fresh lineage)
    t0 = time.time()
    out = updatedb_incremental(db, seg, cfg, now2)
    out.write.mode("overwrite").parquet(f"{tmp}/crawldb_out_{parts}")
    sub["incremental_write"] = time.time() - t0

    # -- A/B: plain full merge, no split/broadcast
    t0 = time.time()
    out2 = updatedb(db, seg, cfg, now2)
    out2.write.mode("overwrite").parquet(f"{tmp}/crawldb_out_full_{parts}")
    sub["full_write"] = time.time() - t0

    print(json.dumps({
        "master": master,
        "parts": parts,
        "sub": {k: round(v, 2) for k, v in sub.items()},
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    masters = sys.argv[1:] or ["local[4]"]
    if os.environ.get("_PROBE_CHILD"):
        run_one(masters[0], os.environ["_PROBE_TMP"])
        sys.exit(0)
    tmp = tempfile.mkdtemp(prefix="updatedb_probe_")
    try:
        stage(tmp)
        for m in masters:
            env = dict(os.environ, _PROBE_CHILD="1", _PROBE_TMP=tmp)
            cmd = [sys.executable, __file__, m]
            if os.environ.get("NUTCH_BENCH_PIN") == "1":
                from nutch_spark.session import _parse_local_cores

                n = _parse_local_cores(m) or 4
                cmd = ["taskset", "-c", f"0-{n - 1}" if n > 1 else "0"] + cmd
            subprocess.run(cmd, env=env, check=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
