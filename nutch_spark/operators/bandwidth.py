"""F11 bandwidth auto-scaling controller (Fetcher.java:263-412).

The reference's 1 Hz monitor loop, when ``fetcher.bandwidth.target`` is
set, periodically compares the bits/sec downloaded since the last check
against the target and resizes the FetcherThread pool:

- every ``fetcher.bandwidth.target.check.everyNSecs`` loop ticks
  (Fetcher.java:341-344 — the ``counter < N ... counter == N`` ladder
  makes the real period N+1 seconds, an off-by-one we replicate),
- ``bpsSinceLastCheck = (bytes - bytesAtLastCheck) * 8 / everyNSecs``
  (Fetcher.java:345-346 — divided by N even though N+1 s elapsed),
- ``averageBdwPerThread = bps / activeThreads`` (int truncation, :354),
- under target AND queue headroom (``queueCount * maxThreadsPerQueue >
  activeThreads``, :363): spawn ``(target - bps) / avg`` threads
  (Java long division truncates; ``Math.round`` of the already-integral
  float is the identity, :367), capped at ``fetcher.maxNum.threads``
  (:368-374),
- over target: halt ``(bps - target) / avg`` threads from the pool
  tail, zeroed when that would stop every thread (:394-404).

Spark re-expression: the *decision trajectory* is computed exactly —
per-check byte/queue aggregates are distributed (one tiny groupBy each,
cardinality = number of checks, bounded by timeline_secs / (N+1)), and
the sequential thread-state fold runs on the driver over that
check-count-sized table (same audited-small-collect policy as the IVF
centroids). The *actuation* is N/A on Spark by design and documented in
SURVEY §2.6: a stage's task parallelism is fixed at submit time, so the
trajectory is exported as metrics — at cluster scale it is the signal
you would feed ``spark.dynamicAllocation`` or a structured-streaming
rate limiter, not something a running stage can apply to itself.

The politeness clock (operators/fetchsim.py) deliberately models
maxThreadsPerQueue=1 with one virtual thread per host queue, so thread
count never gates the simulated timeline; the controller therefore
observes the same completion stream the reference's monitor thread
observes, and its add/halt decisions match the reference's arithmetic
bit-for-bit (tests/test_bandwidth.py hand-replays Fetcher.java's
operations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from nutch_spark.config import NutchConfig

_OUT_SCHEMA = (
    "part_id int, check_idx int, check_ms long, bytes_total long, bps long,"
    " avg_bps_per_thread long, queue_count int, threads_before int,"
    " delta_threads int, threads_after int"
)


def bandwidth_controller(
    completions: DataFrame,
    cfg: NutchConfig,
    cycle_start_ms: int,
    *,
    queue_col: str = "host",
    end_col: str = "end_ms",
    bytes_col: str = "bytes",
    part_col: str | None = None,
) -> DataFrame:
    """Replay the F11 thread controller over a completion stream.

    ``completions``: one row per finished fetch with the wall completion
    instant (``end_col``, ms) and the downloaded payload size
    (``bytes_col``); ``queue_col`` identifies the politeness queue (for
    the queue-headroom gate) and ``part_col`` optionally scopes the
    replay per fetcher task, exactly like the reference runs one monitor
    loop per map task (checks run independently per part).

    Returns one row per check instant and part:
    ``(part_id, check_idx, check_ms, bytes_total, bps,
    avg_bps_per_thread, queue_count, threads_before, delta_threads,
    threads_after)``. Empty when no target is configured or the
    timeline is shorter than the first check.

    Check k (1-based) fires at ``cycle_start_ms + k*(N+1)*1000`` and
    sees every completion with ``end <= check_ms``; the monitor loop
    exits with the last thread, so checks stop strictly before the last
    completion instant (a check exactly at the final completion never
    runs — the do/while re-tests ``activeThreads > 0`` first).
    ``queue_count`` at a check counts queues that still hold
    not-yet-completed items, the virtual-clock stand-in for
    ``fetchQueues.getQueueCount()``.
    """
    spark: SparkSession = completions.sparkSession
    target_bps = cfg.fetcher_bandwidth_target_kbps * 1000
    if target_bps <= 0:
        return spark.createDataFrame([], _OUT_SCHEMA)
    n = max(1, cfg.fetcher_bandwidth_check_every_secs)
    period_ms = (n + 1) * 1000
    threads0 = cfg.fetcher_threads_fetch
    max_threads = max(cfg.fetcher_max_num_threads, threads0)
    per_queue = cfg.fetcher_threads_per_queue

    part = (
        F.col(part_col).cast("int") if part_col else F.lit(0).cast("int")
    ).alias("_part")
    end_off = (F.col(end_col).cast("long") - F.lit(cycle_start_ms)).alias("_end")
    ev = completions.select(
        part, end_off, F.col(bytes_col).cast("long").alias("_bytes"),
        F.col(queue_col).alias("_queue"),
    )

    # distributed per-check aggregates (cardinality = checks per part):
    # a completion at offset e is first visible at check ceil(e/period);
    # a queue stays in the count through the last check before its final
    # item completes (active at k iff k*period < max_end)
    first_k = F.ceil(F.col("_end") / F.lit(period_ms)).cast("int")
    by_check = (
        ev.groupBy("_part", first_k.alias("_k"))
        .agg(F.sum("_bytes").alias("_b"))
    )
    q_last_k = (
        ev.groupBy("_part", "_queue")
        .agg(F.max("_end").alias("_qend"))
        .select(
            "_part",
            (F.ceil(F.col("_qend") / F.lit(period_ms)) - 1).cast("int").alias("_k"),
        )
        .groupBy("_part", "_k")
        .agg(F.count("*").alias("_q"))
    )
    ends = ev.groupBy("_part").agg(F.max("_end").alias("_max_end"))

    # the three aggregates are tiny (checks x parts rows); the thread
    # state is a strict fold over check order, so replay it driver-side
    bytes_rows = by_check.collect()
    queue_rows = q_last_k.collect()
    end_rows = ends.collect()

    byte_at = {(r["_part"], r["_k"]): r["_b"] for r in bytes_rows}
    # suffix counts: queues active at check k = queues whose last-active
    # check index >= k
    qlast: dict[int, dict[int, int]] = {}
    for r in queue_rows:
        qlast.setdefault(r["_part"], {})[r["_k"]] = r["_q"]

    out = []
    for er in end_rows:
        p, max_end = er["_part"], er["_max_end"]
        n_checks = 0
        while (n_checks + 1) * period_ms < max_end:
            n_checks += 1
        qmap = qlast.get(p, {})
        # active-queue count per check via one suffix pass
        qcount = [0] * (n_checks + 2)
        run = sum(v for k, v in qmap.items() if k > n_checks)
        for k in range(n_checks, 0, -1):
            run += qmap.get(k, 0)
            qcount[k] = run
        threads = threads0
        cum = 0
        bytes_last = 0
        for k in range(1, n_checks + 1):
            cum += byte_at.get((p, k), 0)
            bps = ((cum - bytes_last) * 8) // n
            bytes_last = cum
            avg = bps // threads if threads > 0 else 0
            delta = 0
            if bps < target_bps and avg > 0:
                if qcount[k] * per_queue > threads:
                    add = (target_bps - bps) // avg
                    delta = min(add, max_threads - threads)
            elif bps > target_bps and avg > 0:
                excess = (bps - target_bps) // avg
                if excess >= threads:
                    excess = 0
                delta = -excess
            out.append(
                (
                    int(p), k, cycle_start_ms + k * period_ms, int(cum),
                    int(bps), int(avg), int(qcount[k]), int(threads),
                    int(delta), int(threads + delta),
                )
            )
            threads += delta
    return spark.createDataFrame(out, _OUT_SCHEMA)
