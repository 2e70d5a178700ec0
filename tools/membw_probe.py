#!/usr/bin/env python3
"""Memory-bandwidth scaling probe — window-quality evidence for the
pinned 1->4 scaling pairs.

The crawl cycle's 4-core efficiency is bounded by how much aggregate
DRAM bandwidth 4 pinned cores can get versus 1 (fetch/parse are
Arrow-batch + shuffle heavy). When a co-tenant VM is eating the host's
memory bus, 4-thread aggregate bandwidth scales sub-linearly and ANY
memory-bound workload's 1->4 efficiency is capped at that same ratio —
independent of this repo's code. This probe measures exactly that
number, so a sub-0.8 pair reading can be attributed (or not) to the
box with evidence instead of vibes.

Method: per thread, repeatedly copy a 256 MB numpy buffer (far beyond
L3, so it's all DRAM traffic) for ~wall seconds; aggregate GB/s at 1
thread and at N threads, pinned to distinct cores with taskset when
available. Efficiency = (N-thread aggregate) / (N * 1-thread).

    python tools/membw_probe.py [--threads 4] [--seconds 8]

Prints one JSON line; pair logs copy it into BENCH/probes/.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import time


def _copy_worker(core: int | None, seconds: float, out_q) -> None:
    if core is not None and hasattr(os, "sched_setaffinity"):
        try:
            os.sched_setaffinity(0, {core})
        except OSError:
            pass
    import numpy as np

    buf = np.ones(256 * 1024 * 1024 // 8, dtype=np.float64)  # 256 MB
    dst = np.empty_like(buf)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        np.copyto(dst, buf)
        n += 1
    dt = time.perf_counter() - t0
    # each copy reads 256 MB and writes 256 MB
    out_q.put(n * 2 * buf.nbytes / dt / 1e9)


def _measure(n: int, seconds: float) -> float:
    q = mp.Queue()
    procs = [
        mp.Process(target=_copy_worker, args=(i, seconds, q)) for i in range(n)
    ]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return sum(rates)


def run(threads: int, seconds: float, repeats: int = 3) -> dict:
    """Interleave 1-thread and N-thread measurements `repeats` times —
    contention varies on second scales, so a single sample of each is
    meaningless; best-of approximates the uncontended capability and
    the spread IS the window-quality signal."""
    ones, manys = [], []
    for _ in range(repeats):
        ones.append(_measure(1, seconds))
        manys.append(_measure(threads, seconds))
    one, many = max(ones), max(manys)
    return {
        "metric": "membw_scaling",
        "threads": threads,
        "gbps_1_best": round(one, 2),
        f"gbps_{threads}_best": round(many, 2),
        "gbps_1_all": [round(v, 2) for v in ones],
        f"gbps_{threads}_all": [round(v, 2) for v in manys],
        "efficiency_best": round(many / (threads * one), 3),
        "efficiency_paired": [
            round(m / (threads * o), 3) for o, m in zip(ones, manys)
        ],
        "buffer_mb": 256,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--seconds", type=float, default=8.0)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    print(json.dumps(run(args.threads, args.seconds, args.repeats)))
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
