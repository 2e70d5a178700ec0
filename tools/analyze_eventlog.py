#!/usr/bin/env python3
"""Summarize a Spark event log (rolling dir or single file): per-stage
task counts, shuffle read/write bytes, spill, and input read — the
evidence backing SURVEY §7's partition-count math (peak per-stage
shuffle and linearity-in-rows across scale tiers).

Usage:
    python tools/analyze_eventlog.py /tmp/spark-events/eventlog_v2_local-*/
    python tools/analyze_eventlog.py <dir> --top 15 --json out.json

Reads .zstd members via the zstd CLI (the python module is not in the
container). Pure driver-side tooling — no Spark session needed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys


def _iter_lines(path: str):
    """Yield event-log JSON lines from a file or rolling directory."""
    if os.path.isdir(path):
        members = sorted(glob.glob(os.path.join(path, "events_*")))
    else:
        members = [path]
    for m in members:
        if m.endswith(".zstd"):
            proc = subprocess.run(
                ["zstd", "-d", "-c", m], capture_output=True, check=True
            )
            data = proc.stdout
        else:
            with open(m, "rb") as f:
                data = f.read()
        for line in data.splitlines():
            if line.strip():
                yield line


_METRICS = {
    "internal.metrics.shuffle.write.bytesWritten": "shuffle_write",
    "internal.metrics.shuffle.read.remoteBytesRead": "shuffle_read_remote",
    "internal.metrics.shuffle.read.localBytesRead": "shuffle_read_local",
    "internal.metrics.memoryBytesSpilled": "mem_spill",
    "internal.metrics.diskBytesSpilled": "disk_spill",
    "internal.metrics.input.bytesRead": "input_read",
}


def summarize(path: str) -> dict:
    stages = []
    for raw in _iter_lines(path):
        try:
            ev = json.loads(raw)
        except json.JSONDecodeError:
            continue
        if ev.get("Event") != "SparkListenerStageCompleted":
            continue
        info = ev.get("Stage Info", {})
        row = {
            "stage_id": info.get("Stage ID"),
            "attempt": info.get("Stage Attempt ID"),
            "name": (info.get("Stage Name") or "")[:120],
            "num_tasks": info.get("Number of Tasks"),
            "shuffle_write": 0,
            "shuffle_read_remote": 0,
            "shuffle_read_local": 0,
            "mem_spill": 0,
            "disk_spill": 0,
            "input_read": 0,
        }
        for acc in info.get("Accumulables", []):
            key = _METRICS.get(acc.get("Name"))
            if key is not None:
                try:
                    row[key] = int(acc.get("Value", 0))
                except (TypeError, ValueError):
                    pass
        row["shuffle_read"] = (
            row.pop("shuffle_read_remote") + row.pop("shuffle_read_local")
        )
        stages.append(row)
    shuffling = [s for s in stages if s["shuffle_write"] or s["shuffle_read"]]
    return {
        "n_stages": len(stages),
        "n_shuffle_stages": len(shuffling),
        "total_shuffle_write": sum(s["shuffle_write"] for s in stages),
        "total_shuffle_read": sum(s["shuffle_read"] for s in stages),
        "peak_stage_shuffle_write": max(
            (s["shuffle_write"] for s in stages), default=0
        ),
        "peak_stage_shuffle_read": max(
            (s["shuffle_read"] for s in stages), default=0
        ),
        "total_input_read": sum(s["input_read"] for s in stages),
        "total_spill": sum(s["mem_spill"] + s["disk_spill"] for s in stages),
        "max_tasks_in_stage": max((s["num_tasks"] or 0 for s in stages), default=0),
        "stages": stages,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--top", type=int, default=10)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    s = summarize(args.path)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(s, f, indent=1)

    def mb(v):
        return f"{v / 1e6:10.1f} MB"

    print(
        f"stages={s['n_stages']} (shuffling={s['n_shuffle_stages']}) "
        f"max_tasks={s['max_tasks_in_stage']}"
    )
    print(
        f"shuffle write total={mb(s['total_shuffle_write'])} "
        f"peak-stage={mb(s['peak_stage_shuffle_write'])}"
    )
    print(
        f"shuffle read  total={mb(s['total_shuffle_read'])} "
        f"peak-stage={mb(s['peak_stage_shuffle_read'])}"
    )
    print(f"input read    total={mb(s['total_input_read'])}")
    print(f"spill         total={mb(s['total_spill'])}")
    print(f"\ntop {args.top} stages by shuffle write:")
    for st in sorted(s["stages"], key=lambda x: -x["shuffle_write"])[: args.top]:
        print(
            f"  stage {st['stage_id']:>4} tasks={st['num_tasks']:>4} "
            f"w={mb(st['shuffle_write'])} r={mb(st['shuffle_read'])} "
            f"{st['name'][:60]}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
