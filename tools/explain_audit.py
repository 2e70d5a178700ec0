"""Dump physical plans for the heaviest contract queries.

Writes BENCH/plans/<query>.txt with `.explain("formatted")` output plus
a scan summary (PushedFilters / ReadSchema lines) so plan regressions
(lost pushdown, Python UDF creeping into a hot path, unexpected
global sort) are reviewable as text diffs.

    python tools/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, ".")

DEFAULT_QUERIES = [
    "updatedb_states",
    "updatedb_incremental",
    "generate_quota",
    "fetch_statuses",
    "parse_outlinks",
    "minhash_near_dups",
    "embedding_topk",
    "ivf_topk",
    "linkdb_invert",
    "dedup_mark",
    "depth_gate",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or DEFAULT_QUERIES

    import __spark_entry__ as E
    from nutch_spark.session import get_spark

    spark = get_spark(app_name="explain_audit", master="local[4]", shuffle_partitions=4)
    os.makedirs("BENCH/plans", exist_ok=True)
    qs = E.queries()
    rc = 0
    for name in names:
        # one bad name / one analysis error must not abort the audit and
        # leave the remaining plan files silently stale
        try:
            df = qs[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED to plan ({type(e).__name__}: {e})")
            rc = 1
            continue
        text = buf.getvalue()
        flags = []
        if "BatchEvalPython" in text:
            flags.append("WARNING: row-at-a-time Python UDF in plan")
        n_exchange = text.count("Exchange")
        # count Python nodes from the numbered-operator list (the tree
        # rendering repeats each node, which would double-count)
        n_python = sum(
            1 for ln in text.splitlines()
            if ln.startswith("(") and "ArrowEvalPython" in ln
        )
        summary = (
            f"query: {name}\nsf_dir: {sf_dir}\n"
            f"exchanges: {n_exchange}\npython_nodes: {n_python}\n"
            + ("\n".join(flags) + "\n" if flags else "")
            + "=" * 72 + "\n"
        )
        with open(f"BENCH/plans/{name}.txt", "w") as f:
            f.write(summary + text)
        print(f"{name}: exchanges={n_exchange} python_nodes={n_python} {' '.join(flags)}")
    spark.stop()
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
