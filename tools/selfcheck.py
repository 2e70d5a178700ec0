"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
at the given sf dir, compare row count, column names, and an
order-insensitive value hash. Usage:

    python tools/selfcheck.py [sf_dir] [query ...] [--json OUT.json]

``--json`` additionally writes one machine-readable record per query
(rows/cols/hash verdicts) — the committed SELFCHECK_r{N}.json artifact.
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 9))
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    records = []

    import __spark_entry__ as E
    from nutch_spark.session import get_spark

    spark = get_spark(app_name="selfcheck", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    # a typo'd CLI name must not yield a green "FAILURES: none" run that
    # verified nothing — unknown names are failures up front
    for unknown in sorted(only - qs.keys()):
        print(f"FAIL  {unknown}: no such query in queries()")
        failures.append(unknown)
        records.append({"query": unknown, "status": "fail", "error": "unknown query"})
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            records.append({"query": name, "status": "fail", "error": f"spark: {e}"})
            continue
        if name not in oracles:
            print(f"ok?   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            if len(srows) == 0 and name != "noop":
                print(f"      WARNING: {name} returned 0 rows")
            records.append({"query": name, "status": "rows_only", "rows": len(srows)})
            continue
        try:
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            records.append({"query": name, "status": "fail", "error": f"duckdb: {e}"})
            continue
        ok_rows = len(srows) == len(drows)
        ok_cols = sorted(scols) == sorted(dcols)
        sh = value_hash(srows, scols)
        dh = value_hash(drows, dcols)
        ok_hash = sh == dh
        status = "PASS " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        print(
            f"{status} {name}: rows {len(srows)}/{len(drows)} cols={ok_cols} "
            f"hash={'match' if ok_hash else 'MISMATCH'} ({time.time()-t0:.1f}s)"
        )
        records.append({
            "query": name,
            "status": "pass" if (ok_rows and ok_cols and ok_hash) else "fail",
            "rows_spark": len(srows), "rows_oracle": len(drows),
            "cols_match": ok_cols, "hash_match": ok_hash,
            "sec": round(time.time() - t0, 1),
        })
        if not (ok_rows and ok_cols and ok_hash):
            failures.append(name)
            if not ok_cols:
                print(f"      spark cols: {sorted(scols)}\n      duck  cols: {sorted(dcols)}")
            if ok_cols and not ok_hash:
                sset = {tuple(norm_cell(c) for c in r) for r in srows}
                dset = {tuple(norm_cell(c) for c in r) for r in drows}
                so = sorted(sset - dset)[:3]
                do = sorted(dset - sset)[:3]
                print(f"      spark-only sample: {so}")
                print(f"      duck-only  sample: {do}")
    print("FAILURES:", failures if failures else "none")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump({
                "sf_dir": sf_dir,
                "total": len(records),
                "pass": sum(r["status"] == "pass" for r in records),
                "rows_only": sum(r["status"] == "rows_only" for r in records),
                "fail": sorted(failures),
                "records": records,
            }, f, indent=1)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
