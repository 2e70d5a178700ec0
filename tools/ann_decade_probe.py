"""ANN/dedup scale-decade probe (VERDICT r04, Next #8).

Repeats the sf1 frontier-probe methodology for the banded dedup/ANN
paths: run MinHash-LSH, SimHash64, sign-LSH embedding near-dup, and
IVF top-k over the SAME synthetic corpus at two sizes a decade apart
(sf0.1 documents/embeddings replicated with per-copy variant suffixes
and embedding perturbations — deterministic, no external data), with
Spark event logs on, and check that shuffle volume grows
linear-in-docs as the bucket math predicts (candidate pairs bounded by
``recommended_bucket_cap``; no per-bucket quadratic blowup).

Usage (one scale per process so each gets its own event log):

    NUTCH_ANN_MULT=4  python tools/ann_decade_probe.py --out /tmp/ann_4
    NUTCH_ANN_MULT=40 python tools/ann_decade_probe.py --out /tmp/ann_40
    python tools/analyze_eventlog.py /tmp/ann_4/eventlog --json ...

then summarize both into ``BENCH/probes/ann_decade_probe.md``.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def corpus(spark, sf_dir: str, mult: int):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    copies = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("c")
    d = docs.select("doc_id", "text", copies).select(
        (F.col("doc_id") + F.col("c") * 1_000_000).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" variant "), F.col("c").cast("string")
        ).alias("text"),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    e = emb.select("vec_id", "embedding", copies).select(
        (F.col("vec_id") + F.col("c") * 10_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + F.when(i == 0, F.col("c").cast("float") * 0.001).otherwise(
                F.lit(0.0)
            ),
        ).alias("embedding"),
    )
    return d, e


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mult = int(os.environ.get("NUTCH_ANN_MULT", "4"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    out = Path(sys.argv[sys.argv.index("--out") + 1]) if "--out" in sys.argv \
        else Path(f"/tmp/ann_probe_{mult}")
    evdir = out / "eventlog"
    evdir.mkdir(parents=True, exist_ok=True)

    os.environ.setdefault(
        "NUTCH_SPARK_EXTRA_CONF",
        json.dumps({
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": str(evdir),
        }),
    )
    from nutch_spark.session import get_spark
    from nutch_spark.ml.dedup import (
        minhash_near_duplicates,
        simhash64_near_duplicates,
    )
    from nutch_spark.ml.similarity import (
        embedding_near_duplicates,
        ivf_topk,
        recommended_bucket_cap,
        recommended_n_bits,
    )

    spark = get_spark(
        app_name=f"ann_probe_x{mult}", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    d, e = corpus(spark, sf_dir, mult)
    d = d.persist()
    e = e.persist()
    n_docs, n_vecs = d.count(), e.count()
    results = {"mult": mult, "n_docs": n_docs, "n_vecs": n_vecs, "ops": {}}

    cap4 = recommended_bucket_cap(n_docs, bands=4)
    nb = recommended_n_bits(n_vecs, target_bucket=256)
    cap2 = recommended_bucket_cap(n_vecs, bands=2)

    q = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ops = {
        "minhash": lambda: minhash_near_duplicates(
            d, threshold=0.8, num_hashes=16, bands=4, bucket_cap=cap4
        ).count(),
        "simhash64": lambda: simhash64_near_duplicates(
            d, max_hamming=3, bucket_cap=cap4
        ).count(),
        "sign_lsh": lambda: embedding_near_duplicates(
            e, threshold=0.9, dim=64, n_bits=nb, tables=2, bucket_cap=cap2
        ).count(),
        "ivf_topk": lambda: ivf_topk(
            e, q, k=10, n_centroids=16, n_probe=4
        ).count(),
    }
    for name, fn in ops.items():
        t0 = time.time()
        n = fn()
        results["ops"][name] = {"rows": n, "sec": round(time.time() - t0, 2)}
        print(f"{name}: rows={n} sec={results['ops'][name]['sec']}")

    results["params"] = {"cap4": cap4, "n_bits": nb, "cap2": cap2}
    (out / "results.json").write_text(json.dumps(results, indent=1))
    print(json.dumps(results))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
