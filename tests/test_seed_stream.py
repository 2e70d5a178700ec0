"""Structured-Streaming seed injection (streaming/seed_stream.py)."""

import os

from nutch_spark.catalog import SnapshotCatalog
from nutch_spark.config import NutchConfig
from nutch_spark.streaming.seed_stream import start_seed_stream


def _drain(q):
    q.awaitTermination(120)


def test_seed_stream_incremental_injection(spark, tmp_path):
    seeds = tmp_path / "seeds"
    os.makedirs(seeds)
    (seeds / "batch1.txt").write_text(
        "http://a.example.com/\nhttp://b.example.com/\tnutch.score=2\n"
    )
    catalog = SnapshotCatalog(str(tmp_path / "wh"))
    cfg = NutchConfig()

    q = start_seed_stream(
        spark, str(seeds), str(tmp_path / "ckpt"), catalog, cfg
    )
    _drain(q)
    db = catalog.read(spark, "crawldb")
    rows = {r["url"]: r for r in db.collect()}
    assert set(rows) == {"http://a.example.com/", "http://b.example.com/"}
    assert rows["http://b.example.com/"]["score"] == 2.0
    assert all(r["status"] == 1 for r in rows.values())

    # second file arrives; only the delta is processed (checkpoint), the
    # existing URL keeps its datum (J1 merge), the new one is added
    (seeds / "batch2.txt").write_text(
        "http://b.example.com/\tnutch.score=9\nhttp://c.example.com/\n"
    )
    q2 = start_seed_stream(
        spark, str(seeds), str(tmp_path / "ckpt"), catalog, cfg
    )
    _drain(q2)
    db2 = catalog.read(spark, "crawldb")
    rows2 = {r["url"]: r for r in db2.collect()}
    assert set(rows2) == {
        "http://a.example.com/", "http://b.example.com/", "http://c.example.com/"
    }
    assert rows2["http://b.example.com/"]["score"] == 2.0  # old wins (no overwrite)
    # lineage recorded per micro-batch
    stages = [s.lineage.get("stage") for s in catalog.snapshots("crawldb")]
    assert stages.count("inject_stream") >= 2
