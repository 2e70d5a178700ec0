"""Streaming first-seen dedup (streaming/dedup_stream.py)."""

import os

from pyspark.sql import functions as F

from nutch_spark.streaming.dedup_stream import (
    first_seen,
    start_dedup_stream,
    stream_first_seen,
)


def _events(spark):
    rows = [
        (1, "2024-01-01 00:00:05", 10, "click", 1.0),
        (2, "2024-01-01 00:00:01", 10, "click", 2.0),  # earliest for (10,click)
        (3, "2024-01-01 00:00:09", 10, "view", 3.0),
        (4, "2024-01-01 00:00:02", 11, "click", 4.0),
        (5, "2024-01-01 00:00:03", 10, "click", 5.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_first_seen_batch_twin_deterministic(spark):
    out = {(r["user_id"], r["event_type"]): r
           for r in first_seen(_events(spark), ["user_id", "event_type"]).collect()}
    assert len(out) == 3
    assert out[(10, "click")]["event_id"] == 2  # min ts wins
    assert out[(10, "view")]["event_id"] == 3
    assert out[(11, "click")]["event_id"] == 4


def test_stream_first_seen_drains_one_row_per_key(spark, tmp_path):
    e = _events(spark)
    edir, cdir = str(tmp_path / "ev"), str(tmp_path / "ck")
    e.write.parquet(edir)
    q = start_dedup_stream(
        spark, edir, cdir, ["user_id", "event_type"],
        schema=e.schema, query_name="fs_test",
    )
    q.awaitTermination(120)
    got = spark.table("fs_test").collect()
    keys = [(r["user_id"], r["event_type"]) for r in got]
    # exactly one survivor per key; key set identical to the input's
    assert sorted(keys) == sorted({(10, "click"), (10, "view"), (11, "click")})
    # batch-mode degradation keeps the same key set too
    batch = stream_first_seen(e, ["user_id", "event_type"]).collect()
    assert sorted((r["user_id"], r["event_type"]) for r in batch) == sorted(keys)


def test_default_schema_inferred_from_batch_read(spark, tmp_path):
    """The documented schema=None default works: the streaming parquet
    source gets its schema from a batch read of the same dir (streaming
    sources do no inference on their own)."""
    e = _events(spark)
    edir = str(tmp_path / "ev_noschema")
    e.write.parquet(edir)
    q = start_dedup_stream(
        spark, edir, str(tmp_path / "ck_ns"), ["user_id", "event_type"],
        query_name="first_seen_ns",
    )
    q.awaitTermination(120)
    got = {(r["user_id"], r["event_type"]) for r in spark.table("first_seen_ns").collect()}
    assert got == {(10, "click"), (10, "view"), (11, "click")}
