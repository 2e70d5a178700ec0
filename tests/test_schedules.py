"""Port of TestAdaptiveFetchSchedule.java:55-120 — interval after
MODIFIED / NOTMODIFIED / UNKNOWN = interval ∓ interval*rate (fork
config rates: inc 0.4 / dec 0.2, nutch-default.xml:580-620) — plus the
default schedule's fetchTime arithmetic."""

import pytest
from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.operators import schedules as S

NOW = 1_700_000_000_000
INTERVAL = 100 * 24 * 3600  # 100 days, as an arbitrary starting interval
CFG = NutchConfig()


def run_adaptive(spark, state, interval=INTERVAL, fetch_mt=0, metadata=None):
    df = spark.createDataFrame(
        [(NOW, fetch_mt, interval, state, metadata or {})],
        "fetch_time long, modified_time long, fetch_interval int, state int, metadata map<string,string>",
    )
    cols = S.adaptive_fetch_schedule(
        CFG, F.col("fetch_time"), F.col("modified_time"), F.col("fetch_interval"),
        F.col("state"), F.col("metadata"),
    )
    return df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0]


def test_adaptive_unknown_keeps_interval(spark):
    r = run_adaptive(spark, S.STATUS_UNKNOWN)
    assert r["fetch_interval"] == INTERVAL


def test_adaptive_modified_decreases(spark):
    r = run_adaptive(spark, S.STATUS_MODIFIED)
    assert r["fetch_interval"] == round(INTERVAL * (1.0 - CFG.adaptive_dec_rate))


def test_adaptive_notmodified_increases(spark):
    r = run_adaptive(spark, S.STATUS_NOTMODIFIED)
    assert r["fetch_interval"] == round(INTERVAL * (1.0 + CFG.adaptive_inc_rate))


def test_adaptive_clamps_to_max(spark):
    big = int(CFG.adaptive_max_interval)  # already at max; increase clamps
    r = run_adaptive(spark, S.STATUS_NOTMODIFIED, interval=big)
    assert r["fetch_interval"] == int(CFG.adaptive_max_interval)


def test_adaptive_min_interval_clamp(spark):
    r = run_adaptive(spark, S.STATUS_MODIFIED, interval=60)
    assert r["fetch_interval"] == int(CFG.adaptive_min_interval)


def test_adaptive_fixed_interval_override(spark):
    r = run_adaptive(spark, S.STATUS_MODIFIED, metadata={"fixedInterval": "12345.0"})
    assert r["fetch_interval"] == 12345
    assert r["fetch_time"] == NOW + 12345 * 1000


def test_adaptive_sync_delta_shifts_ref_time(spark):
    """SYNC_DELTA: delta=(fetchTime-modifiedTime)/1000; refTime shifts back
    by delta*0.3; interval floors at delta (AdaptiveFetchSchedule.java:128-136)."""
    mt = NOW - 50_000_000  # 50,000 s ago; delta < interval
    r = run_adaptive(spark, S.STATUS_UNKNOWN, fetch_mt=mt)
    delta = (NOW - mt) // 1000
    import numpy as np

    shift = round(float(np.float32(np.float32(delta) * np.float32(CFG.adaptive_sync_delta_rate) * np.float32(1000.0))))
    assert r["fetch_time"] == NOW - shift + INTERVAL * 1000
    assert r["modified_time"] == mt


def test_default_schedule(spark):
    df = spark.createDataFrame(
        [(NOW, 0, INTERVAL, S.STATUS_UNKNOWN), (NOW, 0, 0, S.STATUS_UNKNOWN)],
        "fetch_time long, modified_time long, fetch_interval int, state int",
    )
    cols = S.default_fetch_schedule(
        CFG, F.col("fetch_time"), F.col("modified_time"), F.col("fetch_interval"), F.col("state")
    )
    rows = df.select(*[v.alias(k) for k, v in cols.items()]).collect()
    assert rows[0]["fetch_time"] == NOW + INTERVAL * 1000
    assert rows[0]["modified_time"] == NOW  # first successful fetch
    # zero interval falls back to the default
    assert rows[1]["fetch_interval"] == CFG.db_fetch_interval_default
    assert rows[1]["fetch_time"] == NOW + CFG.db_fetch_interval_default * 1000


def test_should_fetch(spark):
    cur = NOW
    df = spark.createDataFrame(
        [
            (cur - 1000, INTERVAL),          # due
            (cur + 1000_000, INTERVAL),      # not yet
            (cur + (CFG.db_fetch_interval_max + 10) * 1000, CFG.db_fetch_interval_max * 2),  # far future: clamp + eligible
        ],
        "fetch_time long, fetch_interval int",
    )
    eligible, adj_ft, adj_iv = S.should_fetch(CFG, F.col("fetch_time"), F.col("fetch_interval"), cur)
    rows = df.select(eligible.alias("e"), adj_ft.alias("ft"), adj_iv.alias("iv")).collect()
    assert [r["e"] for r in rows] == [True, False, True]
    assert rows[2]["ft"] == cur
    assert rows[2]["iv"] == round(CFG.db_fetch_interval_max * 0.9)


def test_mime_adaptive_rates(spark):
    """MimeAdaptiveFetchSchedule: per-MIME inc/dec from Content-Type
    metadata, defaults when mime unknown/absent
    (MimeAdaptiveFetchSchedule.java:103-127)."""
    from nutch_spark.config import NutchConfig
    from nutch_spark.operators.schedules import (
        STATUS_NOTMODIFIED as NM,
        mime_adaptive_fetch_schedule,
    )
    from pyspark.sql import functions as F

    cfg = NutchConfig(adaptive_sync_delta=False)
    rates = {"text/html": (0.1, 0.5), "image/png": (1.0, 0.9)}
    df = spark.createDataFrame(
        [
            ("html", {"Content-Type": "text/html; charset=utf-8"}),
            ("png", {"Content-Type": "IMAGE/PNG"}),
            ("unknown", {"Content-Type": "application/pdf"}),
            ("absent", {}),
        ],
        "name string, metadata map<string,string>",
    )
    out = df.select(
        "name",
        mime_adaptive_fetch_schedule(
            cfg, F.lit(1_000_000_000).cast("long"), F.lit(0).cast("long"),
            F.lit(1000), F.lit(NM), F.col("metadata"), rates,
        )["fetch_interval"].alias("iv"),
    )
    iv = {r["name"]: r["iv"] for r in out.collect()}
    assert iv["html"] == 1100      # 1000 * (1 + 0.1)
    assert iv["png"] == 2000       # 1000 * (1 + 1.0), mime lowercased
    assert iv["unknown"] == 1400   # default inc 0.4
    assert iv["absent"] == 1400
