"""Fetch schedules as Spark column expressions (no per-row Python).

Strategy surface of ``crawl/FetchSchedule.java`` re-expressed as pure
column arithmetic; each function returns a dict of new column values
{fetch_time, fetch_interval, modified_time, retries} given input
columns. Implemented: Default (``crawl/DefaultFetchSchedule.java:29-47``)
and Adaptive (``crawl/AdaptiveFetchSchedule.java:97-147`` with the
fork's config values, ``conf/nutch-default.xml:580-620``).

Float32 parity: Java computes intervals in ``float``; every multiply
here is cast back to FloatType so Spark's JVM float32 arithmetic matches
Java bit-for-bit, and ``Math.round(float)`` maps to ``round()`` on the
float32 value (HALF_UP, identical for the positive intervals involved).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from nutch_spark.config import NutchConfig
from nutch_spark.schema import META_FIXED_INTERVAL

# FetchSchedule modification states (crawl/FetchSchedule.java)
STATUS_UNKNOWN = 0
STATUS_MODIFIED = 1
STATUS_NOTMODIFIED = 2

SECONDS_PER_DAY = 3600 * 24


def _f32(col: Column) -> Column:
    return col.cast("float")


def default_fetch_schedule(
    cfg: NutchConfig,
    fetch_time: Column,
    fetch_modified_time: Column,
    interval: Column,
    state: Column,
) -> dict[str, Column]:
    """DefaultFetchSchedule.setFetchSchedule: next = fetchTime + interval*1000."""
    iv = F.when(interval == 0, F.lit(cfg.db_fetch_interval_default)).otherwise(interval)
    new_mt = F.when(
        (fetch_modified_time <= 0) | (state == STATUS_MODIFIED), fetch_time
    ).otherwise(fetch_modified_time)
    return {
        "fetch_time": fetch_time + iv.cast("long") * 1000,
        "fetch_interval": iv.cast("int"),
        "modified_time": new_mt,
        "retries": F.lit(0),
    }


def adaptive_fetch_schedule(
    cfg: NutchConfig,
    fetch_time: Column,
    fetch_modified_time: Column,
    interval: Column,
    state: Column,
    metadata: Column,
    *,
    inc_rate: Column | None = None,
    dec_rate: Column | None = None,
) -> dict[str, Column]:
    """AdaptiveFetchSchedule.setFetchSchedule (fork config values).

    interval *= (1-dec_rate) on MODIFIED, *= (1+inc_rate) on NOTMODIFIED;
    ``fixedInterval`` metadata overrides; SYNC_DELTA shifts the reference
    time toward the modification time; clamp [min_interval, max_interval].
    ``inc_rate``/``dec_rate`` columns override the config rates per row
    (the MimeAdaptive hook, MimeAdaptiveFetchSchedule.java:103-127).
    """
    iv0 = _f32(F.when(interval == 0, F.lit(cfg.db_fetch_interval_default)).otherwise(interval))
    fixed = F.element_at(metadata, META_FIXED_INTERVAL).cast("float")
    has_fixed = fixed.isNotNull()

    if dec_rate is None:
        dec_factor = _f32(F.lit(1.0 - cfg.adaptive_dec_rate))
    else:
        dec_factor = _f32(F.lit(1.0).cast("float") - _f32(dec_rate))
    if inc_rate is None:
        inc_factor = _f32(F.lit(1.0 + cfg.adaptive_inc_rate))
    else:
        inc_factor = _f32(F.lit(1.0).cast("float") + _f32(inc_rate))

    # --- non-fixed branch ---
    mt0 = F.when(fetch_modified_time <= 0, fetch_time).otherwise(fetch_modified_time)
    iv1 = (
        F.when(state == STATUS_MODIFIED, _f32(iv0 * dec_factor))
        .when(state == STATUS_NOTMODIFIED, _f32(iv0 * inc_factor))
        .otherwise(iv0)
    )
    mt1 = F.when(state == STATUS_MODIFIED, fetch_time).otherwise(mt0)
    if cfg.adaptive_sync_delta:
        delta = ((fetch_time - mt1) / F.lit(1000)).cast("long")  # java long division
        iv2 = F.when(_f32(delta.cast("float")) > iv1, _f32(delta.cast("float"))).otherwise(iv1)
        ref_time = fetch_time - F.round(
            _f32(delta.cast("float") * _f32(F.lit(cfg.adaptive_sync_delta_rate)) * F.lit(1000.0).cast("float"))
        ).cast("long")
    else:
        iv2 = iv1
        ref_time = fetch_time
    iv3 = F.when(iv2 < F.lit(cfg.adaptive_min_interval).cast("float"), F.lit(cfg.adaptive_min_interval).cast("float")).when(
        iv2 > F.lit(cfg.adaptive_max_interval).cast("float"), F.lit(cfg.adaptive_max_interval).cast("float")
    ).otherwise(iv2)

    # --- combine fixed / adaptive ---
    final_iv = F.when(has_fixed, fixed).otherwise(iv3)
    final_ref = F.when(has_fixed, fetch_time).otherwise(ref_time)
    final_mt = F.when(has_fixed, fetch_modified_time).otherwise(mt1)
    return {
        "fetch_time": final_ref + F.round(final_iv.cast("double") * 1000.0).cast("long"),
        "fetch_interval": F.round(final_iv).cast("int"),
        "modified_time": final_mt,
        "retries": F.lit(0),
    }


def initialize_schedule(cfg: NutchConfig, now_ms: int) -> dict[str, Column]:
    """AbstractFetchSchedule.initializeSchedule — with the clock injected
    (the reference's System.currentTimeMillis becomes the ``now_ms`` param)."""
    return {
        "fetch_time": F.lit(now_ms),
        "fetch_interval": F.lit(cfg.db_fetch_interval_default),
        "retries": F.lit(0),
    }


def page_gone_schedule(cfg: NutchConfig, fetch_time: Column, interval: Column) -> dict[str, Column]:
    """AbstractFetchSchedule.setPageGoneSchedule: interval ×1.5 capped at 0.9×max."""
    grown = _f32(interval.cast("float") * F.lit(1.5).cast("float"))
    capped = F.when(
        grown < F.lit(cfg.db_fetch_interval_max).cast("float"), grown
    ).otherwise(_f32(F.lit(cfg.db_fetch_interval_max).cast("float") * F.lit(0.9).cast("float")))
    new_iv = F.round(capped).cast("int")
    return {
        "fetch_interval": new_iv,
        "fetch_time": fetch_time + new_iv.cast("long") * 1000,
    }


def page_retry_schedule(fetch_time: Column, retries: Column) -> dict[str, Column]:
    """AbstractFetchSchedule.setPageRetrySchedule: +1 day, retries+1."""
    return {
        "fetch_time": fetch_time + F.lit(SECONDS_PER_DAY * 1000).cast("long"),
        "retries": retries + 1,
    }


def calculate_last_fetch_time(status: Column, fetch_time: Column, interval: Column, unfetched_status: int) -> Column:
    """AbstractFetchSchedule.calculateLastFetchTime: 0 for unfetched, else
    fetchTime - interval*1000 (used by the CrawlDb merger J4)."""
    return F.when(status == unfetched_status, F.lit(0).cast("long")).otherwise(
        fetch_time - interval.cast("long") * 1000
    )


def should_fetch(
    cfg: NutchConfig, fetch_time: Column, interval: Column, cur_time: int
) -> tuple[Column, Column, Column]:
    """AbstractFetchSchedule.shouldFetch as columns.

    Returns (eligible, adjusted_fetch_time, adjusted_interval): far-future
    entries (fetchTime - curTime > maxInterval*1000) are clamped to
    curTime with interval capped at 0.9*max, then eligibility is
    fetchTime <= curTime.
    """
    far_future = (fetch_time - F.lit(cur_time)) > F.lit(cfg.db_fetch_interval_max).cast("long") * 1000
    adj_iv = F.when(
        far_future & (interval > cfg.db_fetch_interval_max),
        F.round(_f32(F.lit(cfg.db_fetch_interval_max).cast("float") * F.lit(0.9).cast("float"))).cast("int"),
    ).otherwise(interval)
    adj_ft = F.when(far_future, F.lit(cur_time).cast("long")).otherwise(fetch_time)
    eligible = adj_ft <= F.lit(cur_time)
    return eligible, adj_ft, adj_iv


def mime_adaptive_fetch_schedule(
    cfg: NutchConfig,
    fetch_time: Column,
    fetch_modified_time: Column,
    interval: Column,
    state: Column,
    metadata: Column,
    mime_rates: dict[str, tuple[float, float]] | None = None,
) -> dict[str, Column]:
    """MimeAdaptiveFetchSchedule (crawl/MimeAdaptiveFetchSchedule.java
    :103-127): per-MIME (inc, dec) rates looked up from the datum's
    Content-Type metadata (cleaned: parameters stripped, lowercased —
    MimeUtil.cleanMimeType); unknown/absent MIME falls back to the
    adaptive defaults. ``mime_rates``: {mime: (inc_rate, dec_rate)}."""
    if mime_rates is None:
        mime_rates = {m: (i, d) for m, i, d in (cfg.mime_schedule_rates or ())}
    ct = F.element_at(metadata, "Content-Type")
    mime = F.lower(F.trim(F.substring_index(ct, ";", 1)))
    inc: Column = F.lit(float(cfg.adaptive_inc_rate)).cast("float")
    dec: Column = F.lit(float(cfg.adaptive_dec_rate)).cast("float")
    for m, (i, d) in mime_rates.items():
        inc = F.when(mime == m, F.lit(float(i)).cast("float")).otherwise(inc)
        dec = F.when(mime == m, F.lit(float(d)).cast("float")).otherwise(dec)
    return adaptive_fetch_schedule(
        cfg, fetch_time, fetch_modified_time, interval, state, metadata,
        inc_rate=inc, dec_rate=dec,
    )
