"""Gap-based sessionization over the events table — the custom
stateful-streaming operator (applyInPandasWithState).

``batch_sessionize`` is the exact batch twin (lag/gap window — also the
DuckDB oracle in ``__spark_entry__``): a session is a maximal run of a
user's events where consecutive gaps are <= ``gap_ms``.

``stream_sessionize`` runs the same semantics incrementally: per-user
state holds EVERY session the watermark has not sealed — the newest one
plus any disjoint older sessions opened by late-but-in-watermark events
(which later late events may still join or even bridge together). A
session is emitted only once the watermark passes its ``end + gap``;
sessions still open at the end of an availableNow drain are withheld
(they could still grow) — the streaming/batch equivalence is over
sessions the watermark has sealed.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_ms", T.LongType()),
        T.StructField("session_end_ms", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

# per-user state: ALL sessions the watermark has not sealed yet, sorted
# by start — not just the latest one. A late-but-in-watermark event can
# open a session disjoint from (and older than) the current one, and a
# later in-watermark event may still merge with it; emitting such
# sessions eagerly would split what the batch twin merges (append-mode
# output cannot retract). Parallel arrays, one slot per open session.
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("starts", T.ArrayType(T.LongType())),
        T.StructField("lasts", T.ArrayType(T.LongType())),
        T.StructField("ns", T.ArrayType(T.LongType())),
        T.StructField("sums", T.ArrayType(T.StringType())),  # exact decimals as text
    ]
)


def batch_sessionize(events: DataFrame, gap_ms: int = 1_800_000) -> DataFrame:
    """Batch twin: classic lag/gap sessionization (oracle-checked)."""
    df = events.select(
        "user_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("ms")
    gap_break = F.when(
        F.col("ms") - F.lag("ms").over(w) > gap_ms, 1
    ).otherwise(0)
    df = df.withColumn("sid", F.sum(gap_break).over(w))
    return (
        df.groupBy("user_id", "sid")
        .agg(
            F.min("ms").alias("session_start_ms"),
            F.max("ms").alias("session_end_ms"),
            F.count("*").alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
        )
        .drop("sid")
    )


def _dadd(a: Decimal | None, b: Decimal | None) -> Decimal | None:
    """Null-skipping sum — the semantics of the batch twin's F.sum: null
    contributes nothing, and a session whose every value is null sums to
    NULL (not 0, and never NaN)."""
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _session_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = [f.name for f in OUTPUT_SCHEMA]

        # sessions: [start, last, n, Decimal-or-None sum], sorted by start
        if state.exists:
            st, la, ns, sms = state.get
            sessions = [
                [s, l, n, Decimal(m) if m is not None else None]
                for s, l, n, m in zip(st, la, ns, sms)
            ]
        else:
            sessions = []

        if not state.hasTimedOut:
            rows = pd.concat(list(pdfs)).sort_values("ms")
            for ms, v in zip(rows["ms"], rows["v"]):
                ms = int(ms)
                if pd.isna(v):
                    # a null value still counts the event but adds
                    # nothing (batch F.sum skips nulls; Decimal('nan')
                    # would poison the whole session's sum)
                    dv = None
                else:
                    # match Spark's double -> decimal(18,6) cast (HALF_UP)
                    dv = Decimal(str(v)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                placed = False
                for sess in sessions:
                    if sess[0] - gap_ms <= ms <= sess[1] + gap_ms:
                        sess[0] = min(sess[0], ms)
                        sess[1] = max(sess[1], ms)
                        sess[2] += 1
                        sess[3] = _dadd(sess[3], dv)
                        placed = True
                        break
                if not placed:
                    sessions.append([ms, ms, 1, dv])
                sessions.sort(key=lambda s: s[0])
                # the event may have bridged two previously-disjoint
                # sessions — merge adjacent ones now within the gap
                merged = [sessions[0]]
                for nxt in sessions[1:]:
                    curr = merged[-1]
                    if nxt[0] - curr[1] <= gap_ms:
                        curr[1] = max(curr[1], nxt[1])
                        curr[2] += nxt[2]
                        curr[3] = _dadd(curr[3], nxt[3])
                    else:
                        merged.append(nxt)
                sessions = merged

        # seal exactly what the event-time watermark has passed —
        # whether we got here by timeout or by new data. Strictly <:
        # Spark admits rows with ts >= watermark, so an event at exactly
        # wm == last + gap could still join the session; sealing it here
        # would split what the batch twin merges.
        wm = state.getCurrentWatermarkMs()
        sealed = [s for s in sessions if s[1] + gap_ms < wm]
        sessions = [s for s in sessions if s[1] + gap_ms >= wm]
        out: list[dict[str, Any]] = [
            {"user_id": user_id, "session_start_ms": s[0],
             "session_end_ms": s[1], "n_events": s[2],
             "sum_value": float(s[3]) if s[3] is not None else None}
            for s in sealed
        ]
        if sessions:
            state.update((
                [s[0] for s in sessions],
                [s[1] for s in sessions],
                [s[2] for s in sessions],
                [str(s[3]) if s[3] is not None else None for s in sessions],
            ))
            # earliest instant any open session can close, clamped past
            # the watermark (a kept session may sit exactly AT wm, and
            # Spark requires timeout > watermark)
            state.setTimeoutTimestamp(
                max(min(s[1] + gap_ms for s in sessions), wm + 1)
            )
        elif state.exists:
            state.remove()
        opdf = pd.DataFrame(out, columns=cols)
        # keep an all-None / mixed sum_value column as object dtype —
        # pandas would coerce None -> float NaN and Arrow ships NaN as a
        # (non-null) double, diverging from the batch twin's SQL NULL
        opdf["sum_value"] = opdf["sum_value"].astype(object).where(
            pd.notna(opdf["sum_value"]), None
        )
        yield opdf

    return fn


def stream_sessionize(
    events: DataFrame, gap_ms: int = 1_800_000, late_threshold: str = "1 hour"
) -> DataFrame:
    """Streaming sessionization over a streaming events DataFrame."""
    src = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", late_threshold)
        .select(
            "user_id", F.unix_millis("ts").alias("ms"),
            F.col("value").cast("double").alias("v"), "ts",
        )
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_ms),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
