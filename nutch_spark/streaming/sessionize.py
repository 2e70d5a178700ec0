"""Gap-based sessionization over the events table — the custom
stateful-streaming operator (applyInPandasWithState).

``batch_sessionize`` is the exact batch twin (lag/gap window — also the
DuckDB oracle in ``__spark_entry__``): a session is a maximal run of a
user's events where consecutive gaps are <= ``gap_ms``.

``stream_sessionize`` runs the same semantics incrementally: per-user
state holds the open session (start, last_ts, n_events, exact decimal
sum as string); an event-time timeout fires once the watermark passes
``last_ts + gap`` and emits the closed session. Sessions still open at
the end of an availableNow drain are withheld (they could still grow) —
the streaming/batch equivalence is over sessions the watermark has
sealed.
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

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("last_ms", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_str", T.StringType()),  # exact decimal as text
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


def _session_fn(gap_ms: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[dict[str, Any]] = []

        if state.hasTimedOut:
            if state.exists:
                s, last, n, sm = state.get
                out.append(
                    {"user_id": user_id, "session_start_ms": s,
                     "session_end_ms": last, "n_events": n,
                     "sum_value": float(Decimal(sm))}
                )
                state.remove()
            yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA])
            return

        rows = pd.concat(list(pdfs))
        rows = rows.sort_values("ms")
        if state.exists:
            s, last, n, sm = state.get
            cur = [s, last, n, Decimal(sm)]
        else:
            cur = None
        for ms, v in zip(rows["ms"], rows["v"]):
            ms = int(ms)
            # match Spark's double -> decimal(18,6) cast (HALF_UP)
            dv = Decimal(str(v)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
            if cur is None:
                cur = [ms, ms, 1, dv]
            elif ms - cur[1] > gap_ms:
                out.append(
                    {"user_id": user_id, "session_start_ms": cur[0],
                     "session_end_ms": cur[1], "n_events": cur[2],
                     "sum_value": float(cur[3])}
                )
                cur = [ms, ms, 1, dv]
            elif ms < cur[0] - gap_ms:
                # in-watermark event older than the open session by more
                # than the gap: a disjoint earlier session — emit it
                # eagerly (it could only grow from events even older,
                # which the batch twin would also place before it)
                out.append(
                    {"user_id": user_id, "session_start_ms": ms,
                     "session_end_ms": ms, "n_events": 1,
                     "sum_value": float(dv)}
                )
            else:
                # in-watermark out-of-order event merges into the open
                # session from either side (min start, max end)
                cur[0] = min(cur[0], ms)
                cur[1] = max(cur[1], ms)
                cur[2] += 1
                cur[3] += dv
        state.update((cur[0], cur[1], cur[2], str(cur[3])))
        # close once the event-time watermark passes last + gap
        state.setTimeoutTimestamp(cur[1] + gap_ms)
        yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA])

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
