"""Streaming windowed aggregation over the events table.

The batch twin is ``__spark_entry__.q_events_window`` (tumbling-hour
counts + exact decimal sums, oracle-checked against DuckDB). This is
the same logical query as a Structured Streaming job: file-source
``readStream`` over event parquet, event-time watermark for late-data
bounds, tumbling window aggregation — the canonical
readStream → watermark → window → sink shape.

With the ``availableNow`` trigger it drains what exists and stops
(batch-equivalent semantics over closed input, which is also how the
equivalence test pins it against the batch aggregation); in continuous
mode the watermark drops events later than ``late_threshold`` and
emits append-mode finalized windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_counts(events: DataFrame, late_threshold: str = "1 hour") -> DataFrame:
    """The streaming aggregation (works on both batch and streaming
    DataFrames — same plan, Catalyst picks the stateful version)."""
    # parquet may surface ts as TIMESTAMP_NTZ; watermarks need TimestampType
    src = events.withColumn("ts", F.col("ts").cast("timestamp"))
    if events.isStreaming:
        src = src.withWatermark("ts", late_threshold)
    return src.groupBy(
        F.window("ts", "1 hour").alias("w"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    ).select(
        F.unix_timestamp("w.start").cast("long").alias("hour_ts"),
        "event_type", "n_events", "sum_value",
    )


def start_event_stream(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    *,
    schema=None,
    late_threshold: str = "1 hour",
    query_name: str = "event_windows",
    available_now: bool = True,
    output_mode: str | None = None,
):
    """File-source streaming variant writing to an in-memory sink named
    ``query_name`` (read back via ``spark.table(query_name)``).

    Output mode: ``complete`` by default for availableNow drains (every
    window emitted — batch-equivalent over closed input); ``append`` for
    continuous runs (windows emit once finalized by the watermark; the
    trailing unfinalized windows are withheld — that's the late-data
    contract, not a loss)."""
    if output_mode is None:
        output_mode = "complete" if available_now else "append"
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    src = spark.readStream.schema(schema).parquet(events_dir)
    agg = windowed_event_counts(src, late_threshold)
    writer = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
