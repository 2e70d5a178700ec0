"""publisher extension point: fetcher lifecycle events as a stream.

Re-expresses ``publisher/NutchPublisher.java`` + the event emission in
``fetcher/FetcherThread.java:307-308,399-401,829-836`` and the event
shape of ``FetcherThreadEvent.java:35-90``: every processed fetch item
publishes START when fetching begins and END with the fetch status
name when it completes; successfully fetched+parsed items additionally
publish REPORT carrying scoring/fetch metadata. The reference ships a
RabbitMQ transport (``publish-rabbitmq``); the wire transport is a
sink concern here — events are a DataFrame, serialized to the same
JSON envelope (eventType/url/timestamp/eventData) by :func:`event_json`
and delivered by any Spark sink (:func:`publish_jsonl` for files,
``writeStream.foreachBatch`` for brokers).

Determinism note: in the discrete-event simulator, START stamps the
cycle start and END stamps the item's virtual-clock completion
(``fetch_time``), so the event stream is exactly replayable — the
reference stamps wall-clock ``System.currentTimeMillis``
(FetcherThreadEvent.java:50).

Scale: pure column fan-out (three projections of the fetch output,
unioned), no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nutch_spark.operators.stats import status_name_col
from nutch_spark.schema import STATUS_FETCH_SUCCESS


def fetch_events(
    crawl_fetch: DataFrame, *, start_ms: int, include_report: bool = True
) -> DataFrame:
    """(event_type, url, timestamp_ms, event_data) rows: START + END per
    item, REPORT per successful fetch (FetcherThread.java:307,399,829)."""
    base = crawl_fetch.select("url", "status", "fetch_time", "score")
    empty = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    start = base.select(
        F.lit("START").alias("event_type"),
        "url",
        F.lit(start_ms).cast("long").alias("timestamp_ms"),
        empty.alias("event_data"),
    )
    end = base.select(
        F.lit("END").alias("event_type"),
        "url",
        F.col("fetch_time").alias("timestamp_ms"),
        F.create_map(F.lit("status"), status_name_col(F.col("status"))).alias(
            "event_data"
        ),
    )
    out = start.unionByName(end)
    if include_report:
        report = base.filter(F.col("status") == STATUS_FETCH_SUCCESS).select(
            F.lit("REPORT").alias("event_type"),
            "url",
            F.col("fetch_time").alias("timestamp_ms"),
            F.create_map(
                F.lit("score"), F.col("score").cast("string"),
                F.lit("fetchTime"), F.col("fetch_time").cast("string"),
            ).alias("event_data"),
        )
        out = out.unionByName(report)
    return out


def event_json(events: DataFrame) -> DataFrame:
    """Serialize to the FetcherThreadEvent JSON envelope."""
    return events.withColumn(
        "payload",
        F.to_json(
            F.struct(
                F.col("event_type").alias("eventType"),
                F.col("url"),
                F.col("timestamp_ms").alias("timestamp"),
                F.col("event_data").alias("eventData"),
            )
        ),
    )


def publish_jsonl(events: DataFrame, out_dir: str) -> None:
    """File sink: one JSON event per line (broker transports plug in
    via foreachBatch instead)."""
    event_json(events).select("payload").write.mode("overwrite").text(out_dir)
