"""publisher extension point: START/END/REPORT event fan-out and JSON
envelope (FetcherThread.java:307,399,829; FetcherThreadEvent.java)."""

import json

from nutch_spark.operators.publisher import (
    event_json,
    fetch_events,
    publish_jsonl,
)
from nutch_spark.schema import STATUS_FETCH_GONE, STATUS_FETCH_SUCCESS


def _fetchdf(spark):
    return spark.createDataFrame(
        [
            ("http://a/1", STATUS_FETCH_SUCCESS, 1000, 1.0),
            ("http://a/2", STATUS_FETCH_GONE, 2000, 0.5),
        ],
        "url string, status int, fetch_time long, score float",
    )


def test_event_fan_out(spark):
    ev = fetch_events(_fetchdf(spark), start_ms=500)
    rows = [(r["event_type"], r["url"]) for r in ev.collect()]
    assert rows.count(("START", "http://a/1")) == 1
    assert rows.count(("END", "http://a/2")) == 1
    # REPORT only for successes (FetcherThread.java:829 path)
    assert ("REPORT", "http://a/1") in rows
    assert ("REPORT", "http://a/2") not in rows
    assert len(rows) == 5


def test_json_envelope(spark):
    ev = event_json(fetch_events(_fetchdf(spark), start_ms=500))
    by_key = {
        (r["event_type"], r["url"]): json.loads(r["payload"])
        for r in ev.collect()
    }
    end = by_key[("END", "http://a/2")]
    assert end == {
        "eventType": "END",
        "url": "http://a/2",
        "timestamp": 2000,
        "eventData": {"status": "fetch_gone"},
    }
    start = by_key[("START", "http://a/1")]
    assert start["timestamp"] == 500 and start["eventData"] == {}
    rep = by_key[("REPORT", "http://a/1")]
    assert rep["eventData"] == {"score": "1.0", "fetchTime": "1000"}


def test_jsonl_sink(spark, tmp_path):
    out = str(tmp_path / "events")
    publish_jsonl(fetch_events(_fetchdf(spark), start_ms=500), out)
    lines = spark.read.text(out).collect()
    assert len(lines) == 5
    assert all(json.loads(l["value"])["eventType"] in
               {"START", "END", "REPORT"} for l in lines)
