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


def test_event_stream_matches_batch(spark, tmp_path):
    """Streaming windowed agg == batch agg over the same closed input."""
    from nutch_spark.streaming.event_stream import (
        start_event_stream,
        windowed_event_counts,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    edir = str(tmp_path / "events")
    events.write.parquet(edir)

    q = start_event_stream(
        spark, edir, str(tmp_path / "ckpt_ev"), query_name="ev_win_test"
    )
    q.awaitTermination(180)
    got = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("ev_win_test").collect()
    }
    want = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(spark.read.parquet(edir)).collect()
    }
    assert got == want and len(got) > 0


def test_event_stream_append_watermark(spark, tmp_path):
    """Append mode withholds only unfinalized trailing windows."""
    from nutch_spark.streaming.event_stream import (
        start_event_stream,
        windowed_event_counts,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    edir = str(tmp_path / "events2")
    events.write.parquet(edir)
    q = start_event_stream(
        spark, edir, str(tmp_path / "ckpt_ev2"), query_name="ev_win_append",
        output_mode="append",
    )
    q.awaitTermination(180)
    got = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("ev_win_append").collect()
    }
    want = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_counts(spark.read.parquet(edir)).collect()
    }
    assert set(got) <= set(want)
    assert all(got[k] == want[k] for k in got)  # every emitted window exact


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Stateful sessionization (applyInPandasWithState) emits exactly
    the sessions the batch twin computes, for every session the
    watermark has sealed."""
    from nutch_spark.streaming.sessionize import batch_sessionize, stream_sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    edir = str(tmp_path / "ev")
    events.write.parquet(edir)

    GAP = 6 * 3600 * 1000  # 6h gap => several sessions per user
    src = spark.readStream.schema(events.schema).parquet(edir)
    q = (
        stream_sessionize(src, gap_ms=GAP)
        .writeStream.outputMode("append").format("memory")
        .queryName("sess_test")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(240)
    got = {
        (r["user_id"], r["session_start_ms"]):
            (r["session_end_ms"], r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("sess_test").collect()
    }
    want = {
        (r["user_id"], r["session_start_ms"]):
            (r["session_end_ms"], r["n_events"], round(r["sum_value"], 6))
        for r in batch_sessionize(events, gap_ms=GAP).collect()
    }
    assert len(got) > 0
    # every emitted session is exactly a batch session
    assert set(got) <= set(want)
    for k in got:
        assert got[k] == want[k], k
    # only trailing (unsealed) sessions may be withheld
    max_end = max(e for e, _, _ in want.values())
    for k, (end, _, _) in want.items():
        if k not in got:
            assert end + GAP >= max_end - 3_600_000  # within watermark horizon


class _FakeState:
    """Minimal GroupState double for driving _session_fn directly."""

    def __init__(self):
        self._val = None
        self.hasTimedOut = False
        self._wm = 0
        self.timeout = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def remove(self):
        self._val = None

    def getCurrentWatermarkMs(self):
        return self._wm

    def setTimeoutTimestamp(self, ts):
        self.timeout = ts


def test_sessionize_late_events_merge_not_split():
    """A late-but-in-watermark event disjoint from the open session must
    stay in state: a following late event within gap of it merges into
    ONE session (the batch twin's answer), not two eager singletons."""
    import pandas as pd

    from nutch_spark.streaming.sessionize import _session_fn

    fn = _session_fn(300)
    st = _FakeState()

    def feed(rows, wm=0, timed_out=False):
        st._wm = wm
        st.hasTimedOut = timed_out
        batches = iter([pd.DataFrame(rows, columns=["ms", "v"])]) if rows else iter([])
        return pd.concat(list(fn((1,), batches, st)))

    out1 = feed([(1000, 1.0)])
    assert len(out1) == 0
    out2 = feed([(100, 1.0), (150, 1.0)])      # late, disjoint from 1000
    assert len(out2) == 0                       # withheld, not eager singletons
    st.hasTimedOut = True
    st._wm = 2000
    out3 = pd.concat(list(fn((1,), iter([]), st)))
    got = sorted(
        (r.session_start_ms, r.session_end_ms, r.n_events)
        for r in out3.itertuples()
    )
    assert got == [(100, 150, 2), (1000, 1000, 1)]   # merged late session
    assert not st.exists


def test_sessionize_late_event_bridges_sessions():
    """One late event can connect two open sessions; all three pieces
    collapse into a single session."""
    import pandas as pd

    from nutch_spark.streaming.sessionize import _session_fn

    fn = _session_fn(300)
    st = _FakeState()
    st._wm = 0

    list(fn((1,), iter([pd.DataFrame([(1000, 1.0)], columns=["ms", "v"])]), st))
    list(fn((1,), iter([pd.DataFrame([(200, 1.0)], columns=["ms", "v"])]), st))
    # 500 extends [200,200] to [200,500]; 750 then lands within gap of
    # both [200,500] and [1000,1000] and must bridge them into one
    list(fn((1,), iter([pd.DataFrame([(500, 1.0)], columns=["ms", "v"])]), st))
    list(fn((1,), iter([pd.DataFrame([(750, 1.0)], columns=["ms", "v"])]), st))
    st.hasTimedOut = True
    st._wm = 5000
    out = pd.concat(list(fn((1,), iter([]), st)))
    got = [(r.session_start_ms, r.session_end_ms, r.n_events) for r in out.itertuples()]
    assert got == [(200, 1000, 4)]


def test_sessionize_watermark_boundary_event_still_joins():
    """An event at exactly ms == watermark == last+gap is admissible
    (Spark keeps ts >= watermark), so the session must NOT be sealed at
    <=: sealing is strict <."""
    import pandas as pd

    from nutch_spark.streaming.sessionize import _session_fn

    fn = _session_fn(300)
    st = _FakeState()
    st._wm = 0
    list(fn((1,), iter([pd.DataFrame([(0, 1.0)], columns=["ms", "v"])]), st))
    # watermark lands exactly on last+gap: session [0,0] must stay open
    st._wm = 300
    out = pd.concat(list(fn((1,), iter([pd.DataFrame([(300, 1.0)], columns=["ms", "v"])]), st)))
    assert len(out) == 0 and st.exists
    assert st.timeout > 300  # Spark requires timeout > watermark
    st.hasTimedOut = True
    st._wm = 1000
    final = pd.concat(list(fn((1,), iter([]), st)))
    got = [(r.session_start_ms, r.session_end_ms, r.n_events) for r in final.itertuples()]
    assert got == [(0, 300, 2)]  # one merged session, as the batch twin

def test_sessionize_null_values_match_batch_sum_semantics():
    """Null event values must not poison the session sum: the batch
    twin's F.sum skips nulls and returns NULL when EVERY value in the
    session is null — the stream path must do the same (NaN through
    Decimal arithmetic would wipe the whole session's sum and NaN is a
    non-null double on the Arrow wire, diverging from SQL NULL)."""
    import pandas as pd

    from nutch_spark.streaming.sessionize import _session_fn

    fn = _session_fn(300)
    st = _FakeState()
    st._wm = 0
    rows = [
        (100, 1.5), (200, None), (250, 2.0),    # session A: nulls skipped
        (5000, None), (5100, None),             # session B: all-null -> NULL
    ]
    list(fn((1,), iter([pd.DataFrame(rows, columns=["ms", "v"])]), st))
    st.hasTimedOut = True
    st._wm = 50_000
    out = pd.concat(list(fn((1,), iter([]), st))).sort_values("session_start_ms")
    got = [
        (r.session_start_ms, r.n_events, r.sum_value) for r in out.itertuples()
    ]
    assert got[0] == (100, 3, 3.5)          # null skipped, count kept
    assert got[1][:2] == (5000, 2)
    assert got[1][2] is None                # SQL NULL, not NaN and not 0.0
    assert not st.exists


def test_seed_stream_commits_urls_metric_without_lineage_rerun(spark, tmp_path):
    """The per-batch urls metric is derived from the committed snapshot
    (update_snapshot_metrics), not a pre-commit count of the uncommitted
    merge plan — and still lands on the right snapshot."""
    seeds = tmp_path / "seeds_m"
    os.makedirs(seeds)
    (seeds / "b.txt").write_text("http://a.example.com/\nhttp://b.example.com/\n")
    catalog = SnapshotCatalog(str(tmp_path / "wh_m"))
    q = start_seed_stream(
        spark, str(seeds), str(tmp_path / "ckpt_m"), catalog, NutchConfig()
    )
    _drain(q)
    (snap,) = [
        s for s in catalog.snapshots("crawldb")
        if s.lineage.get("stage") == "inject_stream"
    ]
    assert snap.metrics["urls"] == 2
