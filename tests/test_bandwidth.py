"""F11 bandwidth controller: hand-replayed Fetcher.java:263-412
arithmetic — the N+1 check-ladder period, truncating bps / avg / delta
divisions, the maxNum cap, the queue-headroom gate, and the
keep-at-least-one halt rule."""

from dataclasses import replace

from nutch_spark.config import NutchConfig
from nutch_spark.operators.bandwidth import bandwidth_controller

NOW = 1_700_000_000_000

CFG = replace(
    NutchConfig(),
    fetcher_bandwidth_target_kbps=100,  # 100_000 bits/s
    fetcher_bandwidth_check_every_secs=2,  # checks every 3 s (N+1)
    fetcher_threads_fetch=4,
    fetcher_max_num_threads=8,
    fetcher_threads_per_queue=1,
)


def completions(spark, rows):
    return spark.createDataFrame(
        [(q, NOW + e, b) for q, e, b in rows],
        "host string, end_ms long, bytes long",
    )


def test_trajectory_halt_noop_add(spark):
    # q1 ends at 1s/5s/11s, q2 at 2s/7s/10s; checks at 3s, 6s, 9s
    # (12s is not < the 11s final completion: the monitor exits first)
    df = completions(
        spark,
        [
            ("q1", 1000, 60_000), ("q1", 5000, 30_000), ("q1", 11_000, 1_000),
            ("q2", 2000, 90_000), ("q2", 7000, 2_000), ("q2", 10_000, 1_000),
        ],
    )
    rows = {r["check_idx"]: r for r in bandwidth_controller(df, CFG, NOW).collect()}
    assert sorted(rows) == [1, 2, 3]

    # check 1: 150_000 B -> bps = 150000*8/2 = 600_000; avg = 150_000;
    # excess = (600000-100000)/150000 = 3 (trunc) < 4 threads -> halt 3
    r1 = rows[1]
    assert r1["check_ms"] == NOW + 3000
    assert (r1["bps"], r1["avg_bps_per_thread"]) == (600_000, 150_000)
    assert (r1["threads_before"], r1["delta_threads"], r1["threads_after"]) == (4, -3, 1)

    # check 2: +30_000 B -> bps 120_000; avg 120_000;
    # excess = 20000/120000 = 0 -> no-op
    r2 = rows[2]
    assert (r2["bps"], r2["delta_threads"], r2["threads_after"]) == (120_000, 0, 1)

    # check 3: +2_000 B -> bps 8_000 < target; avg 8_000; both queues'
    # last items are still pending (queue_count 2 > 1 thread, headroom);
    # add = 92000/8000 = 11, capped at maxNum(8) - 1 = 7
    r3 = rows[3]
    assert r3["queue_count"] == 2
    assert (r3["bps"], r3["delta_threads"], r3["threads_after"]) == (8_000, 7, 8)


def test_halt_floors_at_one_thread(spark):
    # excess = trunc(threads * (1 - target/bps)) <= threads-1 whenever
    # target > 0, so repeated over-target halts floor at one thread —
    # the reference's `excessThreads >= fetcherThreads.size() => 0`
    # guard (Fetcher.java:401-402) is unreachable while activeThreads
    # == pool size (it only covers naturally-exited threads still in
    # the list); we mirror the guard and test the invariant it serves
    cfg = replace(
        CFG, fetcher_bandwidth_target_kbps=1, fetcher_threads_fetch=8,
        fetcher_max_num_threads=8,
    )
    df = completions(
        spark,
        [("q1", 1000, 2_000_000), ("q1", 4000, 2_000_000),
         ("q1", 7000, 2_000_000), ("q1", 11_000, 2_000_000)],
    )
    rows = sorted(bandwidth_controller(df, cfg, NOW).collect(),
                  key=lambda r: r["check_idx"])
    # check 1: bps 8M, avg 1M, excess (8M-1000)//1M = 7 -> 8 threads - 7
    assert (rows[0]["threads_before"], rows[0]["threads_after"]) == (8, 1)
    # floor: with 1 thread avg == bps, excess = (bps-target)//bps = 0
    assert all(r["threads_after"] >= 1 for r in rows)
    assert rows[1]["threads_after"] == 1


def test_no_headroom_blocks_spawn(spark):
    # under target but queueCount * perQueue <= threads: no spawn
    # (Fetcher.java:363's worth-doing gate)
    cfg = replace(CFG, fetcher_threads_fetch=2)
    df = completions(spark, [("q1", 1000, 100), ("q1", 5000, 100), ("q1", 7000, 100)])
    rows = {r["check_idx"]: r for r in bandwidth_controller(df, cfg, NOW).collect()}
    r1 = rows[1]
    assert r1["bps"] < 100_000 and r1["queue_count"] == 1
    assert r1["delta_threads"] == 0


def test_empty_without_target_and_short_timeline(spark):
    df = completions(spark, [("q1", 1000, 100), ("q1", 2500, 100)])
    assert bandwidth_controller(df, NutchConfig(), NOW).count() == 0
    # timeline ends before the first check instant
    assert bandwidth_controller(df, CFG, NOW).count() == 0


def test_per_part_independent_replay(spark):
    df = spark.createDataFrame(
        [
            (0, "q1", NOW + 1000, 60_000), (0, "q1", NOW + 5000, 30_000),
            (1, "q2", NOW + 1000, 10), (1, "q2", NOW + 5000, 10),
        ],
        "part int, host string, end_ms long, bytes long",
    )
    rows = bandwidth_controller(df, CFG, NOW, part_col="part").collect()
    by_part = {r["part_id"]: r for r in rows}
    assert by_part[0]["delta_threads"] < 0  # over target -> halts
    assert by_part[1]["bps"] == 40 and by_part[1]["delta_threads"] == 0  # avg 10 > 0 but bps<target, q headroom? queue_count 1 <= 4 threads -> no spawn
