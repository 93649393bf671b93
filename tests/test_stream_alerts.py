"""Streaming alerting twins (window Top-N, EWMA anomaly): ordered
file-replay through the streaming jobs must equal the batch operators
over the same closed windows, including across a kill-and-restart of
the EWMA job (batch-id-keyed state + marker)."""

import json
import os

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import windows as W
from flink_window_dgim_traffic_spark.streaming.alerts import (
    ewma_anomaly_stream,
    make_ewma_batch_fn,
    read_ewma_alerts,
    window_topn_stream,
)

SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)
BASE = 1_700_000_000  # aligned-ish epoch anchor


def _iso(sec: float) -> str:
    import datetime

    return datetime.datetime.fromtimestamp(
        sec, datetime.timezone.utc
    ).strftime("%Y-%m-%dT%H:%M:%S.%f")


def _burst_rows():
    """Three 60 s windows with distinct user activity profiles."""
    rows = []
    eid = 0
    base = (BASE // 60) * 60
    profile = [
        (0, {1: 3, 2: 2, 3: 1}),          # window 1
        (60, {4: 5, 5: 5, 6: 1}),         # window 2: tie at the top
        (120, {7: 2}),                    # window 3
    ]
    for off, users in profile:
        slot = 0
        for uid, n in users.items():
            for _ in range(n):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": _iso(base + off + 1 + slot * 0.5),
                        "user_id": uid,
                        "event_type": "view",
                        "value": 1.0,
                        "props": "{}",
                    }
                )
                eid += 1
                slot += 1
    return rows


def _sentinel_rows(which: int):
    base = (BASE // 60) * 60
    return [
        {
            "event_id": 9000 + which,
            "ts": _iso(base + 3600 * (which + 1)),
            "user_id": 999,
            "event_type": "view",
            "value": 0.0,
            "props": "{}",
        }
    ]


def _replay_dir(tmp_path):
    d = tmp_path / "src"
    d.mkdir()
    rows = _burst_rows()
    per = (len(rows) + 2) // 3
    for c in range(3):
        with open(f"{d}/chunk_{c}.json", "w") as f:
            f.write(
                "\n".join(
                    json.dumps(r) for r in rows[c * per : (c + 1) * per]
                )
            )
    for which in (0, 1):
        with open(f"{d}/chunk_{3 + which}_sentinel.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in _sentinel_rows(which)))
    for i, name in enumerate(sorted(os.listdir(d))):
        os.utime(f"{d}/{name}", (1000000000 + i * 60,) * 2)
    return str(d)


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


def _closed_batch_events(spark):
    """Batch twin input: everything the stream's final watermark
    closes — bursts + sentinel 0 (sentinel 1's own window never
    closes and is absent from both sides)."""
    rows = _burst_rows() + _sentinel_rows(0)
    return spark.createDataFrame(
        [
            (
                r["event_id"],
                r["ts"].replace("T", " "),
                r["user_id"],
                r["event_type"],
                r["value"],
                r["props"],
            )
            for r in rows
        ],
        "event_id long, ts_str string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.to_timestamp("ts_str").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def test_window_topn_stream_matches_batch(spark, tmp_path):
    src = _replay_dir(tmp_path)
    out = str(tmp_path / "topn_out")
    ckpt = str(tmp_path / "ckpt")
    q = window_topn_stream(_stream(spark, src), out, ckpt, 60, 2)
    q.awaitTermination()
    from flink_window_dgim_traffic_spark.streaming.alerts import (
        read_topn_alerts,
    )

    got = {
        tuple(r)
        for r in read_topn_alerts(spark, out)
        .select("window_end", "user_id", "n_events", "rnk")
        .collect()
    }
    expect = {
        tuple(r)
        for r in W.window_topn(_closed_batch_events(spark), 60, 2)
        .select("window_end", "user_id", "n_events", "rnk")
        .collect()
    }
    assert got == expect
    # the tie window ranks by user_id: 4 before 5
    tie = sorted(
        (r for r in got if r[1] in (4, 5)), key=lambda r: r[3]
    )
    assert [r[1] for r in tie] == [4, 5]


def test_topn_crash_between_write_and_marker(spark, tmp_path):
    """Replay after a crash that staged the ranked rows but never
    committed the streaming checkpoint must not duplicate the
    windows' top-k (the round-4 advisor's at-least-once finding)."""
    from flink_window_dgim_traffic_spark.streaming.alerts import (
        make_topn_batch_fn,
        read_topn_alerts,
    )

    out = str(tmp_path / "topn")
    fn = make_topn_batch_fn(out, k=1)
    batch = spark.createDataFrame(
        [("2024-01-01 00:01:00", 1, 5), ("2024-01-01 00:01:00", 2, 3)],
        "window_end string, user_id long, n_events bigint",
    )
    fn(batch, 0)
    os.remove(f"{out}/_done/0")  # crash: rows staged, marker lost
    fn(batch, 0)  # replay overwrites the same staged path
    fn(batch, 0)  # committed replay short-circuits
    rows = read_topn_alerts(spark, out).collect()
    assert [(r["user_id"], r["rnk"]) for r in rows] == [(1, 1)]


def test_ewma_stream_matches_batch_and_restarts(spark, tmp_path):
    src = _replay_dir(tmp_path)
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    def parsed():
        return _stream(spark, src).select(
            (F.col("event_id") % 2).cast("int").alias("bit"), "ts"
        )

    q = ewma_anomaly_stream(parsed(), state, ckpt, 60)
    q.awaitTermination()
    # restart with the same checkpoint: no new data, output unchanged
    q = ewma_anomaly_stream(parsed(), state, ckpt, 60)
    q.awaitTermination()

    got = {
        tuple(r)
        for r in read_ewma_alerts(spark, state).collect()
    }
    expect = {
        tuple(r)
        for r in W.ewma_anomaly(_closed_batch_events(spark), 60)
        .collect()
    }
    assert got == expect


def test_ewma_crash_between_state_and_marker(spark, tmp_path):
    """Replay after a crash that wrote state but not the marker must
    not double-fold the batch's windows into the EWMA tail."""
    state = str(tmp_path / "state")
    fn = make_ewma_batch_fn(state, lookback=20, factor=2)
    b1 = spark.createDataFrame(
        [("2024-01-01 00:01:00", 2), ("2024-01-01 00:02:00", 2)],
        "window_end string, ones_exact bigint",
    )
    b2 = spark.createDataFrame(
        [("2024-01-01 00:03:00", 8)],
        "window_end string, ones_exact bigint",
    )
    fn(b1, 0)
    fn(b2, 1)
    os.remove(f"{state}/_done/1")  # crash window: state staged, no marker
    fn(b2, 1)  # replay
    got = {
        r["window_end"]: (r["ewma_e6"], r["is_anomaly"])
        for r in read_ewma_alerts(spark, state).collect()
    }
    assert got["2024-01-01 00:02:00"] == (2000000, 0)
    assert got["2024-01-01 00:03:00"] == (2000000, 1)  # 8 > 2*2


def test_windowed_distinct_users_stream_matches_batch(spark, tmp_path):
    """HLL merge is associative/commutative, so the streaming sketch
    estimate equals the batch approx operator's exactly over the same
    closed windows."""
    from flink_window_dgim_traffic_spark.streaming.alerts import (
        windowed_distinct_users_stream,
    )

    src = _replay_dir(tmp_path)
    q = (
        windowed_distinct_users_stream(_stream(spark, src), 60)
        .writeStream.format("memory")
        .queryName("wdus")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        tuple(r)
        for r in spark.sql("select * from wdus").collect()
    }
    expect = {
        tuple(r)
        for r in W.windowed_distinct_users_approx(
            _closed_batch_events(spark), 60
        ).collect()
    }
    assert got == expect


def test_m4_downsample_stream_matches_batch(spark, tmp_path):
    """first/last/min/max ride associative struct min/max, so the
    native append-mode streaming aggregate equals the batch M4
    operator bit-for-bit over closed windows."""
    from flink_window_dgim_traffic_spark.streaming.alerts import (
        m4_downsample_stream,
    )

    src = _replay_dir(tmp_path)
    q = (
        m4_downsample_stream(_stream(spark, src), 60)
        .writeStream.format("memory")
        .queryName("m4s")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        tuple(r) for r in spark.sql("select * from m4s").collect()
    }
    expect = {
        tuple(r)
        for r in W.m4_downsample(_closed_batch_events(spark), 60)
        .collect()
    }
    assert got == expect


def test_seasonal_stream_matches_batch_and_replays(spark, tmp_path):
    """File-replayed seasonal-baseline maintenance: flags derived
    from the stream's committed counts snapshot must equal the batch
    operator over the same events (the state merge is keyed by
    window, so no watermark is involved); a checkpoint restart with
    no new data changes nothing."""
    from flink_window_dgim_traffic_spark.streaming.alerts import (
        read_seasonal_counts,
        seasonal_anomaly_stream,
    )

    src = _replay_dir(tmp_path)
    state = str(tmp_path / "seas_state")
    ckpt = str(tmp_path / "seas_ckpt")
    for _ in range(2):  # second run = restart, no new files
        q = seasonal_anomaly_stream(_stream(spark, src), state, ckpt, 60)
        q.awaitTermination()
    got = sorted(
        map(
            tuple,
            W.seasonal_flags(
                read_seasonal_counts(spark, state), 60, 3600, 3, 2
            ).collect(),
        )
    )
    # the stream folds ALL rows (late or not): batch twin = every row
    rows = _burst_rows() + _sentinel_rows(0) + _sentinel_rows(1)
    ev = spark.createDataFrame(
        [
            (r["event_id"], r["ts"].replace("T", " "), r["event_type"])
            for r in rows
        ],
        "event_id long, ts_str string, event_type string",
    ).select(
        "event_id", F.to_timestamp("ts_str").alias("ts"), "event_type"
    )
    want = sorted(
        map(tuple, W.seasonal_anomaly(ev, 60, 3600, 3, 2).collect())
    )
    assert got == want


def test_seasonal_crash_between_state_and_marker(spark, tmp_path):
    """A crash after the counts snapshot landed but before the marker
    must not double-count the batch on replay (the merge sums — NOT
    idempotent — so the replay must rebuild from the committed
    base)."""
    from flink_window_dgim_traffic_spark.streaming.alerts import (
        make_seasonal_batch_fn,
        read_seasonal_counts,
    )

    state = str(tmp_path / "seas2")
    fn = make_seasonal_batch_fn(state, 60)
    b0 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30", "click")],
        "event_id long, ts_s string, event_type string",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
    )
    fn(b0, 0)
    b1 = b0.withColumn("event_id", F.col("event_id") + 1)
    fn(b1, 1)
    os.remove(f"{state}/_done/1")  # crash: snapshot staged, marker lost
    fn(b1, 1)  # replay re-merges from batch 0's committed base
    fn(b1, 1)  # committed replay short-circuits
    counts = read_seasonal_counts(spark, state).collect()
    assert len(counts) == 1 and counts[0]["cnt"] == 2  # not 3 or 4


def _late_rows(spark, n=60):
    """Deterministic disorder: arrival = ts + (i%7)*90s jitter."""
    base = (BASE // 600) * 600
    rows = [
        (
            i,
            base + i * 20,                      # event time, 20 s apart
            base * 1_000_000
            + (i * 20 + (i % 7) * 90) * 1_000_000,  # arrival epoch µs
        )
        for i in range(n)
    ]
    import datetime

    return spark.createDataFrame(
        [
            (
                i,
                datetime.datetime.fromtimestamp(
                    t, datetime.timezone.utc
                ).replace(tzinfo=None),
                arr,
            )
            for i, t, arr in rows
        ],
        "event_id long, ts timestamp, arrival_us bigint",
    )


def test_late_audit_stream_matches_batch_and_crash(spark, tmp_path):
    """Chaining arrival-ordered batches through the foreachBatch fn
    must equal the one-shot batch audit (the watermark is the only
    cross-batch state), and a crash between the counts write and the
    marker must not double-fold on replay."""
    from flink_window_dgim_traffic_spark.streaming.alerts import (
        make_late_audit_batch_fn,
        read_late_audit,
    )

    df = _late_rows(spark)
    state = str(tmp_path / "late_state")
    fn = make_late_audit_batch_fn(state, "arrival_us", 60, 600)
    # split by ARRIVAL order into 3 chained batches
    qs = df.approxQuantile("arrival_us", [0.33, 0.66], 0.0)
    b0 = df.filter(F.col("arrival_us") <= qs[0])
    b1 = df.filter(
        (F.col("arrival_us") > qs[0]) & (F.col("arrival_us") <= qs[1])
    )
    b2 = df.filter(F.col("arrival_us") > qs[1])
    fn(b0, 0)
    fn(b1, 1)
    os.remove(f"{state}/_done/1")   # crash after stage, before marker
    fn(b1, 1)                       # replay re-stages from batch 0
    fn(b1, 1)                       # committed replay short-circuits
    fn(b2, 2)
    got = sorted(map(tuple, read_late_audit(spark, state).collect()))
    want = sorted(
        map(
            tuple,
            W.late_data_audit(
                df, "arrival_us", late_after_sec=60, size_sec=600
            ).collect(),
        )
    )
    assert got == want
    assert any(r[2] > 0 for r in got)  # the jitter really makes lates


def test_vacuum_snapshot_state(spark, tmp_path):
    """Vacuum removes superseded committed snapshots only: the latest
    committed snapshot, uncommitted staging dirs, and increment logs
    survive, and reads are unchanged."""
    from flink_window_dgim_traffic_spark.streaming.alerts import (
        make_seasonal_batch_fn,
        read_seasonal_counts,
        vacuum_snapshot_state,
    )

    state = str(tmp_path / "vac")
    fn = make_seasonal_batch_fn(state, 60)
    b = spark.createDataFrame(
        [(1, "2024-01-01 00:00:30", "click")],
        "event_id long, ts_s string, event_type string",
    ).select(
        "event_id", F.to_timestamp("ts_s").alias("ts"), "event_type"
    )
    fn(b, 0)
    fn(b, 1)
    fn(b, 2)
    before = sorted(
        map(tuple, read_seasonal_counts(spark, state).collect())
    )
    # fake a live (uncommitted) staging dir — must survive
    os.makedirs(f"{state}/counts/batch-9")
    removed = vacuum_snapshot_state(state)
    assert removed == 2  # batches 0 and 1 superseded
    assert os.path.isdir(f"{state}/counts/batch-2")
    assert os.path.isdir(f"{state}/counts/batch-9")
    assert not os.path.isdir(f"{state}/counts/batch-0")
    after = sorted(
        map(tuple, read_seasonal_counts(spark, state).collect())
    )
    assert after == before
    assert vacuum_snapshot_state(state) == 0  # idempotent
