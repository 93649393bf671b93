"""Streaming CEP funnel parity: out-of-order arrival ACROSS
micro-batches (within the watermark delay) must not change the
result vs the batch operator — the Flink-CEP buffering contract —
including across a checkpointed stop/restart."""

import json
import shutil

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import relational as R
from flink_window_dgim_traffic_spark.streaming import jobs as J
from flink_window_dgim_traffic_spark.streaming.funnel import funnel_stream

SCHEMA = (
    "event_id long, user_id long, ts timestamp, "
    "event_type string, value double"
)

# (event_id, user_id, ts, event_type) — chunk 2 arrives AFTER chunk 1
# but contains EARLIER event times (disorder within the 60 s delay):
# user 2's view precedes their chunk-1 click, so only a buffered fold
# gets user 2 past stage 1.
CHUNK1 = [
    (1, 1, "2026-01-01 00:00:10", "view"),
    (2, 1, "2026-01-01 00:00:40", "click"),
    (3, 2, "2026-01-01 00:00:05", "click"),
    (4, 3, "2026-01-01 00:00:50", "view"),
]
CHUNK2 = [
    (5, 2, "2026-01-01 00:00:02", "view"),
    (6, 1, "2026-01-01 00:00:45", "purchase"),
    (7, 3, "2026-01-01 00:01:30", "click"),
]
# far-future non-stage events only advance the watermark (filtered
# before the stateful operator), flushing every buffered fold
SENTINEL1 = [(98, 99, "2026-01-01 01:10:00", "other")]
SENTINEL2 = [(99, 99, "2026-01-01 02:00:00", "other")]


def _write_chunk(spark, tmp_path, src_dir, name, rows):
    df = spark.createDataFrame(
        [(e, u, t, et, 0.0) for e, u, t, et in rows],
        "event_id long, user_id long, ts_s string, event_type string, "
        "value double",
    ).select(
        "event_id",
        "user_id",
        F.to_timestamp("ts_s").alias("ts"),
        "event_type",
        "value",
    )
    stage = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    part = next(p for p in stage.iterdir() if p.name.endswith(".parquet"))
    shutil.copy(part, src_dir / f"{name}.parquet")


def test_funnel_stream_matches_batch_across_restarts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src))
        q = (
            funnel_stream(stream, delay="60 seconds")
            .writeStream.outputMode("update")
            .foreachBatch(J.upsert_foreach_batch_writer(out, ["user_id"]))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for name, rows in [
        ("c1", CHUNK1),
        ("c2", CHUNK2),
        ("c3", SENTINEL1),
        ("c4", SENTINEL2),
    ]:
        _write_chunk(spark, tmp_path, src, name, rows)
        run_once()

    final = {}
    for r in J.read_upsert_state(spark, out).collect():
        v = json.loads(r["value"])
        final[v["user_id"]] = v

    us = lambda t: int(  # noqa: E731
        spark.sql(f"SELECT unix_micros(timestamp'{t}')").collect()[0][0]
    )
    # user 1: clean in-order funnel; user 2: stage 2 only via the
    # buffered fold (view arrived a batch after the click); user 3:
    # view/click only; sentinel user 99 carries no stage events
    assert set(final) == {1, 2, 3, 99}
    assert final[99]["reached_stage"] == 0
    assert final[1]["reached_stage"] == 3
    assert final[1]["s3_us"] == us("2026-01-01 00:00:45")
    assert final[2]["reached_stage"] == 2
    assert final[2]["s1_us"] == us("2026-01-01 00:00:02")
    assert final[2]["s2_us"] == us("2026-01-01 00:00:05")
    assert final[3]["reached_stage"] == 2
    assert final[3]["s2_us"] == us("2026-01-01 00:01:30")

    # cross-check stage totals against the BATCH operator on the same
    # event multiset (sentinels included — non-stage types are inert)
    all_rows = CHUNK1 + CHUNK2 + SENTINEL1 + SENTINEL2
    batch = spark.createDataFrame(
        [(e, u, t, et, 0.0) for e, u, t, et in all_rows],
        "event_id long, user_id long, ts_s string, event_type string, "
        "value double",
    ).select(
        "event_id",
        "user_id",
        F.to_timestamp("ts_s").alias("ts"),
        "event_type",
        "value",
    )
    expect = {
        r["stage_idx"]: r["n_users"]
        for r in R.event_funnel(batch).collect()
    }
    got = {
        k: sum(1 for v in final.values() if v["reached_stage"] >= k)
        for k in (1, 2, 3)
    }
    assert got == expect


def test_tws_funnel_matches_classic(spark, tmp_path):
    """r11 TWS parity: FunnelProcessor (explicit event-time timers on
    transformWithStateInPandas) must land every user on the same
    final (reached_stage, stage times) as the classic
    applyInPandasWithState twin — including user 2, whose stage-2
    fold only happens through the ripe-buffer replay."""
    import pytest

    from flink_window_dgim_traffic_spark.streaming.funnel import (
        funnel_stream_tws,
    )
    from flink_window_dgim_traffic_spark.streaming.stateful_dgim import (
        tws_available,
        tws_state_store_conf,
    )

    if not tws_available():
        pytest.skip("TWS protobuf runtime unavailable on this host")

    chunks = [("c1", CHUNK1), ("c2", CHUNK2), ("c3", SENTINEL1),
              ("c4", SENTINEL2)]

    def run(builder, tag):
        src = tmp_path / f"src_{tag}"
        src.mkdir()
        out = str(tmp_path / f"out_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        for name, rows in chunks:
            _write_chunk(spark, tmp_path, src, f"{tag}_{name}", rows)
        stream = spark.readStream.schema(SCHEMA).option(
            "maxFilesPerTrigger", 1
        ).parquet(str(src))
        with tws_state_store_conf(spark):
            q = (
                builder(stream, delay="60 seconds")
                .writeStream.outputMode("update")
                .foreachBatch(
                    J.upsert_foreach_batch_writer(out, ["user_id"])
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        final = {}
        for r in J.read_upsert_state(spark, out).collect():
            v = json.loads(r["value"])
            # to_json drops null fields: absent stage time == NULL
            final[v["user_id"]] = (
                v["reached_stage"],
                v.get("s1_us"),
                v.get("s2_us"),
                v.get("s3_us"),
            )
        return final

    classic = run(funnel_stream, "classic")
    tws = run(funnel_stream_tws, "tws")
    assert tws == classic
    assert tws[1][0] == 3 and tws[2][0] == 2  # the buffered-fold user
