"""Streaming SCD2 maintenance: ordered replay through the
incremental dimension job must equal the batch ``scd2_build`` over
the full change log — across multiple micro-batches, a restart, and
a crash between the state writes and the marker."""

import datetime
import os

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators.relational import scd2_build
from flink_window_dgim_traffic_spark.streaming.scd2 import (
    make_scd2_batch_fn,
    read_scd2,
    scd2_stream,
)

SCHEMA = "uid long, ts timestamp, state string, seq long"


def _mk(s):
    return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=s)


def _changes():
    """Time-ordered change log: collapses, flips, late-arriving keys,
    and a same-instant pair (seq breaks the tie)."""
    return [
        (1, _mk(0), "a", 1),
        (2, _mk(5), "x", 2),
        (1, _mk(10), "a", 3),    # no-op: collapses into the open 'a'
        (1, _mk(20), "b", 4),    # closes 'a'
        (2, _mk(25), "y", 5),
        (1, _mk(30), "b", 6),    # no-op
        (3, _mk(35), "q", 7),    # new key mid-stream
        (1, _mk(40), "c", 8),
        (1, _mk(40), "d", 9),    # same instant: d supersedes c
        (2, _mk(45), "y", 10),   # no-op
        (3, _mk(50), "r", 11),
    ]


def _norm(df):
    return {
        (
            r["uid"],
            r["state"],
            r["valid_from"].timestamp(),
            r["valid_to"].timestamp() if r["valid_to"] else None,
            r["is_current"],
        )
        for r in df.collect()
    }


def test_scd2_stream_ordered_replay_equals_batch(spark, tmp_path):
    rows = _changes()
    root = str(tmp_path / "dim")
    fn = make_scd2_batch_fn(root, ["uid"], ["state"], "ts", "seq")
    for i, lo in enumerate(range(0, len(rows), 4)):
        fn(spark.createDataFrame(rows[lo : lo + 4], SCHEMA), i)
    got = _norm(read_scd2(spark, root))
    expect = _norm(
        scd2_build(
            spark.createDataFrame(rows, SCHEMA),
            ["uid"], ["state"], "ts", "seq",
        )
    )
    assert got == expect
    # sanity on the fixture itself: the no-ops collapsed
    states_u1 = sorted(
        (vf, s) for (u, s, vf, _, _) in got if u == 1
    )
    assert [s for _, s in states_u1] == ["a", "b", "c", "d"]


def test_scd2_stream_crash_between_state_and_marker(spark, tmp_path):
    rows = _changes()
    root = str(tmp_path / "dim")
    fn = make_scd2_batch_fn(root, ["uid"], ["state"], "ts", "seq")
    fn(spark.createDataFrame(rows[:6], SCHEMA), 0)
    fn(spark.createDataFrame(rows[6:], SCHEMA), 1)
    os.remove(f"{root}/_done/1")  # crash: state staged, marker lost
    fn(spark.createDataFrame(rows[6:], SCHEMA), 1)  # replay
    fn(spark.createDataFrame(rows[6:], SCHEMA), 1)  # committed replay
    got = _norm(read_scd2(spark, root))
    expect = _norm(
        scd2_build(
            spark.createDataFrame(rows, SCHEMA),
            ["uid"], ["state"], "ts", "seq",
        )
    )
    assert got == expect


def test_scd2_stream_via_structured_streaming(spark, tmp_path):
    """The real streaming path: parquet chunks replayed one file per
    micro-batch through scd2_stream, then a restart with no new data
    (output unchanged)."""
    rows = _changes()
    src = str(tmp_path / "src")
    for i, lo in enumerate(range(0, len(rows), 4)):
        spark.createDataFrame(rows[lo : lo + 4], SCHEMA).coalesce(
            1
        ).write.mode("overwrite").parquet(f"{src}/chunk={i}")
    # one dir per chunk; register mtimes so file order == time order
    paths = sorted(
        f"{src}/chunk={i}/{n}"
        for i in range(3)
        for n in os.listdir(f"{src}/chunk={i}")
        if n.endswith(".parquet")
    )
    for i, p in enumerate(paths):
        os.utime(p, (1000000000 + i * 60,) * 2)
    root = str(tmp_path / "dim")
    ckpt = str(tmp_path / "ck")

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(src)
        )
        q = scd2_stream(stream, root, ckpt, ["uid"], ["state"], "ts", "seq")
        q.awaitTermination()

    run()
    once = _norm(read_scd2(spark, root))
    run()  # restart: no new files, dimension unchanged
    assert _norm(read_scd2(spark, root)) == once
    expect = _norm(
        scd2_build(
            spark.createDataFrame(rows, SCHEMA),
            ["uid"], ["state"], "ts", "seq",
        )
    )
    assert once == expect
