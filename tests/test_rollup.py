"""Rollup-hierarchy correctness: every materialized level and every
routed query equals the direct aggregation over raw events
(associativity of sum/count), and the router picks the coarsest
tiling level / refuses non-tiling requests."""

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import windows as W
from flink_window_dgim_traffic_spark.operators.rollup import (
    build_rollup_hierarchy,
    rollup_serve,
)
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def hierarchy(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("rollup"))
    ev = table(spark, sf_dir, "events")
    build_rollup_hierarchy(ev, path)
    return path, ev


def _direct(ev, size):
    return {
        (r["window_end"], r["ones_exact"], r["n_rows"])
        for r in W.tumble_exact(ev, size).collect()
    }


def test_each_level_equals_direct(spark, hierarchy):
    path, ev = hierarchy
    for size in (60, 3600, 86400):
        got = {
            tuple(r) for r in rollup_serve(spark, path, size).collect()
        }
        assert got == _direct(ev, size), size


def test_routed_granularity_from_finer_level(spark, hierarchy):
    path, ev = hierarchy
    # 600 s isn't materialized: served by re-aggregating the 60 s level
    got = {tuple(r) for r in rollup_serve(spark, path, 600).collect()}
    assert got == _direct(ev, 600)
    # 7200 s routes from the 3600 s level (coarsest tiling), not 60 s
    got = {tuple(r) for r in rollup_serve(spark, path, 7200).collect()}
    assert got == _direct(ev, 7200)


def test_router_reads_coarsest_tiling_level_only(spark, hierarchy):
    path, _ = hierarchy
    df = rollup_serve(spark, path, 7200)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "level-3600" in plan and "level-60" not in plan.replace(
        "level-3600", ""
    )


def test_router_refuses_non_tiling_request(spark, hierarchy):
    path, _ = hierarchy
    with pytest.raises(ValueError, match="tiles"):
        rollup_serve(spark, path, 90)


def test_build_rejects_non_nested_levels(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    with pytest.raises(ValueError, match="multiple"):
        build_rollup_hierarchy(ev, "/tmp/unused_rollup", levels=(60, 90))


def test_incremental_refresh_equals_full_rebuild(spark, sf_dir, tmp_path):
    """Continuous-aggregate refresh: building from half the events
    then refreshing with the other half (including 'late' rows for
    already-seen windows) must equal a full rebuild at every level
    and through the router."""
    ev = table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 3 != 0)
    late = ev.filter(F.col("event_id") % 3 == 0)  # interleaved = late
    inc_path = str(tmp_path / "inc")
    full_path = str(tmp_path / "full")
    build_rollup_hierarchy(first, inc_path)
    from flink_window_dgim_traffic_spark.operators.rollup import (
        refresh_rollup,
    )

    refresh_rollup(spark, inc_path, late)
    build_rollup_hierarchy(ev, full_path)
    for size in (60, 3600, 86400, 600):
        a = {tuple(r) for r in rollup_serve(spark, inc_path, size).collect()}
        b = {tuple(r) for r in rollup_serve(spark, full_path, size).collect()}
        assert a == b, size


def test_crash_between_level_write_and_marker_cannot_double_count(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The round-4 verdict's crash window: a refresh that dies AFTER
    writing merged level tables but BEFORE the commit marker must
    leave the committed state untouched (readers see the pre-crash
    snapshot), and the replay must converge to exactly one fold —
    never a double-counted sum."""
    from flink_window_dgim_traffic_spark.operators import rollup as R

    ev = table(spark, sf_dir, "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    late = ev.filter(F.col("event_id") % 2 == 1)
    path = str(tmp_path / "crash")
    build_rollup_hierarchy(first, path)
    before = {tuple(r) for r in rollup_serve(spark, path, 60).collect()}

    # crash simulation 1: ALL levels staged, marker never written
    real_marker = R._write_marker
    monkeypatch.setattr(
        R, "_write_marker",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with pytest.raises(RuntimeError, match="crash"):
        R.refresh_rollup(spark, path, late, tag="batch-7")
    assert {
        tuple(r) for r in rollup_serve(spark, path, 60).collect()
    } == before  # staged files invisible — state unchanged
    monkeypatch.setattr(R, "_write_marker", real_marker)

    # crash simulation 2: only the finest level staged (die during
    # the upward propagation), then a clean replay of the same tag
    real_coarsen = R._coarsen
    monkeypatch.setattr(
        R, "_coarsen",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash2")),
    )
    with pytest.raises(RuntimeError, match="crash2"):
        R.refresh_rollup(spark, path, late, tag="batch-7")
    for size in (60, 3600, 86400):
        assert {
            tuple(r) for r in rollup_serve(spark, path, size).collect()
        } == {
            tuple(r)
            for r in W.tumble_exact(first, size)
            .select("window_end", "ones_exact", "n_rows")
            .collect()
        }, size
    monkeypatch.setattr(R, "_coarsen", real_coarsen)

    # the replay: same tag, same committed base — exactly one fold
    assert R.refresh_rollup(spark, path, late, tag="batch-7") is True
    assert R.refresh_rollup(spark, path, late, tag="batch-7") is False
    full = str(tmp_path / "full")
    build_rollup_hierarchy(ev, full)
    for size in (60, 3600, 86400, 600):
        a = {tuple(r) for r in rollup_serve(spark, path, size).collect()}
        b = {tuple(r) for r in rollup_serve(spark, full, size).collect()}
        assert a == b, size


def test_vacuum_keeps_only_latest_committed_snapshot(
    spark, sf_dir, tmp_path
):
    import os

    from flink_window_dgim_traffic_spark.operators import rollup as R

    ev = table(spark, sf_dir, "events")
    path = str(tmp_path / "vac")
    build_rollup_hierarchy(ev.filter(F.col("event_id") % 2 == 0), path)
    R.refresh_rollup(spark, path, ev.filter(F.col("event_id") % 2 == 1))
    served = {tuple(r) for r in rollup_serve(spark, path, 600).collect()}
    removed = R.vacuum_rollup(path)
    assert removed == 3  # the superseded 'build' snapshot, per level
    assert os.listdir(f"{path}/level-60") == ["snap-refresh-1"]
    assert {
        tuple(r) for r in rollup_serve(spark, path, 600).collect()
    } == served
    assert R.vacuum_rollup(path) == 0  # idempotent


def test_serve_realtime_equals_direct_and_prunes_raw_scan(
    spark, sf_dir, tmp_path
):
    """Real-time continuous aggregate: hierarchy folded up to a time
    cut, newer events unmaterialized — the realtime serve must equal
    the direct aggregation over ALL events, and its raw-events scan
    must carry the ts >= high-water pushdown (the 100 TB contract:
    the log is read only above the materialization threshold)."""
    from flink_window_dgim_traffic_spark.operators.rollup import (
        rollup_serve_realtime,
    )

    ev = table(spark, sf_dir, "events")
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    cut = lo + (hi - lo) * 4 // 5
    folded = ev.filter(F.unix_micros("ts") <= cut)
    path = str(tmp_path / "rt")
    build_rollup_hierarchy(folded, path)
    got = rollup_serve_realtime(spark, path, 60, ev)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r)
        for r in W.tumble_exact(ev, 60)
        .select("window_end", "ones_exact", "n_rows")
        .collect()
    }
    plan = got._sc._jvm.PythonSQLUtils.explainString(
        got._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(ts" in plan


def test_refresh_batch_fn_replay_is_skipped(spark, sf_dir, tmp_path):
    from flink_window_dgim_traffic_spark.operators.rollup import (
        rollup_refresh_batch_fn,
    )

    ev = table(spark, sf_dir, "events")
    path = str(tmp_path / "r")
    build_rollup_hierarchy(ev.filter(F.col("event_id") % 2 == 0), path)
    fn = rollup_refresh_batch_fn(path)
    odd = ev.filter(F.col("event_id") % 2 == 1)
    fn(odd, 0)
    once = {tuple(r) for r in rollup_serve(spark, path, 60).collect()}
    fn(odd, 0)  # replayed batch: marker short-circuits, no double-sum
    assert {
        tuple(r) for r in rollup_serve(spark, path, 60).collect()
    } == once


def test_end_to_end_datasource_stream_to_rollup(spark, tmp_path):
    """Capstone composition: the registered traffic DataSource STREAM
    feeds the continuous-aggregate refresh via foreachBatch — the
    full reference pipeline (generator → stream → windowed aggregate
    store) with zero fixture files, exactly-once across restarts.
    The served 60 s counts must equal a batch aggregation of exactly
    the rows the stream emitted."""
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.operators.rollup import (
        rollup_refresh_batch_fn,
        rollup_serve,
    )
    from flink_window_dgim_traffic_spark.sources import (
        traffic_datasource as TD,
    )

    TD.register(spark)
    path = str(tmp_path / "agg")
    raw_out = str(tmp_path / "raw")
    ckpt = str(tmp_path / "ck")
    # empty hierarchy seed
    from flink_window_dgim_traffic_spark.operators.rollup import (
        build_rollup_hierarchy,
    )

    build_rollup_hierarchy(
        spark.createDataFrame(
            [], "event_id long, ts timestamp"
        ),
        path,
    )

    def run():
        s = (
            spark.readStream.format("traffic")
            .option("duration_sec", 120)
            .option("step_sec", 40)
            .load()
        )
        # parse the generator's wire rows into the events shape the
        # rollup expects, keeping a copy of the raw rows for the twin
        ev = (
            s.select(
                F.try_to_timestamp(
                    F.col("timestamp"),
                    F.lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
                ).alias("ts"),
                F.expr("try_cast(value AS INT)").alias("bit"),
            )
            .filter(F.col("ts").isNotNull() & F.col("bit").isNotNull())
            # rollup derives bit from event_id % 2: synthesize an
            # event_id with the right parity
            .select(F.col("bit").cast("long").alias("event_id"), "ts")
        )

        def fold(batch, bid):
            rollup_refresh_batch_fn(path)(batch, bid)
            batch.write.mode("append").parquet(raw_out)

        q = (
            ev.writeStream.foreachBatch(fold)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    for _ in range(4):  # drains the 120 s source in 40 s steps
        run()

    served = {
        tuple(r) for r in rollup_serve(spark, path, 60).collect()
    }
    raw = spark.read.parquet(raw_out).dropDuplicates()
    direct = {
        tuple(r)
        for r in raw.groupBy(
            F.window("ts", "60 seconds").alias("w")
        )
        .agg(
            F.sum(F.pmod("event_id", F.lit(2)).cast("int"))
            .cast("bigint")
            .alias("ones_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias(
                "window_end"
            ),
            "ones_exact",
            "n_rows",
        )
        .collect()
    }
    assert served == direct
    assert len(served) >= 2  # the 120 s source spans >= two windows


def test_refresh_retract_roundtrip(spark, tmp_path):
    """Folding a batch and then retracting it must restore the
    served windows exactly (sum/count are group aggregates), with
    zero-count windows dropped rather than left as zeros."""
    import datetime as dt

    from flink_window_dgim_traffic_spark.operators.rollup import (
        build_rollup_hierarchy,
        refresh_rollup,
        rollup_serve,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    base = spark.createDataFrame(
        [(i, t0 + dt.timedelta(seconds=10 * i)) for i in range(20)],
        "event_id: bigint, ts: timestamp",
    )
    # the batch lands partly in existing windows, partly in a NEW one
    batch = spark.createDataFrame(
        [
            (100, t0 + dt.timedelta(seconds=30)),
            (101, t0 + dt.timedelta(hours=2)),
        ],
        "event_id: bigint, ts: timestamp",
    )
    path = str(tmp_path / "roll")
    build_rollup_hierarchy(base, path)
    before = sorted(map(tuple, rollup_serve(spark, path, 60).collect()))
    assert refresh_rollup(spark, path, batch, tag="add")
    mid = sorted(map(tuple, rollup_serve(spark, path, 60).collect()))
    assert mid != before
    assert refresh_rollup(spark, path, batch, tag="undo", retract=True)
    after = sorted(map(tuple, rollup_serve(spark, path, 60).collect()))
    assert after == before  # incl. the 2h window fully dropped
    # replay-skip still holds for retractions
    assert not refresh_rollup(spark, path, batch, tag="undo",
                              retract=True)


def test_rollup_gc_snapshots(spark, sf_dir, tmp_path):
    """Generic snapshot GC over the rollup store: superseded level
    snapshots go, the latest stays serveable, replayed committed
    tags still skip."""
    import os

    from flink_window_dgim_traffic_spark.operators import rollup as RU
    from flink_window_dgim_traffic_spark.session import table

    path = str(tmp_path / "rugc")
    ev = table(spark, sf_dir, "events").limit(2000)
    RU.build_rollup_hierarchy(ev, path)
    for i in range(3):
        assert RU.refresh_rollup(
            spark, path, ev.limit(100), tag=f"g{i}"
        ) is True
    removed = RU.gc_snapshots(path, keep=1)
    assert removed > 0
    # still serves from the latest snapshot
    assert RU.rollup_serve(spark, path, 600).count() > 0
    # replay-skip intact
    assert RU.refresh_rollup(
        spark, path, ev.limit(100), tag="g2"
    ) is False
