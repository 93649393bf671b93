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
