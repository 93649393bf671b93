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
