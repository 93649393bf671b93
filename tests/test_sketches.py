"""Mergeable-sketch surfaces (operators/sketches.py): theta distinct
counts and set algebra, the sketch rollup hierarchy, and KLL quantile
bounds.  The exactness premise the oracle rests on (theta exact below
2^lg_k retained keys) is asserted directly here at sf0.001."""

import bisect

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import sketches as SK


def _exact_distinct(events, size_sec):
    we = ((F.floor(F.unix_timestamp("ts") / size_sec) + 1) * size_sec)
    rows = (
        events.groupBy(we.cast("bigint").alias("we_sec"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(
                F.timestamp_seconds("we_sec"), SK.TS_FMT_SPARK
            ).alias("window_end"),
            "n_users",
            "n_rows",
        )
        .collect()
    )
    return {r.window_end: (r.n_users, r.n_rows) for r in rows}


def test_theta_windowed_distinct_exact_below_capacity(events):
    got = {
        r.window_end: (r.n_users, r.n_rows)
        for r in SK.theta_windowed_distinct(events, 600).collect()
    }
    assert got == _exact_distinct(events, 600)


def test_theta_overlap_matches_exact_set_algebra(spark, events):
    got = {
        r.window_end: (r.n_a, r.n_b, r.n_overlap, r.n_union)
        for r in SK.theta_audience_overlap(events, 86400).collect()
    }
    rows = events.select(
        (((F.floor(F.unix_timestamp("ts") / 86400) + 1) * 86400)
         .cast("bigint").alias("we")),
        "event_type",
        "user_id",
    ).collect()
    days = {}
    for r in rows:
        a, b = days.setdefault(r.we, (set(), set()))
        if r.event_type == "view":
            a.add(r.user_id)
        elif r.event_type == "purchase":
            b.add(r.user_id)
    import datetime

    for we, (a, b) in days.items():
        key = datetime.datetime.utcfromtimestamp(we).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        assert got[key] == (len(a), len(b), len(a & b), len(a | b))
    assert len(got) == len(days)


def test_theta_sketch_agg_ignores_nulls(spark):
    # the conditional-aggregate one-pass overlap relies on NULLs (the
    # CASE's else branch) being excluded from the sketch
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (2, "b"), (3, "b")], "uid long, t string"
    )
    row = df.agg(
        F.theta_sketch_estimate(
            F.theta_sketch_agg(F.when(F.col("t") == "a", F.col("uid")))
        ).alias("n")
    ).collect()[0]
    assert row.n == 2


@pytest.fixture(scope="module")
def sketch_rollup(tmp_path_factory, events):
    path = str(tmp_path_factory.mktemp("skroll"))
    SK.build_sketch_rollup(events, path)
    return path


def test_sketch_rollup_serve_equals_direct_exact(
    spark, events, sketch_rollup
):
    # 600 s is served by unioning ten 60 s blobs; 3600 s reads the
    # materialized hourly level directly — both must equal exact
    for sec in (600, 3600, 86400):
        got = {
            r.window_end: (r.n_users, r.n_rows)
            for r in SK.sketch_rollup_serve(
                spark, sketch_rollup, sec
            ).collect()
        }
        assert got == _exact_distinct(events, sec)


def test_sketch_rollup_serve_reads_coarsest_level_only(
    spark, sketch_rollup
):
    df = SK.sketch_rollup_serve(spark, sketch_rollup, 7200)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "level-3600" in plan and "level-60" not in plan.replace(
        "level-3600", ""
    )


def test_sketch_rollup_refuses_uncommitted(spark, tmp_path):
    with pytest.raises(ValueError, match="no committed"):
        SK.sketch_rollup_serve(spark, str(tmp_path), 600)


def test_kll_quantiles_within_rank_bound(spark, events, sketch_rollup):
    # merged-minute KLL p50/p95 must land within 5% rank error of the
    # exact per-window distribution (KLL guarantees ~1.65% at k=200)
    got = {
        r.window_end: (r.p50, r.p95)
        for r in SK.kll_rollup_quantiles(
            spark, sketch_rollup, 3600
        ).collect()
    }
    vals = {}
    rows = events.select(
        (((F.floor(F.unix_timestamp("ts") / 3600) + 1) * 3600)
         .cast("bigint")).alias("we"),
        "value",
    ).collect()
    import datetime

    for r in rows:
        vals.setdefault(r.we, []).append(r.value)
    assert len(got) == len(vals)
    for we, vs in vals.items():
        key = datetime.datetime.utcfromtimestamp(we).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        vs.sort()
        n = len(vs)
        for est, q in zip(got[key], (0.5, 0.95)):
            # rank of the estimate within the exact sorted values
            lo = bisect.bisect_left(vs, est) / n
            hi = bisect.bisect_right(vs, est) / n
            assert lo - 0.05 <= q <= hi + 0.05, (we, q, est, lo, hi)


def test_build_refuses_rebuild(events, sketch_rollup):
    with pytest.raises(ValueError, match="already built"):
        SK.build_sketch_rollup(events, sketch_rollup)


def test_theta_churn_matches_exact_sets(events):
    got = {
        r.window_end: (r.n_active, r.n_retained, r.n_new, r.n_churned)
        for r in SK.theta_churn(events, 86400).collect()
    }
    rows = events.select(
        (((F.floor(F.unix_timestamp("ts") / 86400) + 1) * 86400)
         .cast("bigint")).alias("we"),
        "user_id",
    ).collect()
    days = {}
    for r in rows:
        days.setdefault(r.we, set()).add(r.user_id)
    import datetime

    for we, cur in days.items():
        prev = days.get(we - 86400)
        key = datetime.datetime.utcfromtimestamp(we).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        if prev is None:
            assert got[key] == (len(cur), 0, len(cur), 0)
        else:
            assert got[key] == (
                len(cur),
                len(cur & prev),
                len(cur - prev),
                len(prev - cur),
            )
    assert len(got) == len(days)


def test_sketch_refresh_crash_window_and_replay(
    spark, sf_dir, tmp_path, monkeypatch, events
):
    """Same discipline as the sum-rollup: a refresh dying after level
    writes but before the marker leaves committed state untouched;
    the replay converges to exactly one fold."""
    import pytest as _pytest

    first = events.filter(F.col("event_id") % 2 == 0)
    late = events.filter(F.col("event_id") % 2 == 1)
    path = str(tmp_path / "skcrash")
    SK.build_sketch_rollup(first, path)
    before = {
        tuple(r)
        for r in SK.sketch_rollup_serve(spark, path, 60).collect()
    }

    real_marker = SK._write_marker
    monkeypatch.setattr(
        SK, "_write_marker",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("crash")),
    )
    with _pytest.raises(RuntimeError, match="crash"):
        SK.refresh_sketch_rollup(spark, path, late, tag="batch-3")
    assert {
        tuple(r)
        for r in SK.sketch_rollup_serve(spark, path, 60).collect()
    } == before
    monkeypatch.setattr(SK, "_write_marker", real_marker)

    assert SK.refresh_sketch_rollup(spark, path, late, tag="batch-3")
    assert not SK.refresh_sketch_rollup(spark, path, late, tag="batch-3")
    # refreshed hierarchy == hierarchy built from everything at once
    for sec in (60, 3600, 86400):
        got = {
            r.window_end: (r.n_users, r.n_rows)
            for r in SK.sketch_rollup_serve(spark, path, sec).collect()
        }
        assert got == _exact_distinct(events, sec), sec


def test_sketch_realtime_serve_equals_direct(spark, events, tmp_path):
    # hierarchy folded only up to a cut; realtime serve must still
    # reproduce the exact distinct counts over ALL events
    lo, hi = events.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    cut = lo + (hi - lo) * 3 // 5
    path = str(tmp_path / "rt")
    SK.build_sketch_rollup(
        events.filter(F.unix_micros("ts") <= F.lit(cut)), path
    )
    got = {
        r.window_end: (r.n_users, r.n_rows)
        for r in SK.sketch_rollup_serve_realtime(
            spark, path, 60, events
        ).collect()
    }
    assert got == _exact_distinct(events, 60)


def test_sketch_realtime_tail_scan_is_pruned(spark, events, tmp_path):
    lo, hi = events.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    cut = lo + (hi - lo) * 3 // 5
    path = str(tmp_path / "rtp")
    SK.build_sketch_rollup(
        events.filter(F.unix_micros("ts") <= F.lit(cut)), path
    )
    df = SK.sketch_rollup_serve_realtime(spark, path, 60, events)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the raw events scan must carry the ts >= T0 pushed filter
    assert "PushedFilters" in plan or "GreaterThanOrEqual(ts" in plan


def test_streamed_store_kll_quantiles_within_rank_bound(
    spark, events, tmp_path
):
    """KLL quantiles served from a STREAMED sketch store (micro-batch
    foreachBatch refreshes) must satisfy the same rank-error bound as
    the batch-built store — the merge path across micro-batches is
    the one the streaming driver entry exercises."""
    import datetime

    path = str(tmp_path / "skroll_stream")
    schema = "event_id long, ts timestamp, user_id long, value double"
    SK.build_sketch_rollup(
        spark.createDataFrame([], schema), path
    )
    fn = SK.sketch_rollup_refresh_batch_fn(path)
    rows = events.select(
        "event_id", "ts", "user_id", "value"
    ).orderBy("ts").collect()
    n = len(rows)
    for i in range(3):
        batch = spark.createDataFrame(
            rows[i * n // 3 : (i + 1) * n // 3], schema
        )
        fn(batch, i)
    got = {
        r.window_end: (r.p50, r.p95, r.n_rows)
        for r in SK.kll_rollup_quantiles(spark, path, 3600).collect()
    }
    vals = {}
    for r in events.select(
        (((F.floor(F.unix_timestamp("ts") / 3600) + 1) * 3600)
         .cast("bigint")).alias("we"),
        "value",
    ).collect():
        vals.setdefault(r.we, []).append(r.value)
    assert len(got) == len(vals)
    for we, vs in vals.items():
        key = datetime.datetime.utcfromtimestamp(we).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        vs.sort()
        nn = len(vs)
        p50, p95, n_rows = got[key]
        assert n_rows == nn
        for est, q in zip((p50, p95), (0.5, 0.95)):
            lo = bisect.bisect_left(vs, est) / nn
            hi = bisect.bisect_right(vs, est) / nn
            assert lo - 0.05 <= q <= hi + 0.05, (key, q, est)


def test_kll_rollup_quantile_bound_all_true(spark, events, sketch_rollup):
    """The hash-checkable KLL envelope (r10 bound anchor): every
    (window, phi) verdict is TRUE at eps=5%, n_rows equals the exact
    per-window count, and a deliberately broken epsilon (0) flags at
    least one window — proving the verdict actually bites."""
    got = SK.kll_rollup_quantile_bound(
        spark, sketch_rollup, events, 3600
    ).collect()
    assert len(got) > 0
    assert all(r["within_bound"] for r in got)
    exact_n = {
        r["window_end"]: r["n"]
        for r in events.groupBy(
            F.date_format(
                F.timestamp_seconds(
                    ((F.floor(F.unix_timestamp("ts") / 3600) + 1) * 3600
                     ).cast("bigint")
                ),
                "yyyy-MM-dd HH:mm:ss",
            ).alias("window_end")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in got:
        assert r["n_rows"] == exact_n[r["window_end"]]
    # the verdict is falsifiable: raw data shifted away from the
    # sketched distribution must flip every window to False (the
    # served quantile has rank 0 in the shifted data)
    shifted = events.withColumn("value", F.col("value") + F.lit(1.0e12))
    bad = SK.kll_rollup_quantile_bound(
        spark, sketch_rollup, shifted, 3600
    ).collect()
    assert bad and all(not r["within_bound"] for r in bad)
