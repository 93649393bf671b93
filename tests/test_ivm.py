"""Incremental join view maintenance (operators/ivm.py): multi-batch
refresh == one-shot join, asymmetric/empty deltas, same-batch
(delta-delta) matches counted exactly once, replay idempotence, and
crash invisibility of staged-but-uncommitted deltas."""

import os

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import ivm


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_ivm_multi_batch_equals_direct_join(spark, tmp_path):
    p = str(tmp_path / "jv")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    l0 = _mk(spark, [(1, "a"), (2, "b")], L)
    r0 = _mk(spark, [(1, "x")], R)
    assert ivm.build_join_view(l0, r0, p, ["k"])
    # batch 1: both sides, incl. a same-batch match on k=3
    l1 = _mk(spark, [(3, "c")], L)
    r1 = _mk(spark, [(2, "y"), (3, "z")], R)
    assert ivm.refresh_join_view(spark, p, l1, r1, tag="b1")
    # batch 2: left only (matches old right rows)
    l2 = _mk(spark, [(1, "d")], L)
    assert ivm.refresh_join_view(spark, p, delta_left=l2, tag="b2")
    # batch 3: right only (matches rows from every older left batch)
    r3 = _mk(spark, [(1, "w"), (3, "v")], R)
    assert ivm.refresh_join_view(spark, p, delta_right=r3, tag="b3")

    all_l = l0.unionByName(l1).unionByName(l2)
    all_r = r0.unionByName(r1).unionByName(r3)
    want = _rows(all_l.join(all_r, "k"))
    got = _rows(ivm.read_join_view(spark, p))
    assert got == want and len(got) > 0


def test_ivm_replay_skip_and_empty_refresh(spark, tmp_path):
    p = str(tmp_path / "jv")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    ivm.build_join_view(
        _mk(spark, [(1, "a")], L), _mk(spark, [(1, "x")], R), p, ["k"]
    )
    l1 = _mk(spark, [(2, "b")], L)
    assert ivm.refresh_join_view(spark, p, delta_left=l1, tag="b1")
    before = _rows(ivm.read_join_view(spark, p))
    # replaying the same tag is a no-op returning False
    assert not ivm.refresh_join_view(spark, p, delta_left=l1, tag="b1")
    assert _rows(ivm.read_join_view(spark, p)) == before
    # a refresh with no deltas commits an empty marker harmlessly
    assert ivm.refresh_join_view(spark, p, tag="b2")
    assert _rows(ivm.read_join_view(spark, p)) == before


def test_ivm_staged_without_marker_is_invisible(spark, tmp_path):
    p = str(tmp_path / "jv")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    ivm.build_join_view(
        _mk(spark, [(1, "a")], L), _mk(spark, [(1, "x")], R), p, ["k"]
    )
    before = _rows(ivm.read_join_view(spark, p))
    # simulate a crash: stage view/left delta dirs with NO marker
    _mk(spark, [(9, "ghost")], L).write.parquet(
        f"{p}/left/delta-crash"
    )
    _mk(spark, [(9, "ghost")], "k bigint, lv string").write.parquet(
        f"{p}/view/delta-crash"
    )
    assert _rows(ivm.read_join_view(spark, p)) == before
    # the replay with the same tag overwrites the orphans and commits
    assert ivm.refresh_join_view(
        spark, p, delta_left=_mk(spark, [(1, "b")], L), tag="crash"
    )
    got = _rows(ivm.read_join_view(spark, p))
    assert (1, "b", "x") in {(r[0], r[1], r[2]) for r in got}
    assert not any("ghost" in str(r) for r in got)


def test_ivm_rejects_overlapping_columns(spark, tmp_path):
    import pytest

    p = str(tmp_path / "jv")
    df = _mk(spark, [(1, "a")], "k bigint, v string")
    with pytest.raises(ValueError):
        ivm.build_join_view(df, df, p, ["k"])


def test_ivm_streaming_batch_fn_equals_direct_join(spark, tmp_path):
    """foreachBatch maintenance == one-shot join, and replaying a
    committed batch id is a no-op (exactly-once under crash-replay)."""
    from flink_window_dgim_traffic_spark.operators.ivm import (
        build_join_view,
        ivm_refresh_batch_fn,
        read_join_view,
    )

    p = str(tmp_path / "jv")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    left = _mk(spark, [(1, "a"), (2, "b"), (3, "c")], L)
    build_join_view(left, _mk(spark, [], R), p, ["k"])
    fn = ivm_refresh_batch_fn(p, side="right")
    b0 = _mk(spark, [(1, "x"), (3, "y")], R)
    b1 = _mk(spark, [(2, "z"), (3, "w")], R)
    fn(b0, 0)
    fn(b1, 1)
    # crash-replay of batch 1 must not double anything
    fn(b1, 1)
    want = _rows(left.join(b0.unionByName(b1), "k"))
    assert _rows(read_join_view(spark, p)) == want


def test_ivm_zset_deletes_and_duplicates(spark, tmp_path):
    """Z-set mode: deletes (mult -1) remove their join rows, a
    re-insert restores them, duplicate rows (mult 2) count twice,
    and the compacted view equals the one-shot join of the compacted
    sides at every step."""
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.operators.ivm import (
        build_join_view_zset,
        read_join_view,
        refresh_join_view_zset,
    )

    p = str(tmp_path / "jvz")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    l0 = _mk(spark, [(1, "a"), (2, "b")], L)
    r0 = _mk(spark, [(1, "x"), (2, "y"), (1, "x2")], R)
    assert build_join_view_zset(l0, r0, p, ["k"])
    assert _rows(read_join_view(spark, p)) == _rows(l0.join(r0, "k"))

    # delete left k=1 -> both its join rows vanish
    d1 = l0.filter("k = 1").withColumn("_mult", F.lit(-1))
    assert refresh_join_view_zset(spark, p, delta_left=d1, tag="del1")
    assert _rows(read_join_view(spark, p)) == _rows(
        l0.filter("k = 2").join(r0, "k")
    )

    # re-insert it -> rows come back
    d2 = l0.filter("k = 1")
    assert refresh_join_view_zset(spark, p, delta_left=d2, tag="ins1")
    assert _rows(read_join_view(spark, p)) == _rows(l0.join(r0, "k"))

    # duplicate right row with mult 2 -> its join rows count twice
    d3 = _mk(spark, [(2, "z")], R).withColumn("_mult", F.lit(2))
    assert refresh_join_view_zset(spark, p, delta_right=d3, tag="dup")
    got = _rows(read_join_view(spark, p))
    assert got.count((2, "b", "z")) == 2

    # delete one copy -> exactly one remains
    d4 = _mk(spark, [(2, "z")], R).withColumn("_mult", F.lit(-1))
    assert refresh_join_view_zset(spark, p, delta_right=d4, tag="undup")
    got = _rows(read_join_view(spark, p))
    assert got.count((2, "b", "z")) == 1

    # replay idempotence holds for zset refreshes too
    assert not refresh_join_view_zset(
        spark, p, delta_right=d4, tag="undup"
    )
    assert _rows(read_join_view(spark, p)) == got


def test_ivm_compaction_preserves_view_and_future_refreshes(
    spark, tmp_path
):
    """read_join_view before == after compact_join_view; a refresh
    AFTER compaction (whose L⋈ΔR term probes the compacted state)
    still equals the one-shot join; absorbed tags stay replay-
    skipped; absorbed delta dirs are physically gone."""
    p = str(tmp_path / "jv")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    l0 = _mk(spark, [(1, "a"), (2, "b")], L)
    r0 = _mk(spark, [(1, "x")], R)
    ivm.build_join_view(l0, r0, p, ["k"])
    l1 = _mk(spark, [(3, "c")], L)
    r1 = _mk(spark, [(2, "y"), (3, "z")], R)
    ivm.refresh_join_view(spark, p, l1, r1, tag="b1")
    l2 = _mk(spark, [(1, "d")], L)
    ivm.refresh_join_view(spark, p, delta_left=l2, tag="b2")
    before = _rows(ivm.read_join_view(spark, p))
    assert ivm.compact_join_view(spark, p)
    assert _rows(ivm.read_join_view(spark, p)) == before
    # fan-in is now ONE visible tag
    assert len(ivm._visible_tags(p)) == 1
    # absorbed dirs removed, replay skip still honors absorbed tags
    assert not os.path.isdir(f"{p}/view/delta-b1")
    assert not ivm.refresh_join_view(spark, p, delta_left=l1, tag="b1")
    # post-compaction refresh probes the compacted state correctly
    r3 = _mk(spark, [(1, "w"), (3, "v")], R)
    assert ivm.refresh_join_view(spark, p, delta_right=r3, tag="b3")
    all_l = l0.unionByName(l1).unionByName(l2)
    all_r = r0.unionByName(r1).unionByName(r3)
    assert _rows(ivm.read_join_view(spark, p)) == _rows(
        all_l.join(all_r, "k")
    )
    # below min_tags the compactor is a no-op... after compacting b3
    assert ivm.compact_join_view(spark, p)
    assert not ivm.compact_join_view(spark, p)


def test_ivm_zset_compaction_and_crash_midway(spark, tmp_path):
    """Z-set compaction mult-sums (retracted rows physically vanish,
    net-negative rows survive); a compaction that crashes BEFORE the
    marker leaves the view untouched and a rerun converges; plain
    refresh_join_view on a zset view raises."""
    import pytest

    p = str(tmp_path / "jvz")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    l0 = _mk(spark, [(1, "a"), (2, "b")], L)
    r0 = _mk(spark, [(1, "x"), (2, "y")], R)
    ivm.build_join_view_zset(l0, r0, p, ["k"])
    # retract (2,b) entirely, and pre-retract a future right row
    l_neg = _mk(spark, [(2, "b")], L).withColumn(
        "_mult", F.lit(-1).cast("bigint")
    )
    ivm.refresh_join_view_zset(spark, p, delta_left=l_neg, tag="b1")
    with pytest.raises(ValueError, match="Z-set"):
        ivm.refresh_join_view(spark, p, delta_left=l0, tag="nope")
    before = _rows(ivm.read_join_view(spark, p))
    assert before == [(1, "a", "x")]

    # crash mid-compaction: marker write raises after dirs staged
    real = ivm._write_marker

    def boom(*a, **k):
        raise RuntimeError("crash before marker")

    ivm._write_marker = boom
    try:
        with pytest.raises(RuntimeError):
            ivm.compact_join_view(spark, p)
    finally:
        ivm._write_marker = real
    # staged compact dirs are invisible
    assert _rows(ivm.read_join_view(spark, p)) == before
    # rerun converges; the zset left state physically dropped (2,b)
    assert ivm.compact_join_view(spark, p)
    assert _rows(ivm.read_join_view(spark, p)) == before
    tags = ivm._visible_tags(p)
    assert len(tags) == 1
    left_state = spark.read.parquet(f"{p}/left/delta-{tags[0]}")
    assert _rows(left_state.select("k", "lv")) == [(1, "a")]


def test_ivm_auto_compaction_and_run_id_namespace(spark, tmp_path):
    """compact_after keeps visible fan-in bounded across many
    refreshes; run_id-namespaced batch fns from two lineages don't
    collide on batch ids."""
    p = str(tmp_path / "jva")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    ivm.build_join_view(
        _mk(spark, [(1, "a")], L), _mk(spark, [(1, "x")], R), p, ["k"]
    )
    for i in range(6):
        ivm.refresh_join_view(
            spark, p,
            delta_left=_mk(spark, [(1, f"v{i}")], L),
            tag=f"t{i}", compact_after=3,
        )
    assert len(ivm._visible_tags(p)) <= 4
    got = _rows(ivm.read_join_view(spark, p))
    assert len(got) == 7  # (1,a,x) + six refreshed rows

    # two streams with distinct run_ids both deliver their batch 0
    p2 = str(tmp_path / "jvb")
    ivm.build_join_view(
        _mk(spark, [(1, "a")], L), _mk(spark, [(1, "x")], R), p2, ["k"]
    )
    fn_a = ivm.ivm_refresh_batch_fn(p2, "left", run_id="runA")
    fn_b = ivm.ivm_refresh_batch_fn(p2, "left", run_id="runB")
    fn_a(_mk(spark, [(1, "fromA")], L), 0)
    fn_b(_mk(spark, [(1, "fromB")], L), 0)
    vals = {r[1] for r in _rows(ivm.read_join_view(spark, p2))}
    assert {"fromA", "fromB"} <= vals


def test_ivm_batch_fn_compact_after(spark, tmp_path):
    """The streaming batch fn forwards compact_after: many batches
    keep visible fan-in bounded without the caller ever calling the
    compactor."""
    p = str(tmp_path / "jvc")
    L = "k bigint, lv string"
    R = "k bigint, rv string"
    ivm.build_join_view(
        _mk(spark, [(1, "a")], L), _mk(spark, [(1, "x")], R), p, ["k"]
    )
    fn = ivm.ivm_refresh_batch_fn(p, "left", compact_after=3)
    for i in range(8):
        fn(_mk(spark, [(1, f"v{i}")], L), i)
    assert len(ivm._visible_tags(p)) <= 4
    got = _rows(ivm.read_join_view(spark, p))
    assert len(got) == 9
