"""Z-order clustered writes: layout quality must be measurable — a
2-D box probe over a z-ordered layout prunes files that a
single-column sort cannot, and the pruning decision itself must be
sound (no file containing matching rows is ever pruned)."""

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import layout as L


@pytest.fixture(scope="module")
def grid(spark):
    # 100x100 uniform grid: x and y independent, so a 1-D sort leaves
    # the other dimension unsorted per file
    return spark.range(10_000).select(
        (F.col("id") % 100).cast("double").alias("x"),
        (F.col("id") / 100).cast("bigint").cast("double").alias("y"),
    )


@pytest.fixture(scope="module")
def layouts(spark, grid, tmp_path_factory):
    zp = str(tmp_path_factory.mktemp("lay") / "zord")
    lp = str(tmp_path_factory.mktemp("lay") / "lin")
    L.write_zordered(grid, zp, ("x", "y"), n_files=16)
    L.write_linear(grid, lp, "x", n_files=16)
    return zp, lp


# the win case: a probe on the column the linear layout is NOT
# sorted by — linear-on-x files all span the full y range (zero
# pruning), z-order files cover y boxes
PROBE = {"y": (10.0, 19.0)}


def test_zorder_prunes_more_than_linear(spark, layouts):
    zp, lp = layouts
    zs = L.layout_scan_stats(spark, zp, ("x", "y"), probe=PROBE)
    ls = L.layout_scan_stats(spark, lp, ("x", "y"), probe=PROBE)
    z_scan = zs.filter("must_scan").count()
    l_scan = ls.filter("must_scan").count()
    assert l_scan == ls.count()  # linear layout cannot prune on y
    assert z_scan < l_scan
    assert z_scan <= zs.count() // 2


def test_pruning_is_sound(spark, grid, layouts):
    # files marked prunable must contain ZERO rows matching the probe
    zp, _ = layouts
    stats = L.layout_scan_stats(
        spark, zp, ("x", "y"), probe=PROBE
    ).collect()
    expected = grid.filter(
        (F.col("y") >= 10) & (F.col("y") <= 19)
    ).count()
    got = 0
    for r in stats:
        if not r.must_scan:
            continue
        df = spark.read.parquet(f"{zp}/{r.file}")
        got += df.filter(
            (F.col("y") >= 10) & (F.col("y") <= 19)
        ).count()
    assert got == expected


def test_roundtrip_preserves_rows(spark, grid, layouts):
    zp, _ = layouts
    assert spark.read.parquet(zp).count() == grid.count()


def test_morton_interleave_locality(spark):
    # neighbors in (x, y) must be close in z; distant points far:
    # check the classic property z(0,0) < z(1,1) < z(2,2) ordering and
    # that quadrants order correctly
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (3, 3), (200, 200), (60000, 60000)],
        "a long, b long",
    ).select(L._morton2(F.col("a"), F.col("b")).alias("z"), "a")
    rows = sorted(r.z for r in df.collect())
    got = [r.z for r in df.orderBy("a").collect()]
    assert got == rows  # diagonal points are z-monotone


@pytest.fixture(scope="module")
def bucketed_layout(spark, grid, tmp_path_factory):
    bp = str(tmp_path_factory.mktemp("lay") / "zbuck")
    L.write_zordered_bucketed(grid, bp, ("x", "y"), n_files=16)
    return bp


def test_bucketed_zorder_one_file_per_bucket(spark, grid, bucketed_layout):
    """Deterministic fixed-grid layout: hive dirs zb=0..15, exactly
    one parquet file each (the explicit hash repartition puts each
    bucket in one task), and all rows survive the round trip."""
    import glob
    import os

    dirs = sorted(
        d for d in os.listdir(bucketed_layout) if d.startswith("zb=")
    )
    assert len(dirs) > 1
    for d in dirs:
        files = glob.glob(f"{bucketed_layout}/{d}/*.parquet")
        assert len(files) == 1, (d, files)
    assert spark.read.parquet(bucketed_layout).count() == grid.count()


def test_bucketed_stats_match_row_groups(spark, grid, bucketed_layout):
    """The hive footer walk must reproduce the exact per-bucket
    min/max a direct group-by over the same bucket math computes —
    the invariant the DuckDB oracle relies on."""
    stats = {
        r.file: r
        for r in L.layout_scan_stats_hive(
            spark, bucketed_layout, ("x", "y"), probe=PROBE
        ).collect()
    }
    r = grid.agg(
        F.min("x"), F.max("x"), F.min("y"), F.max("y")
    ).collect()[0]
    alo, ahi, blo, bhi = (float(v) for v in r)
    z = L._morton2(
        L._norm16(F.col("x"), alo, ahi), L._norm16(F.col("y"), blo, bhi)
    )
    direct = {
        f"zb={row.zb}": row
        for row in grid.withColumn(
            "zb", F.shiftright(z * F.lit(16), 32)
        )
        .groupBy("zb")
        .agg(
            F.min("x").alias("mnx"),
            F.max("x").alias("mxx"),
            F.min("y").alias("mny"),
            F.max("y").alias("mxy"),
        )
        .collect()
    }
    assert set(stats) == set(direct)
    for k, s in stats.items():
        d = direct[k]
        assert (s.min_x, s.max_x, s.min_y, s.max_y) == (
            d.mnx,
            d.mxx,
            d.mny,
            d.mxy,
        )
        lo, hi = PROBE["y"]
        assert s.must_scan == (not (s.max_y < lo or s.min_y > hi))


def test_bucketed_zorder_prunes_on_either_column(spark, bucketed_layout):
    zs = L.layout_scan_stats_hive(
        spark, bucketed_layout, ("x", "y"), probe=PROBE
    )
    assert 0 < zs.filter("must_scan").count() <= zs.count() // 2
