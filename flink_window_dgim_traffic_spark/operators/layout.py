"""Data-layout optimization: Z-order (Morton) clustered writes and
file-skipping measurement.

Why this is a first-class 100 TB lever: parquet scans prune on
row-group/file min-max statistics, but a layout sorted on ONE column
only helps predicates on that column.  Interleaving the bits of two
(or more) normalized sort keys gives every file a small bounding BOX
in key space, so selective predicates on ANY of the keys skip most
files — the technique Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``,
built here from primitives: normalize each key to a 16-bit rank,
interleave bits JVM-side, range-partition + sort on the Morton value,
write.  ``layout_scan_stats`` then reads the parquet footers and
reports, per file, each key's min-max span and whether a probe box
would have to read the file — the measurable pruning win is asserted
in tests/test_layout.py (z-ordered layout reads a fraction of the
files a single-column sort reads for 2-D box probes).

At cluster scale the footer walk is the table format's metadata scan;
here it runs on the driver via pyarrow against local files (the
sandbox has no object store), which is also what makes it testable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BITS = 16


def _morton2(a, b):
    """Interleave the low 16 bits of two integer columns (a in even
    positions) — a static 32-op JVM expression, no UDF."""
    z = F.lit(0).cast("bigint")
    for i in range(BITS):
        z = (
            z
            .bitwiseOR(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def _norm16(col, lo, hi):
    """Scale a numeric column to the 0..65535 rank grid."""
    span = F.when(F.lit(hi) > F.lit(lo), F.lit(hi) - F.lit(lo)).otherwise(
        F.lit(1)
    )
    return F.least(
        F.lit((1 << BITS) - 1),
        F.floor(
            (col.cast("double") - F.lit(lo))
            / span.cast("double")
            * (1 << BITS)
        ).cast("bigint"),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 16,
) -> None:
    """Write ``df`` as parquet clustered on the Morton interleave of
    two numeric columns: each output file covers a compact box in
    (cols[0], cols[1]) space, so min-max pruning works for predicates
    on EITHER column.  One pass for the two global min/max scalars,
    one range-shuffle on the z-value, local sort, write."""
    a, b = (F.col(c) for c in cols)
    r = df.agg(
        F.min(a), F.max(a), F.min(b.cast("double")), F.max(b.cast("double"))
    ).collect()[0]
    alo, ahi, blo, bhi = (float(x) for x in r)
    z = _morton2(
        _norm16(a, alo, ahi), _norm16(b.cast("double"), blo, bhi)
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered_bucketed(
    df: DataFrame,
    path: str,
    cols: tuple[str, str],
    n_files: int = 16,
) -> None:
    """Z-order clustered write with DETERMINISTIC fixed-grid file
    boundaries: file ``k`` holds exactly the rows whose Morton value
    falls in ``[k·2³²/n, (k+1)·2³²/n)`` — pure integer math on the
    interleave, no sampled range bounds.  This trades
    :func:`write_zordered`'s skew-adaptive quantile cuts (equal ROWS
    per file) for reproducibility (equal KEY-SPACE per file), which
    is what makes the resulting per-file min-max footprint an
    oracle-checkable function of the data: an independent engine can
    recompute every file's bounding box from the same bit math
    (VERDICT r8 ask #3).  Layout quality is the same box-per-file
    property; uniform keys give near-equal files, heavily skewed keys
    should prefer the sampled variant.

    Files land as hive dirs ``zb=k/`` (one parquet file per bucket:
    the explicit hash repartition on ``zb`` puts each bucket in
    exactly one task before ``partitionBy`` splits dirs)."""
    a, b = (F.col(c) for c in cols)
    r = df.agg(
        F.min(a), F.max(a), F.min(b.cast("double")), F.max(b.cast("double"))
    ).collect()[0]
    alo, ahi, blo, bhi = (float(x) for x in r)
    z = _morton2(
        _norm16(a, alo, ahi), _norm16(b.cast("double"), blo, bhi)
    )
    # bucket = floor(z * n / 2^32): exact bigint math (z < 2^32)
    zb = F.shiftright(z * F.lit(int(n_files)), 32)
    (
        df.withColumn("zb", zb)
        .withColumn("_z", z)
        .repartition(n_files, "zb")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.partitionBy("zb")
        .mode("overwrite")
        .parquet(path)
    )


def write_linear(
    df: DataFrame, path: str, col: str, n_files: int = 16
) -> None:
    """Baseline layout: globally range-sorted on a single column (the
    best possible layout for that column, the worst for any other)."""
    (
        df.repartitionByRange(n_files, col)
        .sortWithinPartitions(col)
        .write.mode("overwrite")
        .parquet(path)
    )


def layout_scan_stats(
    spark,
    path: str,
    cols: tuple[str, str],
    probe: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Per-file min-max footprint of ``cols`` from the parquet footers
    plus, when ``probe`` gives {col: (lo, hi)} box bounds, whether a
    min-max-pruning reader must scan the file.  This is the pruning
    arithmetic a lakehouse metadata layer runs; surfacing it as a
    DataFrame makes layout quality measurable and testable."""
    import datetime

    import pyarrow.parquet as pq

    def _to_f(x):
        if x is None:
            return None
        if isinstance(x, datetime.datetime):
            return x.timestamp()
        return float(x)

    ca, cb = cols
    rows = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        schema_names = md.schema.to_arrow_schema().names
        ia, ib = schema_names.index(ca), schema_names.index(cb)
        mins, maxs = {}, {}
        for col, idx in ((ca, ia), (cb, ib)):
            los, his = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    los, his = [], []
                    break
                los.append(st.min)
                his.append(st.max)
            mins[col] = min(los) if los else None
            maxs[col] = max(his) if his else None
        must_scan = None
        if probe is not None:
            must_scan = True
            for col in probe:
                lo, hi = probe[col]
                if mins[col] is None:
                    continue  # no stats -> cannot prune on this col
                fl, fh = _to_f(mins[col]), _to_f(maxs[col])
                if fh < lo or fl > hi:
                    must_scan = False
                    break
        rows.append(
            (
                name,
                _to_f(mins[ca]),
                _to_f(maxs[ca]),
                _to_f(mins[cb]),
                _to_f(maxs[cb]),
                must_scan,
            )
        )
    return spark.createDataFrame(
        rows,
        f"file string, min_{ca} double, max_{ca} double,"
        f" min_{cb} double, max_{cb} double, must_scan boolean",
    )


def layout_scan_stats_hive(
    spark,
    path: str,
    cols: tuple[str, str],
    probe: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """:func:`layout_scan_stats` for the hive-partitioned layout that
    :func:`write_zordered_bucketed` produces: one row per ``zb=k``
    bucket dir (its parquet footers merged), labelled by the BUCKET
    (``zb=k``) instead of the non-deterministic part-file name — the
    canonical identity an oracle can reproduce, since bucket
    membership is pure integer math on the data."""
    import datetime

    import pyarrow.parquet as pq

    def _to_f(x):
        if x is None:
            return None
        if isinstance(x, datetime.datetime):
            return x.timestamp()
        return float(x)

    ca, cb = cols
    rows = []
    for dname in sorted(os.listdir(path)):
        if not dname.startswith("zb="):
            continue
        mins: dict = {ca: None, cb: None}
        maxs: dict = {ca: None, cb: None}
        dpath = os.path.join(path, dname)
        for name in sorted(os.listdir(dpath)):
            if not name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(dpath, name)).metadata
            schema_names = md.schema.to_arrow_schema().names
            for col in (ca, cb):
                idx = schema_names.index(col)
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo, hi = _to_f(st.min), _to_f(st.max)
                    if mins[col] is None or lo < mins[col]:
                        mins[col] = lo
                    if maxs[col] is None or hi > maxs[col]:
                        maxs[col] = hi
        must_scan = None
        if probe is not None:
            must_scan = True
            for col in probe:
                lo, hi = probe[col]
                if mins[col] is None:
                    continue
                if maxs[col] < lo or mins[col] > hi:
                    must_scan = False
                    break
        rows.append(
            (dname, mins[ca], maxs[ca], mins[cb], maxs[cb], must_scan)
        )
    return spark.createDataFrame(
        rows,
        f"file string, min_{ca} double, max_{ca} double,"
        f" min_{cb} double, max_{cb} double, must_scan boolean",
    )
