#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` twin on DuckDB
over the same parquet, compare row count + column names + sorted
values.  Reports MATCH / MISMATCH / ROWS-ONLY / ERROR per query.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import importlib.util
import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_entry():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(REPO, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return None
    if isinstance(v, float):
        return float(v)
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    return v


def normalize(pdf: pd.DataFrame) -> list:
    cols = sorted(pdf.columns)
    rows = [
        tuple(norm_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


def dtype_class(dt) -> str:
    """Coarse dtype family used for cross-engine parity.

    The driver's value hash is dtype/representation-sensitive: a DuckDB
    HUGEINT that pandas materializes as float64 (``3417.0``) hashes
    differently from Spark's bigint (``3417``) even though the values
    compare equal here.  Classify pandas dtypes into families and fail
    any query where the two frames disagree (r03 ``embedding_outliers``
    and r05 ``max_concurrent_users`` both escaped the value compare but
    failed the driver hash for exactly this reason)."""
    s = str(dt)
    if "int" in s and "interval" not in s:
        return "int"
    if "float" in s or "double" in s:
        return "float"
    if "decimal" in s.lower():
        return "decimal"
    if "bool" in s:
        return "bool"
    if "datetime" in s or "timestamp" in s:
        return "ts"
    return "other"


def dtype_parity(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    """Return list of (col, spark_class, duck_class) disagreements.

    ``object`` columns (strings, arrays, decimals boxed by either
    engine) are compared by inspecting the first non-null value so a
    float-valued object column still trips against an integer column.
    """
    import decimal as _dec

    def klass(pdf, col):
        c = dtype_class(pdf[col].dtype)
        if c == "other":
            nn = pdf[col].dropna()
            if len(nn):
                v = nn.iloc[0]
                if hasattr(v, "item") and not hasattr(v, "__len__"):
                    v = v.item()  # numpy scalar boxed in object column
                if isinstance(v, bool):
                    return "bool"
                if isinstance(v, (int,)):
                    return "int"
                if isinstance(v, float):
                    return "float"
                if isinstance(v, _dec.Decimal):
                    return "decimal"
        return c

    bad = []
    for col in spark_pdf.columns:
        if col not in duck_pdf.columns:
            continue
        a, b = klass(spark_pdf, col), klass(duck_pdf, col)
        # int vs decimal is fine for the value compare only if both
        # engines hash identically — the driver treats Decimal(3417)
        # and 3417 as distinct reprs, so flag every family mismatch
        # except other/other (strings, arrays — value compare covers).
        if a != b:
            # empty frames on one side give 'other' with no evidence
            if len(spark_pdf) == 0 or len(duck_pdf) == 0:
                continue
            if {a, b} == {"other"}:
                continue
            bad.append((col, a, b))
    return bad


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    sc, sr = normalize(spark_pdf)
    dc, dr = normalize(duck_pdf)
    if sc != dc:
        return False, f"column names differ: spark={sc} duck={dc}"
    if len(sr) != len(dr):
        return False, f"row counts differ: spark={len(sr)} duck={len(dr)}"
    for i, (a, b) in enumerate(zip(sr, dr)):
        if a != b:
            return False, f"first row diff at sorted idx {i}:\n  spark={a}\n  duck ={b}"
    mism = dtype_parity(spark_pdf, duck_pdf)
    if mism:
        return False, (
            "values match but dtype families differ (driver hash would be "
            f"red): {mism} — add explicit CASTs to the oracle SQL"
        )
    return True, f"{len(sr)} rows"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    mod = load_entry()
    qs, oracles = mod.queries(), mod.oracle_sql()
    names = args.queries or sorted(qs)

    extra = set(oracles) - set(qs)
    if extra:
        print(f"!! oracle_sql keys without queries(): {sorted(extra)}")

    from flink_window_dgim_traffic_spark.session import get_spark

    spark = get_spark(app_name="check_oracle", master="local[8]", shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = n_bad = 0
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, args.sf).toPandas()
        except Exception as e:
            print(f"ERROR     {name}: spark failed: {type(e).__name__}: {str(e)[:400]}")
            n_bad += 1
            continue
        if name not in oracles:
            print(
                f"ROWS-ONLY {name}: {len(spark_pdf)} rows, "
                f"cols={sorted(spark_pdf.columns)} ({time.time()-t0:.1f}s)"
            )
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ERROR     {name}: duckdb failed: {type(e).__name__}: {str(e)[:400]}")
            n_bad += 1
            continue
        ok, msg = compare(spark_pdf, duck_pdf)
        if ok:
            n_ok += 1
            print(f"MATCH     {name}: {msg} ({time.time()-t0:.1f}s)")
        else:
            n_bad += 1
            print(f"MISMATCH  {name}: {msg}")
    print(f"\n{n_ok} matched, {n_bad} failed, "
          f"{len([n for n in names if n not in oracles])} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
