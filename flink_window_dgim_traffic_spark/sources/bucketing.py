"""Bucketed tables: co-located, shuffle-free fact-to-fact joins.

At 100 TB the expensive join is fact×fact (e.g. orders ⋈ lineitem on
orderkey): both sides shuffle terabytes on the key unless they are
already hash-partitioned identically on disk.  ``bucketBy(n, key)``
at write time gives every subsequent join/aggregation on that key a
shuffle-free plan (Spark aligns bucket n of one table with bucket n
of the other) — paid once at ingest, saved on every query.
tests/test_bucketing.py asserts the joined plan has ZERO shuffle
exchanges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: tuple,
    n_buckets: int = 8,
    sort_cols: tuple = (),
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) table in
    the session catalog.  ``sort_cols`` additionally sorts within
    buckets so sort-merge joins skip their sort step."""
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def bucketed_join(spark, left_table: str, right_table: str, on) -> DataFrame:
    """Join two bucketed tables; with matching bucket specs the plan
    contains no shuffle exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
