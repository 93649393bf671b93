"""Batch parquet sink with scale-sane defaults.

The reference's only sinks are Kafka topics (SURVEY.md §2.1 S4-S6);
a batch engine additionally needs a partitioned columnar sink whose
layout supports partition pruning and bounded file sizes at 100 TB:

- ``partitionBy`` columns become directory partitions, so filters on
  them prune whole directories at read (verified in tests via
  ``inputFiles()``);
- ``maxRecordsPerFile`` caps file size from skewed partitions (one
  hot partition would otherwise produce a multi-GB file that a single
  task must later read);
- writer-side sort within partitions keeps row groups clustered for
  min/max skipping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple = (),
    sort_cols: tuple = (),
    max_records_per_file: int = 1_000_000,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a partitioned parquet dataset."""
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    w = df.write.mode(mode).option("maxRecordsPerFile", max_records_per_file)
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def read_partitioned(spark, path: str) -> DataFrame:
    """Read the dataset back (partition columns recovered from the
    directory layout)."""
    return spark.read.parquet(path)
