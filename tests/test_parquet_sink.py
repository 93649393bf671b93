"""Partitioned parquet sink: round-trip fidelity and partition
pruning (a filter on the partition column must touch only that
partition's files)."""

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.sources.parquet_sink import (
    read_partitioned,
    write_partitioned,
)
from flink_window_dgim_traffic_spark.session import table


def test_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    out = str(tmp_path / "events_by_type")
    write_partitioned(ev, out, partition_cols=("event_type",), sort_cols=("ts",))

    back = read_partitioned(spark, out)
    assert back.count() == ev.count()
    # values survive the round trip (partition col is restored)
    a = ev.groupBy("event_type").count().collect()
    b = back.groupBy("event_type").count().collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    # partition pruning: the filter must land in PartitionFilters
    # (inputFiles() is pre-pruning, so inspect the physical plan)
    from flink_window_dgim_traffic_spark.plans import inspect as I

    one_type = ev.select("event_type").first()[0]
    pruned = back.filter(F.col("event_type") == one_type)
    txt = I.plan_text(pruned)
    import re

    m = re.search(r"PartitionFilters: \[(.*?)\]", txt)
    assert m and "event_type" in m.group(1), txt
    # and the pruned count matches the partition's row count
    expect = ev.filter(F.col("event_type") == one_type).count()
    assert pruned.count() == expect


def test_max_records_per_file_bounds_files(spark, sf_dir, tmp_path):
    ev = table(spark, sf_dir, "events")
    n = ev.count()
    out = str(tmp_path / "events_small_files")
    write_partitioned(
        ev.repartition(1), out, max_records_per_file=max(1, n // 4)
    )
    back = read_partitioned(spark, out)
    assert back.count() == n
    # one input partition but ~4+ files due to the per-file cap
    assert len(back.inputFiles()) >= 4
