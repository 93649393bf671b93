"""Spark 4 Python DataSource registration of the S7 generator:
spark.read.format("traffic") batch parity, partition parallelism, and
streaming offset continuation across availableNow restarts."""

import tempfile

import pytest

from flink_window_dgim_traffic_spark.sources import traffic_datasource as TD
from flink_window_dgim_traffic_spark.sources.traffic import traffic_bits_df


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    TD.register(spark)


def test_batch_single_partition_parity(spark):
    df = spark.read.format("traffic").option("duration_sec", 30).load()
    got = [tuple(r) for r in df.collect()]
    expect = [tuple(r) for r in traffic_bits_df(spark, 30).collect()]
    assert got == expect  # byte-identical to the generator


def test_batch_partitioned_scan_deterministic(spark):
    def load():
        return (
            spark.read.format("traffic")
            .option("duration_sec", 40)
            .option("numPartitions", 4)
            .load()
        )

    assert load().rdd.getNumPartitions() == 4
    clean = lambda df: sorted(  # noqa: E731
        (r["value"] or "", r["timestamp"] or "") for r in df.collect()
    )
    a, b = clean(load()), clean(load())
    assert a == b and len(a) > 1500  # ~50 rows/s x 40 s


def test_stream_offsets_continue_across_restarts(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run():
        s = (
            spark.readStream.format("traffic")
            .option("duration_sec", 60)
            .option("step_sec", 20)
            .load()
        )
        q = (
            s.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    counts = [run() for _ in range(4)]
    # each run extends the event-time frontier by one step until the
    # 60 s duration is exhausted, then the source is drained
    assert counts[0] < counts[1] < counts[2]
    assert counts[3] == counts[2]
    # ~50 rows per event-time second over the full 60 s
    assert 2500 < counts[2] < 3500
