"""Runtime Bloom-filter semi-join reduction — the 100 TB posture of
selective shuffle joins, pinned.

Spark 4 ships Catalyst's `InjectRuntimeFilter` enabled by default
(`spark.sql.optimizer.runtime.bloomFilter.enabled=true`): when a
shuffle join's small side carries a selective predicate and the big
side scan exceeds `applicationSideScanSizeThreshold` (default 10 GB —
i.e. exactly the 100 TB case, a no-op at test scale), the big side is
pre-filtered by a `bloom_filter_agg` of the small side's join keys
BEFORE its shuffle, cutting shuffle volume to ~the join's selectivity.

These tests force the thresholds down so the injection is observable
at test scale, then pin two things a refactor could silently lose:

1. joins our operators emit remain injection-ELIGIBLE — the join key
   must reference the scan attribute directly.  An alias/aggregate
   between scan and join (e.g. `.select(col.alias(...)).distinct()`)
   defeats the pattern match and loses the filter;
2. results with the filter active equal the plain join (the Bloom
   pass can only false-positive, never drop a matching row).
"""

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.session import table

BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
    "spark.sql.optimizer.runtime.bloomFilter."
    "applicationSideScanSizeThreshold": "0",
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@pytest.fixture()
def bloom_spark(spark):
    old = {}
    for k, v in BLOOM_CONFS.items():
        old[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_selective_dim_join_gets_bloom_filter(bloom_spark, sf_dir):
    ev = table(bloom_spark, sf_dir, "events")
    urgent = table(bloom_spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = ev.join(urgent, ev.user_id == urgent.o_custkey).select(
        "event_id", "o_orderkey"
    )
    plan = _optimized(joined)
    assert "bloom_filter_agg" in plan and "might_contain" in plan
    # correctness: identical to the same join with injection off
    with_filter = sorted(map(tuple, joined.collect()))
    bloom_spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
    )
    try:
        plain = ev.join(urgent, ev.user_id == urgent.o_custkey).select(
            "event_id", "o_orderkey"
        )
        assert "bloom_filter_agg" not in _optimized(plain)
        assert sorted(map(tuple, plain.collect())) == with_filter
    finally:
        bloom_spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true"
        )


def test_alias_between_scan_and_join_defeats_injection(bloom_spark, sf_dir):
    """Documents the eligibility boundary: routing the creation side
    through select(alias)+distinct breaks InjectRuntimeFilter's
    pattern match, so no filter is injected — operators that want the
    reduction must join on the scan column and project afterwards."""
    ev = table(bloom_spark, sf_dir, "events")
    dim = (
        table(bloom_spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("user_id"))
        .distinct()
    )
    joined = ev.join(dim, "user_id")
    assert "bloom_filter_agg" not in _optimized(joined)
