"""Bucketed co-located joins: identical results to the plain join,
with ZERO shuffle exchanges in the physical plan."""

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.plans import inspect as I
from flink_window_dgim_traffic_spark.session import table
from flink_window_dgim_traffic_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders")
    lineitem = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(
        orders, "orders_b", ("o_orderkey",), 8,
        sort_cols=("o_orderkey",), path=str(tmp_path / "orders_b"),
    )
    write_bucketed(
        lineitem, "lineitem_b", ("l_orderkey",), 8,
        sort_cols=("l_orderkey",), path=str(tmp_path / "lineitem_b"),
    )
    try:
        joined = bucketed_join(
            spark, "orders_b", "lineitem_b",
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        # co-located: no shuffle exchange anywhere in the join plan
        assert I.exchange_count(joined) == 0, I.plan_text(joined)
        # same result as the plain (shuffled) join
        plain = orders.join(
            lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        )
        assert joined.count() == plain.count()
        a = joined.agg(F.sum("l_quantity")).first()[0]
        b = plain.agg(F.sum("l_quantity")).first()[0]
        assert a == b
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_aggregation_no_shuffle(spark, sf_dir, tmp_path):
    """groupBy on the bucket key also needs no shuffle."""
    lineitem = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(
        lineitem, "lineitem_b2", ("l_orderkey",), 8,
        path=str(tmp_path / "lineitem_b2"),
    )
    try:
        agg = (
            spark.table("lineitem_b2")
            .groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        assert I.exchange_count(agg) == 0, I.plan_text(agg)
        assert agg.count() == lineitem.select("l_orderkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS lineitem_b2")


def test_bucketed_dedup_index_shuffles_only_the_batch_side(
    spark, sf_dir, tmp_path
):
    """The curation pipeline's 100 TB posture, demonstrated: with the
    dedup index stored BUCKETED on fp, the batch-vs-index anti join
    re-shuffles only the (small) batch side — the index is read
    bucket-aligned with zero exchange above its scan."""
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.plans import inspect as I
    from flink_window_dgim_traffic_spark.session import table
    from flink_window_dgim_traffic_spark.sources.bucketing import (
        write_bucketed,
    )

    docs = table(spark, sf_dir, "documents")
    index = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.md5("text").alias("fp")
    ).distinct()
    write_bucketed(
        index,
        "dedup_index_bucketed",
        ("fp",),
        n_buckets=8,
        path=str(tmp_path / "idx"),
    )
    batch = docs.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", F.md5("text").alias("fp")
    )
    # align the probe side to the index's bucket count, then anti join
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        fresh = batch.repartition(8, "fp").join(
            spark.table("dedup_index_bucketed"), "fp", "left_anti"
        )
        plan = fresh._jdf.queryExecution().executedPlan().toString()
        # exactly ONE exchange (the batch side); the bucketed index
        # side must join with no exchange of its own
        assert I.exchange_count(fresh) == 1, plan
        # correctness: equals the plain anti join
        plain = batch.join(index, "fp", "left_anti")
        assert sorted(r["doc_id"] for r in fresh.collect()) == sorted(
            r["doc_id"] for r in plain.collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.sql("DROP TABLE IF EXISTS dedup_index_bucketed")
