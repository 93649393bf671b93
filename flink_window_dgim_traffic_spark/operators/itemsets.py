"""Frequent-itemset mining over document token baskets — A-Priori
(Agrawal & Srikant 1994) with a PCY hashed-pair prefilter (Park,
Chen & Yu 1995; the market-basket chapter of the same MMDS
literature the DGIM sketch comes from): level-wise candidate
generation where every k-itemset candidate must have ALL its (k-1)-
subsets frequent, so each level's join runs over the (much smaller)
frequent lattice, never the raw basket cross-product.

Scale shape: baskets reduce to DISTINCT (basket, item) pairs first
(one keyed aggregation — collapses repeated tokens) and are PINNED
once (localCheckpoint — the L2 bucket pass, the L2 count and the L3
count are four plan branches over the same rows; unpinned, each
branch re-runs the distinct + semi-join).  L1 is a keyed count +
filter; the PCY pass hashes every candidate pair to one of 2^16
buckets and counts BUCKETS (map-side combine collapses the shuffle
to ≤ 2^16 rows per task regardless of pair volume), and only pairs
whose bucket is frequent enter the L2 candidate shuffle — bucket
count ≥ pair count, so the filter is a conservative superset and
results are EXACTLY A-Priori's.  The L2 candidate join is a self
equi-join ON THE BASKET KEY restricted to L1 items (per-basket
fan-out is |L1 ∩ basket|², bounded by the frequent-item count, not
vocabulary); L3 counts come from ONE self-join of the L2-surviving
per-basket pair table on (basket, first item) — a basket contains
{a,b,c} iff its pair set has (a,b) and (a,c) — with the (b,c)
lattice prune as a broadcast semi-join; both sides share the pinned
basket partitioning so the self-join plans no new exchange.
min_support is given in ppm of the basket count so the operator is
scale-free; all arithmetic integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# PCY hash-bucket count: 2^16 buckets keeps the bucket-count shuffle
# bounded (map-side combine emits at most this many rows per task)
# while making mass-infrequent-pair buckets overwhelmingly likely to
# stay below threshold at any realistic support level.
_PCY_BUCKETS = 1 << 16


def frequent_itemsets(
    documents: DataFrame,
    min_support_ppm: int = 500_000,
    basket_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Frequent 1-, 2- and 3-itemsets of whitespace tokens per
    document basket.  Output: ``k, item1, item2, item3, support``
    (items sorted lexicographically inside each set; item2/item3
    null below size; support = basket count containing the set)."""
    items = (
        documents.select(
            F.col(basket_col).alias("b"),
            F.explode(F.split(F.col(text_col), " ")).alias("w"),
        )
        .distinct()
    )
    n_baskets = documents.select(basket_col).distinct().count()
    s = (n_baskets * min_support_ppm + 999_999) // 1_000_000
    l1 = (
        items.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .filter(F.col("support") >= s)
    )
    # pinned: consumed by the PCY bucket pass, the L2 count, and the
    # three L3 probes — one materialization instead of five re-derives.
    # The explicit basket-keyed repartition (user repartitions are
    # exempt from AQE coalescing) matters: the (b, w) table is only a
    # few MB, so AQE would coalesce it to ONE partition — and the
    # basket self-join's |L1∩basket|² fan-out would then run on one
    # task (measured 7.6 s -> 1.5 s at sf0.1).  Both join sides share
    # the pinned HashPartitioning(b), so the self-join adds no
    # exchange.
    par = documents.sparkSession.sparkContext.defaultParallelism
    items1 = (
        items.join(F.broadcast(l1.select("w")), "w", "left_semi")
        .select("b", "w")
        .repartition(par, "b")
        .localCheckpoint(eager=False)
    )
    # pinned: the basket self-join's pair fan-out feeds the PCY
    # bucket pass, the L2 count, AND the L3 self-join below — one
    # materialization.  Keeps items1's HashPartitioning(b).
    pair_gen = (
        items1.alias("a")
        .join(items1.alias("c"), "b")
        .filter(F.col("a.w") < F.col("c.w"))
        .select(
            "b",
            F.col("a.w").alias("w1"),
            F.col("c.w").alias("w2"),
        )
        .withColumn(
            "bk", F.pmod(F.xxhash64("w1", "w2"), F.lit(_PCY_BUCKETS))
        )
        .localCheckpoint(eager=False)
    )
    # PCY pass: count pair-hash BUCKETS (bounded-cardinality groupBy
    # — the shuffle carries ≤ _PCY_BUCKETS rows per task after the
    # partial aggregate, never the pair volume), keep frequent ones
    freq_buckets = (
        pair_gen.groupBy("bk")
        .agg(F.count(F.lit(1)).alias("bc"))
        .filter(F.col("bc") >= s)
        .select("bk")
    )
    # only bucket-frequent pairs enter the candidate-count shuffle;
    # support(pair) ≤ count(bucket(pair)), so no frequent pair is lost
    pair_counts = (
        pair_gen.join(F.broadcast(freq_buckets), "bk", "left_semi")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    # NOT pinned (r13 A/B): l2 is consumed three ways (output union +
    # two broadcast builds), but an eager checkpoint here LOST the
    # interleaved A/B (4.00 vs 3.70 s min-of-4) — the extra barrier
    # and checkpoint job cost more than the duplicate pair-count
    # evaluation, which overlaps inside the final job's task pool.
    l2 = pair_counts.filter(F.col("support") >= s)
    l2k = l2.select("w1", "w2")
    # L3 from the PAIR table, not three basket joins: a basket
    # contains {w1,w2,w3} iff its pair set has (w1,w2) AND (w1,w3) —
    # so one self-join of the L2-surviving per-basket pairs on
    # (b, w1) counts triples directly.  Both sides carry the pinned
    # HashPartitioning(b) (b is a subset of the join keys), so the
    # self-join plans NO new exchange; the (w2,w3)-frequent lattice
    # prune rides a broadcast semi-join.  This replaced the r7 chain
    # of three shuffle joins against items1 (the 11M-row w1 fan-out).
    bp = pair_gen.join(F.broadcast(l2k), ["w1", "w2"], "left_semi")
    triple_counts = (
        bp.alias("x")
        .join(
            bp.alias("y"),
            (F.col("x.b") == F.col("y.b"))
            & (F.col("x.w1") == F.col("y.w1"))
            & (F.col("x.w2") < F.col("y.w2")),
        )
        .select(
            F.col("x.w1").alias("w1"),
            F.col("x.w2").alias("w2"),
            F.col("y.w2").alias("w3"),
        )
        .join(
            F.broadcast(
                l2k.select(
                    F.col("w1").alias("w2"), F.col("w2").alias("w3")
                )
            ),
            ["w2", "w3"],
            "left_semi",
        )
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
    )
    l3 = triple_counts.filter(F.col("support") >= s)
    null_s = F.lit(None).cast("string")
    return (
        l1.select(
            F.lit(1).cast("bigint").alias("k"),
            F.col("w").alias("item1"),
            null_s.alias("item2"),
            null_s.alias("item3"),
            "support",
        )
        .unionByName(
            l2.select(
                F.lit(2).cast("bigint").alias("k"),
                F.col("w1").alias("item1"),
                F.col("w2").alias("item2"),
                null_s.alias("item3"),
                "support",
            )
        )
        .unionByName(
            l3.select(
                F.lit(3).cast("bigint").alias("k"),
                F.col("w1").alias("item1"),
                F.col("w2").alias("item2"),
                F.col("w3").alias("item3"),
                "support",
            )
        )
    )
