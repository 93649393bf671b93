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
vocabulary); L3 candidates come from joining L2 WITH ITSELF on the
shared prefix plus the (b,c)-subset membership check — a
lattice-sized join that never touches baskets — and only the
surviving candidates are counted against baskets.  min_support is
given in ppm of the basket count so the operator is scale-free; all
arithmetic integer.
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
    # three L3 probes — one materialization instead of five re-derives
    items1 = (
        items.join(F.broadcast(l1.select("w")), "w", "left_semi")
        .select("b", "w")
        .localCheckpoint(eager=False)
    )
    pair_gen = (
        items1.alias("a")
        .join(items1.alias("c"), "b")
        .filter(F.col("a.w") < F.col("c.w"))
        .select(
            F.col("a.w").alias("w1"),
            F.col("c.w").alias("w2"),
        )
        .withColumn(
            "bk", F.pmod(F.xxhash64("w1", "w2"), F.lit(_PCY_BUCKETS))
        )
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
    l2 = pair_counts.filter(F.col("support") >= s)
    # candidate triples: (a,b) ⋈ (a,c) with b<c, AND (b,c) frequent
    l2k = l2.select("w1", "w2")
    cand3 = (
        l2k.alias("p")
        .join(
            l2k.alias("q"),
            (F.col("p.w1") == F.col("q.w1"))
            & (F.col("p.w2") < F.col("q.w2")),
        )
        .select(
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
            F.col("q.w2").alias("w3"),
        )
        .join(
            l2k.select(
                F.col("w1").alias("w2"), F.col("w2").alias("w3")
            ),
            ["w2", "w3"],
            "left_semi",
        )
    )
    triple_counts = (
        items1.select("b", F.col("w").alias("w1"))
        .join(F.broadcast(cand3), "w1")
        .join(
            items1.select(F.col("b").alias("b"),
                          F.col("w").alias("w2")),
            ["b", "w2"],
        )
        .join(
            items1.select(F.col("b").alias("b"),
                          F.col("w").alias("w3")),
            ["b", "w3"],
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
