"""frequent_itemsets (operators/itemsets.py): A-Priori semantics
pinned on constructed baskets where the level-wise pruning matters —
a pair can be frequent while a superset triple is not, and a triple
whose (b,c) subset is infrequent must be pruned BEFORE counting."""

from flink_window_dgim_traffic_spark.operators.itemsets import (
    frequent_itemsets,
)


def _run(spark, baskets, ppm):
    docs = spark.createDataFrame(
        [(i, " ".join(b)) for i, b in enumerate(baskets)],
        "doc_id: bigint, text: string",
    )
    out = frequent_itemsets(docs, ppm)
    return {
        (r.k, r.item1, r.item2, r.item3): r.support
        for r in out.collect()
    }


def test_simple_lattice(spark):
    baskets = [
        ["a", "b", "c"],
        ["a", "b", "c"],
        ["a", "b"],
        ["a", "c"],
        ["d"],
    ]
    # support >= 2 (40% of 5 baskets)
    got = _run(spark, baskets, 400_000)
    assert got[(1, "a", None, None)] == 4
    assert got[(1, "b", None, None)] == 3
    assert got[(1, "c", None, None)] == 3
    assert (1, "d", None, None) not in got  # support 1 < 2
    assert got[(2, "a", "b", None)] == 3
    assert got[(2, "a", "c", None)] == 3
    assert got[(2, "b", "c", None)] == 2
    assert got[(3, "a", "b", "c")] == 2


def test_triple_pruned_when_subset_infrequent(spark):
    # (a,b) and (a,c) frequent but (b,c) never co-occurs: the triple
    # candidate must be pruned (and indeed has zero support)
    baskets = [["a", "b"], ["a", "b"], ["a", "c"], ["a", "c"]]
    got = _run(spark, baskets, 500_000)
    assert got[(2, "a", "b", None)] == 2
    assert got[(2, "a", "c", None)] == 2
    assert not any(k == 3 for (k, *_rest) in got)


def test_duplicate_tokens_count_once_per_basket(spark):
    baskets = [["a", "a", "a", "b"], ["a", "b"]]
    got = _run(spark, baskets, 1_000_000)
    assert got[(1, "a", None, None)] == 2
    assert got[(2, "a", "b", None)] == 2


def test_support_threshold_is_ceiling(spark):
    # 3 baskets at 500000 ppm -> s = ceil(1.5) = 2
    baskets = [["a"], ["a"], ["b"]]
    got = _run(spark, baskets, 500_000)
    assert (1, "a", None, None) in got
    assert (1, "b", None, None) not in got
