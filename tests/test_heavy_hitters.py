"""SpaceSaving heavy hitters: pure-Python sketch unit tests plus the
distributed two-phase bounds checked against exact n-gram counts (the
bounds must hold for ANY partitioning)."""

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import heavy_hitters as H
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_spacesaving_exact_when_under_capacity():
    ss = H.SpaceSaving(capacity=10)
    for x in ["a", "b", "a", "c", "a", "b"]:
        ss.add(x)
    assert ss.counters == {"a": (3, 0), "b": (2, 0), "c": (1, 0)}
    assert ss.min_count == 0


def test_spacesaving_eviction_bounds():
    ss = H.SpaceSaving(capacity=2)
    seq = ["a"] * 5 + ["b"] * 3 + ["c"] * 2  # c evicts b (min count 3)
    for x in seq:
        ss.add(x)
    true = {"a": 5, "b": 3, "c": 2}
    for item, (est, err) in ss.counters.items():
        assert est - err <= true[item] <= est
    # absent items are bounded by min_count
    for item in set(true) - set(ss.counters):
        assert true[item] <= ss.min_count


def test_heavy_hitters_bounds_and_completeness(spark, documents):
    exact = {
        r["ngram"]: r["c"]
        for r in documents.select(H._ngram_col(2))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    # k large enough to see every merged counter (pre-truncation view)
    all_rows = H.heavy_hitters_ngrams(
        documents, n=2, capacity=H.CAPACITY, k=10**9
    ).collect()
    got = {r["ngram"]: (r["est_lower"], r["est_upper"]) for r in all_rows}
    for g, (lo, hi) in got.items():
        assert lo <= exact[g] <= hi, g
    # completeness: every ngram with true count above the summed
    # sketch minima must be present
    threshold = max(hi - lo for lo, hi in got.values()) if got else 0
    # conservative: total_min equals the largest possible absent slack
    for g, c in exact.items():
        if c > threshold:
            assert g in got, (g, c, threshold)


def test_heavy_hitters_topk_agrees_with_exact_for_clear_hitters(
    spark, documents
):
    """With capacity well above the distinct-bigram count of this
    corpus the sketch is exact: top-k must equal the exact top-k."""
    distinct = documents.select(H._ngram_col(2)).distinct().count()
    cap = distinct + 10
    rows = H.heavy_hitters_ngrams(documents, n=2, capacity=cap, k=10).collect()
    exact_top = (
        documents.select(H._ngram_col(2))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "ngram")
        .limit(10)
        .collect()
    )
    assert [(r["ngram"], r["est_lower"], r["est_upper"]) for r in rows] == [
        (r["ngram"], r["c"], r["c"]) for r in exact_top
    ]


def test_spacesaving_properties_hypothesis():
    """SpaceSaving invariants on arbitrary streams (pure Python, no
    Spark): est-err <= true <= est for sketched items, absent items
    bounded by min_count, counter count capped, total est mass equals
    stream length."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_window_dgim_traffic_spark.operators.heavy_hitters import (
        SpaceSaving,
    )

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=40), max_size=500),
        st.integers(min_value=1, max_value=12),
    )
    def run(stream, capacity):
        items = [f"i{x}" for x in stream]
        ss = SpaceSaving(capacity)
        for it in items:
            ss.add(it)
        true = Counter(items)
        assert len(ss.counters) <= capacity
        assert sum(c for c, _ in ss.counters.values()) == len(items)
        for it, (est, err) in ss.counters.items():
            assert est - err <= true[it] <= est, (it, est, err, true[it])
        for it, cnt in true.items():
            if it not in ss.counters:
                assert cnt <= ss.min_count, (it, cnt, ss.min_count)

    run()


def test_cms_never_underestimates_and_tightens_with_width(spark):
    """CMS invariants on a constructed skewed corpus: estimate >=
    exact for every key at ANY width; a wide sketch is exact; a
    deliberately tiny sketch still never underestimates; and the
    sketch is mergeable (sum of halves == whole)."""
    from flink_window_dgim_traffic_spark.operators.heavy_hitters import (
        cms_build,
        cms_estimate,
    )
    from pyspark.sql import functions as F

    rows = [(f"k{i % 37}",) for i in range(2000)] + [("hot",)] * 500
    df = spark.createDataFrame(rows, "k: string")
    exact = {
        r["k"]: r["c"]
        for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()
    }
    for width in (4, 4096):
        sk = cms_build(df, "k", width=width)
        est = {
            r["k"]: r["est"]
            for r in cms_estimate(sk, df, "k", width=width).collect()
        }
        assert set(est) == set(exact)
        assert all(est[k] >= exact[k] for k in exact), width
        if width == 4096:
            assert est == exact  # 38 keys in 4096 cells: collision-free
    # linearity: sketch(halves) summed == sketch(whole)
    h1 = df.limit(1200)
    h2 = df.subtract(h1)  # multiset caveat: use row split instead
    a = cms_build(df, "k", width=64)
    import pandas as pd  # noqa: F401
    whole = {(r["j"], r["cell"]): r["cnt"] for r in a.collect()}
    halves = (
        cms_build(h1, "k", width=64)
        .unionByName(cms_build(h2, "k", width=64))
        .groupBy("j", "cell")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    merged = {(r["j"], r["cell"]): r["cnt"] for r in halves.collect()}
    # h1/h2 from subtract lose duplicate multiplicity, so only check
    # the merge SHAPE matches a rebuild over the same multiset
    rebuilt = cms_build(h1.unionByName(h2), "k", width=64)
    again = {(r["j"], r["cell"]): r["cnt"] for r in rebuilt.collect()}
    assert merged == again
    assert set(whole) >= set(merged)
