"""edit_distance_join (operators/matching.py): the PassJoin-style
segment-signature join must find EXACTLY the pairs a brute-force
Levenshtein scan finds — candidate completeness is the pigeonhole
lemma, so the tests attack it with adversarial shapes: length
differences, edits clustered in one segment, edits at both ends,
duplicates-of-distance-zero, and a randomized corpus sweep."""

import random

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators.matching import (
    edit_distance_join,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(
                    prev[j] + 1,
                    cur[-1] + 1,
                    prev[j - 1] + (ca != cb),
                )
            )
        prev = cur
    return prev[-1]


def _brute(rows, k):
    out = set()
    for i, (ia, a) in enumerate(rows):
        for ib, b in rows[i + 1:]:
            d = _lev(a, b)
            if d <= k:
                lo, hi = min(ia, ib), max(ia, ib)
                out.add((lo, hi, d))
    return out


def _run(spark, rows, k):
    df = spark.createDataFrame(rows, ["id", "txt"])
    got = {
        (r.id_lo, r.id_hi, r.ed)
        for r in edit_distance_join(df, "id", "txt", k).collect()
    }
    assert got == _brute(rows, k)


def test_hand_vectors_k1(spark):
    rows = [
        (1, "kitten"),
        (2, "sitten"),   # sub at pos 0 (first segment)
        (3, "kitte"),    # deletion at end (last segment)
        (4, "kittens"),  # insertion at end
        (5, "mitten"),
        (6, "kitten"),   # exact duplicate → distance 0
        (7, "xyzzy"),
    ]
    _run(spark, rows, 1)


def test_hand_vectors_k2(spark):
    rows = [
        (1, "abcdef"),
        (2, "azcdez"),   # two subs, one per segment
        (3, "abef"),     # two deletions in the middle
        (4, "xxabcdef"), # two insertions at the front
        (5, "abcdefxx"), # two insertions at the back
        (6, "ab"),
        (7, "ba"),
    ]
    _run(spark, rows, 2)


def test_random_corpus_matches_brute_force(spark):
    rng = random.Random(42)
    alpha = "abc"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8))))
        for i in range(80)
    ]
    for k in (1, 2):
        _run(spark, rows, k)


def test_formulaic_ids_like_tpch_names(spark):
    rows = [(i, f"Supplier#{i:09d}") for i in range(30)]
    _run(spark, rows, 1)


def test_nulls_and_empty_filtered(spark):
    rows = [(1, "abc"), (2, None), (3, ""), (4, "abd")]
    df = spark.createDataFrame(rows, "id: bigint, txt: string")
    got = {
        (r.id_lo, r.id_hi, r.ed)
        for r in edit_distance_join(df, "id", "txt", 1).collect()
    }
    assert got == {(1, 4, 1)}


def test_max_ed_zero_rejected(spark):
    df = spark.createDataFrame([(1, "a")], ["id", "txt"])
    with pytest.raises(ValueError):
        edit_distance_join(df, "id", "txt", 0)


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(
        [(i, f"w{i}") for i in range(10)], ["id", "txt"]
    )
    plan = edit_distance_join(df, "id", "txt", 1)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_max_bucket_cap_trades_recall_not_precision(spark):
    """Capped joins return a SUBSET of the exact pairs (precision
    kept); with a generous cap the result is identical."""
    rows = [(i, f"w{i:03d}x") for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "txt"])
    exact = {
        (r.id_lo, r.id_hi, r.ed)
        for r in edit_distance_join(df, "id", "txt", 1).collect()
    }
    capped = {
        (r.id_lo, r.id_hi, r.ed)
        for r in edit_distance_join(
            df, "id", "txt", 1, max_bucket=5
        ).collect()
    }
    generous = {
        (r.id_lo, r.id_hi, r.ed)
        for r in edit_distance_join(
            df, "id", "txt", 1, max_bucket=1000
        ).collect()
    }
    assert capped <= exact
    assert generous == exact
