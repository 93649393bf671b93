"""Sequence packing (concat-then-chunk): hand-computed assignments,
invariants on the driver corpus, shard independence."""

import pytest

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import packing as PK
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_sequence_pack_hand_computed(spark):
    # one source, one shard (n_shards=1): doc token counts 3, 4, 5
    # with context_len=6 → token stream cut at 6, 12:
    #   doc 0: tokens [0,3) → pack 0 pos 0, no boundary
    #   doc 1: tokens [3,7) → pack 0 pos 3, crosses into pack 1
    #   doc 2: tokens [7,12) → pack 1 pos 1, ends exactly at 12 (no cross)
    df = spark.createDataFrame(
        [(0, "a b c", "s"), (1, "a b c d", "s"), (2, "a b c d e", "s")],
        ["doc_id", "text", "source"],
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"], r["spans_boundary"])
        for r in PK.sequence_pack(df, context_len=6, n_shards=1).collect()
    }
    assert got == {0: (0, 0, False), 1: (0, 3, True), 2: (1, 1, False)}


def test_sequence_pack_invariants(documents):
    out = PK.sequence_pack(documents).collect()
    assert len(out) == documents.count()
    for r in out:
        assert 0 <= r["pack_pos"] < PK.CONTEXT_LEN
        assert r["pack_id"] >= 0
        assert r["shard"] == r["doc_id"] % PK.PACK_SHARDS
        # a doc spans iff its span doesn't fit the remaining context
        crosses = r["pack_pos"] + r["n_tokens"] > PK.CONTEXT_LEN
        assert r["spans_boundary"] == crosses


def test_sequence_pack_shard_streams_are_prefix_sums(documents):
    # within each (source, shard), positions must tile the token
    # stream: sorting by doc_id, each doc starts where the previous
    # one ended
    rows = (
        PK.sequence_pack(documents, context_len=1 << 40)
        .orderBy("source", "shard", "doc_id")
        .collect()
    )
    seen = {}
    for r in rows:
        key = (r["source"], r["shard"])
        start = r["pack_id"] * (1 << 40) + r["pack_pos"]
        assert start == seen.get(key, 0)
        seen[key] = start + r["n_tokens"]


def test_pack_stats_consistency(documents):
    per_doc = PK.sequence_pack(documents)
    stats = {
        (r["source"], r["shard"]): r for r in PK.pack_stats(documents).collect()
    }
    agg = {
        (r["source"], r["shard"]): r
        for r in per_doc.groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.max(F.col("pack_id")).alias("max_pack"),
        )
        .collect()
    }
    assert stats.keys() == agg.keys()
    for k, s in stats.items():
        assert s["n_docs"] == agg[k]["n_docs"]
        assert s["total_tokens"] == agg[k]["total_tokens"]
        # contexts used ≥ the last pack anyone starts in
        assert s["n_contexts"] >= agg[k]["max_pack"] + 1
        assert 0 < s["fill_ratio"] <= 1.0
