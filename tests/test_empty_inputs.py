"""Empty-input robustness: every operator family must return an empty
(or correctly-degenerate) result on empty tables, not raise.  At scale
empty partitions and empty filtered subsets are routine."""

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import dedup as D
from flink_window_dgim_traffic_spark.operators import multimodal as M
from flink_window_dgim_traffic_spark.operators import relational as R
from flink_window_dgim_traffic_spark.operators import similarity as S
from flink_window_dgim_traffic_spark.operators import text as T
from flink_window_dgim_traffic_spark.operators import windows as W
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def empty(spark, sf_dir):
    def load(name):
        return table(spark, sf_dir, name).filter(F.lit(False))

    return load


def test_windows_empty(empty):
    ev = empty("events")
    assert W.tumble_exact(ev).count() == 0
    assert W.hop_exact(ev).count() == 0
    assert W.tumble_dgim(ev).count() == 0
    assert W.tumble_dgim_fast(ev).count() == 0
    assert W.hop_dgim_fast(ev).count() == 0
    assert W.tumble_dgim_two_phase(ev).count() == 0
    assert W.hop_dgim_two_phase(ev).count() == 0


def test_relational_empty(empty):
    ev = empty("events")
    assert R.sessionize(ev).count() == 0
    assert R.user_moving_spend(ev).count() == 0
    assert R.event_type_counts_salted(ev).count() == 0
    # global aggregates produce one degenerate row
    assert R.q6_revenue_change(empty("lineitem")).count() == 1
    # cube/rollup of empty input: only the grand-total grouping set
    assert R.event_type_cube(ev).count() <= 1


def test_dedup_empty(empty):
    docs = empty("documents")
    assert D.dedup_exact(docs).count() == 0
    assert D.shingles(docs).count() == 0
    assert D.ngram_jaccard_pairs(docs).count() == 0
    assert D.minhash_lsh_pairs(docs).count() == 0
    assert D.simhash_pairs(docs).count() == 0


def test_text_multimodal_empty(empty):
    docs = empty("documents")
    assert T.text_stats(docs).count() == 0
    assert T.lang_id(docs).count() == 0
    assert M.multimodal_features(docs).count() == 0
    assert M.frame_sample(M.with_media_blob(docs)).count() == 0
    assert M.resize_media(M.with_media_blob(docs)).count() == 0


def test_similarity_empty(empty):
    emb = empty("embeddings")
    assert S.simsearch_topk(emb).count() == 0
    assert S.simsearch_ann_lsh(emb).count() == 0
    assert S.simsearch_ann_ivf(emb).count() == 0
    assert S.embedding_neardup(emb).count() == 0
    assert S.embedding_neardup_blocked(emb).count() == 0
    assert S.embedding_neardup_lsh(emb).count() == 0


def test_ivf_tiny_corpus(spark, sf_dir):
    """Fewer vectors than centroids must degrade gracefully."""
    emb = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    rows = S.simsearch_ann_ivf(emb, n_query=3, k=10).collect()
    # 3 queries x up to 4 neighbors each, all present
    assert {r["query_id"] for r in rows} == {0, 1, 2}


def test_neardup_clusters_empty(spark):
    pairs = spark.createDataFrame([], "doc_a bigint, doc_b bigint")
    assert D.neardup_clusters(pairs).count() == 0


def test_corpus_prep_empty(empty):
    from flink_window_dgim_traffic_spark.operators import bpe as B
    from flink_window_dgim_traffic_spark.operators import corpus as C
    from flink_window_dgim_traffic_spark.operators import packing as PK
    from flink_window_dgim_traffic_spark.operators import retrieval as RT

    docs = empty("documents")
    assert C.corpus_mix(docs).count() == 0
    assert C.contamination_check(docs).count() == 0
    assert PK.sequence_pack(docs).count() == 0
    assert PK.pack_stats(docs).count() == 0
    # bm25 of an empty corpus: no docs to rank
    assert RT.bm25_topk(docs).count() == 0
    # bpe training on an empty sample learns nothing; encode yields 0
    assert B.bpe_train_merges(docs) == []
    assert B.bpe_token_count(docs, merges=[]).count() == 0
    assert B.bpe_vocab(docs, n_merges=0).count() == 0


def test_quality_and_chunk_empty(empty):
    from flink_window_dgim_traffic_spark.operators import quality as QL
    from flink_window_dgim_traffic_spark.operators.pipeline import (
        curation_funnel,
    )

    docs = empty("documents")
    assert QL.gopher_quality(docs).count() == 0
    assert QL.repetition_stats(docs).count() == 0
    assert QL.unigram_commonness(docs).count() == 0
    assert QL.pii_redact(docs).count() == 0
    assert D.chunk_dedup(docs).count() == 0
    # funnel on empty input: all five stages report zero
    rows = curation_funnel(docs).collect()
    assert len(rows) == 5 and all(r["n_docs"] == 0 for r in rows)


def test_ivfpq_empty_and_tiny(spark, sf_dir, empty):
    emb_schema = empty("embeddings")
    assert S.simsearch_ann_ivfpq(emb_schema).count() == 0
    tiny = table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 5)
    rows = S.simsearch_ann_ivfpq(tiny, n_query=3, k=10).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}


def test_round3_ops_empty(empty):
    docs = empty("documents")
    ev = empty("events")
    from flink_window_dgim_traffic_spark.operators import corpus as C

    assert C.source_cap(docs, cap=5).count() == 0
    assert D.dedup_incremental(docs, docs).count() == 0
    assert T.quality_quantile_gate(docs).count() == 0
    assert W.cumulate_exact(ev).count() == 0


def test_dedup_incremental_empty_batch_nonempty_index(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    nothing = docs.filter(F.lit(False))
    assert D.dedup_incremental(nothing, docs).count() == 0


def test_cdc_chunk_dedup_null_text_matches_oracle(spark):
    """NULL text rows (dirty crawls): the chunker UDF emits [] ->
    n_chunks 0, zero dup counts — and the DuckDB oracle coalesces to
    the SAME contract (round-3 advisor: the oracle used to propagate
    NULL through string_split/len)."""
    import importlib.util
    import os

    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d e f g h i j", None, "a b c d e f g h i j"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [19, 0, 19],
        }
    )
    spec = importlib.util.spec_from_file_location(
        "entry",
        os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py"),
    )
    entry = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(entry)
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = (
        con.execute(entry.oracle_sql()["cdc_chunk_dedup"])
        .fetchdf()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = (
        D.cdc_chunk_dedup(spark.createDataFrame(pdf))
        .orderBy("doc_id")
        .toPandas()
    )
    assert got[["doc_id", "n_chunks", "n_dup_chunks", "dup_permille"]].equals(
        oracle[["doc_id", "n_chunks", "n_dup_chunks", "dup_permille"]]
    )
    assert int(got.loc[got.doc_id == 2, "n_chunks"].iloc[0]) == 0


def test_round5_ops_empty(empty):
    from flink_window_dgim_traffic_spark.operators import corpus as C5
    from flink_window_dgim_traffic_spark.operators import retrieval as RT

    docs = empty("documents")
    ev = empty("events")
    assert D.span_dedup(docs).count() == 0
    assert C5.leakage_safe_split(docs).count() == 0
    assert C5.stratified_sample(docs).count() == 0
    assert R.scd2_build(ev, ["user_id"], ["event_type"]).count() == 0
    assert W.gap_fill_tumble(ev).count() == 0
    assert W.m4_downsample(ev).count() == 0
    assert RT.rrf_fuse(
        [docs.select("doc_id", F.lit(1).alias("rnk"))]
    ).count() == 0
    # hybrid retrieval on an empty corpus: both rankings are empty
    assert RT.hybrid_retrieval_rrf(docs).count() == 0


def test_scd2_lookup_empty_sides(spark, empty):
    """Empty facts -> empty output; empty dimension -> all-NULL
    lookups (left semantics preserved)."""
    ev = empty("events")
    versions = R.scd2_build(ev, ["user_id"], ["event_type"])
    import datetime

    facts = spark.createDataFrame(
        [(1, datetime.datetime(2024, 1, 1), 7)],
        "fact_id long, ts timestamp, user_id long",
    )
    out = R.scd2_lookup(
        facts, versions, ["user_id"], "ts", ["event_type"]
    ).collect()
    assert len(out) == 1 and out[0]["asof_event_type"] is None
    assert (
        R.scd2_lookup(
            facts.filter(F.lit(False)), versions, ["user_id"], "ts",
            ["event_type"],
        ).count()
        == 0
    )


def test_span_dedup_null_and_empty_text(spark):
    """NULL text reports zero tokens; empty-string docs don't crash
    and a lone empty doc passes through."""
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a b c d e")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed_tokens"], r["dedup_text"])
        for r in D.span_dedup(docs, k=5).collect()
    }
    assert got[1] == (0, 0, "")
    assert got[2] == (1, 0, "")
    assert got[3] == (5, 0, "a b c d e")


def test_round6_ops_empty(empty, spark):
    from flink_window_dgim_traffic_spark.operators import (
        analytics as AN,
    )
    from flink_window_dgim_traffic_spark.operators import corpus as C
    from flink_window_dgim_traffic_spark.operators import graph as G

    ev = empty("events")
    docs = empty("documents")
    assert AN.winsorized_stats(ev).count() == 0
    assert AN.daily_movers(ev).count() == 0
    assert C.shuffle_shards(docs).count() == 0
    assert T.bigram_surprisal(docs).count() == 0
    log = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.lit("U").alias("op"),
        "value",
    )
    assert R.cdc_apply(log, ["user_id"], ["us", "event_id"]).count() == 0
    e = spark.createDataFrame([], "src bigint, dst bigint")
    assert G.kcore_fixed(e, k=2, rounds=2).count() == 0
    assert G.kcore(e, k=2).count() == 0
    assert G.ppr_fixed(e, [0]).count() == 0
    # nearest as-of with an empty right side: all matches NULL
    left = spark.createDataFrame([(1, 10)], "k bigint, ts bigint")
    right = spark.createDataFrame([], "k bigint, ts bigint, rid bigint")
    out = R.asof_join(
        left, right, on="ts", by=["k"],
        right_cols=["rid"], direction="nearest",
    ).collect()
    assert len(out) == 1 and out[0].asof_rid is None


def test_round7_ops_empty(empty):
    from flink_window_dgim_traffic_spark.operators import (
        analytics as AN,
    )

    ev = empty("events")
    assert AN.rfm_segments(ev).count() == 0
    assert AN.global_quantiles(ev).count() == 0
    assert AN.ts_pattern_topk(ev).count() == 0
    assert W.window_dedup(ev, 600).count() == 0
    assert W.window_join(ev, ev, 600).count() == 0
    assert W.window_join(ev, ev, 600, how="left_anti").count() == 0
    assert R.join_hotspots(ev, ev, ["user_id"], 5).count() == 0


def test_round9_ops_empty(empty, spark):
    ev, docs = empty("events"), empty("documents")
    assert W.hop_dgim_bound(ev).count() == 0
    assert W.cumulate_dgim_bound(ev).count() == 0
    assert M.media_audio_stats(docs).count() == 0
    assert M.media_audio_resample_stats(docs).count() == 0
    from flink_window_dgim_traffic_spark.operators.graph import (
        connected_components_star,
    )

    e = spark.createDataFrame([], "src bigint, dst bigint")
    assert connected_components_star(e).count() == 0


def test_r10_md5_family_empty(empty):
    docs = empty("documents")
    assert D.minhash_lsh_pairs(docs, hash_family="md5").count() == 0
    assert D.simhash_pairs(docs, hash_family="md5").count() == 0
    assert D.simhash_fingerprints_md5(docs).count() == 0
    assert M.media_neardup(docs, hash_family="md5").count() == 0


def test_r10_png_empty(empty):
    docs = empty("documents")
    assert M.media_png_stats(docs).count() == 0
    assert M.media_png_ahash_pairs(docs).count() == 0


def test_r10_int_plane_lsh_empty(empty):
    emb = empty("embeddings")
    # n_planes pinned: auto-sizing would count() the empty frame (fine
    # too, but the entry's pinned shape is what ships)
    assert (
        S.embedding_neardup_lsh(
            emb, int_planes=True, n_planes=8
        ).count()
        == 0
    )
    assert S.simsearch_ann_lsh(emb, int_planes=True).count() == 0
    assert (
        S.semantic_dedup(
            emb, use_lsh=True, int_planes=True, n_planes=8
        ).count()
        == 0
    )


def test_r10_bound_anchors_empty(empty, spark, tmp_path):
    from flink_window_dgim_traffic_spark.operators import quality as QL
    from flink_window_dgim_traffic_spark.operators import sketches as SK

    assert QL.compression_ratio_bound(empty("documents")).count() == 0
    # sketch store built from empty events serves no windows
    path = str(tmp_path / "kllb")
    SK.build_sketch_rollup(empty("events"), path)
    assert (
        SK.kll_rollup_quantile_bound(
            spark, path, empty("events"), 3600
        ).count()
        == 0
    )
