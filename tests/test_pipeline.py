"""training_corpus end-to-end pipeline: exact dedup -> near-dup
representative keep -> quality gate, on a hand-built corpus where the
fate of every doc is known."""

from flink_window_dgim_traffic_spark.operators import pipeline as PL

WORDS = [f"w{i:02d}" for i in range(30)]  # 30 distinct non-stopwords
BASE = " ".join(WORDS)
NEAR = " ".join(WORDS[:-1] + ["zz"])  # last word changed: jaccard 25/31


def test_training_corpus_stage_fates(spark):
    docs = spark.createDataFrame(
        [
            (1, BASE),            # kept: exact-dup rep AND near-dup rep
            (2, BASE),            # dropped at stage 1 (exact dup of 1)
            (3, NEAR),            # dropped at stage 2 (near-dup of 1)
            (4, "the a of to and in is for"),  # dropped at stage 3
            (5, " ".join(f"x{i}" for i in range(40))),  # kept: unique
        ],
        ["doc_id", "text"],
    )
    rows = {r["doc_id"]: r for r in PL.training_corpus(docs).collect()}
    assert set(rows) == {1, 5}
    assert rows[1]["n_tokens"] == 30
    # 30/50*0.5 + (1 - 0/30)*0.5 = 0.8
    assert rows[1]["quality_score"] == 0.8
    assert rows[5]["n_tokens"] == 40


def test_training_corpus_no_dups_passthrough(spark):
    """A corpus with no duplicates and all-good quality passes through
    unchanged."""
    docs = spark.createDataFrame(
        [(i, " ".join(f"d{i}w{j}" for j in range(25))) for i in range(6)],
        ["doc_id", "text"],
    )
    assert sorted(
        r["doc_id"] for r in PL.training_corpus(docs).collect()
    ) == list(range(6))


def test_corpus_build_stage_invariants(spark, sf_dir):
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.operators import corpus as C
    from flink_window_dgim_traffic_spark.operators.pipeline import (
        corpus_build,
    )
    from flink_window_dgim_traffic_spark.session import table

    docs = table(spark, sf_dir, "documents")
    out = corpus_build(docs).collect()
    assert out, "corpus_build produced an empty training stream"
    out_ids = {r["doc_id"] for r in out}
    # no benchmark docs, only train-split survivors of the mix
    bench_ids = {
        r["doc_id"]
        for r in docs.filter(F.col("source") == "src0").collect()
    }
    assert not (out_ids & bench_ids)
    train_ids = {
        r["doc_id"]
        for r in C.corpus_mix(docs).filter(F.col("split") == "train").collect()
    }
    assert out_ids <= train_ids
    # no contaminated docs above the default threshold
    dirty = {
        r["doc_id"]
        for r in C.contamination_check(docs)
        .filter(F.col("contamination_ratio") > 0.2)
        .collect()
    }
    assert not (out_ids & dirty)
    # pack positions tile each (source, shard) token stream
    seen = {}
    for r in sorted(out, key=lambda r: (r["source"], r["shard"], r["doc_id"])):
        key = (r["source"], r["shard"])
        start = r["pack_id"] * 2048 + r["pack_pos"]
        assert start == seen.get(key, 0)
        seen[key] = start + r["n_tokens"]
    # loosening the contamination gate can only keep more docs
    looser = {
        r["doc_id"]
        for r in corpus_build(docs, max_contamination=1.0).collect()
    }
    assert out_ids <= looser


def test_curation_funnel_monotone(spark, sf_dir):
    from flink_window_dgim_traffic_spark.operators.pipeline import curation_funnel
    from flink_window_dgim_traffic_spark.session import table

    rows = sorted(
        curation_funnel(table(spark, sf_dir, "documents")).collect(),
        key=lambda r: r["stage"],
    )
    names = [r["stage_name"] for r in rows]
    assert names == [
        "raw", "drop_benchmark", "exact_dedup", "decontaminated",
        "gopher_pass",
    ]
    counts = [r["n_docs"] for r in rows]
    assert counts == sorted(counts, reverse=True)  # each gate only drops
    assert counts[0] > 0
