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
