"""BPE tokenizer: hand-computed merges/encodings, determinism, and
corpus invariants (bpe count bounded by chars and words)."""

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import bpe as B
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_train_hand_computed(spark):
    # corpus: "abab" x2, "ab" x1 → pair counts: (a,b)=5, (b,a)=2
    # merge 1: (a,b) → "ab"; then pairs: (ab,ab)=2 → merge 2: (ab,ab)
    df = spark.createDataFrame(
        [(0, "abab abab ab"), (1, "abab")], ["doc_id", "text"]
    )
    merges = B.bpe_train_merges(df, n_merges=2)
    assert merges == [("a", "b"), ("ab", "ab")]


def test_train_tie_breaks_lexicographic(spark):
    # "ab" and "cd" both appear twice → counts tie at 2; ('a','b') wins
    df = spark.createDataFrame([(0, "ab cd ab cd")], ["doc_id", "text"])
    merges = B.bpe_train_merges(df, n_merges=1)
    assert merges == [("a", "b")]


def test_encode_word_applies_rank_order():
    # ranks: (a,b)=0, (ab,c)=1 → "abc" → [ab, c] → [abc]
    ranks = {("a", "b"): 0, ("ab", "c"): 1}
    assert B._encode_word("abc", ranks) == ["abc"]
    assert B._encode_word("acb", ranks) == ["a", "c", "b"]
    # concatenating tokens always reconstructs the word
    assert "".join(B._encode_word("ababc", ranks)) == "ababc"


def test_token_count_hand_computed(spark):
    df = spark.createDataFrame(
        [(0, "abab abab ab"), (1, "ba")], ["doc_id", "text"]
    )
    # merges learned: (a,b), (ab,ab) → "abab"→1 tok, "ab"→1, "ba"→2
    got = {
        r["doc_id"]: (r["n_bpe_tokens"], r["n_ws_tokens"])
        for r in B.bpe_token_count(df, n_merges=2).collect()
    }
    assert got == {0: (3, 3), 1: (2, 1)}


def test_corpus_invariants_and_determinism(documents):
    merges = B.bpe_train_merges(documents)
    assert merges == B.bpe_train_merges(documents)  # deterministic
    out = B.bpe_token_count(documents, merges=merges).collect()
    assert len(out) == documents.count()
    chars = {
        r["doc_id"]: r["n"]
        for r in documents.select(
            "doc_id",
            F.length(F.regexp_replace("text", " ", "")).alias("n"),
        ).collect()
    }
    for r in out:
        # each word encodes to between 1 and len(word) tokens
        assert r["n_ws_tokens"] <= r["n_bpe_tokens"] <= chars[r["doc_id"]]
    # merges must actually compress the common words of this corpus
    total_bpe = sum(r["n_bpe_tokens"] for r in out)
    total_chars = sum(chars.values())
    assert total_bpe < total_chars * 0.6


def test_vocab_table_shape(documents):
    v = B.bpe_vocab(documents, n_merges=16).collect()
    assert len(v) == 16
    assert [r["rank"] for r in v] == list(range(16))
    for r in v:
        assert r["merged"] == r["left"] + r["right"]
