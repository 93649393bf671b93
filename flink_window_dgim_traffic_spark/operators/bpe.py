"""Byte-pair-encoding tokenizer: train on a bounded sample, encode the
corpus distributed (north-star surface — the real-tokenizer upgrade of
``text.token_count_regex``'s BPE-ish regex proxy).

Scale shape (the one production tokenizer pipelines actually use):

- **Train** on a BOUNDED, deterministic sample (``doc_id``-ordered
  ``limit``) collected to the driver — same discipline as the IVF
  codebook (similarity.py): tokenizers are trained on a fixed-size
  sample regardless of corpus size, so the driver memory is O(sample),
  never O(corpus).  Training runs on the word-frequency dict (classic
  BPE), so its cost is O(vocab · distinct_words), independent of how
  many times each word occurs.
- **Encode** is map-only: the learned merge table (a few KB) is
  closure-broadcast into an Arrow-batched Pandas UDF; a per-batch
  word→tokens memo collapses the per-row cost to the distinct words in
  the batch.  No shuffle anywhere.

Determinism: the sample is doc_id-ordered, and merge ties (equal pair
count) break lexicographically on the pair — byte-identical vocab and
encodings on every run, every cluster layout.

Simplifications vs production BPE (documented, not hidden): no
end-of-word marker and no byte-level fallback alphabet — words are
space-split and merges operate on characters, which is sufficient for
the token-count / packing use cases downstream (`packing.py` consumes
a token count column, not token ids).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOCAB_MERGES = 64
TRAIN_SAMPLE_ROWS = 512


def bpe_train_merges(
    documents: DataFrame,
    n_merges: int = VOCAB_MERGES,
    sample_rows: int = TRAIN_SAMPLE_ROWS,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a bounded deterministic
    sample.  Returns the ranked merge list (rank = list position)."""
    sample = [
        r["text"]
        for r in documents.select("doc_id", "text")
        .orderBy("doc_id")
        .limit(sample_rows)
        .collect()
    ]
    word_freq: dict[tuple[str, ...], int] = {}
    for text in sample:
        for w in text.split(" "):
            if w:
                key = tuple(w)
                word_freq[key] = word_freq.get(key, 0) + 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, freq in word_freq.items():
            for a, b in zip(word, word[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + freq
        if not pair_counts:
            break
        # max count, ties broken lexicographically → deterministic
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        merges.append(best)
        merged = best[0] + best[1]
        new_freq: dict[tuple[str, ...], int] = {}
        for word, freq in word_freq.items():
            out: list[str] = []
            i = 0
            while i < len(word):
                if (
                    i + 1 < len(word)
                    and word[i] == best[0]
                    and word[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            new_freq[tuple(out)] = new_freq.get(tuple(out), 0) + freq
        word_freq = new_freq
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word in rank order (standard BPE apply)."""
    toks = list(word)
    while len(toks) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(toks, toks[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def bpe_token_count(
    documents: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    n_merges: int = VOCAB_MERGES,
    sample_rows: int = TRAIN_SAMPLE_ROWS,
) -> DataFrame:
    """Per-doc BPE token count: (doc_id, n_bpe_tokens, n_ws_tokens).

    Trains on the bounded sample unless ``merges`` is passed (pass the
    output of ``bpe_train_merges`` to reuse one vocab across many
    encode jobs, the production pattern).  Encode is a map-only
    ``mapInPandas`` with a per-batch word memo.
    """
    if merges is None:
        merges = bpe_train_merges(documents, n_merges, sample_rows)
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}
        for pdf in batches:
            n_bpe, n_ws = [], []
            for text in pdf["text"]:
                words = [w for w in (text or "").split(" ") if w]
                total = 0
                for w in words:
                    c = memo.get(w)
                    if c is None:
                        c = len(_encode_word(w, ranks))
                        memo[w] = c
                    total += c
                n_bpe.append(total)
                n_ws.append(len(words))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bpe_tokens": pd.Series(n_bpe, dtype="int64"),
                    "n_ws_tokens": pd.Series(n_ws, dtype="int64"),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        encode_batches,
        "doc_id bigint, n_bpe_tokens bigint, n_ws_tokens bigint",
    )


def bpe_vocab(
    documents: DataFrame,
    n_merges: int = VOCAB_MERGES,
    sample_rows: int = TRAIN_SAMPLE_ROWS,
) -> DataFrame:
    """The learned merge table as rows: (rank, left, right, merged) —
    the artifact a pipeline persists next to the corpus."""
    spark = documents.sparkSession
    merges = bpe_train_merges(documents, n_merges, sample_rows)
    return spark.createDataFrame(
        [(i, a, b, a + b) for i, (a, b) in enumerate(merges)],
        "rank bigint, left string, right string, merged string",
    )


def bpe_roundtrip_bound(
    documents: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    n_merges: int = VOCAB_MERGES,
    sample_rows: int = TRAIN_SAMPLE_ROWS,
) -> DataFrame:
    """Bound anchor for the BPE family (r11, VERDICT r10 ask #1
    pattern): the vocab/token counts depend on the training sample
    order (rows-only by design), but the ENCODE PATH's invariants are
    SQL-expressible verdicts per doc:

    - ``roundtrip_ok`` — concatenating each word's BPE tokens
      reproduces the word exactly (merges never drop or reorder
      characters), for every word of the doc;
    - ``token_bounds_ok`` — ``n_ws_tokens ≤ n_bpe_tokens ≤
      n_chars_nonspace`` (each word encodes to between 1 token and
      len(word) single-char tokens).

    Emitted next to the exact ``n_ws_tokens`` / ``n_chars_nonspace``
    (both recomputable in DuckDB), so a broken merge-apply, memo or
    tokenizer regression breaks the hash."""
    if merges is None:
        merges = bpe_train_merges(documents, n_merges, sample_rows)
    ranks = {pair: i for i, pair in enumerate(merges)}

    def check_batches(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            n_ws_l, n_nsp_l, rt_l, tb_l = [], [], [], []
            for text in pdf["text"]:
                words = [w for w in (text or "").split(" ") if w]
                n_bpe = 0
                ok = True
                for w in words:
                    toks = memo.get(w)
                    if toks is None:
                        toks = _encode_word(w, ranks)
                        memo[w] = toks
                    n_bpe += len(toks)
                    if "".join(toks) != w:
                        ok = False
                n_nsp = sum(len(w) for w in words)
                n_ws_l.append(len(words))
                n_nsp_l.append(n_nsp)
                rt_l.append(ok)
                tb_l.append(len(words) <= n_bpe <= n_nsp)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_ws_tokens": pd.Series(n_ws_l, dtype="int64"),
                    "n_chars_nonspace": pd.Series(n_nsp_l, dtype="int64"),
                    "roundtrip_ok": pd.Series(rt_l, dtype="bool"),
                    "token_bounds_ok": pd.Series(tb_l, dtype="bool"),
                }
            )

    return documents.select("doc_id", "text").mapInPandas(
        check_batches,
        "doc_id bigint, n_ws_tokens bigint, n_chars_nonspace bigint, "
        "roundtrip_ok boolean, token_bounds_ok boolean",
    )
