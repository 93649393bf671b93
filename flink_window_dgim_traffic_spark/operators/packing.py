"""Sequence packing for LLM training-data prep (north-star surface,
no reference counterpart): assign every document a position in a
stream of fixed-length training contexts.

Semantics: GPT-style concat-then-chunk.  Within each pack shard,
documents are concatenated in ``doc_id`` order and the token stream is
cut into consecutive contexts of ``context_len`` tokens; a document's
``pack_id`` is the context its FIRST token lands in and ``pack_pos``
the offset inside that context.  (The greedy fit-else-new-pack variant
needs a running reset — inherently sequential state; the chunk
formulation is what large pipelines actually run, is one window
aggregate, and is exactly expressible in ANSI SQL for the oracle.)

Scale: the only ordered computation is a prefix sum, and it runs
PER (source, shard) — the shard count bounds partition width, so the
window never degenerates to a single global sort (the classic
``Window.orderBy`` scale trap).  At 100 TB, pick
``n_shards ≈ corpus_tokens / (context_len · packs_per_task)`` so each
shard's token stream fits a task; shards are independent, so the job
is embarrassingly parallel up to the shard count.  Tokens are
whitespace tokens (the ``text_stats`` contract); swap in a real
tokenizer count column upstream without touching the packing logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

CONTEXT_LEN = 2048
PACK_SHARDS = 4


def sequence_pack(
    documents: DataFrame,
    context_len: int = CONTEXT_LEN,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Per-document pack assignment: (doc_id, source, shard, n_tokens,
    pack_id, pack_pos, spans_boundary).

    ``pack_id``/``pack_pos`` locate the doc's first token in the
    shard's context stream; ``spans_boundary`` marks docs whose token
    span crosses a context edge (the downstream attention-masking /
    document-splitting cases).  Deterministic: shard is ``doc_id mod
    n_shards``, order is ``doc_id`` — no timestamps, no randomness.
    """
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("bigint")
    shard = F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("bigint")
    w = (
        W.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = F.col("cum") - F.col("n_tokens")  # tokens before this doc
    return (
        documents.select(
            "doc_id",
            "source",
            shard.alias("shard"),
            n_tokens.alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "source",
            "shard",
            "n_tokens",
            F.floor(start / context_len).alias("pack_id"),
            F.pmod(start, F.lit(context_len)).cast("bigint").alias("pack_pos"),
            (
                F.floor(start / context_len)
                != F.floor((F.col("cum") - 1) / context_len)
            ).alias("spans_boundary"),
        )
    )


def pack_stats(
    documents: DataFrame,
    context_len: int = CONTEXT_LEN,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Shard-level packing summary: contexts used, docs packed, token
    fill ratio of the shard's context stream (waste = tail padding of
    the last context only, by construction of concat-then-chunk)."""
    per_doc = sequence_pack(documents, context_len, n_shards)
    return (
        per_doc.groupBy("source", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (F.floor((F.sum("n_tokens") - 1) / context_len) + 1).alias(
                "n_contexts"
            ),
            F.sum(F.col("spans_boundary").cast("bigint")).alias(
                "n_spanning_docs"
            ),
            F.round(
                F.sum("n_tokens")
                / ((F.floor((F.sum("n_tokens") - 1) / context_len) + 1) * context_len),
                6,
            ).alias("fill_ratio"),
        )
    )
