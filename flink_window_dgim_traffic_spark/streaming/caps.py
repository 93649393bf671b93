"""Streaming per-source admission caps — the stateful twin of
``operators.corpus.source_cap``.

The batch operator's cap is a rank over the full corpus; in streaming
the rank IS the state: one BIGINT per source (admitted-so-far),
advanced each micro-batch.  A document is admitted while its source's
counter is below the cap and dropped forever after — the ingestion-
time shape of domain balancing (stop pulling from a domain once its
budget is spent) rather than the batch shape (keep the cap smallest
doc_ids).

State per key is O(1); total state O(sources), regardless of stream
length.  Admission is first-arrival at micro-batch granularity
(within a batch, doc_id order — the replay contract; at scale,
Kafka-partition-per-source gives per-source arrival order).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = "admitted bigint"
OUTPUT_SCHEMA = "doc_id bigint, source string, src_rank bigint"


def make_cap_update_fn(cap: int):
    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        admitted = int(state.get[0]) if state.exists else 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((admitted,))
            return
        batch = pd.concat(frames, ignore_index=True).sort_values(
            "doc_id", kind="mergesort"
        )
        room = max(0, cap - admitted)
        take = batch.head(room)
        if len(take):
            out = pd.DataFrame(
                {
                    "doc_id": take["doc_id"].to_numpy(dtype="int64"),
                    "source": take["source"].to_numpy(),
                    "src_rank": admitted
                    + pd.RangeIndex(1, len(take) + 1).to_numpy(),
                }
            )
            yield out
        state.update((admitted + len(take),))

    return update


def source_cap_stream(
    documents_stream: DataFrame, cap: int = 15
) -> DataFrame:
    """Unbounded documents → admitted (doc_id, source, src_rank) rows
    (append-shaped update mode: each admitted doc emits exactly once,
    rejected docs never emit)."""
    staged = documents_stream.select("doc_id", "source")
    return staged.groupBy("source").applyInPandasWithState(
        make_cap_update_fn(cap),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
