"""Streaming sequence packing — the stateful batch/stream-unified
twin of ``operators.packing.sequence_pack``.

The batch operator's only ordered computation is a per-(source,
shard) prefix sum; in streaming that prefix sum IS the state: one
BIGINT per key (cumulative token count), carried in the state store
and advanced each micro-batch.  Documents arriving in ``doc_id``
order per key (the replay contract; Kafka-partition-per-shard gives
the same at scale) receive byte-identical pack assignments to the
batch run over the same corpus — asserted in
``tests/test_stream_corpus.py``.

State per key is O(1) (one counter), total state O(sources ×
shards) forever — contrast with collecting documents: the packer
never retains a document after its batch.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from flink_window_dgim_traffic_spark.operators.packing import (
    CONTEXT_LEN,
    PACK_SHARDS,
)

STATE_SCHEMA = "cum bigint"
OUTPUT_SCHEMA = (
    "doc_id bigint, source string, shard bigint, n_tokens bigint, "
    "pack_id bigint, pack_pos bigint, spans_boundary boolean"
)


def make_pack_update_fn(context_len: int = CONTEXT_LEN):
    def update(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        cum = int(state.get[0]) if state.exists else 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if not frames:
            state.update((cum,))
            return
        batch = pd.concat(frames, ignore_index=True).sort_values(
            "doc_id", kind="mergesort"
        )
        n = batch["n_tokens"].to_numpy(dtype="int64")
        ends = cum + np.cumsum(n)
        starts = ends - n
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(dtype="int64"),
                "source": batch["source"].to_numpy(),
                "shard": np.full(len(batch), int(key[1]), dtype="int64"),
                "n_tokens": n,
                "pack_id": starts // context_len,
                "pack_pos": starts % context_len,
                "spans_boundary": (starts // context_len)
                != ((ends - 1) // context_len),
            }
        )
        state.update((int(ends[-1]),))
        yield out

    return update


def sequence_pack_stream(
    documents_stream: DataFrame,
    context_len: int = CONTEXT_LEN,
    n_shards: int = PACK_SHARDS,
) -> DataFrame:
    """Unbounded documents → per-document pack assignments (update
    mode), continuing each (source, shard) context stream across
    micro-batches via the one-counter state."""
    staged = documents_stream.select(
        "doc_id",
        "source",
        F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("bigint").alias("shard"),
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    return staged.groupBy("source", "shard").applyInPandasWithState(
        make_pack_update_fn(context_len),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
