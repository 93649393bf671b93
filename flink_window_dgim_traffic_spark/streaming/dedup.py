"""Streaming deduplication with bounded state.

The training-corpus pipeline's exact-dedup stage, as a stream: drop
repeated keys as records arrive.  Plain ``dropDuplicates`` on a stream
keeps every key seen *forever* — state grows without bound, which at
100 TB/day of events is a guaranteed OOM.
``dropDuplicatesWithinWatermark`` keeps a key only until the watermark
passes its event time + delay, so state is bounded by (arrival rate ×
watermark delay) regardless of stream lifetime.  The contract weakens
accordingly: duplicates are only suppressed when they arrive within
the watermark delay of the first occurrence — the right trade for
at-least-once sources (Kafka redelivery, retried file loads), where
duplicates cluster in time.

Reference anchor: the reference has no dedup at all (SURVEY.md §2.4);
this extends the S1/S6 streaming surface per SURVEY.md §7.6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "60 seconds",
) -> DataFrame:
    """Keep the first arrival per ``keys``; state for a key is evicted
    once the watermark passes its event time + ``delay``."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
