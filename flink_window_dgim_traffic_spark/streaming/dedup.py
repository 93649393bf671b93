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


def dedup_incremental_stream(
    new_stream: DataFrame,
    index_docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    delay: str = "60 seconds",
) -> DataFrame:
    """Streaming twin of ``operators.dedup.dedup_incremental``: a
    crawl STREAM deduplicated against a STATIC ingested index, then
    within itself.

    Two stages, both bounded:

    1. stream-static LEFT ANTI join — the static index is projected
       to its DISTINCT md5 column before the join, so each micro-
       batch probes hashes, never index payloads (Spark re-plans the
       static side per micro-batch; with the index stored as a table
       bucketed by the hash, the probe is shuffle-free);
    2. within-stream first-arrival dedup via
       ``dropDuplicatesWithinWatermark`` — state bounded by arrival
       rate × ``delay`` exactly as :func:`dedup_stream`, the right
       contract for at-least-once crawl redelivery where duplicates
       cluster in time.

    Batch-twin note (tested): the kept TEXT set equals the batch
    operator's on replayed input — exactly one survivor per novel
    text, none for indexed texts.  WHICH duplicate survives is
    first-arrival at micro-batch granularity but arbitrary within a
    batch (parallel file/partition read order), unlike the batch
    operator's deterministic min-doc_id; in the at-least-once
    redelivery shape duplicates are byte-identical payloads, so the
    choice is immaterial.  Pipelines that need the batch's exact
    survivor rule re-key the stored output with the batch operator."""
    from pyspark.sql import functions as F

    idx = index_docs.select(F.md5(text_col).alias("fp")).distinct()
    fresh = new_stream.withColumn("fp", F.md5(text_col)).join(
        idx, "fp", "left_anti"
    )
    return fresh.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def contamination_stream(
    doc_stream: DataFrame,
    benchmark_docs: DataFrame,
    k: int | None = None,
) -> DataFrame:
    """Streaming benchmark decontamination — the stream-static twin of
    ``operators.corpus.contamination_check``: every arriving doc emits
    its contamination ratio once, in append mode, with ZERO state.

    The batch operator's shingle-explode + per-doc aggregation would
    be a stateful streaming aggregation (doc_id groups held forever);
    instead the doc's DISTINCT shingle set stays an in-row ARRAY (the
    ``_shingle_arrays`` projection) and the benchmark set rides in as
    a one-row broadcast array, so contamination is a map-side
    ``array_intersect`` — no watermark, no state store, nothing to
    evict.  Sound at scale for the same reason as the batch twin: the
    eval suite is fixed-size while the crawl stream grows."""
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.operators.dedup import (
        SHINGLE_K,
        _shingle_arrays,
        shingles,
    )

    k = SHINGLE_K if k is None else k
    bench = (
        shingles(benchmark_docs, k)
        .select(F.collect_set("s").alias("bench_set"))
    )
    arr = _shingle_arrays(doc_stream, k)
    return (
        arr.crossJoin(F.broadcast(bench))
        .select(
            "doc_id",
            F.size("sh_arr").cast("bigint").alias("n_shingles"),
            F.size(F.array_intersect("sh_arr", "bench_set"))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .withColumn(
            "contamination_ratio",
            F.round(F.col("n_contaminated") / F.col("n_shingles"), 6),
        )
    )
