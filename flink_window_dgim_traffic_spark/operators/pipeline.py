"""End-to-end training-corpus pipeline: the composition the whole
north-star operator surface exists for.

``training_corpus`` = documents
  → exact dedup (keep the min doc_id per identical text)
  → near-dup removal (shingle-Jaccard ≥ 0.8 clusters; keep only the
    cluster representative = min doc_id of the component)
  → quality gate (heuristic score ≥ threshold)

Every stage is one of the already-oracle-checked operators; the
composition itself is value-matched against a DuckDB twin that
replays the same three stages in SQL.  All joins are key joins or
anti joins — the pipeline inherits the scale shape of its parts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators.dedup import (
    neardup_clusters,
    ngram_jaccard_pairs,
)
from flink_window_dgim_traffic_spark.operators.text import quality_score


def training_corpus(
    documents: DataFrame,
    jaccard_threshold: float = 0.8,
    min_quality: float = 0.5,
) -> DataFrame:
    """Kept documents with their quality features (doc_id ordering
    columns only — deterministic, hashable output)."""
    # stage 1: exact dedup — keep min doc_id per identical text
    keep_exact = documents.groupBy("text").agg(
        F.min("doc_id").alias("doc_id")
    )
    # three consumers read the survivors (shingle pipeline, shingle
    # sizes, final anti-join/quality) — checkpoint so the dedup
    # semi-join runs once, not per consumer
    kept = documents.join(
        keep_exact.select("doc_id"), "doc_id", "left_semi"
    ).localCheckpoint(eager=False)
    # stage 2: near-dup removal among the survivors — only cluster
    # representatives (label == own doc_id) stay; docs outside any
    # cluster are untouched (anti join keeps them)
    pairs = ngram_jaccard_pairs(kept, threshold=jaccard_threshold)
    clusters = neardup_clusters(pairs)
    non_reps = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select(
        "doc_id"
    )
    kept = kept.join(non_reps, "doc_id", "left_anti")
    # stage 3: quality gate
    q = quality_score(kept)
    return q.filter(F.col("quality_score") >= min_quality).select(
        "doc_id", "n_tokens", "quality_score"
    )
