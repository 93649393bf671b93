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


def corpus_build(
    documents: DataFrame,
    benchmark_source: str = "src0",
    max_contamination: float = 0.2,
    min_quality: float = 0.5,
    context_len: int = 2048,
    n_shards: int = 4,
) -> DataFrame:
    """The full corpus build the round-2 operators exist for:

    documents
      → drop the benchmark partition (it is eval, never training data)
      → exact dedup (keep min doc_id per identical text)
      → decontaminate (shingle overlap with the benchmark partition
        ≤ ``max_contamination``)
      → deterministic weighted mix + train/val/test split
      → quality gate (heuristic score ≥ ``min_quality``)
      → sequence-pack the TRAIN split into fixed training contexts

    Output: (doc_id, source, shard, n_tokens, pack_id, pack_pos,
    spans_boundary) — the packed training stream.  Every stage is one
    of the already-oracle-checked operators; the composition is
    value-matched against a DuckDB twin replaying the same stages.
    Scale shape: semi/anti key joins between map-only stages plus the
    per-shard packing shuffle — no stage collects or crosses.

    Note on the synthetic corpus: its vocabulary is tiny, so as sf
    grows the benchmark partition saturates the 3-gram shingle space
    and the contamination gate bites hard (sf0.01: 3/500 docs dirty;
    sf0.1: 4643/5000).  Expected data property, not a pipeline bug —
    real corpora have heavy-tailed shingle spaces.
    """
    from flink_window_dgim_traffic_spark.operators.corpus import (
        contamination_check,
        corpus_mix,
    )
    from flink_window_dgim_traffic_spark.operators.packing import (
        sequence_pack,
    )

    non_bench = documents.filter(F.col("source") != benchmark_source)
    keep_exact = non_bench.groupBy("text").agg(F.min("doc_id").alias("doc_id"))
    kept = non_bench.join(
        keep_exact.select("doc_id"), "doc_id", "left_semi"
    )
    dirty = contamination_check(documents, benchmark_source).filter(
        F.col("contamination_ratio") > max_contamination
    )
    kept = kept.join(dirty.select("doc_id"), "doc_id", "left_anti")
    train = corpus_mix(kept).filter(F.col("split") == "train")
    kept = kept.join(train.select("doc_id"), "doc_id", "left_semi")
    good = quality_score(kept).filter(
        F.col("quality_score") >= min_quality
    )
    kept = kept.join(good.select("doc_id"), "doc_id", "left_semi")
    return sequence_pack(kept, context_len=context_len, n_shards=n_shards)


def curation_funnel(
    documents: DataFrame,
    benchmark_source: str = "src0",
    max_contamination: float = 0.2,
) -> DataFrame:
    """Curation funnel report: how many documents survive each
    sequential gate of the corpus build — the dataset-card number
    every training-data pipeline publishes.

    Stages: raw → benchmark partition dropped → exact dedup →
    decontaminated → Gopher rule filter.  Each stage is the SAME
    operator used by the build pipelines (no reimplementation), and
    each row of the output is one one-row aggregate; the stage chain
    is semi/anti key joins end to end, so the funnel costs one pass
    per gate and never collects.
    """
    from flink_window_dgim_traffic_spark.operators.corpus import (
        contamination_check,
    )
    from flink_window_dgim_traffic_spark.operators.quality import (
        gopher_quality,
    )

    s_raw = documents
    s_nobench = s_raw.filter(F.col("source") != benchmark_source)
    keep_exact = s_nobench.groupBy("text").agg(
        F.min("doc_id").alias("doc_id")
    )
    s_dedup = s_nobench.join(keep_exact.select("doc_id"), "doc_id", "left_semi")
    dirty = contamination_check(documents, benchmark_source).filter(
        F.col("contamination_ratio") > max_contamination
    )
    s_clean = s_dedup.join(dirty.select("doc_id"), "doc_id", "left_anti")
    passed = gopher_quality(s_clean).filter(F.col("passes_gopher"))
    s_gopher = s_clean.join(passed.select("doc_id"), "doc_id", "left_semi")

    stages = [
        ("raw", s_raw),
        ("drop_benchmark", s_nobench),
        ("exact_dedup", s_dedup),
        ("decontaminated", s_clean),
        ("gopher_pass", s_gopher),
    ]
    parts = [
        df.agg(
            F.lit(i).cast("bigint").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        for i, (name, df) in enumerate(stages)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def domain_balanced_corpus(
    documents: DataFrame,
    benchmark_source: str = "src0",
    cap: int = 20,
    quality_q: float = 0.5,
) -> DataFrame:
    """The round-3 composition: every new curation operator chained
    into one oracle-matched pipeline.

    documents
      → drop the benchmark partition (eval, never training data)
      → ``source_cap`` — hard per-domain budget, keep the ``cap``
        smallest doc_ids per source (domain balancing)
      → ``dedup_incremental`` against the benchmark partition as the
        index — drops capped docs that are exact copies of eval text
        (exact-match decontamination) AND dedups the capped set
        itself (keep min doc_id per text)
      → ``quality_quantile_gate`` — per-language median gate over the
        survivors (thresholds computed on the post-dedup population)
      → ``corpus_mix`` — weighted sampling + split; keep the train
        split

    Output: (doc_id, source, lang, quality_score) of the balanced,
    decontaminated, gated training documents.  Every stage is an
    already-oracle-checked operator; the composition hash-matches a
    DuckDB twin replaying the same stages.  Scale shape: map-side
    partial top-k + key/anti joins + one bounded threshold agg —
    nothing collects, nothing crosses."""
    from flink_window_dgim_traffic_spark.operators.corpus import (
        corpus_mix,
        source_cap,
    )
    from flink_window_dgim_traffic_spark.operators.dedup import (
        dedup_incremental,
    )
    from flink_window_dgim_traffic_spark.operators.text import (
        quality_quantile_gate,
    )

    non_bench = documents.filter(F.col("source") != benchmark_source)
    bench = documents.filter(F.col("source") == benchmark_source)
    capped_ids = source_cap(non_bench, cap=cap).select("doc_id")
    capped = non_bench.join(capped_ids, "doc_id", "left_semi")
    survivors = dedup_incremental(capped, bench).select(
        F.col("keep_doc_id").alias("doc_id")
    )
    kept = capped.join(survivors, "doc_id", "left_semi")
    gated = quality_quantile_gate(kept, q=quality_q).select(
        "doc_id", "quality_score"
    )
    kept = kept.join(gated, "doc_id")
    train = corpus_mix(kept).filter(F.col("split") == "train").select(
        "doc_id"
    )
    return (
        kept.join(train, "doc_id", "left_semi")
        .select("doc_id", "source", "lang", "quality_score")
    )
