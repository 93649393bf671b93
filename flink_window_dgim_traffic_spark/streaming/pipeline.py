"""Streaming curation pipeline — the multi-stage twin of
``operators.pipeline.domain_balanced_corpus`` as an INCREMENTAL BATCH
job (``foreachBatch``), the production Spark pattern for pipelines
whose stages need shared, queryable state (a growing dedup index, per-
source budgets) that no single built-in stateful operator models.

Why not chained stateful operators in one streaming query: the
pipeline needs (a) per-source admission counters, (b) a corpus-
lifetime text-hash index that every LATER batch must probe, and
(c) stateless gates — (a)+(b) are two different stateful shapes, and
Spark (like Flink) restricts stacking update-mode stateful operators.
``foreachBatch`` instead runs each micro-batch through the BATCH
operators against on-disk state:

    state_root/
      index/       fp (md5) of every HISTORY text — the seeded part
                   of the dedup index (immutable after seeding)
      index_delta/ batch-<id>/ fps admitted by committed batch <id>
      counters/    batch-<id>/ full (source, admitted) snapshot AFTER
                   batch <id> — per-domain budget spent
      thresholds/  (lang, lang_threshold) — quality gate fit ONCE on
                   the seeded history (streaming can't see the future
                   population the batch gate uses)
      out/         batch-<id>/ parquet of curated train docs
      _done/       batch-id markers for exactly-once restart semantics

Each batch: drop benchmark rows → per-source cap (arrival order,
doc_id-tie-broken, continuing the stored counters) → anti-join the
index on md5(text) + keep min doc_id within the batch → static
per-lang quality gate → deterministic split, keep train → write
output, counters snapshot, and index delta, then the marker.

Exactly-once: EVERY mutable write is batch-id-keyed and overwrite-
idempotent — the output, the counters snapshot, and the index delta
all live under ``batch-<id>`` paths that only the ``_done/<id>``
marker (written LAST) promotes to visibility.  Readers reconstruct
state exclusively from COMMITTED batches (counters = snapshot of the
highest committed id; index = seed ∪ committed deltas), so a crash
anywhere before the marker leaves only orphaned staged files that the
replay overwrites from the committed state — no double-counted
budgets, no reduced-subset output (this closes the round-3 advisor's
crash window between the old read-modify-write counters overwrite /
index append and the marker).  A replayed batch whose marker exists
skips entirely.

Scale: every stage is the already-plan-audited batch operator shape
(window over per-source batch slices, hash anti-join against an index
pruned to its 32-byte fp column, broadcast thresholds, map-only
split).  State files are parquet — at 100 TB the index is a bucketed
table on fp and the anti-join is shuffle-free.

Equivalence (tested): ordered replay of doc_id-ranged chunks produces
exactly the batch twin :func:`curation_batch_twin` run over the full
corpus — including across a kill-and-restart.

Deployment note: state paths and batch markers use the driver's
local filesystem here (``os.path`` / ``open``) because the sandbox
has no object store; on a cluster, swap those for the Hadoop
FileSystem API (or keep the state in a transactional table format)
— the per-batch dataflow is unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators.corpus import (
    lm_bucket_counts,
    lm_gate_with_profile,
    split_col,
)
from flink_window_dgim_traffic_spark.operators.text import (
    quality_score_col,
    quality_thresholds,
)

OUT_COLS = ("doc_id", "source", "lang", "quality_score")
OUT_SCHEMA = (
    "doc_id long, source string, lang string, quality_score double"
)


def _committed_ids(state_root: str) -> list[int]:
    """Batch ids whose ``_done`` marker exists, ascending — the ONLY
    source of truth for which staged writes are visible."""
    done = f"{state_root}/_done"
    if not os.path.isdir(done):
        return []
    return sorted(int(n) for n in os.listdir(done) if n.isdigit())


def _read_counters(spark, state_root: str, committed: list[int]):
    if committed:
        return spark.read.parquet(
            f"{state_root}/counters/batch-{committed[-1]}"
        )
    return spark.createDataFrame([], "source string, admitted bigint")


def _absorbed_ids(state_root: str) -> set[int]:
    """Batch ids whose index deltas have been folded into the seed
    index by :func:`compact_curation_state`."""
    import json

    p = f"{state_root}/absorbed.json"
    if not os.path.exists(p):
        return set()
    with open(p) as f:
        return set(json.load(f))


def _read_index(spark, state_root: str, committed: list[int]):
    """Seed index ∪ committed per-batch deltas not yet compacted
    (``compact_curation_state`` folds deltas into the seed — at
    100 TB the seed is a bucketed-on-fp table and the anti-join is
    co-located; the probe shape is unchanged either way)."""
    absorbed = _absorbed_ids(state_root)
    paths = [f"{state_root}/index"] + [
        f"{state_root}/index_delta/batch-{i}"
        for i in committed
        if i not in absorbed
    ]
    return spark.read.parquet(*paths)


def compact_curation_state(spark, state_root: str) -> int:
    """Fold all committed index deltas into the seed index — the
    maintenance job that keeps :func:`_read_index` from accumulating
    one directory per batch forever.  Run while the stream is idle
    (between ``availableNow`` invocations).

    Crash-safety is IDEMPOTENCE, not staging: the dedup index is a
    SET probed only by anti-joins, so duplicate fps are semantically
    invisible.  The write order (merged index overwrite → absorbed
    ledger → delta-dir removal) therefore leaves a correct superset
    index after a crash at ANY point, and re-running converges.
    Returns the number of deltas absorbed."""
    import json
    import shutil

    committed = _committed_ids(state_root)
    absorbed = _absorbed_ids(state_root)
    pending = [i for i in committed if i not in absorbed]
    if not pending:
        return 0
    merged = _read_index(spark, state_root, committed).select(
        "fp"
    ).distinct().localCheckpoint(eager=True)
    merged.write.mode("overwrite").parquet(f"{state_root}/index")
    with open(f"{state_root}/absorbed.json", "w") as f:
        json.dump(sorted(absorbed | set(pending)), f)
    for i in pending:
        shutil.rmtree(
            f"{state_root}/index_delta/batch-{i}", ignore_errors=True
        )
    return len(pending)


def seed_curation_state(
    spark, state_root: str, history_docs: DataFrame, q: float = 0.5
) -> None:
    """Initialize state from the already-ingested history (the
    benchmark partition in the batch twin): its text hashes seed the
    dedup index, its quality distribution fits the per-lang gate."""
    history_docs.select(F.md5("text").alias("fp")).distinct().write.mode(
        "overwrite"
    ).parquet(f"{state_root}/index")
    quality_thresholds(history_docs, q).write.mode("overwrite").parquet(
        f"{state_root}/thresholds"
    )
    lm_bucket_counts(history_docs).write.mode("overwrite").parquet(
        f"{state_root}/lm_counts"
    )
    os.makedirs(f"{state_root}/_done", exist_ok=True)


def make_curation_batch_fn(
    state_root: str, benchmark_source: str = "src0", cap: int = 20
):
    """Build the foreachBatch function (importable at module scope)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        marker = f"{state_root}/_done/{batch_id}"
        if os.path.exists(marker):
            return  # replayed after restart — output already committed
        spark = batch.sparkSession
        docs = batch.filter(
            F.col("source") != benchmark_source
        ).localCheckpoint()

        # state is reconstructed from COMMITTED batches only — staged
        # files from a crashed attempt are invisible here
        committed = _committed_ids(state_root)
        counters = _read_counters(spark, state_root, committed)

        # stage 1: per-source admission cap, continuing stored budgets
        w = W.partitionBy("source").orderBy("doc_id")
        capped = (
            docs.withColumn("batch_rank", F.row_number().over(w))
            .join(F.broadcast(counters), "source", "left")
            .withColumn("admitted0", F.coalesce("admitted", F.lit(0)))
            .filter(F.col("batch_rank") <= F.lit(cap) - F.col("admitted0"))
            .drop("admitted", "batch_rank")
            .localCheckpoint()
        )

        # stage 2: dedup against the corpus-lifetime index, then
        # min-doc_id within the batch (the batch operator's tie rule)
        index = _read_index(spark, state_root, committed)
        hashed = capped.withColumn("fp", F.md5("text"))
        fresh_ids = (
            hashed.join(index, "fp", "left_anti")
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
            .localCheckpoint()
        )
        fresh = hashed.join(
            fresh_ids.select("doc_id"), "doc_id", "left_semi"
        )

        # stage 3: static per-lang quality gate + history-fit LM
        # gate (hashed-unigram log-likelihood vs uniform) + train split
        thr = spark.read.parquet(f"{state_root}/thresholds")
        lm_counts = spark.read.parquet(f"{state_root}/lm_counts")
        lm_keep = lm_gate_with_profile(fresh, lm_counts).filter(
            F.col("keep") == 1
        ).select("doc_id")
        kept = (
            fresh.join(lm_keep, "doc_id", "left_semi")
            .withColumn("quality_score", quality_score_col())
            .join(F.broadcast(thr), "lang")
            .filter(F.col("quality_score") >= F.col("lang_threshold"))
            .filter(split_col() == "train")
            .select(*OUT_COLS)
        )
        kept.write.mode("overwrite").parquet(
            f"{state_root}/out/batch-{batch_id}"
        )

        # stage state AFTER output, all under batch-id-keyed paths:
        # admitted counters advance by CAPPED rows (budget is spent
        # whether or not dedup keeps the doc) as a FULL snapshot, the
        # index grows via a per-batch delta — both overwrite-idempotent
        new_counts = capped.groupBy("source").agg(
            F.count(F.lit(1)).alias("new_admitted")
        )
        merged = (
            counters.join(new_counts, "source", "full")
            .select(
                "source",
                (
                    F.coalesce("admitted", F.lit(0))
                    + F.coalesce("new_admitted", F.lit(0))
                ).alias("admitted"),
            )
            .localCheckpoint()
        )
        merged.write.mode("overwrite").parquet(
            f"{state_root}/counters/batch-{batch_id}"
        )
        fresh_ids.select("fp").write.mode("overwrite").parquet(
            f"{state_root}/index_delta/batch-{batch_id}"
        )
        # marker LAST — the atomic promotion: a crash before this
        # point leaves only staged batch-<id> files that the replay
        # (recomputing from committed state) overwrites wholesale
        open(marker, "w").close()

    return process


def curation_stream(
    doc_stream: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    benchmark_source: str = "src0",
    cap: int = 20,
):
    """Start the incremental curation query (availableNow trigger —
    call repeatedly as new files/offsets arrive, like any incremental
    batch job).  ``seed_curation_state`` must have run first."""
    return (
        doc_stream.writeStream.foreachBatch(
            make_curation_batch_fn(state_root, benchmark_source, cap)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_curated(spark, state_root: str) -> DataFrame:
    """Curated output of COMMITTED batches only — a crashed attempt's
    staged ``out/batch-<id>`` (marker never written) is invisible."""
    committed = _committed_ids(state_root)
    if not committed:
        return spark.createDataFrame([], OUT_SCHEMA)
    return spark.read.parquet(
        *[f"{state_root}/out/batch-{i}" for i in committed]
    )


def curation_batch_twin(
    documents: DataFrame,
    benchmark_source: str = "src0",
    cap: int = 20,
    q: float = 0.5,
) -> DataFrame:
    """The whole-corpus batch with IDENTICAL semantics to an ordered
    replay through the streaming pipeline: cap keeps the ``cap``
    smallest doc_ids per source (ordered replay makes arrival order =
    doc_id order), dedup is against benchmark hashes then min-doc_id
    per text, gate thresholds are fit on the benchmark partition, and
    the split is the shared deterministic hash.  Differs from
    ``domain_balanced_corpus`` only where streaming CANNOT match the
    batch shape: thresholds come from the history, not the future
    survivor population, and there is no sampling stage."""
    from flink_window_dgim_traffic_spark.operators.corpus import source_cap
    from flink_window_dgim_traffic_spark.operators.dedup import (
        dedup_incremental,
    )

    non_bench = documents.filter(F.col("source") != benchmark_source)
    bench = documents.filter(F.col("source") == benchmark_source)
    capped = non_bench.join(
        source_cap(non_bench, cap=cap).select("doc_id"),
        "doc_id",
        "left_semi",
    )
    fresh = capped.join(
        dedup_incremental(capped, bench).select(
            F.col("keep_doc_id").alias("doc_id")
        ),
        "doc_id",
        "left_semi",
    )
    thr = quality_thresholds(bench, q)
    lm_keep = lm_gate_with_profile(
        fresh, lm_bucket_counts(bench)
    ).filter(F.col("keep") == 1).select("doc_id")
    return (
        fresh.join(lm_keep, "doc_id", "left_semi")
        .withColumn("quality_score", quality_score_col())
        .join(F.broadcast(thr), "lang")
        .filter(F.col("quality_score") >= F.col("lang_threshold"))
        .filter(split_col() == "train")
        .select(*OUT_COLS)
    )
