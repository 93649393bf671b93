"""Incremental connected components — graph IVM for the dedup-decision
pipeline.

A 100 TB near-dup system never re-clusters the full pair history: each
crawl increment delivers NEW pairs, and the component assignment must
fold them into the standing clusters.  The key identity: a star forest
is a connectivity-preserving contraction of everything seen so far, so

    CC(all edges ever)  ==  CC(current star forest  ∪  new edges)

and the maintained state is ONE edge per non-root node — O(nodes),
independent of how many raw pairs ever arrived.  Each refresh runs the
O(log n) star-contraction rounds (``graph.connected_components_star``)
over that union, which is tiny next to the accumulated pair history.

Crash discipline: the same snapshot-staged exactly-once protocol as the
rollup/sketch stores (stage parquet under the new tag, promote with ONE
atomically-replaced marker; an already-committed tag is the replay
skip), so a ``foreachBatch`` stream can crash and replay any batch
without double-folding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators.rollup import (
    _committed,
    _latest,
    _write_marker,
)


def _star_path(path: str, tag: str) -> str:
    return f"{path}/star/snap-{tag}"


def build_components_store(spark, path: str) -> None:
    """Initialize an EMPTY component store (star forest of zero
    nodes) with commit seq 0 — the fixed starting point every
    refresh chains from."""
    spark.createDataFrame(
        [], "node bigint, component_id bigint"
    ).write.mode("overwrite").parquet(_star_path(path, "init"))
    _write_marker(path, 0, "init", {"n_nodes": 0})


def refresh_components(
    spark, path: str, new_edges: DataFrame, tag: str | None = None
) -> bool:
    """Fold a batch of new edges (``src``/``dst``) into the standing
    star forest.  Returns False when ``tag`` is already committed
    (crash-replay skip).  The new snapshot is the star contraction of
    (previous star edges ∪ new edges) — connectivity-equivalent to
    clustering the full history, at the cost of the increment."""
    from flink_window_dgim_traffic_spark.operators.graph import (
        connected_components_star,
    )

    committed = _committed(path)
    if not committed:
        raise ValueError(
            f"no committed component store at {path!r} — run"
            " build_components_store first"
        )
    base_seq, base_tag = committed[-1]
    if tag is None:
        tag = f"refresh-{base_seq + 1}"
    if any(t == tag for _, t in committed):
        return False
    prev = spark.read.parquet(_star_path(path, base_tag))
    # star rows double as edges; roots (node == component_id) are
    # self-loops the CC operator filters, and a root always re-enters
    # through its children's edges (singleton components cannot arise
    # from pair input)
    edges = prev.select(
        F.col("component_id").alias("src"), F.col("node").alias("dst")
    ).unionByName(
        new_edges.select(
            F.col("src").cast("bigint").alias("src"),
            F.col("dst").cast("bigint").alias("dst"),
        )
    )
    star = connected_components_star(edges)
    star.write.mode("overwrite").parquet(_star_path(path, tag))
    n = spark.read.parquet(_star_path(path, tag)).count()
    _write_marker(path, base_seq + 1, tag, {"n_nodes": n})
    return True


def read_components(spark, path: str) -> DataFrame:
    """Current component assignment: (node, component_id) from the
    latest committed snapshot."""
    _, tag = _latest(path)
    return spark.read.parquet(_star_path(path, tag))


def components_refresh_batch_fn(path: str):
    """foreachBatch wrapper: batch id = snapshot tag → exactly-once
    under crash-replay (same contract as the rollup/sketch stores)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        refresh_components(
            batch.sparkSession, path, batch, tag=f"batch-{batch_id}"
        )

    return process


def gc_components_store(path: str, keep: int = 2) -> int:
    """Retention GC: delete star snapshots older than the last
    ``keep`` committed ones and return how many were removed.  A
    long-running refresh stream otherwise accumulates one snapshot
    per micro-batch (the 10k-batch listing problem the IVM store's
    compaction solved for deltas).  Markers are kept — they are the
    replay-skip record — only the superseded parquet data goes;
    readers only ever resolve the LATEST committed tag, so removing
    older snapshots cannot race a reader of current state."""
    from flink_window_dgim_traffic_spark.operators.rollup import (
        gc_snapshots,
    )

    return gc_snapshots(path, keep=keep)
