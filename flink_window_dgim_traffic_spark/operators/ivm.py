"""Incremental view maintenance for JOINs — the Materialize /
Flink-dual-stream / DBSP delta-join rule applied to a materialized
inner join of two append-only tables:

    ΔV  =  ΔL ⋈ R   ∪   L ⋈ ΔR   ∪   ΔL ⋈ ΔR
    V'  =  V ∪ ΔV,   L' = L ∪ ΔL,   R' = R ∪ ΔR

so a refresh touches each side's FULL state only against the other
side's (small) delta, and the view itself is append-only — no join is
ever recomputed from scratch.  This is the join sibling of the
``rollup.py`` continuous aggregate: rollup incrementalizes GROUP BY,
this incrementalizes JOIN, and both carry their cross-batch state as
committed on-disk snapshots, never in driver memory.

Storage is DELTA-ORIENTED, not snapshot-rewritten: each committed
refresh appends three parquet delta dirs (``left/delta-<tag>``,
``right/delta-<tag>``, ``view/delta-<tag>``) and one atomically-
renamed commit marker (``_commits/<seq>.<tag>``, the ``rollup.py``
recipe) listing exactly which delta dirs it made visible.  Readers
union the delta dirs of committed markers only, so

- a crash between any delta write and the marker leaves invisible
  staged files that a replay (same tag) simply overwrites — the
  ΔL⋈R / L⋈ΔR / ΔL⋈ΔR terms are recomputed from the same committed
  base, so nothing double-counts;
- a tag that is already committed returns ``False`` untouched (the
  replay skip) — the same idempotence contract as
  ``refresh_rollup``;
- history is never rewritten: refresh I/O is O(|Δ| + |view delta|),
  not O(|state|) — the property that keeps a year of accumulated
  state maintainable at 100 TB.

Scale notes: the L ⋈ ΔR term must scan the accumulated left state
(that is inherent to join IVM — the new right rows may match ANY old
left row); on a cluster, write both side states bucketed by the join
key (``sources/bucketing.py``) so that scan is a shuffle-free
bucket-local probe, and let AQE broadcast the delta side.  Insert-only
deltas are assumed (the Flink append-stream join class); upstream
deletes compose with :func:`relational.cdc_apply` compaction upstream
or a retraction column, both outside this operator's contract.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame


def _committed(path: str) -> list[tuple[int, str]]:
    d = f"{path}/_commits"
    if not os.path.isdir(d):
        return []
    out = []
    for n in os.listdir(d):
        seq, _, tag = n.partition(".")
        if seq.isdigit() and tag:
            out.append((int(seq), tag))
    return sorted(out)


def _write_marker(path: str, seq: int, tag: str, meta: dict) -> None:
    d = f"{path}/_commits"
    os.makedirs(d, exist_ok=True)
    tmp = f"{d}/.tmp-{seq}.{tag}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, f"{d}/{seq}.{tag}")


def _meta(path: str, seq: int, tag: str) -> dict:
    with open(f"{path}/_commits/{seq}.{tag}") as f:
        return json.load(f)


def _delta_dir(path: str, side: str, tag: str) -> str:
    return f"{path}/{side}/delta-{tag}"


def _read_deltas(spark, path: str, side: str, tags: list[str]) -> DataFrame | None:
    dirs = [
        _delta_dir(path, side, t)
        for t in tags
        if os.path.isdir(_delta_dir(path, side, t))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def _visible_tags(path: str) -> list[str]:
    """Tags of committed refreshes in commit order — the only deltas
    a reader may union."""
    return [t for _, t in _committed(path)]


def build_join_view(
    left: DataFrame,
    right: DataFrame,
    path: str,
    keys: list[str],
    tag: str = "base",
) -> bool:
    """Materialize the initial state: the two sides, their inner
    join, and commit marker seq 1.  Key columns must be the only
    shared column names between the sides (standard join-view
    contract, asserted)."""
    overlap = (set(left.columns) & set(right.columns)) - set(keys)
    if overlap:
        raise ValueError(
            f"non-key columns shared between sides: {sorted(overlap)}"
        )
    if _committed(path):
        return False
    left.write.mode("overwrite").parquet(_delta_dir(path, "left", tag))
    right.write.mode("overwrite").parquet(
        _delta_dir(path, "right", tag)
    )
    left.join(right, keys).write.mode("overwrite").parquet(
        _delta_dir(path, "view", tag)
    )
    _write_marker(path, 1, tag, {"keys": keys, "sides": ["left", "right", "view"]})
    return True


def refresh_join_view(
    spark,
    path: str,
    delta_left: DataFrame | None = None,
    delta_right: DataFrame | None = None,
    tag: str | None = None,
) -> bool:
    """Fold insert-only deltas of either (or both) sides into the
    materialized join: stage ``left/right/view`` delta dirs for this
    tag, then promote with one marker.  ΔV is the three-term delta
    rule; the ΔL⋈ΔR term is what keeps same-batch matches from being
    missed, and joining ΔL against the PRE-refresh right state is
    what keeps them from being counted twice."""
    committed = _committed(path)
    if not committed:
        raise ValueError(
            f"no committed join view at {path!r} — run"
            " build_join_view first"
        )
    base_seq, base_tag = committed[-1]
    if tag is None:
        tag = f"refresh-{base_seq + 1}"
    if any(t == tag for _, t in committed):
        return False
    keys = _meta(path, *committed[0])["keys"]
    tags = [t for _, t in committed]
    left_state = _read_deltas(spark, path, "left", tags)
    right_state = _read_deltas(spark, path, "right", tags)
    sides = []
    view_terms = []
    if delta_left is not None:
        if right_state is not None:
            view_terms.append(delta_left.join(right_state, keys))
        delta_left.write.mode("overwrite").parquet(
            _delta_dir(path, "left", tag)
        )
        sides.append("left")
    if delta_right is not None:
        if left_state is not None:
            view_terms.append(left_state.join(delta_right, keys))
        delta_right.write.mode("overwrite").parquet(
            _delta_dir(path, "right", tag)
        )
        sides.append("right")
    if delta_left is not None and delta_right is not None:
        view_terms.append(delta_left.join(delta_right, keys))
    if view_terms:
        dv = view_terms[0]
        for t in view_terms[1:]:
            dv = dv.unionByName(t)
        dv.write.mode("overwrite").parquet(
            _delta_dir(path, "view", tag)
        )
        sides.append("view")
    _write_marker(path, base_seq + 1, tag, {"keys": keys, "sides": sides})
    return True


def read_join_view(spark, path: str) -> DataFrame:
    """The maintained join: union of every COMMITTED view delta —
    staged (uncommitted) dirs are invisible by construction."""
    tags = _visible_tags(path)
    if not tags:
        raise ValueError(f"no committed join view at {path!r}")
    df = _read_deltas(spark, path, "view", tags)
    if df is None:
        raise ValueError(f"committed view has no delta dirs at {path!r}")
    return df


def ivm_refresh_batch_fn(path: str, side: str = "left"):
    """foreachBatch wrapper for STREAMING maintenance of the join
    view: the micro-batch is the delta of ``side`` and the batch id
    IS the refresh tag, so the staged-delta + atomic-marker promotion
    inside :func:`refresh_join_view` gives exactly-once under
    crash-replay at any point — a replayed committed batch returns
    immediately, a replayed crashed batch re-stages from the same
    committed base (the ``rollup.rollup_refresh_batch_fn``
    discipline applied to joins)."""
    if side not in ("left", "right"):
        raise ValueError(f"side must be left/right, got {side!r}")

    def process(batch: DataFrame, batch_id: int) -> None:
        refresh_join_view(
            batch.sparkSession,
            path,
            delta_left=batch if side == "left" else None,
            delta_right=batch if side == "right" else None,
            tag=f"batch-{batch_id}",
        )

    return process
