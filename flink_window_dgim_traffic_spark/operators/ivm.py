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
bucket-local probe, and let AQE broadcast the delta side.  The plain
API is insert-only (the Flink append-stream join class); DELETES and
duplicate bags are the Z-SET mode below (``build_join_view_zset`` /
``refresh_join_view_zset`` — DBSP multiplicities, retraction as a
-1 delta, same O(|Δ|) cost and append-only storage).
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
    staged (uncommitted) dirs are invisible by construction.  For a
    Z-set view the deltas are COMPACTED on read (mult-sum per
    distinct row, non-positive rows dropped, surviving rows
    replicated by their multiplicity) so the result is the plain bag
    the one-shot join would produce — a delete delta really removes
    its rows."""
    from pyspark.sql import functions as F

    committed = _committed(path)
    if not committed:
        raise ValueError(f"no committed join view at {path!r}")
    tags = [t for _, t in committed]
    df = _read_deltas(spark, path, "view", tags)
    if df is None:
        raise ValueError(f"committed view has no delta dirs at {path!r}")
    if not _meta(path, *committed[0]).get("zset"):
        return df
    cols = [c for c in df.columns if c != "_mult"]
    bag = (
        df.groupBy(*cols)
        .agg(F.sum("_mult").cast("bigint").alias("_m"))
        .filter(F.col("_m") > 0)
    )
    return bag.select(
        *cols, F.explode(F.expr("sequence(1, _m)")).alias("_i")
    ).drop("_i")


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


# ----------------------------------------------------------------------
# Z-set (multiplicity) mode: DELETES without history rewrites
# ----------------------------------------------------------------------
# The DBSP/Differential-Dataflow generalization: every delta row
# carries an integer multiplicity ``_mult`` (+1 insert, -1 retract,
# +n duplicate bag rows), the join is BILINEAR in multiplicities
# (ΔV mult = l._mult · r._mult — which is exactly why the three-term
# delta rule extends unchanged to deletes), and the materialized view
# is the mult-sum per distinct row with non-positive rows dropped.
# Storage stays append-only delta dirs + atomic markers: a delete is
# just another delta file, so retractions cost O(|Δ|) like inserts and
# history is still never rewritten.


def _with_mult(df: DataFrame, zset: bool) -> DataFrame:
    from pyspark.sql import functions as F

    if not zset:
        return df
    if "_mult" not in df.columns:
        return df.withColumn("_mult", F.lit(1).cast("bigint"))
    return df.withColumn("_mult", F.col("_mult").cast("bigint"))


def _join_deltas(left: DataFrame, right: DataFrame, keys: list[str],
                 zset: bool) -> DataFrame:
    """Inner join of two delta sets; in zset mode the output
    multiplicity is the PRODUCT of the sides' (bilinearity)."""
    from pyspark.sql import functions as F

    if not zset:
        return left.join(right, keys)
    l = left.withColumnRenamed("_mult", "_lm")
    r = right.withColumnRenamed("_mult", "_rm")
    return (
        l.join(r, keys)
        .withColumn("_mult", (F.col("_lm") * F.col("_rm")).cast("bigint"))
        .drop("_lm", "_rm")
    )


def build_join_view_zset(
    left: DataFrame,
    right: DataFrame,
    path: str,
    keys: list[str],
    tag: str = "base",
) -> bool:
    """Z-set twin of :func:`build_join_view`: sides may carry a
    ``_mult`` BIGINT column (added as +1 when absent); the view
    stores multiplicities and :func:`read_join_view` compacts them."""
    overlap = (set(left.columns) & set(right.columns)) - set(keys) - {"_mult"}
    if overlap:
        raise ValueError(
            f"non-key columns shared between sides: {sorted(overlap)}"
        )
    if _committed(path):
        return False
    l, r = _with_mult(left, True), _with_mult(right, True)
    l.write.mode("overwrite").parquet(_delta_dir(path, "left", tag))
    r.write.mode("overwrite").parquet(_delta_dir(path, "right", tag))
    _join_deltas(l, r, keys, True).write.mode("overwrite").parquet(
        _delta_dir(path, "view", tag)
    )
    _write_marker(
        path, 1, tag,
        {"keys": keys, "sides": ["left", "right", "view"], "zset": True},
    )
    return True


def refresh_join_view_zset(
    spark,
    path: str,
    delta_left: DataFrame | None = None,
    delta_right: DataFrame | None = None,
    tag: str | None = None,
) -> bool:
    """Fold Z-set deltas (inserts, deletes as ``_mult`` = -1,
    duplicates as +n) into the materialized join — same staged-dir +
    atomic-marker exactly-once contract as
    :func:`refresh_join_view`, same three-term delta rule; deletes
    need NO special casing because the join is bilinear in
    multiplicities."""
    committed = _committed(path)
    if not committed:
        raise ValueError(
            f"no committed join view at {path!r} — run"
            " build_join_view_zset first"
        )
    meta0 = _meta(path, *committed[0])
    if not meta0.get("zset"):
        raise ValueError(
            f"{path!r} is an insert-only view; use refresh_join_view"
        )
    base_seq, _ = committed[-1]
    if tag is None:
        tag = f"refresh-{base_seq + 1}"
    if any(t == tag for _, t in committed):
        return False
    keys = meta0["keys"]
    tags = [t for _, t in committed]
    left_state = _read_deltas(spark, path, "left", tags)
    right_state = _read_deltas(spark, path, "right", tags)
    dl = _with_mult(delta_left, True) if delta_left is not None else None
    dr = _with_mult(delta_right, True) if delta_right is not None else None
    sides = []
    view_terms = []
    if dl is not None:
        if right_state is not None:
            view_terms.append(_join_deltas(dl, right_state, keys, True))
        dl.write.mode("overwrite").parquet(_delta_dir(path, "left", tag))
        sides.append("left")
    if dr is not None:
        if left_state is not None:
            view_terms.append(_join_deltas(left_state, dr, keys, True))
        dr.write.mode("overwrite").parquet(_delta_dir(path, "right", tag))
        sides.append("right")
    if dl is not None and dr is not None:
        view_terms.append(_join_deltas(dl, dr, keys, True))
    if view_terms:
        dv = view_terms[0]
        for t in view_terms[1:]:
            dv = dv.unionByName(t)
        dv.write.mode("overwrite").parquet(_delta_dir(path, "view", tag))
        sides.append("view")
    _write_marker(
        path, base_seq + 1, tag,
        {"keys": keys, "sides": sides, "zset": True},
    )
    return True
