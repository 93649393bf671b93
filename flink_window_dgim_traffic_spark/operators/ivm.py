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


def _write_staged(jobs: list[tuple[DataFrame, str]]) -> None:
    """Stage several delta dirs CONCURRENTLY (guide §2.6: overlap
    independent jobs so one write's task tail back-fills with the next
    write's tasks — these staged writes are independent by
    construction, none reads another's output dir, and the commit
    marker is written by the caller only after ALL of them return).
    Spark's scheduler runs driver-thread-submitted jobs FIFO, which is
    exactly the back-fill behaviour wanted; job descriptions are
    thread-local so the UI stays readable.  Sequentially these
    ~O(|Δ|) writes each paid a full job latency on top of tiny data
    (measured: 3 staged writes per refresh dominated ivm_join_orders
    at sf0.1)."""
    if len(jobs) == 1:
        df, p = jobs[0]
        df.write.mode("overwrite").parquet(p)
        return
    from concurrent.futures import ThreadPoolExecutor

    def _one(job: tuple[DataFrame, str]) -> None:
        df, p = job
        df.write.mode("overwrite").parquet(p)

    with ThreadPoolExecutor(max_workers=len(jobs)) as ex:
        list(ex.map(_one, jobs))


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
    """Tags whose delta dirs a reader may union, in commit order —
    the committed history with compaction applied: a marker carrying
    ``absorbs`` supersedes those tags' dirs with its own, so after a
    compaction the visible set is O(1 + refreshes-since-compaction),
    never O(total refreshes).  (Replay-skip checks still consult the
    FULL committed list — an absorbed tag stays committed.)"""
    vis: list[str] = []
    for seq, tag in _committed(path):
        for absorbed in _meta(path, seq, tag).get("absorbs", []):
            if absorbed in vis:
                vis.remove(absorbed)
        vis.append(tag)
    return vis


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
    _write_staged(
        [
            (left, _delta_dir(path, "left", tag)),
            (right, _delta_dir(path, "right", tag)),
            (left.join(right, keys), _delta_dir(path, "view", tag)),
        ]
    )
    _write_marker(path, 1, tag, {"keys": keys, "sides": ["left", "right", "view"]})
    return True


def refresh_join_view(
    spark,
    path: str,
    delta_left: DataFrame | None = None,
    delta_right: DataFrame | None = None,
    tag: str | None = None,
    compact_after: int | None = None,
) -> bool:
    """Fold insert-only deltas of either (or both) sides into the
    materialized join: stage ``left/right/view`` delta dirs for this
    tag, then promote with one marker.  ΔV is the three-term delta
    rule; the ΔL⋈ΔR term is what keeps same-batch matches from being
    missed, and joining ΔL against the PRE-refresh right state is
    what keeps them from being counted twice.  With ``compact_after``
    set, a successful refresh that leaves more than that many visible
    delta dirs triggers :func:`compact_join_view` — amortized O(1)
    read fan-in for long-running maintenance loops."""
    committed = _committed(path)
    if not committed:
        raise ValueError(
            f"no committed join view at {path!r} — run"
            " build_join_view first"
        )
    meta0 = _meta(path, *committed[0])
    if meta0.get("zset"):
        raise ValueError(
            f"{path!r} is a Z-set view; use refresh_join_view_zset"
            " (a plain refresh would stage _mult-less deltas and"
            " corrupt the multiplicity state)"
        )
    base_seq, base_tag = committed[-1]
    if tag is None:
        tag = f"refresh-{base_seq + 1}"
    if any(t == tag for _, t in committed):
        return False
    keys = meta0["keys"]
    tags = _visible_tags(path)
    left_state = _read_deltas(spark, path, "left", tags)
    right_state = _read_deltas(spark, path, "right", tags)
    sides = []
    view_terms = []
    staged: list[tuple[DataFrame, str]] = []
    if delta_left is not None:
        if right_state is not None:
            view_terms.append(delta_left.join(right_state, keys))
        staged.append((delta_left, _delta_dir(path, "left", tag)))
        sides.append("left")
    if delta_right is not None:
        if left_state is not None:
            view_terms.append(left_state.join(delta_right, keys))
        staged.append((delta_right, _delta_dir(path, "right", tag)))
        sides.append("right")
    if delta_left is not None and delta_right is not None:
        view_terms.append(delta_left.join(delta_right, keys))
    if view_terms:
        dv = view_terms[0]
        for t in view_terms[1:]:
            dv = dv.unionByName(t)
        # the ΔV terms join the deltas against the PRE-refresh state
        # DataFrames (read from already-committed dirs), never against
        # this refresh's own staged output — safe to stage all sides
        # concurrently
        staged.append((dv, _delta_dir(path, "view", tag)))
        sides.append("view")
    if staged:
        _write_staged(staged)
    _write_marker(path, base_seq + 1, tag, {"keys": keys, "sides": sides})
    if compact_after is not None and len(_visible_tags(path)) > compact_after:
        compact_join_view(spark, path)
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
    tags = _visible_tags(path)
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


def ivm_refresh_batch_fn(
    path: str,
    side: str = "left",
    run_id: str | None = None,
    compact_after: int | None = None,
):
    """foreachBatch wrapper for STREAMING maintenance of the join
    view: the micro-batch is the delta of ``side`` and the batch id
    IS the refresh tag, so the staged-delta + atomic-marker promotion
    inside :func:`refresh_join_view` gives exactly-once under
    crash-replay at any point — a replayed committed batch returns
    immediately, a replayed crashed batch re-stages from the same
    committed base (the ``rollup.rollup_refresh_batch_fn``
    discipline applied to joins).

    Tag namespacing: the replay skip keys on the tag alone, so batch
    ids are only unique within ONE checkpoint lineage.  Pass
    ``run_id`` (e.g. the checkpoint dir's name, or the stream's
    query id) whenever the view path may outlive a checkpoint
    location or be fed by more than one stream — otherwise a
    restarted-from-scratch stream re-issues batch 0 and the skip
    silently drops its data.  Without a run_id the checkpoint dir
    and view path lifetimes MUST be coupled (delete both together)."""
    if side not in ("left", "right"):
        raise ValueError(f"side must be left/right, got {side!r}")
    prefix = f"{run_id}-" if run_id else ""

    def process(batch: DataFrame, batch_id: int) -> None:
        refresh_join_view(
            batch.sparkSession,
            path,
            delta_left=batch if side == "left" else None,
            delta_right=batch if side == "right" else None,
            tag=f"{prefix}batch-{batch_id}",
            compact_after=compact_after,
        )

    return process


def compact_join_view(
    spark, path: str, min_tags: int = 2, clean: bool = True
) -> bool:
    """Fold every visible delta dir into ONE compacted snapshot per
    side — the maintenance job that keeps :func:`read_join_view` /
    refresh fan-in O(1) instead of O(#refreshes) (after 10k
    streaming batches the naive reader unions 10k parquet dirs and
    pays an O(#refreshes) listing per query; the VERDICT-r6 design
    gap).  The ``compact_curation_state`` idempotence discipline
    applied to BAG/Z-set state, where duplicates are NOT semantically
    invisible, so staging + one atomic marker replaces set-idempotence:

    - write ``left/right/view delta-compact-<seq>`` = union of the
      visible dirs (Z-set mode additionally mult-sums per distinct
      row and drops exact zeros — negative totals are kept, they are
      legitimate transient Z-set state);
    - commit ONE marker whose ``absorbs`` lists the superseded tags —
      :func:`_visible_tags` then swaps them for the compacted dirs;
    - only after the marker, delete absorbed dirs (``clean=True``).

    Crash-safe at every point: before the marker the staged compact
    dirs are invisible and a rerun overwrites them from the still-
    present sources; after the marker the absorbed dirs are dead
    weight a rerun's leftover sweep removes.  Replay-skip of past
    refresh tags keeps working — absorbed tags stay in the committed
    list.  Returns False (no-op) below ``min_tags`` visible dirs.

    Concurrency contract: SINGLE WRITER, no concurrent readers at
    ``clean=True``.  A reader (``read_join_view`` / a refresh) that
    captured the pre-compaction visible tag set will fail mid-scan
    when ``clean=True`` removes the absorbed dirs under it.  With
    readers that overlap compactions, call with ``clean=False`` —
    deletion of absorbed dirs is then DEFERRED to the leftover sweep
    at the START of the next compaction (the ``stale`` sweep below),
    giving in-flight readers one full compaction interval to drain.

    Bounded residual cost: marker FILES are retained forever (the
    replay-skip contract needs the full tag history), so
    ``_committed``/``_visible_tags`` remain an O(#refreshes) readdir
    + tiny-JSON scan — bytes-per-marker bounded, no Spark job, no
    parquet listing; what compaction eliminates is the
    data-proportional part (the O(#refreshes) parquet DIR listing
    and the union of that many file sets in every read/refresh
    plan).  If marker-scan time ever matters (millions of
    refreshes), fold absorbed tags into the compact marker and
    delete their files — the absorbs list already carries the
    information."""
    import shutil

    from pyspark.sql import functions as F

    committed = _committed(path)
    if not committed:
        raise ValueError(f"no committed join view at {path!r}")
    meta0 = _meta(path, *committed[0])
    vis = _visible_tags(path)
    # leftover sweep: dirs of committed-but-absorbed tags (a prior
    # compaction that crashed between marker and cleanup)
    stale = {t for _, t in committed} - set(vis)
    for side in ("left", "right", "view"):
        for t in stale:
            shutil.rmtree(_delta_dir(path, side, t), ignore_errors=True)
    if len(vis) < min_tags:
        return False
    base_seq, _ = committed[-1]
    ctag = f"compact-{base_seq + 1}"
    zset = bool(meta0.get("zset"))
    sides = []
    staged: list[tuple[DataFrame, str]] = []
    for side in ("left", "right", "view"):
        df = _read_deltas(spark, path, side, vis)
        if df is None:
            continue
        if zset:
            cols = [c for c in df.columns if c != "_mult"]
            df = (
                df.groupBy(*cols)
                .agg(F.sum("_mult").cast("bigint").alias("_mult"))
                .filter(F.col("_mult") != 0)
            )
        staged.append((df, _delta_dir(path, side, ctag)))
        sides.append(side)
    if staged:
        _write_staged(staged)
    meta = {"keys": meta0["keys"], "sides": sides, "absorbs": vis}
    if zset:
        meta["zset"] = True
    _write_marker(path, base_seq + 1, ctag, meta)
    if clean:
        for side in ("left", "right", "view"):
            for t in vis:
                shutil.rmtree(
                    _delta_dir(path, side, t), ignore_errors=True
                )
    return True


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
    _write_staged(
        [
            (l, _delta_dir(path, "left", tag)),
            (r, _delta_dir(path, "right", tag)),
            (_join_deltas(l, r, keys, True), _delta_dir(path, "view", tag)),
        ]
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
    compact_after: int | None = None,
) -> bool:
    """Fold Z-set deltas (inserts, deletes as ``_mult`` = -1,
    duplicates as +n) into the materialized join — same staged-dir +
    atomic-marker exactly-once contract as
    :func:`refresh_join_view`, same three-term delta rule; deletes
    need NO special casing because the join is bilinear in
    multiplicities.  ``compact_after`` as in
    :func:`refresh_join_view` (the Z-set compaction additionally
    mult-sums, so absorbed retractions physically shrink state)."""
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
    tags = _visible_tags(path)
    left_state = _read_deltas(spark, path, "left", tags)
    right_state = _read_deltas(spark, path, "right", tags)
    dl = _with_mult(delta_left, True) if delta_left is not None else None
    dr = _with_mult(delta_right, True) if delta_right is not None else None
    sides = []
    view_terms = []
    staged: list[tuple[DataFrame, str]] = []
    if dl is not None:
        if right_state is not None:
            view_terms.append(_join_deltas(dl, right_state, keys, True))
        staged.append((dl, _delta_dir(path, "left", tag)))
        sides.append("left")
    if dr is not None:
        if left_state is not None:
            view_terms.append(_join_deltas(left_state, dr, keys, True))
        staged.append((dr, _delta_dir(path, "right", tag)))
        sides.append("right")
    if dl is not None and dr is not None:
        view_terms.append(_join_deltas(dl, dr, keys, True))
    if view_terms:
        dv = view_terms[0]
        for t in view_terms[1:]:
            dv = dv.unionByName(t)
        staged.append((dv, _delta_dir(path, "view", tag)))
        sides.append("view")
    if staged:
        _write_staged(staged)
    _write_marker(
        path, base_seq + 1, tag,
        {"keys": keys, "sides": sides, "zset": True},
    )
    if compact_after is not None and len(_visible_tags(path)) > compact_after:
        compact_join_view(spark, path)
    return True
