"""Approximate heavy hitters (SpaceSaving) over corpus n-grams — the
bounded-state sketch twin of ``text.top_ngrams`` (whose exact
aggregation shuffles every distinct n-gram).  Same design discipline
as DGIM (SURVEY §7.6): per-partition partial sketches with a proven
error envelope, merged in one sketch-sized reduction.

Scale shape: phase 1 runs one SpaceSaving sketch of ``capacity``
counters PER PARTITION inside ``mapInPandas`` (state is O(capacity),
input is streamed through in Arrow batches, nothing is retained per
row).  Phase 2 merges the P×capacity partial counters on a single
task — sketch-sized data, the same shape as a 1000-executor
tree-reduce.  The full n-gram frequency table never materializes and
never shuffles, which is the whole point at 100 TB (the exact path's
shuffle grows with the distinct-ngram count; the sketch's is fixed).

Guarantees (standard SpaceSaving + mergeable-summaries bounds, kept
honest in the output columns):

- per partition i: for a sketched item, ``est - err ≤ true_i ≤ est``;
  an item absent from sketch i has ``true_i ≤ min_i`` (the sketch's
  smallest counter; 0 if the sketch never filled).
- merged: ``lower = Σ_{i: x∈S_i} (est_i - err_i)`` and
  ``upper = Σ_{i: x∈S_i} est_i + Σ_{i: x∉S_i} min_i`` bracket the true
  global count, and every item with true count > Σ_i min_i is present.

The stateful fold is not ANSI-SQL-expressible in general, but BELOW
capacity SpaceSaving never evicts (err = 0, min_count = 0), so the
bounds collapse to the exact counts — the driver oracle runs the
entry query at capacity 4096 (≫ the corpus' ~931 distinct bigrams)
and hash-checks it against the exact top-k SQL, while tests pin the
eviction/bound behavior at the production capacity against
``top_ngrams``: bounds must bracket the truth and the completeness
threshold must hold for any partitioning.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CAPACITY = 256
TOP_K = 20
# fixed sketch fan-out: per-shard est/err bounds depend on the
# sharding, so this must NOT track the machine's core count
N_SHARDS = 32


class SpaceSaving:
    """Classic SpaceSaving: ``capacity`` (count, err) counters.

    Evictions pick the min-count item with a deterministic
    lexicographic tie-break (identical inputs ⇒ identical sketches).
    A count→items bucket index keeps eviction amortized O(1) instead
    of scanning all counters per evict (min counts only ever grow in
    SpaceSaving, so the lazily-advanced ``_mn`` cursor never moves
    backwards) — this is the hot loop of the whole operator."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.counters: dict[str, tuple[int, int]] = {}
        self._buckets: dict[int, set] = {}
        self._mn = 1

    @classmethod
    def from_counters(
        cls, capacity: int, counters: dict[str, tuple[int, int]]
    ) -> "SpaceSaving":
        """Restore a sketch from serialized (count, err) counters
        (the streaming state-store path)."""
        ss = cls(capacity)
        ss.counters = dict(counters)
        ss._rebuild_index()
        return ss

    def _rebuild_index(self) -> None:
        self._buckets = {}
        self._mn = 1
        for item, (c, _) in self.counters.items():
            self._buckets.setdefault(c, set()).add(item)

    def add(self, item: str) -> None:
        c = self.counters.get(item)
        if c is not None:
            cnt, err = c
            self.counters[item] = (cnt + 1, err)
            b = self._buckets.get(cnt)
            if b is not None:
                b.discard(item)
                if not b:
                    del self._buckets[cnt]
            self._buckets.setdefault(cnt + 1, set()).add(item)
        elif len(self.counters) < self.capacity:
            self.counters[item] = (1, 0)
            self._buckets.setdefault(1, set()).add(item)
            self._mn = 1
        else:
            while self._mn not in self._buckets:
                self._mn += 1
            bucket = self._buckets[self._mn]
            victim = min(bucket)
            bucket.discard(victim)
            if not bucket:
                del self._buckets[self._mn]
            m = self.counters.pop(victim)[0]
            self.counters[item] = (m + 1, m)
            self._buckets.setdefault(m + 1, set()).add(item)

    @property
    def min_count(self) -> int:
        if len(self.counters) < self.capacity:
            return 0
        while self._mn not in self._buckets:
            self._mn += 1
        return self._mn


def _ngram_col(n: int) -> F.Column:
    pat = r"(?<![^ ])(?=(" + r" ".join([r"[^ ]+"] * n) + r"))"
    return F.explode(
        F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(1))
    ).alias("ngram")


def heavy_hitters_ngrams(
    documents: DataFrame,
    n: int = 2,
    capacity: int = CAPACITY,
    k: int = TOP_K,
) -> DataFrame:
    """Top-``k`` n-grams by SpaceSaving upper bound:
    (ngram, est_lower, est_upper), ordered by est_upper desc, ngram.

    The documents are hash-repartitioned on doc_id before the sketch
    phase: a small corpus can arrive as ONE file split, which would
    serialize the whole per-item fold into a single task.  On a real
    cluster the input already has many splits and AQE may coalesce
    this exchange away; the shuffle moves documents (narrow rows),
    never the exploded n-grams.  The shard count is a FIXED constant
    (like the streaming twin's N_SHARDS), not defaultParallelism —
    per-partition est/err bounds depend on the sharding, and a fixed
    fan-out keeps the sketch output identical across machines."""
    grams = documents.repartition(N_SHARDS, "doc_id").select(_ngram_col(n))

    def sketch_partition(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        ss = SpaceSaving(capacity)
        seen = False
        for pdf in batches:
            seen = True
            for g in pdf["ngram"]:
                ss.add(g)
        if not seen:
            return
        pid = TaskContext.get().partitionId()
        items = sorted(ss.counters.items())
        yield pd.DataFrame(
            {
                "sketch_id": pd.Series([pid] * len(items), dtype="int64"),
                "ngram": [g for g, _ in items],
                "est": pd.Series([c for _, (c, _) in items], dtype="int64"),
                "err": pd.Series([e for _, (_, e) in items], dtype="int64"),
                "min_count": pd.Series(
                    [ss.min_count] * len(items), dtype="int64"
                ),
            }
        )

    partials = grams.mapInPandas(
        sketch_partition,
        "sketch_id bigint, ngram string, est bigint, err bigint, "
        "min_count bigint",
    )

    def merge_all(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        frames = [pdf for pdf in batches if len(pdf)]
        if not frames:
            return
        allp = pd.concat(frames, ignore_index=True)
        mins = allp.groupby("sketch_id")["min_count"].first()
        total_min = int(mins.sum())
        by_item = allp.groupby("ngram")
        lower = (by_item["est"].sum() - by_item["err"].sum()).clip(lower=0)
        # absent-sketch slack: the mins of the sketches that did NOT
        # contain the item
        present_min = allp.groupby("ngram")["min_count"].sum()
        upper = by_item["est"].sum() + (total_min - present_min)
        out = pd.DataFrame(
            {
                "ngram": lower.index,
                "est_lower": lower.astype("int64").values,
                "est_upper": upper.astype("int64").values,
            }
        ).sort_values(
            ["est_upper", "ngram"], ascending=[False, True]
        ).head(k)
        yield out.reset_index(drop=True)

    return (
        partials.repartition(1)
        .mapInPandas(
            merge_all, "ngram string, est_lower bigint, est_upper bigint"
        )
    )


# ----------------------------------------------------------------------
# Count-Min Sketch — the linear point-query sketch (Cormode &
# Muthukrishnan 2005), complementing SpaceSaving's top-k: CMS answers
# "how often did THIS key occur" with one-sided error in fixed space.
# ----------------------------------------------------------------------

CMS_WIDTH = 2048
CMS_DEPTH = 3


def _cms_cell(col, j: int, width: int):
    # xxhash64 with per-row seed j; pmod keeps the cell non-negative
    return F.pmod(F.xxhash64(col, F.lit(j)), F.lit(width))


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Build the sketch as a (row j, cell, cnt) table — CMS is LINEAR,
    so the build is nothing but a keyed aggregation: each input row
    increments ``depth`` cells, map-side combine collapses them, and
    the result is ≤ depth·width rows regardless of input size.
    Merging two sketches (cross-partition, cross-batch, cross-day) is
    a unionByName + re-sum of the same tiny table — no custom state,
    no UDF, pure JVM expressions (seeded xxhash64).

    Guarantee (standard CMS): for any key,
    ``exact ≤ estimate ≤ exact + ε·N`` with probability ≥ 1−δ over
    the hash draw, where ε = e/width and δ = e^-depth; here the hash
    seeds are FIXED (0..depth−1) so results are deterministic and the
    one-sided ``estimate ≥ exact`` bound is unconditional."""
    rows = df.select(F.col(key_col).alias("_k"))
    parts = [
        rows.select(
            F.lit(j).alias("j"), _cms_cell(F.col("_k"), j, width).alias("cell")
        )
        for j in range(depth)
    ]
    allcells = parts[0]
    for p in parts[1:]:
        allcells = allcells.unionByName(p)
    return allcells.groupBy("j", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point-query the sketch for every row of ``keys``: estimate =
    min over the ``depth`` rows of the key's cell counts (a missing
    cell reads 0 — the key was never seen).  One keyed equi-join of
    the (|keys|·depth)-row probe table against the sketch (broadcast:
    the sketch is ≤ depth·width rows by construction).

    Output: ``key_col, est`` (BIGINT, est ≥ exact always)."""
    probe = keys.select(F.col(key_col)).distinct()
    cells = probe.select(
        key_col,
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("j"),
                    _cms_cell(F.col(key_col), j, width).alias("cell"),
                )
                for j in range(depth)
            ])
        ).alias("jc"),
    ).select(key_col, F.col("jc.j").alias("j"), F.col("jc.cell").alias("cell"))
    return (
        cells.join(F.broadcast(sketch), ["j", "cell"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce("cnt", F.lit(0)))
            .cast("bigint")
            .alias("est")
        )
    )
