"""Windowed aggregation operators — the heart of the reference.

Reference parity (SURVEY.md §2.3):
- tumbling window TVF  → ``groupBy(window(ts, size))``        (W1/W3)
- hopping window TVF   → ``groupBy(window(ts, size, slide))`` (W2)
- DGIM custom aggregate (W5-W12) in three Spark shapes:
    * ``*_dgim``            — ``applyInPandas`` whole-window replay
      (mirrors the PyFlink COLLECT+UDF job, reference ``job.py:170-184``)
    * ``*_dgim_collect``    — ``collect_list(struct)`` + scalar UDF
      (literal W13/W14 mapping)
    * ``*_dgim_two_phase``  — map-side partial sketches via
      ``mapInPandas`` + one shuffle of O(log²N) sketch state, merged
      with ``DGIM.merge`` (W11).  This is the 100 TB shape: the full
      rows never shuffle, only (window, sketch) pairs do.

All windows are event-time on the ``ts`` column (SURVEY §7.0: the
reference's ``PROCTIME()`` is nondeterministic; event time is
canonical).  Bits derive from ``event_id % 2`` per FIXTURES.md §F3.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from flink_window_dgim_traffic_spark.dgim import DGIM, MODE_JAVA

# Spark datetime pattern ↔ strftime used for golden/oracle string output
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_PY = "%Y-%m-%d %H:%M:%S"


def with_bit(events: DataFrame) -> DataFrame:
    """FIXTURES.md bit-derivation convention: ``bit = event_id % 2``."""
    return events.withColumn(
        "bit", F.pmod(F.col("event_id"), F.lit(2)).cast("int")
    )


# ----------------------------------------------------------------------
# exact windowed counts (the oracle-checkable twins of the DGIM ops)
# ----------------------------------------------------------------------
def tumble_exact(events: DataFrame, size_sec: int = 60) -> DataFrame:
    """60 s tumbling count of 1-bits (exact twin of W5; W1 window)."""
    return (
        with_bit(events)
        .groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(
            F.sum("bit").cast("bigint").alias("ones_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("window_end"),
            "ones_exact",
            "n_rows",
        )
    )


def hop_exact(
    events: DataFrame, size_sec: int = 60, slide_sec: int = 10
) -> DataFrame:
    """Hopping (HOP/sliding) exact count; each row lands in
    size/slide overlapping windows (W2)."""
    return (
        with_bit(events)
        .groupBy(
            F.window("ts", f"{size_sec} seconds", f"{slide_sec} seconds").alias("w")
        )
        .agg(
            F.sum("bit").cast("bigint").alias("ones_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("window_end"),
            "ones_exact",
            "n_rows",
        )
    )


# ----------------------------------------------------------------------
# DGIM windowed estimate — collect_list + VECTORIZED replay UDF
# ----------------------------------------------------------------------
def _dgim_window_cols(events: DataFrame, size_sec: int) -> DataFrame:
    return with_bit(events).select(
        F.window("ts", f"{size_sec} seconds").getItem("end").alias("we"),
        "bit",
        F.unix_timestamp("ts").alias("ts_sec"),
    )


def _replay_pairs_udf(size_sec: int, mode: str):
    """Vectorized (Arrow-batched) whole-window replay: one Python
    invocation per batch of windows, not per window — per-group
    applyInPandas overhead dominates wall time at many-small-windows
    shape, so it is avoided everywhere.

    Expects the pair list pre-sorted by (ts_sec, bit) — the caller
    sorts JVM-side with ``sort_array`` (same estimate: same-timestamp
    1-bit inserts commute, 0-bits are no-ops, so only the ts order
    matters and that is preserved)."""

    @pandas_udf("bigint")
    def est(pairs: pd.Series) -> pd.Series:
        def one(lst) -> int:
            sk = DGIM(size_sec, mode=mode)
            # pairs arrive ts-sorted (caller sort_array), so the
            # closed-form bulk insert applies (r13; exact-equivalence
            # property-pinned in tests/test_dgim_bulk.py)
            sk.bulk_add_ones(
                [int(p["ts_sec"]) for p in lst if p["bit"] == 1]
            )
            return sk.estimate()

        return pairs.map(one)

    return est


def _sorted_pairs():
    """JVM-side per-window sort of the collected (ts_sec, bit) structs
    — replaces a Python ``sorted()`` per window in the replay UDF."""
    return F.sort_array(F.collect_list(F.struct("ts_sec", "bit")))


def tumble_dgim(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """DGIM estimate per tumbling window + exact twin column.

    ``collect_list(struct)`` per window (the Spark shape of the
    reference's MULTISET ``COLLECT``, SURVEY §3.3) + a vectorized
    Pandas-UDF replay.  A pathologically hot window concentrates in
    one task here — ``tumble_dgim_two_phase`` is the bounded-shuffle
    shape for that case."""
    return (
        _dgim_window_cols(events, size_sec)
        .groupBy("we")
        .agg(
            _sorted_pairs().alias("pairs"),
            F.sum("bit").cast("bigint").alias("exact_count"),
        )
        .select(
            F.date_format("we", TS_FMT_SPARK).alias("window_end"),
            _replay_pairs_udf(size_sec, mode)("pairs").alias("count_estimate"),
            "exact_count",
        )
    )


def tumble_dgim_collect(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """Literal W13/W14 mapping: ``collect_list(struct(bit, ts))`` per
    window + row-at-a-time scalar UDF replay with parse tolerance
    (reference ``job.py:175-184``).  Kept for parity with the PyFlink
    job; the vectorized ``tumble_dgim`` is the fast path."""

    @F.udf("bigint")
    def dgim_est(pairs):
        sk = DGIM(size_sec, mode=mode)
        for p in sorted(pairs, key=lambda r: r["ts_sec"]):
            sk.add_bit(p["bit"], p["ts_sec"])
        return sk.estimate()

    return (
        _dgim_window_cols(events, size_sec)
        .groupBy("we")
        .agg(F.collect_list(F.struct("bit", "ts_sec")).alias("pairs"))
        .select(
            F.date_format("we", TS_FMT_SPARK).alias("window_end"),
            dgim_est("pairs").alias("count_estimate"),
        )
    )


def hop_dgim(
    events: DataFrame,
    size_sec: int = 60,
    slide_sec: int = 10,
    mode: str = MODE_JAVA,
) -> DataFrame:
    """DGIM estimate per hopping window (reference sliding job,
    ``SlidingWindowStreamingJob.java:92-111``) + exact twin, same
    vectorized-replay shape as tumble_dgim."""
    w = F.window("ts", f"{size_sec} seconds", f"{slide_sec} seconds")
    ev = with_bit(events).select(
        w.alias("w"), "bit", F.unix_timestamp("ts").alias("ts_sec")
    )
    return (
        ev.select(
            F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "bit", "ts_sec"
        )
        .groupBy("ws", "we")
        .agg(
            _sorted_pairs().alias("pairs"),
            F.sum("bit").cast("bigint").alias("exact_count"),
        )
        .select(
            F.date_format("ws", TS_FMT_SPARK).alias("window_start"),
            F.date_format("we", TS_FMT_SPARK).alias("window_end"),
            _replay_pairs_udf(size_sec, mode)("pairs").alias("count_estimate"),
            "exact_count",
        )
    )


# ----------------------------------------------------------------------
# DGIM fast path: the DGIM_ESTIMATE → g(sum(bit)) logical rewrite
# ----------------------------------------------------------------------
def _count_est_udf(mode: str):
    """Arrow-batched lookup ``ones → g(ones)`` (dgim.count_estimate_table)."""

    @pandas_udf("bigint")
    def g(ones: pd.Series) -> pd.Series:
        import numpy as np

        from flink_window_dgim_traffic_spark.dgim import count_estimate_table

        n = ones.fillna(0).to_numpy(dtype="int64")
        hi = int(n.max()) if len(n) else 0
        tab = np.asarray(count_estimate_table(hi, mode), dtype="int64")
        return pd.Series(tab[n])

    return g


def tumble_dgim_fast(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """Optimizer fast path for the reference's tumbling DGIM query
    (SURVEY.md §4 anticipates exactly this rewrite): horizon == window
    size ⇒ every in-window bit is within the horizon of the newest bit
    ⇒ no bucket ever expires ⇒ the compaction cascade depends only on
    the 1-bit count ⇒ ``DGIM_ESTIMATE ≡ g(sum(bit))``.

    The whole plan is JVM-side (scan → map-side partial sum → shuffle
    of tiny (window, count) pairs → final sum); Python is one memoized
    table lookup per output row.  Result is *identical* to
    :func:`tumble_dgim` replay (asserted in tests), at exact-count
    cost — the 100 TB shape for this query family."""
    return (
        with_bit(events)
        .groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(F.sum("bit").cast("bigint").alias("exact_count"))
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("window_end"),
            _count_est_udf(mode)(F.col("exact_count")).alias("count_estimate"),
            "exact_count",
        )
    )


def tumble_dgim_bound(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """DGIM error-bound surface (VERDICT r01 §next-round 4): per
    tumbling window emit the estimate NEXT TO its exact count, the
    absolute/relative error, and the bound check — the reference's
    ``C/2 ≤ E ≤ 3C/2`` guarantee (``DGIMAccumulator.java:76-87``,
    halved-oldest-bucket argument) as a queryable column instead of a
    test-only assertion.

    The estimate is the replay-equivalent ``g(sum(bit))`` fast path
    (see :func:`tumble_dgim_fast`); the DuckDB oracle recomputes it
    from the *closed form* (``dgim.count_estimate_closed``), so the
    hash check anchors the estimate VALUES of the whole DGIM family
    against an independent engine: oracle ⇔ closed form ⇔ memoized
    table (property test) ⇔ sketch replay (equality tests) ⇔ the
    two-phase merge path (bound tests).

    ``rel_err`` is a single IEEE-754 division of two exact integers
    (no rounding step — bit-identical across engines, unlike
    ``round(x, 6)`` whose HALF_UP/HALF_EVEN difference bites exactly
    when ``exact`` is a power of two)."""
    est = _count_est_udf(mode)(F.col("exact_count"))
    return (
        with_bit(events)
        .groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(F.sum("bit").cast("bigint").alias("exact_count"))
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("window_end"),
            est.alias("count_estimate"),
            "exact_count",
        )
        .withColumn(
            "abs_err",
            F.abs(F.col("count_estimate") - F.col("exact_count")).cast("bigint"),
        )
        .withColumn(
            "rel_err",
            F.col("abs_err").cast("double")
            / F.greatest(F.col("exact_count"), F.lit(1)).cast("double"),
        )
        .withColumn(
            "within_bound", F.col("abs_err") * 2 <= F.col("exact_count")
        )
    )


def tumble_dgim_by_user_fast(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """Keyed sketch: one DGIM estimate per (user, window) — the shape
    a real deployment uses (per-interface / per-host counters; the
    reference only aggregates globally).  Same ``g(sum(bit))`` rewrite
    as :func:`tumble_dgim_fast`, with the key as an extra group
    column; at scale this is a single shuffle on (window, user)."""
    return (
        with_bit(events)
        .groupBy(
            F.window("ts", f"{size_sec} seconds").alias("w"), F.col("user_id")
        )
        .agg(F.sum("bit").cast("bigint").alias("exact_count"))
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("window_end"),
            "user_id",
            _count_est_udf(mode)(F.col("exact_count")).alias("count_estimate"),
            "exact_count",
        )
    )


def hop_dgim_fast(
    events: DataFrame,
    size_sec: int = 60,
    slide_sec: int = 10,
    mode: str = MODE_JAVA,
) -> DataFrame:
    """Same ``DGIM_ESTIMATE → g(sum(bit))`` rewrite over hopping
    windows; the size/slide explode happens inside Spark's native
    ``window()`` generator, never in Python.  Identical output to
    :func:`hop_dgim` (asserted in tests)."""
    return (
        with_bit(events)
        .groupBy(
            F.window("ts", f"{size_sec} seconds", f"{slide_sec} seconds").alias("w")
        )
        .agg(F.sum("bit").cast("bigint").alias("exact_count"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias("window_start"),
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias("window_end"),
            _count_est_udf(mode)(F.col("exact_count")).alias("count_estimate"),
            "exact_count",
        )
    )


# ----------------------------------------------------------------------
# DGIM two-phase: map-side partial sketches + sketch-only shuffle
# ----------------------------------------------------------------------
def _phase1_fn(key_cols: list, size_sec: int, mode: str):
    """Per-partition partial sketches: one ``(key, flat-sketch, ones,
    nrows)`` row per distinct key in the partition.  Sort-based single
    pass — pandas ``groupby`` materializes a sub-frame per group,
    which is pathological when most groups hold ~1 row (sparse
    windows)."""

    def phase1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        sketches: dict = {}
        counters: dict = {}
        for pdf in batches:
            pdf = pdf.sort_values([*key_cols, "ts_sec"], kind="mergesort")
            key_arrs = [pdf[k].to_numpy() for k in key_cols]
            bits = pdf["bit"].to_numpy()
            tss = pdf["ts_sec"].to_numpy()
            n = len(pdf)
            if n == 0:
                continue
            # contiguous key runs (the sort made them contiguous);
            # each run feeds the sketch through the closed-form bulk
            # insert — O(log n) per run instead of a per-row Python
            # loop (r13; equivalence pinned in tests/test_dgim_bulk.py)
            change = np.zeros(n, dtype=bool)
            change[0] = True
            for a in key_arrs:
                change[1:] |= a[1:] != a[:-1]
            starts = np.flatnonzero(change)
            ends = np.append(starts[1:], n)
            for s, e in zip(starts, ends):
                key = tuple(a[s] for a in key_arrs)
                sk = sketches.get(key)
                if sk is None:
                    sk = sketches[key] = DGIM(size_sec, mode=mode)
                    counters[key] = [0, 0]
                cnt = counters[key]
                seg = tss[s:e][bits[s:e] == 1]
                sk.bulk_add_ones(seg)
                cnt[0] += len(seg)
                cnt[1] += int(e - s)
        if sketches:
            keys = list(sketches.keys())
            out = {kc: [k[i] for k in keys] for i, kc in enumerate(key_cols)}
            out["flat"] = [sk.to_flat() for sk in sketches.values()]
            out["ones"] = [c[0] for c in counters.values()]
            out["nrows"] = [c[1] for c in counters.values()]
            yield pd.DataFrame(out)

    return phase1


def _merge_est_udf(size_sec: int, mode: str):
    """Arrow-batched final merge: fold each window's partial sketches
    with ``DGIM.merge`` (W11) and estimate.  Single-partial windows
    (the common case for sparse data) skip the merge entirely."""

    @pandas_udf("bigint")
    def merge_est(flats: pd.Series) -> pd.Series:
        def one(lst) -> int:
            acc = DGIM.from_flat(size_sec, list(lst[0]), mode=mode)
            for flat in lst[1:]:
                acc.merge(DGIM.from_flat(size_sec, list(flat), mode=mode))
            return acc.estimate()

        return flats.map(one)

    return merge_est


def _spread(ev: DataFrame) -> DataFrame:
    # local parquet often arrives as a single partition; spread phase 1
    # across cores (on a real cluster the source is already split)
    par = ev.sparkSession.sparkContext.defaultParallelism
    if ev.rdd.getNumPartitions() < par:
        ev = ev.repartition(par)
    return ev


def _two_phase(
    ev: DataFrame, key_cols: list, out_cols: list, size_sec: int, mode: str
) -> DataFrame:
    """Generic two-phase DGIM over pre-assigned windows.  ``ev`` must
    have ``key_cols`` (timestamps) + ``bit`` + ``ts_sec``; output has
    ``out_cols`` (formatted strings) + estimate/exact/n_rows."""
    key_schema = ", ".join(f"{k} timestamp" for k in key_cols)
    partials = _spread(ev).mapInPandas(
        _phase1_fn(key_cols, size_sec, mode),
        f"{key_schema}, flat array<bigint>, ones bigint, nrows bigint",
    )
    return (
        partials.groupBy(*key_cols)
        .agg(
            F.collect_list("flat").alias("flats"),
            F.sum("ones").alias("exact_count"),
            F.sum("nrows").alias("n_rows"),
        )
        .select(
            *[
                F.date_format(kc, TS_FMT_SPARK).alias(oc)
                for kc, oc in zip(key_cols, out_cols)
            ],
            _merge_est_udf(size_sec, mode)("flats").alias("count_estimate"),
            F.col("exact_count").cast("bigint").alias("exact_count"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
        )
    )


def tumble_dgim_two_phase(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """Distributed DGIM the way the reference's ``merge`` intends
    (``DGIMAccumulator.java:96-115``): phase 1 builds one sketch per
    (input partition × window) with ``mapInPandas`` — no shuffle of raw
    rows; phase 2 shuffles only the flattened O(log²N) sketches and
    merges them per window.  At 100 TB this shuffles megabytes, not
    terabytes."""
    ev = _dgim_window_cols(events, size_sec)
    return _two_phase(ev, ["we"], ["window_end"], size_sec, mode)


def hop_dgim_two_phase(
    events: DataFrame,
    size_sec: int = 60,
    slide_sec: int = 10,
    mode: str = MODE_JAVA,
) -> DataFrame:
    """Two-phase DGIM over hopping windows with **pane sharing** (the
    classic panes optimization for overlapping windows): phase 1
    builds one partial sketch per (input partition × slide-aligned
    pane) — each raw row is touched exactly ONCE, with no size/slide
    row explode; phase 2 fans each pane sketch out to the size/slide
    hop windows that contain it (sketch-sized rows only, integer µs
    arithmetic identical to the oracle's generate_series) and merges
    per window (W11).  At 100 TB the shuffle volume is
    panes × O(log²N) regardless of the window-overlap factor; the 6×
    multiplication happens after the data is already sketch-sized."""
    if size_sec % slide_sec != 0:
        raise ValueError("size_sec must be a multiple of slide_sec")
    s_us, l_us = size_sec * 1_000_000, slide_sec * 1_000_000
    ev = with_bit(events).select(
        F.expr(f"unix_micros(ts) DIV {l_us} * {l_us}").alias("pane_us"),
        "bit",
        F.unix_timestamp("ts").alias("ts_sec"),
    )

    partials = _spread(ev).mapInPandas(
        _phase1_fn(["pane_us"], size_sec, mode),
        "pane_us bigint, flat array<bigint>, ones bigint, nrows bigint",
    )
    # windows [ws, ws+size) containing pane [p, p+slide):
    # ws ∈ {p - size + slide, ..., p} stepping by slide
    fanned = partials.withColumn(
        "ws_us",
        F.explode(
            F.sequence(
                F.col("pane_us") - F.lit(s_us - l_us),
                F.col("pane_us"),
                F.lit(l_us),
            )
        ),
    )
    return (
        fanned.groupBy("ws_us")
        .agg(
            F.collect_list("flat").alias("flats"),
            F.sum("ones").alias("exact_count"),
            F.sum("nrows").alias("n_rows"),
        )
        .select(
            F.date_format(
                F.timestamp_micros(F.col("ws_us")), TS_FMT_SPARK
            ).alias("window_start"),
            F.date_format(
                F.timestamp_micros(F.col("ws_us") + s_us), TS_FMT_SPARK
            ).alias("window_end"),
            _merge_est_udf(size_sec, mode)("flats").alias("count_estimate"),
            F.col("exact_count").cast("bigint").alias("exact_count"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
        )
    )


def _two_phase_bound_cols(df: DataFrame) -> DataFrame:
    """Replace a two-phase DGIM estimate column with its BOUND VERDICT
    so the output is DuckDB-hashable (r11, VERDICT r10 ask #1): the
    merged-sketch estimate deviates from the sequential closed form
    (deliberate commutative-merge total-order deviation, dgim.py
    header) so its VALUE has no SQL twin, but the reference's
    ``C/2 ≤ E ≤ 3C/2`` guarantee (``DGIMAccumulator.java:76-87``) must
    still hold — asserted since round 1 in tests as
    ``exact/2 − 1 ≤ est ≤ 1.5·exact + 1``.  Emit that inequality in
    exact INTEGER arithmetic as ``within_bound`` next to the exact
    count; the oracle recomputes the exact count and claims TRUE, so a
    merge-path regression breaks the hash."""
    return df.select(
        *[c for c in df.columns if c != "count_estimate"],
        (
            (F.col("count_estimate") * 2 >= F.col("exact_count") - 2)
            & (F.col("count_estimate") * 2 <= F.col("exact_count") * 3 + 2)
        ).alias("within_bound"),
    )


def tumble_dgim_two_phase_bound(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """Bound anchor for :func:`tumble_dgim_two_phase` — same plan
    (partition-local sketches, sketch-only shuffle, per-window merge),
    output ``(window_end, exact_count, n_rows, within_bound)`` with
    the estimate folded into the C/2..3C/2 verdict
    (:func:`_two_phase_bound_cols`) so the DISTRIBUTED merge path gets
    a full DuckDB hash check instead of rows-only."""
    return _two_phase_bound_cols(
        tumble_dgim_two_phase(events, size_sec, mode)
    )


def hop_dgim_two_phase_bound(
    events: DataFrame,
    size_sec: int = 60,
    slide_sec: int = 10,
    mode: str = MODE_JAVA,
) -> DataFrame:
    """Bound anchor for :func:`hop_dgim_two_phase` (pane-sharing
    two-phase hop DGIM) — the C/2..3C/2 verdict next to the exact
    count, full hash check for the fan-out + merge path."""
    return _two_phase_bound_cols(
        hop_dgim_two_phase(events, size_sec, slide_sec, mode)
    )


def windowed_distinct_users_approx_bound(
    events: DataFrame, size_sec: int = 60, rsd: float = 0.02
) -> DataFrame:
    """Bound anchor for :func:`windowed_distinct_users_approx` (HLL++
    per-window distinct): emit the EXACT count (SQL-recomputable) next
    to ``within_bound`` — the approx estimate within ``3·rsd``
    relative error or ±2 absolute (small windows sit in HLL++'s
    sparse/linear-counting regime where the estimate is exact; the ±2
    slack keeps the verdict integer-robust).  Integer arithmetic:
    ``1000·|approx − exact| ≤ 3000·rsd·exact`` avoids any float round
    step, so the boolean hashes identically in both engines.  Same
    single sketch-per-window aggregation plan as the approx twin —
    the verdict costs one extra exact-distinct aggregation, which is
    precisely the oracle anchor."""
    tol_permille = int(3000 * rsd)
    return (
        events.groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("approx"),
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias(
                "window_end"
            ),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            (
                (
                    F.abs(F.col("approx") - F.col("n_users")) * 1000
                    <= F.col("n_users") * tol_permille
                )
                | (F.abs(F.col("approx") - F.col("n_users")) <= 2)
            ).alias("within_bound"),
        )
    )


def cumulate_exact(
    events: DataFrame, max_size_sec: int = 60, step_sec: int = 10
) -> DataFrame:
    """CUMULATE window TVF (the fourth member of the Flink SQL window
    family next to TUMBLE/HOP/SESSION — the reference uses the first
    two, ``StreamingJob.java:85``/``SlidingWindowStreamingJob.java:104``;
    this completes the family): windows share a start aligned to
    ``max_size_sec`` and grow by ``step_sec`` — span ``[W, W+max)``
    emits ``[W, W+step), [W, W+2·step), …, [W, W+max)``, so each
    record lands in every cumulative window of its span whose end is
    past its timestamp.

    Pure JVM expressions: the per-record window-end list is a
    ``sequence``+``explode`` (≤ max/step rows per record, same
    expansion HOP already pays), then one partially-aggregated
    shuffle on (window_start, window_end).  Streaming twin: identical
    plan over ``readStream`` with a watermark, update mode."""
    e = with_bit(events).select(
        "bit", F.unix_timestamp("ts").alias("es")
    )
    ws = (F.floor(F.col("es") / max_size_sec) * max_size_sec).cast(
        "bigint"
    )
    first_end = (
        ws
        + (F.floor((F.col("es") - ws) / step_sec) + 1) * step_sec
    ).cast("bigint")
    ends = F.sequence(
        first_end,
        (ws + F.lit(max_size_sec)).cast("bigint"),
        F.lit(step_sec).cast("bigint"),
    )
    return (
        e.select("bit", ws.alias("ws"), F.explode(ends).alias("we"))
        .groupBy("ws", "we")
        .agg(
            F.sum("bit").cast("bigint").alias("ones_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("ws")), TS_FMT_SPARK
            ).alias("window_start"),
            F.date_format(
                F.timestamp_seconds(F.col("we")), TS_FMT_SPARK
            ).alias("window_end"),
            "ones_exact",
            "n_rows",
        )
    )


def cumulate_dgim(
    events: DataFrame,
    max_size_sec: int = 60,
    step_sec: int = 10,
    mode: str = MODE_JAVA,
) -> DataFrame:
    """DGIM estimate per CUMULATE window (the sketch the reference
    runs over TUMBLE/HOP — ``StreamingJob.java:82-94`` — composed with
    the fourth window kind): each cumulative window ``[ws, we)``
    replays its rows into a ``DGIM(max_size_sec)`` exactly as the
    incremental stream job's accumulator would hold them at ``we``,
    plus the exact twin column that anchors the estimate in tests.
    Same vectorized whole-window replay shape as :func:`tumble_dgim`;
    the explode multiplies rows by ≤ max/step like HOP already does,
    and only (window, pairs) groups shuffle."""
    e = with_bit(events).select(
        "bit",
        F.unix_timestamp("ts").alias("ts_sec"),
    )
    ws = (F.floor(F.col("ts_sec") / max_size_sec) * max_size_sec).cast(
        "bigint"
    )
    first_end = (
        ws + (F.floor((F.col("ts_sec") - ws) / step_sec) + 1) * step_sec
    ).cast("bigint")
    ends = F.sequence(
        first_end,
        (ws + F.lit(max_size_sec)).cast("bigint"),
        F.lit(step_sec).cast("bigint"),
    )
    return (
        e.select(
            "bit", "ts_sec", ws.alias("ws"), F.explode(ends).alias("we")
        )
        .groupBy("ws", "we")
        .agg(
            _sorted_pairs().alias("pairs"),
            F.sum("bit").cast("bigint").alias("exact_count"),
        )
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("ws")), TS_FMT_SPARK
            ).alias("window_start"),
            F.date_format(
                F.timestamp_seconds(F.col("we")), TS_FMT_SPARK
            ).alias("window_end"),
            _replay_pairs_udf(max_size_sec, mode)("pairs").alias(
                "count_estimate"
            ),
            "exact_count",
        )
    )


def hop_dgim_bound(
    events: DataFrame,
    size_sec: int = 60,
    slide_sec: int = 10,
    mode: str = MODE_JAVA,
) -> DataFrame:
    """DGIM error-bound surface over HOPPING windows — the
    :func:`tumble_dgim_bound` anchor extended to the second window
    kind the reference runs the sketch over
    (``SlidingWindowStreamingJob.java:42-116``).  Within one full hop
    window nothing expires (max element age < size), so the replayed
    estimate equals the closed form ``g(sum(bit))`` and the DuckDB
    oracle can recompute the VALUE independently — this converts the
    hop-DGIM estimate from rows-only to hash-anchored.  Same
    ``rel_err`` no-rounding discipline as the tumble twin."""
    est = _count_est_udf(mode)(F.col("exact_count"))
    return (
        with_bit(events)
        .groupBy(
            F.window(
                "ts", f"{size_sec} seconds", f"{slide_sec} seconds"
            ).alias("w")
        )
        .agg(F.sum("bit").cast("bigint").alias("exact_count"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias(
                "window_start"
            ),
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias(
                "window_end"
            ),
            est.alias("count_estimate"),
            "exact_count",
        )
        .withColumn(
            "abs_err",
            F.abs(F.col("count_estimate") - F.col("exact_count")).cast(
                "bigint"
            ),
        )
        .withColumn(
            "rel_err",
            F.col("abs_err").cast("double")
            / F.greatest(F.col("exact_count"), F.lit(1)).cast("double"),
        )
        .withColumn(
            "within_bound", F.col("abs_err") * 2 <= F.col("exact_count")
        )
    )


def cumulate_dgim_bound(
    events: DataFrame,
    max_size_sec: int = 60,
    step_sec: int = 10,
    mode: str = MODE_JAVA,
) -> DataFrame:
    """DGIM error-bound surface over CUMULATE windows (VERDICT r8 ask
    #3): per cumulative window ``[ws, we)`` the estimate, the exact
    ones count, and the ``C/2 ≤ E ≤ 3C/2`` bound check.  A cumulative
    window spans at most ``max_size_sec`` — the sketch horizon — so no
    bucket expires inside one window and the replayed estimate of
    :func:`cumulate_dgim` equals the closed form ``g(sum(bit))``
    (asserted window-by-window in tests/test_dgim.py); the DuckDB
    oracle recomputes ``g`` from the exact count, hash-anchoring the
    cumulate estimate VALUES exactly like ``tumble_dgim_bound`` does
    for tumble."""
    e = with_bit(events).select(
        "bit", F.unix_timestamp("ts").alias("ts_sec")
    )
    ws = (
        F.floor(F.col("ts_sec") / max_size_sec) * max_size_sec
    ).cast("bigint")
    first_end = (
        ws + (F.floor((F.col("ts_sec") - ws) / step_sec) + 1) * step_sec
    ).cast("bigint")
    ends = F.sequence(
        first_end,
        (ws + F.lit(max_size_sec)).cast("bigint"),
        F.lit(step_sec).cast("bigint"),
    )
    est = _count_est_udf(mode)(F.col("exact_count"))
    return (
        e.select("bit", ws.alias("ws"), F.explode(ends).alias("we"))
        .groupBy("ws", "we")
        .agg(F.sum("bit").cast("bigint").alias("exact_count"))
        .select(
            F.date_format(
                F.timestamp_seconds(F.col("ws")), TS_FMT_SPARK
            ).alias("window_start"),
            F.date_format(
                F.timestamp_seconds(F.col("we")), TS_FMT_SPARK
            ).alias("window_end"),
            est.alias("count_estimate"),
            "exact_count",
        )
        .withColumn(
            "abs_err",
            F.abs(F.col("count_estimate") - F.col("exact_count")).cast(
                "bigint"
            ),
        )
        .withColumn(
            "rel_err",
            F.col("abs_err").cast("double")
            / F.greatest(F.col("exact_count"), F.lit(1)).cast("double"),
        )
        .withColumn(
            "within_bound", F.col("abs_err") * 2 <= F.col("exact_count")
        )
    )


def window_anomalies(
    events: DataFrame, size_sec: int = 60, k: int = 3
) -> DataFrame:
    """Anomalous-traffic-window detection — the monitoring query the
    reference's dashboards sit under (its jobs produce the per-window
    counts; this flags the windows worth alerting on): a tumbling
    window is anomalous when its 1-bit count deviates from the MEDIAN
    window count by more than ``k``× the median absolute deviation —
    the robust-statistics outlier rule (median/MAD shrugs off the
    very outliers a mean/stddev rule would absorb).

    Determinism: deviations and the MAD are quantized to exact 1e-6
    BIGINTs before the flag compare, so the boundary is bit-stable
    against the oracle.  Scale shape: one windowed aggregation over
    the stream of events (the tumble_exact plan), then TWO one-row
    percentile reductions over the windows table (windows ≪ events)
    broadcast back — no sort over events, no second scan."""
    w = tumble_exact(events, size_sec)
    med = w.agg(
        F.percentile("ones_exact", F.lit(0.5)).alias("med")
    )
    dev = (
        w.crossJoin(F.broadcast(med))
        .withColumn(
            "adev_e6",
            F.round(
                F.abs(F.col("ones_exact") - F.col("med")) * 1e6, 0
            ).cast("bigint"),
        )
    )
    mad = dev.agg(
        F.percentile(
            F.col("adev_e6").cast("double") / 1e6, F.lit(0.5)
        ).alias("mad")
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "window_end",
            "ones_exact",
            "adev_e6",
            (
                F.col("adev_e6")
                > F.lit(k) * F.round(F.col("mad") * 1e6, 0).cast("bigint")
            )
            .cast("bigint")
            .alias("is_anomaly"),
        )
    )


def window_topn(
    events: DataFrame, size_sec: int = 60, k: int = 3
) -> DataFrame:
    """Flink SQL "Window Top-N" (the reference ecosystem's
    per-window ranking query — ROW_NUMBER over a window TVF,
    ``rownum <= N``): per tumbling window, the top-``k`` users by
    event count, ranked count-desc with user_id tie-break.

    Output: (window_end, user_id, n_events, rnk).

    Scale shape: one partially-aggregated shuffle on (window, user)
    collapses events to the per-window user table; the rank then runs
    through :func:`relational.grouped_topk` — the lossless map-side
    partial top-k prune — so even a window holding millions of
    distinct users feeds the authoritative ROW_NUMBER at most
    k·partitions rows, never its full user set (output is identical
    to the plain one-window formulation, which grouped_topk's own
    tests pin)."""
    from flink_window_dgim_traffic_spark.operators.relational import (
        grouped_topk,
    )

    counts = (
        events.groupBy(
            F.window("ts", f"{size_sec} seconds").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias(
                "window_end"
            ),
            "user_id",
            "n_events",
        )
    )
    return grouped_topk(
        counts, ["window_end"], "n_events", k, tiebreak="user_id"
    ).select("window_end", "user_id", "n_events", "rnk")


def window_dedup(
    events: DataFrame,
    size_sec: int = 60,
    key_cols: tuple[str, ...] = ("user_id",),
    keep: str = "first",
) -> DataFrame:
    """Flink SQL "Window Deduplication" (the window-TVF companion of
    Window Top-N: ROW_NUMBER over a window TVF partitioned by key,
    ``rownum = 1``): per tumbling window and key, keep the FIRST (or
    LAST) row under the deterministic total order (event time,
    event_id).

    Output: (window_end, *key_cols, event_id, event_type, value).

    Scale shape: NOT a rank window — row_number=1 is an argmin, so
    one ``min_by``/``max_by`` over a struct ordering key does it in a
    single partially-aggregated shuffle on (window, key); ties are
    impossible because event_id joins the ordering.  A hot (window,
    key) group costs a map-side combine, never a per-group sort."""
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be first/last, got {keep!r}")
    us = F.unix_micros(F.col("ts"))
    ordc = F.struct(us.alias("us"), F.col("event_id").alias("i"))
    row = F.struct("event_id", "event_type", "value")
    pick = F.min_by(row, ordc) if keep == "first" else F.max_by(row, ordc)
    return (
        events.groupBy(
            F.window("ts", f"{size_sec} seconds").alias("w"), *key_cols
        )
        .agg(pick.alias("r"))
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias(
                "window_end"
            ),
            *key_cols,
            F.col("r.event_id").alias("event_id"),
            F.col("r.event_type").alias("event_type"),
            F.col("r.value").alias("value"),
        )
    )


def window_join(
    left: DataFrame,
    right: DataFrame,
    size_sec: int = 60,
    key_cols: tuple[str, ...] = ("user_id",),
    how: str = "inner",
    slide_sec: int | None = None,
    cumulate_step_sec: int | None = None,
) -> DataFrame:
    """Flink SQL "Window Join" (the last window-TVF companion op):
    join rows of two inputs that fall in the SAME tumbling window
    with equal keys — ``SELECT ... FROM TUMBLE(L) JOIN TUMBLE(R) ON
    l.window_start = r.window_start AND l.key = r.key``.  ``how``
    covers Flink's inner / left_semi / left_anti window-join modes
    (semi = "had a partner this window", anti = "had none" — the
    abandoned-browse shape).

    Output (inner): (window_end, *key_cols, l_event_id, r_event_id);
    semi/anti keep the left row's (window_end, *key_cols,
    l_event_id).

    Scale shape: the window start is a pure column (no TVF explode
    for tumble), so this is ONE equi-join on (key, window-slot) —
    shuffle-partitioned on exactly the keys Flink's window join
    hashes on; AQE handles a skewed (key, window) pair.  No
    time-range inequality (that is :func:`relational.asof_join` /
    interval join territory) — window alignment IS the equality.

    ``slide_sec`` switches to the HOP-window join (Flink window
    joins span all window TVFs): each row explodes into its
    ``size/slide`` covering slots first — constant per-row fan-out,
    map-side, before the same equi-join; ``wslot`` then counts in
    slide units.

    ``cumulate_step_sec`` switches to the CUMULATE-window join
    (completing the TVF coverage: tumble, hop, cumulate —
    :func:`cumulate_exact` defines the window set): ``size_sec``
    becomes the span and each row explodes into the ends of every
    cumulative window of its span that covers it (≤ span/step
    slots, map-side like hop); the window END is the join slot —
    it identifies the (span, end) pair uniquely because the span
    start is derivable from the end."""
    if how not in ("inner", "left_semi", "left_anti"):
        raise ValueError(
            f"how must be inner/left_semi/left_anti, got {how!r}"
        )
    if slide_sec is not None and cumulate_step_sec is not None:
        raise ValueError(
            "slide_sec and cumulate_step_sec are mutually exclusive"
        )
    size_us = int(size_sec) * 1_000_000
    if cumulate_step_sec is not None:
        if int(size_sec) % int(cumulate_step_sec):
            raise ValueError(
                "size_sec must be a multiple of cumulate_step_sec"
            )
        step_us = int(cumulate_step_sec) * 1_000_000

        def prep(df: DataFrame, side: str) -> DataFrame:
            base = df.select(
                *key_cols,
                F.col("event_id").alias(f"{side}_event_id"),
                F.expr(
                    f"unix_micros(ts) div {size_us} * {size_us}"
                ).alias("_ws"),
                F.expr("unix_micros(ts)").alias("_us"),
            )
            # ends of the covering cumulative windows: first end
            # strictly past the row's time, stepping to span end
            ends = F.sequence(
                F.expr(
                    f"_ws + ((_us - _ws) div {step_us} + 1)"
                    f" * {step_us}"
                ),
                F.expr(f"_ws + {size_us}"),
                F.lit(step_us).cast("bigint"),
            )
            return base.select(
                *key_cols,
                f"{side}_event_id",
                F.explode(ends).alias("wslot"),
            )

        wend = F.timestamp_micros(F.col("wslot"))
    else:
        if slide_sec is None:
            step = size_us
            n_panes = 1
        else:
            if int(size_sec) % int(slide_sec):
                raise ValueError(
                    "size_sec must be a multiple of slide_sec"
                )
            step = int(slide_sec) * 1_000_000
            n_panes = int(size_sec) // int(slide_sec)

        def prep(df: DataFrame, side: str) -> DataFrame:
            base = df.select(
                *key_cols,
                F.expr(f"unix_micros(ts) div {step}").alias("_pane"),
                F.col("event_id").alias(f"{side}_event_id"),
            )
            if n_panes == 1:
                return base.withColumnRenamed("_pane", "wslot")
            # hop explode: a row in pane p belongs to windows
            # STARTING at panes p-(n_panes-1) .. p; wslot = the
            # window's start pane
            return base.select(
                *key_cols,
                f"{side}_event_id",
                F.explode(
                    F.sequence(
                        F.col("_pane") - F.lit(n_panes - 1),
                        F.col("_pane"),
                    )
                ).alias("wslot"),
            )

        # window end = start + size (start pane × step + size)
        wend = F.timestamp_micros(F.col("wslot") * step + size_us)

    l = prep(left, "l")
    r = prep(right, "r")
    on = [*key_cols, "wslot"]
    if how == "inner":
        j = l.join(r, on)
        return j.select(
            F.date_format(wend, TS_FMT_SPARK).alias("window_end"),
            *key_cols,
            "l_event_id",
            "r_event_id",
        )
    # semi/anti need no distinct on the probe side — Spark's semi
    # join is already existential
    j = l.join(r.select(*on), on, how)
    return j.select(
        F.date_format(wend, TS_FMT_SPARK).alias("window_end"),
        *key_cols,
        "l_event_id",
    )


def ewma_anomaly(
    events: DataFrame,
    size_sec: int = 60,
    lookback: int = 20,
    factor: int = 2,
) -> DataFrame:
    """EWMA baseline anomaly flags over the tumbling window counts —
    the classic monitoring rule (current window count vs an
    exponentially-weighted moving average of its predecessors)
    alongside the median/MAD rule of :func:`window_anomalies`.

    ALL-INTEGER determinism via BINARY decay: with α = 1/2 the EWMA
    weight of the window ``lag`` steps back is 2^-lag, so scaling by
    2^lookback makes every weight an exact power-of-two BIGINT
    (``2^(lookback-lag)``).  ``num = Σ count·2^(lookback-lag)`` over
    the up-to-``lookback`` preceding windows and
    ``denom = 2^lookback − 2^(lookback-L)`` (L = history length) are
    exact integers, the anomaly test
    ``count·denom > factor·num`` is an integer multiply-compare, and
    the reported ``ewma_e6 = num·10^6 div denom`` is one floor
    division — bit-stable across engines with no IEEE accumulation
    anywhere (same recipe family as ``embedding_outliers``).

    The first window (no history) reports ewma_e6 = 0 and is never
    anomalous.  "Preceding windows" means preceding NON-EMPTY windows
    (tumbling aggregates emit no row for an eventless window, in
    Spark, DuckDB, and the streaming twin alike) — the baseline skips
    silent gaps rather than treating them as zero-count windows, the
    usual choice for traffic alerting where a gap means "no data",
    not "no traffic".  Scale shape: the events-to-windows reduction is the
    ``tumble_exact`` plan; the EWMA itself runs on the WINDOWS table
    (one row per ``size_sec`` — ~525 k rows/year at 60 s, driver-side
    tiny forever), so the single-partition ordered window there is a
    non-issue at any corpus size."""
    counts = (
        with_bit(events)
        .groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(F.sum("bit").cast("bigint").alias("ones_exact"))
        .select(F.col("w.end").alias("we_ts"), "ones_exact")
    )
    hist_w = Window.orderBy("we_ts").rowsBetween(-lookback, -1)
    df = counts.withColumn(
        "hist", F.collect_list("ones_exact").over(hist_w)
    )
    L = F.size("hist")
    # element i (0-based, oldest first) sits lag = L - i back, so its
    # weight is 2^(lookback - L + i).  pow(2, k) for k in [0, 62] is
    # an exactly-representable double, so the bigint cast is lossless.
    pow2 = lambda e: F.pow(  # noqa: E731
        F.lit(2.0), e.cast("double")
    ).cast("bigint")
    num = F.aggregate(
        F.transform(
            "hist",
            lambda x, i: x * pow2(F.lit(lookback) - L + i),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    denom = pow2(F.lit(lookback)) - pow2(F.lit(lookback) - L)
    return df.select(
        F.date_format("we_ts", TS_FMT_SPARK).alias("window_end"),
        "ones_exact",
        num.alias("_num"),
        denom.alias("_denom"),
        L.alias("_L"),
    ).select(
        "window_end",
        "ones_exact",
        F.when(
            F.col("_L") > 0,
            F.expr("CAST((_num * 1000000) div _denom AS BIGINT)"),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("ewma_e6"),
        F.when(
            F.col("_L") > 0,
            F.col("ones_exact") * F.col("_denom")
            > F.lit(int(factor)) * F.col("_num"),
        )
        .otherwise(F.lit(False))
        .cast("bigint")
        .alias("is_anomaly"),
    )


def anomaly_drilldown(
    events: DataFrame, size_sec: int = 60, k: int = 3
) -> DataFrame:
    """Drill into the windows :func:`window_anomalies` flags: per
    anomalous window and event_type, how many events and distinct
    users drove the spike — the on-call "what happened in that
    window" query.

    Scale shape: this is a RANGE join (event ts ∈ [window_start,
    window_end)) rewritten as an EQUI join — tumbling windows tile
    time, so each event's window is computable from its timestamp
    (floor(epoch/size)), and the join key is that bucket, not an
    interval predicate.  The anomalous-window list (≪ windows ≪
    events) broadcasts, so the probe is map-side; the only shuffle
    is the per-(window, type) aggregate.  countDistinct is exact for
    the oracle; swap approx_count_distinct at 100 TB if ±2% is
    acceptable."""
    anom = (
        window_anomalies(events, size_sec, k)
        .filter(F.col("is_anomaly") == 1)
        .select("window_end")
    )
    bucket_end = F.date_format(
        F.timestamp_seconds(
            (F.floor(F.unix_timestamp("ts") / size_sec) + 1)
            * size_sec
        ),
        TS_FMT_SPARK,
    )
    return (
        events.withColumn("window_end", bucket_end)
        .join(F.broadcast(anom), "window_end")
        .groupBy("window_end", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def windowed_distinct_users(
    events: DataFrame, size_sec: int = 60
) -> DataFrame:
    """Per-tumbling-window exact distinct user count (the unique-
    visitors dashboard query).  Exact COUNT(DISTINCT) expands to a
    two-phase plan (partial distinct on (window, user), then the
    window re-agg) — both phases partially aggregated, no full-row
    sort.  The oracle anchor for the HLL twin below."""
    return (
        events.groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias(
                "window_end"
            ),
            "n_users",
            "n_rows",
        )
    )


def windowed_distinct_users_approx(
    events: DataFrame, size_sec: int = 60, rsd: float = 0.02
) -> DataFrame:
    """HLL++ twin of :func:`windowed_distinct_users` — the 100 TB
    dashboard path: approx_count_distinct keeps ONE bounded sketch
    per window per task (no (window, user) expansion, one shuffle of
    sketch bytes), at ``rsd`` relative error.  Rows-only for the
    driver; the error bound vs the exact twin is asserted in
    ``tests/test_windows.py``."""
    return (
        events.groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias(
                "window_end"
            ),
            "n_users_approx",
            "n_rows",
        )
    )


def gap_fill_tumble(events: DataFrame, size_sec: int = 60) -> DataFrame:
    """Dense (gap-filled) tumbling series — the dashboard/timeseries
    completion of the window family (TimescaleDB ``time_bucket_gapfill``):
    every ``size_sec`` bucket between the first and last observed
    window is emitted, empty buckets zero-filled and flagged, plus a
    last-observation-carried-forward column (``ones_locf``) for
    "current value" panels.

    Output: (window_end, ones_exact, n_rows, is_gap, ones_locf).

    Scale shape: the aggregation is the ordinary tumble shuffle over
    raw events; the dense grid is generated from the aggregate's own
    ONE-ROW min/max via ``sequence``+``explode`` (never a driver
    loop), left-joined back on the window key.  The LOCF window is a
    single global ordered pass — over the SERIES, not the events
    (one row per ``size_sec`` of span; a century of 1 s buckets is
    ~3 G rows, so chunk the LOCF by coarse time range before that
    point), the same bounded-series shape as ``ewma_anomaly``."""
    agg = (
        with_bit(events)
        .select(
            ((F.floor(F.unix_timestamp("ts") / size_sec) + 1) * size_sec)
            .cast("bigint")
            .alias("we_sec"),
            "bit",
        )
        .groupBy("we_sec")
        .agg(
            F.sum("bit").cast("bigint").alias("ones"),
            F.count(F.lit(1)).alias("n"),
        )
        # materialize the (series-sized) aggregate ONCE: both the
        # min/max bounds branch and the grid join consume it, and
        # without this each branch re-scans the raw events
        .localCheckpoint(eager=True)
    )
    grid = agg.agg(
        F.min("we_sec").alias("lo"), F.max("we_sec").alias("hi")
    ).select(
        F.explode(
            F.sequence("lo", "hi", F.lit(size_sec).cast("bigint"))
        ).alias("we_sec")
    )
    dense = grid.join(agg, "we_sec", "left")
    w = Window.orderBy("we_sec").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return dense.select(
        F.date_format(
            F.timestamp_seconds("we_sec"), TS_FMT_SPARK
        ).alias("window_end"),
        F.coalesce("ones", F.lit(0)).cast("bigint").alias("ones_exact"),
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_rows"),
        F.col("ones").isNull().cast("bigint").alias("is_gap"),
        F.last("ones", ignorenulls=True)
        .over(w)
        .cast("bigint")
        .alias("ones_locf"),
    )


def m4_downsample(
    events: DataFrame, size_sec: int = 600
) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., VLDB 2014): per
    time bucket keep exactly the four value-defining points a pixel
    column needs — first, last, min, max of ``value`` — so a plot of
    the downsampled series is pixel-identical to plotting every raw
    point.  The decimation operator dashboards run before shipping a
    100 TB series to a browser.

    Output: (window_end, v_first, v_last, v_min, v_max, n_rows).

    Determinism: first/last order by (ts, event_id) — exact even
    when one timestamp repeats; min/max compare raw doubles (no
    arithmetic, so cross-engine exact).

    Scale shape: ONE keyed shuffle on the bucket; first/last come
    from the same two-sided struct min/max aggregation (map-side
    combinable), never a window or a sort."""
    b = (
        events.select(
            ((F.floor(F.unix_timestamp("ts") / size_sec) + 1) * size_sec)
            .cast("bigint")
            .alias("we_sec"),
            F.struct(
                F.unix_micros("ts").alias("us"),
                F.col("event_id").alias("eid"),
                F.col("value").alias("v"),
            ).alias("pt"),
            F.col("value").alias("v"),
        )
    )
    return (
        b.groupBy("we_sec")
        .agg(
            F.min("pt").alias("first_pt"),
            F.max("pt").alias("last_pt"),
            F.min("v").alias("v_min"),
            F.max("v").alias("v_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(
                F.timestamp_seconds("we_sec"), TS_FMT_SPARK
            ).alias("window_end"),
            F.col("first_pt.v").alias("v_first"),
            F.col("last_pt.v").alias("v_last"),
            "v_min",
            "v_max",
            "n_rows",
        )
    )


def windowed_percentiles(
    events: DataFrame, size_sec: int = 600
) -> DataFrame:
    """Per-tumbling-window exact interpolated percentiles of ``value``
    (PERCENTILE_CONT semantics) — the p50/p90/p99 latency-dashboard
    shape, sharing ``relational.value_percentiles_by_type``'s
    cross-engine recipe (identical (n-1)·p rank interpolation in
    Spark's ``percentile`` and DuckDB's ``quantile_cont``; rounded to
    6 dp to absorb one-ulp ordering differences).  Scale note: exact
    percentiles sort within each window group; the 100 TB path swaps
    ``approx_percentile`` (mergeable t-digest sketch), asserted
    within tolerance in tests for the by-type twin."""
    ps = [0.5, 0.9, 0.99]
    exact = F.percentile("value", F.array(*[F.lit(p) for p in ps]))
    return (
        events.groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(
            *[
                F.round(F.get(exact, i), 6).alias(f"p{int(p * 100)}")
                for i, p in enumerate(ps)
            ],
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias(
                "window_end"
            ),
            "p50",
            "p90",
            "p99",
            "n",
        )
    )


def seasonal_anomaly(
    events: DataFrame,
    size_sec: int = 60,
    cycle_sec: int = 3600,
    factor_num: int = 3,
    factor_den: int = 2,
) -> DataFrame:
    """Seasonal-baseline anomaly detection: each tumbling window's
    event count is compared against the mean count of all windows
    sharing its SLOT in a repeating cycle (default: minute-of-hour),
    per event type — the complement of the EWMA/median-MAD rules,
    catching "normal for 3 am, anomalous for 3 pm" patterns that any
    purely trailing baseline misses.

    All-integer: the threshold factor is the RATIONAL
    ``factor_num/factor_den`` (default 3/2) so fractional factors
    stay exact — a window with count c is anomalous when
    ``c·n_windows·factor_den > factor_num·slot_total`` (high) or
    ``c·n_windows·factor_num < factor_den·slot_total`` (low) —
    multiply-compares, never a float mean; the reported baseline is
    ``slot_total·10^6 div n_windows``.  Baselines average OBSERVED
    windows only (tumbling aggregates emit no row for an eventless
    window — same convention as :func:`ewma_anomaly`).

    Scale shape: one keyed aggregation events→windows, then a second
    tiny aggregation windows→(type, slot) baselines joined back
    broadcast (the baseline table is |types|·(cycle/size) rows —
    constant in corpus size)."""
    if cycle_sec % size_sec != 0:
        raise ValueError("cycle_sec must be a multiple of size_sec")
    counts = (
        events.groupBy(
            "event_type", F.window("ts", f"{size_sec} seconds").alias("w")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .select(
            "event_type",
            F.unix_timestamp("w.end").alias("we_sec"),
            "cnt",
        )
    )
    return seasonal_flags(
        counts, size_sec, cycle_sec, factor_num, factor_den
    )


def seasonal_flags(
    counts: DataFrame,
    size_sec: int = 60,
    cycle_sec: int = 3600,
    factor_num: int = 3,
    factor_den: int = 2,
) -> DataFrame:
    """Flag computation half of :func:`seasonal_anomaly`, over an
    already-materialized windows-count table ``(event_type, we_sec,
    cnt)`` — shared by the batch operator and the streaming twin
    (``streaming/alerts.seasonal_anomaly_stream``), so both paths are
    the same code by construction."""
    # Integral `div` + `%`, never float-div-then-cast: the oracle
    # floors (DuckDB `//`) then takes sign-of-dividend remainder
    # (`%`); a double division truncates toward zero — divergent for
    # negative epoch seconds (pre-1970 timestamps).  Spark's `%` has
    # DuckDB's remainder semantics, unlike F.pmod.
    counts = counts.withColumn(
        "slot",
        F.expr(
            f"CAST((we_sec div {int(size_sec)})"
            f" % {int(cycle_sec // size_sec)} AS BIGINT)"
        ),
    )
    base = counts.groupBy("event_type", "slot").agg(
        F.sum("cnt").cast("bigint").alias("slot_total"),
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
    )
    j = counts.join(F.broadcast(base), ["event_type", "slot"])
    hi = F.col("cnt") * F.col("n_windows") * F.lit(factor_den) > F.lit(
        factor_num
    ) * F.col("slot_total")
    lo = F.col("cnt") * F.col("n_windows") * F.lit(factor_num) < F.lit(
        factor_den
    ) * F.col("slot_total")
    return (
        j.filter(hi | lo)
        .select(
            "event_type",
            F.date_format(
                F.timestamp_seconds("we_sec"), TS_FMT_SPARK
            ).alias("window_end"),
            "slot",
            "cnt",
            F.expr(
                "CAST((slot_total * 1000000) div n_windows AS BIGINT)"
            ).alias("baseline_e6"),
            F.when(hi, F.lit("high")).otherwise(F.lit("low")).alias(
                "direction"
            ),
        )
    )


def late_data_audit(
    events: DataFrame,
    arrival_us_col: str,
    id_col: str = "event_id",
    ts_col: str = "ts",
    late_after_sec: int = 60,
    size_sec: int = 600,
    shard_sec: int = 3600,
) -> DataFrame:
    """Watermark lateness audit of an arrival stream: replays the
    rows in arrival order (``arrival_us_col``, epoch µs, ties broken
    by ``id_col``), tracks the running event-time high-water mark a
    streaming engine would hold, and reports per event-time window
    how many rows arrived AFTER the mark had already passed them by
    more than ``late_after_sec`` — i.e. the rows a watermark with
    that delay would have dropped.  The sizing tool for choosing
    ``withWatermark`` delays before deploying the streaming jobs.

    Scale shape: a global running max is a prefix computation, which
    would be one giant sorted partition done naively.  Instead the
    sharded-prefix recipe (same as sequence packing's prefix sum):
    rows shard by ``shard_sec`` of arrival time, (1) one tiny keyed
    aggregation gets each shard's max event time, (2) the exclusive
    running max across shards is computed on that |shards|-row table
    and broadcast back, (3) the within-shard running max is a window
    sort partitioned BY SHARD.  Lateness per row =
    ``max(0, wm_prev − ts)`` with the watermark EXCLUSIVE of the
    current row (first arrival is never late).  All integer µs."""
    rows = lateness_rows(
        events, arrival_us_col, id_col, ts_col, None, shard_sec
    )
    return _late_format(
        late_audit_increment(rows, late_after_sec, size_sec)
    )


def lateness_rows(
    events: DataFrame,
    arrival_us_col: str,
    id_col: str = "event_id",
    ts_col: str = "ts",
    init_wm_us: int | None = None,
    shard_sec: int = 3600,
) -> DataFrame:
    """Row-level half of :func:`late_data_audit`: per row, its event
    time (``_ts_us``) and lateness vs the running high-water mark
    (``_late_us``), via the sharded prefix max.  ``init_wm_us`` seeds
    the watermark with state carried from earlier arrivals — the hook
    the streaming twin uses to chain batches."""
    ts_us = F.unix_micros(F.col(ts_col))
    arr = F.col(arrival_us_col).cast("bigint")
    shard_us = shard_sec * 1_000_000
    base = events.select(
        F.col(id_col).alias("_id"),
        ts_us.alias("_ts_us"),
        arr.alias("_arr_us"),
        # integral div — float division of ~1.7e15 µs values risks
        # boundary misrounds (see seasonal_flags slot note)
        F.expr(f"CAST({arrival_us_col} AS BIGINT) div {shard_us}").alias(
            "_shard"
        ),
    )
    smax = base.groupBy("_shard").agg(F.max("_ts_us").alias("_smax"))
    wprev = (
        Window.orderBy("_shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = smax.select(
        "_shard", F.max("_smax").over(wprev).alias("_prefix_us")
    )
    win_row = (
        Window.partitionBy("_shard")
        .orderBy("_arr_us", "_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sentinel = (
        -(1 << 62) if init_wm_us is None else int(init_wm_us)
    )
    return (
        base.join(F.broadcast(prefix), "_shard")
        .withColumn("_row_prev", F.max("_ts_us").over(win_row))
        .withColumn(
            "_wm_prev",
            F.greatest(
                F.coalesce("_prefix_us", F.lit(sentinel)),
                F.coalesce("_row_prev", F.lit(sentinel)),
            ),
        )
        .withColumn(
            "_late_us",
            F.when(
                F.col("_wm_prev") == F.lit(-(1 << 62)), F.lit(0)
            ).otherwise(
                F.greatest(
                    F.lit(0), F.col("_wm_prev") - F.col("_ts_us")
                )
            ).cast("bigint"),
        )
        .select("_ts_us", "_late_us")
    )


def late_audit_increment(
    rows: DataFrame,
    late_after_sec: int = 60,
    size_sec: int = 600,
) -> DataFrame:
    """Aggregation half of :func:`late_data_audit`, emitted as
    MERGEABLE per-window partials keyed by numeric ``_we_sec`` —
    counts and sums add, max maxes, so the streaming twin can fold
    one batch's increment into committed state by key."""
    size_us = size_sec * 1_000_000
    we_sec = (
        (F.floor(F.col("_ts_us") / size_us) + 1) * size_sec
    ).cast("bigint")
    late_thresh = late_after_sec * 1_000_000
    return rows.groupBy(we_sec.alias("_we_sec")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            (F.col("_late_us") > late_thresh).cast("bigint")
        ).cast("bigint").alias("n_late"),
        F.max("_late_us").cast("bigint").alias("max_lateness_us"),
        F.sum("_late_us").cast("bigint").alias("sum_lateness_us"),
    )


def _late_format(partials: DataFrame) -> DataFrame:
    return partials.select(
        F.date_format(
            F.timestamp_seconds("_we_sec"), TS_FMT_SPARK
        ).alias("window_end"),
        "n_events",
        "n_late",
        "max_lateness_us",
        "sum_lateness_us",
    )


def hop_topn(
    events: DataFrame,
    size_sec: int = 60,
    slide_sec: int = 10,
    k: int = 3,
) -> DataFrame:
    """Window Top-N over HOP (sliding) windows — the sliding sibling
    of :func:`window_topn`, completing the Flink SQL Window Top-N
    family over both window TVFs the reference uses.

    Output: (window_start, window_end, user_id, n_events, rnk).

    Scale shape: the hop explode multiplies rows by the overlap
    factor (size/slide) BEFORE the keyed aggregation — inherent to
    per-(window, user) counting; the rank still routes through the
    map-side top-k prune so no window's full user set reaches the
    authoritative ROW_NUMBER."""
    from flink_window_dgim_traffic_spark.operators.relational import (
        grouped_topk,
    )

    counts = (
        events.groupBy(
            F.window(
                "ts", f"{size_sec} seconds", f"{slide_sec} seconds"
            ).alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT_SPARK).alias(
                "window_start"
            ),
            F.date_format(F.col("w.end"), TS_FMT_SPARK).alias(
                "window_end"
            ),
            "user_id",
            "n_events",
        )
    )
    return grouped_topk(
        counts,
        ["window_start", "window_end"],
        "n_events",
        k,
        tiebreak="user_id",
    ).select(
        "window_start", "window_end", "user_id", "n_events", "rnk"
    )


def max_concurrency(
    intervals: DataFrame,
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_sec: int = 600,
    shard_sec: int = 3600,
) -> DataFrame:
    """Sweep-line maximum concurrency — per time bucket, the peak
    number of simultaneously-open half-open intervals
    ``[start, end)`` (peak concurrent sessions / connections / jobs,
    the capacity-planning aggregate interval stores compute with a
    dedicated index).

    Algorithm: each interval contributes a +1 delta at ``start`` and
    a −1 at ``end``; deltas at the SAME microsecond are pre-summed
    (one keyed aggregation), so tie order between engines can never
    matter; a running sum over the distinct change instants is the
    concurrency level holding on ``[t, next_t)``.  A bucket's peak is
    ``greatest(max level at its change points, level carried in from
    before its first change point)`` — buckets with no change points
    hold a constant level and are omitted (gap-fill downstream via
    ``gap_fill_tumble`` if a dense series is needed).

    Output: (window_end, max_concurrent, n_changes) — all integers.

    Scale shape: the raw intervals reduce to ≤2·|intervals| delta
    rows in ONE keyed aggregation; the distinct-instant series is
    data-proportional, so the running sum is SHARDED (the
    ``lateness_rows`` recipe): instants shard by ``shard_sec`` of
    event time, (1) one tiny keyed aggregation gets each shard's net
    total, (2) the exclusive prefix sum across shards runs on that
    |shards|-row table and broadcasts back, (3) the within-shard
    running sum is a window sort partitioned BY SHARD — no
    single-partition pass ever touches a data-proportional series.
    Output is bit-identical for any ``shard_sec`` (prefix sums are
    associative); partitioning-invariance pinned in
    tests/test_windows_extra.py."""
    bucket_us = bucket_sec * 1_000_000
    shard_us = shard_sec * 1_000_000
    deltas = (
        intervals.select(
            F.unix_micros(F.col(start_col)).alias("t_us"),
            F.lit(1).cast("bigint").alias("d"),
        )
        .unionAll(
            intervals.select(
                F.unix_micros(F.col(end_col)).alias("t_us"),
                F.lit(-1).cast("bigint").alias("d"),
            )
        )
        .groupBy("t_us")
        .agg(F.sum("d").alias("net"))
        # integral div — float division of ~1.7e15 µs values risks
        # boundary misrounds; floor semantics match the shard walls
        .withColumn("_shard", F.expr(f"t_us div {shard_us}"))
    )
    stot = deltas.groupBy("_shard").agg(
        F.sum("net").alias("_stot")
    )
    w_shard = Window.orderBy("_shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = stot.select(
        "_shard",
        F.coalesce(F.sum("_stot").over(w_shard), F.lit(0)).alias(
            "_prefix"
        ),
    )
    w_in = (
        Window.partitionBy("_shard")
        .orderBy("t_us")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # level entering the instant == level − this instant's own net
    # (the prefix sum one row earlier) — no second window pass needed
    levels = (
        deltas.join(F.broadcast(prefix), "_shard")
        .select(
            "t_us",
            "net",
            (F.col("_prefix") + F.sum("net").over(w_in)).alias(
                "level"
            ),
        )
        .withColumn("carried", F.col("level") - F.col("net"))
    )
    b = levels.withColumn(
        "we_us",
        F.expr(f"(t_us div {bucket_us} + 1) * {bucket_us}").cast(
            "bigint"
        ),
    )
    return (
        b.groupBy("we_us")
        .agg(
            F.max("level").alias("peak_at_changes"),
            F.min(F.struct("t_us", "carried")).alias("first_pt"),
            F.count(F.lit(1)).alias("n_changes"),
        )
        .select(
            F.date_format(
                F.timestamp_seconds(F.expr("we_us div 1000000")),
                TS_FMT_SPARK,
            ).alias("window_end"),
            F.greatest(
                F.col("peak_at_changes"), F.col("first_pt.carried")
            )
            .cast("bigint")
            .alias("max_concurrent"),
            "n_changes",
        )
    )


def time_weighted_avg(
    events: DataFrame,
    size_sec: int = 1800,
    by: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key per-tumbling-window TIME-weighted average of a step
    signal (TimescaleDB ``time_weight('locf', ...)``): each
    observation's value holds until the key's next observation or
    the window end, whichever is first, and the window's average
    weights each value by how long it held.  The right way to
    average irregularly-sampled gauges — a plain AVG over-counts
    bursts of samples.

    All-integer cross-engine recipe: values are quantized to
    centi-units (``round(value*100)`` — exact for 2-dp data),
    durations are exact microseconds, and the weighted mean is ONE
    integral division ``Σ(v_c·dt_us) div Σdt_us`` in DECIMAL(38)
    (DuckDB HUGEINT ``//``) — no IEEE division between engines.

    Output: (key, window_end, twa_c, dur_us, n_rows).

    Scale shape: ONE exchange — the lead() window partitions by the
    key, and the following groupBy on (key, window) is satisfied by
    the same hash partitioning (subset of the group keys), so
    Catalyst plans no second shuffle.  Keys with heavy event counts
    sort within their partition only."""
    size_us = size_sec * 1_000_000
    kw = Window.partitionBy(by).orderBy("us", "event_id")
    base = events.select(
        F.col(by),
        "event_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col(value_col) * 100)
        .cast("bigint")
        .alias("v_c"),
    ).withColumn(
        "we_us",
        F.expr(f"(us div {size_us} + 1) * {size_us}").cast("bigint"),
    )
    dt = base.withColumn(
        "dt_us",
        F.least(
            F.coalesce(F.lead("us").over(kw), F.col("we_us")),
            F.col("we_us"),
        )
        - F.col("us"),
    )
    num = "CAST(v_c AS DECIMAL(38,0)) * CAST(dt_us AS DECIMAL(38,0))"
    return (
        dt.groupBy(by, "we_us")
        .agg(
            F.sum(F.expr(num)).alias("num"),
            F.sum(F.col("dt_us").cast("decimal(38,0)")).alias("den"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.col(by),
            F.date_format(
                F.timestamp_seconds(F.expr("we_us div 1000000")),
                TS_FMT_SPARK,
            ).alias("window_end"),
            F.expr("num div den").cast("bigint").alias("twa_c"),
            F.col("den").cast("bigint").alias("dur_us"),
            "n_rows",
        )
    )


def session_dgim(
    events: DataFrame, gap_sec: int = 14400, mode: str = MODE_JAVA
) -> DataFrame:
    """DGIM over SESSION windows — the fourth and last Flink window
    kind for the sketch family (tumble/hop/cumulate shipped earlier;
    the reference itself only uses the first two).  Per-user gap
    sessions come from the ENGINE's ``session_window`` operator.

    HORIZON SEMANTICS (explicit, because it is NOT ``gap_sec``): the
    estimate models a DGIM whose bit horizon covers the WHOLE session
    span — i.e. at session close the sketch is queried for "ones since
    the session opened", the per-session analogue of tumble's
    size-long horizon.  Under that model nothing expires during a
    sequential replay (every bit is within the horizon of the newest),
    so the estimate is the replay-equivalent closed form
    ``g(sum(bit))`` — the same ``tumble_dgim_fast`` rewrite,
    property-tested against a direct per-session sketch replay (the
    replay test sizes its DGIM horizon to span+1 per session, which is
    exactly this model, not an independent check of a fixed-horizon
    sketch).  A chained session whose span exceeds ``gap_sec`` would
    give a DIFFERENT (smaller) answer under a horizon=gap_sec sketch;
    that variant is intentionally not what this operator computes.
    Plan shape: one session-window aggregation (map-side
    partial), Python only as the memoized g() lookup per output row.

    Output: (user_id, session_start, session_end_plus_gap,
    count_estimate, exact_count, n_rows) — session bounds formatted
    exactly as relational.session_window_counts so the oracle shares
    the lag+cumsum session definition (new session at gap ≥, the
    engine's boundary semantics)."""
    return (
        with_bit(events)
        .groupBy(
            "user_id",
            F.session_window("ts", f"{gap_sec} seconds").alias("w"),
        )
        .agg(
            F.sum("bit").cast("bigint").alias("exact_count"),
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ts").alias("first_ts"),
        )
        .select(
            "user_id",
            F.date_format("first_ts", TS_FMT_SPARK).alias("session_start"),
            F.date_format("w.end", TS_FMT_SPARK).alias(
                "session_end_plus_gap"
            ),
            _count_est_udf(mode)(F.col("exact_count")).alias(
                "count_estimate"
            ),
            "exact_count",
            "n_rows",
        )
    )
