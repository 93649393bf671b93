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

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
# DGIM windowed estimate — applyInPandas (whole-window replay)
# ----------------------------------------------------------------------
def _dgim_window_cols(events: DataFrame, size_sec: int) -> DataFrame:
    return with_bit(events).select(
        F.window("ts", f"{size_sec} seconds").getItem("end").alias("we"),
        "bit",
        F.unix_timestamp("ts").alias("ts_sec"),
    )


def _replay_group(pdf: pd.DataFrame, size_sec: int, mode: str):
    """Replay one window's rows (sorted by ts) through the sketch."""
    sk = DGIM(size_sec, mode=mode)
    ones = 0
    sub = pdf.sort_values("ts_sec", kind="mergesort")
    for b, t in zip(sub["bit"].to_numpy(), sub["ts_sec"].to_numpy()):
        if b == 1:
            sk.add(int(t))
            ones += 1
    return sk.estimate(), ones


def tumble_dgim(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """DGIM estimate per tumbling window + exact twin column.

    ``applyInPandas`` = one Arrow batch per window group, replacing the
    reference's MULTISET ``COLLECT`` (SURVEY §3.3)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        est, ones = _replay_group(pdf, size_sec, mode)
        return pd.DataFrame(
            {
                "window_end": [pdf["we"].iloc[0].strftime(TS_FMT_PY)],
                "count_estimate": [est],
                "exact_count": [ones],
            }
        )

    return (
        _dgim_window_cols(events, size_sec)
        .groupBy("we")
        .applyInPandas(
            fn, "window_end string, count_estimate bigint, exact_count bigint"
        )
    )


def tumble_dgim_collect(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """Literal W13/W14 mapping: ``collect_list(struct(bit, ts))`` per
    window + scalar UDF replay (reference ``job.py:175-184``).  Kept for
    parity; ``tumble_dgim`` / ``tumble_dgim_two_phase`` are the
    preferred shapes (collect_list concentrates a whole window in one
    task — fine at reference rates, not the 100 TB path)."""

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
    ``SlidingWindowStreamingJob.java:92-111``) + exact twin."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        est, ones = _replay_group(pdf, size_sec, mode)
        return pd.DataFrame(
            {
                "window_start": [pdf["ws"].iloc[0].strftime(TS_FMT_PY)],
                "window_end": [pdf["we"].iloc[0].strftime(TS_FMT_PY)],
                "count_estimate": [est],
                "exact_count": [ones],
            }
        )

    w = F.window("ts", f"{size_sec} seconds", f"{slide_sec} seconds")
    ev = with_bit(events).select(
        w.alias("w"), "bit", F.unix_timestamp("ts").alias("ts_sec")
    )
    ev = ev.select(
        F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "bit", "ts_sec"
    )
    return ev.groupBy("ws", "we").applyInPandas(
        fn,
        "window_start string, window_end string, "
        "count_estimate bigint, exact_count bigint",
    )


# ----------------------------------------------------------------------
# DGIM two-phase: map-side partial sketches + sketch-only shuffle
# ----------------------------------------------------------------------
def tumble_dgim_two_phase(
    events: DataFrame, size_sec: int = 60, mode: str = MODE_JAVA
) -> DataFrame:
    """Distributed DGIM the way the reference's ``merge`` intends
    (``DGIMAccumulator.java:96-115``): phase 1 builds one sketch per
    (input partition × window) with ``mapInPandas`` — no shuffle of raw
    rows; phase 2 shuffles only the flattened O(log²N) sketches and
    merges them per window.  At 100 TB this shuffles megabytes, not
    terabytes."""

    def phase1(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # accumulate across all Arrow batches of this partition so each
        # (partition, window) emits exactly one sketch
        sketches: dict = {}
        counters: dict = {}
        for pdf in batches:
            for we, sub in pdf.groupby("we", sort=False):
                sk = sketches.get(we)
                if sk is None:
                    sk = sketches[we] = DGIM(size_sec, mode=mode)
                    counters[we] = [0, 0]
                sub = sub.sort_values("ts_sec", kind="mergesort")
                for b, t in zip(sub["bit"].to_numpy(), sub["ts_sec"].to_numpy()):
                    if b == 1:
                        sk.add(int(t))
                        counters[we][0] += 1
                counters[we][1] += len(sub)
        if sketches:
            yield pd.DataFrame(
                {
                    "we": list(sketches.keys()),
                    "flat": [sk.to_flat() for sk in sketches.values()],
                    "ones": [c[0] for c in counters.values()],
                    "nrows": [c[1] for c in counters.values()],
                }
            )

    def phase2(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = DGIM(size_sec, mode=mode)
        for flat in pdf["flat"]:
            acc.merge(DGIM.from_flat(size_sec, list(flat), mode=mode))
        return pd.DataFrame(
            {
                "window_end": [pdf["we"].iloc[0].strftime(TS_FMT_PY)],
                "count_estimate": [acc.estimate()],
                "exact_count": [int(pdf["ones"].sum())],
                "n_rows": [int(pdf["nrows"].sum())],
            }
        )

    partials = _dgim_window_cols(events, size_sec).mapInPandas(
        phase1, "we timestamp, flat array<bigint>, ones bigint, nrows bigint"
    )
    return partials.groupBy("we").applyInPandas(
        phase2,
        "window_end string, count_estimate bigint, "
        "exact_count bigint, n_rows bigint",
    )
