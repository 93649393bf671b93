"""Materialized window-rollup hierarchy — the continuous-aggregate /
hypertable-rollup pattern (TimescaleDB continuous aggregates, Druid
rollups): tumbling aggregates materialized at increasing granularities
(1 min → 1 h → 1 d), with coarser levels computed FROM the next finer
level (never from raw events), and a query router that serves any
requested granularity from the coarsest level that tiles it.

Why this is the 100 TB dashboard shape: raw events are touched ONCE
(the finest level); every coarser level is a re-aggregation of an
already ~size_sec/fine-× smaller table, and a dashboard query for any
granularity that divides into a materialized level reads that level's
tiny table instead of the event log.  Correctness rests on the
aggregate being associative (sum/count are), which the tests pin:
every materialized level — and every routed query — equals the direct
aggregation over raw events, and ``rollup_serve`` is oracle-checked
end-to-end via a queries() entry.

Levels store epoch-second window ends (BIGINT) for exact
re-aggregation arithmetic; serving formats timestamps at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
DEFAULT_LEVELS = (60, 3600, 86400)


def _finest(events: DataFrame, size_sec: int) -> DataFrame:
    bit = F.pmod(F.col("event_id"), F.lit(2)).cast("int")
    we = (
        F.floor(F.unix_timestamp("ts") / size_sec) + 1
    ) * size_sec
    return (
        events.select(bit.alias("bit"), we.alias("we_sec"))
        .groupBy("we_sec")
        .agg(
            F.sum("bit").cast("bigint").alias("ones_exact"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def _coarsen(fine: DataFrame, fine_sec: int, coarse_sec: int) -> DataFrame:
    """Re-aggregate a finer level into a coarser one: fine window
    [we-fine, we) belongs to the coarse window ending at
    floor((we-fine)/coarse)*coarse + coarse."""
    cwe = (
        F.floor((F.col("we_sec") - fine_sec) / coarse_sec) + 1
    ) * coarse_sec
    return (
        fine.select(
            cwe.cast("bigint").alias("we_sec"), "ones_exact", "n_rows"
        )
        .groupBy("we_sec")
        .agg(
            F.sum("ones_exact").cast("bigint").alias("ones_exact"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
        )
    )


def build_rollup_hierarchy(
    events: DataFrame, path: str, levels: tuple[int, ...] = DEFAULT_LEVELS
) -> None:
    """Materialize the hierarchy at ``path/level-<sec>``.  Raw events
    feed ONLY the finest level; each coarser level re-aggregates the
    previous one (levels must be ascending and each divisible by its
    predecessor — asserted)."""
    levels = tuple(sorted(levels))
    for prev, cur in zip(levels, levels[1:]):
        if cur % prev != 0:
            raise ValueError(
                f"level {cur} must be a multiple of finer level {prev}"
            )
    df = _finest(events, levels[0])
    df.write.mode("overwrite").parquet(f"{path}/level-{levels[0]}")
    for prev, cur in zip(levels, levels[1:]):
        df = _coarsen(
            df.sparkSession.read.parquet(f"{path}/level-{prev}"),
            prev,
            cur,
        )
        df.write.mode("overwrite").parquet(f"{path}/level-{cur}")


def rollup_serve(
    spark,
    path: str,
    size_sec: int,
    levels: tuple[int, ...] = DEFAULT_LEVELS,
) -> DataFrame:
    """Serve a tumbling aggregate at ``size_sec`` from the hierarchy:
    pick the COARSEST materialized level that tiles the request
    (largest level L ≤ size_sec with size_sec % L == 0), read that
    level only, re-aggregate if needed.  Raises if no level tiles the
    request (a 90 s query cannot be served from 60 s windows —
    misaligned boundaries would silently miscount)."""
    fits = [l for l in sorted(levels) if l <= size_sec and size_sec % l == 0]
    if not fits:
        raise ValueError(
            f"no materialized level tiles size_sec={size_sec}"
            f" (levels={levels})"
        )
    src = fits[-1]
    df = spark.read.parquet(f"{path}/level-{src}")
    if src != size_sec:
        df = _coarsen(df, src, size_sec)
    return df.select(
        F.date_format(F.timestamp_seconds("we_sec"), TS_FMT_SPARK).alias(
            "window_end"
        ),
        "ones_exact",
        "n_rows",
    )


def refresh_rollup(spark, path: str, new_events: DataFrame,
                   levels: tuple[int, ...] = DEFAULT_LEVELS) -> None:
    """Incrementally fold a new event batch into the hierarchy — the
    continuous-aggregate REFRESH: aggregate the batch at the finest
    level, merge by window (sum), and propagate upward so only
    re-aggregation of the (tiny) level tables happens; raw history is
    never re-read.  Late events merge into their original windows
    (the windows tables are keyed by window end, so a late row just
    adds to an existing key).

    The level tables are one row per window — small forever relative
    to events — so each refresh rewrites them wholesale via a
    localCheckpoint (read → merge → overwrite).  For exactly-once
    under a streaming driver, wrap this in the batch-id-marker recipe
    (see ``rollup_refresh_batch_fn``)."""
    levels = tuple(sorted(levels))
    inc = _finest(new_events, levels[0])
    for i, lvl in enumerate(levels):
        existing = spark.read.parquet(f"{path}/level-{lvl}")
        merged = (
            existing.unionByName(inc)
            .groupBy("we_sec")
            .agg(
                F.sum("ones_exact").cast("bigint").alias("ones_exact"),
                F.sum("n_rows").cast("bigint").alias("n_rows"),
            )
            .localCheckpoint(eager=True)
        )
        merged.write.mode("overwrite").parquet(f"{path}/level-{lvl}")
        if i + 1 < len(levels):
            # propagate ONLY the increment upward (re-coarsened from
            # the batch's finest aggregates, not the whole level)
            inc = _coarsen(inc, lvl, levels[i + 1])


def rollup_refresh_batch_fn(path: str,
                            levels: tuple[int, ...] = DEFAULT_LEVELS):
    """foreachBatch wrapper with the exactly-once marker recipe: a
    replayed batch id is skipped, so restart replays cannot
    double-count windows.  (The merge itself is NOT idempotent —
    sums would double — hence the marker gate, unlike the set-
    semantics compaction in streaming/pipeline.py.)"""
    import os

    def process(batch: DataFrame, batch_id: int) -> None:
        marker = f"{path}/_done/{batch_id}"
        if os.path.exists(marker):
            return
        refresh_rollup(batch.sparkSession, path, batch, levels)
        os.makedirs(f"{path}/_done", exist_ok=True)
        open(marker, "w").close()

    return process
