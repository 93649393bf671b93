"""Streaming twins of the round-4 alerting operators: Flink-style
window Top-N and the binary-decay EWMA anomaly rule
(``operators.windows.window_topn`` / ``ewma_anomaly``).

Why these shapes:

- **Top-N** — Flink SQL runs Window Top-N natively; Spark cannot rank
  over a streaming aggregate inside one query (no window functions
  downstream of a streaming groupBy).  The Spark-first equivalent
  relies on an append-mode guarantee: every (window, user) group of a
  given event-time window is finalized by the SAME watermark crossing,
  so all of a window's rows arrive in ONE micro-batch — ranking inside
  ``foreachBatch`` therefore sees each window complete, and emits
  exactly the batch operator's top-k.
- **EWMA** — the baseline needs the trailing ``lookback`` CLOSED
  windows, a 20-row tail no built-in stateful operator models; the
  incremental-batch pattern (foreachBatch + on-disk state, the
  ``streaming/pipeline.py`` recipe) carries it.  State writes are
  batch-id-keyed and promoted by a ``_done`` marker (exactly-once
  under crash-replay, same staging protocol as the curation
  pipeline).  The per-batch fold runs driver-side over the window
  tail — bounded by construction: one row per ``size_sec`` of event
  time per batch, plus the ≤ ``lookback``-row history.

Both twins are restart-tested equal to their batch operators in
``tests/test_stream_alerts.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def windowed_user_counts_stream(
    events: DataFrame, size_sec: int = 60, watermark: str = "10 seconds"
) -> DataFrame:
    """Append-mode (window, user) event counts — the streamable half
    of window Top-N; each group is emitted once, when the watermark
    closes its window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.window("ts", f"{size_sec} seconds").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format(F.col("w.end"), TS_FMT).alias("window_end"),
            "user_id",
            "n_events",
        )
    )


def make_topn_batch_fn(out_dir: str, k: int = 3):
    """foreachBatch for the streaming window Top-N, with the same
    exactly-once staging protocol as :func:`make_ewma_batch_fn`: the
    ranked rows land under a batch-id-keyed path (overwrite-
    idempotent) and only the ``_done/<id>`` marker, written last,
    promotes them — a crash between the write and the streaming
    checkpoint commit replays the batch into the SAME staged path
    instead of appending the windows' top-k a second time."""

    def rank_and_write(batch: DataFrame, batch_id: int) -> None:
        marker = f"{out_dir}/_done/{batch_id}"
        if os.path.exists(marker):
            return
        w = Window.partitionBy("window_end").orderBy(
            F.col("n_events").desc(), F.col("user_id").asc()
        )
        (
            batch.withColumn(
                "rnk", F.row_number().over(w).cast("bigint")
            )
            .filter(F.col("rnk") <= k)
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch-{batch_id}")
        )
        os.makedirs(f"{out_dir}/_done", exist_ok=True)
        open(marker, "w").close()

    return rank_and_write


def read_topn_alerts(spark, out_dir: str) -> DataFrame:
    """Top-N rows of COMMITTED batches only — a crashed attempt's
    staged ``batch-<id>`` (marker never written) is invisible."""
    committed = _committed_ids(out_dir)
    if not committed:
        return spark.createDataFrame(
            [],
            "window_end string, user_id long, n_events bigint,"
            " rnk bigint",
        )
    return spark.read.parquet(
        *[f"{out_dir}/batch-{i}" for i in committed]
    )


def window_topn_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    size_sec: int = 60,
    k: int = 3,
    watermark: str = "10 seconds",
):
    """Start the streaming window Top-N: rank inside foreachBatch
    (each closed window arrives whole — see module docstring), stage
    the top-``k`` per window under ``out_dir/batch-<id>`` promoted by
    a marker (exactly-once; read back with :func:`read_topn_alerts`).
    availableNow trigger — rerun as data arrives, like any
    incremental batch job."""

    return (
        windowed_user_counts_stream(events, size_sec, watermark)
        .writeStream.foreachBatch(make_topn_batch_fn(out_dir, k))
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def _committed_ids(state_root: str) -> list[int]:
    done = f"{state_root}/_done"
    if not os.path.isdir(done):
        return []
    return sorted(int(n) for n in os.listdir(done) if n.isdigit())


def make_ewma_batch_fn(
    state_root: str, lookback: int = 20, factor: int = 2
):
    """foreachBatch for the EWMA anomaly stream.  Input batches are
    closed-window counts (window_end string, ones_exact) from the
    append-mode tumble aggregate; state is the trailing ``lookback``
    window tail, batch-id-keyed + marker-promoted (exactly-once)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        marker = f"{state_root}/_done/{batch_id}"
        if os.path.exists(marker):
            return
        spark = batch.sparkSession
        committed = _committed_ids(state_root)
        if committed:
            tail = spark.read.parquet(
                f"{state_root}/tail/batch-{committed[-1]}"
            ).collect()
            hist = sorted(
                (r["window_end"], r["ones_exact"]) for r in tail
            )
        else:
            hist = []
        new = sorted(
            (r["window_end"], r["ones_exact"])
            for r in batch.select("window_end", "ones_exact").collect()
        )
        rows = []
        counts = [c for _, c in hist]
        for wend, ones in new:
            hl = counts[-lookback:]
            L = len(hl)
            num = sum(
                x * (1 << (lookback - L + i)) for i, x in enumerate(hl)
            )
            denom = (1 << lookback) - (1 << (lookback - L))
            ewma_e6 = (num * 1000000) // denom if L else 0
            flag = 1 if (L and ones * denom > factor * num) else 0
            rows.append((wend, int(ones), int(ewma_e6), int(flag)))
            counts.append(ones)
        schema = (
            "window_end string, ones_exact bigint, ewma_e6 bigint,"
            " is_anomaly bigint"
        )
        spark.createDataFrame(rows, schema).repartition(1).write.mode(
            "overwrite"
        ).parquet(f"{state_root}/out/batch-{batch_id}")
        new_tail = (hist + new)[-lookback:]
        spark.createDataFrame(
            new_tail, "window_end string, ones_exact bigint"
        ).repartition(1).write.mode("overwrite").parquet(
            f"{state_root}/tail/batch-{batch_id}"
        )
        os.makedirs(f"{state_root}/_done", exist_ok=True)
        open(marker, "w").close()

    return process


def ewma_anomaly_stream(
    parsed: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    size_sec: int = 60,
    lookback: int = 20,
    factor: int = 2,
    watermark: str = "10 seconds",
):
    """Start the streaming EWMA anomaly job over the traffic stream
    (bit/ts rows, the ``tumble_exact_stream`` input shape)."""
    counts = (
        parsed.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(F.sum("bit").cast("bigint").alias("ones_exact"))
        .select(
            F.date_format(F.col("w.end"), TS_FMT).alias("window_end"),
            "ones_exact",
        )
    )
    return (
        counts.writeStream.foreachBatch(
            make_ewma_batch_fn(state_root, lookback, factor)
        )
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def read_ewma_alerts(spark, state_root: str) -> DataFrame:
    committed = _committed_ids(state_root)
    if not committed:
        return spark.createDataFrame(
            [],
            "window_end string, ones_exact bigint, ewma_e6 bigint,"
            " is_anomaly bigint",
        )
    return spark.read.parquet(
        *[f"{state_root}/out/batch-{i}" for i in committed]
    )


def windowed_distinct_users_stream(
    events: DataFrame,
    size_sec: int = 60,
    rsd: float = 0.02,
    watermark: str = "10 seconds",
) -> DataFrame:
    """Streaming twin of ``windows.windowed_distinct_users_approx``:
    per closed tumbling window, the HLL++ distinct-user estimate —
    append mode, sketch-sized state per open window (the exact
    COUNT(DISTINCT) is not streamable without holding every user id
    in state; the sketch twin is the production dashboard path).
    HLL merge is associative/commutative, so the estimate equals the
    batch operator's bit-for-bit (tested)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(
            F.approx_count_distinct("user_id", rsd).alias(
                "n_users_approx"
            ),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(F.col("w.end"), TS_FMT).alias("window_end"),
            "n_users_approx",
            "n_rows",
        )
    )


def m4_downsample_stream(
    events: DataFrame, size_sec: int = 600, watermark: str = "10 seconds"
) -> DataFrame:
    """Streaming twin of ``windows.m4_downsample``: per closed
    tumbling bucket, the four value-defining points (first/last by
    (ts, event_id), min/max of ``value``) — a NATIVE append-mode
    aggregate, because first/last ride the same struct min/max trick
    as the batch operator (associative + commutative, so Spark's
    partial-aggregation streaming state is exact).  No foreachBatch,
    no Python state: the dashboard decimation runs entirely JVM-side
    with sketch-sized state per open window.  Equals the batch
    operator bit-for-bit over closed windows (tested)."""
    pt = F.struct(
        F.unix_micros(F.col("ts")).alias("us"),
        F.col("event_id").alias("eid"),
        F.col("value").alias("v"),
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{size_sec} seconds").alias("w"))
        .agg(
            F.min(pt).alias("first_pt"),
            F.max(pt).alias("last_pt"),
            F.min("value").alias("v_min"),
            F.max("value").alias("v_max"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            F.date_format(F.col("w.end"), TS_FMT).alias("window_end"),
            F.col("first_pt.v").alias("v_first"),
            F.col("last_pt.v").alias("v_last"),
            "v_min",
            "v_max",
            "n_rows",
        )
    )


def make_seasonal_batch_fn(state_root: str, size_sec: int = 60):
    """foreachBatch for the seasonal-baseline anomaly stream: the
    batch's raw events aggregate to (event_type, we_sec, cnt)
    increments that MERGE (sum) into the committed windows-count
    snapshot — late rows simply add to their original window's key,
    like the rollup refresh.  Snapshot writes are batch-id-keyed and
    promoted by the ``_done`` marker last (exactly-once: a replayed
    crashed batch re-merges from the same committed base into the
    same staged path; a replayed committed batch returns
    immediately).  Flags are NOT stored — they are derived from the
    counts snapshot at read time via the SAME
    ``operators.windows.seasonal_flags`` code the batch operator
    runs, so stream and batch can never drift."""

    def process(batch: DataFrame, batch_id: int) -> None:
        marker = f"{state_root}/_done/{batch_id}"
        if os.path.exists(marker):
            return
        spark = batch.sparkSession
        inc = (
            batch.groupBy(
                "event_type",
                F.window("ts", f"{size_sec} seconds").alias("w"),
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .select(
                "event_type",
                F.unix_timestamp("w.end").alias("we_sec"),
                "cnt",
            )
        )
        committed = _committed_ids(state_root)
        if committed:
            base = spark.read.parquet(
                f"{state_root}/counts/batch-{committed[-1]}"
            )
            merged = (
                base.unionByName(inc)
                .groupBy("event_type", "we_sec")
                .agg(F.sum("cnt").cast("bigint").alias("cnt"))
            )
        else:
            merged = inc
        merged.write.mode("overwrite").parquet(
            f"{state_root}/counts/batch-{batch_id}"
        )
        os.makedirs(f"{state_root}/_done", exist_ok=True)
        open(marker, "w").close()

    return process


def read_seasonal_counts(spark, state_root: str) -> DataFrame:
    """Windows-count snapshot of the LATEST committed batch (a
    crashed attempt's staged snapshot is invisible)."""
    committed = _committed_ids(state_root)
    if not committed:
        return spark.createDataFrame(
            [], "event_type string, we_sec bigint, cnt bigint"
        )
    return spark.read.parquet(
        f"{state_root}/counts/batch-{committed[-1]}"
    )


def seasonal_anomaly_stream(
    events: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    size_sec: int = 60,
):
    """Start the streaming seasonal-baseline maintenance over raw
    events (no watermark needed: the state merge is keyed by window,
    so arbitrarily late rows fold into their original window).  Query
    flags with ``operators.windows.seasonal_flags(
    read_seasonal_counts(spark, state_root))``."""
    return (
        events.writeStream.foreachBatch(
            make_seasonal_batch_fn(state_root, size_sec)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def make_late_audit_batch_fn(
    state_root: str,
    arrival_us_col: str = "arrival_us",
    late_after_sec: int = 60,
    size_sec: int = 600,
):
    """foreachBatch for the streaming lateness audit: the watermark a
    streaming engine holds IS cross-batch state, so each batch (a)
    seeds the row-level lateness computation with the committed
    high-water mark, (b) folds the batch's per-window partials into
    the committed counts snapshot (counts/sums add, max maxes), and
    (c) advances the stored watermark — all under the batch-id
    staging + marker protocol (exactly-once; a crashed attempt
    re-stages from the same committed base).  Requires batches to
    arrive in arrival order (the streaming contract the audit
    measures against), same as every incremental-batch twin here."""
    from flink_window_dgim_traffic_spark.operators import windows as W

    def process(batch: DataFrame, batch_id: int) -> None:
        marker = f"{state_root}/_done/{batch_id}"
        if os.path.exists(marker):
            return
        spark = batch.sparkSession
        committed = _committed_ids(state_root)
        if committed:
            prev = spark.read.parquet(
                f"{state_root}/wm/batch-{committed[-1]}"
            ).collect()
            init_wm = int(prev[0]["wm_us"]) if prev else None
        else:
            init_wm = None
        rows = W.lateness_rows(
            batch, arrival_us_col, init_wm_us=init_wm
        )
        inc = W.late_audit_increment(rows, late_after_sec, size_sec)
        if committed:
            base = spark.read.parquet(
                f"{state_root}/counts/batch-{committed[-1]}"
            )
            merged = (
                base.unionByName(inc)
                .groupBy("_we_sec")
                .agg(
                    F.sum("n_events").cast("bigint").alias("n_events"),
                    F.sum("n_late").cast("bigint").alias("n_late"),
                    F.max("max_lateness_us")
                    .cast("bigint")
                    .alias("max_lateness_us"),
                    F.sum("sum_lateness_us")
                    .cast("bigint")
                    .alias("sum_lateness_us"),
                )
            )
        else:
            merged = inc
        merged.write.mode("overwrite").parquet(
            f"{state_root}/counts/batch-{batch_id}"
        )
        bm = batch.agg(
            F.max(F.unix_micros(F.col("ts"))).alias("m")
        ).collect()[0]["m"]
        new_wm = max(
            x for x in (init_wm, bm, -(1 << 62)) if x is not None
        )
        spark.createDataFrame(
            [(int(new_wm),)], "wm_us bigint"
        ).repartition(1).write.mode("overwrite").parquet(
            f"{state_root}/wm/batch-{batch_id}"
        )
        os.makedirs(f"{state_root}/_done", exist_ok=True)
        open(marker, "w").close()

    return process


def read_late_audit(spark, state_root: str) -> DataFrame:
    """Formatted audit from the LATEST committed snapshot."""
    from flink_window_dgim_traffic_spark.operators.windows import (
        _late_format,
    )

    committed = _committed_ids(state_root)
    if not committed:
        return spark.createDataFrame(
            [],
            "window_end string, n_events bigint, n_late bigint,"
            " max_lateness_us bigint, sum_lateness_us bigint",
        )
    return _late_format(
        spark.read.parquet(
            f"{state_root}/counts/batch-{committed[-1]}"
        )
    )


def late_audit_stream(
    events: DataFrame,
    state_root: str,
    checkpoint_dir: str,
    arrival_us_col: str = "arrival_us",
    late_after_sec: int = 60,
    size_sec: int = 600,
):
    """Start the streaming lateness audit (availableNow; query the
    result with :func:`read_late_audit`)."""
    return (
        events.writeStream.foreachBatch(
            make_late_audit_batch_fn(
                state_root, arrival_us_col, late_after_sec, size_sec
            )
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def vacuum_snapshot_state(
    state_root: str,
    snapshot_dirs: tuple[str, ...] = ("counts", "wm", "tail", "current"),
) -> int:
    """Reclaim superseded snapshot batches from an incremental-batch
    state root (seasonal counts, lateness audit counts/wm, EWMA tail,
    SCD2 current): every committed batch writes a FULL snapshot, so
    only the latest committed one is ever read — earlier snapshots
    exist purely as crash-recovery history and can be deleted once a
    newer commit exists.  Keeps: the latest committed snapshot in
    each listed subdir, every ``_done`` marker (replay-skip needs
    them), every staged-but-uncommitted batch (a live attempt may be
    mid-flight), and any subdir not listed (immutable logs like
    ``out``/``closed`` are per-batch INCREMENTS, never superseded).
    Idempotent and crash-safe: it only deletes directories no reader
    or replayer can resolve.  Returns the number of snapshot dirs
    removed."""
    import shutil

    committed = _committed_ids(state_root)
    if len(committed) < 1:
        return 0
    latest = committed[-1]
    removed = 0
    for sub in snapshot_dirs:
        d = f"{state_root}/{sub}"
        if not os.path.isdir(d):
            continue
        for n in os.listdir(d):
            if not n.startswith("batch-"):
                continue
            suffix = n[len("batch-"):]
            if not suffix.isdigit():
                continue
            i = int(suffix)
            # delete only COMMITTED-and-superseded snapshots: an id
            # without a marker may be a live attempt's staging dir
            if i < latest and i in committed:
                shutil.rmtree(f"{d}/{n}", ignore_errors=True)
                removed += 1
    return removed
