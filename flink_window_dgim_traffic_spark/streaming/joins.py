"""Stream-stream interval join — the stateful join capability the
reference lacks entirely (its jobs are single-stream aggregations).

The canonical shape: for each purchase, the views by the same user in
the preceding ``max_delay`` interval.  Both sides carry watermarks so
Spark can bound the join state: a view's row is dropped from state
once the purchase-side watermark passes ``view.ts + max_delay``.
Results are tested identical to the equivalent batch interval join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_purchase_interval_join(
    views: DataFrame,
    purchases: DataFrame,
    max_delay_sec: int = 3600,
    watermark: str = "0 seconds",
    streaming: bool = True,
) -> DataFrame:
    """Purchases joined to same-user views within the trailing
    ``max_delay_sec``: ``view.ts ∈ [purchase.ts - max_delay,
    purchase.ts]``.  Works on streaming inputs (watermarked, bounded
    state) and batch inputs (``streaming=False``) with identical
    semantics — the equality is what tests assert."""
    v = views.select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    if streaming:
        v = v.withWatermark("v_ts", watermark)
        p = p.withWatermark("p_ts", watermark)
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_delay_sec} SECONDS"))
    )
    return v.join(p, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        F.date_format("p_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("v_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
    )


def window_join_stream(
    left: DataFrame,
    right: DataFrame,
    size_sec: int = 600,
    watermark: str = "600 seconds",
    streaming: bool = True,
) -> DataFrame:
    """Stream-stream WINDOW join (Flink SQL's windowing-TVF join, the
    streaming twin of ``operators/windows.window_join``): rows of the
    two streams that fall in the SAME tumbling window with the same
    user join; Spark recognizes the tumble-window EQUALITY as a
    state-cleanup condition (both sides' state for a window is
    dropped once both watermarks pass window end), so state is
    bounded without an explicit time-range predicate.

    ``watermark`` trades state size against late-data tolerance: an
    event older than (max seen ts - watermark) is dropped from the
    join INPUT, so ``'0 seconds'`` silently loses any row that
    arrives one micro-batch after a later-timestamped row.  The
    default tolerates one window of disorder; pass ``'0 seconds'``
    only for strictly time-ordered replays.  (Inner-join OUTPUT
    rows emit on match regardless of the watermark — it bounds
    state and input lateness, not result timing.)

    Output: (window_end, user_id, l_event_id, r_event_id) — the same
    shape as the batch operator; tests assert stream == batch."""
    l = left.select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    r = right.select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    if streaming:
        l = l.withWatermark("l_ts", watermark)
        r = r.withWatermark("r_ts", watermark)
    lw = l.withColumn("lw", F.window("l_ts", f"{size_sec} seconds"))
    rw = r.withColumn("rw", F.window("r_ts", f"{size_sec} seconds"))
    j = lw.join(
        rw,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("lw") == F.col("rw")),
    )
    return j.select(
        F.date_format(F.col("lw.end"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_end"
        ),
        F.col("l_user").alias("user_id"),
        "l_event_id",
        "r_event_id",
    )
