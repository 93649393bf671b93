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
    slide_sec: int | None = None,
    cumulate_step_sec: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream WINDOW join (Flink SQL's windowing-TVF join, the
    streaming twin of ``operators/windows.window_join``): rows of the
    two streams that fall in the SAME window with the same user join;
    Spark recognizes the tumble-window EQUALITY as a state-cleanup
    condition (both sides' state for a window is dropped once both
    watermarks pass window end), so state is bounded without an
    explicit time-range predicate.

    ``slide_sec`` (HOP) / ``cumulate_step_sec`` (CUMULATE) extend the
    streaming twin to the full TVF family by REDUCTION TO TUMBLE:
    each row first explodes map-side into the END timestamps of its
    covering windows (the same slot math as the batch operator), the
    watermark rides the derived slot time, and the join becomes a
    step-sized tumble-window equality over slot ends — distinct ends
    are ≥ step apart, so tumble-pane equality ⇔ slot equality, and
    Spark's window-equality state cleanup applies unchanged.  The
    slot time leads the event time by at most ``size``, so lateness
    semantics shift by a constant only.

    ``watermark`` trades state size against late-data tolerance: an
    event older than (max seen ts - watermark) is dropped from the
    join INPUT, so ``'0 seconds'`` silently loses any row that
    arrives one micro-batch after a later-timestamped row.  The
    default tolerates one window of disorder; pass ``'0 seconds'``
    only for strictly time-ordered replays.  (Inner-join OUTPUT
    rows emit on match regardless of the watermark — it bounds
    state and input lateness, not result timing.)

    ``how``: ``inner`` or ``left_semi`` — Spark supports left-semi
    stream-stream joins under the same watermark/window-equality
    state contract (a left row emits once on its first right match;
    its state is held until both watermarks pass the window).
    ``left_anti`` is intentionally NOT offered in streaming: absence
    is only decidable at watermark expiry, which Spark surfaces as a
    left-OUTER join with null right side — the batch/SQL anti twins
    cover that semantics deterministically.

    Output: (window_end, user_id, l_event_id[, r_event_id]) — the
    same shape as the batch operator; tests assert stream == batch."""
    if slide_sec is not None and cumulate_step_sec is not None:
        raise ValueError(
            "slide_sec and cumulate_step_sec are mutually exclusive"
        )
    if how not in ("inner", "left_semi"):
        raise ValueError(
            f"how must be inner or left_semi in streaming mode, got"
            f" {how!r} (anti = left-outer-at-watermark; use the batch"
            f" operator)"
        )
    size_us = int(size_sec) * 1_000_000

    if slide_sec is None and cumulate_step_sec is None:
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
        cond = (F.col("l_user") == F.col("r_user")) & (
            F.col("lw") == F.col("rw")
        )
        head = [
            F.date_format(F.col("lw.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_end"
            ),
            F.col("l_user").alias("user_id"),
            "l_event_id",
        ]
        if how == "left_semi":
            return lw.join(
                rw.select("r_user", "rw"), cond, "left_semi"
            ).select(*head)
        return lw.join(rw, cond).select(*head, "r_event_id")

    if slide_sec is not None:
        if int(size_sec) % int(slide_sec):
            raise ValueError("size_sec must be a multiple of slide_sec")
        step_us = int(slide_sec) * 1_000_000
        # hop: pane p covers windows ending (p+1)*step .. p*step+size
        ends = F.sequence(
            F.expr(f"(_us div {step_us} + 1) * {step_us}"),
            F.expr(f"_us div {step_us} * {step_us} + {size_us}"),
            F.lit(step_us).cast("bigint"),
        )
    else:
        if int(size_sec) % int(cumulate_step_sec):
            raise ValueError(
                "size_sec must be a multiple of cumulate_step_sec"
            )
        step_us = int(cumulate_step_sec) * 1_000_000
        # cumulate: ends of the covering cumulative windows of the
        # row's span (same math as the batch operator)
        ends = F.sequence(
            F.expr(
                f"_ws + ((_us - _ws) div {step_us} + 1) * {step_us}"
            ),
            F.expr(f"_ws + {size_us}"),
            F.lit(step_us).cast("bigint"),
        )

    # The watermark rides the exploded SLOT column, and one event's
    # slots span (size - step) — e.g. 300 s at hop defaults.  Measured
    # semantics (tests/test_stream_joins.py disorder pin): Spark does
    # NOT input-drop late stream-join rows; pairs are lost only when
    # the other side's pane STATE is evicted, which fires at pane end
    # (slot + step) against wm = max_slot − delay.  Since max_slot
    # leads the driving event by the spread, an unwidened delay W
    # starts losing pairs right AT disorder ≈ W — zero margin on the
    # documented tolerance.  Adding the intra-event spread to the
    # slot delay moves the loss boundary to ≈ W + spread, giving the
    # contract real slack; state cost is each pane held (size - step)
    # longer, a constant per-pane factor.
    spread_us = size_us - step_us
    slot_watermark = watermark
    if spread_us > 0:
        if "microsecond" in watermark:
            raise ValueError(
                "express the watermark without a microseconds unit in"
                " hop/cumulate mode (the slot-spread correction"
                " appends one)"
            )
        # Spark's CalendarInterval parser accepts multi-unit strings
        # in descending unit order; microseconds is the smallest, so
        # appending it composes with any coarser user interval.
        slot_watermark = f"{watermark} {spread_us} microseconds"

    def prep(df: DataFrame, side: str) -> DataFrame:
        base = df.select(
            F.col("user_id").alias(f"{side}_user"),
            F.col("event_id").alias(f"{side}_event_id"),
            F.expr("unix_micros(ts)").alias("_us"),
            F.expr(
                f"unix_micros(ts) div {size_us} * {size_us}"
            ).alias("_ws"),
        )
        out = base.select(
            f"{side}_user",
            f"{side}_event_id",
            F.explode(ends).alias("_slot_us"),
        ).select(
            f"{side}_user",
            f"{side}_event_id",
            F.timestamp_micros(F.col("_slot_us")).alias(f"{side}_slot"),
        )
        if streaming:
            out = out.withWatermark(f"{side}_slot", slot_watermark)
        return out

    # project the raw slot AWAY after deriving its tumble pane —
    # keeping both would give the stream two event-time columns.
    # Slot ends are exact multiples of step, so slot == pane start.
    step_sec = step_us // 1_000_000
    l = prep(left, "l").select(
        "l_user",
        "l_event_id",
        F.window("l_slot", f"{step_sec} seconds").alias("lw"),
    )
    r = prep(right, "r").select(
        "r_user",
        "r_event_id",
        F.window("r_slot", f"{step_sec} seconds").alias("rw"),
    )
    cond = (F.col("l_user") == F.col("r_user")) & (
        F.col("lw") == F.col("rw")
    )
    head = [
        F.date_format(F.col("lw.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_end"
        ),
        F.col("l_user").alias("user_id"),
        "l_event_id",
    ]
    if how == "left_semi":
        return l.join(
            r.select("r_user", "rw"), cond, "left_semi"
        ).select(*head)
    return l.join(r, cond).select(*head, "r_event_id")
