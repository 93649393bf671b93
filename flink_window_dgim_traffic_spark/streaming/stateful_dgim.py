"""Incremental streaming DGIM via ``applyInPandasWithState`` — the
bounded-state alternative to per-window replay (SURVEY.md §7.3).

The reference keeps one DGIM accumulator per open window inside
Flink's window operator (``DGIMAggregateFunction.java:41-71``); here
the sketch lives in the Spark state store keyed by window end, updated
once per micro-batch and emitted in update mode.  State per key is the
flattened bucket list — O(log² N), exactly the bound the sketch
exists for.
"""

from __future__ import annotations

from datetime import timezone
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming import StatefulProcessor

from flink_window_dgim_traffic_spark.dgim import DGIM, MODE_JAVA

STATE_SCHEMA = "flat array<bigint>"
OUTPUT_SCHEMA = (
    "window_end string, count_estimate bigint, exact_count bigint, n_rows bigint"
)


def make_dgim_update_fn(size_sec: int, mode: str = MODE_JAVA, evict: bool = False):
    """Build the applyInPandasWithState update function (importable at
    module scope so cloudpickle ships only the closure config).

    With ``evict=True`` (requires a watermark + EventTimeTimeout) the
    state for a window is dropped once the event-time watermark passes
    its end: per-key state is O(log² N) by the sketch, and eviction
    makes TOTAL state O(open windows) instead of O(all windows ever) —
    the difference between bounded and unbounded state at 100 TB."""

    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        if evict and state.hasTimedOut:
            # watermark passed window end: final value was already
            # emitted in update mode; just drop the state
            state.remove()
            return
        if state.exists:
            (flat, ones, nrows) = state.get
            sk = DGIM.from_flat(size_sec, list(flat), mode=mode)
        else:
            sk, ones, nrows = DGIM(size_sec, mode=mode), 0, 0
        for pdf in pdfs:
            sub = pdf.sort_values("ts_sec", kind="mergesort")
            for b, t in zip(sub["bit"].to_numpy(), sub["ts_sec"].to_numpy()):
                if b == 1:
                    sk.add(int(t))
                    ones += 1
            nrows += len(sub)
        state.update((sk.to_flat(), ones, nrows))
        # The grouping key arrives as a NAIVE datetime in the Spark
        # session timezone (UTC per session.py).  Derive BOTH the
        # timeout epoch and the window label from the same explicit
        # naive-as-UTC reading — `.timestamp()` on a naive datetime
        # would instead apply the HOST timezone, shifting eviction by
        # the UTC offset on non-UTC hosts.
        we_utc = key[0].replace(tzinfo=timezone.utc)
        if evict:
            # drop state once the watermark reaches the window end
            state.setTimeoutTimestamp(int(we_utc.timestamp() * 1000))
        yield pd.DataFrame(
            {
                "window_end": [we_utc.strftime("%Y-%m-%d %H:%M:%S")],
                "count_estimate": [sk.estimate()],
                "exact_count": [ones],
                "n_rows": [nrows],
            }
        )

    return update


def tumble_dgim_stream(
    parsed,
    size_sec: int = 60,
    mode: str = MODE_JAVA,
    watermark: str | None = None,
):
    """Update-mode streaming DGIM per tumbling window (the reference's
    Java tumbling + PyFlink jobs).  Input must be ``parse_traffic``
    output (bit, ts, ts_sec).

    With ``watermark`` set, window state is EVICTED once the watermark
    passes the window end (EventTimeTimeout) — total state bounded by
    open windows."""
    from pyspark.sql import functions as F

    evict = watermark is not None
    src = parsed.withWatermark("ts", watermark) if evict else parsed
    # keep the watermarked ts column itself: EventTimeTimeout requires
    # the event-time attribute to reach the stateful operator
    extra = ("ts",) if evict else ()
    keyed = src.select(
        F.window("ts", f"{size_sec} seconds").getItem("end").alias("we"),
        "bit",
        "ts_sec",
        *extra,
    )
    return keyed.groupBy("we").applyInPandasWithState(
        make_dgim_update_fn(size_sec, mode, evict=evict),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA + ", ones bigint, nrows bigint",
        outputMode="update",
        timeoutConf="EventTimeTimeout" if evict else "NoTimeout",
    )


# ----------------------------------------------------------------------
# transformWithStateInPandas variant (Spark 4.x StatefulProcessor API)
# ----------------------------------------------------------------------
def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime can start
    (requires protobuf for its state-server protocol)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
class DGIMProcessor(StatefulProcessor):
    """The ``transformWithStateInPandas`` StatefulProcessor for the
    incremental tumbling DGIM (typed ValueState handle instead of
    applyInPandasWithState's single state tuple).  Defined at module
    level so tests can construct it and drive init/handleInputRows
    directly with a fake state handle — the full state round-trip
    (from_flat/to_flat, multi-batch accumulation, output frame) is
    exercised even where the TWS protobuf runtime is absent (the
    class itself imports protobuf-free; only the runtime's state
    server needs it)."""

    def __init__(self, size_sec: int, mode: str = MODE_JAVA) -> None:
        self._size_sec = size_sec
        self._mode = mode

    def init(self, handle) -> None:
        self._st = handle.getValueState(
            "sketch", "flat array<bigint>, ones bigint, nrows bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._st.exists():
            flat, ones, nrows = self._st.get()
            sk = DGIM.from_flat(self._size_sec, list(flat), mode=self._mode)
        else:
            sk, ones, nrows = DGIM(self._size_sec, mode=self._mode), 0, 0
        for pdf in rows:
            sub = pdf.sort_values("ts_sec", kind="mergesort")
            for b, t in zip(
                sub["bit"].to_numpy(), sub["ts_sec"].to_numpy()
            ):
                if b == 1:
                    sk.add(int(t))
                    ones += 1
            nrows += len(sub)
        self._st.update((sk.to_flat(), ones, nrows))
        yield pd.DataFrame(
            {
                "window_end": [key[0].strftime("%Y-%m-%d %H:%M:%S")],
                "count_estimate": [sk.estimate()],
                "exact_count": [ones],
                "n_rows": [nrows],
            }
        )

    def close(self) -> None:
        pass


def tumble_dgim_stream_tws(parsed, size_sec: int = 60, mode: str = MODE_JAVA):
    """Same incremental tumbling DGIM as :func:`tumble_dgim_stream`,
    on the current-generation ``transformWithStateInPandas`` API.
    Kept alongside the applyInPandasWithState path so both stateful
    APIs stay exercised; outputs are tested identical.

    NOTE: the TWS runtime needs ``google.protobuf`` (its state-server
    protocol), which this container lacks — the end-to-end run gates
    on :func:`tws_available`; on a normal Spark 4.x install it runs.
    Vendoring was ruled out after a system-wide search (no protobuf
    wheel, conda pkg, or site-packages copy exists anywhere on this
    host, and package installation is banned).  The processor ITSELF
    (:class:`DGIMProcessor`) is runtime-independent and is driven
    directly with a fake state handle in tests/test_streaming.py, so
    the path is exercised — batch-replay equality asserted — with or
    without protobuf."""
    from pyspark.sql import functions as F

    keyed = parsed.select(
        F.window("ts", f"{size_sec} seconds").getItem("end").alias("we"),
        "bit",
        "ts_sec",
    )
    return keyed.groupBy("we").transformWithStateInPandas(
        statefulProcessor=DGIMProcessor(size_sec, mode),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


HOP_OUTPUT_SCHEMA = (
    "window_start string, window_end string, "
    "count_estimate bigint, exact_count bigint, n_rows bigint"
)


def make_hop_dgim_update_fn(
    size_sec: int, mode: str = MODE_JAVA, evict: bool = False
):
    """Like :func:`make_dgim_update_fn` but keyed by (window_start,
    window_end) — the composite upsert key of the reference's sliding
    job (``SlidingWindowStreamingJob.java:72-74``)."""

    def update(key, pdfs, state):
        if evict and state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            (flat, ones, nrows) = state.get
            sk = DGIM.from_flat(size_sec, list(flat), mode=mode)
        else:
            sk, ones, nrows = DGIM(size_sec, mode=mode), 0, 0
        for pdf in pdfs:
            sub = pdf.sort_values("ts_sec", kind="mergesort")
            for b, t in zip(sub["bit"].to_numpy(), sub["ts_sec"].to_numpy()):
                if b == 1:
                    sk.add(int(t))
                    ones += 1
            nrows += len(sub)
        state.update((sk.to_flat(), ones, nrows))
        # Same naive-as-UTC reading as the tumble twin above:
        # `.timestamp()` on the naive key would apply the HOST
        # timezone and shift eviction by the UTC offset.
        we_utc = key[1].replace(tzinfo=timezone.utc)
        if evict:
            state.setTimeoutTimestamp(int(we_utc.timestamp() * 1000))
        yield pd.DataFrame(
            {
                "window_start": [key[0].strftime("%Y-%m-%d %H:%M:%S")],
                "window_end": [key[1].strftime("%Y-%m-%d %H:%M:%S")],
                "count_estimate": [sk.estimate()],
                "exact_count": [ones],
                "n_rows": [nrows],
            }
        )

    return update


def cumulate_dgim_stream(
    parsed,
    max_size_sec: int = 60,
    step_sec: int = 10,
    mode: str = MODE_JAVA,
    watermark: str | None = None,
):
    """Update-mode streaming DGIM per CUMULATE window — completes the
    streaming DGIM family (tumble / hop / cumulate).  Spark has no
    CUMULATE TVF, so each record explodes map-side into the
    (span_start, end) pairs of the cumulative windows that cover it
    (≤ span/step slots — the same end math as the batch operator and
    the cumulate window join), and the state is keyed by that pair
    with the SAME update function as the hop job: one DGIM sketch per
    open cumulative window, O(log² N) state per key.  With
    ``watermark`` set, a window's state evicts once the watermark
    passes its end."""
    from pyspark.sql import functions as F

    evict = watermark is not None
    src = parsed.withWatermark("ts", watermark) if evict else parsed
    extra = ("ts",) if evict else ()
    size_us = int(max_size_sec) * 1_000_000
    step_us = int(step_sec) * 1_000_000
    base = src.select(
        F.expr(f"unix_micros(ts) div {size_us} * {size_us}").alias(
            "_ws_us"
        ),
        F.expr("unix_micros(ts)").alias("_us"),
        "bit",
        "ts_sec",
        *extra,
    )
    ends = F.sequence(
        F.expr(f"_ws_us + ((_us - _ws_us) div {step_us} + 1) * {step_us}"),
        F.expr(f"_ws_us + {size_us}"),
        F.lit(step_us).cast("bigint"),
    )
    keyed = base.select(
        "_ws_us",
        F.explode(ends).alias("_we_us"),
        "bit",
        "ts_sec",
        *extra,
    ).select(
        F.timestamp_micros(F.col("_ws_us")).alias("ws"),
        F.timestamp_micros(F.col("_we_us")).alias("we"),
        "bit",
        "ts_sec",
        *extra,
    )
    return keyed.groupBy("ws", "we").applyInPandasWithState(
        make_hop_dgim_update_fn(max_size_sec, mode, evict=evict),
        outputStructType=HOP_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA + ", ones bigint, nrows bigint",
        outputMode="update",
        timeoutConf="EventTimeTimeout" if evict else "NoTimeout",
    )


def hop_dgim_stream(
    parsed,
    size_sec: int = 60,
    slide_sec: int = 10,
    mode: str = MODE_JAVA,
    watermark: str | None = None,
):
    """Update-mode streaming DGIM per hopping window — the reference's
    sliding job (``SlidingWindowStreamingJob.java:92-111``) as a
    stateful stream.  Each record updates size/slide window states;
    state per key stays O(log² N).  With ``watermark`` set, a
    window's state is evicted once the watermark passes its end
    (same EventTimeTimeout pattern as the tumbling job)."""
    from pyspark.sql import functions as F

    evict = watermark is not None
    src = parsed.withWatermark("ts", watermark) if evict else parsed
    extra = ("ts",) if evict else ()
    keyed = src.select(
        F.window("ts", f"{size_sec} seconds", f"{slide_sec} seconds").alias("w"),
        "bit",
        "ts_sec",
        *extra,
    ).select(
        F.col("w.start").alias("ws"),
        F.col("w.end").alias("we"),
        "bit",
        "ts_sec",
        *extra,
    )
    return keyed.groupBy("ws", "we").applyInPandasWithState(
        make_hop_dgim_update_fn(size_sec, mode, evict=evict),
        outputStructType=HOP_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA + ", ones bigint, nrows bigint",
        outputMode="update",
        timeoutConf="EventTimeTimeout" if evict else "NoTimeout",
    )
