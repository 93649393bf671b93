"""Streaming ordered-stage funnel — Flink-CEP-class sequence
detection (``MATCH_RECOGNIZE``) on Spark, as the streaming twin of
``operators.relational.event_funnel``.

Flink's CEP operator buffers elements until the watermark passes them
and only then runs the pattern automaton in event-time order, which
is what makes it insensitive to arrival order.  This module
reproduces that contract with ``applyInPandasWithState``:

- per-user state holds the funnel's running minima (stage-k earliest
  qualifying time) plus a BUFFER of events newer than the watermark;
- each invoke folds only the RIPE buffered events (event time ≤
  current watermark, read via ``state.getCurrentWatermarkMs``) into
  the minima, in (ts, event_id) order — identical to the batch
  operator's running-min window order;
- unripe events stay buffered and an ``EventTimeTimeout`` is armed at
  the earliest buffered timestamp, so the fold resumes exactly when
  the watermark reaches them even if the user goes quiet.

Equivalence argument (tested): rows reaching the operator are never
older than the watermark, so every already-folded event precedes
every ripe event in event time; folding ripe events in sorted order
on top of the carried minima therefore equals the batch fold over the
full history.  Out-of-order arrival ACROSS micro-batches (within the
watermark delay) cannot change the result — the same guarantee Flink
CEP gives, with the same price (results confirmed only up to the
watermark).

State bound: 3 BIGINTs per user plus the late buffer, which is
bounded by arrival rate × watermark delay — NOT by stream lifetime.
The minima themselves are per-user-lifetime state, inherent to the
funnel semantics (stage completion never expires).
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

STATE_SCHEMA = (
    "s1 bigint, s2 bigint, s3 bigint, "
    "buf_ts array<bigint>, buf_eid array<bigint>, buf_st array<bigint>"
)
OUTPUT_SCHEMA = (
    "user_id bigint, reached_stage bigint, "
    "s1_us bigint, s2_us bigint, s3_us bigint"
)

_UNSET = -1


def _fold(s: list, ripe: list) -> None:
    """Fold ripe (ts_us, event_id, stage) events, pre-sorted by
    (ts_us, event_id), into the running minima ``s`` in place.  A
    stage-k event qualifies iff stage k-1 is complete STRICTLY before
    it — the batch operator's chained running-min rule."""
    for ts_us, _eid, st in ripe:
        if st == 1:
            if s[0] == _UNSET or ts_us < s[0]:
                s[0] = ts_us
        elif st == 2:
            if s[0] != _UNSET and s[0] < ts_us and (
                s[1] == _UNSET or ts_us < s[1]
            ):
                s[1] = ts_us
        elif st == 3:
            if s[1] != _UNSET and s[1] < ts_us and (
                s[2] == _UNSET or ts_us < s[2]
            ):
                s[2] = ts_us


def funnel_update(
    key: Tuple,
    pdfs: Iterator[pd.DataFrame],
    state,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        s1, s2, s3, bts, beid, bst = state.get
        s = [s1, s2, s3]
        buf = list(zip(bts, beid, bst))
    else:
        s, buf = [_UNSET, _UNSET, _UNSET], []
    if not state.hasTimedOut:
        for pdf in pdfs:
            buf.extend(
                zip(
                    pdf["ts_us"].astype("int64"),
                    pdf["event_id"].astype("int64"),
                    pdf["st"].astype("int64"),
                )
            )
    wm_us = state.getCurrentWatermarkMs() * 1000
    buf.sort()
    n_ripe = 0
    while n_ripe < len(buf) and buf[n_ripe][0] <= wm_us:
        n_ripe += 1
    _fold(s, buf[:n_ripe])
    buf = buf[n_ripe:]
    state.update(
        (
            s[0],
            s[1],
            s[2],
            [int(e[0]) for e in buf],
            [int(e[1]) for e in buf],
            [int(e[2]) for e in buf],
        )
    )
    if buf:
        # resume the fold when the watermark reaches the earliest
        # buffered event (ms-ceil so the timeout lands AT/after it,
        # never a ms early); must stay strictly above the current
        # watermark or Spark rejects the timestamp
        t_ms = max(state.getCurrentWatermarkMs() + 1, -(-buf[0][0] // 1000))
        state.setTimeoutTimestamp(t_ms)
    reached = 3 if s[2] != _UNSET else 2 if s[1] != _UNSET else (
        1 if s[0] != _UNSET else 0
    )
    out = {
        "user_id": pd.array([int(key[0])], dtype="Int64"),
        "reached_stage": pd.array([reached], dtype="Int64"),
    }
    for i, col in enumerate(("s1_us", "s2_us", "s3_us")):
        out[col] = pd.array(
            [None if s[i] == _UNSET else int(s[i])], dtype="Int64"
        )
    yield pd.DataFrame(out)


def funnel_stream(
    events: DataFrame,
    delay: str = "60 seconds",
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Update-mode per-user funnel progress over an events stream.

    Emits (user_id, reached_stage, stage completion times) whenever a
    user's confirmed state may have advanced.  ``delay`` is the
    allowed lateness: arrival disorder within it is invisible in the
    output (CEP buffering), disorder beyond it is dropped upstream by
    the watermark like every Spark stateful operator."""
    st = (
        F.when(F.col("event_type") == stages[0], 1)
        .when(F.col("event_type") == stages[1], 2)
        .when(F.col("event_type") == stages[2], 3)
        .otherwise(0)
    )
    # Non-stage events are NOT filtered out here: a filter on a
    # non-event-time column gets pushed BELOW the EventTimeWatermark
    # node by Catalyst, so filtered events would stop advancing the
    # watermark and buffered folds would never flush on streams whose
    # tail is non-stage traffic.  They flow through the operator
    # (st=0, ignored by the fold, evicted from the buffer as the
    # watermark passes them) and keep event time moving — exactly
    # Flink CEP's treatment of non-matching elements.
    src = events.withWatermark("ts", delay).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        st.alias("st"),
        # the event-time attribute must reach the stateful
        # operator for EventTimeTimeout to be allowed
        "ts",
    )
    return src.groupBy("user_id").applyInPandasWithState(
        funnel_update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ----------------------------------------------------------------------
# transformWithStateInPandas twin (r11, VERDICT r10 ask #5)
# ----------------------------------------------------------------------
from pyspark.sql.streaming import StatefulProcessor  # noqa: E402


class FunnelProcessor(StatefulProcessor):
    """TWS StatefulProcessor for the CEP-style funnel: the same
    buffer-until-ripe fold as :func:`funnel_update`, with the classic
    API's ``EventTimeTimeout`` replaced by an explicit event-time
    timer registered at the earliest buffered timestamp (ms-ceil,
    strictly above the current watermark).  Output and state contract
    identical to the classic twin; equality pinned in tests.
    Runtime-independent class (drivable with a fake handle)."""

    def init(self, handle) -> None:
        self._handle = handle
        self._st = handle.getValueState("funnel", STATE_SCHEMA)

    def _load(self):
        if self._st.exists():
            s1, s2, s3, bts, beid, bst = self._st.get()
            return [s1, s2, s3], list(zip(bts, beid, bst))
        return [_UNSET, _UNSET, _UNSET], []

    def _fold_and_emit(self, key, s, buf, wm_ms):
        buf.sort()
        wm_us = wm_ms * 1000
        n_ripe = 0
        while n_ripe < len(buf) and buf[n_ripe][0] <= wm_us:
            n_ripe += 1
        _fold(s, buf[:n_ripe])
        buf = buf[n_ripe:]
        self._st.update(
            (
                s[0],
                s[1],
                s[2],
                [int(e[0]) for e in buf],
                [int(e[1]) for e in buf],
                [int(e[2]) for e in buf],
            )
        )
        if buf:
            t_ms = max(wm_ms + 1, -(-buf[0][0] // 1000))
            self._handle.registerTimer(t_ms)
        reached = 3 if s[2] != _UNSET else 2 if s[1] != _UNSET else (
            1 if s[0] != _UNSET else 0
        )
        out = {
            "user_id": pd.array([int(key[0])], dtype="Int64"),
            "reached_stage": pd.array([reached], dtype="Int64"),
        }
        for i, col in enumerate(("s1_us", "s2_us", "s3_us")):
            out[col] = pd.array(
                [None if s[i] == _UNSET else int(s[i])], dtype="Int64"
            )
        yield pd.DataFrame(out)

    def handleInputRows(self, key, rows, timerValues):
        s, buf = self._load()
        for pdf in rows:
            buf.extend(
                zip(
                    pdf["ts_us"].astype("int64"),
                    pdf["event_id"].astype("int64"),
                    pdf["st"].astype("int64"),
                )
            )
        yield from self._fold_and_emit(
            key, s, buf, timerValues.getCurrentWatermarkInMs()
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        s, buf = self._load()
        yield from self._fold_and_emit(
            key, s, buf, timerValues.getCurrentWatermarkInMs()
        )

    def close(self) -> None:
        pass


def funnel_stream_tws(
    events: DataFrame,
    delay: str = "60 seconds",
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """:func:`funnel_stream` on the transformWithStateInPandas
    runtime (event-time timeMode, RocksDB provider + protobuf via
    ``stateful_dgim.ship_tws_runtime``).  Same non-stage-event
    pass-through discipline — a filter on a non-event-time column
    would be pushed below the watermark node and stall the fold."""
    from flink_window_dgim_traffic_spark.streaming.stateful_dgim import (
        ship_tws_runtime,
    )

    ship_tws_runtime(events.sparkSession)
    st = (
        F.when(F.col("event_type") == stages[0], 1)
        .when(F.col("event_type") == stages[1], 2)
        .when(F.col("event_type") == stages[2], 3)
        .otherwise(0)
    )
    src = events.withWatermark("ts", delay).select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        st.alias("st"),
        "ts",
    )
    return src.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=FunnelProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )
