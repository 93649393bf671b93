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

import os
from datetime import timezone
from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql.streaming import StatefulProcessor

from flink_window_dgim_traffic_spark.dgim import (
    DGIM,
    MODE_JAVA,
    count_estimate_closed,
)

STATE_SCHEMA = "flat array<bigint>"


def _bulk_update(sk: DGIM, sub: pd.DataFrame) -> int:
    """Feed one ts-sorted batch into the sketch and return the number
    of 1-bits added.  Uses the closed-form zeroless-binary bulk insert
    (``DGIM.bulk_add_ones`` — O(log n) per batch instead of a
    per-event Python loop; VERDICT r12 ask #3), which itself falls
    back to exact sequential adds whenever its preconditions fail
    (out-of-order batches, in-window expiry).  Bit-identical to the
    r12 per-event loop — property-pinned in tests/test_dgim_bulk.py."""
    bits = sub["bit"].to_numpy()
    ts1 = sub["ts_sec"].to_numpy()[bits == 1]
    sk.bulk_add_ones(ts1)
    return len(ts1)


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
        # sort ONCE across the whole group iterator: a key's batch
        # rows can span multiple Arrow chunks, and per-chunk sorting
        # would feed the (order-sensitive) sketch out of time order
        frames = [pdf for pdf in pdfs]
        sub = (
            pd.concat(frames).sort_values("ts_sec", kind="mergesort")
            if frames
            else pd.DataFrame({"bit": [], "ts_sec": []})
        )
        ones += _bulk_update(sk, sub)
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
#: directories that may carry a pure-Python ``google.protobuf``
#: package without being on sys.path — the google-cloud-sdk ships one
#: for its appengine tooling.  Probed by :func:`enable_tws_runtime`;
#: override/extend with $SPARK_GRAFT_PROTOBUF_PATH.
_PROTOBUF_FALLBACK_DIRS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


_TWS_RUNTIME = {"dir": None, "zip": None, "shipped": set(), "reason": None}

#: max (major, minor) skew between PySpark's protobuf GENCODE and a
#: staged pure-Python RUNTIME that we will paper over by disabling
#: the runtime-version validator.  Pure-Python descriptors are
#: wire-compatible across one minor; a larger skew must raise so a
#: misparse surfaces as a version error, not silent wire corruption.
_PROTOBUF_MAX_MINOR_SKEW = 1


def _pkg_parent_dir() -> str:
    """Directory containing the ``flink_window_dgim_traffic_spark``
    package — what the TWS driver worker needs on PYTHONPATH."""
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def _prepend_pythonpath(path: str) -> None:
    """Idempotently prepend ``path`` to ``$PYTHONPATH`` so JVMs (and
    their TWS driver workers) started AFTER this call inherit it."""
    pp = os.environ.get("PYTHONPATH", "")
    parts = pp.split(os.pathsep) if pp else []
    if path not in parts:
        parts.insert(0, path)
        os.environ["PYTHONPATH"] = os.pathsep.join(parts)


def _staged_runtime_version(src_dir: str) -> tuple[int, int] | None:
    """(major, minor) of the pure-Python protobuf runtime under
    ``src_dir`` — read textually from ``runtime_version.py`` (new
    layout) or ``__init__.py``'s ``__version__`` (pre-4.25 layout)
    without importing it (it isn't on sys.path yet)."""
    import re

    pb = os.path.join(src_dir, "google", "protobuf")
    for name, pat in (
        ("runtime_version.py", r"MINOR\s*=\s*(\d+)"),
        ("__init__.py", r"__version__\s*=\s*['\"](\d+)\.(\d+)"),
    ):
        path = os.path.join(pb, name)
        if not os.path.exists(path):
            continue
        with open(path) as fh:
            text = fh.read()
        if name == "runtime_version.py":
            major = re.search(r"MAJOR\s*=\s*(\d+)", text)
            minor = re.search(r"MINOR\s*=\s*(\d+)", text)
            if major and minor:
                return int(major.group(1)), int(minor.group(1))
        else:
            m = re.search(pat, text)
            if m:
                # 3.x pure-Python releases: "3.19.6" → gencode era 19
                major, minor = int(m.group(1)), int(m.group(2))
                return (4, minor) if major == 3 else (major, minor)
    return None


def _gencode_expected_version() -> tuple[int, int] | None:
    """(major, minor) the PySpark-generated state-server stubs were
    built against, read textually from the generated module so it
    works before protobuf itself is importable."""
    import re

    try:
        import pyspark

        gen = os.path.join(
            os.path.dirname(os.path.abspath(pyspark.__file__)),
            "sql",
            "streaming",
            "proto",
            "StateMessage_pb2.py",
        )
        with open(gen) as fh:
            m = re.search(
                r"ValidateProtobufRuntimeVersion\(\s*"
                r"_runtime_version\.Domain\.PUBLIC,\s*(\d+),\s*(\d+)",
                fh.read(),
            )
        if m:
            return int(m.group(1)), int(m.group(2))
    except Exception:
        pass
    return None


def _build_portable_protobuf(src_dir: str) -> tuple[str, str]:
    """Copy the pure-Python ``google/protobuf`` tree from ``src_dir``
    into a temp staging dir, append a no-op override of
    ``ValidateProtobufRuntimeVersion`` to its ``runtime_version.py``
    (pure-Python descriptors are wire-compatible across a one-minor
    skew and the batch==stream equality test is the real gate), and
    zip it — the zip is what :func:`ship_tws_runtime` sends to
    workers via ``addPyFile``.  Returns (staging_dir, zip_path).

    The validator is only disarmed when the measured skew between the
    staged RUNTIME and PySpark's GENCODE is within
    ``_PROTOBUF_MAX_MINOR_SKEW`` (same major); a larger skew raises
    ``RuntimeError`` here so it surfaces as a clear version error,
    never a silent wire misparse."""
    import shutil
    import tempfile
    import zipfile

    runtime_v = _staged_runtime_version(src_dir)
    gencode_v = _gencode_expected_version()
    if runtime_v is not None and gencode_v is not None:
        same_major = runtime_v[0] == gencode_v[0]
        skew = abs(runtime_v[1] - gencode_v[1])
        if not (same_major and skew <= _PROTOBUF_MAX_MINOR_SKEW):
            raise RuntimeError(
                "TWS protobuf staging refused: staged pure-Python "
                f"runtime {runtime_v[0]}.{runtime_v[1]} vs PySpark "
                f"gencode {gencode_v[0]}.{gencode_v[1]} exceeds the "
                f"±{_PROTOBUF_MAX_MINOR_SKEW}-minor window this shim "
                "is validated for.  Install a matching protobuf or "
                "point $SPARK_GRAFT_PROTOBUF_PATH at a closer runtime."
            )

    stage = tempfile.mkdtemp(prefix="spark_graft_tws_pb_")
    dst = os.path.join(stage, "google", "protobuf")
    shutil.copytree(os.path.join(src_dir, "google", "protobuf"), dst)
    with open(os.path.join(dst, "runtime_version.py"), "a") as fh:
        fh.write(
            "\n\n# spark-graft portable copy: accept newer gencode on"
            "\n# this older pure-Python runtime (wire-compatible;"
            "\n# end-to-end equality is asserted in tests)"
            "\ndef ValidateProtobufRuntimeVersion(*args, **kwargs):"
            "  # noqa: F811\n  return\n"
        )
    zip_path = os.path.join(stage, "tws_protobuf.zip")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(os.path.join(stage, "google")):
            for name in files:
                full = os.path.join(root, name)
                zf.write(full, os.path.relpath(full, stage))
    return stage, zip_path


def enable_tws_runtime() -> bool:
    """Make ``google.protobuf`` importable for the TWS state-server
    protocol on the DRIVER, and stage it for workers.  Returns True
    when the import works.

    Resolution order: a real site-packages install wins (nothing to
    do — workers share it).  Otherwise probe
    ``$SPARK_GRAFT_PROTOBUF_PATH`` then ``_PROTOBUF_FALLBACK_DIRS``
    for a pure-Python copy, build a PATCHED portable copy + zip
    (:func:`_build_portable_protobuf` — no install step, the no-pip
    constraint stands), put it on the driver's sys.path, and prepend
    it to ``$PYTHONPATH`` so workers of any FUTURE session inherit it
    through the JVM.  Workers of a session whose JVM already started
    need :func:`ship_tws_runtime` (addPyFile) instead —
    :func:`tumble_dgim_stream_tws` calls it automatically."""
    import sys

    # The package parent must reach the TWS driver worker's
    # PYTHONPATH REGARDLESS of where protobuf comes from — a real
    # site-packages install satisfies the protobuf import but the
    # StreamingPythonRunner still unpickles our StatefulProcessor
    # from scratch and only sees PYTHONPATH captured at JVM start
    # (addPyFile/ship_package don't reach it).
    _prepend_pythonpath(_pkg_parent_dir())

    if _TWS_RUNTIME["dir"] is None:
        try:
            from google.protobuf import descriptor  # noqa: F401

            return True  # real install; workers share it
        except ImportError:
            pass
        cands = [os.environ.get("SPARK_GRAFT_PROTOBUF_PATH")]
        cands += list(_PROTOBUF_FALLBACK_DIRS)
        src = next(
            (
                p
                for p in cands
                if p and os.path.isdir(os.path.join(p, "google", "protobuf"))
            ),
            None,
        )
        if src is None:
            _TWS_RUNTIME["reason"] = (
                "no google.protobuf importable and no pure-Python "
                "runtime found at $SPARK_GRAFT_PROTOBUF_PATH or "
                f"{_PROTOBUF_FALLBACK_DIRS}"
            )
            return False
        try:
            stage, zip_path = _build_portable_protobuf(src)
        except RuntimeError as exc:  # version-skew refusal: be loud
            _TWS_RUNTIME["reason"] = str(exc)
            return False
        _TWS_RUNTIME["dir"], _TWS_RUNTIME["zip"] = stage, zip_path
    stage = _TWS_RUNTIME["dir"]
    if stage not in sys.path:
        sys.path.insert(0, stage)
    # Stage dir too: the TWS driver worker resolves protobuf via
    # PYTHONPATH captured at JVM start (see note above) — observed:
    # without this, STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE /
    # ModuleNotFoundError from /tmp even though ship_package covered
    # the regular workers.
    _prepend_pythonpath(stage)
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def ship_tws_runtime(spark) -> bool:
    """Make the TWS protobuf runtime importable in the WORKERS of an
    ALREADY-RUNNING session: when the driver is using the portable
    copy (no site-packages install), ``addPyFile`` its zip so the
    worker daemon — whose environment was frozen when the JVM
    started — finds ``google.protobuf`` on the shipped path.
    Idempotent per session.  Returns :func:`enable_tws_runtime`'s
    verdict."""
    ok = enable_tws_runtime()
    if not ok or _TWS_RUNTIME["zip"] is None:
        return ok  # real install (workers share it) or unavailable
    sc = spark.sparkContext
    key = sc.applicationId
    if key not in _TWS_RUNTIME["shipped"]:
        sc.addPyFile(_TWS_RUNTIME["zip"])
        _TWS_RUNTIME["shipped"].add(key)
    return True


def tws_available() -> bool:
    """True when the transformWithStateInPandas runtime can start:
    :func:`enable_tws_runtime` made ``google.protobuf`` importable AND
    PySpark's generated ``StateMessage_pb2`` actually loads under it
    (the version-checked step).  When False,
    :func:`tws_unavailable_reason` says why."""
    if not enable_tws_runtime():
        if _TWS_RUNTIME.get("reason") is None:
            _TWS_RUNTIME["reason"] = (
                "no google.protobuf importable and no pure-Python "
                "runtime found at $SPARK_GRAFT_PROTOBUF_PATH or "
                f"{_PROTOBUF_FALLBACK_DIRS}"
            )
        return False
    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        _TWS_RUNTIME["reason"] = None
        return True
    except Exception as exc:
        _TWS_RUNTIME["reason"] = (
            f"StateMessage_pb2 failed to load under the available "
            f"protobuf: {type(exc).__name__}: {exc}"
        )
        return False


def tws_unavailable_reason() -> str | None:
    """Human-readable reason the last :func:`tws_available` call
    returned False (None when it returned True or never ran) — the
    loud-degrade surface asked of the protobuf gate."""
    return _TWS_RUNTIME.get("reason")


class tws_state_store_conf:
    """Context manager pinning the RocksDB state store provider for a
    TWS query: transformWithStateInPandas keeps each state variable in
    its own column family, which the default HDFSBacked provider
    rejects (StateStoreMultipleColumnFamiliesNotSupported).  The conf
    is read at QUERY START, so scoping it to the ``start()`` call
    leaves every other stateful query on the default provider."""

    _KEY = "spark.sql.streaming.stateStore.providerClass"
    _ROCKSDB = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )

    def __init__(self, spark) -> None:
        self._spark = spark
        self._prev = None

    def __enter__(self):
        try:
            self._prev = self._spark.conf.get(self._KEY)
        except Exception:
            self._prev = None
        self._spark.conf.set(self._KEY, self._ROCKSDB)
        return self

    def __exit__(self, *exc):
        if self._prev is None:
            self._spark.conf.unset(self._KEY)
        else:
            self._spark.conf.set(self._KEY, self._prev)
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
        # same cross-chunk sort discipline as make_dgim_update_fn
        frames = [pdf for pdf in rows]
        sub = (
            pd.concat(frames).sort_values("ts_sec", kind="mergesort")
            if frames
            else pd.DataFrame({"bit": [], "ts_sec": []})
        )
        ones += _bulk_update(sk, sub)
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


class EvictingDGIMProcessor(StatefulProcessor):
    """Tumbling DGIM on TWS with EVENT-TIME TIMERS (r10): every
    update re-registers a timer at the window end, and
    ``handleExpiredTimer`` drops the window's state once the
    watermark passes — the TWS-native form of the
    applyInPandasWithState eviction path (``EventTimeTimeout``),
    making TOTAL state O(open windows).  The final value was already
    emitted in update mode, so expiry yields nothing."""

    def __init__(self, size_sec: int, mode: str = MODE_JAVA) -> None:
        self._size_sec = size_sec
        self._mode = mode

    def init(self, handle) -> None:
        self._handle = handle
        self._st = handle.getValueState(
            "sketch", "flat array<bigint>, ones bigint, nrows bigint"
        )

    def handleInputRows(self, key, rows, timerValues):
        if self._st.exists():
            flat, ones, nrows = self._st.get()
            sk = DGIM.from_flat(self._size_sec, list(flat), mode=self._mode)
        else:
            sk, ones, nrows = DGIM(self._size_sec, mode=self._mode), 0, 0
        frames = [pdf for pdf in rows]
        sub = (
            pd.concat(frames).sort_values("ts_sec", kind="mergesort")
            if frames
            else pd.DataFrame({"bit": [], "ts_sec": []})
        )
        ones += _bulk_update(sk, sub)
        nrows += len(sub)
        self._st.update((sk.to_flat(), ones, nrows))
        # naive-as-UTC key reading (see make_dgim_update_fn): drop
        # this window's state once the watermark reaches its end
        we_utc = key[0].replace(tzinfo=timezone.utc)
        self._handle.registerTimer(int(we_utc.timestamp() * 1000))
        yield pd.DataFrame(
            {
                "window_end": [we_utc.strftime("%Y-%m-%d %H:%M:%S")],
                "count_estimate": [sk.estimate()],
                "exact_count": [ones],
                "n_rows": [nrows],
            }
        )

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        self._st.clear()
        return iter(())

    def close(self) -> None:
        pass


def tumble_dgim_stream_tws_evict(
    parsed,
    size_sec: int = 60,
    mode: str = MODE_JAVA,
    watermark: str = "0 seconds",
):
    """Update-mode TWS tumbling DGIM WITH state eviction: event-time
    ``timeMode`` + per-window timers at the window end.  The input
    must carry a watermark (the TWS event-time clock); same output
    contract as :func:`tumble_dgim_stream_tws`, with bounded state —
    equality to batch replay AND the state bound are pinned in
    tests."""
    from pyspark.sql import functions as F

    ship_tws_runtime(parsed.sparkSession)
    src = parsed.withWatermark("ts", watermark)
    keyed = src.select(
        F.window("ts", f"{size_sec} seconds").getItem("end").alias("we"),
        "bit",
        "ts_sec",
        "ts",
    )
    return keyed.groupBy("we").transformWithStateInPandas(
        statefulProcessor=EvictingDGIMProcessor(size_sec, mode),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="EventTime",
    )


class HopDGIMProcessor(StatefulProcessor):
    """TWS StatefulProcessor for the HOP (sliding) DGIM — keyed by
    the COMPOSITE (window_start, window_end) tuple, the reference's
    sliding-job upsert key (``SlidingWindowStreamingJob.java:72-74``).
    Same sketch state contract as :class:`DGIMProcessor`; exercises
    multi-column grouping keys on the real TWS runtime (r10 — the
    second window kind through transformWithStateInPandas)."""

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
        frames = [pdf for pdf in rows]
        sub = (
            pd.concat(frames).sort_values("ts_sec", kind="mergesort")
            if frames
            else pd.DataFrame({"bit": [], "ts_sec": []})
        )
        ones += _bulk_update(sk, sub)
        nrows += len(sub)
        self._st.update((sk.to_flat(), ones, nrows))
        yield pd.DataFrame(
            {
                "window_start": [key[0].strftime("%Y-%m-%d %H:%M:%S")],
                "window_end": [key[1].strftime("%Y-%m-%d %H:%M:%S")],
                "count_estimate": [sk.estimate()],
                "exact_count": [ones],
                "n_rows": [nrows],
            }
        )

    def close(self) -> None:
        pass


def hop_dgim_stream_tws(
    parsed, size_sec: int = 60, slide_sec: int = 10, mode: str = MODE_JAVA
):
    """Sliding-window DGIM on the real ``transformWithStateInPandas``
    runtime: the native ``window(ts, size, slide)`` generator fans
    each row to its covering windows (exactly as the
    applyInPandasWithState twin :func:`hop_dgim_stream`) and the
    composite (window_start, window_end) key addresses one sketch per
    window instance — exercising multi-column TWS grouping keys.
    Requirements as :func:`tumble_dgim_stream_tws` (RocksDB provider
    + protobuf — :func:`ship_tws_runtime` is called automatically);
    output equals batch replay, pinned in tests."""
    from pyspark.sql import functions as F

    ship_tws_runtime(parsed.sparkSession)
    keyed = parsed.select(
        F.window(
            "ts", f"{size_sec} seconds", f"{slide_sec} seconds"
        ).alias("w"),
        "bit",
        "ts_sec",
    ).select(
        F.col("w.start").alias("ws"),
        F.col("w.end").alias("we"),
        "bit",
        "ts_sec",
    )
    return keyed.groupBy("ws", "we").transformWithStateInPandas(
        statefulProcessor=HopDGIMProcessor(size_sec, mode),
        outputStructType=HOP_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def tumble_dgim_stream_tws(parsed, size_sec: int = 60, mode: str = MODE_JAVA):
    """Same incremental tumbling DGIM as :func:`tumble_dgim_stream`,
    on the current-generation ``transformWithStateInPandas`` API.
    Kept alongside the applyInPandasWithState path so both stateful
    APIs stay exercised; outputs are tested identical.

    Runtime requirements (both satisfied in CI since r10, so the
    end-to-end branch of tests/test_streaming.py actually executes):
    ``google.protobuf`` for the state-server protocol — located by
    :func:`enable_tws_runtime` (site-packages, or a pure-Python copy
    on a probed path; no install step) — and the RocksDB state store
    provider (TWS uses one column family per state variable, which
    the default HDFSBacked provider rejects; scope it with
    :class:`tws_state_store_conf`).  The processor ITSELF
    (:class:`DGIMProcessor`) is runtime-independent and additionally
    driven directly with a fake state handle in tests, so state
    reload slicing stays covered even where the runtime is absent."""
    from pyspark.sql import functions as F

    # workers of an already-running session need the portable
    # protobuf shipped (no-op on a real install); see ship_tws_runtime
    ship_tws_runtime(parsed.sparkSession)
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
        # sort ONCE across the whole group iterator: a key's batch
        # rows can span multiple Arrow chunks, and per-chunk sorting
        # would feed the (order-sensitive) sketch out of time order
        frames = [pdf for pdf in pdfs]
        sub = (
            pd.concat(frames).sort_values("ts_sec", kind="mergesort")
            if frames
            else pd.DataFrame({"bit": [], "ts_sec": []})
        )
        ones += _bulk_update(sk, sub)
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


class SessionDGIMProcessor(StatefulProcessor):
    """TWS StatefulProcessor for SESSION-window DGIM (r11, VERDICT
    r10 ask #5): the engine-native ``session_window`` aggregation of
    ``jobs.session_dgim_stream`` re-expressed as explicit per-key
    session-merge state + event-time timers, so the 4th window kind
    runs on the current-generation stateful API too.

    State: the OPEN sessions of one key as parallel arrays
    (start_us, last_us, ones, n).  An event at ``t`` joins a session
    iff its gap window overlaps the session's
    (``start − gap < t < last + gap``, strict — an event exactly at
    ``last + gap`` starts a new session, the engine's boundary rule),
    and a bridging event merges neighbors.  A timer at the earliest
    ``last + gap`` closes ripe sessions when the watermark passes:
    closed sessions emit ``(session_start, session_end_plus_gap,
    count_estimate = g(ones), exact_count, n_rows)`` — the
    replay-equivalent closed form (horizon ≥ span, the same
    equivalence ``windows.session_dgim`` property-tests) — and their
    state is dropped, so state is bounded by OPEN sessions exactly
    like the engine operator.  Equality against
    ``jobs.session_dgim_stream`` is pinned in tests."""

    def __init__(
        self,
        gap_sec: int,
        mode: str = MODE_JAVA,
        key_name: str = "key",
    ) -> None:
        self._gap_us = gap_sec * 1_000_000
        self._mode = mode
        self._key_name = key_name

    def init(self, handle) -> None:
        self._handle = handle
        self._st = handle.getValueState(
            "sessions",
            "starts array<bigint>, lasts array<bigint>, "
            "oness array<bigint>, ns array<bigint>",
        )

    def _load(self):
        if self._st.exists():
            starts, lasts, oness, ns = self._st.get()
            return [list(t) for t in zip(starts, lasts, oness, ns)]
        return []

    def _save(self, sess) -> None:
        sess.sort()
        self._st.update(
            (
                [s[0] for s in sess],
                [s[1] for s in sess],
                [s[2] for s in sess],
                [s[3] for s in sess],
            )
        )

    def _insert(self, sess, t: int, bit: int) -> None:
        self._insert_span(sess, t, t, bit, 1)

    def _insert_span(
        self, sess, t0: int, t1: int, ones: int, n: int
    ) -> None:
        """Merge a pre-aggregated session span [t0, t1] (``ones``
        1-bits over ``n`` events) into the sorted session list —
        the generalization of the r11 single-event insert (a point
        is a span with t0 == t1).  A span bridges every existing
        session within the strict gap on either side."""
        g = self._gap_us
        lo, hi = None, None
        for i, s in enumerate(sess):
            if s[0] - g < t1 and t0 < s[1] + g:
                if lo is None:
                    lo = i
                hi = i
        if lo is None:
            sess.append([t0, t1, ones, n])
            sess.sort()
            return
        # fold the span into the first overlapping session, then
        # merge every session the span bridges
        tgt = sess[lo]
        tgt[0] = min(tgt[0], t0)
        tgt[1] = max(tgt[1], t1)
        tgt[2] += ones
        tgt[3] += n
        for s in sess[lo + 1 : hi + 1]:
            tgt[0] = min(tgt[0], s[0])
            tgt[1] = max(tgt[1], s[1])
            tgt[2] += s[2]
            tgt[3] += s[3]
        del sess[lo + 1 : hi + 1]

    def _close_ripe(self, sess, wm_ms: int, key0=None):
        """Emit and drop sessions whose end passed the watermark.

        ``key0`` is the grouping-key value, emitted as the leading
        column — matching the engine-native twin (and the other TWS
        processors, FunnelProcessor/HeavyHittersProcessor), which
        all emit their keys so sessions from different keys stay
        distinguishable (ADVICE r11)."""
        from datetime import datetime, timezone

        g = self._gap_us
        wm_us = wm_ms * 1000
        closed = [s for s in sess if s[1] + g <= wm_us]
        kept = [s for s in sess if s[1] + g > wm_us]

        def fmt(us: int) -> str:
            return datetime.fromtimestamp(
                us / 1_000_000, tz=timezone.utc
            ).strftime("%Y-%m-%d %H:%M:%S")

        frames = []
        for s in sorted(closed):
            frames.append(
                {
                    self._key_name: key0,
                    "session_start": fmt(s[0]),
                    "session_end_plus_gap": fmt(s[1] + g),
                    "count_estimate": count_estimate_closed(
                        s[2], mode=self._mode
                    ),
                    "exact_count": s[2],
                    "n_rows": s[3],
                }
            )
        return kept, frames

    def _arm_timer(self, sess, wm_ms: int) -> None:
        if sess:
            t_ms = min(s[1] + self._gap_us for s in sess) // 1000 + 1
            self._handle.registerTimer(max(t_ms, wm_ms + 1))

    def handleInputRows(self, key, rows, timerValues):
        import numpy as np

        sess = self._load()
        # pre-sessionize the batch VECTORIZED (r12): sort, break at
        # gaps, reduceat the per-segment sums — then merge only the
        # few span summaries into state.  Sessionization is uniquely
        # determined by the point set, so sub-sessionizing any subset
        # first and span-merging after yields the same sessions as
        # the r11 per-event loop (equality with the engine-native
        # twin stays pinned in tests); this removes the per-event
        # Python cost that made the TWS twin 2.4x the JVM twin.
        g = self._gap_us
        for pdf in rows:
            ts = pdf["ts_us"].to_numpy(np.int64)
            bits = pdf["bit"].to_numpy(np.int64)
            if len(ts) == 0:
                continue
            order = np.argsort(ts, kind="stable")
            ts, bits = ts[order], bits[order]
            starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(ts) >= g) + 1)
            )
            ones = np.add.reduceat(bits, starts)
            ends = np.concatenate((starts[1:], [len(ts)]))
            for st, en, o in zip(starts, ends, ones):
                self._insert_span(
                    sess,
                    int(ts[st]),
                    int(ts[en - 1]),
                    int(o),
                    int(en - st),
                )
        wm_ms = timerValues.getCurrentWatermarkInMs()
        sess, frames = self._close_ripe(sess, wm_ms, key[0])
        self._save(sess)
        self._arm_timer(sess, wm_ms)
        if frames:
            yield pd.DataFrame(frames)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        sess = self._load()
        wm_ms = timerValues.getCurrentWatermarkInMs()
        sess, frames = self._close_ripe(sess, wm_ms, key[0])
        self._save(sess)
        self._arm_timer(sess, wm_ms)
        if frames:
            yield pd.DataFrame(frames)

    def close(self) -> None:
        pass


SESSION_OUTPUT_SCHEMA = (
    "session_start string, session_end_plus_gap string, "
    "count_estimate bigint, exact_count bigint, n_rows bigint"
)


def session_output_schema(key_col: str) -> str:
    """TWS output schema WITH the grouping key as leading column —
    the engine-native twin's shape (ADVICE r11)."""
    return f"{key_col} bigint, " + SESSION_OUTPUT_SCHEMA


def session_dgim_stream_tws(
    parsed,
    gap_sec: int = 300,
    watermark: str = "10 seconds",
    key_col: str = "user_id",
):
    """Session-window DGIM on the transformWithStateInPandas runtime:
    per-``key_col`` session merge + event-time close timers
    (:class:`SessionDGIMProcessor`).  Emits only CLOSED sessions —
    the append-mode contract of the engine-native
    ``jobs.session_dgim_stream`` twin it is equality-pinned against
    in tests.  RocksDB provider + protobuf required, as every TWS
    entry point (``ship_tws_runtime`` is called automatically)."""
    from pyspark.sql import functions as F

    ship_tws_runtime(parsed.sparkSession)
    cols = [F.col(key_col), F.unix_micros("ts").alias("ts_us"), F.col("ts")]
    if key_col != "bit":  # when keying BY bit, one column serves both
        cols.insert(2, F.col("bit"))
    src = parsed.withWatermark("ts", watermark).select(*cols)
    return src.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=SessionDGIMProcessor(gap_sec, key_name=key_col),
        outputStructType=session_output_schema(key_col),
        outputMode="Update",
        timeMode="EventTime",
    )
