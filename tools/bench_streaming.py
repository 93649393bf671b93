#!/usr/bin/env python
"""Streaming throughput benchmark: events/sec through the streaming
jobs, measured end-to-end (file-source replay -> parse -> stateful
operator -> noop-ish sink) with the availableNow trigger.

Context (BASELINE.md): the reference's operating point is
producer-bound at ~50 msg/s (single Python Kafka producer,
generate-traffic.py:66-68) — it publishes no engine-capacity number.
This tool measures OUR engine capacity on the same workload shape so
the matches-or-beats comparison is explicit.

Usage: python tools/bench_streaming.py [duration_sec] (default 20000,
~1M events).  Prints one JSON line per pipeline.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from flink_window_dgim_traffic_spark.session import get_spark  # noqa: E402
from flink_window_dgim_traffic_spark.sources.traffic import (  # noqa: E402
    write_traffic_json,
)
from flink_window_dgim_traffic_spark.streaming import jobs as J  # noqa: E402
from flink_window_dgim_traffic_spark.streaming import funnel as SF  # noqa: E402
from flink_window_dgim_traffic_spark.streaming.stateful_dgim import (  # noqa: E402
    session_dgim_stream_tws,
    tumble_dgim_stream,
    tumble_dgim_stream_tws,
    tws_state_store_conf,
)


def _funnel_src(parsed):
    """Funnel-shaped stream from the traffic fixture: user_id and a
    view/click/purchase/other event_type synthesized deterministically
    from the parsed columns (the fixture has neither), so the classic
    and TWS runs fold identical per-user event sequences."""
    from pyspark.sql import functions as F

    return parsed.select(
        F.pmod("ts_sec", F.lit(1000)).cast("bigint").alias("user_id"),
        "ts",
        F.element_at(
            F.array(
                F.lit("view"), F.lit("click"),
                F.lit("purchase"), F.lit("other"),
            ),
            (
                F.pmod(
                    F.col("ts_sec") * F.lit(31) + F.col("bit"), F.lit(4)
                ) + F.lit(1)
            ).cast("int"),
        ).alias("event_type"),
        F.unix_micros("ts").alias("event_id"),
    )


def _topn_agg(parsed):
    """The streamable half of window Top-N (streaming/alerts.py):
    (window, user) append-mode counts.  The fixture has no user_id,
    so one is synthesized from the event second (1000 distinct
    users) — same key cardinality class as the events table."""
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.streaming.alerts import (
        windowed_user_counts_stream,
    )

    ev = parsed.select(
        "ts", F.pmod("ts_sec", F.lit(1000)).alias("user_id")
    )
    return windowed_user_counts_stream(ev, 60, watermark="10 seconds")


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def run_pipeline(spark, fixture_dir: str, name: str, build) -> dict:
    """Replay the whole fixture through `build(parsed)` and time it."""
    stream = J.parse_traffic(
        J.file_traffic_stream(spark, fixture_dir, max_files_per_trigger=1000)
    )
    df, mode = build(stream)
    ckpt = tempfile.mkdtemp(prefix=f"bench_stream_{name}_")
    # TWS pipelines need the RocksDB provider (multi-column-family
    # state); scoping it per query leaves the others on the default
    cm = (
        tws_state_store_conf(spark)
        if "tws" in name
        else _nullcontext()
    )
    t0 = time.time()
    with cm:
        q = (
            df.writeStream.format("memory")
            .queryName(f"bench_{name}")
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    elapsed = time.time() - t0
    n_in = sum(
        p["numInputRows"] for p in q.recentProgress if p["numInputRows"]
    )
    shutil.rmtree(ckpt, ignore_errors=True)
    return {
        "pipeline": name,
        "events": n_in,
        "sec": round(elapsed, 3),
        "events_per_sec": round(n_in / elapsed) if elapsed > 0 else None,
    }


def main() -> None:
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 20000.0
    spark = get_spark(
        app_name="bench_streaming",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    fixture = tempfile.mkdtemp(prefix="bench_stream_fixture_")
    # ~50 events per event-time second; 8 chunks -> a few micro-batches
    write_traffic_json(fixture, duration_sec=duration, n_chunks=8)
    # steady-state methodology (BASELINE.md): one untimed warmup run
    # pays file-index build, plan compile, and JIT once
    run_pipeline(
        spark,
        fixture,
        "warmup",
        lambda s: (J.tumble_exact_stream(s, 60), "append"),
    )
    results = [
        run_pipeline(
            spark,
            fixture,
            "tumble_exact_stream",
            lambda s: (J.tumble_exact_stream(s, 60), "append"),
        ),
        run_pipeline(
            spark,
            fixture,
            "hop_exact_stream",
            lambda s: (J.hop_exact_stream(s, 60, 10), "append"),
        ),
        run_pipeline(
            spark,
            fixture,
            "tumble_dgim_stream",
            lambda s: (
                tumble_dgim_stream(s, 60, watermark="10 seconds"),
                "update",
            ),
        ),
        run_pipeline(
            spark,
            fixture,
            "tumble_dgim_stream_tws",
            lambda s: (tumble_dgim_stream_tws(s, 60), "update"),
        ),
        run_pipeline(
            spark,
            fixture,
            "cumulate_exact_stream",
            lambda s: (
                J.cumulate_exact_stream(s, 60, 10, watermark="10 seconds"),
                "update",
            ),
        ),
        run_pipeline(
            spark,
            fixture,
            "windowed_user_counts_stream",
            lambda s: (
                _topn_agg(s),
                "append",
            ),
        ),
        # r12 (VERDICT r11 ask #6): classic-vs-TWS throughput for the
        # remaining twins that gained equality pins in r11 — funnel
        # and session DGIM here, heavy hitters in its own harness
        run_pipeline(
            spark,
            fixture,
            "funnel_stream",
            lambda s: (SF.funnel_stream(_funnel_src(s)), "update"),
        ),
        run_pipeline(
            spark,
            fixture,
            "funnel_stream_tws",
            lambda s: (SF.funnel_stream_tws(_funnel_src(s)), "update"),
        ),
        run_pipeline(
            spark,
            fixture,
            "session_dgim_stream",
            lambda s: (
                J.session_dgim_stream(s, 300, key_cols=["bit"]),
                "append",
            ),
        ),
        run_pipeline(
            spark,
            fixture,
            "session_dgim_stream_tws",
            lambda s: (
                session_dgim_stream_tws(s, 300, key_col="bit"),
                "update",
            ),
        ),
    ]
    shutil.rmtree(fixture, ignore_errors=True)
    results.extend(bench_heavy_hitters_stream(spark))
    for r in results:
        print(json.dumps(r))


def bench_heavy_hitters_stream(spark) -> list:
    """Streaming SpaceSaving capacity: replay the sf0.1 documents
    (~0.27M bigrams) through the disjoint-shard sketch — classic
    applyInPandasWithState AND the TWS twin (r12, VERDICT r11 ask
    #6) — and report docs/sec and ngrams/sec for each (state stays
    O(shards × capacity))."""
    from flink_window_dgim_traffic_spark.session import table
    from flink_window_dgim_traffic_spark.streaming import heavy_hitters as SH

    src_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fixture = tempfile.mkdtemp(prefix="bench_hh_fixture_")
    pdf = table(spark, src_dir, "documents").toPandas()
    n_docs = len(pdf)
    n_grams = int(
        sum(max(0, len(t.split(" ")) - 1) for t in pdf["text"])
    )
    for i in range(8):
        chunk = pdf.iloc[i * n_docs // 8 : (i + 1) * n_docs // 8]
        p = os.path.join(fixture, f"chunk_{i:02d}.parquet")
        chunk.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    def run(name, build, tws=False):
        src = (
            spark.readStream.schema(
                "doc_id bigint, text string, lang string, "
                "source string, n_chars bigint"
            )
            .option("maxFilesPerTrigger", 2)
            .parquet(fixture)
        )
        ckpt = tempfile.mkdtemp(prefix=f"bench_hh_ckpt_{name}_")
        cm = tws_state_store_conf(spark) if tws else _nullcontext()
        t0 = time.time()
        with cm:
            q = (
                build(src)
                .writeStream.format("memory")
                .queryName(f"bench_hh_{name}")
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
        dt = time.time() - t0
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
        return dt

    out = []
    for pipeline, build, tws in (
        ("heavy_hitters_stream", SH.heavy_hitters_stream, False),
        ("heavy_hitters_stream_tws", SH.heavy_hitters_stream_tws, True),
    ):
        run(f"warmup_{pipeline}", build, tws)
        dt = run(f"timed_{pipeline}", build, tws)
        out.append(
            {
                "pipeline": pipeline,
                "docs": n_docs,
                "ngrams": n_grams,
                "sec": round(dt, 2),
                "docs_per_sec": round(n_docs / dt),
                "ngrams_per_sec": round(n_grams / dt),
            }
        )
    shutil.rmtree(fixture, ignore_errors=True)
    return out


if __name__ == "__main__":
    main()
