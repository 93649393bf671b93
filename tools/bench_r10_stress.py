#!/usr/bin/env python
"""Round-10 stress studies (VERDICT r9 asks #4 and #6):

1. IVF incremental probe cost vs committed delta snapshot count —
   refresh 10 delta batches into a frozen-codebook index and time
   ``simsearch_ivf_indexed`` after 1 / 5 / 10 snapshots.  The claim:
   probe time is flat-ish in snapshot COUNT (each delta is
   cluster-partitioned, so a probe reads nprobe directories per
   snapshot — cost grows with snapshots only through file-open
   overhead, not data volume).
2. Stream window join at 30× replay volume — the r9 streaming joins
   pushed through 1× vs 30× events (3 availableNow micro-batches),
   wall ratio vs linear=30.
3. Skew robustness (ask #6): a 30× events variant where ONE user
   holds ~10% of all rows (Zipf head), pushed through window_join /
   sessionize / user_spend_salted_join, compared against the uniform
   30× twin.  The claim: wall time within ~2× of uniform (salting +
   AQE skew handling hold; no single-reducer collapse).

Prints one JSON line per measurement.  Uses /tmp staging; re-runnable.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    relational as R,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    similarity as S,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    windows as W,
)
from flink_window_dgim_traffic_spark.session import (  # noqa: E402
    get_spark,
    table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_r10_stress"
SCALE = int(os.environ.get("SPARK_GRAFT_SKEW_SCALE", "30"))


def _t(fn, reps: int = 2) -> float:
    """min-of-N timing with a warm run (bench.py discipline)."""
    fn()
    runs = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def _emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


# ----------------------------------------------------------------------
# 1. IVF probe cost vs number of committed delta snapshots
# ----------------------------------------------------------------------
def ivf_snapshot_study(spark) -> None:
    emb = table(spark, SF_DIR, "embeddings")
    idx = f"{OUT}/ivf_inc"
    shutil.rmtree(idx, ignore_errors=True)
    S.build_ivf_index(emb.filter(F.col("vec_id") % 12 == 0), idx)
    checkpoints = {1, 5, 10}
    for i in range(1, 11):
        S.refresh_ivf_index(
            spark,
            idx,
            emb.filter(F.col("vec_id") % 12 == i % 12),
            tag=f"d{i}",
        )
        if i in checkpoints:
            sec = _t(
                lambda: S.simsearch_ivf_indexed(spark, idx, nprobe=4)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            _emit(study="ivf_probe_vs_snapshots", snapshots=i, sec=sec)
    # compaction resets the member-scan count: probe after folding
    # the 10 deltas into one snapshot must return to the ~1-snapshot
    # cost (the LSM discipline for a long-running refresh stream)
    assert S.compact_ivf_index(spark, idx)
    S.gc_ivf_deltas(idx)
    sec = _t(
        lambda: S.simsearch_ivf_indexed(spark, idx, nprobe=4)
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    _emit(study="ivf_probe_vs_snapshots", snapshots="10+compact", sec=sec)


# ----------------------------------------------------------------------
# 2. stream window join replay volume 1x vs SCALE x
# ----------------------------------------------------------------------
def _scaled_events(spark, scale: int, skew_frac: float = 0.0):
    """Replicate events scale× over a scale×-longer history (the
    bench_scaling longer-retention axis).  With ``skew_frac`` > 0,
    reassign that fraction of ALL rows to user 0 — the Zipf-head
    crawl shape every current stress lacked (uniform keys)."""
    tagname = f"x{scale}" + (f"_skew{int(skew_frac * 100)}" if skew_frac else "")
    path = f"{OUT}/events_{tagname}.parquet"
    if not os.path.exists(path):
        ev = table(spark, SF_DIR, "events")
        lo, hi, n = ev.agg(
            F.min(F.unix_timestamp("ts")),
            F.max(F.unix_timestamp("ts")),
            F.count(F.lit(1)),
        ).collect()[0]
        span = int(hi - lo) + 86400
        parts = [
            ev.select(
                (F.col("event_id") + k * n).alias("event_id"),
                F.timestamp_seconds(
                    F.unix_timestamp("ts") + F.lit(k * span)
                ).alias("ts"),
                "user_id",
                "event_type",
                "value",
            )
            for k in range(scale)
        ]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        if skew_frac:
            scaled = scaled.withColumn(
                "user_id",
                F.when(
                    F.pmod(F.xxhash64("event_id"), F.lit(1000))
                    < int(skew_frac * 1000),
                    F.lit(0).cast(scaled.schema["user_id"].dataType),
                ).otherwise(F.col("user_id")),
            )
        scaled.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def stream_join_study(spark) -> None:
    from flink_window_dgim_traffic_spark.streaming.joins import (
        window_join_stream,
    )

    for scale in (1, SCALE):
        ev = _scaled_events(spark, scale)
        base = f"{OUT}/swj_x{scale}"
        shutil.rmtree(base, ignore_errors=True)
        src = f"{base}/src"
        us = F.unix_micros(F.col("ts"))
        lo, hi = ev.agg(F.min(us), F.max(us)).collect()[0]
        span = (hi - lo) // 3 + 1
        for i in range(3):
            ev.filter(
                (us >= lo + i * span) & (us < lo + (i + 1) * span)
            ).coalesce(4).write.mode("overwrite").parquet(f"{src}/c{i}")
        files = sorted(
            f"{src}/c{i}/{nm}"
            for i in range(3)
            for nm in os.listdir(f"{src}/c{i}")
            if nm.endswith(".parquet")
        )
        for i, p in enumerate(files):
            os.utime(p, (1000000000 + i * 60,) * 2)

        def run(run_id=[0]):
            run_id[0] += 1
            name = f"swj_{scale}_{run_id[0]}"
            stream = (
                spark.readStream.schema(
                    "event_id long, ts timestamp, user_id long,"
                    " event_type string, value double"
                )
                .option("maxFilesPerTrigger", 4)
                .option("recursiveFileLookup", "true")
                .parquet(src)
            )
            q = (
                window_join_stream(
                    stream.filter(F.col("event_type") == "view"),
                    stream.filter(F.col("event_type") == "purchase"),
                    600,
                )
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            spark.catalog.dropTempView(name)

        sec = _t(run, reps=1)
        _emit(study="stream_window_join_scale", scale=scale, sec=sec)


# ----------------------------------------------------------------------
# 3. skew robustness: uniform vs Zipf-head 30x events
# ----------------------------------------------------------------------
def skew_study(spark) -> None:
    ops = {
        "window_join": lambda ev: W.window_join(
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
            600,
        ),
        "sessionize": lambda ev: R.sessionize(ev),
        "user_spend_salted_join": lambda ev: R.user_spend_salted_join(ev),
    }
    for variant, skew in (("uniform", 0.0), ("zipf_head_10pct", 0.10)):
        ev = _scaled_events(spark, SCALE, skew_frac=skew)
        for name, build in ops.items():
            sec = _t(
                lambda: build(ev)
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
            _emit(
                study="skew_robustness",
                op=name,
                variant=variant,
                scale=SCALE,
                sec=sec,
            )


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(app_name="bench_r10_stress")
    which = os.environ.get("SPARK_GRAFT_R10_STUDIES", "ivf,stream,skew")
    if "ivf" in which:
        ivf_snapshot_study(spark)
    if "stream" in which:
        stream_join_study(spark)
    if "skew" in which:
        skew_study(spark)


if __name__ == "__main__":
    main()
