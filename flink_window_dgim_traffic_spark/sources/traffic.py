"""Deterministic synthetic traffic source — the reference's
``generate-traffic.py`` re-done as a seeded, event-time-driven fixture
(SURVEY.md §2.1 S7, FIXTURES.md §F1).

The reference publishes Bernoulli bits at ~50 msg/s with 1-bit density
alternating 0.1 ↔ 0.8 every 15 s and inter-arrival ~ Gauss(20 ms,
5 ms) (reference ``generate-traffic.py:18-27,51-68``).  Differences by
design: everything is **event-time** and seeded (no wall clock — the
reference's use of wall clock is untestable, SURVEY §5 item 3), and
~1% of values/timestamps are malformed to exercise the permissive
parse path.
"""

from __future__ import annotations

import datetime
import json
import os
import random

DEFAULT_START = datetime.datetime(2024, 1, 1, 0, 0, 0)
ISO_US = "%Y-%m-%dT%H:%M:%S.%f"


def traffic_bits_rows(
    duration_sec: float = 300.0,
    seed: int = 42,
    start: datetime.datetime = DEFAULT_START,
    malformed_frac: float = 0.01,
):
    """Yield (value, timestamp) string pairs, ~50 rows/s of event time."""
    rng = random.Random(seed)
    t = 0.0
    while t < duration_sec:
        density = 0.1 if int(t // 15) % 2 == 0 else 0.8
        bit = "1" if rng.random() < density else "0"
        ts = start + datetime.timedelta(seconds=t)
        ts_str = ts.strftime(ISO_US)
        r = rng.random()
        if r < malformed_frac / 2:
            bit = rng.choice(["x", "", None])
        elif r < malformed_frac:
            ts_str = rng.choice(["not-a-time", None])
        yield bit, ts_str
        t += max(0.001, rng.gauss(0.02, 0.005))


def traffic_bits_df(spark, duration_sec: float = 300.0, seed: int = 42):
    """The F1 fixture as a batch DataFrame (value STRING, timestamp
    STRING) — pre-JSON-decode shape."""
    rows = list(traffic_bits_rows(duration_sec, seed))
    return spark.createDataFrame(rows, "value string, timestamp string")


def write_traffic_json(
    path: str,
    duration_sec: float = 300.0,
    seed: int = 42,
    n_chunks: int = 3,
):
    """Write the fixture as n_chunks time-ordered JSON files for
    Structured Streaming file-source replay (one file per
    micro-batch with maxFilesPerTrigger=1)."""
    os.makedirs(path, exist_ok=True)
    rows = list(traffic_bits_rows(duration_sec, seed))
    per = (len(rows) + n_chunks - 1) // n_chunks
    files = []
    for i in range(n_chunks):
        chunk = rows[i * per : (i + 1) * per]
        fp = os.path.join(path, f"chunk_{i:04d}.json")
        with open(fp, "w") as f:
            for v, ts in chunk:
                f.write(json.dumps({"value": v, "timestamp": ts}) + "\n")
        # the file stream source orders files by MODIFICATION TIME;
        # chunks written within one clock tick would replay in
        # arbitrary order, so a late chunk could advance the watermark
        # past an unread older one (dropping it as late data).
        # Distinct increasing mtimes pin replay to event-time order.
        os.utime(fp, (1_700_000_000 + i, 1_700_000_000 + i))
        files.append(fp)
    return files


def kafka_reader(spark, bootstrap_servers: str, topic: str, starting: str = "latest"):
    """Kafka JSON source builder mirroring the reference DDL
    (``StreamingJob.java:37-55``): subscribe + startingOffsets.  Not
    exercisable in this container (no broker) — returns the reader so
    callers can ``.load()`` against a real cluster."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting)
    )
