"""The S7 synthetic traffic generator as a REGISTERED Spark data
source (Spark 4 Python DataSource API): ``spark.read.format
("traffic")`` for batch and ``spark.readStream.format("traffic")``
for an offset-tracked stream — the reference's
``generate-traffic.py`` + Kafka topic collapsed into one first-class
source (no broker, no fixture files).

Batch shape: event time is sliced into ``numPartitions`` disjoint
ranges, each generated independently from a per-slice seed — the scan
is embarrassingly parallel and deterministic (same options → same
rows, any cluster size).  With ``numPartitions=1`` the row stream is
byte-identical to ``traffic.traffic_bits_rows`` (pinned in tests).

Streaming shape: a ``SimpleDataSourceStreamReader`` whose offset is
the generated event-time frontier ``{"t": seconds}`` — each
micro-batch extends the frontier by ``step_sec`` until
``duration_sec`` is exhausted.  Offsets make replays deterministic:
restarting from a checkpoint regenerates exactly the uncommitted
range (the generator is a pure function of (seed, time range)).
"""

from __future__ import annotations

import datetime

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

SCHEMA = "value string, timestamp string"


def _gen(duration_sec: float, seed: int, start_offset_sec: float):
    from flink_window_dgim_traffic_spark.sources.traffic import (
        DEFAULT_START,
        traffic_bits_rows,
    )

    start = DEFAULT_START + datetime.timedelta(seconds=start_offset_sec)
    return traffic_bits_rows(duration_sec, seed, start)


class _Slice(InputPartition):
    def __init__(self, t0: float, dur: float, seed: int):
        self.t0, self.dur, self.seed = t0, dur, seed


class _TrafficBatchReader(DataSourceReader):
    def __init__(self, options):
        self.duration = float(options.get("duration_sec", 300.0))
        self.seed = int(options.get("seed", 42))
        self.n = int(options.get("numPartitions", 1))

    def partitions(self):
        per = self.duration / self.n
        return [
            _Slice(i * per, per, self.seed + i) for i in range(self.n)
        ]

    def read(self, partition):
        return _gen(partition.dur, partition.seed, partition.t0)


class _TrafficStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.duration = float(options.get("duration_sec", 300.0))
        self.seed = int(options.get("seed", 42))
        self.step = float(options.get("step_sec", 30.0))

    def initialOffset(self):
        return {"t": 0.0}

    def read(self, start):
        t0 = float(start["t"])
        if t0 >= self.duration:
            return iter([]), {"t": t0}
        dur = min(self.step, self.duration - t0)
        # per-batch seed derived from the frontier so a replay of the
        # same offset range regenerates identical rows
        rows = list(_gen(dur, self.seed + int(t0 * 1000), t0))
        return iter(rows), {"t": t0 + dur}

    def readBetweenOffsets(self, start, end):
        t0 = float(start["t"])
        dur = float(end["t"]) - t0
        return iter(list(_gen(dur, self.seed + int(t0 * 1000), t0)))

    def commit(self, end):
        pass


class TrafficDataSource(DataSource):
    @classmethod
    def name(cls):
        return "traffic"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _TrafficBatchReader(self.options)

    def simpleStreamReader(self, schema):
        return _TrafficStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("traffic")`` works in this session."""
    spark.dataSource.register(TrafficDataSource)
