"""Option-level contract tests for the Kafka wiring (SURVEY.md §2.1
S1/S4/S5/S6).  No broker runs in this container, so the first time the
option dicts meet a real cluster must not be the first time they are
checked — every value here is pinned against the reference DDL
(StreamingJob.java:37-75, SlidingWindowStreamingJob.java:42-84,
job.py:121-165) so a typo'd topic, offset mode, or key layout fails in
CI instead of in production.
"""

from __future__ import annotations

import json

from flink_window_dgim_traffic_spark.streaming import jobs as J


def test_source_options_match_reference_ddl():
    """S1: Flink 'scan.startup.mode'='latest-offset' ↔ Spark
    startingOffsets='latest'; topic and bootstrap pass through; the
    consumer group rides kafka.group.id (StreamingJob.java:44-47)."""
    opts = J.kafka_source_options(
        "kafka:9093",
        J.REFERENCE_KAFKA["source_topic"],
        group_id=J.REFERENCE_KAFKA["tumble_group_id"],
    )
    assert opts == {
        "kafka.bootstrap.servers": "kafka:9093",
        "subscribe": "network_traffic",
        "startingOffsets": "latest",
        "kafka.group.id": "flink-dgim-group-java",
    }


def test_source_options_without_group_id():
    """Without an explicit group, Spark manages its own consumer group
    — the option must be absent, not empty (an empty kafka.group.id
    is a broker error)."""
    opts = J.kafka_source_options("b:9092", "network_traffic")
    assert "kafka.group.id" not in opts
    assert opts["startingOffsets"] == "latest"


def test_reference_wiring_values():
    """Every topic / group-id / PK layout the reference declares, in
    one place (REFERENCE_KAFKA) — drift against the reference DDL is
    a test failure, not a silent divergence."""
    R = J.REFERENCE_KAFKA
    assert R["source_topic"] == "network_traffic"
    assert R["tumble_group_id"] == "flink-dgim-group-java"
    assert R["sliding_group_id"] == "flink-dgim-sliding-group-java"
    assert R["pyflink_group_id"] == "flink-dgim-group-v2"
    assert R["tumble_sink_topic"] == "tumble_window_output"
    assert R["sliding_sink_topic"] == "sliding_window_output"
    assert R["pyflink_sink_topic"] == "output-topic"
    assert R["tumble_upsert_keys"] == ["window_end"]
    assert R["sliding_upsert_keys"] == ["window_start", "window_end"]


def test_sink_options_shape():
    """S4/S5/S6 transport options: bootstrap + topic only — the JSON
    key/value payload is the record's job (to_upsert_records), exactly
    like Flink's key.format/value.format='json' split."""
    opts = J.kafka_sink_options(
        "kafka:9093", J.REFERENCE_KAFKA["tumble_sink_topic"]
    )
    assert opts == {
        "kafka.bootstrap.servers": "kafka:9093",
        "topic": "tumble_window_output",
    }


def test_upsert_record_key_layouts(spark):
    """S4 (PK=window_end) and S5 (PK=(window_start,window_end)): the
    emitted key is the JSON object of exactly the PK columns, the
    value is the full row — the layout a compacted upsert-kafka topic
    keys on (StreamingJob.java:59-75)."""
    df = spark.createDataFrame(
        [("2025-01-01 00:00:00", "2025-01-01 00:01:00", 7)],
        "window_start string, window_end string, count_estimate long",
    )

    s4 = J.to_upsert_records(
        df.select("window_end", "count_estimate"),
        J.REFERENCE_KAFKA["tumble_upsert_keys"],
    ).collect()[0]
    assert json.loads(s4["key"]) == {"window_end": "2025-01-01 00:01:00"}
    assert json.loads(s4["value"]) == {
        "window_end": "2025-01-01 00:01:00",
        "count_estimate": 7,
    }

    s5 = J.to_upsert_records(
        df, J.REFERENCE_KAFKA["sliding_upsert_keys"]
    ).collect()[0]
    assert json.loads(s5["key"]) == {
        "window_start": "2025-01-01 00:00:00",
        "window_end": "2025-01-01 00:01:00",
    }
    assert set(json.loads(s5["value"])) == {
        "window_start",
        "window_end",
        "count_estimate",
    }


def test_kafka_wire_decode_matches_file_path(spark):
    """The permissive decode applied to Kafka wire records (binary
    value column) is the same code path the broker-gated source uses;
    exercised here on a static frame shaped like Kafka's output."""
    wire = spark.createDataFrame(
        [
            (bytearray(b'{"value": "1", "timestamp": "2025-01-01T00:00:00.000001"}'),),
            (bytearray(b"not json at all"),),
            (bytearray(b'{"value": "0"}'),),
        ],
        "value binary",
    )
    rows = (
        J.decode_traffic_kafka(wire)
        .select("value", "timestamp")
        .collect()
    )
    assert [tuple(r) for r in rows] == [
        ("1", "2025-01-01T00:00:00.000001"),
        (None, None),  # malformed → null struct (permissive)
        ("0", None),  # missing field → null column
    ]
    parsed = J.parse_traffic(
        J.decode_traffic_kafka(wire)
    ).select("bit", "ts_sec")
    assert [tuple(r) for r in parsed.collect()] == [(1, 1735689600)]


def test_reader_builder_applies_all_options(spark):
    """kafka_traffic_stream feeds every option into the reader; the
    DataStreamReader's option map is not introspectable, so pin the
    seam one level down: the builder in sources.traffic applies the
    same three options and the jobs path iterates the SAME dict that
    the contract tests above pin."""
    from flink_window_dgim_traffic_spark.sources.traffic import kafka_reader

    reader = kafka_reader(spark, "b:9092", "network_traffic")
    # Spark stores reader options privately; assert via the documented
    # public surface — format + the option calls not raising — and the
    # option dict identity used by kafka_traffic_stream.
    assert reader._jreader is not None
    assert J.kafka_source_options("b:9092", "network_traffic") == {
        "kafka.bootstrap.servers": "b:9092",
        "subscribe": "network_traffic",
        "startingOffsets": "latest",
    }


def test_upsert_wire_format_bytes(spark, tmp_path):
    """S4/S5 wire format, not just compaction semantics: the byte
    layout of the emulated upsert records must equal what Flink's
    upsert-kafka sink with key.format=json/value.format=json puts on
    the wire (StreamingJob.java:59-75 — PK window_end; Jackson compact
    encoding: no spaces, schema field order).  A consumer of the
    reference topic must be able to read ours byte-for-byte."""
    df = spark.createDataFrame(
        [("2025-01-01 00:01:00", 42), ("2025-01-01 00:02:00", 7)],
        "window_end string, count_estimate long",
    )
    recs = {
        r["key"]: r["value"]
        for r in J.to_upsert_records(df, ["window_end"]).collect()
    }
    # exact bytes: compact JSON, key holds ONLY the PK, value holds
    # the full row in schema order
    assert recs == {
        '{"window_end":"2025-01-01 00:01:00"}':
            '{"window_end":"2025-01-01 00:01:00","count_estimate":42}',
        '{"window_end":"2025-01-01 00:02:00"}':
            '{"window_end":"2025-01-01 00:02:00","count_estimate":7}',
    }
    # composite PK (S5, hop windows): key = {window_start, window_end}
    df2 = spark.createDataFrame(
        [("2025-01-01 00:00:00", "2025-01-01 00:01:00", 3)],
        "window_start string, window_end string, ones_exact long",
    )
    rec2 = J.to_upsert_records(
        df2, ["window_start", "window_end"]
    ).collect()[0]
    assert rec2["key"] == (
        '{"window_start":"2025-01-01 00:00:00",'
        '"window_end":"2025-01-01 00:01:00"}'
    )

    # round-trip through the foreachBatch log: the on-disk records
    # keep the same bytes, and state recovery parses them back
    out = str(tmp_path / "upsert_log")
    J.upsert_foreach_batch_writer(out, ["window_end"])(df, 0)
    raw = spark.read.schema("key string, value string, batch_id long").json(
        out
    )
    on_disk = {r["key"]: r["value"] for r in raw.collect()}
    assert on_disk == recs
    state = {
        json.loads(r["key"])["window_end"]: json.loads(r["value"])
        for r in J.read_upsert_state(spark, out).collect()
    }
    assert state["2025-01-01 00:01:00"] == {
        "window_end": "2025-01-01 00:01:00",
        "count_estimate": 42,
    }
