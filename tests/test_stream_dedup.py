"""Streaming dedup (dropDuplicatesWithinWatermark): duplicates that
arrive within the watermark delay are suppressed, the survivor set
equals batch dedup, and the state store is bounded by eviction rather
than retaining every key ever seen."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_window_dgim_traffic_spark.streaming import jobs as J
from flink_window_dgim_traffic_spark.streaming.dedup import dedup_stream

N_IDS = 300  # one event per second, 5 minutes
SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def dup_fixture_dir(tmp_path_factory):
    """Time-ordered JSON chunks; every 3rd event appears twice
    (adjacent redelivery, the at-least-once shape) — 400 rows total."""
    d = tmp_path_factory.mktemp("dup_events")
    rows = []
    for i in range(N_IDS):
        ts = f"2026-01-01T00:{i // 60:02d}:{i % 60:02d}.000000"
        rows.append({"event_id": i, "ts": ts, "value": float(i)})
        if i % 3 == 0:
            rows.append({"event_id": i, "ts": ts, "value": float(i)})
    per = len(rows) // 4
    for c in range(4):
        chunk = rows[c * per :] if c == 3 else rows[c * per : (c + 1) * per]
        path = f"{d}/chunk_{c}.json"
        with open(path, "w") as f:
            f.write("\n".join(json.dumps(r) for r in chunk))
        # the file stream source orders files by modification time;
        # chunks written within one mtime tick would be read in
        # ARBITRARY order, letting a late chunk advance the watermark
        # past an unread older chunk (observed flake: one whole chunk
        # dropped as late data).  Distinct increasing mtimes pin the
        # in-event-time order.
        os.utime(path, (1_700_000_000 + c, 1_700_000_000 + c))
    return str(d)


def _stream(spark, path):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(path)
    )


def test_stream_dedup_matches_batch(spark, dup_fixture_dir):
    deduped = dedup_stream(
        _stream(spark, dup_fixture_dir), ["event_id"], delay="30 seconds"
    )
    q = J.run_stream_to_memory(deduped, "t_dedup", output_mode="append")
    got = spark.sql("SELECT event_id, value FROM t_dedup").collect()
    assert len(got) == N_IDS  # every duplicate suppressed
    assert sorted(r["event_id"] for r in got) == list(range(N_IDS))
    # state is bounded: eviction kept strictly fewer keys than the
    # total distinct keys streamed (watermark advanced across chunks)
    state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
    assert 0 < state_rows < N_IDS


def test_stream_dedup_composite_key(spark, dup_fixture_dir):
    """Composite-key dedup: (event_id, value) — still exactly-once
    per key within the watermark."""
    deduped = dedup_stream(
        _stream(spark, dup_fixture_dir),
        ["event_id", "value"],
        delay="30 seconds",
    )
    J.run_stream_to_memory(deduped, "t_dedup2", output_mode="append")
    assert spark.sql("SELECT * FROM t_dedup2").count() == N_IDS


# ---------------------------------------------- stream-static incremental


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


@pytest.fixture(scope="module")
def crawl_fixture(tmp_path_factory, spark):
    """A doc_id-ordered crawl stream (3 JSON chunks) plus a static
    index: texts t0..t9 cycle in the stream; the index already holds
    t0..t4.  Within-stream dups are adjacent (redelivery shape)."""
    d = tmp_path_factory.mktemp("crawl_docs")
    rows = []
    for i in range(60):
        ts = f"2026-01-01T00:00:{i:02d}.000000"
        rows.append({"doc_id": i, "text": f"t{i % 10}", "ts": ts})
    per = len(rows) // 3
    import os
    import time

    base = time.time() - 100
    for c in range(3):
        path = f"{d}/chunk_{c}.json"
        with open(path, "w") as f:
            f.write(
                "\n".join(
                    __import__("json").dumps(r)
                    for r in rows[c * per : (c + 1) * per]
                )
            )
        # file source orders micro-batches by mtime; pin it
        os.utime(path, (base + c, base + c))
    index = spark.createDataFrame(
        [(1000 + k, f"t{k}") for k in range(5)], "doc_id long, text string"
    )
    return str(d), index


def test_dedup_incremental_stream_matches_batch(spark, crawl_fixture):
    from flink_window_dgim_traffic_spark.operators import dedup as D
    from flink_window_dgim_traffic_spark.streaming.dedup import (
        dedup_incremental_stream,
    )

    path, index = crawl_fixture
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(path)
    )
    out = dedup_incremental_stream(stream, index, delay="600 seconds")
    J.run_stream_to_memory(out, "t_incr_dedup", "append")
    rows_kept = spark.sql("SELECT doc_id, text FROM t_incr_dedup").collect()
    # exactly ONE survivor per novel text (t5..t9); indexed texts
    # (t0..t4) never emit.  The survivor's doc_id is first-arrival at
    # micro-batch granularity but arbitrary within a batch — assert it
    # is a legitimate copy of its text, not a specific id
    assert sorted(r["text"] for r in rows_kept) == [
        f"t{i}" for i in range(5, 10)
    ]
    for r in rows_kept:
        assert f"t{r['doc_id'] % 10}" == r["text"]
    # batch twin keeps the same text set (one keep per novel text)
    batch_new = spark.read.schema(DOC_SCHEMA).json(path)
    batch = D.dedup_incremental(batch_new, index)
    assert batch.count() == len(rows_kept) == 5


def test_contamination_stream_matches_batch(spark, tmp_path):
    """Append-mode stream-static decontamination equals the batch
    contamination_check on the same docs, with zero stateful
    operators in the plan."""
    from flink_window_dgim_traffic_spark.operators.corpus import (
        contamination_check,
    )
    from flink_window_dgim_traffic_spark.streaming.dedup import (
        contamination_stream,
    )

    rows = [
        (0, "a b c d", "en", "src0", 1),
        (1, "a b c x y", "en", "src1", 1),
        (2, "p q r s t", "en", "src1", 1),
        (3, "a b c d e f", "en", "src2", 1),
    ]
    schema = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    docs = spark.createDataFrame(rows, schema)
    src = tmp_path / "src"
    src.mkdir()
    docs.filter(F.col("source") != "src0").coalesce(1).write.parquet(
        str(src / "c1")
    )
    stream = spark.readStream.schema(schema).parquet(str(src) + "/*")
    bench = docs.filter(F.col("source") == "src0")
    out = contamination_stream(stream, bench)
    q = (
        out.writeStream.format("memory")
        .queryName("t_contam")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_contaminated"],
            r["contamination_ratio"],
        )
        for r in spark.sql("SELECT * FROM t_contam").collect()
    }
    expect = {
        r["doc_id"]: (
            r["n_shingles"],
            r["n_contaminated"],
            r["contamination_ratio"],
        )
        for r in contamination_check(docs).collect()
    }
    assert got == expect and len(got) == 3
