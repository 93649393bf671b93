"""Stream-stream interval join: streaming result must equal the batch
interval join over the same data (inner join, append mode)."""

import os

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.session import table
from flink_window_dgim_traffic_spark.streaming.joins import (
    view_purchase_interval_join,
)


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .filter(F.col("event_type").isin("view", "purchase"))
    )
    # replay source: 3 time-ordered parquet chunks
    pdf = ev.orderBy("ts").toPandas()
    src = tmp_path / "ev_chunks"
    os.makedirs(src)
    n = len(pdf)
    for i in range(3):
        chunk = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        # µs timestamps: the session's nanosAsLong conf would read
        # pandas' default ns-typed column as a bare long
        chunk.to_parquet(
            str(src / f"chunk_{i:02d}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        # pin replay order: the file source sorts by mtime, and
        # same-tick writes would replay in arbitrary order (watermark
        # could then drop an older chunk wholesale)
        os.utime(
            str(src / f"chunk_{i:02d}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )

    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    views = stream.filter(F.col("event_type") == "view")
    purchases = stream.filter(F.col("event_type") == "purchase")
    q = (
        view_purchase_interval_join(views, purchases, 3600)
        .writeStream.format("memory")
        .queryName("t_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_ssj").collect()}

    bviews = ev.filter(F.col("event_type") == "view")
    bpurch = ev.filter(F.col("event_type") == "purchase")
    expect = {
        tuple(r)
        for r in view_purchase_interval_join(
            bviews, bpurch, 3600, streaming=False
        ).collect()
    }
    assert len(expect) > 0  # the fixture must actually exercise the join
    assert got == expect


def test_stream_window_join_matches_batch(spark, sf_dir, tmp_path):
    """Flink-style window join as a STREAM-STREAM join: tumble-window
    equality + key equality, watermark-bounded state; result must
    equal both the streaming op in batch mode AND the batch
    windows.window_join operator."""
    from flink_window_dgim_traffic_spark.operators.windows import (
        window_join,
    )
    from flink_window_dgim_traffic_spark.streaming.joins import (
        window_join_stream,
    )

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .filter(F.col("event_type").isin("view", "purchase"))
    )
    pdf = ev.orderBy("ts").toPandas()
    src = tmp_path / "ev_wj_chunks"
    os.makedirs(src)
    n = len(pdf)
    for i in range(3):
        chunk = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        chunk.to_parquet(
            str(src / f"chunk_{i:02d}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(
            str(src / f"chunk_{i:02d}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        window_join_stream(
            stream.filter(F.col("event_type") == "view"),
            stream.filter(F.col("event_type") == "purchase"),
            600,
        )
        .writeStream.format("memory")
        .queryName("t_swj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM t_swj").collect()
    )
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    want_stream_batch = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in window_join_stream(
            views, buys, 600, streaming=False
        ).collect()
    )
    want_batch_op = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in window_join(views, buys, 600).collect()
    )
    assert got == want_stream_batch == want_batch_op
    assert len(got) > 0


@pytest.mark.parametrize(
    "mode_kw",
    [{"slide_sec": 300}, {"cumulate_step_sec": 300}],
    ids=["hop", "cumulate"],
)
def test_stream_window_join_hop_cumulate_matches_batch(
    spark, sf_dir, tmp_path, mode_kw
):
    """HOP / CUMULATE stream-stream window joins (reduction to a
    step-sized tumble join over exploded slot-end timestamps) must
    equal the batch windows.window_join in the same mode, replayed
    over time-ordered micro-batches."""
    from flink_window_dgim_traffic_spark.operators.windows import (
        window_join,
    )
    from flink_window_dgim_traffic_spark.streaming.joins import (
        window_join_stream,
    )

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .filter(F.col("event_type").isin("view", "purchase"))
    )
    pdf = ev.orderBy("ts").toPandas()
    src = tmp_path / "ev_wjx_chunks"
    os.makedirs(src)
    n = len(pdf)
    for i in range(3):
        chunk = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        chunk.to_parquet(
            str(src / f"chunk_{i:02d}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(
            str(src / f"chunk_{i:02d}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    name = "t_swj_" + next(iter(mode_kw))
    q = (
        window_join_stream(
            stream.filter(F.col("event_type") == "view"),
            stream.filter(F.col("event_type") == "purchase"),
            600,
            **mode_kw,
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    )
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    want = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in window_join(views, buys, 600, **mode_kw).collect()
    )
    assert got == want
    assert len(got) > 0
    import pytest as _pt

    with _pt.raises(ValueError):
        window_join_stream(
            views, buys, 600, slide_sec=300, cumulate_step_sec=300
        )


def test_stream_window_semijoin_matches_batch(spark, sf_dir, tmp_path):
    """Left-semi stream-stream window join (a view emits once iff a
    same-window purchase exists) must equal the batch semi mode;
    anti mode must be refused in streaming (absence is only
    decidable at watermark expiry)."""
    from flink_window_dgim_traffic_spark.operators.windows import (
        window_join,
    )
    from flink_window_dgim_traffic_spark.streaming.joins import (
        window_join_stream,
    )

    ev = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts", "event_type")
        .filter(F.col("event_type").isin("view", "purchase"))
    )
    pdf = ev.orderBy("ts").toPandas()
    src = tmp_path / "ev_semi_chunks"
    os.makedirs(src)
    n = len(pdf)
    for i in range(3):
        chunk = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
        chunk.to_parquet(
            str(src / f"chunk_{i:02d}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(
            str(src / f"chunk_{i:02d}.parquet"),
            (1_700_000_000 + i, 1_700_000_000 + i),
        )
    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, ts timestamp, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        window_join_stream(
            stream.filter(F.col("event_type") == "view"),
            stream.filter(F.col("event_type") == "purchase"),
            600,
            how="left_semi",
        )
        .writeStream.format("memory")
        .queryName("t_swj_semi")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"])
        for r in spark.sql("SELECT * FROM t_swj_semi").collect()
    )
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    want = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"])
        for r in window_join(views, buys, 600, how="left_semi").collect()
    )
    assert got == want
    assert len(got) > 0
    import pytest as _pt

    with _pt.raises(ValueError):
        window_join_stream(views, buys, 600, how="left_anti")


def test_stream_hop_join_disorder_within_documented_tolerance(
    spark, tmp_path
):
    """Disorder-tolerance CONTRACT pin for the hop stream join: a
    purchase arriving 450 s behind the watermark-driving events
    (inside the documented 600 s tolerance) must still produce every
    batch join pair.  Investigating the r8 advice here established
    the actual mechanics: Spark does NOT input-drop late stream-join
    rows — pairs are lost only when the OTHER side's pane state is
    evicted, and eviction fires at pane END (slot + step) against
    wm = max_slot − delay, so losses start at disorder ≈ delay even
    before the slot-spread widening; the widening (delay + spread on
    the slot column) moves that to ≈ delay + spread, giving the
    documented tolerance real margin.  This test pins the contract
    boundary the docstring promises."""
    import pandas as pd

    from flink_window_dgim_traffic_spark.operators.windows import (
        window_join,
    )
    from flink_window_dgim_traffic_spark.streaming.joins import (
        window_join_stream,
    )

    base = 1_700_000_000  # any epoch anchor; offsets are what matter
    rows_b1 = [  # batch 1: view A + watermark drivers on BOTH sides
        # (the global watermark is the MIN across watermarked
        # streams, so an idle purchase side would hold it at zero
        # and mask the regression)
        (1, 7, base + 9500, "view"),      # A: slots {9600, 9900}
        (2, 8, base + 9900, "view"),      # C: max slot 10500
        (4, 9, base + 9900, "purchase"),  # D: max slot 10500
    ]
    rows_b2 = [  # batch 2: purchase 450 s behind C/D
        (3, 7, base + 9450, "purchase"),  # B: slots {9600, 9900}
    ]
    src = tmp_path / "wj_disorder"
    os.makedirs(src)
    for i, rows in enumerate((rows_b1, rows_b2)):
        pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": [r[1] for r in rows],
                "ts": pd.to_datetime(
                    [r[2] for r in rows], unit="s", utc=True
                ).tz_localize(None),
                "event_type": [r[3] for r in rows],
            }
        ).to_parquet(
            str(src / f"chunk_{i:02d}.parquet"),
            index=False,
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
        os.utime(
            str(src / f"chunk_{i:02d}.parquet"),
            (1_600_000_000 + i, 1_600_000_000 + i),
        )
    stream = (
        spark.readStream.schema(
            "event_id bigint, user_id bigint, ts timestamp,"
            " event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        window_join_stream(
            stream.filter(F.col("event_type") == "view"),
            stream.filter(F.col("event_type") == "purchase"),
            600,
            watermark="600 seconds",
            slide_sec=300,
        )
        .writeStream.format("memory")
        .queryName("t_swj_disorder")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM t_swj_disorder").collect()
    )
    all_rows = spark.createDataFrame(
        [
            (r[0], r[1], r[2], r[3])
            for r in rows_b1 + rows_b2
        ],
        "event_id bigint, user_id bigint, ts_sec bigint, event_type string",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds("ts_sec").alias("ts"),
        "event_type",
    )
    want = sorted(
        (r["window_end"], r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in window_join(
            all_rows.filter(F.col("event_type") == "view"),
            all_rows.filter(F.col("event_type") == "purchase"),
            600,
            slide_sec=300,
        ).collect()
    )
    # the batch truth has BOTH slot pairs (9600 and 9900)
    assert len(want) == 2
    assert got == want
