"""Hand-vector tests for the round-5 wave-3 operators:
seasonal_anomaly, late_data_audit (operators/windows.py),
value_deciles (operators/analytics.py), collocations_pmi
(operators/text.py), posting_lists (operators/retrieval.py).
The DuckDB twins are the cross-engine gate; these pin the semantics
on constructed inputs where the expected answer is computed by hand.
"""

import datetime as dt

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators.analytics import (
    value_deciles,
)
from flink_window_dgim_traffic_spark.operators.retrieval import (
    posting_lists,
)
from flink_window_dgim_traffic_spark.operators.text import (
    collocations_pmi,
)
from flink_window_dgim_traffic_spark.operators.windows import (
    late_data_audit,
    seasonal_anomaly,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id: bigint, ts: timestamp, event_type: string"
    )


def test_seasonal_anomaly_flags_hot_minute(spark):
    # minute-slot 0 of each hour: 3 quiet hours at 2 events, one hour
    # at 9 events -> 9*4 > (15)*3/2 ... mean=15/4, high iff c*4*2>3*15
    rows = []
    eid = 0
    for h in range(4):
        n = 9 if h == 3 else 2
        for i in range(n):
            rows.append(
                (eid, T0 + dt.timedelta(hours=h, seconds=i), "click")
            )
            eid += 1
    out = seasonal_anomaly(_ev(spark, rows), 60, 3600, 3, 2).collect()
    # mean = 15/4 = 3.75: the hot window (9 > 1.5*3.75) is high AND
    # each quiet window (2 < 3.75/1.5 = 2.5) flags low
    highs = [r for r in out if r.direction == "high"]
    lows = [r for r in out if r.direction == "low"]
    assert len(highs) == 1 and len(lows) == 3
    r = highs[0]
    assert r.cnt == 9 and r.slot == 1  # events in [h:00, h:01) end at :01
    assert r.baseline_e6 == 15 * 1_000_000 // 4
    assert all(x.cnt == 2 for x in lows)


def test_seasonal_anomaly_low_direction(spark):
    rows = []
    eid = 0
    for h in range(4):
        n = 1 if h == 3 else 9
        for i in range(n):
            rows.append(
                (eid, T0 + dt.timedelta(hours=h, seconds=i), "click")
            )
            eid += 1
    out = seasonal_anomaly(_ev(spark, rows), 60, 3600, 3, 2).collect()
    assert [r.direction for r in out] == ["low"]
    assert out[0].cnt == 1


def test_late_data_audit_hand_vector(spark):
    # arrival order: e1 (ts 100s), e2 (ts 400s), e3 (ts 90s -> 310s
    # late vs wm 400), e4 (ts 395s -> 5s late, under 60s threshold)
    def us(sec):
        return sec * 1_000_000

    rows = [
        (1, T0 + dt.timedelta(seconds=100), "a", us(1000)),
        (2, T0 + dt.timedelta(seconds=400), "a", us(1001)),
        (3, T0 + dt.timedelta(seconds=90), "a", us(1002)),
        (4, T0 + dt.timedelta(seconds=395), "a", us(1003)),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: bigint, ts: timestamp, event_type: string,"
        " arrival_us: bigint",
    )
    out = {
        r.window_end: r
        for r in late_data_audit(
            df, "arrival_us", late_after_sec=60, size_sec=600
        ).collect()
    }
    w = out["2024-01-01 00:10:00"]  # all four events are in [0, 600)
    assert w.n_events == 4
    assert w.n_late == 1  # only e3 beyond 60 s
    assert w.max_lateness_us == us(310)
    assert w.sum_lateness_us == us(310) + us(5)


def test_late_data_audit_shard_boundary_consistency(spark):
    # same data through 1-second shards must equal one big shard:
    # the sharded prefix max is an internal detail
    rows = [
        (i, T0 + dt.timedelta(seconds=(i * 37) % 100), "a",
         1_000_000 * i)
        for i in range(50)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: bigint, ts: timestamp, event_type: string,"
        " arrival_us: bigint",
    )
    a = sorted(
        late_data_audit(
            df, "arrival_us", late_after_sec=0, size_sec=60,
            shard_sec=1,
        ).collect()
    )
    b = sorted(
        late_data_audit(
            df, "arrival_us", late_after_sec=0, size_sec=60,
            shard_sec=10_000,
        ).collect()
    )
    assert a == b


def test_value_deciles_remainder_to_early_tiles(spark):
    rows = [
        (i, T0, "t", float(i)) for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "event_id: bigint, ts: timestamp, event_type: string,"
        " value: double"
    )
    out = {
        (r.key, r.tile): (r.n, r.v_min, r.v_max)
        for r in value_deciles(df, n_tiles=3).collect()
    }
    # ANSI ntile over 7 rows / 3 tiles -> sizes 3,2,2
    assert out[("t", 1)] == (3, 0.0, 2.0)
    assert out[("t", 2)] == (2, 3.0, 4.0)
    assert out[("t", 3)] == (2, 5.0, 6.0)


def test_collocations_pmi_hand_vector(spark):
    # corpus: "a b" x5 and "c c" x5 -> bigrams: (a,b)*5, (c,c)*5
    docs = spark.createDataFrame(
        [(i, "a b") for i in range(5)]
        + [(i + 5, "c c") for i in range(5)],
        "doc_id: bigint, text: string",
    )
    out = {
        (r.w1, r.w2): r for r in collocations_pmi(docs, 5).collect()
    }
    # N_uni = 20, N_bg = 10; c_a = c_b = 5, c_c = 10
    ab = out[("a", "b")]
    assert (ab.c_xy, ab.c_x, ab.c_y) == (5, 5, 5)
    assert ab.pmi_ratio_micro == 5 * 20 * 20 * 1_000_000 // (10 * 5 * 5)
    cc = out[("c", "c")]
    assert cc.pmi_ratio_micro == 5 * 20 * 20 * 1_000_000 // (
        10 * 10 * 10
    )


def test_posting_lists_caps_and_sorts(spark):
    docs = spark.createDataFrame(
        [(i, "x y" if i % 2 else "x") for i in range(10)],
        "doc_id: bigint, text: string",
    )
    out = {r.term: r for r in posting_lists(docs, max_postings=3).collect()}
    x = out["x"]
    assert x.df == 10 and x.total_tf == 10
    assert x.postings_head == "0,1,2"  # capped at 3, ascending
    y = out["y"]
    assert y.df == 5 and y.postings_head == "1,3,5"


def test_hop_topn_overlapping_windows(spark):
    from flink_window_dgim_traffic_spark.operators.windows import (
        hop_topn,
    )

    # user 1: 3 events at t=5s; user 2: 2 events at t=12s — the
    # window [0,60) sees both; sliding windows starting after 5s
    # lose user 1
    rows = [(i, T0 + dt.timedelta(seconds=5), "a", 1) for i in range(3)]
    rows += [
        (10 + i, T0 + dt.timedelta(seconds=12), "a", 2)
        for i in range(2)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: bigint, ts: timestamp, event_type: string,"
        " user_id: bigint",
    )
    out = {
        (r.window_start, r.rnk): r.user_id
        for r in hop_topn(df, 60, 10, 1).collect()
    }
    assert out[("2024-01-01 00:00:00", 1)] == 1  # both present, 3>2
    assert out[("2024-01-01 00:00:10", 1)] == 2  # only user 2 left


def test_percentile_rank_bounds_and_single_row(spark):
    from flink_window_dgim_traffic_spark.operators.analytics import (
        percentile_rank,
    )

    rows = [(i, T0, "a", float(i)) for i in range(5)] + [
        (99, T0, "b", 7.0)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id: bigint, ts: timestamp, event_type: string,"
        " value: double",
    )
    out = {
        (r.key, r.event_id): r.pr_ppm
        for r in percentile_rank(df).collect()
    }
    assert out[("a", 0)] == 0
    assert out[("a", 4)] == 1_000_000
    assert out[("a", 2)] == 500_000
    assert out[("b", 99)] == 0  # single-row key


def test_join_hotspots_top_fanout(spark):
    from flink_window_dgim_traffic_spark.operators.relational import (
        join_hotspots,
    )

    left = spark.createDataFrame(
        [(1,)] * 5 + [(2,)] * 2, "user_id: bigint"
    )
    right = spark.createDataFrame(
        [(1,)] * 3 + [(2,)] * 4 + [(3,)] * 9, "user_id: bigint"
    )
    out = [
        (r.user_id, r.n_left, r.n_right, r.fanout, r.rnk)
        for r in join_hotspots(left, right, ["user_id"], 10)
        .orderBy("rnk")
        .collect()
    ]
    # key 3 never joins (absent on the left); 1: 5*3=15, 2: 2*4=8
    assert out == [(1, 5, 3, 15, 1), (2, 2, 4, 8, 2)]
