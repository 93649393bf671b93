"""Product-analytics operators (operators/analytics.py) and the
quality-aware near-dup resolution: hand-checkable micro-fixtures plus
plan-shape pins (broadcasts present, no cartesian on the pair join)."""

import datetime

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import analytics as AN
from flink_window_dgim_traffic_spark.operators import dedup as D


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # uid 1: value rises 10 -> 20 -> 30 over two days (slope 10/d)
        (1, _ts("2024-01-01 00:00:00"), 1, "view", 10.0),
        (2, _ts("2024-01-02 00:00:00"), 1, "view", 20.0),
        (3, _ts("2024-01-03 00:00:00"), 1, "view", 30.0),
        # uid 2: constant value (slope 0); converts twice
        (4, _ts("2024-01-01 06:00:00"), 2, "click", 5.0),
        (5, _ts("2024-01-01 07:00:00"), 2, "purchase", 5.0),
        (6, _ts("2024-01-02 07:00:00"), 2, "view", 5.0),
        (7, _ts("2024-01-02 08:00:00"), 2, "purchase", 5.0),
        # uid 3: converts with NO prior touch -> 'direct'
        (8, _ts("2024-01-01 09:00:00"), 3, "purchase", 1.0),
        # uid 3 single other event later (n=1 trend keys dropped)
        (9, _ts("2024-01-05 09:00:00"), 3, "view", 7.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )


def test_per_key_trend_hand_values(tiny_events):
    got = {
        (r.event_type, r.user_id): (r.n, r.slope_per_day, r.mean_value)
        for r in AN.per_key_trend(tiny_events).collect()
    }
    assert got[("view", 1)] == (3, 10.0, 20.0)
    # constant-series slope is 0 only when x varies; uid2 'purchase'
    # has two distinct ts and equal values -> slope 0
    assert got[("purchase", 2)] == (2, 0.0, 5.0)
    # single-observation keys (den == 0) are dropped
    assert ("view", 3) not in got
    assert ("purchase", 3) not in got


def test_per_key_trend_drops_zero_span_keys(spark):
    # two rows with the SAME timestamp: den == 0, key dropped
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00"), 1, "view", 1.0),
            (2, _ts("2024-01-01 00:00:00"), 1, "view", 2.0),
        ],
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double",
    )
    assert AN.per_key_trend(df).count() == 0


def test_assoc_pairs_hand_values(tiny_events):
    rows = AN.assoc_pairs(tiny_events).collect()
    got = {(r.item_a, r.item_b): r for r in rows}
    # baskets: (1,d1)={view} (1,d2)={view} (1,d3)={view}
    # (2,d1)={click,purchase} (2,d2)={view,purchase}
    # (3,d1)={purchase} (3,d5)={view} -> 7 baskets
    r = got[("click", "purchase")]
    assert (r.n_both, r.n_a, r.n_b) == (1, 1, 3)
    assert r.lift == round(1 * 7 / (1 * 3), 6)
    assert r.support == round(1 / 7, 6)
    r = got[("purchase", "view")]
    assert (r.n_both, r.n_a, r.n_b) == (1, 3, 5)
    assert ("click", "view") not in got  # never co-occur


def test_attribution_hand_values(tiny_events):
    got = {
        r.channel: (r.n_last_touch, r.n_first_touch)
        for r in AN.attribution_touch(tiny_events).collect()
    }
    # uid2 purchase#5: last/first prior touch = click
    # uid2 purchase#7: last prior touch = view, first = click
    # uid3 purchase#8: no prior touch -> direct
    assert got == {
        "click": (1, 2),
        "view": (1, 0),
        "direct": (1, 1),
    }


def test_profile_drift_zero_when_identical(spark):
    # same distribution both sides -> every smoothed term is 0
    rows = [
        (i, _ts("2024-01-10 00:00:00"), 1, "view", float(v))
        for i, v in enumerate([10, 60, 110])
    ] + [
        (i + 10, _ts("2024-01-20 00:00:00"), 1, "view", float(v))
        for i, v in enumerate([10, 60, 110])
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    out = AN.profile_drift(df).collect()
    assert len(out) == 3
    assert all(r.psi_micro_nats == 0 for r in out)
    assert all(r.cnt_ref == 1 and r.cnt_cur == 1 for r in out)


def test_profile_drift_terms_nonnegative(events):
    out = AN.profile_drift(events).collect()
    assert len(out) > 0
    assert all(r.psi_micro_nats >= 0 for r in out)
    # full coverage: bin counts sum to the table size
    n = sum(r.cnt_ref + r.cnt_cur for r in out)
    assert n == events.count()


def test_neardup_keep_best_keeps_highest_quality(spark):
    # two docs that are exact near-dups (jaccard 1.0) but doc 2 has
    # more non-stopword tokens -> higher quality -> doc 2 kept even
    # though doc 1 has the smaller id; doc 3 is a singleton (kept)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, "the " + base),
            (2, base + " kappa"),
            (3, "completely different text about spark engines"),
        ],
        "doc_id long, text string",
    )
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5)
    got = {r.doc_id: r for r in D.neardup_keep_best(docs, pairs).collect()}
    assert got[1].cluster_id == got[2].cluster_id == 1
    assert got[3].cluster_id == 3
    assert got[2].quality_score > got[1].quality_score
    assert (got[1].is_kept, got[2].is_kept, got[3].is_kept) == (0, 1, 1)


def test_assoc_pairs_no_cartesian(events):
    plan = (
        AN.assoc_pairs(events)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # the three count sides reach the projection via broadcast
    assert plan.count("BroadcastExchange") >= 2


def test_session_paths_hand_values(spark):
    rows = [
        # uid 1, one session: view > click > purchase (3 events)
        (1, _ts("2024-01-01 00:00:00"), 1, "view", 0.0),
        (2, _ts("2024-01-01 00:10:00"), 1, "click", 0.0),
        (3, _ts("2024-01-01 00:20:00"), 1, "purchase", 0.0),
        # uid 1, second session 5h later (gap > 4h): view only
        (4, _ts("2024-01-01 05:30:00"), 1, "view", 0.0),
        # uid 2, 7-event session: path truncates at 5 steps but
        # n_events counts all 7
        *[
            (10 + i, _ts(f"2024-01-02 01:{i:02d}:00"), 2, "click", 0.0)
            for i in range(7)
        ],
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got = {
        r.path: (r.n_sessions, r.n_events)
        for r in AN.session_paths(df).collect()
    }
    assert got == {
        "view>click>purchase": (1, 3),
        "view": (1, 1),
        "click>click>click>click>click": (1, 7),
    }


def test_rfm_segments_hand_values(spark):
    # 5 users, distinct recency/frequency/monetary orderings
    rows = []
    for u in range(1, 6):
        # user u: u events on day u (last_us ordering: u5 most recent),
        # one purchase of value 10*u
        for i in range(u):
            rows.append(
                (u * 10 + i, _ts(f"2024-01-0{u} 12:00:00"), u,
                 "purchase" if i == 0 else "view", 10.0 * u)
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got = {r.user_id: r for r in AN.rfm_segments(df).collect()}
    # recency: ref = day5; user5 recency 0, user1 recency 4
    assert got[5].recency_days == 0 and got[1].recency_days == 4
    # tiles are 1..5 permutations under the deterministic order
    assert [got[u].r_tile for u in (5, 4, 3, 2, 1)] == [1, 2, 3, 4, 5]
    assert [got[u].f_tile for u in (5, 4, 3, 2, 1)] == [1, 2, 3, 4, 5]
    assert [got[u].m_tile for u in (5, 4, 3, 2, 1)] == [1, 2, 3, 4, 5]
    assert got[5].segment == "111" and got[1].segment == "555"
    assert got[3].monetary_micro == 30_000_000


def test_conversion_latency_hand_values(spark):
    rows = [
        (1, _ts("2024-01-01 00:00:00"), 1, "view", 0.0),
        (2, _ts("2024-01-01 00:05:00"), 1, "purchase", 0.0),  # 5 min
        (3, _ts("2024-01-01 01:00:00"), 1, "purchase", 0.0),  # 55 min
        (4, _ts("2024-01-02 00:00:00"), 2, "purchase", 0.0),  # direct
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got = {
        r.bucket: (r.n_conversions, r.sum_latency_us)
        for r in AN.conversion_latency(df).collect()
    }
    # bucket width 600 s: 5 min -> bucket 0; the second purchase is
    # 3600 s after the SAME view -> bucket 6; no prior view -> -1
    assert got == {
        0: (1, 300_000_000),
        6: (1, 3_600_000_000),
        -1: (1, 0),
    }


def _py_winsorized(vals, lo_ppm, hi_ppm):
    v = sorted(round(x * 1_000_000) for x in vals)
    n = len(v)
    lo = v[max(1, n * lo_ppm // 1_000_000) - 1]
    hi = v[min(n, n * hi_ppm // 1_000_000 + 1) - 1]
    clamped = [max(lo, min(hi, x)) for x in v]
    return n, lo, hi, sum(clamped) // n


def test_winsorized_stats_hand_vector(spark):
    from flink_window_dgim_traffic_spark.operators.analytics import (
        winsorized_stats,
    )

    vals = [0.0, 1.0, 2.0, 3.0, 100.0]
    rows = [("a", v, i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type string, value double, event_id bigint"
    )
    out = winsorized_stats(df, lo_ppm=400_000, hi_ppm=600_000).collect()
    assert len(out) == 1
    r = out[0]
    # lo rank 2 -> 1.0, hi rank 4 -> 3.0; clamped mean 2.0
    assert (r.n, r.lo_e6, r.hi_e6, r.wins_mean_e6) == (
        5, 1_000_000, 3_000_000, 2_000_000,
    )
    assert _py_winsorized(vals, 400_000, 600_000) == (
        5, 1_000_000, 3_000_000, 2_000_000,
    )


def test_winsorized_stats_random_matches_python(spark):
    import random

    from flink_window_dgim_traffic_spark.operators.analytics import (
        winsorized_stats,
    )

    rng = random.Random(11)
    rows = []
    per_key = {}
    for i in range(400):
        key = rng.choice(["a", "b", "c"])
        # duplicate-heavy values exercise the tie order (value, id)
        v = float(rng.randint(0, 20))
        rows.append((key, v, i))
        per_key.setdefault(key, []).append(v)
    df = spark.createDataFrame(
        rows, "event_type string, value double, event_id bigint"
    )
    got = {
        r.key: (r.n, r.lo_e6, r.hi_e6, r.wins_mean_e6)
        for r in winsorized_stats(
            df, lo_ppm=50_000, hi_ppm=950_000
        ).collect()
    }
    want = {
        k: _py_winsorized(v, 50_000, 950_000)
        for k, v in per_key.items()
    }
    assert got == want


def test_daily_movers_hand_vector(spark):
    import datetime as dt

    from flink_window_dgim_traffic_spark.operators.analytics import (
        daily_movers,
    )

    def t(day, h):
        return dt.datetime(2024, 1, day, h, 0, 0)

    rows = [
        ("click", t(1, 1)), ("click", t(1, 2)),   # day1: 2
        ("click", t(2, 1)), ("click", t(2, 2)), ("click", t(2, 3)),
        ("view", t(2, 1)),                        # view first seen day2
        ("view", t(4, 1)),                        # gap day3 skipped
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        (r.key, r.day): (r.n, r.prev_n, r.delta)
        for r in daily_movers(df).collect()
    }
    assert got == {
        ("click", "2024-01-01"): (2, 0, 2),
        ("click", "2024-01-02"): (3, 2, 1),
        ("view", "2024-01-02"): (1, 0, 1),
        ("view", "2024-01-04"): (1, 1, 0),
    }


def test_path_regex_match_hand_vector(spark):
    import datetime as dt

    from flink_window_dgim_traffic_spark.operators.analytics import (
        path_regex_match,
    )

    t0 = dt.datetime(2024, 1, 1)

    def r(uid, i, et):
        return (uid, t0 + dt.timedelta(seconds=i), i, et)

    rows = [
        # u1: view click purchase view purchase -> 'vcpvp':
        # matches 'v(c|v)*p' at vcp and vp -> 2 non-overlapping
        r(1, 1, "view"), r(1, 2, "click"), r(1, 3, "purchase"),
        r(1, 4, "view"), r(1, 5, "purchase"),
        # u2: no purchase -> no match
        r(2, 1, "view"), r(2, 2, "click"),
        # u3: error breaks the chain: 'vep' has no match
        r(3, 1, "view"), r(3, 2, "error"), r(3, 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint,"
        " event_type string"
    )
    got = {
        r_.user_id: (r_.n_events, r_.matched, r_.n_matches)
        for r_ in path_regex_match(df).collect()
    }
    assert got == {1: (5, 1, 2), 2: (2, 0, 0), 3: (3, 0, 0)}


def test_global_quantiles_hand_values(spark):
    # ten rows 1..10: p50 -> rank 5 -> 5.0; p90 -> rank 9; p99 -> rank 10
    rows = [
        (i, _ts("2024-01-01 00:00:00"), 1, "view", float(i))
        for i in range(1, 11)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got = {
        r.p_ppm: (r.n, r.rank, r.value_e6)
        for r in AN.global_quantiles(df).collect()
    }
    assert got[500_000] == (10, 5, 5_000_000)
    assert got[900_000] == (10, 9, 9_000_000)
    assert got[990_000] == (10, 10, 10_000_000)
    # duplicates: rank falls inside a run of equal values
    rows2 = [
        (i, _ts("2024-01-01 00:00:00"), 1, "view", v)
        for i, v in enumerate([1.0, 2.0, 2.0, 2.0, 9.0])
    ]
    df2 = spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    got2 = {
        r.p_ppm: r.value_e6
        for r in AN.global_quantiles(df2, (400_000, 800_000)).collect()
    }
    assert got2[400_000] == 2_000_000  # rank ceil(2.0)=2 -> the dup run
    assert got2[800_000] == 2_000_000  # rank ceil(4.0)=4 -> still in run


def test_ts_pattern_topk_hand_values(spark):
    # user 1: values 1,2,4,8,16 -> subsequence starting at idx 1
    # matches pattern (10,20,40,80)e6 scaled by 0.1... use exact:
    # pattern = (1,2,4,8)e6; series 1,2,4,8 at idx1 -> dist 0
    rows = [
        (i, _ts(f"2024-01-01 00:00:0{i}"), 1, "view", float(v))
        for i, v in enumerate([1, 2, 4, 8, 16], start=1)
    ]
    # user 2: constant 3s — nonzero distance everywhere
    rows += [
        (10 + i, _ts(f"2024-01-01 00:00:0{i}"), 2, "view", 3.0)
        for i in range(1, 5)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    pat = (1_000_000, 2_000_000, 4_000_000, 8_000_000)
    got = AN.ts_pattern_topk(df, pat, k=3).collect()
    assert (got[0].user_id, got[0].start_idx, got[0].dist_e12) == (
        1, 1, 0
    )
    assert [r.rnk for r in got] == [1, 2, 3]
    # user 2 const-3 dist: (2^2+1^2+1^2+5^2)e12 = 31e12
    d2 = {(r.user_id, r.start_idx): r.dist_e12 for r in got}
    assert d2[(2, 1)] == 31_000_000_000_000
    # no subsequence crosses a series end: max start for user1 is 2
    assert all(r.start_idx <= 2 for r in got if r.user_id == 1)


def test_dist_ntile_property_equals_ansi_ntile(spark):
    """_dist_ntile must reproduce ANSI ntile EXACTLY on arbitrary
    multisets — heavy ties, singletons, n < tiles, skewed ids —
    against Spark's own global ntile as the reference."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.operators.analytics import (
        _dist_ntile,
    )

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-5, max_value=5),   # metric (ties!)
                st.integers(min_value=0, max_value=10**6),  # sparse ids
            ),
            min_size=1,
            max_size=40,
            unique_by=lambda t: t[1],
        ),
        st.integers(min_value=1, max_value=7),
    )
    def run(rows, t):
        df = spark.createDataFrame(
            [(m, u) for m, u in rows], "metric long, user_id long"
        )
        got = {
            r["user_id"]: r["tile"]
            for r in _dist_ntile(
                df, "metric", t, "tile", n_buckets=4, id_buckets=3
            ).collect()
        }
        w = Window.orderBy(F.desc("metric"), F.asc("user_id"))
        want = {
            r["user_id"]: r["tile"]
            for r in df.select(
                "user_id",
                F.ntile(t).over(w).cast("bigint").alias("tile"),
            ).collect()
        }
        assert got == want

    run()
