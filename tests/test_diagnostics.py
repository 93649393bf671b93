"""Hand-vector tests for the round-5 wave-4 diagnostics/analytics
operators: skew_report and dataset_diff (operators/relational.py),
cross_tab_chi2 and lag_correlation (operators/analytics.py)."""

import datetime as dt

from flink_window_dgim_traffic_spark.operators.analytics import (
    cross_tab_chi2,
    lag_correlation,
)
from flink_window_dgim_traffic_spark.operators.relational import (
    dataset_diff,
    skew_report,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def test_skew_report_uniform_vs_skewed(spark):
    # col "u": perfectly uniform (4 keys x 3) -> gini 0
    # col "s": one hot key (9 of 12 rows) -> strongly positive gini
    rows = [(i % 4, 0 if i < 9 else i) for i in range(12)]
    df = spark.createDataFrame(rows, "u: bigint, s: bigint")
    out = {r.column: r for r in skew_report(df, ["u", "s"]).collect()}
    u = out["u"]
    assert (u.n_rows, u.n_distinct, u.max_cnt) == (12, 4, 3)
    assert u.gini_e6 == 0
    assert u.top1_share_ppm == 3 * 1_000_000 // 12
    s = out["s"]
    assert (s.n_rows, s.n_distinct, s.max_cnt) == (12, 4, 9)
    # frequencies sorted asc: [1,1,1,9], n=4, tot=12
    # num = sum((2i-5)*x) = (-3-1+1)*1 + 3*9 = 24 -> 24e6/(4*12)
    assert s.gini_e6 == 24 * 1_000_000 // (4 * 12)
    assert s.top1_share_ppm == 9 * 1_000_000 // 12


def test_skew_report_single_key(spark):
    df = spark.createDataFrame([(1,)] * 5, "k: bigint")
    r = skew_report(df, ["k"]).collect()[0]
    assert (r.n_distinct, r.max_cnt, r.gini_e6) == (1, 5, 0)
    assert r.top1_share_ppm == 1_000_000


def test_cross_tab_chi2_independent_is_zero(spark):
    # perfectly independent 2x2: every cell O == E -> chi2 0
    rows = []
    eid = 0
    for day in (0, 1):  # two day slots
        for et, n in (("a", 4), ("b", 8)):
            for _ in range(n):
                rows.append(
                    (eid, T0 + dt.timedelta(days=day), et)
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id: bigint, ts: timestamp, event_type: string"
    )
    out = cross_tab_chi2(df).collect()
    assert len(out) == 4
    assert all(r.chi2_cell_e6 == 0 for r in out)
    # expected for ("a", slot): 8*12*1e6//24
    a = next(r for r in out if r.row_key == "a")
    assert a.expected_e6 == 8 * 12 * 1_000_000 // 24


def test_cross_tab_chi2_dependent_positive(spark):
    # "a" only on day 0, "b" only on day 1 -> maximal association
    rows = []
    eid = 0
    for day, et in ((0, "a"), (1, "b")):
        for _ in range(6):
            rows.append((eid, T0 + dt.timedelta(days=day), et))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id: bigint, ts: timestamp, event_type: string"
    )
    out = cross_tab_chi2(df).collect()
    # only observed cells appear (O>0); each: O=6,N=12,R=6,C=6
    # dev = 6*12-36 = 36; chi2 = 36^2*1e6 // (12*6*6) = 3e6
    assert len(out) == 2
    assert all(r.chi2_cell_e6 == 3_000_000 for r in out)


def test_lag_correlation_perfect_lag(spark):
    # y is exactly x shifted by 2 buckets: pearson_num maximal at lag 2
    rows = []
    eid = 0
    xs = [3, 0, 5, 0, 2, 0, 0, 4, 1, 0]
    for b, n in enumerate(xs):
        for _ in range(n):
            rows.append((eid, T0 + dt.timedelta(minutes=b), "view"))
            eid += 1
        for _ in range(n):  # same counts, 2 minutes later
            rows.append(
                (eid, T0 + dt.timedelta(minutes=b + 2), "purchase")
            )
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id: bigint, ts: timestamp, event_type: string"
    )
    out = {
        r.lag: r
        for r in lag_correlation(df, "view", "purchase", 60, 4).collect()
    }
    best = max(out.values(), key=lambda r: r.pearson_num / r.n_pairs)
    assert best.lag == 2
    # at lag 2 the aligned pairs satisfy y == x wherever both defined
    r2 = out[2]
    assert r2.sum_xy == sum(v * v for v in xs)


def test_dataset_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "k: bigint, v: bigint"
    )
    new = spark.createDataFrame(
        [(2, 20), (3, 31), (4, 40)], "k: bigint, v: bigint"
    )
    out = {
        r.k: r.status
        for r in dataset_diff(old, new, ["k"], ["v"]).collect()
    }
    assert out == {
        1: "removed",
        2: "unchanged",
        3: "changed",
        4: "added",
    }


def test_dataset_diff_null_safe_compare(spark):
    old = spark.createDataFrame(
        [(1, None), (2, None)], "k: bigint, v: bigint"
    )
    new = spark.createDataFrame(
        [(1, None), (2, 5)], "k: bigint, v: bigint"
    )
    out = {
        r.k: r.status
        for r in dataset_diff(old, new, ["k"], ["v"]).collect()
    }
    assert out == {1: "unchanged", 2: "changed"}


def test_scd2_deletes_tombstone_semantics(spark):
    """delete closes the open version; re-insert (even with the same
    attrs) opens a NEW version; consecutive tombstones collapse; a
    trailing tombstone leaves the key with no current row."""
    import datetime as dt

    from flink_window_dgim_traffic_spark.operators.relational import (
        scd2_build,
    )

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [
        # key 1: live a, delete, delete, live a again (re-insert)
        (1, t(1), "a", 1, False),
        (1, t(2), None, 2, True),
        (1, t(3), None, 3, True),
        (1, t(4), "a", 4, False),
        # key 2: live b then tombstone at the end
        (2, t(1), "b", 5, False),
        (2, t(9), None, 6, True),
    ]
    df = spark.createDataFrame(
        rows,
        "user_id: bigint, ts: timestamp, attr: string,"
        " event_id: bigint, is_delete: boolean",
    )
    out = scd2_build(
        df, ["user_id"], ["attr"], "ts", "event_id", "is_delete"
    ).collect()
    k1 = sorted(
        [r for r in out if r.user_id == 1],
        key=lambda r: r.valid_from,
    )
    # two versions of 'a': [1,2) closed by the tombstone, [4,∞) open
    assert len(k1) == 2
    assert k1[0].attr == "a" and k1[0].valid_to == t(2)
    assert k1[0].is_current == 0
    assert k1[1].valid_from == t(4) and k1[1].is_current == 1
    k2 = [r for r in out if r.user_id == 2]
    # b's version closed at the tombstone; key 2 has NO current row
    assert len(k2) == 1
    assert k2[0].valid_to == t(9) and k2[0].is_current == 0


def test_scd2_no_delete_col_unchanged(spark):
    """delete_col=None must reproduce the original semantics."""
    import datetime as dt

    from flink_window_dgim_traffic_spark.operators.relational import (
        scd2_build,
    )

    t = lambda s: dt.datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    rows = [(1, t(1), "a", 1), (1, t(2), "a", 2), (1, t(3), "b", 3)]
    df = spark.createDataFrame(
        rows, "user_id: bigint, ts: timestamp, attr: string,"
        " event_id: bigint"
    )
    out = sorted(
        scd2_build(df, ["user_id"], ["attr"], "ts", "event_id").collect(),
        key=lambda r: r.valid_from,
    )
    assert [(r.attr, r.is_current) for r in out] == [("a", 0), ("b", 1)]
    assert out[0].valid_to == t(3)
