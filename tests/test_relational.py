"""Relational operator sanity (the heavy value validation is the
DuckDB oracle via tools/check_oracle.py; these cover semantics the
oracle can't — plan shape, approx sketch bounds, asof correctness on
constructed data)."""

import datetime

import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import relational as R
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def tpch(spark, sf_dir):
    return {
        n: table(spark, sf_dir, n)
        for n in ["customer", "orders", "lineitem", "supplier", "nation", "region"]
    }


def test_q1_aggregate_invariants(tpch):
    rows = R.q1_pricing_summary(tpch["lineitem"]).collect()
    assert 1 <= len(rows) <= 9  # |returnflag| x |linestatus|
    for r in rows:
        assert r["sum_disc_price"] <= r["sum_base_price"]
        assert r["sum_charge"] >= r["sum_disc_price"]
        assert r["count_order"] > 0


def test_q3_topk_ordered(tpch):
    rows = R.q3_shipping_priority(
        tpch["customer"], tpch["orders"], tpch["lineitem"]
    ).collect()
    assert len(rows) <= 10
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_top_customers_rank_bounds(tpch):
    rows = R.top_customers_per_nation(
        tpch["customer"], tpch["orders"], tpch["nation"]
    ).collect()
    per_nation = {}
    for r in rows:
        per_nation.setdefault(r["n_name"], []).append(r["rnk"])
    for n, rnks in per_nation.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1))
        assert len(rnks) <= 3


def test_approx_distinct_within_hll_error(events):
    for r in R.approx_distinct_users(events).collect():
        exact = r["n_users"]
        approx = r["approx_users"]
        assert abs(approx - exact) <= max(2, 0.1 * exact)


def test_asof_on_constructed_stream(spark):
    base = datetime.datetime(2024, 1, 1)
    mk = lambda s: base + datetime.timedelta(seconds=s)
    rows = [
        (1, mk(0), 7, "view", 0.0, "{}"),
        (2, mk(10), 7, "purchase", 1.0, "{}"),
        (3, mk(20), 7, "view", 0.0, "{}"),
        (4, mk(30), 7, "purchase", 1.0, "{}"),
        (5, mk(5), 8, "purchase", 1.0, "{}"),  # user 8: no prior view
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["event_id"]: r["last_view_ts"] for r in R.asof_view_before_purchase(ev).collect()}
    assert got[2] == "2024-01-01 00:00:00"
    assert got[4] == "2024-01-01 00:00:20"
    assert got[5] is None


def test_sessionize_gap_split(spark):
    base = datetime.datetime(2024, 1, 1)
    mk = lambda h: base + datetime.timedelta(hours=h)
    rows = [
        (1, mk(0), 7, "view", 0.0, "{}"),
        (2, mk(1), 7, "view", 0.0, "{}"),   # same session (gap 1h < 4h)
        (3, mk(9), 7, "view", 0.0, "{}"),   # new session (gap 8h)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = R.sessionize(ev).collect()
    assert len(got) == 2
    sizes = sorted(r["n_events"] for r in got)
    assert sizes == [1, 2]


def test_q3_plan_broadcasts_dimension(tpch):
    """Plan audit: the customer dim side must be broadcast, not
    shuffled (scale requirement)."""
    plan = R.q3_shipping_priority(
        tpch["customer"], tpch["orders"], tpch["lineitem"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_value_percentiles_vs_approx_sketch(events):
    """The production 100 TB path (approx_percentile t-digest sketch)
    must land within tolerance of the exact interpolated percentiles."""
    exact = {r["event_type"]: r for r in R.value_percentiles_by_type(events).collect()}
    approx = {
        r["event_type"]: r
        for r in events.groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.array(F.lit(0.5), F.lit(0.9)), F.lit(10000)).alias("ap")
        )
        .collect()
    }
    for et, ex in exact.items():
        spread = max(ex["p99"] - ex["p50"], 1e-9)
        assert abs(approx[et]["ap"][0] - ex["p50"]) <= 0.05 * spread
        assert abs(approx[et]["ap"][1] - ex["p90"]) <= 0.05 * spread


def test_event_type_pivot_row_conservation(events):
    """Pivot counts must sum back to the table row count, and every
    declared type column exists even if a day has no such events."""
    out = R.event_type_pivot(events)
    assert set(out.columns) == {"day"} | {f"n_{t}" for t in R.EVENT_TYPES}
    total = out.select(
        sum(F.sum(f"n_{t}") for t in R.EVENT_TYPES).alias("s")
    ).collect()[0]["s"]
    assert total == events.count()


def test_users_view_and_purchase_set_semantics(spark):
    rows = [
        (1, 7, "view"), (2, 7, "view"), (3, 7, "purchase"),  # both
        (4, 8, "view"),                                       # view only
        (5, 9, "purchase"),                                   # purchase only
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, event_type string")
    got = [r["user_id"] for r in R.users_view_and_purchase(ev).collect()]
    assert got == [7]  # distinct: user 7 appears once despite 2 views


def test_q4_semi_join_no_duplication(tpch):
    """EXISTS must not multiply orders: total order_count is bounded
    by the quarter's order count, and priorities are distinct."""
    out = R.q4_order_priority(tpch["orders"], tpch["lineitem"]).collect()
    prios = [r["o_orderpriority"] for r in out]
    assert prios == sorted(set(prios))
    quarter = tpch["orders"].filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    ).count()
    assert sum(r["order_count"] for r in out) <= quarter


def test_q7_bidirectional_pair(tpch):
    out = R.q7_volume_shipping(
        tpch["supplier"], tpch["lineitem"], tpch["orders"], tpch["customer"],
        tpch["nation"], nation_a="NATION_1", nation_b="NATION_2",
    ).collect()
    for r in out:
        assert {r["supp_nation"], r["cust_nation"]} == {"NATION_1", "NATION_2"}
        assert r["revenue"] > 0


def test_q8_share_in_unit_interval(tpch):
    from flink_window_dgim_traffic_spark.session import table as _table
    import tests.conftest as cf
    part = _table(tpch["orders"].sparkSession, cf.SF_DIR, "part")
    out = R.q8_market_share(
        part, tpch["lineitem"], tpch["orders"], tpch["customer"],
        tpch["supplier"], tpch["nation"], tpch["region"],
    ).collect()
    for r in out:
        assert 0.0 <= r["mkt_share"] <= 1.0
        assert r["total_revenue"] > 0


def test_q13_includes_zero_order_customers(spark):
    """The ON-clause filter must stay in the join (LEFT semantics):
    a customer with only 5-LOW orders lands in the c_count=0 bucket."""
    cust = spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    )
    orders = spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 1, "5-LOW"), (12, 2, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    got = {r["c_count"]: r["custdist"] for r in
           R.q13_customer_distribution(cust, orders).collect()}
    assert got == {1: 1, 0: 2}  # cust1: one non-LOW; cust2+cust3: zero


def test_q15_all_rows_tie_at_max(tpch):
    out = R.q15_top_supplier(tpch["supplier"], tpch["lineitem"]).collect()
    assert len(out) >= 1
    assert len({round(r["total_revenue"], 6) for r in out}) == 1


def test_q22_anti_join(spark):
    """Wealthy customer with an URGENT order is excluded; one without
    is included; below-average balance is excluded."""
    cust = spark.createDataFrame(
        [(1, 0, 9000.0), (2, 0, 8000.0), (3, 0, 100.0)],
        "c_custkey long, c_nationkey int, c_acctbal double",
    )
    orders = spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 2, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    rows = R.q22_global_sales(cust, orders).collect()
    assert len(rows) == 1 and rows[0]["numcust"] == 1  # only cust 2


def test_full_outer_preserves_both_sides(spark):
    cust = spark.createDataFrame([(1, 10), (2, 10), (3, 20)],
                                 "c_custkey long, c_nationkey int")
    supp = spark.createDataFrame([(1, 20), (2, 30)],
                                 "s_suppkey long, s_nationkey int")
    got = {r["nationkey"]: (r["n_customers"], r["n_suppliers"])
           for r in R.nation_party_full_outer(cust, supp).collect()}
    assert got == {10: (2, 0), 20: (1, 1), 30: (0, 1)}


def test_range_frame_uses_time_not_rows(spark):
    rows = [
        (1, 7, "2024-01-01 00:00:00", 1.0),
        (2, 7, "2024-01-05 00:00:00", 2.0),   # within 7d of #1
        (3, 7, "2024-01-20 00:00:00", 4.0),   # alone in its frame
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string, value double") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    got = {r["event_id"]: (r["range_sum"], r["range_n"])
           for r in R.user_range_spend(ev).collect()}
    assert got[1] == (1.0, 1)
    assert got[2] == (3.0, 2)
    assert got[3] == (4.0, 1)


def test_grouping_sets_no_grand_total(events):
    out = R.event_grouping_sets(events)
    rows = out.collect()
    # grand total (both grouped-out) must NOT appear
    assert not any(r["g_type"] == 1 and r["g_day"] == 1 for r in rows)
    # per-type totals must equal the sum of their per-day cells
    per_type = {r["event_type"]: r["n"] for r in rows
                if r["g_type"] == 0 and r["g_day"] == 1}
    cells = {}
    for r in rows:
        if r["g_type"] == 0 and r["g_day"] == 0:
            cells[r["event_type"]] = cells.get(r["event_type"], 0) + r["n"]
    assert per_type == cells


def test_salted_join_equals_unsalted(events):
    """The salt must cancel: salted fact-dim join aggregates equal the
    plain join's (same oracle formulation)."""
    salted = {r["event_type"]: r for r in R.user_spend_salted_join(events).collect()}
    dim = events.groupBy(F.col("user_id").alias("d_user")).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).alias("user_total")
    )
    plain = (
        events.join(dim, F.col("user_id") == F.col("d_user"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("sum_value"),
            F.sum("user_total").cast("double").alias("sum_user_totals"),
        )
    )
    for r in plain.collect():
        s = salted[r["event_type"]]
        assert (s["n_events"], s["sum_value"], s["sum_user_totals"]) == (
            r["n_events"], r["sum_value"], r["sum_user_totals"]
        )


def test_session_window_dynamic_hand_computed(spark):
    """Mixed gaps: a purchase at t=0 holds the session open 2h, so a
    view at t+90min merges (a fixed 1h gap would split); the running
    session end is the MAX of ts+gap, not last-ts+gap."""
    rows = [
        (1, "2026-01-01 00:00:00", "purchase"),   # end 02:00
        (1, "2026-01-01 01:30:00", "view"),       # merges; end still 02:30
        (1, "2026-01-01 02:45:00", "view"),       # 02:45 >= 02:30 -> new
        (2, "2026-01-01 00:00:00", "view"),       # end 01:00
        (2, "2026-01-01 01:30:00", "view"),       # new session
    ]
    ev = spark.createDataFrame(
        [(i, u, t, et, 0.0) for i, (u, t, et) in enumerate(rows)],
        "event_id long, user_id long, ts_s string, event_type string, value double",
    ).select(
        "event_id", "user_id",
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value",
    )
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in R.session_window_dynamic(ev).collect()
    }
    assert got == {
        (1, "2026-01-01 00:00:00", "2026-01-01 02:30:00", 2),
        (1, "2026-01-01 02:45:00", "2026-01-01 03:45:00", 1),
        (2, "2026-01-01 00:00:00", "2026-01-01 01:00:00", 1),
        (2, "2026-01-01 01:30:00", "2026-01-01 02:30:00", 1),
    }


def _mk_events(spark, rows):
    return spark.createDataFrame(
        [(i, u, t, et, 0.0) for i, (u, t, et) in enumerate(rows)],
        "event_id long, user_id long, ts_s string, event_type string, value double",
    ).select(
        "event_id", "user_id",
        F.to_timestamp("ts_s").alias("ts"), "event_type", "value",
    )


def test_event_funnel_strict_order(spark):
    """Stages must occur in strict time order per user: a click BEFORE
    the first view doesn't count; a purchase without a qualifying
    click doesn't either; equal timestamps don't qualify (strict >)."""
    rows = [
        # user 1 completes the whole funnel in order
        (1, "2026-01-01 00:00:00", "view"),
        (1, "2026-01-01 00:01:00", "click"),
        (1, "2026-01-01 00:02:00", "purchase"),
        # user 2: click precedes the only view -> stuck at stage 1
        (2, "2026-01-01 00:00:00", "click"),
        (2, "2026-01-01 00:01:00", "view"),
        (2, "2026-01-01 00:02:00", "purchase"),
        # user 3: view+click simultaneous -> click not strictly after
        (3, "2026-01-01 00:00:00", "view"),
        (3, "2026-01-01 00:00:00", "click"),
        # user 4: never views
        (4, "2026-01-01 00:00:00", "purchase"),
    ]
    got = {
        (r["stage_idx"], r["stage"]): r["n_users"]
        for r in R.event_funnel(_mk_events(spark, rows)).collect()
    }
    assert got == {(1, "view"): 3, (2, "click"): 1, (3, "purchase"): 1}


def test_event_funnel_click_qualifies_after_later_view(spark):
    """The qualifying click may pair with ANY earlier view (running
    min), and a purchase with any earlier qualified click."""
    rows = [
        (1, "2026-01-01 00:05:00", "view"),
        (1, "2026-01-01 00:06:00", "click"),
        (1, "2026-01-01 00:04:00", "purchase"),  # before click -> no
        (1, "2026-01-01 00:07:00", "purchase"),  # after click -> yes
    ]
    got = {
        r["stage"]: r["n_users"]
        for r in R.event_funnel(_mk_events(spark, rows)).collect()
    }
    assert got == {"view": 1, "click": 1, "purchase": 1}


def test_user_retention_cohorts_hand_computed(spark):
    """Cohort day = day of first event; one row per (cohort, offset)
    with distinct active users; multiple events a day dedup."""
    rows = [
        (1, "2026-01-01 10:00:00", "view"),
        (1, "2026-01-01 11:00:00", "view"),   # same day dedups
        (1, "2026-01-03 09:00:00", "click"),  # offset 2
        (2, "2026-01-01 23:00:00", "view"),
        (2, "2026-01-02 00:30:00", "view"),   # offset 1
        (3, "2026-01-02 08:00:00", "view"),   # its own cohort
    ]
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in R.user_retention_cohorts(_mk_events(spark, rows)).collect()
    }
    assert got == {
        ("2026-01-01", 0): 2,
        ("2026-01-01", 1): 1,
        ("2026-01-01", 2): 1,
        ("2026-01-02", 0): 1,
    }


def test_event_funnel_property_random_histories(spark):
    """Property: for ANY per-user event history (duplicate
    timestamps, shuffled arrival, mixed types), stage counts equal a
    Python simulation of the chained running-min rule over the
    (ts, event_id) order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    ev = st.tuples(
        st.integers(min_value=1, max_value=3),            # user
        st.integers(min_value=0, max_value=5),            # second
        st.sampled_from(["view", "click", "purchase", "other"]),
    )

    @settings(max_examples=10, deadline=None)
    @given(st.lists(ev, min_size=1, max_size=14))
    def run(events):
        rows = [
            (u, f"2026-01-01 00:00:0{sec}", et)
            for (u, sec, et) in events
        ]
        got = {
            r["stage_idx"]: r["n_users"]
            for r in R.event_funnel(_mk_events(spark, rows)).collect()
        }
        stage_of = {"view": 1, "click": 2, "purchase": 3}
        counts = [0, 0, 0]
        for u in {e[0] for e in events}:
            hist = sorted(
                (sec, eid, et)
                for eid, (uu, sec, et) in enumerate(events)
                if uu == u
            )
            s = [None, None, None]
            for sec, _eid, et in hist:
                k = stage_of.get(et)
                if k == 1:
                    if s[0] is None or sec < s[0]:
                        s[0] = sec
                elif k in (2, 3):
                    prev = s[k - 2]
                    if prev is not None and prev < sec and (
                        s[k - 1] is None or sec < s[k - 1]
                    ):
                        s[k - 1] = sec
            for k in range(3):
                if s[k] is not None:
                    counts[k] += 1
        assert got == {i + 1: counts[i] for i in range(3)}

    run()


def test_q21_rewrite_equals_literal_exists_formulation(spark, sf_dir):
    """The per-order aggregation rewrite of Q21 must equal the
    literal EXISTS / NOT-EXISTS double self-join it replaces."""
    from flink_window_dgim_traffic_spark.session import table

    li, orders, supplier = (
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "supplier"),
    )
    got = {
        (r["s_name"], r["numwait"])
        for r in R.q21_waiting_suppliers(li, orders, supplier).collect()
    }

    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    l1 = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    cand = (
        l1.filter("is_late").select("l_orderkey", "l_suppkey").distinct()
    )
    l2 = l1.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l1.filter("is_late").select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    exists = cand.join(
        l2,
        (F.col("l_orderkey") == F.col("o2"))
        & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    not_exists = exists.join(
        l3,
        (F.col("l_orderkey") == F.col("o3"))
        & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    literal = (
        not_exists.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(
            supplier, F.col("l_suppkey") == F.col("s_suppkey")
        )
        .select("s_name", "numwait")
    )
    assert got == {
        (r["s_name"], r["numwait"]) for r in literal.collect()
    }


# ----------------------------------------------------------------------
# Generic as-of / range join operators (round 4)
# ----------------------------------------------------------------------
def _tsdf(spark, rows, cols):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, cols)
    return df.select(
        *[
            F.timestamp_seconds(c).alias(c) if c.endswith("ts") else c
            for c in df.columns
        ]
    )


def test_asof_join_backward_forward_and_ties(spark):
    left = _tsdf(
        spark,
        [(1, 100, "a"), (2, 200, "a"), (3, 50, "b")],
        "id long, ts long, k string",
    )
    right = _tsdf(
        spark,
        [(10, 90, "a"), (11, 100, "a"), (12, 100, "a"), (13, 150, "a")],
        "rid long, ts long, k string",
    )
    import flink_window_dgim_traffic_spark.operators.relational as R

    back = {
        r["id"]: (r["asof_rid"],)
        for r in R.asof_join(
            left, right, on="ts", by=["k"], right_cols=["rid"],
            tiebreak="rid",
        ).collect()
    }
    # id 1 at t=100: rights 11 and 12 tie at t=100 (inclusive match),
    # largest tiebreak wins -> 12.  id 2 at t=200: latest is 13.
    # id 3 (key b): no right rows -> NULL.
    assert back[1] == (12,) and back[2] == (13,) and back[3] == (None,)
    fwd = {
        r["id"]: r["asof_rid"]
        for r in R.asof_join(
            left, right, on="ts", by=["k"], right_cols=["rid"],
            direction="forward", tiebreak="rid",
        ).collect()
    }
    # forward: id 1 matches the equal-ts rows (largest tiebreak 12);
    # id 2 at t=200 has nothing at-or-after -> NULL; id 3 (key b)
    # still has no right rows at all
    assert fwd[1] == 12 and fwd[2] is None and fwd[3] is None


def test_asof_join_string_tiebreak_native_order(spark):
    """Round-4 advisor: a string tiebreak used to cast-to-long into
    NULL, silently degrading 'largest wins' to partition order — it
    must now order natively (lexicographically largest wins), and a
    genuinely non-orderable tiebreak type must raise."""
    import pytest as _pytest

    import flink_window_dgim_traffic_spark.operators.relational as R

    left = _tsdf(spark, [(1, 100, "a")], "id long, ts long, k string")
    right = _tsdf(
        spark,
        [("r-09", 90, "a"), ("r-10", 90, "a"), ("r-02", 90, "a")],
        "rid string, ts long, k string",
    )
    rows = R.asof_join(
        left, right, on="ts", by=["k"], right_cols=["rid"],
        tiebreak="rid",
    ).collect()
    assert rows[0]["asof_rid"] == "r-10"
    bad = right.select(
        "ts", "k", F.create_map(F.lit("x"), F.col("rid")).alias("m")
    )
    with _pytest.raises(ValueError, match="non-orderable"):
        R.asof_join(left, bad, on="ts", by=["k"], tiebreak="m")


def test_range_join_fractional_end_on_aligned_second(spark):
    """Round-4 advisor: an interval end with a fractional part whose
    truncated second is bucket-aligned (trunc(end) % bucket == 0)
    used to skip the final bucket — events in [trunc(end), end) were
    silently dropped."""
    import flink_window_dgim_traffic_spark.operators.relational as R

    left = spark.createDataFrame(
        [(1, 999.5), (2, 1000.25), (3, 1000.75)],
        "id long, sec double",
    ).select("id", F.timestamp_seconds("sec").alias("ts"))
    right = spark.createDataFrame(
        [(7, 900.0, 1000.5)], "iv long, s double, e double"
    ).select(
        "iv",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds("e").alias("end_ts"),
    )
    got = {
        r["id"]
        for r in R.range_join(
            left, right, on="ts", start="start_ts", end="end_ts",
            bucket_sec=1000,
        ).collect()
    }
    # end = 1000.5: id 2 at 1000.25 lives in bucket 1 = floor(1000/b),
    # which the old -1 upper bound never generated; id 3 at 1000.75 is
    # past the exclusive end and must stay out
    assert got == {1, 2}


def test_asof_join_rejects_bad_direction(spark):
    import pytest as _pytest

    import flink_window_dgim_traffic_spark.operators.relational as R

    df = _tsdf(spark, [(1, 1, "a")], "id long, ts long, k string")
    with _pytest.raises(ValueError, match="direction"):
        R.asof_join(df, df, direction="sideways")


def test_range_join_boundaries_and_multi_interval(spark):
    import flink_window_dgim_traffic_spark.operators.relational as R

    left = _tsdf(
        spark,
        [(1, 100, "a"), (2, 200, "a"), (3, 4000, "a"), (4, 100, "b")],
        "id long, ts long, k string",
    )
    right = _tsdf(
        spark,
        [
            (100, 100, 201, "a"),    # [100, 201): ids 1, 2 (start incl)
            (101, 150, 5000, "a"),   # [150, 5000): ids 2, 3 (bucket-crossing)
            (102, 200, 300, "b"),    # no b rows inside
        ],
        "iv long, start_ts long, end_ts long, k string",
    )
    got = {
        (r["id"], r["iv"])
        for r in R.range_join(
            left, right, on="ts", start="start_ts", end="end_ts",
            by=["k"], bucket_sec=1000,
        ).collect()
    }
    assert got == {(1, 100), (2, 100), (2, 101), (3, 101)}
    # end is EXCLUSIVE: a row exactly at end_ts never matches
    at_end = _tsdf(spark, [(9, 201, "a")], "id long, ts long, k string")
    got2 = {
        r["iv"]
        for r in R.range_join(
            at_end, right, on="ts", start="start_ts", end="end_ts",
            by=["k"], bucket_sec=1000,
        ).collect()
    }
    assert got2 == {101}


def test_grouped_topk_equals_window_formulation(spark, sf_dir):
    """The map-side-pruned generic top-k must equal the plain
    one-window formulation bit-for-bit, for any partitioning."""
    import flink_window_dgim_traffic_spark.operators.relational as R
    from flink_window_dgim_traffic_spark.session import table
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    ev = table(spark, sf_dir, "events")
    for parts in (1, 7):
        df = ev.repartition(parts)
        got = {
            tuple(r)
            for r in R.grouped_topk(
                df, ["event_type"], "value", 5, tiebreak="event_id"
            )
            .select("event_type", "event_id", "value", "rnk")
            .collect()
        }
        w = W.partitionBy("event_type").orderBy(
            F.col("value").desc(), F.col("event_id").asc()
        )
        expect = {
            tuple(r)
            for r in ev.withColumn(
                "rnk", F.row_number().over(w).cast("bigint")
            )
            .filter("rnk <= 5")
            .select("event_type", "event_id", "value", "rnk")
            .collect()
        }
        assert got == expect, parts


def test_grouped_topk_ascending(spark):
    import flink_window_dgim_traffic_spark.operators.relational as R

    df = spark.createDataFrame(
        [("a", 1, 10), ("a", 2, 5), ("a", 3, 7), ("b", 4, 1)],
        "k string, id long, v long",
    ).repartition(3)
    got = {
        (r["k"], r["id"], r["rnk"])
        for r in R.grouped_topk(
            df, ["k"], "v", 2, ascending=True, tiebreak="id"
        ).collect()
    }
    assert got == {("a", 2, 1), ("a", 3, 2), ("b", 4, 1)}


def test_table_profile_null_handling(spark):
    import flink_window_dgim_traffic_spark.operators.relational as R

    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, None, None), (3, "b", 0.25)],
        "id long, s string, v double",
    )
    prof = {r["column"]: r for r in R.table_profile(df).collect()}
    assert prof["s"]["n_null"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    # NULL never pollutes min/max (no literal 'null' strings)
    assert prof["v"]["n_null"] == 1
    assert prof["v"]["min_str"] == "0.250000"
    assert prof["v"]["max_str"] == "2.500000"
    assert prof["id"]["n_rows"] == 3 and prof["id"]["n_null"] == 0


def test_table_profile_approx_within_bound(spark, sf_dir):
    """The scale switch: approx (HLL++) distinct counts must land
    within 3·rsd of the exact profile on every column, with every
    other statistic identical."""
    import flink_window_dgim_traffic_spark.operators.relational as R
    from flink_window_dgim_traffic_spark.session import table

    ev = table(spark, sf_dir, "events")
    exact = {r["column"]: r for r in R.table_profile(ev).collect()}
    approx = {
        r["column"]: r
        for r in R.table_profile(ev, exact=False, rsd=0.02).collect()
    }
    assert exact.keys() == approx.keys()
    for c in exact:
        e, a = exact[c], approx[c]
        assert a["n_rows"] == e["n_rows"] and a["n_null"] == e["n_null"]
        assert a["min_str"] == e["min_str"]
        assert a["max_str"] == e["max_str"]
        if e["n_distinct"]:
            err = abs(a["n_distinct"] - e["n_distinct"]) / e["n_distinct"]
            assert err <= 0.06, (c, err)


def test_scd2_build_collapses_versions_and_validity_chain(spark):
    """Hand-computed SCD2: consecutive identical observations collapse
    into one version, validity windows chain (valid_to = next
    valid_from), only the last version per key is current, and a NULL
    attribute does not fabricate a version (null-safe compare)."""
    import flink_window_dgim_traffic_spark.operators.relational as R

    changes = _tsdf(
        spark,
        [
            (1, 100, "a", 1),
            (1, 200, "a", 2),   # no-op observation -> collapsed
            (1, 300, "b", 3),
            (1, 300, "c", 4),   # same ts: tiebreak orders b before c
            (2, 50, None, 5),
            (2, 60, None, 6),   # NULL == NULL -> still one version
            (2, 70, "z", 7),
        ],
        "uid long, ts long, state string, seq long",
    )
    out = R.scd2_build(
        changes, key=["uid"], attrs=["state"], ts_col="ts",
        tiebreak="seq",
    ).collect()
    k1 = sorted(
        [
            (
                r["state"],
                r["valid_from"].timestamp(),
                r["valid_to"].timestamp() if r["valid_to"] else None,
                r["is_current"],
            )
            for r in out
            if r["uid"] == 1
        ],
        key=lambda t: (t[1], t[0]),
    )
    assert k1 == [
        ("a", 100.0, 300.0, 0),
        ("b", 300.0, 300.0, 0),
        ("c", 300.0, None, 1),
    ]
    k2 = sorted(
        [
            (
                r["state"],
                r["valid_from"].timestamp(),
                r["valid_to"].timestamp() if r["valid_to"] else None,
                r["is_current"],
            )
            for r in out
            if r["uid"] == 2
        ],
        key=lambda t: t[1],
    )
    assert k2 == [(None, 50.0, 70.0, 0), ("z", 70.0, None, 1)]


def test_scd2_build_single_shuffle(spark):
    """Both window passes must reuse ONE hash exchange on the key."""
    import flink_window_dgim_traffic_spark.operators.relational as R

    changes = _tsdf(
        spark,
        [(1, 100, "a", 1), (1, 200, "b", 2)],
        "uid long, ts long, state string, seq long",
    )
    plan = (
        R.scd2_build(changes, ["uid"], ["state"], "ts", "seq")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_lookup_point_in_time(spark):
    """Facts join the version VALID at their timestamp: between two
    changes the older version answers; before the first version the
    lookup is NULL; at exactly a change instant the new version wins
    (inclusive as-of)."""
    import flink_window_dgim_traffic_spark.operators.relational as R

    changes = _tsdf(
        spark,
        [(1, 100, "a", 1), (1, 200, "b", 2)],
        "uid long, ts long, state string, seq long",
    )
    versions = R.scd2_build(changes, ["uid"], ["state"], "ts", "seq")
    facts = _tsdf(
        spark,
        [(10, 50), (11, 150), (12, 200), (13, 999)],
        "fact_id long, ts long",
    ).withColumn("uid", F.lit(1))
    got = {
        r["fact_id"]: r["asof_state"]
        for r in R.scd2_lookup(
            facts, versions, ["uid"], "ts", ["state"]
        ).collect()
    }
    assert got == {10: None, 11: "a", 12: "b", 13: "b"}


def test_dq_checks_hand_computed(spark):
    """Each constraint kind counts exactly its violations over one
    scan: nulls for not_null, surplus duplicates for unique,
    non-null out-of-bounds for range, non-null out-of-domain for
    allowed_values."""
    from flink_window_dgim_traffic_spark.operators import relational as R

    df = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (1, "b", -5.0),     # dup id, below range
            (2, None, 50.0),    # null category
            (3, "zz", None),    # bad category, null value
        ],
        "id long, cat string, v double",
    )
    out = R.dq_checks(
        df,
        not_null=["cat", "v"],
        unique=["id"],
        ranges={"v": (0.0, 100.0)},
        allowed={"cat": ["a", "b"]},
    )
    rows = {
        (r["check"], r["column"]): (
            r["n_rows"], r["n_violations"], r["passed"]
        )
        for r in out.collect()
    }
    assert rows == {
        ("not_null", "cat"): (4, 1, 0),
        ("not_null", "v"): (4, 1, 0),
        ("unique", "id"): (4, 1, 0),
        ("range[0.0,100.0]", "v"): (4, 1, 0),
        ("allowed_values", "cat"): (4, 1, 0),
    }


def test_dq_checks_requires_constraints(spark):
    import pytest as _pytest

    from flink_window_dgim_traffic_spark.operators import relational as R

    df = spark.range(1)
    with _pytest.raises(ValueError):
        R.dq_checks(df)


def test_cdc_apply_hand_vector(spark):
    from flink_window_dgim_traffic_spark.operators.relational import (
        cdc_apply,
    )

    rows = [
        # k1: two upserts, latest wins
        (1, 1, "U", 10.0),
        (1, 2, "U", 20.0),
        # k2: upsert then delete -> absent
        (2, 1, "U", 5.0),
        (2, 2, "D", None),
        # k3: delete then re-insert -> present
        (3, 1, "D", None),
        (3, 2, "U", 7.0),
        # k4: NULL op counts as upsert, not delete
        (4, 1, None, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "k bigint, seq bigint, op string, val double"
    )
    got = {
        r.k: (r.seq, r.val)
        for r in cdc_apply(df, ["k"], ["seq"]).collect()
    }
    assert got == {1: (2, 20.0), 3: (2, 7.0), 4: (1, 9.0)}


def test_cdc_apply_seq_tiebreak(spark):
    from flink_window_dgim_traffic_spark.operators.relational import (
        cdc_apply,
    )

    # same timestamp, offset breaks the tie deterministically
    rows = [(1, 5, 1, "U", 1.0), (1, 5, 2, "U", 2.0)]
    df = spark.createDataFrame(
        rows, "k bigint, ts bigint, off bigint, op string, val double"
    )
    out = cdc_apply(df, ["k"], ["ts", "off"]).collect()
    assert len(out) == 1 and out[0].val == 2.0


def test_cdc_apply_keep_tombstones(spark):
    from flink_window_dgim_traffic_spark.operators.relational import (
        cdc_apply,
    )

    rows = [
        (1, 1, "U", 1.0),
        (1, 2, "D", None),
        (2, 1, "U", 5.0),
    ]
    df = spark.createDataFrame(
        rows, "k bigint, seq bigint, op string, val double"
    )
    got = {
        r.k: r.op
        for r in cdc_apply(
            df, ["k"], ["seq"], keep_tombstones=True
        ).collect()
    }
    # the winning tombstone is FORWARDED (streaming consumers need
    # it to override earlier batches), not dropped
    assert got == {1: "D", 2: "U"}


def test_asof_join_nearest_hand_vector(spark):
    from flink_window_dgim_traffic_spark.operators.relational import (
        asof_join,
    )

    left = spark.createDataFrame(
        [(1, 10), (1, 95), (1, 50), (2, 7)], "k bigint, ts bigint"
    )
    right = spark.createDataFrame(
        [(1, 0, 100), (1, 90, 101), (2, 7, 102), (2, 200, 103)],
        "k bigint, ts bigint, rid bigint",
    )
    got = {
        (r.k, r.ts): (r.asof_ts, r.asof_rid)
        for r in asof_join(
            left, right, on="ts", by=["k"],
            right_cols=["rid"], direction="nearest",
        ).collect()
    }
    assert got == {
        (1, 10): (0, 100),    # 10 back vs 80 forward -> backward
        (1, 95): (90, 101),   # backward 5 vs nothing after
        (1, 50): (90, 101),   # 50 back vs 40 forward -> forward
        (2, 7): (7, 102),     # exact hit
    }
    # equal distance prefers backward
    left2 = spark.createDataFrame([(1, 45)], "k bigint, ts bigint")
    got2 = asof_join(
        left2, right, on="ts", by=["k"],
        right_cols=["rid"], direction="nearest",
    ).collect()[0]
    assert (got2.asof_ts, got2.asof_rid) == (0, 100)


def test_asof_join_nearest_matches_pandas(spark):
    import random

    import pandas as pd

    from flink_window_dgim_traffic_spark.operators.relational import (
        asof_join,
    )

    rng = random.Random(5)
    lrows = [
        (k, rng.randint(0, 1000)) for k in (1, 2, 3) for _ in range(40)
    ]
    # unique right timestamps per key (pandas picks its own winner
    # among duplicate right ts; keep the comparison unambiguous)
    rrows = [
        (k, ts, k * 10_000 + ts)
        for k in (1, 2)
        for ts in rng.sample(range(0, 1000, 3), 60)
    ]
    left = spark.createDataFrame(lrows, "k bigint, ts bigint")
    right = spark.createDataFrame(rrows, "k bigint, ts bigint, rid bigint")
    got = (
        asof_join(
            left, right, on="ts", by=["k"],
            right_cols=["rid"], direction="nearest",
        )
        .toPandas()
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    lp = pd.DataFrame(lrows, columns=["k", "ts"]).sort_values(
        ["ts", "k"]
    )
    rp = pd.DataFrame(
        rrows, columns=["k", "ts", "rid"]
    ).sort_values(["ts", "k"])
    want = (
        pd.merge_asof(
            lp, rp, on="ts", by="k", direction="nearest",
            suffixes=("", "_r"),
        )
        .sort_values(["k", "ts"])
        .reset_index(drop=True)
    )
    assert list(got["asof_rid"].fillna(-1).astype("int64")) == list(
        want["rid"].fillna(-1).astype("int64")
    )


def test_salted_join_equals_unsalted_under_zipf_head(events):
    """Skew robustness pin (r10, VERDICT r9 ask #6 companion): with
    ~10% of ALL rows reassigned to one hot user — the Zipf-head crawl
    shape — the salted join still equals the plain formulation
    exactly (salts cancel regardless of key distribution; the
    BASELINE skew study measures the runtime side at 30×)."""
    skewed = events.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("event_id"), F.lit(10)) == 0, F.lit(0)
        ).otherwise(F.col("user_id")),
    )
    salted = {
        r["event_type"]: r
        for r in R.user_spend_salted_join(skewed).collect()
    }
    dim = skewed.groupBy(F.col("user_id").alias("d_user")).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).alias("user_total")
    )
    plain = (
        skewed.join(dim, F.col("user_id") == F.col("d_user"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
            F.sum("user_total").cast("double").alias("sum_user_totals"),
        )
    )
    for r in plain.collect():
        s = salted[r["event_type"]]
        assert (
            s["n_events"], s["sum_value"], s["sum_user_totals"]
        ) == (r["n_events"], r["sum_value"], r["sum_user_totals"])
