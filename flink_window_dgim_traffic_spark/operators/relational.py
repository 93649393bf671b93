"""Batch relational operator surface over the TPC-H-ish driver tables.

The reference itself has no joins/sorts/set-ops (SURVEY.md §2.4); this
module is the driver's north-star "batch-queryable operator surface"
(BASELINE.json).  Every query here has an exact DuckDB oracle twin in
``__spark_entry__.oracle_sql``.

Determinism conventions (so value hashes match the oracle):
- money/measure aggregates are computed in DECIMAL (exact, associative)
  and cast to DOUBLE at the end — identical bits in both engines;
- computed integers are cast to BIGINT on both sides;
- timestamps in output are formatted strings;
- top-k queries always carry a unique tie-break key in the ORDER BY.

Scale notes (100 TB): joins keep dimension tables broadcastable
(region/nation/customer/supplier are tiny in TPC-H proportions); fact
joins shuffle on their join keys with AQE handling skew; aggregations
are partial (map-side combine) because they use built-in aggregates.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dec(c: str, prec: str = "12,2"):
    return F.col(c).cast(f"decimal({prec})")


def _one():
    return F.lit(1).cast("decimal(4,2)")


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (filter → group → decimal sums)."""
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                _dec("l_extendedprice")
                * (_one() - _dec("l_discount", "4,2"))
                * (_one() + _dec("l_tax", "4,2"))
            )
            .cast("double")
            .alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Join-heavy top-10 revenue orders (broadcast dim + shuffle fact
    join; deterministic tie-break on l_orderkey)."""
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2"))
    return (
        customer.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp"))
        .join(lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """Multi-way join through the star schema (TPC-H Q5 shape)."""
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2"))
    return (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(lineitem, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            customer,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def top_customers_per_nation(
    customer: DataFrame, orders: DataFrame, nation: DataFrame
) -> DataFrame:
    """Ranking window function: top-3 spenders per nation."""
    spend = (
        customer.join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name", "c_custkey", "c_name")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("total_spend"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.desc("total_spend"), F.col("c_custkey")
    )
    return (
        spend.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 3)
    )


def q6_revenue_change(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: tight scan-level filter conjunction (date range
    + discount band + quantity cap) into a single global aggregate —
    the pushdown/pruning benchmark query.  One row out."""
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (_dec("l_discount", "4,2") >= F.lit("0.05").cast("decimal(4,2)"))
            & (_dec("l_discount", "4,2") <= F.lit("0.07").cast("decimal(4,2)"))
            & (_dec("l_quantity") < F.lit(24).cast("decimal(12,2)"))
        )
        .agg(
            F.sum(_dec("l_extendedprice") * _dec("l_discount", "4,2"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: fact⋈dim join + conditional aggregation (the
    PROMO share of revenue in one month).  The part side is filterable
    and broadcast-sized; revenue ratio stays DECIMAL→DOUBLE at the
    end."""
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2"))
    j = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    )
    return j.agg(
        F.sum(
            F.when(F.col("p_type") == "PROMO", revenue).otherwise(
                F.lit(0).cast("decimal(4,2)")
            )
        )
        .cast("double")
        .alias("promo_revenue"),
        F.sum(revenue).cast("double").alias("total_revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q18_large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
) -> DataFrame:
    """TPC-H Q18 shape: HAVING over an aggregated fact (orders whose
    total quantity exceeds a threshold), joined back to dimensions,
    top-20 by order value.  The heavy groupBy happens FIRST on the
    narrow (orderkey, quantity) projection; only qualifying orders
    join customer."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > F.lit(min_qty).cast("decimal(12,2)"))
    )
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _dec("o_totalprice").cast("double").alias("o_totalprice"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


def event_type_cube(events: DataFrame) -> DataFrame:
    """CUBE aggregate (all grouping sets of event_type × day)."""
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    return (
        events.select("event_type", day, "value")
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


def user_moving_spend(events: DataFrame, frame: int = 7) -> DataFrame:
    """Sliding ROWS-frame window aggregate per user: trailing
    ``frame``-row sum/count of ``value`` ordered by time.  Sums stay
    DECIMAL until the final cast so the oracle matches bit-for-bit."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-(frame - 1), 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.sum(_dec("value")).over(w).cast("double").alias("trailing_sum"),
        F.count(F.lit(1)).over(w).alias("trailing_n"),
    )


def orders_with_expensive_items(
    orders: DataFrame, lineitem: DataFrame, min_price: float = 90000.0
) -> DataFrame:
    """LEFT SEMI join (EXISTS): orders having at least one line item
    above ``min_price`` — the fact-side filter join that plans as a
    broadcast/shuffled semi join, never a row-multiplying inner."""
    pricey = lineitem.filter(
        _dec("l_extendedprice") > F.lit(min_price).cast("decimal(12,2)")
    )
    return (
        orders.join(
            pricey, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .select(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            _dec("o_totalprice").cast("double").alias("o_totalprice"),
        )
    )


def event_type_rollup(events: DataFrame) -> DataFrame:
    """Grouping-sets/ROLLUP aggregate over events."""
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    return (
        events.select("event_type", day, "value")
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
    )


def event_type_counts_salted(events: DataFrame, n_salts: int = 16) -> DataFrame:
    """Skew-resistant two-stage aggregate: ``event_type`` has a
    handful of hot keys, so at 100 TB a direct groupBy funnels each
    key through one reducer.  Stage 1 groups by (key, salt) —
    ``n_salts``-way parallelism per hot key — stage 2 folds the salted
    partials.  Sums stay DECIMAL (exact, associative) until the final
    cast, so the result is bit-identical to the direct groupBy and to
    the oracle's plain GROUP BY."""
    salted = events.withColumn(
        "salt", F.pmod(F.col("event_id"), F.lit(n_salts))
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(_dec("value")).alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("psum").cast("double").alias("sum_value"),
    )


def distinct_users(events: DataFrame) -> DataFrame:
    """Exact COUNT(DISTINCT) per group (oracle-checkable; the
    approx_count_distinct sibling is a separate rows-only query)."""
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


def approx_distinct_users(events: DataFrame) -> DataFrame:
    """HyperLogLog++ sketch twin of distinct_users (rows-only check:
    the estimate is engine-specific, like DGIM)."""
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
    )


def approx_distinct_users_bound(
    events: DataFrame, rsd: float = 0.05
) -> DataFrame:
    """Bound anchor for :func:`approx_distinct_users` (r11, VERDICT
    r10 ask #1): the HLL++ estimate itself is engine-specific, but its
    relative error vs the exact COUNT(DISTINCT) is a pure SQL
    predicate — emit the exact count next to ``within_bound``
    (``|approx − exact| ≤ 3·rsd·exact`` in integer permille
    arithmetic, or ±2 absolute for the sparse-regime tiny groups) so
    the sketch family gets a full DuckDB hash check.  ``rsd`` is
    ``approx_count_distinct``'s default 0.05; 3·rsd is the ~3σ
    envelope."""
    tol_permille = int(3000 * rsd)
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_users"),
        (
            (
                F.abs(
                    F.approx_count_distinct("user_id", rsd)
                    - F.countDistinct("user_id")
                )
                * 1000
                <= F.countDistinct("user_id") * tol_permille
            )
            | (
                F.abs(
                    F.approx_count_distinct("user_id", rsd)
                    - F.countDistinct("user_id")
                )
                <= 2
            )
        ).alias("within_bound"),
    )


SESSION_GAP_SEC = 4 * 3600


def sessionize(events: DataFrame, gap_sec: int = SESSION_GAP_SEC) -> DataFrame:
    """Gap-based sessionization via lag + running sum (the batch
    equivalent of a session window).  Microsecond-exact gap compare so
    the oracle (epoch_us) matches bit-for-bit."""
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    us = F.unix_micros(F.col("ts"))
    prev_us = F.lag(us).over(w)
    new_sess = (
        F.when(prev_us.isNull() | (us - prev_us > gap_sec * 1_000_000), 1)
        .otherwise(0)
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    sess = events.withColumn("sess_id", F.sum(new_sess).over(wsum).cast("bigint"))
    return sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
    )


def session_window_counts(
    events: DataFrame, gap_sec: int = SESSION_GAP_SEC
) -> DataFrame:
    """Spark-native session windows (``F.session_window`` — the
    dynamic-gap window operator the reference lacks): per-user
    sessions close after ``gap_sec`` of inactivity.  Twin of
    :func:`sessionize` (lag+cumsum), but windowing is done by the
    engine; window end is last-event-ts + gap by definition."""
    return (
        events.groupBy(
            "user_id",
            F.session_window("ts", f"{gap_sec} seconds").alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
        )
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end_plus_gap"
            ),
            "n_events",
        )
    )


def value_median_by_type(events: DataFrame) -> DataFrame:
    """Discrete (lower) median of ``value`` per event_type, plus the
    approx_percentile sketch twin.  The discrete median — the element
    at position ceil(n/2) in value order with event_id tie-break — is
    exactly expressible in both engines (unlike interpolating
    percentiles, whose float arithmetic differs)."""
    w = Window.partitionBy("event_type").orderBy(
        _dec("value"), F.col("event_id")
    )
    ranked = events.select(
        "event_type",
        _dec("value").alias("v"),
        "event_id",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    return (
        ranked.filter(F.col("pos") == F.expr("(n + 1) DIV 2"))
        .select(
            "event_type",
            F.col("v").cast("double").alias("median_value"),
            F.col("n").cast("bigint").alias("n_events"),
        )
    )


def json_extract_stats(events: DataFrame) -> DataFrame:
    """JSON field extraction from the props column + group count."""
    return (
        events.select(
            F.get_json_object("props", "$.k").cast("bigint").alias("k_val")
        )
        .groupBy("k_val")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def nations_without_suppliers(
    nation: DataFrame, customer: DataFrame, supplier: DataFrame
) -> DataFrame:
    """Set operation: nations with customers EXCEPT nations with
    suppliers."""
    with_cust = nation.join(
        customer, F.col("c_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    with_supp = nation.join(
        supplier, F.col("s_nationkey") == F.col("n_nationkey")
    ).select("n_name")
    return with_cust.subtract(with_supp)  # EXCEPT (distinct) semantics


def asof_view_before_purchase(events: DataFrame) -> DataFrame:
    """As-of join (an operator Spark lacks natively): for each
    'purchase' event, the most recent 'view' timestamp of the same
    user at or before it.  Implemented scalably as a single-pass
    window with last(ignorenulls) over the unioned, time-ordered
    stream — no range join, no per-row subquery."""
    ev = events.filter(F.col("event_type").isin("view", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    out = ev.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
    return out.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("last_view_ts", "yyyy-MM-dd HH:mm:ss").alias("last_view_ts"),
    )


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def event_type_pivot(events: DataFrame) -> DataFrame:
    """PIVOT: one row per day, one count column per event type.

    The pivot values are declared explicitly (``EVENT_TYPES``), and the
    rotation is a single-pass conditional aggregation rather than
    ``DataFrame.pivot``: the built-in pivot needs the value list too
    (else an extra distinct-values job — a whole wasted scan at
    100 TB) and STILL plans two shuffles (partial by (day, type), then
    repivot by day).  ``count_if`` per declared value is one
    partial-aggregated shuffle on ``day`` with identical semantics:
    missing (day, type) combos are 0, the oracle's ``count(*) FILTER``
    shape."""
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
        "day"
    )
    return (
        events.select(day, "event_type")
        .groupBy("day")
        .agg(
            *[
                F.count_if(F.col("event_type") == t)
                .cast("bigint")
                .alias(f"n_{t}")
                for t in EVENT_TYPES
            ]
        )
    )


def value_percentiles_by_type(events: DataFrame) -> DataFrame:
    """Exact interpolated percentiles (PERCENTILE_CONT semantics) of
    ``value`` per event type.  Spark's ``percentile`` and DuckDB's
    ``quantile_cont`` share the classic (n-1)*p rank-interpolation
    definition; results are rounded to 6 places to absorb the one-ulp
    differences interpolation order can produce.  Scale note: exact
    percentiles need a per-group sort — at 100 TB the production path
    is ``approx_percentile`` (t-digest-style mergeable sketch, partial
    aggregation, no sort); that twin is asserted within tolerance in
    tests."""
    ps = [0.5, 0.9, 0.99]
    exact = F.percentile("value", F.array(*[F.lit(p) for p in ps]))
    return events.groupBy("event_type").agg(
        *[
            F.round(F.get(exact, i), 6).alias(f"p{int(p * 100)}")
            for i, p in enumerate(ps)
        ],
        F.count(F.lit(1)).alias("n"),
    )


def users_view_and_purchase(events: DataFrame) -> DataFrame:
    """INTERSECT (distinct set semantics): users who both viewed and
    purchased.  Plans as a distinct-aggregate + hash semi join on
    user_id — one shuffle each side, no row multiplication."""
    viewers = events.filter(F.col("event_type") == "view").select("user_id")
    buyers = events.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.intersect(buyers)


def value_quartiles_by_type(events: DataFrame) -> DataFrame:
    """NTILE ranking: bucket each event into its within-type value
    quartile, then summarize each quartile.  The ORDER BY carries
    event_id as tie-break so bucket assignment is total-ordered and
    deterministic (oracle-matchable).  Scale note: one shuffle to
    partition by type; the per-partition sort is the cost — at 100 TB
    the approx_percentile cut-point formulation replaces the full
    sort."""
    w = Window.partitionBy("event_type").orderBy(
        F.col("value"), F.col("event_id")
    )
    return (
        events.select(
            "event_type", "value", F.ntile(4).over(w).alias("quartile")
        )
        .groupBy("event_type", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
        )
    )


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: order-priority counts for one quarter where the
    order has at least one late-shipped line (EXISTS → left-semi join;
    the schema has no l_commitdate, so "late" = shipped after the
    order date).  The semi join shuffles only (orderkey, shipdate) and
    never duplicates orders rows."""
    q = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    late = q.join(
        lineitem.select("l_orderkey", "l_shipdate"),
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7 shape: shipping volume between two nations by year,
    in both directions.  Both nation sides broadcast (25 rows); the
    fact join shuffles once on l_suppkey then once on l_orderkey;
    the bidirectional filter prunes before the aggregate."""
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2"))
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("sn_key") == F.col("s_nationkey"))
        .join(F.broadcast(n2), F.col("cn_key") == F.col("c_nationkey"))
        .filter(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


def q8_market_share(
    part: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    share_nation: str = "NATION_3",
) -> DataFrame:
    """TPC-H Q8 shape: one nation's market share of STANDARD-part
    revenue among ASIA-region customers, per order year.  The part
    filter lands before the fact join (Catalyst pushes it into the
    broadcast build side); the share is a conditional-sum ratio
    computed in DECIMAL and divided as DOUBLE (deterministic IEEE)."""
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2"))
    cust_nations = (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    j = (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cust_nations), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
    )
    agg = j.groupBy(
        F.year("o_orderdate").cast("bigint").alias("o_year")
    ).agg(
        F.sum(
            F.when(F.col("supp_nation") == share_nation, revenue).otherwise(
                F.lit(0).cast("decimal(4,2)")
            )
        ).alias("nation_rev"),
        F.sum(revenue).alias("total_rev"),
    )
    return agg.select(
        "o_year",
        (
            F.col("nation_rev").cast("double") / F.col("total_rev").cast("double")
        ).alias("mkt_share"),
        F.col("total_rev").cast("double").alias("total_revenue"),
    )


def q9_profit(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year.  The schema
    has no partsupp/ps_supplycost, so cost is proxied as
    0.5 * p_retailprice * l_quantity (documented deviation); the
    amount stays DECIMAL end-to-end so both engines sum exactly."""
    amount = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2")) - _dec(
        "p_retailprice"
    ) * _dec("l_quantity") * F.lit("0.5").cast("decimal(4,2)")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    return (
        lineitem.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(
            "supp_nation",
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


def q10_returned_items(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter.  Facts join on their keys; nation broadcasts; the
    top-k carries c_custkey as the deterministic tie-break."""
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2"))
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q13_customer_distribution(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count
    (including zero-order customers via LEFT JOIN with an ON-clause
    filter — the join predicate must NOT become a WHERE or the zeros
    vanish).  Two shuffles: custkey then c_count."""
    per_cust = (
        customer.join(
            orders.filter(F.col("o_orderpriority") != "5-LOW"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) achieving the maximum 3-month
    revenue.  The scalar max joins back as a broadcast (1 row);
    ties all surface (no LIMIT), ordered by s_suppkey."""
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2"))
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(revenue).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(F.broadcast(top), F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def q17_small_quantity(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue loss if small-quantity
    orders (below 20% of the part's average quantity) for one brand
    went unfilled.  The per-part average comes from an exact DECIMAL
    sum and a BIGINT count so the 0.2·avg threshold is the same IEEE
    double in every engine; no window function (a groupBy + broadcast
    join back is cheaper and associative)."""
    brand_items = lineitem.join(
        F.broadcast(part.filter(F.col("p_brand") == "Brand#3")),
        F.col("p_partkey") == F.col("l_partkey"),
    )
    per_part = brand_items.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    thr = per_part.select(
        "pk",
        (
            F.col("sum_qty").cast("double") * F.lit(0.2) / F.col("n_lines")
        ).alias("qty_thr"),
    )
    small = brand_items.join(
        F.broadcast(thr), F.col("pk") == F.col("l_partkey")
    ).filter(F.col("l_quantity") < F.col("qty_thr"))
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        ),
        F.count(F.lit(1)).alias("n_items"),
    )


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: revenue under a disjunction of three
    (brand, size-range, quantity-band) conjunctions — the
    OR-of-ANDs predicate-pushdown stressor.  The whole predicate
    evaluates inside the broadcast-join filter; one row out."""
    revenue = _dec("l_extendedprice") * (_one() - _dec("l_discount", "4,2"))
    j = lineitem.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q22_global_sales(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: wealthy customers in a nation subset with no
    URGENT order on file (the schema has no c_phone, so the
    country-code prefix becomes c_nationkey; every customer has SOME
    order in this data, so the anti-join target is the urgent
    subset).  The positive-balance average is an exact DECIMAL sum /
    BIGINT count divided in DOUBLE (deterministic across engines);
    the no-orders test is a left-anti join."""
    nations = [0, 1, 2, 3, 4, 5, 6]
    pool = customer.filter(F.col("c_nationkey").isin(nations))
    avg_bal = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(_dec("c_acctbal")).cast("double") / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    wealthy = pool.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    no_orders = wealthy.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT"),
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    )
    return (
        no_orders.groupBy(F.col("c_nationkey").cast("bigint").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def party_contact_counts(
    customer: DataFrame, supplier: DataFrame
) -> DataFrame:
    """UNION ALL of the two party tables under a role tag, aggregated
    per nation and role — the bag-semantics set operation (the
    reference has none, SURVEY.md §2.4).  Unions are free at scale
    (no shuffle; partitions concatenate) — the single shuffle is the
    final aggregate's."""
    c = customer.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("role")
    )
    s = supplier.select(
        F.col("s_nationkey").alias("nationkey"), F.lit("supplier").alias("role")
    )
    return (
        c.unionByName(s)
        .groupBy("nationkey", "role")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def nation_party_full_outer(
    customer: DataFrame, supplier: DataFrame
) -> DataFrame:
    """FULL OUTER join of per-nation customer and supplier counts —
    the outer-join completion of the relational surface (nations with
    customers but no suppliers survive with NULL-side counts, and
    vice versa).  Both inputs pre-aggregate to nation granularity
    before the join, so the outer join itself is tiny."""
    c = customer.groupBy(F.col("c_nationkey").alias("nk_c")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    s = supplier.groupBy(F.col("s_nationkey").alias("nk_s")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        c.join(s, F.col("nk_c") == F.col("nk_s"), "full_outer")
        .select(
            F.coalesce("nk_c", "nk_s").cast("bigint").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


def user_range_spend(events: DataFrame, days: int = 7) -> DataFrame:
    """RANGE-frame window aggregate: trailing ``days``-DAY sum of
    ``value`` per user, bounded by event TIME rather than row count
    (the time-interval sibling of :func:`user_moving_spend`).  The
    frame is expressed on epoch seconds so both engines share one
    integer range."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-(days * 86400 - 1), 0)
    )
    return events.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        F.sum(_dec("value")).over(w).cast("double").alias("range_sum"),
        F.count(F.lit(1)).over(w).alias("range_n"),
    )


def event_grouping_sets(events: DataFrame) -> DataFrame:
    """Explicit GROUPING SETS — (type, day), (type), (day) but NOT the
    grand total, which neither rollup nor cube can express alone.
    Uses the SQL form (Spark has no DataFrame literal for grouping
    sets); GROUPING() flags disambiguate the NULL semantics.  The view
    name is per-call unique and dropped once the plan is analyzed, so
    concurrent callers in one session can't race and nothing leaks
    into the user's catalog."""
    view = f"_egs_events_{uuid.uuid4().hex}"
    events.select(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        ),
        "value",
    ).createOrReplaceTempView(view)
    try:
        return events.sparkSession.sql(
            f"""
            SELECT event_type, day,
                   CAST(grouping(event_type) AS BIGINT) AS g_type,
                   CAST(grouping(day) AS BIGINT) AS g_day,
                   count(*) AS n,
                   CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
            FROM {view}
            GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))
            """
        )
    finally:
        # the returned DataFrame's plan is already analyzed (view
        # resolution happens inside sql()), so dropping is safe
        events.sparkSession.catalog.dropTempView(view)


def user_spend_salted_join(
    events: DataFrame, n_salts: int = 8
) -> DataFrame:
    """Skew-resistant fact⋈dim join by salting: events join a derived
    per-user dimension (total spend) where one user could carry a
    disproportionate share of rows.  The dim side replicates
    ``n_salts`` ways and the fact side picks a deterministic salt
    (``pmod(xxhash64(event_id), n_salts)``), so a hot user's rows
    spread over ``n_salts`` reducers instead of one.

    Output equals the unsalted join exactly (salts cancel in the
    final aggregate) — the oracle IS the unsalted formulation.  The
    companion technique for aggregation skew is
    :func:`event_type_counts_salted`; together they cover the two
    skew shapes (join-side and groupBy-side).  With AQE's skew-join
    handling on, Spark can do this at runtime — the explicit salt is
    the portable form that also works under static planning."""
    dim = events.groupBy(F.col("user_id").alias("d_user")).agg(
        F.sum(_dec("value")).alias("user_total")
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    fact = events.select(
        "event_id",
        "user_id",
        "event_type",
        _dec("value").alias("v"),
        F.pmod(F.xxhash64("event_id"), F.lit(n_salts)).cast("int").alias(
            "salt"
        ),
    )
    joined = fact.join(
        dim_salted,
        (F.col("user_id") == F.col("d_user")) & (fact["salt"] == dim_salted["salt"]),
    )
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v").cast("double").alias("sum_value"),
            F.sum("user_total").cast("double").alias("sum_user_totals"),
        )
    )


def session_window_dynamic(events: DataFrame) -> DataFrame:
    """Per-user session windows with a PER-EVENT gap (Flink's dynamic
    session-gap feature, Spark's ``session_window`` with a Column
    gap): a purchase keeps its session alive for 2 h, anything else
    for 1 h — the "engaged buyer" sessionization shape.  Sessions
    merge while an event's [ts, ts+gap) window overlaps the running
    session end, so the end is the MAX of ts+gap over merged events,
    not last-ts+constant; the DuckDB oracle reproduces exactly that
    with a running-max-of-ends window (the fixed-gap lag trick is
    wrong under mixed gaps).  Same single-shuffle plan as the
    fixed-gap twin."""
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("7200 seconds")
    ).otherwise(F.lit("3600 seconds"))
    return (
        events.groupBy(
            "user_id", F.session_window("ts", gap).alias("w")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
        )
        .select(
            "user_id",
            F.date_format("first_ts", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
        )
    )


def event_funnel(
    events: DataFrame,
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Ordered-stage conversion funnel — the batch shape of Flink's
    MATCH_RECOGNIZE / CEP sequence detection (reference scope: none;
    Flink docs' canonical pattern query).  A user completes stage k
    only with an event of stage-k type STRICTLY after their stage-k-1
    completion time; output is one row per stage with the count of
    users who reached it.

    The chained running-min windows this query is usually written
    with reduce to three chained SCALAR minima — s1 = min(view time),
    s2 = min(click time > s1), s3 = min(purchase time > s2) — because
    strict-time qualification is monotone: a click has SOME earlier
    view iff it is later than the globally earliest view (that view
    sorts before it), and likewise up the chain (asserted equal to a
    per-user replay in the property test).

    Scale shape: that closed form removes the per-user SORT and its
    skew — each stage is a map-side-combinable min over ONLY its
    stage's rows (filter pushed to the scan), joined to the previous
    stage's one-row-per-user frame on the same user_id hash; a bot
    user with millions of events is an AQE-splittable join key
    instead of one giant window partition.  The stage counts are
    three single-row aggregates.  No self-joins of the full fact
    table, no window function, no sort anywhere."""
    us = F.unix_micros(F.col("ts"))
    base = events.select("user_id", us.alias("us"), "event_type")
    stage_rows = [
        base.filter(F.col("event_type") == st).select("user_id", "us")
        for st in stages
    ]
    per1 = stage_rows[0].groupBy("user_id").agg(F.min("us").alias("s1"))
    per2 = (
        stage_rows[1]
        .join(per1, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("us") > F.col("s1"), F.col("us"))
            ).alias("s2")
        )
        .filter(F.col("s2").isNotNull())
    )
    per3 = (
        stage_rows[2]
        .join(per2, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("us") > F.col("s2"), F.col("us"))
            ).alias("s3")
        )
        .filter(F.col("s3").isNotNull())
    )
    out = None
    for i, reached in enumerate((per1, per2, per3)):
        row = reached.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(i + 1).cast("bigint").alias("stage_idx"),
            F.lit(stages[i]).alias("stage"),
            F.col("n_users").cast("bigint").alias("n_users"),
        )
        out = row if out is None else out.unionAll(row)
    return out


def user_retention_cohorts(events: DataFrame) -> DataFrame:
    """Cohort retention: users cohorted by the day of their first
    event; for each (cohort day, day offset) the number of distinct
    users active that day — the standard growth-analytics triangle.

    Scale shape: the first-day reduce and the activity join both hash
    on ``user_id`` (one shuffle each, co-partitioned join under AQE);
    the (user, day) de-dup rides the same aggregation.  The final
    (cohort_day, offset) aggregate is over |users|·|active days| rows,
    already far smaller than the fact table.  No window over a global
    order, no broadcast of anything user-sized."""
    day = F.to_date("ts").alias("day")
    firsts = events.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    active = events.select("user_id", day).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("bigint").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "n_users",
        )
    )


def derived_partsupp(lineitem: DataFrame) -> DataFrame:
    """Pseudo-PARTSUPP derived from observed lineitems (the driver
    schema ships no partsupp table): one row per (part, supplier)
    with ``ps_availqty`` = total quantity ever shipped (exact DECIMAL
    sum) and ``ps_supplycost`` = cheapest observed line price (exact
    DECIMAL min — no division, so both engines agree bit-for-bit).
    One map-side-combinable shuffle on the composite key; feeds the
    adapted TPC-H Q2/Q11/Q16/Q20."""
    return lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("ps_availqty"),
        F.min(_dec("l_extendedprice")).alias("ps_supplycost"),
    )


def q2_min_cost_supplier(
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q2 shape (adapted to the derived partsupp): for each
    ECONOMY part of size 15, the EUROPE supplier(s) achieving the
    minimum supply cost.  The correlated MIN subquery becomes a
    groupBy + equality join back on the exact DECIMAL cost; dims
    broadcast, the only fact shuffle is the partsupp derivation."""
    ps = derived_partsupp(lineitem)
    eur = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(
                        region.filter(F.col("r_name") == "EUROPE")
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    target = part.filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") == 15)
    ).select("p_partkey")
    offers = (
        ps.join(F.broadcast(target), ps.l_partkey == F.col("p_partkey"))
        .join(eur, ps.l_suppkey == eur.s_suppkey)
        .select(
            "p_partkey", "s_name", "s_acctbal", "n_name", "ps_supplycost"
        )
    )
    best = offers.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    return (
        offers.join(
            F.broadcast(best),
            (F.col("p_partkey") == F.col("pk"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .select(
            "p_partkey",
            "s_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "n_name",
            F.col("ps_supplycost").cast("double").alias("supplycost"),
        )
    )


def q11_important_stock(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q11 shape (adapted): per-part stock value
    Σ supplycost·availqty over NATION_3 suppliers, keeping parts
    holding more than twice the average per-part value (scale-free
    stand-in for the original's fixed fraction, which selects nothing
    at small SF).  The HAVING scalar subquery becomes a one-row
    broadcast; the compare is value·count > 2·total in exact DECIMALs
    (no float threshold, no division).

    Decimal headroom (round-3 advisor): the multiply-compare types
    are constrained so no intermediate exceeds DECIMAL(38) — value as
    DECIMAL(28,2) × count as DECIMAL(9,0) → DECIMAL(38,2) exact, and
    2 × total as DECIMAL(35,2) → DECIMAL(38,2) exact.  Exactness
    therefore holds while per-part value < 10^26, total < 10^33 and
    n_parts < 10^9 — comfortably past 100 TB lineitem (~6·10^9 rows ×
    ~10^8 max row value ≈ 6·10^17 total); beyond those bounds Spark
    raises/NULLs on the cast instead of silently dropping scale."""
    ps = derived_partsupp(lineitem)
    nat = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == "NATION_3")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    val = (
        ps.join(nat, ps.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("ps_partkey"))
        .agg(
            F.sum(
                F.col("ps_supplycost").cast("decimal(18,2)")
                * F.col("ps_availqty").cast("decimal(18,2)")
            )
            .cast("decimal(28,2)")
            .alias("value")
        )
    )
    total = val.agg(
        F.sum("value").cast("decimal(35,2)").alias("total_value"),
        F.count(F.lit(1)).cast("decimal(9,0)").alias("n_parts"),
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(
            F.col("value") * F.col("n_parts")
            > F.lit(2).cast("decimal(2,0)") * F.col("total_value")
        )
        .select(
            "ps_partkey", F.col("value").cast("double").alias("value")
        )
    )


def q12_late_shipments(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (adapted: the schema has no ship mode or
    receipt date, so the mode becomes the return flag and lateness is
    shipping >90 days after the order date): per flag, how many LATE
    lineitems belong to high-priority vs other orders."""
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        .filter(
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 90
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("bigint")).alias("high_line_count"),
            F.sum((~high).cast("bigint")).alias("low_line_count"),
        )
    )


def q16_supplier_counts(
    part: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q16 shape (adapted): distinct suppliers able to supply
    each (brand, type, size) combination, excluding Brand#1 parts and
    suppliers in deficit (the s_comment complaints filter has no
    column here; negative account balance is the stand-in).  The
    NOT IN supplier subquery becomes a broadcast anti join feeding
    one distinct aggregation."""
    ps = derived_partsupp(lineitem).select("l_partkey", "l_suppkey")
    ok_supp = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    keep = ps.join(
        F.broadcast(ok_supp),
        ps.l_suppkey == F.col("s_suppkey"),
        "left_anti",
    )
    return (
        keep.join(
            F.broadcast(part.filter(F.col("p_brand") != "Brand#1")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


def q20_excess_stock(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q20 shape (adapted): NATION_5 suppliers holding excess
    stock of a 'red' part — derived all-time quantity more than twice
    what they shipped of it during 1996 (the 0.5·qty threshold of the
    original, in exact DECIMALs).  The nested IN subqueries become
    key joins; the year-bounded sum rides the same (part, supplier)
    aggregation key."""
    y96 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    red = part.filter(F.col("p_name").startswith("red")).select(
        "p_partkey"
    )
    per = lineitem.join(
        F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi"
    ).groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).alias("avail_all"),
        F.sum(F.when(y96, _dec("l_quantity"))).alias("shipped96"),
    )
    excess = per.filter(
        F.col("avail_all")
        > F.lit(2) * F.coalesce(F.col("shipped96"), F.lit(0).cast("decimal(12,2)"))
    ).select("l_partkey", "l_suppkey")
    return (
        excess.join(
            F.broadcast(
                supplier.join(
                    F.broadcast(
                        nation.filter(F.col("n_name") == "NATION_5")
                    ),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                ).select("s_suppkey", "s_name")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name")
        .distinct()
    )


def q21_waiting_suppliers(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q21 shape (adapted lateness: shipped >60 days after the
    order date).  The EXISTS / NOT-EXISTS double self-join — "another
    supplier participated, no other supplier was late" — is rewritten
    as one per-order aggregation (distinct suppliers, distinct LATE
    suppliers), provably equivalent and one shuffle cheaper; numwait
    counts finished orders where a supplier was the SOLE late one."""
    late = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > 60
    li = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", late.alias("is_late"))
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(
            F.when(F.col("is_late"), F.col("l_suppkey"))
        ).alias("n_late_supp"),
    )
    waits = (
        li.filter(F.col("is_late"))
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
            ),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    return waits.join(
        F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
    ).select("s_name", "numwait")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tiebreak: str | None = None,
) -> DataFrame:
    """GENERIC as-of join — the temporal operator Spark lacks
    natively (``asof_view_before_purchase`` is the fixed-shape demo;
    this is the reusable form): every left row is paired with the
    single right row whose ``on`` timestamp is the closest at-or-
    before it (``backward``), at-or-after it (``forward``), or
    closest in either direction (``nearest`` — equal distance
    prefers backward, the pandas ``merge_asof`` convention), within
    the same ``by`` keys; unmatched left rows keep NULLs.

    NO range join and NO per-row subquery: both inputs are unioned,
    tagged, and swept by ONE ordered window per ``by`` group —
    ``last(ignorenulls)`` over the right-side payload struct carries
    the nearest right row to each left row.  That is a single shuffle
    on the ``by`` hash (the cost class of any keyed window),
    independent of how many right rows precede each left row — the
    MERGE-ASOF plan every temporal engine uses.

    Ties: equal left/right timestamps MATCH (inclusive, both
    directions); right rows sharing one timestamp are disambiguated
    by ``tiebreak`` ordered in its NATIVE type (the largest value
    wins — a string id picks the lexicographically largest) — pass
    one whenever the right side can hold duplicate timestamps, or
    the pick is partition-order-dependent.  A non-orderable tiebreak
    type (map) raises instead of silently degrading.

    Scale caveat: with ``by=[]`` the single global window funnels
    BOTH inputs through one partition — inherent to an unkeyed
    as-of (the merge needs a total time order); fine for dimension-
    sized inputs, wrong for two large fact tables.

    Output: all left columns + ``asof_<on>`` (the matched right
    timestamp) + ``asof_<c>`` for each requested right column."""
    from pyspark.sql.types import MapType

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    if tiebreak is not None:
        tb_type = right.schema[tiebreak].dataType
        if isinstance(tb_type, MapType):
            raise ValueError(
                f"tiebreak column {tiebreak!r} has non-orderable type"
                f" {tb_type.simpleString()}"
            )
    reserved = {"_tag", "_tb", "_is_left", "_rp", "_match", "_mb", "_mf"}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"left columns collide with asof_join internals: {sorted(clash)}"
        )
    by = list(by or [])
    right_cols = list(right_cols or [])
    payload = F.struct(
        F.col(on).alias("_ts"), *[F.col(c).alias(c) for c in right_cols]
    )
    # the tiebreak orders in its NATIVE type (never cast — a long
    # cast silently NULLed string ids); left rows carry a NULL of the
    # same type (their _tb never participates: _tag already differs)
    tb_right = F.col(tiebreak) if tiebreak else F.lit(0)
    tb_left = (
        F.lit(None).cast(right.schema[tiebreak].dataType)
        if tiebreak
        else F.lit(0)
    )
    lhs = (
        left.withColumn("_tag", F.lit(1))
        .withColumn("_tb", tb_left)
        .withColumn("_is_left", F.lit(True))
    )
    rhs = right.select(
        *by,
        F.col(on),
        payload.alias("_rp"),
        F.lit(0).alias("_tag"),
        tb_right.alias("_tb"),
        F.lit(False).alias("_is_left"),
    )
    tagged = lhs.unionByName(rhs, allowMissingColumns=True)
    if direction == "nearest":
        # BOTH sweeps (same by-hash partitioning -> ONE exchange, two
        # sorts), then the closer match wins; equal distance prefers
        # backward (the pandas merge_asof convention)
        from pyspark.sql.types import TimestampType

        w_b = (
            Window.partitionBy(*by)
            .orderBy(
                F.col(on).asc(), F.col("_tag").asc(), F.col("_tb").asc()
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        w_f = (
            Window.partitionBy(*by)
            .orderBy(
                F.col(on).desc(), F.col("_tag").asc(), F.col("_tb").asc()
            )
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        is_ts = isinstance(left.schema[on].dataType, TimestampType)

        def _num(c):
            return F.unix_micros(c) if is_ts else c

        mb = F.last("_rp", ignorenulls=True).over(w_b)
        mf = F.last("_rp", ignorenulls=True).over(w_f)
        swept = tagged.select(
            "*", mb.alias("_mb"), mf.alias("_mf")
        ).filter(F.col("_is_left"))
        choose_b = F.col("_mf").isNull() | (
            F.col("_mb").isNotNull()
            & (
                (_num(F.col(on)) - _num(F.col("_mb._ts")))
                <= (_num(F.col("_mf._ts")) - _num(F.col(on)))
            )
        )
        out = swept.withColumn(
            "_match",
            F.when(choose_b, F.col("_mb")).otherwise(F.col("_mf")),
        )
    else:
        ts_order = (
            F.col(on).asc()
            if direction == "backward"
            else F.col(on).desc()
        )
        w = (
            Window.partitionBy(*by)
            .orderBy(ts_order, F.col("_tag").asc(), F.col("_tb").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = tagged.withColumn(
            "_match", F.last("_rp", ignorenulls=True).over(w)
        ).filter(F.col("_is_left"))
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("_match._ts").alias(f"asof_{on}"))
    sel += [F.col(f"_match.{c}").alias(f"asof_{c}") for c in right_cols]
    return out.select(*sel)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    by: list[str] | None = None,
    bucket_sec: int = 3600,
) -> DataFrame:
    """GENERIC range (interval) join: every left row paired with each
    right interval containing its timestamp (``start <= on < end``),
    within ``by`` keys.

    Executed as an EQUI join, never an inequality-only join (which
    Spark plans as a nested-loop/cartesian): both sides map to the
    fixed ``bucket_sec`` grid — intervals explode into the buckets
    they overlap (bounded fan-out: ceil(len/bucket)+1 rows per
    interval), left rows hash to their single bucket — the join runs
    on (by…, bucket) with the exact interval predicate as a residual
    filter.  Pick ``bucket_sec`` near the typical interval length:
    fan-out stays O(1) per interval and each bucket holds only
    co-located candidates.  Output: left columns + every right
    column except the grid helpers."""
    by = list(by or [])
    b = F.lit(bucket_sec)
    r_cols = [c for c in right.columns]
    # upper bound is floor(end/b) WITHOUT subtracting: unix_timestamp
    # truncates fractional seconds, so a "-1" would skip the bucket
    # holding [trunc(end), end) whenever end has a fractional part on
    # a bucket-aligned second — the at-most-one spurious bucket this
    # admits is removed by the exact residual filter below
    rhs = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(start) / b),
                F.floor(F.unix_timestamp(end) / b),
            )
        ),
    )
    lhs = left.withColumn(
        "_bucket", F.floor(F.unix_timestamp(on) / b)
    )
    joined = lhs.join(rhs, [*by, "_bucket"]).filter(
        (F.col(on) >= F.col(start)) & (F.col(on) < F.col(end))
    )
    keep_right = [c for c in r_cols if c not in by]
    return joined.select(
        *[F.col(c) for c in left.columns], *keep_right
    )


def grouped_topk(
    df: DataFrame,
    by: list[str],
    order_col: str,
    k: int,
    ascending: bool = False,
    tiebreak: str | None = None,
) -> DataFrame:
    """GENERIC per-group top-k with the lossless map-side partial
    top-k prune — ``corpus.source_cap``'s signature scale technique
    exposed as a reusable operator (the plain one-window formulation
    funnels each group's ENTIRE row set through one task; at 100 TB a
    hot group is a straggler or an OOM).

    Phase 1 (``mapInPandas``, Arrow-batched, NO shuffle) keeps at
    most ``k`` rows per group per input partition — lossless, because
    a group's global top-k is a subset of the union of its
    per-partition top-k sets.  Phase 2 ranks the ≤ k·partitions
    survivors per group with the authoritative window.  Output: all
    input columns + ``rnk``.

    Determinism: pass a ``tiebreak`` (unique within group+order ties)
    whenever ``order_col`` can repeat — without one, which of the
    tied rows survives is partition-order-dependent."""
    sort_cols = [order_col] + ([tiebreak] if tiebreak else [])
    asc_flags = [ascending] + [True] * (len(sort_cols) - 1)

    def partial(batches):
        import pandas as pd

        best = None
        for pdf in batches:
            pool = pdf if best is None else pd.concat((best, pdf))
            best = (
                pool.sort_values(
                    sort_cols, ascending=asc_flags, kind="mergesort"
                )
                .groupby(by, sort=False)
                .head(k)
            )
        if best is not None and len(best):
            yield best

    pruned = df.mapInPandas(partial, df.schema)
    order = [
        F.col(order_col).asc() if ascending else F.col(order_col).desc()
    ]
    if tiebreak:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*by).orderBy(*order)
    return (
        pruned.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )


def table_profile(df: DataFrame, exact: bool = True,
                  rsd: float = 0.02) -> DataFrame:
    """ANALYZE-style per-column profile of ANY DataFrame — the data-
    quality / catalog-statistics surface (row count, null count,
    exact distinct count, lexicographic min/max of the string form)
    in long format: (column, n_rows, n_null, n_distinct, min_str,
    max_str).

    One JOB, |columns| aggregate expressions — every statistic is a
    built-in aggregate over one scan (count_distinct expands to a
    partial-distinct + merge per column, all planned together; no
    per-column passes, no collect).  The string form is DTYPE-PINNED
    (timestamps → fixed microsecond format, floats → printf %.6f,
    else plain cast) so min/max compare identically in any engine —
    a bare cast's fraction-trimming differs between Spark and DuckDB.
    Scale switch: exact distinct on a 100 TB column is a real
    shuffle per column — ``exact=False`` swaps every distinct count
    for ``approx_count_distinct`` (HLL++, relative error ``rsd``),
    turning the whole profile into ONE map-side-combinable pass with
    sketch-sized partial state.  The oracle pins the exact variant;
    the approx twin is bound-tested (within 3·rsd of exact on every
    column) and benched separately.

    PLAN SHAPE (r12, the r11 ``table_profile_approx_bound`` finding
    applied to the exact variant): |columns| ``count_distinct`` in
    ONE aggregation plans the multi-distinct EXPAND — one expanded
    row per distinct column per input row, with every non-distinct
    aggregate (the dtype-pinned min/max strings included) re-planned
    under a SORT-aggregate keyed on all columns.  Instead the
    non-distinct stats run as one hash-aggregate pass and each
    column's distinct count as its OWN single-distinct single-row
    aggregation (Expand-free two-level hash aggregate over that one
    pruned parquet column), all cross-joined at the end — every side
    is a single row, so the joins are free.  |columns| extra scans of
    one column each beat a |columns|+1× row expand + global sort of
    the whole table (measured 4.8 s → see OPTIMIZATION_r12.md;
    the same trade the r11 fix measured at 42× for the bound twin)."""
    from pyspark.sql.types import DoubleType, FloatType, TimestampType

    def s_form(c: str):
        dt = df.schema[c].dataType
        col = F.col(c)
        if isinstance(dt, TimestampType):
            out = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        elif isinstance(dt, (DoubleType, FloatType)):
            out = F.format_string("%.6f", col)
        else:
            out = col.cast("string")
        return F.when(col.isNotNull(), out)

    aggs = []
    for c in df.columns:
        s = s_form(c)
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__null"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
        if not exact:
            aggs.append(
                F.approx_count_distinct(F.col(c), rsd).alias(f"{c}__dist")
            )
    # The exact split-aggregation shape evaluates df |columns|+1
    # times.  For a scan-backed df each pass is a pruned one-column
    # scan (the r12 measured win); for an EXPENSIVE DERIVED input the
    # re-derives would dominate (ADVICE r12) — pin such inputs once.
    # Heuristic: a bare scan (± Project/Filter) optimizes to ≤ 3 plan
    # nodes; anything deeper gets a lazy localCheckpoint so every
    # pass reads the materialized rows instead of re-running the
    # upstream pipeline.
    src = df
    if exact:
        try:
            plan_depth = len(
                df._jdf.queryExecution()
                .optimizedPlan()
                .toString()
                .strip()
                .splitlines()
            )
        except Exception:  # pragma: no cover — non-JVM test doubles
            plan_depth = 1
        if plan_depth > 3:
            src = df.localCheckpoint(eager=False)
    wide = src.agg(*aggs)
    if exact:
        # one single-distinct aggregation per column: Expand-free,
        # column-pruned, single-row — the cross joins are free
        for c in df.columns:
            wide = wide.crossJoin(
                src.agg(F.count_distinct(F.col(c)).alias(f"{c}__dist"))
            )
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__n").alias("n_rows"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__dist").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_str"),
                        F.col(f"{c}__max").alias("max_str"),
                    )
                    for c in df.columns
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


def table_profile_approx_bound(
    df: DataFrame, rsd: float = 0.02
) -> DataFrame:
    """Bound anchor for ``table_profile(exact=False)`` (r11, VERDICT
    r10 ask #1): the HLL++ per-column distinct estimates are
    engine-specific, but their error envelope vs the exact counts is a
    pure SQL predicate.  Emits the EXACT profile columns (all
    SQL-recomputable — same long format as the exact variant) plus
    ``within_bound``: ``|approx − exact| ≤ 3·rsd·exact`` in integer
    permille arithmetic, or ±2 absolute for sparse-regime tiny
    columns.

    PLAN SHAPE (r11 bench finding): the exact profile and the approx
    sketches run as TWO separate single-row aggregations cross-joined
    at the end.  Planning them together puts the HLL and min/max
    aggregates under the multi-distinct EXPAND (one expanded row per
    distinct column per input row), re-evaluating every non-distinct
    aggregate |columns|+1 times — measured 69.7 s vs 1.65 s for the
    split shape on 100k rows × 6 columns.  Two scans of the base
    relation beat a 7× expand of it.

    r12: the EXACT side is split further — |columns| co-planned
    ``count_distinct`` still carried their own multi-distinct EXPAND
    (+ an all-columns SortAggregate under it); each distinct count
    now runs as its own Expand-free single-distinct single-row
    aggregation over one pruned column, cross-joined like the HLL
    side (same rationale as :func:`table_profile`)."""
    from pyspark.sql.types import DoubleType, FloatType, TimestampType

    def s_form(c: str):
        dt = df.schema[c].dataType
        col = F.col(c)
        if isinstance(dt, TimestampType):
            out = F.date_format(col, "yyyy-MM-dd HH:mm:ss.SSSSSS")
        elif isinstance(dt, (DoubleType, FloatType)):
            out = F.format_string("%.6f", col)
        else:
            out = col.cast("string")
        return F.when(col.isNotNull(), out)

    tol_permille = int(3000 * rsd)
    exact_aggs = []
    for c in df.columns:
        s = s_form(c)
        exact_aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__null"),
            F.min(s).alias(f"{c}__min"),
            F.max(s).alias(f"{c}__max"),
        ]
    approx_aggs = [
        F.approx_count_distinct(F.col(c), rsd).alias(f"{c}__adist")
        for c in df.columns
    ]
    # every side is a single-row aggregate: the cross joins are free
    wide = df.agg(*exact_aggs).crossJoin(df.agg(*approx_aggs))
    for c in df.columns:
        wide = wide.crossJoin(
            df.agg(F.count_distinct(F.col(c)).alias(f"{c}__dist"))
        )
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(f"{c}__n").alias("n_rows"),
                        F.col(f"{c}__null").alias("n_null"),
                        F.col(f"{c}__dist").alias("n_distinct"),
                        F.col(f"{c}__min").alias("min_str"),
                        F.col(f"{c}__max").alias("max_str"),
                        (
                            (
                                F.abs(
                                    F.col(f"{c}__adist")
                                    - F.col(f"{c}__dist")
                                )
                                * 1000
                                <= F.col(f"{c}__dist") * tol_permille
                            )
                            | (
                                F.abs(
                                    F.col(f"{c}__adist")
                                    - F.col(f"{c}__dist")
                                )
                                <= 2
                            )
                        ).alias("within_bound"),
                    )
                    for c in df.columns
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


def scd2_build(
    changes: DataFrame,
    key: list[str],
    attrs: list[str],
    ts_col: str = "ts",
    tiebreak: str | None = None,
    delete_col: str | None = None,
) -> DataFrame:
    """Type-2 slowly-changing-dimension build from a change log — the
    warehouse operator that turns an event stream of attribute
    observations into versioned dimension rows: per entity ``key``,
    consecutive observations whose ``attrs`` are unchanged collapse
    into one version, each version carries ``valid_from`` (its first
    observation) and ``valid_to`` (the next version's start, NULL
    while current), and ``is_current`` marks the open row.

    Determinism: observations are ordered by (``ts_col``,
    ``tiebreak``); pass a tiebreak whenever one entity can emit two
    observations at the same timestamp.  Attribute comparison is
    null-safe (a NULL attribute equals NULL, so missing values do
    not fabricate versions).

    CDC deletes: pass ``delete_col`` (boolean-ish) to treat flagged
    rows as TOMBSTONES — a tombstone closes the key's open version at
    its timestamp and opens nothing, so the key has no current row
    until (and unless) a later live observation re-inserts it; a
    re-insert always opens a fresh version even if its attributes
    match the pre-delete state, and consecutive tombstones collapse.
    Mechanically the tombstone participates in the change-collapse as
    a distinct "deleted" state (so it claims a version slot whose
    ``valid_from`` becomes the predecessor's ``valid_to``) and the
    deleted slots are dropped from the output AFTER the validity
    lead — the standard soft-delete compaction.

    Scale shape: ONE hash shuffle on the entity key feeding two
    window passes (the change-collapse lag and the validity lead
    reuse the same partitioning — Catalyst plans a single Exchange);
    state per task is one row of lookback.  No join against the
    dimension's history: the log IS the input, which is how SCD2
    backfills run at warehouse scale."""
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak).asc()] if tiebreak else []
    )
    w = Window.partitionBy(*key).orderBy(*order)
    # Coalesce the flag: a NULL delete marker means "not a delete" —
    # without this, NULL makes the struct compare drop the row from
    # the output entirely, and NULL-vs-false flags would count as
    # distinct states in the change collapse, fabricating versions.
    del_flag = (
        F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        if delete_col
        else F.lit(False)
    )
    cur = F.struct(
        del_flag.alias("_del"), *[F.col(a) for a in attrs]
    )
    prev = F.lag(cur).over(w)
    versions = changes.withColumn("_del", del_flag).withColumn(
        "_is_new_version",
        prev.isNull() | ~prev.eqNullSafe(cur),
    ).filter(F.col("_is_new_version"))
    w2 = Window.partitionBy(*key).orderBy(*order)
    valid_to = F.lead(F.col(ts_col)).over(w2)
    return versions.select(
        *key,
        *attrs,
        F.col(ts_col).alias("valid_from"),
        valid_to.alias("valid_to"),
        valid_to.isNull().cast("bigint").alias("is_current"),
        F.col("_del"),
    ).filter(~F.col("_del")).drop("_del")


def scd2_lookup(
    facts: DataFrame,
    versions: DataFrame,
    key: list[str],
    ts_col: str = "ts",
    attrs: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Point-in-time (temporal) dimension lookup: enrich each fact
    row with the :func:`scd2_build` version whose validity interval
    contains the fact's timestamp — the "what did the dimension say
    THEN" join every event-sourced warehouse needs.

    Because SCD2 versions tile time per key (each version's
    ``valid_from`` is the previous one's ``valid_to``), interval
    containment reduces to an AS-OF match on ``valid_from`` — so this
    is :func:`asof_join` (ONE keyed window sweep, no join node, no
    interval explode), not a range join.  Facts earlier than the
    key's first version keep NULLs.  If the change log can hold two
    observations of one key at one timestamp, pass the ``tiebreak``
    used at build time (kept via ``attrs``) so both engines pick the
    same same-instant version.

    Output: all fact columns + ``asof_<c>`` per requested attribute
    + ``asof_valid_from`` (aliased from the as-of timestamp)."""
    attrs = list(attrs or [])
    rhs = versions.select(
        *key,
        F.col("valid_from").alias(ts_col),
        *[F.col(c) for c in attrs],
    )
    out = asof_join(
        facts, rhs, on=ts_col, by=key, right_cols=attrs,
        tiebreak=tiebreak,
    )
    return out.withColumnRenamed(f"asof_{ts_col}", "asof_valid_from")


def skew_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Key-distribution skew diagnostics — the partitioning-design
    tool: per candidate shuffle/join key, its cardinality, the
    hottest key's share, and the Gini coefficient of the key
    frequency distribution.  This is what decides between a plain
    hash shuffle, AQE skew-split, and salting at 100 TB (a key with
    top1_share_ppm ≫ 10^6/num_partitions guarantees a straggler).

    All-integer Gini WITHOUT a per-key rank sort: for frequencies
    sorted ascending, G = Σ_i (2i−n−1)·x_i / (n·Σx).  Tie blocks of
    equal frequency contribute c·f·(2·cumf − f − n) in closed form
    (f = #keys with frequency c, cumf = keys with frequency ≤ c), so
    the rank sum runs over the COUNT-OF-COUNTS table — |distinct
    frequencies| rows, tiny for any real distribution — instead of
    the |distinct keys| table.  Scale shape per column: one keyed
    aggregation (keys→counts), one tiny aggregation (counts→
    count-of-counts), one ordered window over that tiny table.
    gini_e6 = num·10^6 div (n_distinct·n_rows), exact in
    DECIMAL(38,0).
    """
    parts = []
    for c in cols:
        counts = df.groupBy(F.col(c).alias("_k")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        cc = counts.groupBy("cnt").agg(
            F.count(F.lit(1)).cast("bigint").alias("f")
        )
        wcum = Window.orderBy("cnt").rowsBetween(
            Window.unboundedPreceding, 0
        )
        cc = cc.withColumn("cumf", F.sum("f").over(wcum))
        d38 = "decimal(38,0)"
        agg = cc.agg(
            F.sum(F.col("cnt") * F.col("f")).cast("bigint").alias(
                "n_rows"
            ),
            F.sum("f").cast("bigint").alias("n_distinct"),
            F.max("cnt").cast("bigint").alias("max_cnt"),
            F.sum(
                F.col("cnt").cast(d38)
                * F.col("f").cast(d38)
                * (
                    F.lit(2).cast(d38) * F.col("cumf").cast(d38)
                    - F.col("f").cast(d38)
                )
            ).alias("_rank_part"),
        )
        # num = Σ c·f·(2·cumf − f − n) = _rank_part − n·Σ(c·f)
        parts.append(
            agg.select(
                F.lit(c).alias("column"),
                "n_rows",
                "n_distinct",
                "max_cnt",
                F.expr(
                    "CAST((max_cnt * 1000000) div n_rows AS BIGINT)"
                ).alias("top1_share_ppm"),
                F.expr(
                    "CAST(((_rank_part - CAST(n_distinct AS"
                    " DECIMAL(38,0)) * CAST(n_rows AS DECIMAL(38,0)))"
                    " * 1000000) div (CAST(n_distinct AS"
                    " DECIMAL(38,0)) * CAST(n_rows AS DECIMAL(38,0)))"
                    " AS BIGINT)"
                ).alias("gini_e6"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def dataset_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    cmp_cols: list[str],
) -> DataFrame:
    """Snapshot diff — the audit step between two versions of a keyed
    table (two days of an aggregate, two pipeline runs, two SCD
    extracts): per key, both versions' compare-column values and a
    status of ``added`` (key only in new), ``removed`` (only in old),
    ``changed`` (values differ, null-safe), or ``unchanged``.

    Scale shape: ONE full outer equi-join on the key columns — both
    sides shuffle-partition by the same key, no broadcast assumption
    (snapshots are the same order of magnitude by definition).
    Output columns: key_cols, then old_/new_-prefixed cmp_cols, then
    status."""
    o = old.select(
        *key_cols,
        *[F.col(c).alias(f"old_{c}") for c in cmp_cols],
        F.lit(1).alias("_in_old"),
    )
    n = new.select(
        *key_cols,
        *[F.col(c).alias(f"new_{c}") for c in cmp_cols],
        F.lit(1).alias("_in_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    same = F.lit(True)
    for c in cmp_cols:
        same = same & F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        *key_cols,
        *[f"old_{c}" for c in cmp_cols],
        *[f"new_{c}" for c in cmp_cols],
        status.alias("status"),
    )


def join_hotspots(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    k: int = 20,
) -> DataFrame:
    """Join-planning diagnostic: for a prospective equi-join, the
    top-``k`` keys by output fan-out (left count × right count) plus
    both sides' counts — the companion to :func:`skew_report` that
    looks at the JOIN rather than one table (a key whose product
    dominates the total predicts the straggler partition and decides
    salting / skew-split before the join ever runs).

    Scale shape: two keyed count aggregations (map-side combined),
    one equi-join of the two COUNT tables (key-cardinality-sized,
    not row-sized), then ``orderBy().limit(k)`` — planned as
    TakeOrderedAndProject (per-partition k-row heads + one k-row
    merge, never a global sort of the key table) — the prospective
    join's row space is never materialized and the only ordered
    unpartitioned window ranks the ≤ k survivors.  Deterministic
    tie-break on the key columns."""
    lc = left.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_left")
    )
    rc = right.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_right")
    )
    j = lc.join(rc, key_cols).select(
        *key_cols,
        "n_left",
        "n_right",
        (F.col("n_left") * F.col("n_right")).cast("bigint").alias(
            "fanout"
        ),
    )
    order = [F.col("fanout").desc()] + [F.col(c).asc() for c in key_cols]
    topk = j.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return topk.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    )


def dq_checks(
    df: DataFrame,
    not_null: list[str] | None = None,
    unique: list[str] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    allowed: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Declarative data-quality constraint suite (the Deequ /
    Great-Expectations shape): evaluate completeness (``not_null``),
    key uniqueness (``unique``), numeric bounds (``ranges``,
    inclusive) and categorical domains (``allowed``) over a table
    and emit one row per check — the validation gate a 100 TB
    ingest runs before promoting a batch.

    Output: (check, column, n_rows, n_violations, passed) — a range
    or domain violation counts non-null offending rows only (nulls
    are the completeness check's job); a uniqueness violation counts
    surplus duplicates (``count(col) − count_distinct(col)``).

    Scale shape: ONE job, one scan — every check is a built-in
    aggregate planned together (the ``table_profile`` recipe);
    uniqueness is the only per-column partial-distinct shuffle, and
    the checks themselves are map-side combinable.  No collect, no
    per-check passes."""
    specs: list[tuple[str, str, object]] = []
    for c in not_null or []:
        specs.append(
            ("not_null", c, F.sum(F.col(c).isNull().cast("bigint")))
        )
    for c in unique or []:
        specs.append(
            (
                "unique",
                c,
                F.count(F.col(c)) - F.count_distinct(F.col(c)),
            )
        )
    for c, (lo, hi) in (ranges or {}).items():
        bad = F.col(c).isNotNull() & (
            (F.col(c) < F.lit(lo)) | (F.col(c) > F.lit(hi))
        )
        specs.append((f"range[{lo},{hi}]", c, F.sum(bad.cast("bigint"))))
    for c, vals in (allowed or {}).items():
        bad = F.col(c).isNotNull() & ~F.col(c).isin(list(vals))
        specs.append(("allowed_values", c, F.sum(bad.cast("bigint"))))
    if not specs:
        raise ValueError("dq_checks: no constraints given")
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.coalesce(expr.cast("bigint"), F.lit(0)).alias(f"__v{i}")
        for i, (_, _, expr) in enumerate(specs)
    ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(chk).alias("check"),
                        F.lit(c).alias("column"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__v{i}").alias("n_violations"),
                        (F.col(f"__v{i}") == 0)
                        .cast("bigint")
                        .alias("passed"),
                    )
                    for i, (chk, c, _) in enumerate(specs)
                ]
            )
        ).alias("p")
    )
    return stacked.select("p.*")


def cdc_apply(
    changelog: DataFrame,
    key: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_op: str = "D",
    keep_tombstones: bool = False,
) -> DataFrame:
    """Changelog → snapshot compaction: the batch MERGE / Kafka
    compacted-topic materialization (and the batch twin of the
    streaming upsert-state reader, ``streaming/jobs.py``
    ``read_upsert_state``) — per entity ``key`` the change with the
    highest ``seq_cols`` wins, and a key whose winning change is a
    delete tombstone is ABSENT from the snapshot.  This is the
    apply-changes half of every CDC ingest (Debezium → warehouse
    table): :func:`scd2_build` keeps the full version history, this
    keeps only the current image.

    Determinism: ``seq_cols`` must totally order each key's changes
    (pass a change-log offset as the last column whenever one key can
    emit two changes at the same timestamp); NULL ops count as
    upserts (a NULL flag from a permissive decode must not silently
    delete — same coalesce discipline as ``scd2_build``'s tombstone
    flag).

    Scale shape: ONE hash shuffle on the entity key feeding a single
    max-by window pass (row_number over seq desc, keep rank 1) —
    the standard compaction shape; no join, no global sort.  At
    warehouse scale this runs per partition-of-keys and is exactly
    what a MERGE INTO with latest-wins semantics plans.

    ``keep_tombstones=True`` keeps a key's winning DELETE row in the
    output (op column retained): the shape a downstream incremental
    consumer needs — a per-batch compaction must still FORWARD the
    tombstone so it can override earlier batches' upserts
    (``streaming`` CDC maintenance uses this; the final read drops
    tombstone winners, same end state)."""
    order = [F.col(c).desc() for c in seq_cols]
    w = Window.partitionBy(*key).orderBy(*order)
    winners = changelog.withColumn(
        "_rn", F.row_number().over(w)
    ).filter(F.col("_rn") == 1)
    if not keep_tombstones:
        winners = winners.filter(
            ~F.coalesce(
                F.col(op_col) == F.lit(delete_op), F.lit(False)
            )
        )
    return winners.drop("_rn")
