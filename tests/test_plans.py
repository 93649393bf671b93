"""Physical-plan regression tests: the 100 TB posture, pinned.

Each test asserts a plan property a refactor could silently lose:
predicate pushdown into the parquet scan, read-schema pruning,
broadcast of small sides, absence of cartesian products, and shuffle
counts at the minimum the query's semantics require.
"""

import pytest

from flink_window_dgim_traffic_spark.operators import dedup as D
from flink_window_dgim_traffic_spark.operators import relational as R
from flink_window_dgim_traffic_spark.operators import similarity as S
from flink_window_dgim_traffic_spark.operators import windows as W
from flink_window_dgim_traffic_spark.plans import inspect as I
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def t(spark, sf_dir):
    def load(name):
        return table(spark, sf_dir, name)

    return load


def test_q1_pushdown_pruning_single_shuffle(t):
    df = R.q1_pricing_summary(t("lineitem"))
    # the shipdate filter reaches the scan
    assert "l_shipdate" in I.pushed_filter_columns(df, "lineitem")
    # only the 7 needed columns are read (16-column table)
    assert I.read_columns(df, "lineitem") == {
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_shipdate",
    }
    # partial agg map-side => exactly one shuffle (by group keys)
    assert I.exchange_count(df) == 1


def test_q3_filters_pushed_no_cartesian(t):
    df = R.q3_shipping_priority(t("customer"), t("orders"), t("lineitem"))
    assert "c_mktsegment" in I.pushed_filter_columns(df, "customer")
    assert "o_orderdate" in I.pushed_filter_columns(df, "orders")
    assert "l_shipdate" in I.pushed_filter_columns(df, "lineitem")
    assert not I.has_cartesian(df)


def test_q5_broadcasts_dims_no_cartesian(t):
    df = R.q5_local_supplier(
        t("customer"), t("orders"), t("lineitem"),
        t("supplier"), t("nation"), t("region"),
    )
    assert "r_name" in I.pushed_filter_columns(df, "region")
    assert not I.has_cartesian(df)
    # region + nation (+ usually supplier/customer) broadcast
    assert I.broadcast_join_count(df) >= 2


def test_tumble_exact_single_shuffle_pruned_scan(t):
    df = W.tumble_exact(t("events"))
    # only event_id (bit) and ts read from the 6-column events table
    assert I.read_columns(df, "events") == {"event_id", "ts"}
    assert I.exchange_count(df) == 1
    assert I.codegen_span_count(df) >= 1


def test_hop_dgim_two_phase_shuffles_sketches_not_rows(t):
    df = W.hop_dgim_two_phase(t("events"), 60, 10)
    # one repartition (test-env spread) + one groupBy(window) shuffle;
    # the pane fan-out must NOT add a shuffle of raw rows
    assert I.exchange_count(df) <= 2
    assert I.read_columns(df, "events") == {"event_id", "ts"}


def test_simsearch_topk_broadcasts_queries(t):
    """The query side must broadcast (non-equi join => nested-loop,
    but over a broadcast side, never a shuffle cartesian)."""
    df = S.simsearch_topk(t("embeddings"))
    assert I.broadcast_exchange_count(df) >= 1
    assert not I.has_cartesian(df)


def test_minhash_lsh_no_cartesian(t):
    df = D.minhash_lsh_pairs(t("documents"), threshold=0.8)
    assert not I.has_cartesian(df)


def test_dedup_exact_single_shuffle(t):
    df = D.dedup_exact(t("documents"))
    assert I.exchange_count(df) == 1


def test_user_moving_spend_single_shuffle_pruned(t):
    df = R.user_moving_spend(t("events"))
    # one shuffle by user_id; only the 4 needed columns read
    assert I.exchange_count(df) == 1
    assert I.read_columns(df, "events") == {
        "user_id", "event_id", "ts", "value",
    }


def test_q14_broadcasts_part(t):
    df = R.q14_promo_revenue(t("lineitem"), t("part"))
    assert "l_shipdate" in I.pushed_filter_columns(df, "lineitem")
    assert I.broadcast_join_count(df) >= 1
    assert not I.has_cartesian(df)


def test_salted_agg_two_shuffles_small(t):
    """The salted aggregate pays one extra (tiny, post-partial-agg)
    shuffle for its skew resistance — never more."""
    df = R.event_type_counts_salted(t("events"))
    assert I.exchange_count(df) == 2


def test_pivot_single_shuffle_pruned(t):
    """Conditional-aggregation pivot: ONE shuffle (DataFrame.pivot
    plans two), and only (ts, event_type) read from the scan."""
    df = R.event_type_pivot(t("events"))
    assert I.exchange_count(df) == 1
    assert I.read_columns(df, "events") == {"ts", "event_type"}


def test_union_all_no_extra_shuffle(t):
    """UNION ALL concatenates partitions; the only shuffle is the
    final aggregate's."""
    df = R.party_contact_counts(t("customer"), t("supplier"))
    assert I.exchange_count(df) == 1


def test_sql_session_twin_equals_dataframe(spark, sf_dir):
    """The session_window TVF in SQL must produce the same rows as
    the DataFrame session_window_counts (plan-identical twins)."""
    from flink_window_dgim_traffic_spark.operators import relational as R
    from flink_window_dgim_traffic_spark.operators import sql_surface as Q
    from flink_window_dgim_traffic_spark.session import table

    sql_rows = sorted(
        map(tuple, Q.sql_session_exact(spark, sf_dir).collect())
    )
    df_rows = sorted(
        map(tuple, R.session_window_counts(table(spark, sf_dir, "events")).collect())
    )
    assert sql_rows == df_rows


def test_q9_all_dims_broadcast_one_shuffle(t):
    df = R.q9_profit(t("lineitem"), t("part"), t("supplier"), t("nation"))
    assert "p_type" in I.pushed_filter_columns(df, "part")
    assert I.broadcast_join_count(df) >= 3  # part, supplier, nation
    assert I.exchange_count(df) == 1       # only the final groupBy
    assert not I.has_cartesian(df)


def test_q19_predicate_reaches_scan(t):
    df = R.q19_discounted_revenue(t("lineitem"), t("part"))
    # the quantity bands are scan-level (the disjunction's common
    # quantity range [1,30] is derivable; at minimum no cartesian and
    # part broadcasts)
    assert I.broadcast_join_count(df) >= 1
    assert not I.has_cartesian(df)
    # lineitem read is pruned to the join/predicate/measure columns
    assert I.read_columns(df, "lineitem") <= {
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount",
    }


def test_chunk_dedup_two_shuffles_only(t):
    df = D.chunk_dedup(t("documents"))
    # chunk-text min-groupBy + reassembly groupBy (+ the AQE-planned
    # join exchanges); the important property: no cartesian, and the
    # documents scan reads only doc_id + text
    assert not I.has_cartesian(df)
    assert I.read_columns(df, "documents") == {"doc_id", "text"}


def test_gopher_quality_map_only(t):
    from flink_window_dgim_traffic_spark.operators import quality as QL

    df = QL.gopher_quality(t("documents"))
    assert I.exchange_count(df) == 0  # zero shuffles: pure projection
    assert I.read_columns(df, "documents") == {"doc_id", "text"}


def test_unigram_commonness_broadcast_vocab(t):
    from flink_window_dgim_traffic_spark.operators import quality as QL

    df = QL.unigram_commonness(t("documents"))
    assert not I.has_cartesian(df)
    # ppm vocabulary joins back via broadcast, not a sort-merge
    assert I.broadcast_join_count(df) >= 1


def test_partitioning_invariance(spark, sf_dir):
    """Deterministic queries must return identical rows whatever
    spark.sql.shuffle.partitions is — the driver's own session config
    is not ours, so this is the property the oracle hash depends on."""
    from flink_window_dgim_traffic_spark.operators import dedup as D2
    from flink_window_dgim_traffic_spark.operators import quality as QL

    docs = table(spark, sf_dir, "documents")
    lineitem = table(spark, sf_dir, "lineitem")
    builds = {
        "q1": lambda: R.q1_pricing_summary(lineitem),
        "commonness": lambda: QL.unigram_commonness(docs),
        "chunk_dedup": lambda: D2.chunk_dedup(docs),
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for n in ("3", "8"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            for name, b in builds.items():
                results.setdefault(name, []).append(
                    sorted(map(tuple, b().collect()))
                )
        for name, (a, b) in results.items():
            assert a == b, f"{name} changed under repartitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_neardup_blocked_static_grid_runs_no_sizing_job(spark, t):
    """With ``n_blocks`` pinned, building the blocked-screen plan must
    launch ZERO Spark jobs (the default path runs one count() to size
    the block grid — callers in loops pass the static grid instead)."""
    emb = t("embeddings")
    emb.count()  # materialize lazy session state outside the window
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    df = S.embedding_neardup_blocked(emb, threshold=0.4, n_blocks=2)
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # plan construction scheduled no job
    # and the static grid produces the same pairs as the sized one
    a = sorted(map(tuple, df.collect()))
    b = sorted(
        map(tuple, S.embedding_neardup_blocked(emb, threshold=0.4).collect())
    )
    assert a == b


def test_round3_ops_plan_shapes(t):
    """Round-3 operators: shuffle counts at the semantic minimum, no
    cartesian products, thresholds broadcast."""
    from flink_window_dgim_traffic_spark.operators import corpus as C3
    from flink_window_dgim_traffic_spark.operators import dedup as D3
    from flink_window_dgim_traffic_spark.operators import text as T3
    import pyspark.sql.functions as F

    docs = t("documents")
    # source_cap: the ONLY exchange is the per-source window over the
    # map-side-pruned survivors (mapInPandas itself shuffles nothing)
    df = C3.source_cap(docs, cap=15)
    assert I.exchange_count(df) == 1 and not I.has_cartesian(df)
    # cumulate_exact: explode is map-side; one partial-agg shuffle
    df = W.cumulate_exact(t("events"))
    assert I.exchange_count(df) == 1 and not I.has_cartesian(df)
    # quality_quantile_gate: one bounded threshold aggregation, gate
    # itself joins the one-row-per-lang frame broadcast (map-only)
    df = T3.quality_quantile_gate(docs)
    assert I.exchange_count(df) == 1
    assert I.broadcast_join_count(df) >= 1 and not I.has_cartesian(df)
    # dedup_incremental: anti join + map-side-combinable min/count --
    # at most 3 exchanges however AQE plans the join, never cartesian
    df = D3.dedup_incremental(
        docs.filter(F.col("doc_id") % 2 == 1),
        docs.filter(F.col("doc_id") % 2 == 0),
    )
    assert I.exchange_count(df) <= 3 and not I.has_cartesian(df)


def test_new_round3_ops_plan_shapes(t):
    """Funnel/retention/entropy/outlier/span/DSIR operators: shuffle
    counts at the semantic minimum, no cartesian products."""
    from flink_window_dgim_traffic_spark.operators import corpus as C3
    from flink_window_dgim_traffic_spark.operators import text as T3

    ev, docs, emb = t("events"), t("documents"), t("embeddings")
    # closed-form funnel: NO window, NO sort — per-stage map-side-
    # combined minima chained on the user_id hash (skew-splittable
    # joins), plus three single-row count aggregates
    df = R.event_funnel(ev)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Sort [" not in plan and " Sort " not in plan
    assert not I.has_cartesian(df)
    df = R.user_retention_cohorts(ev)
    assert I.exchange_count(df) <= 4 and not I.has_cartesian(df)
    # explode -> (doc,w) -> doc: exactly two keyed aggregations
    df = T3.word_entropy(docs)
    assert I.exchange_count(df) == 2 and not I.has_cartesian(df)
    # centroids and per-label means broadcast back; never a pair join
    df = S.embedding_outliers(emb)
    assert I.broadcast_join_count(df) >= 2 and not I.has_cartesian(df)
    # (span,doc) agg + map-side-combined span counts semi-joined back
    # (skew-splittable, unlike a count-over-window) + doc agg
    df = D.duplicated_spans(docs)
    assert I.exchange_count(df) <= 4
    assert I.broadcast_join_count(df) >= 1 and not I.has_cartesian(df)
    # one profile aggregation pass (conditional target count), scoring
    # joins the constant-size profile via broadcast hash join (the
    # one-row totals ride a broadcast nested loop, not counted here)
    df = C3.importance_weights(docs)
    assert I.broadcast_join_count(df) >= 1 and not I.has_cartesian(df)


def test_round4_ops_plan_shapes(t):
    """window_topn / ewma_anomaly / anomaly_drilldown /
    tfidf_top_terms: shuffle counts at the semantic minimum, small
    sides broadcast, scans pruned, no cartesian products."""
    from flink_window_dgim_traffic_spark.operators import retrieval as RT4

    ev, docs = t("events"), t("documents")
    # (window,user) agg + per-window rank: two keyed exchanges, and
    # the events scan reads only ts + user_id
    df = W.window_topn(ev)
    assert I.exchange_count(df) <= 2 and not I.has_cartesian(df)
    assert I.read_columns(df, "events") <= {"ts", "user_id"}
    # events collapse to the windows table before the ordered window
    # (the single-partition window runs on windows, never events)
    df = W.ewma_anomaly(ev)
    assert I.read_columns(df, "events") <= {"ts", "event_id"}
    assert not I.has_cartesian(df)
    # anomalous-window list broadcasts back to the events probe
    df = W.anomaly_drilldown(ev)
    assert I.broadcast_join_count(df) >= 1 and not I.has_cartesian(df)
    # tf agg + df agg + term join + per-doc rank; corpus count rides
    # a one-row broadcast
    df = RT4.tfidf_top_terms(docs)
    assert not I.has_cartesian(df)
    assert I.read_columns(df, "documents") <= {"doc_id", "text"}
    # token-budget select: bucket tables broadcast back to the doc
    # side (two broadcast joins), never a global doc sort fed by a
    # single-partition exchange of raw documents
    from flink_window_dgim_traffic_spark.operators import corpus as C4

    df = C4.token_budget_select(docs)
    assert I.broadcast_join_count(df) >= 2 and not I.has_cartesian(df)
    assert I.read_columns(df, "documents") <= {"doc_id", "text"}
    # generic range join: the interval predicate rides a bucket EQUI
    # join, never a nested-loop/cartesian
    from pyspark.sql import functions as F4

    first = (
        ev.groupBy("user_id")
        .agg(F4.min("ts").alias("start_ts"))
        .withColumn(
            "end_ts", F4.col("start_ts") + F4.expr("INTERVAL 1 HOUR")
        )
    )
    df = R.range_join(
        ev, first, on="ts", start="start_ts", end="end_ts",
        by=["user_id"],
    )
    assert not I.has_cartesian(df)
    # generic as-of join: one keyed window sweep, no join at all
    buys = ev.filter(F4.col("event_type") == "purchase")
    views = ev.filter(F4.col("event_type") == "view")
    df = R.asof_join(
        buys, views, on="ts", by=["user_id"], right_cols=["event_id"],
        tiebreak="event_id",
    )
    assert not I.has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_round5_operator_plan_shapes(t):
    """Round-5 operators: m4 is ONE keyed shuffle over a pruned scan;
    span_dedup and the RRF fusion never go cartesian; scd2's two
    window passes share one exchange (pinned in test_relational)."""
    from flink_window_dgim_traffic_spark.operators import retrieval as RT

    ev = t("events")
    df = W.m4_downsample(ev, 600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert I.read_columns(df, "events") == {"event_id", "ts", "value"}
    docs = t("documents")
    df = D.span_dedup(docs)
    assert not I.has_cartesian(df)
    assert I.read_columns(df, "documents") <= {"doc_id", "text"}
    df = RT.hybrid_retrieval_rrf(docs)
    # the 1-row corpus-stats attach is a BROADCAST nested-loop (the
    # correct plan for a conditionless 1-row build side); the fusion
    # itself never sort-merges or shuffle-hash-joins anything
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastNestedLoopJoin BuildRight") >= 2
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan


def test_session3_operator_plan_shapes(t):
    """Round-5 session-3 operators: no cartesian anywhere, pruned
    scans, and the deciles transform reuses ONE exchange for both
    the tile sort and the profile aggregation."""
    from flink_window_dgim_traffic_spark.operators import (
        analytics as AN,
    )
    from flink_window_dgim_traffic_spark.operators import graph as G
    from flink_window_dgim_traffic_spark.operators import (
        matching as MT,
    )

    ev = t("events")
    # value_deciles: the ntile window and the (key, tile) groupBy are
    # both partitioned by key -> a single exchange on the key
    df = AN.value_deciles(ev, 10)
    assert I.read_columns(df, "events") == {
        "event_id", "event_type", "value",
    }
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    # edit-distance join: equi-join on signatures, never a cartesian
    sup = t("supplier")
    df = MT.edit_distance_join(sup, "s_suppkey", "s_name", 1)
    assert not I.has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # pagerank rounds: keyed joins + aggregations only
    df = G.pagerank_fixed(G.cowindow_user_edges(ev, 600), iters=2)
    assert not I.has_cartesian(df)
    # seasonal anomaly: baseline table joins back BROADCAST
    df = W.seasonal_anomaly(ev, 60, 3600, 3, 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert not I.has_cartesian(df)
    assert I.read_columns(df, "events") == {"event_type", "ts"}


def test_session4_operator_plan_shapes(t):
    """Session-4 operators: TWAP's lead window and its (key, window)
    groupBy share ONE hash exchange on the key; dq_checks is a single
    scan with no join; max_concurrency reads only the two interval
    bound columns past its first aggregation."""
    import pyspark.sql.functions as F

    ev = t("events")
    # time_weighted_avg: groupBy(user_id, we_us) is satisfied by the
    # lead window's HashPartitioning(user_id) -> single exchange
    df = W.time_weighted_avg(ev, 1800)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert I.read_columns(df, "events") == {
        "event_id", "ts", "user_id", "value",
    }
    # dq_checks: one scan, every constraint an aggregate, no joins
    df = R.dq_checks(
        ev,
        not_null=["event_id", "ts"],
        unique=["event_id"],
        ranges={"value": (0.0, 250.0)},
    )
    assert not I.has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # max_concurrency: deltas reduce in a keyed agg, the running sum
    # is SHARDED (partitioned by _shard) — the only SinglePartition
    # exchange in the plan is the |shards|-row prefix table, never
    # the data-proportional instant series
    iv = ev.groupBy("user_id").agg(
        F.min("ts").alias("start_ts"),
        (F.max("ts") + F.expr("INTERVAL 60 SECONDS")).alias("end_ts"),
    )
    df = W.max_concurrency(iv, bucket_sec=600)
    assert not I.has_cartesian(df)
    assert I.read_columns(df, "events") == {"user_id", "ts"}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(_shard" in plan
    assert plan.count("Exchange SinglePartition") == 1


def test_round6_operator_plan_shapes(t):
    """winsorized_stats (r7 rewrite): raw rows cross exactly ONE
    aggregation — no per-key all-rows rank window (the r6 shape's
    2.0×-at-10× driver); every window is partitioned and runs over
    the distinct-pair/shard tables; id_col is no longer even read.
    cdc_apply is one exchange (the max-by window) with no join."""
    import pyspark.sql.functions as F

    ev = t("events")
    from flink_window_dgim_traffic_spark.operators.analytics import (
        winsorized_stats,
    )
    df = winsorized_stats(ev)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the only SinglePartition funnels are textual copies of the
    # 1-row min/max scalar over the checkpointed pair table; the
    # per-row rank window is gone
    assert plan.count("Exchange SinglePartition") <= 4
    assert "row_number" not in plan
    # column pruning is structural now (base selects only key+value
    # before the checkpoint pin, so the scan behind the pin reads 2
    # columns; the pin itself hides the parquet scan from this plan)

    from flink_window_dgim_traffic_spark.operators.relational import (
        cdc_apply,
    )
    log = ev.select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "value",
    )
    df = cdc_apply(log, ["user_id"], ["us", "event_id"])
    assert not I.has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_asof_nearest_single_exchange(t):
    """direction='nearest' runs BOTH directional sweeps over the
    same by-hash partitioning: ONE exchange (plus sorts), no join."""
    import pyspark.sql.functions as F

    from flink_window_dgim_traffic_spark.operators.relational import (
        asof_join,
    )

    ev = t("events")
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    df = asof_join(
        buys, views, on="us", by=["user_id"],
        right_cols=["event_id"], direction="nearest",
        tiebreak="event_id",
    )
    assert not I.has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert plan.count("Exchange") == 1


def test_round7_rfm_no_global_ntile(t):
    """rfm_segments (VERDICT r6 #1, r8 single-pass form): the three
    global single-task ntile sorts are gone — tiling runs through ONE
    grouped _dist_ntile pass over the unpivoted (user, metric, value)
    table.  Pin: no ntile in the plan, the rank windows are hash-
    partitioned on (metric name, _s1 shard), and NO SinglePartition
    exchange exists at all — with part_cols even the min/max and
    shard-prefix windows are per-metric-partitioned."""
    from flink_window_dgim_traffic_spark.operators.analytics import (
        rfm_segments,
    )

    df = rfm_segments(t("events"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile" not in plan
    # the data-proportional rank windows are partitioned on
    # (metric, shard)
    assert "hashpartitioning(_m" in plan
    assert "Exchange SinglePartition" not in plan


def test_round7_join_hotspots_takeordered(t):
    """join_hotspots (VERDICT r6 #2): top-k by fanout is
    TakeOrderedAndProject (per-partition heads + k-row merge), not a
    global row_number over every distinct key; the remaining
    unpartitioned window ranks only the <= k survivors."""
    ev = t("events")
    df = R.join_hotspots(ev, ev, ["user_id"], 20)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert not I.has_cartesian(df)


def test_round7_new_op_plan_shapes(t):
    """window_dedup is an aggregation (no Window operator at all);
    window_join is a plain equi-join on (key, slot) with no
    cartesian; ts_pattern_topk's top-k is TakeOrderedAndProject;
    global_quantiles funnels at most the 1-row scalar."""
    import pyspark.sql.functions as F

    from flink_window_dgim_traffic_spark.operators.analytics import (
        global_quantiles,
        ts_pattern_topk,
    )

    ev = t("events")
    df = W.window_dedup(ev, 600)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Exchange SinglePartition" not in plan

    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    df = W.window_join(views, buys, 600)
    assert not I.has_cartesian(df)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan
    # the pushed filter reaches both scans
    assert "event_type" in I.pushed_filter_columns(df, "events")

    df = ts_pattern_topk(ev)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    df = global_quantiles(ev)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # every SinglePartition is a bounded branch copy: the 1-row
    # min/max scalar, the 1-row total, or the <=256-row shard prefix
    # (re-printed per plan branch over the checkpointed pair table);
    # none sees raw-row cardinality
    assert plan.count("Exchange SinglePartition") <= 6
    assert "row_number" not in plan


def test_sql_window_dedup_join_twins_equal_dataframe(spark, sf_dir):
    """The Flink-verbatim SQL statements for Window Dedup / Window
    Join return exactly the DataFrame operators' rows."""
    import pyspark.sql.functions as F

    from flink_window_dgim_traffic_spark.operators import (
        sql_surface as Q,
    )
    from flink_window_dgim_traffic_spark.session import table

    ev = table(spark, sf_dir, "events")
    assert sorted(
        map(tuple, Q.sql_window_dedup(spark, sf_dir).collect())
    ) == sorted(map(tuple, W.window_dedup(ev, 600).collect()))
    assert sorted(
        map(tuple, Q.sql_window_join(spark, sf_dir).collect())
    ) == sorted(
        map(
            tuple,
            W.window_join(
                ev.filter(F.col("event_type") == "view"),
                ev.filter(F.col("event_type") == "purchase"),
                600,
            ).collect(),
        )
    )
    # r8: the EXISTS / NOT EXISTS Flink-verbatim forms equal the
    # DataFrame semi/anti modes (Catalyst rewrites the existential
    # subquery to the same LeftSemi/LeftAnti join)
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    assert sorted(
        map(tuple, Q.sql_window_semijoin(spark, sf_dir).collect())
    ) == sorted(
        map(
            tuple,
            W.window_join(views, buys, 600, how="left_semi").collect(),
        )
    )
    assert sorted(
        map(tuple, Q.sql_window_antijoin(spark, sf_dir).collect())
    ) == sorted(
        map(
            tuple,
            W.window_join(views, buys, 600, how="left_anti").collect(),
        )
    )
    # plan shape: the EXISTS forms plan existential joins, not
    # aggregates or cartesians
    semi_plan = (
        Q.sql_window_semijoin(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    anti_plan = (
        Q.sql_window_antijoin(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in semi_plan
    assert "LeftAnti" in anti_plan
    # r8: the one-statement HOP / CUMULATE join SQL equals the
    # DataFrame modes (the explode is the same map-side slot math)
    assert sorted(
        map(tuple, Q.sql_window_hop_join(spark, sf_dir).collect())
    ) == sorted(
        map(
            tuple,
            W.window_join(views, buys, 600, slide_sec=300).collect(),
        )
    )
    assert sorted(
        map(tuple, Q.sql_window_cumulate_join(spark, sf_dir).collect())
    ) == sorted(
        map(
            tuple,
            W.window_join(
                views, buys, 600, cumulate_step_sec=300
            ).collect(),
        )
    )


def test_round8_media_pixel_ops_map_only(t):
    """The decode-path media ops are MAP-ONLY end to end: encode,
    decode, and aggregation all happen inside one mapInPandas — the
    plan contains NO exchange of any kind (at 100 TB nothing but
    doc-sized stat rows would ever move, and they move nowhere)."""
    from flink_window_dgim_traffic_spark.operators import (
        multimodal as MM,
    )

    docs = t("documents")
    for op in (MM.media_pixel_stats, MM.media_pixel_resize_stats):
        plan = (
            op(docs)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan, op.__name__
        assert "MapInPandas" in plan, op.__name__


def test_round8_media_ahash_blobs_never_shuffle(t):
    """media_ahash_pairs: the decode stage ends at a localCheckpoint
    pin of (doc_id, hash_lo, hash_hi, chunk) rows — binary payloads
    never reach a join or an exchange.  Above the pin the candidate
    join is a hash equi-join (broadcast at this size; co-partitioned
    on the pinned (chunk_no, chunk) keys at scale) — never a
    cartesian/nested-loop — and the only shuffle is the dedup
    aggregate over fingerprint-sized rows."""
    from flink_window_dgim_traffic_spark.operators import (
        multimodal as MM,
    )

    plan = (
        MM.media_ahash_pairs(t("documents"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join reads the pinned chunk table, not the blob pipeline
    assert "Scan ExistingRDD" in plan
    assert "payload" not in plan  # blobs live only below the pin
    # at most the dedup aggregate's exchange above the pin
    assert plan.count("Exchange hashpartitioning") <= 1


def test_round8_cumulate_join_no_cartesian(t):
    """Cumulate-mode window join: constant per-row explode then one
    (key, slot) equi-join — never a cartesian/nested-loop plan."""
    import pyspark.sql.functions as F

    ev = t("events")
    views = ev.filter(F.col("event_type") == "view")
    buys = ev.filter(F.col("event_type") == "purchase")
    plan = (
        W.window_join(views, buys, 600, cumulate_step_sec=300)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan


def test_media_audio_stats_map_only(t):
    """The audio decode pipeline must plan ZERO exchanges — encode,
    decode, and per-doc aggregation all happen inside map-side
    mapInPandas stages (the 100 TB media-ingest shape: blobs never
    shuffle)."""
    from flink_window_dgim_traffic_spark.operators import (
        multimodal as M,
    )

    df = M.media_audio_stats(t("documents"))
    assert I.exchange_count(df) == 0
    assert I.read_columns(df, "documents") == {"doc_id"}
    df2 = M.media_audio_resample_stats(t("documents"))
    assert I.exchange_count(df2) == 0


def test_dgim_bound_single_shuffle(t):
    """hop/cumulate bound queries: one aggregation shuffle each (the
    window fan-out is a map-side explode, never an extra exchange),
    and only (event_id, ts) read."""
    for df in (
        W.hop_dgim_bound(t("events"), 60, 10),
        W.cumulate_dgim_bound(t("events"), 60, 10),
    ):
        assert I.exchange_count(df) == 1
        assert I.read_columns(df, "events") == {"event_id", "ts"}


def test_media_png_stats_map_only(t):
    """PNG encode → decode → aggregate must stay a zero-shuffle
    map-only pipeline (one row out per row in; any exchange here
    would ship blobs)."""
    from flink_window_dgim_traffic_spark.operators import (
        multimodal as M,
    )

    df = M.media_png_stats(t("documents"))
    assert I.exchange_count(df) == 0
    assert not I.has_cartesian(df)


def test_minhash_md5_signature_single_shuffle(t):
    """The md5-family signature aggregate: staged h1/h2 projection
    feeding ONE partial-aggregated shuffle on doc_id — the wide
    64-min aggregate must not add exchanges over the xxhash64 twin."""
    for fam in ("xxhash64", "md5"):
        df = D._minhash_wide(t("documents"), hash_family=fam)
        assert I.exchange_count(df) == 1, fam


def test_int_plane_lsh_no_cartesian_and_pruned_verify(t):
    """Integer-plane sign-LSH: bucket candidates + verify joins — no
    cartesian anywhere, and the embeddings scan reads only the two
    columns the pipeline needs."""
    df = S.embedding_neardup_lsh(
        t("embeddings"), 0.4, int_planes=True, n_planes=8
    )
    assert not I.has_cartesian(df)
    assert I.read_columns(df, "embeddings") <= {"vec_id", "embedding"}


def test_compression_bound_map_only(t):
    from flink_window_dgim_traffic_spark.operators import quality as QL

    df = QL.compression_ratio_bound(t("documents"))
    assert I.exchange_count(df) == 0


def test_table_profile_approx_bound_split_agg(t):
    """r11 plan regression: the approx-bound profile must plan the
    exact-distinct aggregation and the HLL aggregation as SEPARATE
    single-row subtrees joined at the end.  Planning them together
    puts the HLL/min-max aggregates under the multi-distinct EXPAND
    (one expanded row per distinct column per input row) — measured
    42x slower at sf0.1.  Pinned: the physical plan carries a
    nested-loop/cartesian join of two aggregates (single-row sides),
    and no Expand node computes approx_count_distinct.  r12: the
    exact side's co-planned count_distincts were split into per-column
    single-distinct aggregations, so the plan now carries NO Expand at
    all — each distinct count is an Expand-free two-level hash
    aggregate over its own pruned column (same pin for the exact
    ``table_profile``)."""
    for df in (
        R.table_profile_approx_bound(t("events")),
        R.table_profile(t("events")),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert (
            "BroadcastNestedLoopJoin" in plan or "CartesianProduct" in plan
        ), plan[:2000]
        assert "Expand [[" not in plan, plan[:2000]


# ---------------------------------------------------------------------------
# r12 (VERDICT r11 ask #4): the unpartitioned-WindowExec audit.
# Exactly 13 operators plan a global (no PARTITION BY) window; each is
# bounded BY DESIGN before the window — the table below carries the
# bound, and the test asserts a structural WITNESS for it inside every
# global window's input subtree, so a refactor that silently grows an
# unbounded global sort fails here instead of at 100 TB.
#
#   rank-over-limit: the window ranks the <= k survivors of an
#     orderBy().limit(k) planned as TakeOrderedAndProject (per-
#     partition heads + one k-row merge, never a global sort).
#   bucket/series table: the window runs over a keyed aggregate whose
#     key domain is small by construction (time buckets, <= 256 shard
#     offsets, distinct frequencies, the 1e6-bounded score codomain).
#
# stream_late_audit (the 13th site) replays lateness_rows inside
# foreachBatch — same sharded-prefix shape as late_data_audit below;
# it is side-effecting so the batch twin carries its pin.
_GLOBAL_WINDOW_AUDIT = {
    # rank over <= k survivors (TakeOrderedAndProject below)
    "hybrid_rrf_topk": [r"TakeOrderedAndProject|GlobalLimit"],
    "ts_pattern_topk": [r"TakeOrderedAndProject|GlobalLimit"],
    "corpus_weighted_sample": [r"TakeOrderedAndProject|GlobalLimit"],
    # kmeans: the per-round localCheckpoint truncates the seed
    # lineage out of the default plan, so the audit constructs
    # rounds=0 (identical seed subplan, no checkpoint) — see below
    "kmeans_quantized": [r"TakeOrderedAndProject|GlobalLimit"],
    "join_hotspots": [r"TakeOrderedAndProject|GlobalLimit"],
    # series table: one row per tumbling window of span
    "ewma_anomaly": [r"Keys \[\d+\]: \[window"],
    # gap_fill: the LOCF window's input is the dense grid exploded
    # from a ONE-ROW min/max aggregate (sequence step = window size);
    # the groupBy(we_sec) agg itself is behind a localCheckpoint, so
    # the grid generator is the in-plan witness
    "gap_fill_60s": [r"explode\(sequence\("],
    # sharded prefix sum: global window over the <= |span/shard|-row
    # (late audit, concurrency) or <= 256-row (quantiles) shard table
    "late_data_audit": [r"Keys \[\d+\]: \[_shard"],
    "max_concurrent_users": [r"Keys \[\d+\]: \[_shard"],
    "global_value_quantiles": [r"Keys \[\d+\]: \[_s1"],
    # count-of-counts table: <= |distinct frequencies| rows
    "skew_report": [r"Keys \[\d+\]: \[cnt"],
    # distinct-score buckets: <= 1e6 rows (score codomain)
    "token_budget_select": [r"Keys \[\d+\]: \[q_e6"],
}


def test_global_windows_all_carry_bound_witness(spark, sf_dir):
    """Every unpartitioned Window in each audited query's physical
    plan must have a bound witness in its input subtree; and no
    OTHER query-level operator in the audit table may have lost its
    global window silently (witness count >= 1 keeps the table
    honest if a rewrite removes the window altogether, which would
    be fine but should prune the table entry)."""
    import __spark_entry__ as entry

    from flink_window_dgim_traffic_spark.session import table

    qs = entry.queries()
    overrides = {
        # rounds=0 keeps the seed TakeOrderedAndProject + rank window
        # in the plan (each Lloyd round localCheckpoints, which would
        # truncate the seed lineage away)
        "kmeans_quantized": lambda s, d: S.kmeans_quantized(
            table(s, d, "embeddings"), rounds=0
        ),
    }
    failures = []
    for name, patterns in _GLOBAL_WINDOW_AUDIT.items():
        df = overrides.get(name, qs[name])(spark, sf_dir)
        subs = I.global_window_subtrees(df)
        if not subs:
            failures.append(f"{name}: no global window found (prune entry?)")
            continue
        import re as _re

        for j, sub in enumerate(subs):
            if not any(_re.search(p, sub) for p in patterns):
                failures.append(
                    f"{name}: global window #{j} lacks bound witness "
                    f"{patterns} in input subtree:\n"
                    + sub[:800]
                )
    assert not failures, "\n\n".join(failures)
