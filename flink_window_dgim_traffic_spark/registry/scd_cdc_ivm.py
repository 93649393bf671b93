"""scd_cdc_ivm registry: SCD2 history, CDC snapshots, incremental view maintenance.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403



def _scd2_with_deletes(s: SparkSession, d: str) -> DataFrame:
    """SCD2 build where 'error' events are CDC tombstones: they
    close the user's open version and leave the key without a
    current row until a later live event re-inserts it."""
    ev = _events(s, d).withColumn(
        "is_delete", F.col("event_type") == F.lit("error")
    )
    return R.scd2_build(
        ev,
        key=["user_id"],
        attrs=["event_type"],
        ts_col="ts",
        tiebreak="event_id",
        delete_col="is_delete",
    ).select(
        "user_id",
        "event_type",
        F.date_format(
            "valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("valid_from"),
        F.date_format(
            "valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("valid_to"),
        "is_current",
    )



def _scd2_user_state(s: SparkSession, d: str) -> DataFrame:
    """Type-2 dimension build over the events change log: each user's
    event_type observations collapse into versioned state rows with
    validity windows (relational.scd2_build)."""
    return R.scd2_build(
        _events(s, d),
        key=["user_id"],
        attrs=["event_type"],
        ts_col="ts",
        tiebreak="event_id",
    ).select(
        "user_id",
        "event_type",
        F.date_format(
            "valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("valid_from"),
        F.date_format(
            "valid_to", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("valid_to"),
        "is_current",
    )



def _scd2_point_in_time(s: SparkSession, d: str) -> DataFrame:
    """Temporal-lookup composition: build the SCD2 state dimension
    from each user's NON-purchase observations, then enrich every
    purchase with the version valid at purchase time
    (relational.scd2_lookup = as-of on valid_from, no join node)."""
    ev = _events(s, d)
    dim = R.scd2_build(
        ev.filter(F.col("event_type") != "purchase"),
        key=["user_id"],
        attrs=["event_type"],
        ts_col="ts",
        tiebreak="event_id",
    )
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    out = R.scd2_lookup(facts, dim, ["user_id"], "ts", ["event_type"])
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.col("asof_event_type").alias("state"),
        F.date_format(
            "asof_valid_from", "yyyy-MM-dd HH:mm:ss.SSSSSS"
        ).alias("state_since"),
    )



def _cdc_user_snapshot(s: SparkSession, d: str) -> DataFrame:
    """Changelog → snapshot compaction over the event stream read as
    CDC: per user the latest change wins ('error' events are delete
    tombstones), keys whose last change is a tombstone are absent —
    the batch MERGE / compacted-topic materialization."""
    ev = _events(s, d).select(
        "user_id",
        F.unix_micros("ts").alias("last_us"),
        F.col("event_id").alias("last_event_id"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "event_type",
        "value",
    )
    return R.cdc_apply(
        ev, ["user_id"], ["last_us", "last_event_id"], op_col="op"
    ).drop("op")



def _ivm_join_cdc(s: SparkSession, d: str) -> DataFrame:
    """Z-SET incremental join maintenance end to end (the DBSP
    multiplicity generalization — deletes as -1 deltas, no history
    rewrite): build the orders ⋈ lineitem view, RETRACT every
    'F'-status order in one delta batch, re-insert the even-keyed
    half in another, and digest the compacted view.  Oracle = the
    one-shot join over exactly the surviving orders: incremental
    retraction must be indistinguishable from never having ingested
    the deleted rows."""

    from flink_window_dgim_traffic_spark.operators import ivm as IV

    base = _mkdtemp(prefix="spark_graft_ivmz_")
    o = _orders(s, d).select("o_orderkey", "o_orderstatus")
    li = _lineitem(s, d).select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_returnflag",
        "l_quantity",
    )
    IV.build_join_view_zset(o, li, base, ["o_orderkey"])
    dead = o.filter(F.col("o_orderstatus") == "F")
    IV.refresh_join_view_zset(
        s, base,
        delta_left=dead.withColumn("_mult", F.lit(-1)),
        tag="retract",
    )
    IV.refresh_join_view_zset(
        s, base,
        delta_left=dead.filter(F.col("o_orderkey") % 2 == 0),
        tag="reinsert",
    )
    return (
        IV.read_join_view(s, base)
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
    )



def _ivm_join_orders(s: SparkSession, d: str) -> DataFrame:
    """Incremental JOIN view maintenance driven end to end: the
    orders ⋈ lineitem view is built from one-third of each side, then
    maintained through three asymmetric insert-only refreshes (both
    sides / left only / right only — the delta rule ΔL⋈R ∪ L⋈ΔR ∪
    ΔL⋈ΔR, committed via staged delta dirs + atomic markers), and the
    final materialized view is aggregated to a digest.  Oracle = the
    same digest over a plain one-shot join: multi-batch maintenance
    must be indistinguishable from never having been incremental."""

    from flink_window_dgim_traffic_spark.operators import ivm as IV

    base = _mkdtemp(prefix="spark_graft_ivm_")
    o = _orders(s, d).select("o_orderkey", "o_orderstatus")
    li = _lineitem(s, d).select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_returnflag",
        "l_quantity",
    )
    osp = [o.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    lsp = [li.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    IV.build_join_view(osp[0], lsp[0], base, ["o_orderkey"])
    IV.refresh_join_view(s, base, osp[1], lsp[1], tag="b1")
    IV.refresh_join_view(s, base, delta_left=osp[2], tag="b2")
    IV.refresh_join_view(s, base, delta_right=lsp[2], tag="b3")
    return (
        IV.read_join_view(s, base)
        .groupBy("o_orderstatus", "l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("l_quantity").cast("bigint"))
            .cast("bigint")
            .alias("sum_qty"),
        )
    )


def queries():
    return {
        "cdc_user_snapshot": _cdc_user_snapshot,
        "ivm_join_orders": _ivm_join_orders,
        "ivm_join_cdc": _ivm_join_cdc,
        "scd2_with_deletes": _scd2_with_deletes,
        "scd2_user_state": _scd2_user_state,
        "scd2_point_in_time": _scd2_point_in_time,
    }


def oracles():
    out = {
        # IVM contract: multi-batch maintenance of the join view is
        # indistinguishable from the one-shot join.
        "ivm_join_orders": ivm_digest_sql,
        # Z-set retraction contract: the maintained view after
        # delete/re-insert deltas == the one-shot join over exactly
        # the surviving orders.
        "ivm_join_cdc": """
SELECT o_orderstatus, l_returnflag, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderstatus <> 'F' OR o_orderkey % 2 = 0
GROUP BY 1, 2
""",
        # Latest-change-wins compaction; a key whose winning change
        # is the 'error' tombstone is absent from the snapshot.
        "cdc_user_snapshot": cdc_snapshot_sql,
        # tombstone rows ('error') join the change-collapse as a
        # distinct deleted state, claim a version slot (closing the
        # predecessor via the lead), then drop from the output
        "scd2_with_deletes": """
WITH c AS (SELECT user_id, ts, event_type, event_id,
                  (event_type = 'error') AS d FROM events),
m AS (SELECT *, lag(d) OVER w AS pd, lag(event_type) OVER w AS pa
      FROM c WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
f AS (SELECT user_id, ts, event_type, event_id, d FROM m
      WHERE pd IS NULL OR pd IS DISTINCT FROM d
         OR pa IS DISTINCT FROM event_type),
v AS (SELECT user_id, event_type, d, ts AS vf,
      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      FROM f)
SELECT user_id, event_type,
  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
  CAST(vt IS NULL AS BIGINT) AS is_current
FROM v WHERE NOT d
""",
        # SCD2 dimension build: per user, consecutive identical
        # event_type observations collapse; validity windows chain
        # via lead(); the open version is current.
        "scd2_user_state": """
WITH m AS (SELECT user_id, ts, event_type, event_id,
       lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         AS prev
       FROM events),
f AS (SELECT user_id, ts, event_type, event_id FROM m
      WHERE prev IS NULL OR prev IS DISTINCT FROM event_type),
v AS (SELECT user_id, event_type, ts AS vf,
      lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
      FROM f)
SELECT user_id, event_type,
  strftime(vf, '%Y-%m-%d %H:%M:%S.%f') AS valid_from,
  strftime(vt, '%Y-%m-%d %H:%M:%S.%f') AS valid_to,
  CAST(vt IS NULL AS BIGINT) AS is_current
FROM v
""",
        # Point-in-time SCD2 lookup: each purchase joined to the
        # non-purchase state version valid at its timestamp (lateral
        # latest-valid_from-at-or-before oracle).
        "scd2_point_in_time": """
WITH c AS (SELECT user_id, ts, event_type, event_id FROM events
           WHERE event_type <> 'purchase'),
m AS (SELECT *, lag(event_type)
        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM c),
f AS (SELECT user_id, ts AS vf, event_type FROM m
      WHERE prev IS NULL OR prev IS DISTINCT FROM event_type)
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       v.event_type AS state,
       strftime(v.vf, '%Y-%m-%d %H:%M:%S.%f') AS state_since
FROM (SELECT event_id, user_id, ts FROM events
      WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT event_type, vf FROM f
  WHERE f.user_id = p.user_id AND f.vf <= p.ts
  ORDER BY f.vf DESC LIMIT 1) v ON true
""",
    }
    return out
