"""window_joins registry: window joins, as-of joins, sessionization, funnels.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403



def _asof_generic(s: SparkSession, d: str) -> DataFrame:
    """The GENERIC as-of join operator (relational.asof_join) on the
    purchases←views pairing, attaching the matched view's event_id
    (tiebreak-deterministic)."""
    ev = _events(s, d)
    buys = ev.filter(F.col("event_type") == "purchase")
    views = ev.filter(F.col("event_type") == "view")
    return R.asof_join(
        buys,
        views,
        on="ts",
        by=["user_id"],
        right_cols=["event_id"],
        tiebreak="event_id",
    ).select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss").alias("asof_ts"),
        "asof_event_id",
    )



def _range_first_hour(s: SparkSession, d: str) -> DataFrame:
    """The GENERIC range join (relational.range_join): per-user count
    of events inside [first event, first event + 1 h)."""
    ev = _events(s, d)
    first = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    return (
        R.range_join(
            ev, first, on="ts", start="start_ts", end="end_ts",
            by=["user_id"],
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_first_hour"))
    )



def _asof_nearest_views(s: SparkSession, d: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas merge_asof parity):
    every purchase paired with the user's closest view in EITHER
    time direction (equal distance prefers backward).  Epoch-µs
    columns end to end; the oracle mirrors the two-direction union
    sweep with IGNORE NULLS window carries."""
    ev = _events(s, d).select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        "event_type",
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "us", "event_id"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "us", "event_id"
    )
    return R.asof_join(
        buys,
        views,
        on="us",
        by=["user_id"],
        right_cols=["event_id"],
        direction="nearest",
        tiebreak="event_id",
    ).select("user_id", "us", "event_id", "asof_us", "asof_event_id")


def queries():
    return {
        # window-join TVF completion
        # (cumulate mode + semi + Flink-verbatim SQL semi/anti) ----
        "window_cumulate_join_views_buys": lambda s, d: W.window_join(
            _events(s, d).filter(F.col("event_type") == "view"),
            _events(s, d).filter(F.col("event_type") == "purchase"),
            600,
            cumulate_step_sec=300,
        ),
        "window_semijoin_views": lambda s, d: W.window_join(
            _events(s, d).filter(F.col("event_type") == "view"),
            _events(s, d).filter(F.col("event_type") == "purchase"),
            600,
            how="left_semi",
        ),
        "sql_window_semijoin": lambda s, d: Q.sql_window_semijoin(s, d),
        "sql_window_antijoin": lambda s, d: Q.sql_window_antijoin(s, d),
        # one-statement HOP / CUMULATE window-join SQL (Spark lacks
        # the TVFs; the statements plan the same map-side slot
        # explode the DataFrame operator does — twin-equality pinned)
        "sql_window_hop_join": lambda s, d: Q.sql_window_hop_join(s, d),
        "sql_window_cumulate_join": lambda s, d: (
            Q.sql_window_cumulate_join(s, d)
        ),
        "join_hotspots": lambda s, d: R.join_hotspots(
            _events(s, d), _events(s, d), ["user_id"], 20
        ),
        # Flink window-TVF family completion: Window Deduplication +
        # Window Join (inner and anti modes)
        "window_dedup_first": lambda s, d: W.window_dedup(
            _events(s, d), 600
        ),
        "window_join_views_buys": lambda s, d: W.window_join(
            _events(s, d).filter(F.col("event_type") == "view"),
            _events(s, d).filter(F.col("event_type") == "purchase"),
            600,
        ),
        "window_hop_join_views_buys": lambda s, d: W.window_join(
            _events(s, d).filter(F.col("event_type") == "view"),
            _events(s, d).filter(F.col("event_type") == "purchase"),
            600,
            slide_sec=300,
        ),
        "window_antijoin_views": lambda s, d: W.window_join(
            _events(s, d).filter(F.col("event_type") == "view"),
            _events(s, d).filter(F.col("event_type") == "purchase"),
            600,
            how="left_anti",
        ),
        # Flink-verbatim SQL statements for the new window ops
        # (plan twins of window_dedup_first / window_join_views_buys)
        "sql_window_dedup": lambda s, d: Q.sql_window_dedup(s, d),
        "sql_window_join": lambda s, d: Q.sql_window_join(s, d),
        "asof_nearest_views": _asof_nearest_views,
        "conversion_latency": lambda s, d: AN.conversion_latency(
            _events(s, d)
        ),
        "attribution_touch": lambda s, d: AN.attribution_touch(
            _events(s, d)
        ),
        "session_paths": lambda s, d: AN.session_paths(_events(s, d)),
        "asof_generic": lambda s, d: _asof_generic(s, d),
        "range_join_first_hour": lambda s, d: _range_first_hour(s, d),
        "event_funnel": lambda s, d: R.event_funnel(_events(s, d)),
        "user_retention_cohorts": lambda s, d: R.user_retention_cohorts(
            _events(s, d)
        ),
        "asof_view_before_purchase": lambda s, d: R.asof_view_before_purchase(
            _events(s, d)
        ),
        "sessionize": lambda s, d: R.sessionize(_events(s, d)),
    }


def oracles():
    out = {
        # Nearest as-of: mirror the two-direction union sweep — the
        # backward/forward carries are IGNORE-NULLS window last_value
        # over (us, tag, tiebreak) orders identical to the Spark
        # windows; closer match wins, equal distance prefers backward.
        "asof_nearest_views": """
WITH p AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events
           WHERE event_type = 'purchase'),
v AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events
      WHERE event_type = 'view'),
u AS (SELECT user_id, us, event_id, 1 AS tag,
             NULL::BIGINT AS vus, NULL::BIGINT AS vid FROM p
      UNION ALL
      SELECT user_id, us, NULL, 0, us, event_id FROM v),
s AS (SELECT *,
  last_value(vus IGNORE NULLS) OVER (PARTITION BY user_id
    ORDER BY us, tag, vid ROWS UNBOUNDED PRECEDING) AS bus,
  last_value(vid IGNORE NULLS) OVER (PARTITION BY user_id
    ORDER BY us, tag, vid ROWS UNBOUNDED PRECEDING) AS bid,
  last_value(vus IGNORE NULLS) OVER (PARTITION BY user_id
    ORDER BY us DESC, tag, vid ROWS UNBOUNDED PRECEDING) AS fus,
  last_value(vid IGNORE NULLS) OVER (PARTITION BY user_id
    ORDER BY us DESC, tag, vid ROWS UNBOUNDED PRECEDING) AS fid
  FROM u)
SELECT user_id, us, event_id,
  CASE WHEN fus IS NULL OR (bus IS NOT NULL AND us - bus <= fus - us)
       THEN bus ELSE fus END AS asof_us,
  CASE WHEN fus IS NULL OR (bus IS NOT NULL AND us - bus <= fus - us)
       THEN bid ELSE fid END AS asof_event_id
FROM s WHERE tag = 1
""",
        # Flink Window Deduplication: rownum=1 per (window, key)
        # under (ts, event_id) — integer-µs window slots
        "window_dedup_first": """
WITH t AS (
  SELECT *, epoch_us(ts) // 600000000 AS wslot,
         row_number() OVER (
           PARTITION BY epoch_us(ts) // 600000000, user_id
           ORDER BY epoch_us(ts), event_id) AS rn
  FROM events)
SELECT strftime(make_timestamp((wslot + 1) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, event_id, event_type, value
FROM t WHERE rn = 1
""",
        # Flink Window Join (inner): same tumbling window, same user
        "window_join_views_buys": """
WITH l AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot,
                  event_id AS l_event_id
           FROM events WHERE event_type = 'view'),
r AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot,
             event_id AS r_event_id
      FROM events WHERE event_type = 'purchase')
SELECT strftime(make_timestamp((l.wslot + 1) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       l.user_id AS user_id, l_event_id, r_event_id
FROM l JOIN r ON l.user_id = r.user_id AND l.wslot = r.wslot
""",
        # SQL-surface twins share the DataFrame ops' oracles
        "sql_window_dedup": """
WITH t AS (
  SELECT *, epoch_us(ts) // 600000000 AS wslot,
         row_number() OVER (
           PARTITION BY epoch_us(ts) // 600000000, user_id
           ORDER BY epoch_us(ts), event_id) AS rn
  FROM events)
SELECT strftime(make_timestamp((wslot + 1) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, event_id, event_type, value
FROM t WHERE rn = 1
""",
        "sql_window_join": """
WITH l AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot,
                  event_id AS l_event_id
           FROM events WHERE event_type = 'view'),
r AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot,
             event_id AS r_event_id
      FROM events WHERE event_type = 'purchase')
SELECT strftime(make_timestamp((l.wslot + 1) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       l.user_id AS user_id, l_event_id, r_event_id
FROM l JOIN r ON l.user_id = r.user_id AND l.wslot = r.wslot
""",
        # HOP-window join: constant per-row pane explode before the
        # same (user, slot) equi-join
        "window_hop_join_views_buys": """
WITH l AS (SELECT user_id, epoch_us(ts) // 300000000 AS pane,
                  event_id AS l_event_id
           FROM events WHERE event_type = 'view'),
le AS (SELECT user_id, l_event_id,
              unnest(generate_series(pane - 1, pane)) AS wslot
       FROM l),
r AS (SELECT user_id, epoch_us(ts) // 300000000 AS pane,
             event_id AS r_event_id
      FROM events WHERE event_type = 'purchase'),
re AS (SELECT user_id, r_event_id,
              unnest(generate_series(pane - 1, pane)) AS wslot
       FROM r)
SELECT strftime(make_timestamp(wslot * 300000000 + 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, l_event_id, r_event_id
FROM le JOIN re USING (user_id, wslot)
""",
        # Flink Window Join (anti): views with NO purchase partner in
        # their window — the abandoned-browse shape
        "window_antijoin_views": """
WITH l AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot,
                  event_id AS l_event_id
           FROM events WHERE event_type = 'view'),
r AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot
      FROM events WHERE event_type = 'purchase')
SELECT strftime(make_timestamp((l.wslot + 1) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, l_event_id
FROM l ANTI JOIN r USING (user_id, wslot)
""",
        # CUMULATE-window join: each row explodes into the ENDS of
        # every cumulative window of its 600s span that covers it
        # (step 300s); the end is the join slot
        "window_cumulate_join_views_buys": """
WITH l0 AS (SELECT user_id, event_id AS l_event_id,
                   epoch_us(ts) AS us,
                   epoch_us(ts) // 600000000 * 600000000 AS ws
            FROM events WHERE event_type = 'view'),
le AS (SELECT user_id, l_event_id,
              unnest(generate_series(
                ws + ((us - ws) // 300000000 + 1) * 300000000,
                ws + 600000000, 300000000)) AS wslot
       FROM l0),
r0 AS (SELECT user_id, event_id AS r_event_id,
              epoch_us(ts) AS us,
              epoch_us(ts) // 600000000 * 600000000 AS ws
       FROM events WHERE event_type = 'purchase'),
re AS (SELECT user_id, r_event_id,
              unnest(generate_series(
                ws + ((us - ws) // 300000000 + 1) * 300000000,
                ws + 600000000, 300000000)) AS wslot
       FROM r0)
SELECT strftime(make_timestamp(wslot),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, l_event_id, r_event_id
FROM le JOIN re USING (user_id, wslot)
""",
        # Flink Window Join (semi): views WITH a purchase partner in
        # their window
        "window_semijoin_views": """
WITH l AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot,
                  event_id AS l_event_id
           FROM events WHERE event_type = 'view'),
r AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot
      FROM events WHERE event_type = 'purchase')
SELECT strftime(make_timestamp((l.wslot + 1) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, l_event_id
FROM l SEMI JOIN r USING (user_id, wslot)
""",
        # SQL-surface hop/cumulate twins share the DataFrame oracles
        "sql_window_hop_join": """
WITH l AS (SELECT user_id, epoch_us(ts) // 300000000 AS pane,
                  event_id AS l_event_id
           FROM events WHERE event_type = 'view'),
le AS (SELECT user_id, l_event_id,
              unnest(generate_series(pane - 1, pane)) AS wslot
       FROM l),
r AS (SELECT user_id, epoch_us(ts) // 300000000 AS pane,
             event_id AS r_event_id
      FROM events WHERE event_type = 'purchase'),
re AS (SELECT user_id, r_event_id,
              unnest(generate_series(pane - 1, pane)) AS wslot
       FROM r)
SELECT strftime(make_timestamp(wslot * 300000000 + 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, l_event_id, r_event_id
FROM le JOIN re USING (user_id, wslot)
""",
        "sql_window_cumulate_join": """
WITH l0 AS (SELECT user_id, event_id AS l_event_id,
                   epoch_us(ts) AS us,
                   epoch_us(ts) // 600000000 * 600000000 AS ws
            FROM events WHERE event_type = 'view'),
le AS (SELECT user_id, l_event_id,
              unnest(generate_series(
                ws + ((us - ws) // 300000000 + 1) * 300000000,
                ws + 600000000, 300000000)) AS wslot
       FROM l0),
r0 AS (SELECT user_id, event_id AS r_event_id,
              epoch_us(ts) AS us,
              epoch_us(ts) // 600000000 * 600000000 AS ws
       FROM events WHERE event_type = 'purchase'),
re AS (SELECT user_id, r_event_id,
              unnest(generate_series(
                ws + ((us - ws) // 300000000 + 1) * 300000000,
                ws + 600000000, 300000000)) AS wslot
       FROM r0)
SELECT strftime(make_timestamp(wslot),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, l_event_id, r_event_id
FROM le JOIN re USING (user_id, wslot)
""",
        # SQL-surface semi/anti twins share the DataFrame oracles
        "sql_window_semijoin": """
WITH l AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot,
                  event_id AS l_event_id
           FROM events WHERE event_type = 'view'),
r AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot
      FROM events WHERE event_type = 'purchase')
SELECT strftime(make_timestamp((l.wslot + 1) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, l_event_id
FROM l SEMI JOIN r USING (user_id, wslot)
""",
        "sql_window_antijoin": """
WITH l AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot,
                  event_id AS l_event_id
           FROM events WHERE event_type = 'view'),
r AS (SELECT user_id, epoch_us(ts) // 600000000 AS wslot
      FROM events WHERE event_type = 'purchase')
SELECT strftime(make_timestamp((l.wslot + 1) * 600000000),
                '%Y-%m-%d %H:%M:%S') AS window_end,
       user_id, l_event_id
FROM l ANTI JOIN r USING (user_id, wslot)
""",
        # count-table join + top-k by fan-out product — the join
        # skew advisor (prospective self-join on user_id)
        "join_hotspots": """
WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1),
j AS (SELECT user_id, n AS n_left, n AS n_right,
             CAST(n * n AS BIGINT) AS fanout FROM c),
r AS (SELECT *, row_number() OVER
        (ORDER BY fanout DESC, user_id ASC) AS rnk FROM j)
SELECT user_id, n_left, n_right, fanout, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 20
""",
        # Time-to-convert histogram: integer-microsecond latencies
        # from one preceding-rows window sweep; bucket -1 =
        # unattributed.
        "conversion_latency": """
WITH w AS (SELECT event_type, epoch_us(ts) AS us,
    last_value(CASE WHEN event_type = 'view' THEN epoch_us(ts) END
               IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      AS from_us
  FROM events),
c AS (SELECT us, from_us FROM w WHERE event_type = 'purchase')
SELECT CAST(CASE WHEN from_us IS NULL THEN -1
            ELSE floor((us - from_us)/600000000.0) END AS BIGINT)
         AS bucket,
       count(*) AS n_conversions,
       CAST(coalesce(sum(us - from_us), 0) AS BIGINT)
         AS sum_latency_us
FROM c GROUP BY 1
""",
        # Top session navigation paths: gap sessionization (lag +
        # running sum), first-5 steps concatenated in (us, event_id)
        # order.
        "session_paths": """
WITH o AS (SELECT user_id, ts, event_id, event_type, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS pus
           FROM events),
s AS (SELECT *, sum(CASE WHEN pus IS NULL
                          OR us - pus > 14400000000 THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM o),
r AS (SELECT *, row_number() OVER
        (PARTITION BY user_id, sess_id ORDER BY ts, event_id) AS rn,
        count(*) OVER (PARTITION BY user_id, sess_id) AS sess_len
      FROM s),
p AS (SELECT user_id, sess_id,
        string_agg(event_type, '>' ORDER BY us, event_id) AS path,
        max(sess_len) AS sess_len
      FROM r WHERE rn <= 5 GROUP BY 1, 2)
SELECT path, count(*) AS n_sessions,
       CAST(sum(sess_len) AS BIGINT) AS n_events
FROM p GROUP BY 1
""",
        # First/last-touch attribution: one preceding-rows window
        # sweep, conversions credited per channel.
        "attribution_touch": """
WITH w AS (SELECT event_type,
    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
               IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt,
    first_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                IGNORE NULLS)
      OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ft
  FROM events),
p AS (SELECT coalesce(lt, 'direct') AS cl, coalesce(ft, 'direct') AS cf
      FROM w WHERE event_type = 'purchase'),
l AS (SELECT cl AS channel, count(*) AS n_last FROM p GROUP BY 1),
f AS (SELECT cf AS channel, count(*) AS n_first FROM p GROUP BY 1)
SELECT channel,
       CAST(coalesce(n_last, 0) AS BIGINT) AS n_last_touch,
       CAST(coalesce(n_first, 0) AS BIGINT) AS n_first_touch
FROM l FULL OUTER JOIN f USING (channel)
""",
        # Generic as-of join: latest prior-or-equal view per purchase,
        # tiebreak = largest event_id at the matched timestamp (the
        # lateral ORDER BY mirrors the operator's tie rule exactly).
        "asof_generic": """
SELECT p.event_id, p.user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS asof_ts,
       v.event_id AS asof_event_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN LATERAL (
  SELECT ts, event_id FROM events v
  WHERE v.event_type = 'view' AND v.user_id = p.user_id
    AND v.ts <= p.ts
  ORDER BY v.ts DESC, v.event_id DESC LIMIT 1) v ON true
""",
        # Exact media dedup: md5 of the binary payload (== utf-8 text
        # bytes in the deterministic stand-in blob), min-id per digest.
        # Generic range join: per-user events inside the hour after
        # their first event; oracle is the plain inequality join the
        # Spark side rewrites into a bucketed equi join.
        "range_join_first_hour": """
WITH f AS (SELECT user_id, min(ts) AS s FROM events GROUP BY 1)
SELECT e.user_id, count(*) AS n_first_hour
FROM events e JOIN f ON e.user_id = f.user_id
WHERE e.ts >= f.s AND e.ts < f.s + INTERVAL 1 HOUR
GROUP BY e.user_id
""",
        # Ordered-stage funnel: stage k counts users with a stage-k
        # event strictly after their (running-min) stage-k-1 time.
        "event_funnel": """
WITH o AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN us END)
         OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS s1 FROM o),
w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND s1 < us THEN us END)
         OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS s2 FROM w1),
w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND s2 < us THEN us END)
         OVER (PARTITION BY user_id ORDER BY us, event_id
               ROWS UNBOUNDED PRECEDING) AS s3 FROM w2),
u AS (SELECT user_id,
        max(CASE WHEN s1 IS NOT NULL THEN 1 ELSE 0 END) AS r1,
        max(CASE WHEN s2 IS NOT NULL THEN 1 ELSE 0 END) AS r2,
        max(CASE WHEN s3 IS NOT NULL THEN 1 ELSE 0 END) AS r3
      FROM w3 GROUP BY user_id)
SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
       CAST(sum(r1) AS BIGINT) AS n_users FROM u
UNION ALL SELECT 2, 'click', CAST(sum(r2) AS BIGINT) FROM u
UNION ALL SELECT 3, 'purchase', CAST(sum(r3) AS BIGINT) FROM u
""",
        "user_retention_cohorts": """
WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
           FROM events GROUP BY user_id),
a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM a JOIN f USING (user_id)
GROUP BY f.cohort_day, date_diff('day', cohort_day, day)
""",
        "sessionize": """
WITH o AS (SELECT user_id, event_id, ts, epoch_us(ts) AS us,
           lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events),
m AS (SELECT user_id, event_id, ts,
      CASE WHEN prev_us IS NULL OR us - prev_us > 14400000000 THEN 1 ELSE 0 END AS new_sess
      FROM o),
s AS (SELECT user_id, ts,
      CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      FROM m)
SELECT user_id, sess_id, count(*) AS n_events,
 strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
 strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM s GROUP BY user_id, sess_id
""",
        "asof_view_before_purchase": """
WITH vp AS (SELECT * FROM events WHERE event_type IN ('view', 'purchase'))
SELECT p.event_id, p.user_id,
 strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
 strftime((SELECT max(v.ts) FROM vp v
           WHERE v.user_id = p.user_id AND v.event_type = 'view'
             AND (v.ts < p.ts OR (v.ts = p.ts AND v.event_id <= p.event_id))),
          '%Y-%m-%d %H:%M:%S') AS last_view_ts
FROM vp p WHERE p.event_type = 'purchase'
""",
    }
    return out
