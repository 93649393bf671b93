"""window_analytics registry: windowed dashboards: percentiles, anomalies, trends, downsampling.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403



def _user_day_intervals(s: SparkSession, d: str) -> DataFrame:
    """User-activity intervals for the sweep-line demo: per user per
    day, [first event, last event + 60 s) — the "session of the day"
    interval whose peak overlap is the concurrent-active-users
    capacity metric."""
    ev = _events(s, d)
    return ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(
        F.min("ts").alias("start_ts"),
        (F.max("ts") + F.expr("INTERVAL 60 SECONDS")).alias("end_ts"),
    )


def queries():
    return {
        "windowed_distinct_users_approx_bound": lambda s, d: (
            W.windowed_distinct_users_approx_bound(_events(s, d), 60)
        ),
        # changed this round (division-form shards) — keep well
        # inside the driver window
        "winsorized_value_stats": lambda s, d: AN.winsorized_stats(
            _events(s, d), lo_ppm=50_000, hi_ppm=950_000
        ),
        # exact GLOBAL order statistics without a global sort —
        # the sharded pair-table recipe, global flavor
        "global_value_quantiles": lambda s, d: AN.global_quantiles(
            _events(s, d)
        ),
        # distributed subsequence similarity search (sliding window
        # as GROUP BY, exact integer distances)
        "ts_pattern_topk": lambda s, d: AN.ts_pattern_topk(
            _events(s, d)
        ),
        "windowed_distinct_users_approx": lambda s, d: (
            W.windowed_distinct_users_approx(_events(s, d), 60)
        ),
        # ---- end never-verified rotation block ----
        # ---- round-6 additions ----
        "max_concurrent_users": lambda s, d: W.max_concurrency(
            _user_day_intervals(s, d), bucket_sec=600
        ),
        "daily_movers": lambda s, d: AN.daily_movers(_events(s, d)),
        "path_regex_match": lambda s, d: AN.path_regex_match(
            _events(s, d)
        ),
        "seasonal_anomaly": lambda s, d: W.seasonal_anomaly(
            _events(s, d), 60, 3600, 3, 2
        ),
        "sql_seasonal_anomaly": lambda s, d: Q.sql_seasonal_anomaly(
            s, d, 60, 3600
        ),
        "late_data_audit": lambda s, d: W.late_data_audit(
            _events(s, d).withColumn(
                "arrival_us",
                (
                    F.unix_micros(F.col("ts"))
                    + (F.col("event_id") % 10) * F.lit(30_000_000)
                ).cast("bigint"),
            ),
            "arrival_us",
            late_after_sec=60,
            size_sec=600,
        ),
        "windowed_percentiles": lambda s, d: W.windowed_percentiles(
            _events(s, d), 600
        ),
        # ---- r05-driver-green entries rotated past the 50-row window
        # this round to make room for the never-verified block above;
        # all keep their oracle_sql() twins for the local sweep ----
        "hop_topn": lambda s, d: W.hop_topn(_events(s, d), 60, 10, 3),
        "per_key_trend": lambda s, d: AN.per_key_trend(_events(s, d)),
        "profile_drift_psi": lambda s, d: AN.profile_drift(_events(s, d)),
        "m4_downsample_10min": lambda s, d: W.m4_downsample(
            _events(s, d), 600
        ),
        "gap_fill_60s": lambda s, d: W.gap_fill_tumble(_events(s, d), 60),
        "percentile_rank": lambda s, d: AN.percentile_rank(
            _events(s, d)
        ),
        "twap_user_30min": lambda s, d: W.time_weighted_avg(
            _events(s, d), 1800
        ),
        "value_deciles": lambda s, d: AN.value_deciles(
            _events(s, d), 10
        ),
        "lag_correlation": lambda s, d: AN.lag_correlation(
            _events(s, d), "view", "purchase", 60, 10
        ),
        # (media_neardup moved to the round-10 head block: md5 gram
        # family flipped it to oracle-hash-checked)
        # ---- round-4 additions ----
        "window_topn": lambda s, d: W.window_topn(_events(s, d), 60, 3),
        "sql_window_topn": lambda s, d: Q.sql_window_topn(s, d, 60, 3),
        "windowed_distinct_users": lambda s, d: W.windowed_distinct_users(
            _events(s, d), 60
        ),
        "ewma_anomaly": lambda s, d: W.ewma_anomaly(_events(s, d), 60),
        "anomaly_drilldown": lambda s, d: W.anomaly_drilldown(
            _events(s, d), 60
        ),
        # qvec serialized to CSV for the compare (array-typed cells
        # are not portable through the value-hash comparator)
        "window_anomalies": lambda s, d: W.window_anomalies(
            _events(s, d), 60
        ),
    }


def oracles():
    out = {
        "windowed_distinct_users_approx_bound": """
SELECT strftime(make_timestamp(
         (CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60)*1000000),
         '%Y-%m-%d %H:%M:%S') AS window_end,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*) AS n_rows, TRUE AS within_bound
FROM events
GROUP BY CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60
""",
        # Batch MATCH_RECOGNIZE: journey string (ordered char-per-
        # event) + RE2-subset regex; non-overlapping match count.
        "path_regex_match": """
WITH j AS (SELECT user_id, count(*) AS n_events,
            string_agg(substr(event_type, 1, 1), ''
                       ORDER BY epoch_us(ts), event_id) AS journey
           FROM events GROUP BY user_id)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(regexp_matches(journey, 'v(c|v)*p') AS BIGINT) AS matched,
       CAST(len(regexp_extract_all(journey, 'v(c|v)*p')) AS BIGINT)
         AS n_matches
FROM j
""",
        # Day-over-day movers: first observed day baselines vs 0.
        "daily_movers": """
WITH d AS (SELECT event_type AS key, strftime(ts, '%Y-%m-%d') AS day,
                  CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY 1, 2)
SELECT key, day, n,
       CAST(coalesce(lag(n) OVER (PARTITION BY key ORDER BY day), 0)
            AS BIGINT) AS prev_n,
       CAST(n - coalesce(lag(n) OVER (PARTITION BY key ORDER BY day), 0)
            AS BIGINT) AS delta
FROM d
""",
        # Rank-based winsorized mean in exact 1e-6 micro-units: both
        # cutoffs are observed values at integer ranks (no quantile
        # interpolation), the clamp + mean is all-integer floor-div.
        "winsorized_value_stats": """
WITH b AS (SELECT event_type AS key,
                  CAST(round(value * 1000000) AS BIGINT) AS v_e6,
                  event_id AS i FROM events),
r AS (SELECT key, v_e6,
             row_number() OVER (PARTITION BY key ORDER BY v_e6, i)
               AS rn,
             count(*) OVER (PARTITION BY key) AS n FROM b),
c AS (SELECT key, v_e6,
             max(CASE WHEN rn = greatest(1, n * 50000 // 1000000)
                 THEN v_e6 END) OVER (PARTITION BY key) AS lo_e6,
             max(CASE WHEN rn = least(n, n * 950000 // 1000000 + 1)
                 THEN v_e6 END) OVER (PARTITION BY key) AS hi_e6
      FROM r)
SELECT key, CAST(count(*) AS BIGINT) AS n,
       CAST(min(lo_e6) AS BIGINT) AS lo_e6,
       CAST(min(hi_e6) AS BIGINT) AS hi_e6,
       CAST(sum(greatest(lo_e6, least(hi_e6, v_e6))) // count(*)
            AS BIGINT) AS wins_mean_e6
FROM c GROUP BY key
""",
        # ---- round-5 session-4 additions ----
        # Sweep-line peak concurrency: per-instant net deltas, prefix
        # sum over distinct instants; a bucket's peak includes the
        # level carried in before its first change (level - net).
        "max_concurrent_users": """
WITH iv AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         min(epoch_us(ts)) AS s_us,
         max(epoch_us(ts)) + 60000000 AS e_us
  FROM events GROUP BY user_id, CAST(ts AS DATE)
), del AS (
  SELECT t_us, SUM(d) AS net FROM (
    SELECT s_us AS t_us, CAST(1 AS BIGINT) AS d FROM iv
    UNION ALL
    SELECT e_us AS t_us, CAST(-1 AS BIGINT) AS d FROM iv
  ) GROUP BY t_us
), lv AS (
  SELECT t_us, net,
         SUM(net) OVER (ORDER BY t_us
                        ROWS UNBOUNDED PRECEDING) AS level
  FROM del
), b AS (
  SELECT (t_us // 600000000 + 1) * 600000000 AS we_us,
         t_us, level, level - net AS carried
  FROM lv
)
SELECT strftime(make_timestamp(we_us), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       CAST(GREATEST(max(level), arg_min(carried, t_us)) AS BIGINT)
         AS max_concurrent,
       count(*) AS n_changes
FROM b GROUP BY we_us
""",
        # LOCF time-weighted average: each value holds until the
        # key's next observation or the window end; exact integer
        # centi-value x microsecond weights, HUGEINT // division.
        "twap_user_30min": """
WITH b AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(round(value * 100) AS BIGINT) AS v_c,
         (epoch_us(ts) // 1800000000 + 1) * 1800000000 AS we_us
  FROM events
), d AS (
  SELECT user_id, we_us, v_c,
         LEAST(COALESCE(LEAD(us) OVER (PARTITION BY user_id
                                       ORDER BY us, event_id),
                        we_us),
               we_us) - us AS dt_us
  FROM b
)
SELECT user_id,
       strftime(make_timestamp(we_us), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       CAST(SUM(CAST(v_c AS HUGEINT) * dt_us)
              // SUM(CAST(dt_us AS HUGEINT)) AS BIGINT) AS twa_c,
       CAST(SUM(dt_us) AS BIGINT) AS dur_us,
       count(*) AS n_rows
FROM d GROUP BY user_id, we_us
""",
        # subsequence similarity: same n·m contribution expansion,
        # same integer distances, rank-before-limit == top-k+rank
        "ts_pattern_topk": """
WITH s AS (SELECT user_id AS u,
                  CAST(round(value*1000000.0) AS BIGINT) AS v,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS idx
           FROM events),
p AS (SELECT * FROM (VALUES (0, 10000000), (1, 20000000),
                            (2, 40000000), (3, 80000000)) AS t(j, q)),
c AS (SELECT u, idx - j AS start,
             CAST(v - q AS HUGEINT) * (v - q) AS d2
      FROM s, p WHERE idx - j >= 1),
d AS (SELECT u, start, CAST(sum(d2) AS BIGINT) AS dist_e12,
             count(*) AS nm
      FROM c GROUP BY 1, 2)
SELECT u AS user_id, CAST(start AS BIGINT) AS start_idx, dist_e12,
       CAST(row_number() OVER (ORDER BY dist_e12, u, start)
            AS BIGINT) AS rnk
FROM d WHERE nm = 4
ORDER BY dist_e12, u, start LIMIT 20
""",
        # exact type-1 global quantiles: value at rank ceil(p*n)
        # over micro-quantized values
        "global_value_quantiles": """
WITH v AS (SELECT CAST(round(value*1000000.0) AS BIGINT) AS v_e6
           FROM events),
n AS (SELECT count(*) AS n FROM v),
r AS (SELECT v_e6, row_number() OVER (ORDER BY v_e6) AS rn FROM v),
p AS (SELECT unnest([500000, 900000, 990000]) AS p_ppm)
SELECT CAST(p.p_ppm AS BIGINT) AS p_ppm, n.n AS n,
       CAST(greatest(1, (n.n * p.p_ppm + 999999) // 1000000)
            AS BIGINT) AS rank,
       r.v_e6 AS value_e6
FROM p, n
JOIN r ON r.rn = greatest(1, (n.n * p.p_ppm + 999999) // 1000000)
""",
        # rational 3/2 factor as multiply-compares; baselines average
        # observed windows only (same convention as ewma_anomaly)
        "seasonal_anomaly": """
WITH cnt AS (
  SELECT event_type,
         CAST((floor(epoch(ts)/60)+1)*60 AS BIGINT) AS we_sec,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1,2),
c2 AS (SELECT *, CAST((we_sec // 60) % 60 AS BIGINT) AS slot FROM cnt),
base AS (SELECT event_type, slot,
                CAST(sum(cnt) AS BIGINT) AS slot_total,
                CAST(count(*) AS BIGINT) AS n_windows
         FROM c2 GROUP BY 1,2)
SELECT c2.event_type,
       strftime(to_timestamp(we_sec), '%Y-%m-%d %H:%M:%S') AS window_end,
       c2.slot, cnt,
       CAST((slot_total * 1000000) // n_windows AS BIGINT) AS baseline_e6,
       CASE WHEN cnt*n_windows*2 > 3*slot_total THEN 'high'
            ELSE 'low' END AS direction
FROM c2 JOIN base USING (event_type, slot)
WHERE cnt*n_windows*2 > 3*slot_total OR cnt*n_windows*3 < 2*slot_total
""",
        # identical SQL as seasonal_anomaly — the Spark-SQL twin must
        # produce the same values
        "sql_seasonal_anomaly": """
WITH cnt AS (
  SELECT event_type,
         CAST((floor(epoch(ts)/60)+1)*60 AS BIGINT) AS we_sec,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1,2),
c2 AS (SELECT *, CAST((we_sec // 60) % 60 AS BIGINT) AS slot FROM cnt),
base AS (SELECT event_type, slot,
                CAST(sum(cnt) AS BIGINT) AS slot_total,
                CAST(count(*) AS BIGINT) AS n_windows
         FROM c2 GROUP BY 1,2)
SELECT c2.event_type,
       strftime(to_timestamp(we_sec), '%Y-%m-%d %H:%M:%S') AS window_end,
       c2.slot, cnt,
       CAST((slot_total * 1000000) // n_windows AS BIGINT) AS baseline_e6,
       CASE WHEN cnt*n_windows*2 > 3*slot_total THEN 'high'
            ELSE 'low' END AS direction
FROM c2 JOIN base USING (event_type, slot)
WHERE cnt*n_windows*2 > 3*slot_total OR cnt*n_windows*3 < 2*slot_total
""",
        # the oracle computes the global running high-water mark with
        # one window function; the engine's sharded prefix max must
        # reproduce it exactly (arrival = deterministic simulated
        # delivery permutation: +0..270 s by event_id mod 10)
        "late_data_audit": """
WITH a AS (
  SELECT event_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) + (event_id % 10) * 30000000 AS arr_us
  FROM events),
r AS (
  SELECT *, max(ts_us) OVER (ORDER BY arr_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm_prev
  FROM a),
l AS (
  SELECT CAST((floor(ts_us/600000000)+1)*600 AS BIGINT) AS we_sec,
         CASE WHEN wm_prev IS NULL THEN 0
              ELSE greatest(0, wm_prev - ts_us) END AS late_us
  FROM r)
SELECT strftime(to_timestamp(we_sec), '%Y-%m-%d %H:%M:%S') AS window_end,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(max(late_us) AS BIGINT) AS max_lateness_us,
       CAST(sum(late_us) AS BIGINT) AS sum_lateness_us
FROM l GROUP BY 1
""",
        # the oracle ranks every key naively (row_number over the
        # count histogram); the engine's tie-block closed form over
        # the count-of-counts table must agree — the Gini rank sum is
        # invariant to tie order, which is what makes both exact
        # zero-filled dense grid on both engines so quiet buckets
        # depress correlation instead of vanishing
        "lag_correlation": """
WITH f AS (SELECT event_type AS et,
                  CAST(floor(epoch(ts)/60) AS BIGINT) AS b
           FROM events WHERE event_type IN ('view','purchase')),
rng AS (SELECT min(b) bmin, max(b) bmax FROM f),
grid AS (SELECT u.b FROM rng,
         unnest(generate_series(bmin,bmax)) AS u(b)),
cx AS (SELECT b, count(*) x FROM f WHERE et='view' GROUP BY 1),
cy AS (SELECT b, count(*) y FROM f WHERE et='purchase' GROUP BY 1),
dense AS (SELECT grid.b, coalesce(x,0) x, coalesce(y,0) y
          FROM grid LEFT JOIN cx USING (b) LEFT JOIN cy USING (b)),
lags AS (SELECT u.lag FROM unnest(generate_series(0,10)) AS u(lag)),
-- stage b+lag as a plain column so the join is a hash equi-join
-- (a join predicate referencing three relations nested-loops)
shifted AS (SELECT l.lag, d1.x, d1.b + l.lag AS b2
            FROM lags l, dense d1),
pairs AS (SELECT s.lag, s.x, d2.y
          FROM shifted s JOIN dense d2 ON d2.b = s.b2)
SELECT CAST(lag AS BIGINT) AS lag, CAST(count(*) AS BIGINT) n_pairs,
       CAST(sum(x) AS BIGINT) sum_x, CAST(sum(y) AS BIGINT) sum_y,
       CAST(sum(x*y) AS BIGINT) sum_xy,
       CAST(count(*)*sum(x*y) - sum(x)*sum(y) AS BIGINT) pearson_num
FROM pairs GROUP BY 1
""",
        # hop-window explode (hop_exact's window generator) feeding
        # the per-window rank — the sliding Window Top-N
        "hop_topn": """
WITH e AS (SELECT user_id, epoch(ts) AS es FROM events),
x AS (SELECT user_id, unnest(generate_series(
        (CAST(floor((es - 60)/10) AS BIGINT) + 1) * 10,
        CAST(floor(es/10) AS BIGINT) * 10, 10)) AS ws FROM e),
c AS (SELECT ws, user_id, count(*) AS n_events
      FROM x GROUP BY 1, 2),
r AS (SELECT ws, user_id, n_events,
      row_number() OVER (
        PARTITION BY ws ORDER BY n_events DESC, user_id ASC) AS rnk
      FROM c)
SELECT strftime(make_timestamp(ws*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       strftime(make_timestamp((ws+60)*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       user_id, CAST(n_events AS BIGINT) AS n_events,
       CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
""",
        # ANSI percent_rank kept integer under the deterministic
        # (value, event_id) order: (rank-1)*1e6 // (n-1)
        "percentile_rank": """
WITH r AS (
  SELECT event_type AS key, event_id, value AS v,
         row_number() OVER (PARTITION BY event_type
              ORDER BY value ASC, event_id ASC) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events)
SELECT key, event_id, v,
       CASE WHEN n > 1
            THEN CAST(((rnk - 1) * 1000000) // (n - 1) AS BIGINT)
            ELSE 0 END AS pr_ppm
FROM r
""",
        # ANSI ntile under a deterministic (value, event_id) order;
        # min/max are exact picks so the doubles are bit-stable
        "value_deciles": """
SELECT key, tile, CAST(count(*) AS BIGINT) AS n,
       min(v) AS v_min, max(v) AS v_max
FROM (SELECT event_type AS key, value AS v,
             CAST(ntile(10) OVER (PARTITION BY event_type
                  ORDER BY value ASC, event_id ASC) AS BIGINT) AS tile
      FROM events)
GROUP BY 1,2
""",
        # Grouped OLS trend: integer moment sums (x centered per key,
        # y quantized to micros), doubles only at the final division
        # in oracle-identical order.
        "per_key_trend": """
WITH b AS (SELECT event_type, user_id, epoch_us(ts) AS x_us,
                  CAST(round(value*1000000.0) AS BIGINT) AS y
           FROM events),
m AS (SELECT event_type, user_id, min(x_us) AS x0 FROM b GROUP BY 1, 2),
c AS (SELECT b.event_type, b.user_id,
             CAST(b.x_us - m.x0 AS HUGEINT) AS x, CAST(y AS HUGEINT) AS y
      FROM b JOIN m USING (event_type, user_id)),
a AS (SELECT event_type, user_id, CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
      FROM c GROUP BY 1, 2)
SELECT event_type, user_id, CAST(n AS BIGINT) AS n,
  round(CAST(n*sxy - sx*sy AS DOUBLE)/CAST(n*sxx - sx*sx AS DOUBLE)
        * 86400.0, 6) AS slope_per_day,
  round(CAST(sy AS DOUBLE)/CAST(n AS DOUBLE)/1000000.0, 6) AS mean_value
FROM a WHERE n*sxx - sx*sx > 0
""",
        # PSI drift per value bin: Laplace-smoothed shares, ln
        # quantized once to micro-nats (word_entropy recipe); terms
        # are non-negative by construction.
        "profile_drift_psi": """
WITH b AS (SELECT CAST(floor(value/50.0) AS BIGINT) AS bin,
                  CAST(ts < TIMESTAMP '2024-01-16 00:00:00' AS INT)
                    AS is_ref
           FROM events),
pb AS (SELECT bin, CAST(sum(is_ref) AS BIGINT) AS cnt_ref,
              CAST(sum(1 - is_ref) AS BIGINT) AS cnt_cur
       FROM b GROUP BY 1),
t AS (SELECT sum(cnt_ref) AS n_ref, sum(cnt_cur) AS n_cur,
             count(*) AS n_bins FROM pb)
SELECT bin, cnt_ref, cnt_cur,
  CAST(round((((cnt_ref + 1.0) / (n_ref + n_bins))
              - ((cnt_cur + 1.0) / (n_cur + n_bins)))
       * ln(((cnt_ref + 1.0) * (n_cur + n_bins))
            / ((cnt_cur + 1.0) * (n_ref + n_bins)))
       * 1000000.0) AS BIGINT) AS psi_micro_nats
FROM pb, t
""",
        # Dense gap-filled tumbling series: every bucket between the
        # first and last observed window, zero-filled + flagged, with
        # last-observation-carried-forward.
        "gap_fill_60s": """
WITH e AS (SELECT CAST(event_id % 2 AS INT) AS bit, ts FROM events),
w AS (SELECT (CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60) AS we,
             CAST(sum(bit) AS BIGINT) AS ones, count(*) AS n
      FROM e GROUP BY 1),
b AS (SELECT min(we) AS lo, max(we) AS hi FROM w),
g AS (SELECT unnest(generate_series(lo, hi, 60)) AS we FROM b),
d AS (SELECT g.we, w.ones, w.n FROM g LEFT JOIN w USING (we))
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       coalesce(ones, 0) AS ones_exact,
       coalesce(n, 0) AS n_rows,
       CAST(ones IS NULL AS BIGINT) AS is_gap,
       last_value(ones IGNORE NULLS)
         OVER (ORDER BY we ROWS UNBOUNDED PRECEDING) AS ones_locf
FROM d
""",
        # M4 visualization downsampling: per 10-min bucket the four
        # value-defining points (first/last by (ts, event_id), min,
        # max) — raw doubles compared, no arithmetic.
        "m4_downsample_10min": """
WITH b AS (SELECT (CAST(floor(epoch(ts)/600) AS BIGINT)*600 + 600) AS we,
                  epoch_us(ts) AS us, event_id, value
           FROM events),
r AS (SELECT we, value,
      row_number() OVER (PARTITION BY we ORDER BY us, event_id) AS rf,
      row_number() OVER (PARTITION BY we ORDER BY us DESC, event_id DESC)
        AS rl
      FROM b)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       max(CASE WHEN rf = 1 THEN value END) AS v_first,
       max(CASE WHEN rl = 1 THEN value END) AS v_last,
       min(value) AS v_min, max(value) AS v_max, count(*) AS n_rows
FROM r GROUP BY we
""",
        # Per-tumbling-window exact interpolated percentiles (same
        # quantile_cont recipe as value_percentiles_by_type).
        "windowed_percentiles": """
WITH w AS (SELECT (CAST(floor(epoch(ts)/600) AS BIGINT)*600 + 600) AS we,
                  value FROM events)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99,
       count(*) AS n
FROM w GROUP BY we
""",
        "window_topn": """
WITH c AS (
  SELECT (CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60) AS we,
         user_id, count(*) AS n_events
  FROM events GROUP BY 1, 2),
r AS (SELECT we, user_id, n_events,
      row_number() OVER (
        PARTITION BY we ORDER BY n_events DESC, user_id ASC) AS rnk
      FROM c)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       user_id, n_events, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
""",
        # SQL twin of window_topn — same plan, same oracle.
        "sql_window_topn": """
WITH c AS (
  SELECT (CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60) AS we,
         user_id, count(*) AS n_events
  FROM events GROUP BY 1, 2),
r AS (SELECT we, user_id, n_events,
      row_number() OVER (
        PARTITION BY we ORDER BY n_events DESC, user_id ASC) AS rnk
      FROM c)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       user_id, n_events, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3
""",
        # Per-window exact distinct users (oracle anchor of the HLL
        # twin, which is pytest-bound-checked).
        "windowed_distinct_users": """
SELECT strftime(make_timestamp(
         (CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60)*1000000),
         '%Y-%m-%d %H:%M:%S') AS window_end,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*) AS n_rows
FROM events
GROUP BY CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60
""",
        # Binary-decay EWMA anomaly: alpha = 1/2 scaled by 2^20 makes
        # every weight an exact power-of-two BIGINT; num/denom and the
        # multiply-compare are pure integers (no IEEE accumulation —
        # pow(2, k<=62) is an exactly-representable double).
        "ewma_anomaly": """
WITH e AS (SELECT CAST(event_id % 2 AS INT) AS bit, ts FROM events),
w AS (SELECT (CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60) AS we,
      CAST(sum(bit) AS BIGINT) AS ones_exact FROM e GROUP BY 1),
h AS (SELECT we, ones_exact,
      list(ones_exact) OVER (
        ORDER BY we ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING) AS hist
      FROM w),
s AS (SELECT we, ones_exact, coalesce(len(hist), 0) AS L,
      coalesce(list_sum(list_transform(
        generate_series(1, coalesce(len(hist), 0)), i ->
          hist[i] * CAST(pow(2.0, 20 - coalesce(len(hist), 0) + i - 1)
                         AS BIGINT))), 0) AS num
      FROM h),
d AS (SELECT *, CAST(pow(2.0, 20) AS BIGINT)
                - CAST(pow(2.0, 20 - L) AS BIGINT) AS denom FROM s)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       ones_exact,
       CAST(CASE WHEN L > 0 THEN (num * 1000000) // denom
            ELSE 0 END AS BIGINT) AS ewma_e6,
       CAST(CASE WHEN L > 0 AND ones_exact * denom > 2 * num
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM d
""",
        # Drill-down into median/MAD-anomalous windows: range join
        # rewritten as an equi join on the tumbling bucket.
        "anomaly_drilldown": """
WITH e AS (SELECT CAST(event_id % 2 AS INT) AS bit, ts, event_type,
                  user_id FROM events),
w AS (SELECT *, (CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60) AS we
      FROM e),
cnt AS (SELECT we, CAST(sum(bit) AS BIGINT) AS ones_exact
        FROM w GROUP BY we),
med AS (SELECT quantile_cont(ones_exact, 0.5) AS med FROM cnt),
dev AS (SELECT we, ones_exact,
        CAST(round(abs(ones_exact - med) * 1000000.0) AS BIGINT)
          AS adev_e6
        FROM cnt, med),
mad AS (SELECT quantile_cont(CAST(adev_e6 AS DOUBLE) / 1000000.0, 0.5)
               AS mad FROM dev),
anom AS (SELECT we FROM dev, mad
         WHERE adev_e6 > 3 * CAST(round(mad * 1000000.0) AS BIGINT))
SELECT strftime(make_timestamp(w.we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       event_type, count(*) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM w JOIN anom ON w.we = anom.we
GROUP BY w.we, event_type
""",
        # Median/MAD anomaly flags over tumbling window counts;
        # deviations quantized to 1e-6 BIGINTs before the compare.
        "window_anomalies": """
WITH e AS (SELECT CAST(event_id % 2 AS INT) AS bit, ts FROM events),
w AS (SELECT bit, (CAST(floor(epoch(ts)/60) AS BIGINT)*60 + 60) AS we FROM e),
cnt AS (SELECT we, CAST(sum(bit) AS BIGINT) AS ones_exact
        FROM w GROUP BY we),
med AS (SELECT quantile_cont(ones_exact, 0.5) AS med FROM cnt),
dev AS (SELECT we, ones_exact,
        CAST(round(abs(ones_exact - med) * 1000000.0) AS BIGINT) AS adev_e6
        FROM cnt, med),
mad AS (SELECT quantile_cont(CAST(adev_e6 AS DOUBLE) / 1000000.0, 0.5)
               AS mad FROM dev)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       ones_exact, adev_e6,
       CAST(CASE WHEN adev_e6 > 3 * CAST(round(mad * 1000000.0) AS BIGINT)
            THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
FROM dev, mad
""",
    }
    return out
