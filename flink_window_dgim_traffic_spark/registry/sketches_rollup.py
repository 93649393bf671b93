"""sketches_rollup registry: theta/KLL/CMS sketches and continuous-aggregate rollups.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403



def _rollup_serve_10min(s: SparkSession, d: str) -> DataFrame:
    """Continuous-aggregate deployment shape end to end: materialize
    the 1min/1h/1d hierarchy (raw events touched once), then serve a
    10-minute granularity routed from the 1-minute level.  The oracle
    is the direct 600 s tumble over raw events — hash equality proves
    the re-aggregation path exact."""

    from flink_window_dgim_traffic_spark.operators import rollup as RU

    path = _mkdtemp(prefix="spark_graft_rollup_")
    RU.build_rollup_hierarchy(_events(s, d), path)
    return RU.rollup_serve(s, path, 600)



def _rollup_serve_realtime(s: SparkSession, d: str) -> DataFrame:
    """Real-time continuous aggregate: the hierarchy is folded only up
    to a time cut (the first 4/5 of the event range), the last fifth
    stays unmaterialized — the realtime router unions the materialized
    windows below the high-water mark with a direct, scan-pruned
    aggregation of the raw tail.  The oracle is the direct 60 s tumble
    over ALL events — hash equality proves the stitched result exact."""

    from flink_window_dgim_traffic_spark.operators import rollup as RU

    ev = _events(s, d)
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    cut = lo + (hi - lo) * 4 // 5
    path = _mkdtemp(prefix="spark_graft_rollup_rt_")
    RU.build_rollup_hierarchy(
        ev.filter(F.unix_micros("ts") <= F.lit(cut)), path
    )
    return RU.rollup_serve_realtime(s, path, 60, ev)



def _sketch_rollup_path(s: SparkSession, d: str) -> str:
    """Build (once per process per sf_dir) the theta/KLL sketch
    hierarchy for the events table in a tempdir and return its path —
    shared by the serve and quantile queries below."""

    cache = getattr(_sketch_rollup_path, "_cache", {})
    if d not in cache:
        path = _mkdtemp(prefix="spark_graft_skroll_")
        SK.build_sketch_rollup(_events(s, d), path)
        cache[d] = path
        _sketch_rollup_path._cache = cache
    return cache[d]



def _theta_rollup_serve_10min(s: SparkSession, d: str) -> DataFrame:
    """Distinct-count continuous aggregate end to end: per-minute
    theta sketches materialized once, 10-minute distinct-user windows
    served by UNIONING sketch blobs (raw events never rescanned).
    The oracle is the direct exact COUNT(DISTINCT) per 600 s window —
    hash equality holds because theta sketches are exact below 2^lg_k
    retained keys (operators/sketches.py module docstring)."""
    return SK.sketch_rollup_serve(s, _sketch_rollup_path(s, d), 600)



def _kll_rollup_quantiles_1h(s: SparkSession, d: str) -> DataFrame:
    """Hourly p50/p95 of ``value`` served by merging per-minute KLL
    sketches — approximate by design (rows-only); rank-error bounds
    vs the exact percentile are asserted in tests/test_sketches.py."""
    return SK.kll_rollup_quantiles(s, _sketch_rollup_path(s, d), 3600)



def _theta_rollup_realtime(s: SparkSession, d: str) -> DataFrame:
    """Real-time DISTINCT-count continuous aggregate: the sketch
    hierarchy is folded up to a time cut (first 4/5 of the range);
    serving unions materialized sketch blobs below the high-water
    mark with sketches built from only the ts-pruned raw tail.  The
    oracle is the direct exact per-minute distinct count over ALL
    events."""

    ev = _events(s, d)
    lo, hi = ev.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).collect()[0]
    cut = lo + (hi - lo) * 4 // 5
    path = _mkdtemp(prefix="spark_graft_skroll_rt_")
    SK.build_sketch_rollup(
        ev.filter(F.unix_micros("ts") <= F.lit(cut)), path
    )
    return SK.sketch_rollup_serve_realtime(s, path, 60, ev)



def _zorder_layout_stats(s: SparkSession, d: str) -> DataFrame:
    """Z-order the events table on (user_id, value) and surface the
    per-file min-max footprint + prune decision for a box probe —
    the measurable layout-quality artifact (tests pin that the
    z-layout beats a single-column sort on cross-column probes).

    Uses the DETERMINISTIC fixed-grid bucketing variant (file k =
    Morton range [k·2³²/16, (k+1)·2³²/16)) so the per-file boxes are
    a pure integer function of the data: the DuckDB oracle replays
    the same 16-bit normalize → bit-interleave → bucket math in
    bitwise SQL and recomputes every file's min/max/prune decision
    (VERDICT r8 ask #3) — the footer walk is still a REAL pyarrow
    read of the written parquet metadata."""

    from flink_window_dgim_traffic_spark.operators import layout as L

    path = _mkdtemp(prefix="spark_graft_zorder_") + "/events"
    L.write_zordered_bucketed(
        _events(s, d).select("user_id", "value", "ts"),
        path,
        ("user_id", "value"),
    )
    return L.layout_scan_stats_hive(
        s, path, ("user_id", "value"),
        probe={"value": (100.0, 150.0)},
    )


def queries():
    return {
        "kll_rollup_quantile_bound_1h": lambda s, d: (
            SK.kll_rollup_quantile_bound(
                s, _sketch_rollup_path(s, d), _events(s, d), 3600
            )
        ),
        # rows-only → oracled conversions (VERDICT r8 ask #3):
        # zorder via deterministic fixed-grid buckets (bitwise Morton
        # SQL oracle over the same integer math), lang_id via DuckDB
        # marker-word membership + charset regex, heavy hitters via
        # the exact-below-capacity trick (931 distinct bigrams <<
        # capacity 4096 → SpaceSaving never evicts, bounds collapse
        # to the exact counts; eviction behavior stays pytest-pinned
        # at the production capacity)
        "zorder_layout_stats": _zorder_layout_stats,
        "heavy_hitters_ngrams": lambda s, d: HH.heavy_hitters_ngrams(
            _documents(s, d), capacity=4096
        ),
        "kll_rollup_quantiles_1h": _kll_rollup_quantiles_1h,
        # ORACLE-ELIGIBLE via the exact-at-capacity trick (the theta
        # recipe, sketches.py): width 2^17 >> |users| at every test
        # SF makes all depth-4 point queries collision-free, so
        # est == exact count and the DuckDB twin is a plain GROUP BY.
        # Production keeps the narrow default width, where the
        # one-sided bound est >= exact (pinned in
        # tests/test_heavy_hitters.py) is the contract.
        "cms_user_counts": lambda s, d: HH.cms_estimate(
            HH.cms_build(
                _events(s, d), "user_id", width=1 << 17, depth=4
            ),
            _events(s, d),
            "user_id",
            width=1 << 17,
            depth=4,
        ),
        # ---- round-5 session-2 additions ----
        "theta_distinct_600s": lambda s, d: SK.theta_windowed_distinct(
            _events(s, d), 600
        ),
        "theta_rollup_serve_10min": _theta_rollup_serve_10min,
        "theta_churn_daily": lambda s, d: SK.theta_churn(
            _events(s, d), 86400
        ),
        "theta_rollup_realtime": _theta_rollup_realtime,
        "rollup_serve_realtime": _rollup_serve_realtime,
        "theta_audience_overlap_daily": lambda s, d: (
            SK.theta_audience_overlap(_events(s, d), 86400)
        ),
        "rollup_serve_10min": _rollup_serve_10min,
    }


def oracles():
    out = {
        # CMS point queries are exact when no key collides in every
        # row: width 2^17 over <=1,500 users is collision-free at all
        # test SFs (exact-at-capacity trick, see queries()), so the
        # sketch estimate equals the plain exact GROUP BY count.
        "cms_user_counts": """
SELECT user_id, count(*) AS est FROM events GROUP BY user_id
""",
        # ---- round-5 session-2 additions ----
        # Theta sketches are exact below 2^lg_k retained keys, so the
        # estimates hash-match the exact COUNT(DISTINCT) at test scale
        # (max 166 distinct users/hour at sf0.1 vs 4096 capacity).
        "theta_distinct_600s": """
SELECT strftime(make_timestamp(((CAST(floor(epoch(ts)/600) AS BIGINT)+1)*600)
         *1000000), '%Y-%m-%d %H:%M:%S') AS window_end,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_rows
FROM events GROUP BY 1
""",
        # Daily audience set algebra: A, B, A∩B (theta intersection),
        # A∪B (theta union) — all exact below sketch capacity.
        "theta_audience_overlap_daily": """
WITH b AS (SELECT (CAST(floor(epoch(ts)/86400) AS BIGINT)+1)*86400 AS we,
                  event_type, user_id
           FROM events),
a AS (SELECT we,
       count(DISTINCT CASE WHEN event_type='view' THEN user_id END) AS n_a,
       count(DISTINCT CASE WHEN event_type='purchase' THEN user_id END) AS n_b
      FROM b GROUP BY 1),
ov AS (SELECT we, count(*) AS n_overlap FROM (
         SELECT we, user_id FROM b WHERE event_type='view'
         INTERSECT
         SELECT we, user_id FROM b WHERE event_type='purchase') GROUP BY we),
un AS (SELECT we, count(DISTINCT user_id) AS n_union FROM b
       WHERE event_type IN ('view','purchase') GROUP BY we)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S') AS window_end,
       n_a, n_b,
       coalesce(n_overlap, 0) AS n_overlap,
       coalesce(n_union, 0) AS n_union
FROM a LEFT JOIN ov USING (we) LEFT JOIN un USING (we)
""",
        # Sketch-rollup serving (minute blobs unioned to 10 min) must
        # equal the direct exact distinct count per 600 s window.
        "theta_rollup_serve_10min": """
SELECT strftime(make_timestamp(((CAST(floor(epoch(ts)/600) AS BIGINT)+1)*600)
         *1000000), '%Y-%m-%d %H:%M:%S') AS window_end,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_rows
FROM events GROUP BY 1
""",
        # Realtime sketch serve: materialized blobs below the
        # high-water mark + raw-tail sketches must reproduce the
        # direct exact per-minute distinct count.
        "theta_rollup_realtime": """
SELECT strftime(make_timestamp(((CAST(floor(epoch(ts)/60) AS BIGINT)+1)*60)
         *1000000), '%Y-%m-%d %H:%M:%S') AS window_end,
       count(DISTINCT user_id) AS n_users,
       count(*) AS n_rows
FROM events GROUP BY 1
""",
        # Daily churn via theta set algebra: retained = |A_t ∩
        # A_{t-1}|, new = active − retained, churned = |A_{t-1} \ A_t|
        # (0 when the predecessor window has no events) — exact below
        # sketch capacity.
        "theta_churn_daily": """
WITH b AS (SELECT DISTINCT
             (CAST(floor(epoch(ts)/86400) AS BIGINT)+1)*86400 AS we,
             user_id
           FROM events),
cur AS (SELECT we, count(*) AS n_active FROM b GROUP BY 1),
ret AS (SELECT c.we, count(*) AS n_ret
        FROM b c JOIN b p
          ON p.we = c.we - 86400 AND p.user_id = c.user_id
        GROUP BY 1),
chn AS (SELECT p.we + 86400 AS we, count(*) AS n_chn
        FROM b p ANTI JOIN b c
          ON c.we = p.we + 86400 AND c.user_id = p.user_id
        GROUP BY 1)
SELECT strftime(make_timestamp(cur.we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       CAST(n_active AS BIGINT) AS n_active,
       CAST(coalesce(n_ret, 0) AS BIGINT) AS n_retained,
       CAST(n_active - coalesce(n_ret, 0) AS BIGINT) AS n_new,
       CAST(CASE WHEN pv.we IS NULL THEN 0
                 ELSE coalesce(n_chn, 0) END AS BIGINT) AS n_churned
FROM cur
LEFT JOIN ret ON ret.we = cur.we
LEFT JOIN chn ON chn.we = cur.we
LEFT JOIN (SELECT we FROM cur) pv ON pv.we = cur.we - 86400
""",
        # Real-time continuous aggregate (materialized levels below
        # the high-water mark + scan-pruned raw tail) must equal the
        # direct 60 s tumble over ALL events.
        "rollup_serve_realtime": _tumble_sql(60),
        # Continuous-aggregate router served at 10 min from the 1-min
        # materialized level; oracle = direct 600 s tumble over raw
        # events, proving the re-aggregation path exact.
        "rollup_serve_10min": """
WITH e AS (SELECT CAST(event_id % 2 AS INT) AS bit, ts FROM events),
w AS (SELECT bit,
      (CAST(floor(epoch(ts)/600) AS BIGINT)*600 + 600) AS we FROM e)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       CAST(sum(bit) AS BIGINT) AS ones_exact, count(*) AS n_rows
FROM w GROUP BY we
""",
        # deterministic fixed-grid z-order: the footer boxes are a
        # pure integer function of the rows (see _zorder_layout_sql)
        "zorder_layout_stats": _zorder_layout_sql(),
        # exact-below-capacity: 931 distinct bigrams << capacity 4096
        # → SpaceSaving never evicts (err=0, min_count=0), so
        # est_lower = est_upper = the exact count and the merged
        # top-k equals the exact top_ngrams ordering
        # pair filter ws[i]<>'' AND ws[i+1]<>'' mirrors the Spark
        # side's "[^ ]+ [^ ]+" lookahead exactly: adjacency means ONE
        # literal space, so doubled/leading spaces yield no bigram
        "heavy_hitters_ngrams": """
WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
g AS (SELECT ws[i] || ' ' || ws[i+1] AS ngram
      FROM t, unnest(range(1, len(ws))) AS r(i)
      WHERE ws[i] <> '' AND ws[i+1] <> ''),
c AS (SELECT ngram, count(*) AS n FROM g GROUP BY ngram)
SELECT ngram, n AS est_lower, n AS est_upper
FROM c ORDER BY n DESC, ngram LIMIT 20
""",
        # r9: the replay-based DGIM family oracled DIRECTLY with the
        # same closed form (replay == g(ones) within horizon; the
        # two-phase variants stay rows-only — their commutative merge
        # order deviates from the sequential sketch by design and is
        # bound-tested instead)
        "kll_rollup_quantile_bound_1h": """
WITH w AS (SELECT (CAST(floor(epoch(ts)/3600) AS BIGINT)+1)*3600 AS we
           FROM events),
c AS (SELECT we, count(*) AS n FROM w GROUP BY we)
SELECT strftime(make_timestamp(we*1000000), '%Y-%m-%d %H:%M:%S')
         AS window_end,
       CAST(p.phi_ppm AS BIGINT) AS phi_ppm,
       CAST(n AS BIGINT) AS n_rows, TRUE AS within_bound
FROM c, (SELECT unnest([500000, 950000]) AS phi_ppm) p
""",
    }
    return out
