"""relational registry: relational surface: group-bys, pivots, profiles, data quality.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403



def _dataset_diff_lineitem(s: SparkSession, d: str) -> DataFrame:
    """Snapshot diff of the per-part lineitem aggregate at two
    ship-date cuts — the audit between two pipeline runs.  Counts
    and quantities are integer-exact (l_quantity is integer-valued;
    double sums of small integers are exact well below 2^53)."""
    li = _lineitem(s, d)

    def snap(cut: str) -> DataFrame:
        return (
            li.filter(
                F.col("l_shipdate") < F.lit(cut).cast("timestamp")
            )
            .groupBy("l_partkey")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_items"),
                F.sum("l_quantity").cast("bigint").alias("qty"),
            )
        )

    return R.dataset_diff(
        snap("1997-01-01"), snap("1998-01-01"),
        ["l_partkey"], ["n_items", "qty"],
    )


def queries():
    return {
        # HLL++ relative-error envelopes vs exact COUNT(DISTINCT)
        "approx_distinct_users_bound": lambda s, d: (
            R.approx_distinct_users_bound(_events(s, d))
        ),
        "table_profile_events_approx_bound": lambda s, d: (
            R.table_profile_approx_bound(_events(s, d))
        ),
        "rfm_segments": lambda s, d: AN.rfm_segments(_events(s, d)),
        # changed this round (PCY hashed-pair prefilter) — stays in
        # the driver window
        "frequent_itemsets": lambda s, d: IT.frequent_itemsets(
            _documents(s, d), 500_000
        ),
        # ---- r8 VERDICT ask #1: the 18 never-driver-verified
        # rows-only entries, rotated INTO the first-50 window this
        # round (the driver validates rows+schema for them; their
        # correctness anchors stay in pytest — see each origin
        # comment in the rows-only section below) ----

        # (embedding_neardup_lsh / semantic_dedup_lsh /
        # simsearch_ann_lsh moved to the round-10 head block:
        # integer-plane rewrite flipped them to oracle-hash-checked)
        # (neardup_incremental_lsh moved to the round-10 head
        # block: md5 index family flipped it to hash-checked)
        "table_profile_events_approx": lambda s, d: R.table_profile(
            _events(s, d), exact=False
        ),
        "cross_tab_chi2": lambda s, d: AN.cross_tab_chi2(
            _events(s, d)
        ),
        "assoc_pairs_daily": lambda s, d: AN.assoc_pairs(_events(s, d)),
        "dq_checks_events": lambda s, d: R.dq_checks(
            _events(s, d),
            not_null=["event_id", "ts", "user_id", "event_type"],
            unique=["event_id"],
            ranges={"value": (0.0, 250.0)},
            allowed={
                "event_type": [
                    "click", "signup", "purchase", "error", "view",
                ]
            },
        ),
        "skew_report": lambda s, d: R.skew_report(
            _events(s, d), ["user_id", "event_type"]
        ),
        "dataset_diff": _dataset_diff_lineitem,
        "grouped_topk_events": lambda s, d: R.grouped_topk(
            _events(s, d), ["event_type"], "value", 5, tiebreak="event_id"
        ).select("event_type", "event_id", "value", "rnk"),
        "table_profile_events": lambda s, d: R.table_profile(
            _events(s, d)
        ),
        "user_spend_salted_join": lambda s, d: R.user_spend_salted_join(
            _events(s, d)
        ),
        "user_range_spend": lambda s, d: R.user_range_spend(_events(s, d)),
        "event_grouping_sets": lambda s, d: R.event_grouping_sets(_events(s, d)),
        "user_moving_spend": lambda s, d: R.user_moving_spend(_events(s, d)),
        "event_type_counts_salted": lambda s, d: R.event_type_counts_salted(
            _events(s, d)
        ),
        "event_type_rollup": lambda s, d: R.event_type_rollup(_events(s, d)),
        "event_type_cube": lambda s, d: R.event_type_cube(_events(s, d)),
        "distinct_users": lambda s, d: R.distinct_users(_events(s, d)),
        "json_extract_stats": lambda s, d: R.json_extract_stats(_events(s, d)),
        "value_median_by_type": lambda s, d: R.value_median_by_type(_events(s, d)),
        "event_type_pivot": lambda s, d: R.event_type_pivot(_events(s, d)),
        "value_percentiles_by_type": lambda s, d: R.value_percentiles_by_type(
            _events(s, d)
        ),
        "users_view_and_purchase": lambda s, d: R.users_view_and_purchase(
            _events(s, d)
        ),
        "value_quartiles_by_type": lambda s, d: R.value_quartiles_by_type(
            _events(s, d)
        ),
        # ---- pytest-anchored (sketch/hash-seeded) ----
        # rows-only correctness anchors for the 18 entries rotated
        # into the driver window this round (kept here for the
        # record): embedding_neardup_lsh / semantic_dedup_lsh — LSH
        # scale paths, recall vs the oracle-green exact twins
        # measured in tests; neardup_incremental_lsh — persisted
        # MinHash index probe, estimator agreement pinned in pytest;
        # compression_ratio — zlib deflate, exact permille pinned;
        # kll_rollup_quantiles_1h — rank-error bound in
        # test_sketches.py; mmr_diverse_topk / pca_project — numpy
        # parity in tests;
        # bpe_* — hand-computed vectors + invariants in test_bpe.py;
        # (r9: zorder_layout_stats / lang_id / heavy_hitters_ngrams
        # graduated to oracle-hash-checked — see the round-9 block)
        # simsearch_ann_* — recall-vs-exact
        # pinned; *_approx — HLL++ within-3·rsd bounds;
        # cumulate_dgim — DGIM bound + degeneration tests.
        # (r10: minhash_lsh_pairs / simhash_pairs graduated to
        # oracle-hash-checked via the md5 hash family and moved into
        # the first-50 window — see the round-10 block at the head)
        "approx_distinct_users": lambda s, d: R.approx_distinct_users(_events(s, d)),
    }


def oracles():
    out = {
        "approx_distinct_users_bound": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       TRUE AS within_bound
FROM events GROUP BY event_type
""",
        "table_profile_events_approx_bound": "\nUNION ALL\n".join(
            f"""
SELECT '{c}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       min({s}) AS min_str, max({s}) AS max_str,
       TRUE AS within_bound
FROM events"""
            for c, s in [
                ("event_id", "CAST(event_id AS VARCHAR)"),
                ("ts", "strftime(ts, '%Y-%m-%d %H:%M:%S.%f')"),
                ("user_id", "CAST(user_id AS VARCHAR)"),
                ("event_type", "event_type"),
                ("value", "printf('%.6f', value)"),
                ("props", "props"),
            ]
        ),
        # Deequ-style constraint suite: every check an aggregate over
        # ONE scan; uniqueness counts surplus duplicates.
        "dq_checks_events": """
WITH a AS (
  SELECT count(*) AS n,
    SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS v0,
    SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END) AS v1,
    SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS v2,
    SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS v3,
    count(event_id) - count(DISTINCT event_id) AS v4,
    SUM(CASE WHEN value IS NOT NULL
              AND (value < 0.0 OR value > 250.0)
        THEN 1 ELSE 0 END) AS v5,
    SUM(CASE WHEN event_type IS NOT NULL
              AND event_type NOT IN
                ('click','signup','purchase','error','view')
        THEN 1 ELSE 0 END) AS v6
  FROM events
)
SELECT "check", "column", n_rows,
       CAST(n_violations AS BIGINT) AS n_violations,
       CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
         AS passed
FROM (
  SELECT 'not_null' AS "check", 'event_id' AS "column",
         n AS n_rows, v0 AS n_violations FROM a
  UNION ALL SELECT 'not_null', 'ts', n, v1 FROM a
  UNION ALL SELECT 'not_null', 'user_id', n, v2 FROM a
  UNION ALL SELECT 'not_null', 'event_type', n, v3 FROM a
  UNION ALL SELECT 'unique', 'event_id', n, v4 FROM a
  UNION ALL SELECT 'range[0.0,250.0]', 'value', n, v5 FROM a
  UNION ALL SELECT 'allowed_values', 'event_type', n, v6 FROM a
)
""",
        "skew_report": """
WITH k1 AS (SELECT user_id AS _k, count(*) AS cnt
            FROM events GROUP BY 1),
r1 AS (SELECT cnt, row_number() OVER (ORDER BY cnt) AS i FROM k1),
s1 AS (SELECT CAST(sum(cnt) AS BIGINT) n_rows,
              CAST(count(*) AS BIGINT) n_distinct,
              CAST(max(cnt) AS BIGINT) max_cnt,
              sum(CAST((2*i - (SELECT count(*) FROM k1) - 1)
                  AS HUGEINT)*cnt) AS num
       FROM r1),
k2 AS (SELECT event_type AS _k, count(*) AS cnt
       FROM events GROUP BY 1),
r2 AS (SELECT cnt, row_number() OVER (ORDER BY cnt) AS i FROM k2),
s2 AS (SELECT CAST(sum(cnt) AS BIGINT) n_rows,
              CAST(count(*) AS BIGINT) n_distinct,
              CAST(max(cnt) AS BIGINT) max_cnt,
              sum(CAST((2*i - (SELECT count(*) FROM k2) - 1)
                  AS HUGEINT)*cnt) AS num
       FROM r2)
SELECT 'user_id' AS "column", n_rows, n_distinct, max_cnt,
       CAST(max_cnt*1000000//n_rows AS BIGINT) AS top1_share_ppm,
       CAST(num*1000000//(CAST(n_distinct AS HUGEINT)*n_rows)
            AS BIGINT) AS gini_e6
FROM s1
UNION ALL
SELECT 'event_type', n_rows, n_distinct, max_cnt,
       CAST(max_cnt*1000000//n_rows AS BIGINT),
       CAST(num*1000000//(CAST(n_distinct AS HUGEINT)*n_rows)
            AS BIGINT)
FROM s2
""",
        # day slot is floor(epoch/86400) % 7 on BOTH engines (never a
        # DAYOFWEEK builtin with an engine-specific week origin)
        "cross_tab_chi2": """
WITH obs AS (SELECT event_type AS row_key,
        CAST(floor(epoch(ts)/86400) AS BIGINT) % 7 AS day_slot,
        CAST(count(*) AS BIGINT) AS observed
    FROM events GROUP BY 1,2),
r AS (SELECT row_key, sum(observed) r_tot FROM obs GROUP BY 1),
c AS (SELECT day_slot, sum(observed) c_tot FROM obs GROUP BY 1),
n AS (SELECT sum(observed) n_tot FROM obs),
e AS (SELECT row_key, day_slot, observed,
   CAST(CAST(r_tot AS HUGEINT)*c_tot*1000000 // n_tot AS BIGINT)
       AS expected_e6
FROM obs JOIN r USING (row_key) JOIN c USING (day_slot), n)
SELECT row_key, day_slot, observed, expected_e6,
   CAST((CAST(observed AS HUGEINT)*1000000 - expected_e6)
        *(CAST(observed AS HUGEINT)*1000000 - expected_e6)
        // GREATEST(CAST(expected_e6 AS HUGEINT),
                    CAST(1 AS HUGEINT))
        AS BIGINT) AS chi2_cell_e6
FROM e
""",
        # level-wise A-Priori in SQL: L1 -> L2 -> pruned C3 -> L3;
        # min_support is ceil(n_baskets/2), integer on both engines
        "frequent_itemsets": """
WITH it AS (SELECT DISTINCT doc_id AS b, u.w FROM
  (SELECT doc_id, string_split(text,' ') ws FROM documents),
  unnest(ws) u(w)),
nb AS (SELECT count(DISTINCT b) n FROM it),
s AS (SELECT (n*500000 + 999999)//1000000 AS s FROM nb),
l1 AS (SELECT w, CAST(count(*) AS BIGINT) support FROM it GROUP BY 1
       HAVING count(*) >= (SELECT s FROM s)),
i1 AS (SELECT b, w FROM it WHERE w IN (SELECT w FROM l1)),
l2 AS (SELECT a.w w1, c.w w2, CAST(count(*) AS BIGINT) support
       FROM i1 a JOIN i1 c USING (b) WHERE a.w < c.w
       GROUP BY 1,2 HAVING count(*) >= (SELECT s FROM s)),
c3 AS (SELECT p.w1, p.w2, q.w2 AS w3
       FROM l2 p JOIN l2 q ON p.w1 = q.w1 AND p.w2 < q.w2
       WHERE EXISTS (SELECT 1 FROM l2 z
                     WHERE z.w1 = p.w2 AND z.w2 = q.w2)),
l3 AS (SELECT t.w1, t.w2, t.w3, CAST(count(*) AS BIGINT) support
       FROM c3 t JOIN i1 a ON a.w = t.w1
       JOIN i1 b2 ON b2.b = a.b AND b2.w = t.w2
       JOIN i1 c ON c.b = a.b AND c.w = t.w3
       GROUP BY 1,2,3 HAVING count(*) >= (SELECT s FROM s))
SELECT CAST(1 AS BIGINT) k, w AS item1, NULL AS item2,
       NULL AS item3, support FROM l1
UNION ALL
SELECT 2, w1, w2, NULL, support FROM l2
UNION ALL
SELECT 3, w1, w2, w3, support FROM l3
""",
        "dataset_diff": """
WITH o AS (SELECT l_partkey, CAST(count(*) AS BIGINT) n_items,
                  CAST(sum(l_quantity) AS BIGINT) qty
           FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1),
n AS (SELECT l_partkey, CAST(count(*) AS BIGINT) n_items,
             CAST(sum(l_quantity) AS BIGINT) qty
      FROM lineitem WHERE l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1)
SELECT coalesce(o.l_partkey, n.l_partkey) AS l_partkey,
       o.n_items AS old_n_items, o.qty AS old_qty,
       n.n_items AS new_n_items, n.qty AS new_qty,
       CASE WHEN o.l_partkey IS NULL THEN 'added'
            WHEN n.l_partkey IS NULL THEN 'removed'
            WHEN o.n_items = n.n_items AND o.qty = n.qty
                 THEN 'unchanged'
            ELSE 'changed' END AS status
FROM o FULL OUTER JOIN n ON o.l_partkey = n.l_partkey
""",
        # RFM tiling under a deterministic total order (metric,
        # user_id): ANSI ntile distributes remainders identically.
        "rfm_segments": """
WITH pu AS (SELECT user_id, max(epoch_us(ts)) AS last_us,
              count(*) AS frequency,
              coalesce(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(round(value*1000000.0) AS BIGINT) END), 0)
                AS monetary_micro
            FROM events GROUP BY 1),
r AS (SELECT max(epoch_us(ts)) AS ref_us FROM events),
t AS (SELECT user_id,
        CAST(floor((ref_us - last_us)/86400000000.0) AS BIGINT)
          AS recency_days,
        CAST(frequency AS BIGINT) AS frequency,
        CAST(monetary_micro AS BIGINT) AS monetary_micro,
        CAST(ntile(5) OVER (ORDER BY last_us DESC, user_id) AS BIGINT)
          AS r_tile,
        CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS BIGINT)
          AS f_tile,
        CAST(ntile(5) OVER (ORDER BY monetary_micro DESC, user_id)
             AS BIGINT) AS m_tile
      FROM pu, r)
SELECT *, r_tile::VARCHAR || f_tile::VARCHAR || m_tile::VARCHAR
         AS segment
FROM t
""",
        # Market-basket association over user-day baskets: pair
        # co-occurrence via the basket self-join, lift/support from
        # exact counts.
        "assoc_pairs_daily": """
WITH s AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d,
                  event_type AS item FROM events),
ni AS (SELECT item, count(*) AS c FROM s GROUP BY 1),
nbk AS (SELECT count(*) AS nb FROM (SELECT DISTINCT user_id, d FROM s)),
p AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_both
      FROM s a JOIN s b
        ON a.user_id = b.user_id AND a.d = b.d AND a.item < b.item
      GROUP BY 1, 2)
SELECT item_a, item_b, CAST(n_both AS BIGINT) AS n_both,
       CAST(na.c AS BIGINT) AS n_a, CAST(nbi.c AS BIGINT) AS n_b,
       round(CAST(n_both AS DOUBLE) * CAST(nb AS DOUBLE)
             / (CAST(na.c AS DOUBLE) * CAST(nbi.c AS DOUBLE)), 6) AS lift,
       round(CAST(n_both AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS support
FROM p JOIN ni na ON na.item = item_a
       JOIN ni nbi ON nbi.item = item_b, nbk
""",
        # ANALYZE-style per-column profile of events; string forms are
        # dtype-pinned (strftime micro / printf %.6f / plain cast) so
        # lexicographic min/max agree across engines.
        "table_profile_events": "\nUNION ALL\n".join(
            f"""
SELECT '{c}' AS "column", count(*) AS n_rows,
       CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null,
       CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
       min({s}) AS min_str, max({s}) AS max_str
FROM events"""
            for c, s in [
                ("event_id", "CAST(event_id AS VARCHAR)"),
                ("ts", "strftime(ts, '%Y-%m-%d %H:%M:%S.%f')"),
                ("user_id", "CAST(user_id AS VARCHAR)"),
                ("event_type", "event_type"),
                ("value", "printf('%.6f', value)"),
                ("props", "props"),
            ]
        ),
        # Generic per-group top-k (map-side partial prune + window):
        # must equal the plain ROW_NUMBER formulation exactly.
        "grouped_topk_events": """
SELECT event_type, event_id, value, CAST(rn AS BIGINT) AS rnk FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY value DESC, event_id ASC) AS rn
  FROM events)
WHERE rn <= 5
""",
        "event_type_rollup": """
SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY ROLLUP(event_type, day)
""",
        "event_type_cube": """
SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY CUBE(event_type, day)
""",
        "user_moving_spend": """
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
 CAST(sum(CAST(value AS DECIMAL(12,2))) OVER (
   PARTITION BY user_id ORDER BY ts, event_id
   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS trailing_sum,
 count(*) OVER (
   PARTITION BY user_id ORDER BY ts, event_id
   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS trailing_n
FROM events
""",
        "distinct_users": """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       count(*) AS n_events
FROM events GROUP BY event_type
""",
        # the salted two-stage aggregate must equal the plain GROUP BY
        "event_type_counts_salted": """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY event_type
""",
        "json_extract_stats": """
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val, count(*) AS n
FROM events GROUP BY 1
""",
        "value_median_by_type": """
WITH r AS (SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v, event_id,
       row_number() OVER (PARTITION BY event_type
         ORDER BY CAST(value AS DECIMAL(12,2)), event_id) AS pos,
       count(*) OVER (PARTITION BY event_type) AS n
       FROM events)
SELECT event_type, CAST(v AS DOUBLE) AS median_value,
       CAST(n AS BIGINT) AS n_events
FROM r WHERE pos = (n + 1) // 2
""",
        "event_type_pivot": """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
 CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS n_click,
 CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_error,
 CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS n_purchase,
 CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS n_signup,
 CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY 1
""",
        # quantile_cont shares Spark percentile()'s (n-1)*p rank
        # interpolation; round(6) absorbs interpolation-order ulps
        "value_percentiles_by_type": """
SELECT event_type,
 round(quantile_cont(value, 0.5), 6) AS p50,
 round(quantile_cont(value, 0.9), 6) AS p90,
 round(quantile_cont(value, 0.99), 6) AS p99,
 count(*) AS n
FROM events GROUP BY event_type
""",
        "users_view_and_purchase": """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
        "value_quartiles_by_type": """
WITH q AS (SELECT event_type, value,
            ntile(4) OVER (PARTITION BY event_type
                           ORDER BY value, event_id) AS quartile
           FROM events)
SELECT event_type, CAST(quartile AS INT) AS quartile, count(*) AS n,
 round(min(value), 6) AS lo, round(max(value), 6) AS hi
FROM q GROUP BY event_type, quartile
""",
        "user_spend_salted_join": """
WITH dim AS (SELECT user_id AS d_user,
                    sum(CAST(value AS DECIMAL(12,2))) AS user_total
             FROM events GROUP BY user_id)
SELECT event_type, count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value,
       CAST(sum(user_total) AS DOUBLE) AS sum_user_totals
FROM events JOIN dim ON user_id = d_user
GROUP BY event_type
""",
        "user_range_spend": """
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
 CAST(sum(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS range_sum,
 count(*) OVER w AS range_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(epoch_ms(ts) // 1000 AS BIGINT)
             RANGE BETWEEN 604799 PRECEDING AND CURRENT ROW)
""",
        "event_grouping_sets": """
SELECT event_type, day,
       CAST(grouping(event_type) AS BIGINT) AS g_type,
       CAST(grouping(day) AS BIGINT) AS g_day,
       count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM (SELECT event_type,
             strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, value
      FROM events)
GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))
""",
    }
    return out
