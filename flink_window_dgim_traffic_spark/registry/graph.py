"""graph registry: graph ops over co-window / fuzzy-match edges.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403



def _cowindow_edges(s: SparkSession, d: str, size_sec: int) -> DataFrame:
    from flink_window_dgim_traffic_spark.operators import graph as G

    key = (_session_token(s), d, size_sec)
    df = _COWINDOW_EDGE_CACHE.get(key)
    if df is None:
        df = G.cowindow_user_edges(
            _events(s, d), size_sec
        ).localCheckpoint(eager=True)
        _COWINDOW_EDGE_CACHE[key] = df
    return df



def _fuzzy_supplier_edges_cold(s: SparkSession, d: str) -> DataFrame:
    """COLD-PATH twin of ``fuzzy_supplier_pairs``: the same PassJoin
    edit-distance edge build, but bypassing the session edge cache —
    this is the ~seconds-at-sf0.1 build cost that the five cached
    graph-family timings amortize away (VERDICT r6 perf caveat); a
    benched cold entry keeps it visible in the cross-round ratio
    discipline.  Same output, same oracle as fuzzy_supplier_pairs."""
    return MT.edit_distance_join(_supplier(s, d), "s_suppkey", "s_name", 1)



def _components_fuzzy_suppliers(s: SparkSession, d: str) -> DataFrame:
    """Generic connected components (min-label propagation) over the
    supplier name-similarity graph; oracle = recursive-CTE closure."""
    from flink_window_dgim_traffic_spark.operators import graph as G

    return G.connected_components(
        _fuzzy_supplier_edges(s, d), "id_lo", "id_hi"
    )



def _components_star_fuzzy_suppliers(s: SparkSession, d: str) -> DataFrame:
    """Same component problem via LARGE-STAR/SMALL-STAR contraction
    (Kiveris et al. SoCC'14) — the O(log n)-round scale path next to
    the O(diameter) label-propagation twin; identical output, same
    recursive-CTE closure oracle (a 1024-node-path round-count pin
    lives in tests/test_graph.py)."""
    from flink_window_dgim_traffic_spark.operators import graph as G

    return G.connected_components_star(
        _fuzzy_supplier_edges(s, d), "id_lo", "id_hi"
    )



def _bfs_suppliers(s: SparkSession, d: str) -> DataFrame:
    """Bounded-depth BFS distances from supplier 0 over the
    name-similarity graph; oracle = depth-guarded recursive CTE."""
    from flink_window_dgim_traffic_spark.operators import graph as G

    return G.bfs_distance(
        _fuzzy_supplier_edges(s, d), [0], "id_lo", "id_hi", 4
    )



def _triangles_fuzzy_suppliers(s: SparkSession, d: str) -> DataFrame:
    """Triangle counts / clustering coefficients over the supplier
    name-similarity graph (edit distance ≤ 1): the PassJoin pair
    finder feeds the two-join wedge enumeration; the oracle rebuilds
    the same edges with a brute-force levenshtein scan and the same
    ordered 3-way join."""
    from flink_window_dgim_traffic_spark.operators import graph as G

    return G.triangle_count(
        _fuzzy_supplier_edges(s, d), "id_lo", "id_hi"
    )



def _pagerank_cowindow(s: SparkSession, d: str) -> DataFrame:
    """Fixed-iteration integer PageRank over the user co-occurrence
    graph (users active in the same 600 s window) — the oracle
    unrolls the identical three power-iteration rounds as CTEs."""
    from flink_window_dgim_traffic_spark.operators import graph as G

    return G.pagerank_fixed(_cowindow_edges(s, d, 600), iters=3)



def _kcore_users(s: SparkSession, d: str) -> DataFrame:
    """k-core of the 60 s user co-occurrence graph (k=8): the "core
    community" strip of co-session affinity — users who keep company
    with ≥8 other core users.  Fixed 6 peel rounds (convergence depth
    measured ≤3 at every test SF, pinned in tests); the oracle unrolls
    the identical rounds as CTEs."""
    from flink_window_dgim_traffic_spark.operators import graph as G

    return G.kcore_fixed(_cowindow_edges(s, d, 60), k=8, rounds=6)



def _er_supplier_canonical(s: SparkSession, d: str) -> DataFrame:
    """Entity-resolution canonicalization end to end: PassJoin fuzzy
    name matching BLOCKED on nation (the standard record-linkage
    blocking key — cross-nation near-identical names are different
    entities) → connected components → one canonical record per
    entity cluster (min key) with the member count — the dedup
    composition every MDM / record-linkage pipeline ships.  Reuses
    the session-cached supplier edge list (nation filter applied on
    top); oracle = recursive-CTE closure + the same aggregation."""
    from flink_window_dgim_traffic_spark.operators import graph as G

    sup = _supplier(s, d).select(
        F.col("s_suppkey").alias("node"),
        "s_name",
        F.col("s_nationkey").cast("bigint").alias("nat"),
    )
    nat_lo = sup.select(
        F.col("node").alias("id_lo"), F.col("nat").alias("nat_lo")
    )
    nat_hi = sup.select(
        F.col("node").alias("id_hi"), F.col("nat").alias("nat_hi")
    )
    edges = (
        _fuzzy_supplier_edges(s, d)
        .join(F.broadcast(nat_lo), "id_lo")
        .join(F.broadcast(nat_hi), "id_hi")
        .filter(F.col("nat_lo") == F.col("nat_hi"))
    )
    comp = G.connected_components(edges, "id_lo", "id_hi")
    return (
        sup.join(comp, "node", "left")
        .select(
            "node",
            "s_name",
            F.coalesce("component_id", F.col("node")).alias("entity_id"),
        )
        .groupBy("entity_id")
        .agg(
            F.min("node").cast("bigint").alias("canonical_key"),
            F.min_by("s_name", F.col("node")).alias("canonical_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
    )



def _ppr_cowindow(s: SparkSession, d: str) -> DataFrame:
    """Personalized PageRank from users {0, 1} over the 600 s
    co-occurrence graph — proximity-to-seed ranking; the oracle
    unrolls the identical three all-integer rounds with the
    source-conditional restart base."""
    from flink_window_dgim_traffic_spark.operators import graph as G

    return G.ppr_fixed(_cowindow_edges(s, d, 600), [0, 1], iters=3)


def queries():
    return {
        # O(log n)-round star-contraction CC next to the O(diameter)
        # label-prop twin; same closure oracle
        "components_star_fuzzy_suppliers": (
            _components_star_fuzzy_suppliers
        ),
        # ---- round-7 additions / changed-this-round (window
        # discipline: new + changed ops enter ahead of green
        # entries; the three green unchanged tail entries slide
        # past slot 50 and keep their local-sweep oracles) ----
        "fuzzy_supplier_edges_cold": _fuzzy_supplier_edges_cold,
        "kcore_users_60s": _kcore_users,
        "ppr_cowindow": _ppr_cowindow,
        "er_supplier_canonical": _er_supplier_canonical,
        # ---- round-5 session-3 additions ----
        "fuzzy_supplier_pairs": _fuzzy_supplier_edges,
        "pagerank_cowindow": _pagerank_cowindow,
        "triangles_fuzzy_suppliers": _triangles_fuzzy_suppliers,
        "components_fuzzy_suppliers": _components_fuzzy_suppliers,
        "bfs_suppliers": _bfs_suppliers,
    }


def oracles():
    out = {
        # ---- round-6 additions ----
        "kcore_users_60s": kcore_sql,
        # Personalized PageRank: identical unrolled rounds to the
        # pagerank_cowindow oracle, with the source-conditional
        # init/restart base (10^6 / 150000 for seeds {0,1}, else 0).
        "ppr_cowindow": """
WITH wu AS (SELECT DISTINCT
                CAST((floor(epoch(ts)/600)+1)*600 AS BIGINT) we,
                user_id AS u FROM events),
e AS (SELECT DISTINCT a.u AS src, b.u AS dst
      FROM wu a JOIN wu b USING (we) WHERE a.u != b.u),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
r0 AS (SELECT node,
              CAST(CASE WHEN node IN (0, 1) THEN 1000000 ELSE 0 END
                   AS BIGINT) AS r FROM nodes),
r1 AS (SELECT n.node,
              CAST(CASE WHEN n.node IN (0, 1) THEN 150000 ELSE 0 END
                   + (850 * coalesce(s.in_sum,0)) // 1000
                   AS BIGINT) AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst, sum(r.r // d.out_deg) AS in_sum
         FROM r0 r JOIN deg d ON r.node = d.src JOIN e ON e.src = d.src
         GROUP BY 1) s ON n.node = s.dst),
r2 AS (SELECT n.node,
              CAST(CASE WHEN n.node IN (0, 1) THEN 150000 ELSE 0 END
                   + (850 * coalesce(s.in_sum,0)) // 1000
                   AS BIGINT) AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst, sum(r.r // d.out_deg) AS in_sum
         FROM r1 r JOIN deg d ON r.node = d.src JOIN e ON e.src = d.src
         GROUP BY 1) s ON n.node = s.dst),
r3 AS (SELECT n.node,
              CAST(CASE WHEN n.node IN (0, 1) THEN 150000 ELSE 0 END
                   + (850 * coalesce(s.in_sum,0)) // 1000
                   AS BIGINT) AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst, sum(r.r // d.out_deg) AS in_sum
         FROM r2 r JOIN deg d ON r.node = d.src JOIN e ON e.src = d.src
         GROUP BY 1) s ON n.node = s.dst)
SELECT node, r AS rank_ppm FROM r3
""",
        # ER canonicalization: recursive-CTE closure (the components
        # oracle) + min-key/min-name/count per entity cluster;
        # unmatched suppliers are singleton entities.
        "er_supplier_canonical": """
WITH RECURSIVE
jp AS (SELECT a.s_suppkey AS a, b.s_suppkey AS b
       FROM supplier a JOIN supplier b
         ON a.s_suppkey < b.s_suppkey
        AND a.s_nationkey = b.s_nationkey
        AND levenshtein(a.s_name, b.s_name) <= 1),
e AS (SELECT a, b FROM jp UNION SELECT b, a FROM jp),
nodes AS (SELECT DISTINCT a AS node FROM e),
reach AS (
  SELECT node, node AS r FROM nodes
  UNION
  SELECT reach.node, e.b FROM reach JOIN e ON reach.r = e.a
),
comp AS (SELECT node, min(r) AS component_id FROM reach GROUP BY node)
SELECT coalesce(component_id, s_suppkey) AS entity_id,
       CAST(min(s_suppkey) AS BIGINT) AS canonical_key,
       arg_min(s_name, s_suppkey) AS canonical_name,
       CAST(count(*) AS BIGINT) AS n_members
FROM supplier LEFT JOIN comp ON s_suppkey = node
GROUP BY 1
""",
        # ---- round-5 session-3 additions ----
        # The engine path is a PassJoin segment-signature equi-join;
        # the oracle is the brute-force O(n²) levenshtein scan the
        # signature join must reproduce exactly.
        "fuzzy_supplier_pairs": """
SELECT a.s_suppkey AS id_lo, b.s_suppkey AS id_hi,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS ed
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND levenshtein(a.s_name, b.s_name) <= 1
""",
        # cold-path twin: identical semantics, cache bypassed
        "fuzzy_supplier_edges_cold": """
SELECT a.s_suppkey AS id_lo, b.s_suppkey AS id_hi,
       CAST(levenshtein(a.s_name, b.s_name) AS BIGINT) AS ed
FROM supplier a JOIN supplier b
  ON a.s_suppkey < b.s_suppkey
 AND levenshtein(a.s_name, b.s_name) <= 1
""",
        # star-contraction CC: identical output to the label-prop
        # twin, same reachability-closure oracle
        "components_star_fuzzy_suppliers": _SUPPLIER_COMPONENTS_SQL,
        # recursive-CTE reachability closure; component id = min
        # reachable node, matching the min-label propagation
        "components_fuzzy_suppliers": _SUPPLIER_COMPONENTS_SQL,
        # depth-guarded recursive expansion; dist = min over the
        # bounded walk set, matching the fixed-round BFS
        "bfs_suppliers": """
WITH RECURSIVE
jp AS (SELECT a.s_suppkey AS a, b.s_suppkey AS b
       FROM supplier a JOIN supplier b
         ON a.s_suppkey < b.s_suppkey
        AND levenshtein(a.s_name, b.s_name) <= 1),
e AS (SELECT a, b FROM jp UNION SELECT b, a FROM jp),
walk AS (
  SELECT CAST(0 AS BIGINT) AS node, 0 AS d
  UNION
  SELECT e.b, walk.d + 1 FROM walk JOIN e ON walk.node = e.a
  WHERE walk.d < 4
)
SELECT node, CAST(min(d) AS BIGINT) AS dist FROM walk GROUP BY node
""",
        # ordered-edge wedge enumeration over the levenshtein graph;
        # cc_ppm = (2·tri·10^6) // (deg·(deg−1)), exact integers
        "triangles_fuzzy_suppliers": """
WITH e AS (SELECT a.s_suppkey AS a, b.s_suppkey AS b
           FROM supplier a JOIN supplier b
             ON a.s_suppkey < b.s_suppkey
            AND levenshtein(a.s_name, b.s_name) <= 1),
deg AS (SELECT node, CAST(count(*) AS BIGINT) AS degree FROM
        (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
        GROUP BY 1),
tri AS (SELECT x.a, x.b, y.b AS c
        FROM e x JOIN e y ON x.b = y.a
        JOIN e z ON z.a = x.a AND z.b = y.b),
pn AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM
       (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
       GROUP BY 1)
SELECT deg.node, degree,
       coalesce(n_triangles, 0) AS n_triangles,
       CASE WHEN degree >= 2 THEN
         CAST((2 * coalesce(n_triangles,0) * 1000000)
              // (degree * (degree - 1)) AS BIGINT)
       ELSE 0 END AS clustering_ppm
FROM deg LEFT JOIN pn USING (node)
""",
        # three power-iteration rounds unrolled as CTEs; // is floor
        # division on the all-positive ranks, matching Spark's div
        "pagerank_cowindow": """
WITH wu AS (SELECT DISTINCT
                CAST((floor(epoch(ts)/600)+1)*600 AS BIGINT) we,
                user_id AS u FROM events),
e AS (SELECT DISTINCT a.u AS src, b.u AS dst
      FROM wu a JOIN wu b USING (we) WHERE a.u != b.u),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src, count(*) AS out_deg FROM e GROUP BY 1),
r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
r1 AS (SELECT n.node,
              CAST(150000 + (850 * coalesce(s.in_sum,0)) // 1000
                   AS BIGINT) AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst, sum(r.r // d.out_deg) AS in_sum
         FROM r0 r JOIN deg d ON r.node = d.src JOIN e ON e.src = d.src
         GROUP BY 1) s ON n.node = s.dst),
r2 AS (SELECT n.node,
              CAST(150000 + (850 * coalesce(s.in_sum,0)) // 1000
                   AS BIGINT) AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst, sum(r.r // d.out_deg) AS in_sum
         FROM r1 r JOIN deg d ON r.node = d.src JOIN e ON e.src = d.src
         GROUP BY 1) s ON n.node = s.dst),
r3 AS (SELECT n.node,
              CAST(150000 + (850 * coalesce(s.in_sum,0)) // 1000
                   AS BIGINT) AS r
       FROM nodes n LEFT JOIN (
         SELECT e.dst, sum(r.r // d.out_deg) AS in_sum
         FROM r2 r JOIN deg d ON r.node = d.src JOIN e ON e.src = d.src
         GROUP BY 1) s ON n.node = s.dst)
SELECT node, r AS rank_ppm FROM r3
""",
        # the stream-maintained counts snapshot must reproduce the
        # batch seasonal flags exactly — same oracle as the batch op
    }
    return out
