"""Graph analytics over relationship tables: fixed-iteration
PageRank (power iteration with a damping factor, Brin & Page 1998)
as a sequence of keyed join+aggregate rounds — the label-propagation
sibling of ``dedup.neardup_clusters``.

Why fixed-iteration: a convergence loop's iteration count depends on
float tolerances and would make results engine-dependent; a FIXED
number of power-iteration rounds with ALL-INTEGER rank arithmetic is
deterministic everywhere (the DuckDB oracle unrolls the same rounds
as CTEs and must agree bit-for-bit):

- ranks are ppm-scaled BIGINTs, initialized to 10^6 per node;
- each round: ``contrib(u) = rank(u) div out_deg(u)`` per edge,
  ``rank'(v) = base + (d_num · Σ contrib) div d_den`` with the
  damping ratio d_num/d_den (default 850/1000) and
  ``base = ((d_den − d_num) · 10^6) div d_den``;
- integer floor-division mass loss is deliberate and identical on
  both engines (this is the unnormalized per-node form; dangling
  nodes simply leak their mass, the standard simplification).

Scale shape per round: one keyed equi-join (ranks ⋈ edges on src —
ranks and out-degrees are |V|-sized, edges |E|-sized, both hash-
partitioned on the join key) and one keyed aggregation on dst;
``iters`` rounds = ``iters`` shuffles, never a cartesian and never
driver-side state.  Skewed in-degree (a celebrity node) behaves like
any hot aggregation key — AQE handles moderate skew; pre-aggregate
per (dst, salt) for pathological graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank_fixed(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    d_num: int = 850,
    d_den: int = 1000,
) -> DataFrame:
    """Fixed-iteration integer PageRank over a directed edge list.
    Output: ``node, rank_ppm`` (BIGINT) after ``iters`` rounds.
    For an undirected graph pass both edge directions."""
    if not 0 < d_num < d_den:
        raise ValueError("need 0 < d_num < d_den")
    e = edges.select(
        F.col(src).cast("bigint").alias("src"),
        F.col(dst).cast("bigint").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("out_deg")
    )
    base = ((d_den - d_num) * 1_000_000) // d_den
    ranks = nodes.withColumn(
        "rank_ppm", F.lit(1_000_000).cast("bigint")
    )
    for _ in range(iters):
        contrib = (
            ranks.join(deg, ranks["node"] == deg["src"])
            .select(
                "src",
                F.expr("rank_ppm div out_deg").alias("contrib"),
            )
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").cast("bigint").alias("in_sum"))
        )
        ranks = (
            nodes.join(
                contrib, nodes["node"] == contrib["dst"], "left"
            )
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr(
                        f"({d_num} * coalesce(in_sum, 0))"
                        f" div {d_den}"
                    )
                ).cast("bigint").alias("rank_ppm"),
            )
        )
    return ranks


def cowindow_user_edges(
    events: DataFrame, size_sec: int = 600
) -> DataFrame:
    """Directed co-occurrence edge list: u→v for every pair of
    distinct users active in the same ``size_sec`` tumbling window
    (both directions emitted, so the graph is undirected).  The
    "worked the same shift" / co-session affinity graph.

    Scale shape: distinct (window, user) first (keyed aggregation —
    collapses per-user event volume), then a self equi-join ON THE
    WINDOW KEY.  Pair fan-out is Σ_w k_w² over per-window distinct-
    user counts k_w — bounded by windows × (active users per window)²,
    not by event volume; for heavy-tailed windows cap or sample
    per-window users upstream (the LSH hot-bucket discipline)."""
    wu = (
        events.select(
            (
                (F.floor(F.unix_timestamp("ts") / size_sec) + 1)
                * size_sec
            ).cast("bigint").alias("we_sec"),
            F.col("user_id").cast("bigint").alias("u"),
        )
        .distinct()
    )
    other = wu.select("we_sec", F.col("u").alias("v"))
    return (
        wu.join(other, "we_sec")
        .filter(F.col("u") != F.col("v"))
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .distinct()
    )


def triangle_count(edges: DataFrame, src: str = "src",
                   dst: str = "dst") -> DataFrame:
    """Per-node triangle counts and local clustering coefficient over
    an undirected graph (edges may be given in either or both
    directions; they are canonicalized).  The classic cohesion
    metric: a node whose neighbors also know each other closes
    triangles (MMDS ch. 10 / Newman's clustering coefficient).

    Algorithm: DEGREE-ORDERED orientation (the Chiba–Nishizeki /
    "forward" method): orient every edge from its lower-(degree,
    node) endpoint to the higher one, enumerate wedges only between
    pairs of OUT-neighbors of a common source, and close each wedge
    against the canonical edge set — every triangle found exactly
    once from its lowest-ordered corner.  Why the orientation
    matters: naive wedge enumeration costs Σ deg(v)² and melts on
    skewed degree distributions; out-degrees under the degree order
    are bounded by O(√E), capping total WEDGES at O(E^1.5).  What no
    enumeration can cap is the OUTPUT: a clique of m duplicates holds
    m³/6 triangles (the 1×/3×/10× stress measured 36–43× runtime at
    10× rows on a mass-duplicate corpus with either algorithm) — so
    collapse exact-duplicate keys FIRST (``dedup.dedup_exact`` /
    ``media_dedup``) and run triangles on the deduplicated sparse
    graph, where the stress measures near-linear.  All joins keyed,
    no cartesian.  Clustering coefficient is kept
    exact-integer: ``cc_ppm = (2·tri·10^6) div (deg·(deg−1))``
    (0 when deg < 2).

    Output: ``node, degree, n_triangles, clustering_ppm``."""
    raw = edges.select(
        F.col(src).cast("bigint").alias("u"),
        F.col(dst).cast("bigint").alias("v"),
    ).filter(F.col("u") != F.col("v"))
    und = raw.select(
        F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    )
    # attach (degree, node) order keys to both endpoints, then orient
    # low -> high; ties broken by node id so the order is total
    da = deg.select(
        F.col("node").alias("a"), F.col("degree").alias("dega")
    )
    db = deg.select(
        F.col("node").alias("b"), F.col("degree").alias("degb")
    )
    ed = und.join(da, "a").join(db, "b")
    a_first = (F.col("dega") < F.col("degb")) | (
        (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
    )
    oe = ed.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(a_first, F.col("degb")).otherwise(F.col("dega")).alias(
            "dstdeg"
        ),
    )
    x, y = oe.alias("x"), oe.alias("y")
    # wedges between two out-neighbors of one source, (v, w) taken in
    # the same (degree, node) order so each pair appears once
    wedges = x.join(y, F.col("x.src") == F.col("y.src")).filter(
        (F.col("x.dstdeg") < F.col("y.dstdeg"))
        | (
            (F.col("x.dstdeg") == F.col("y.dstdeg"))
            & (F.col("x.dst") < F.col("y.dst"))
        )
    ).select(
        F.col("x.src").alias("u"),
        F.col("x.dst").alias("v"),
        F.col("y.dst").alias("w"),
    )
    tri = wedges.join(
        und.select(
            F.col("a").alias("_ca"), F.col("b").alias("_cb")
        ),
        (F.least("v", "w") == F.col("_ca"))
        & (F.greatest("v", "w") == F.col("_cb")),
    ).select("u", "v", "w")
    per_node = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("w").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0))
            .cast("bigint")
            .alias("n_triangles"),
        )
        .withColumn(
            "clustering_ppm",
            F.when(
                F.col("degree") >= 2,
                F.expr(
                    "CAST((2 * n_triangles * 1000000)"
                    " div (degree * (degree - 1)) AS BIGINT)"
                ),
            ).otherwise(F.lit(0)).cast("bigint"),
        )
    )


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst",
    max_iters: int = 20,
) -> DataFrame:
    """Connected components of an undirected graph: every node
    labeled with the MIN node id of its component — the generic
    surface over the pointer-jumped min-label propagation of
    ``dedup.neardup_clusters`` (one keyed join + min-aggregate per
    round, exact convergence check, no driver-side graph; see
    :func:`connected_components_star` for the O(log n)-round
    star-contraction alternative).

    Output: ``node, component_id`` (BIGINT, BIGINT)."""
    from flink_window_dgim_traffic_spark.operators.dedup import (
        neardup_clusters,
    )

    pairs = edges.select(
        F.col(src).cast("bigint").alias("doc_a"),
        F.col(dst).cast("bigint").alias("doc_b"),
    )
    return neardup_clusters(pairs, max_iters=max_iters).select(
        F.col("doc_id").alias("node"),
        F.col("cluster_id").alias("component_id"),
    )


def bfs_distance(
    edges: DataFrame,
    sources: list[int],
    src: str = "src",
    dst: str = "dst",
    max_depth: int = 4,
) -> DataFrame:
    """Bounded-depth breadth-first distances from a source set over
    an undirected graph — the "within k hops of X" reachability query
    (fraud rings, influence neighborhoods).  FIXED depth keeps the
    round count deterministic and SQL-mirrorable (the oracle runs the
    same bounded expansion as a depth-guarded recursive CTE).

    Each round is one keyed equi-join (current distances ⋈ edges) +
    one min-aggregate — frontier-sized work, ``max_depth`` shuffles,
    no driver-side state beyond the constant source list.  Nodes not
    reached within ``max_depth`` are absent from the output.

    Output: ``node, dist`` (BIGINT, BIGINT; dist 0 = a source)."""
    e = edges.select(
        F.col(src).cast("bigint").alias("a"),
        F.col(dst).cast("bigint").alias("b"),
    )
    und = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct()
    spark = edges.sparkSession
    dist = spark.createDataFrame(
        [(int(s), 0) for s in sources], "node bigint, dist bigint"
    )
    for _ in range(max_depth):
        step = (
            dist.join(und, dist["node"] == und["a"])
            .select(
                F.col("b").alias("node"),
                (F.col("dist") + 1).alias("dist"),
            )
        )
        dist = (
            dist.unionByName(step)
            .groupBy("node")
            .agg(F.min("dist").cast("bigint").alias("dist"))
        )
    return dist


def kcore_fixed(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    rounds: int = 6,
) -> DataFrame:
    """k-core decomposition by FIXED-round simultaneous peeling
    (Matula & Beck 1983's peeling order, batched): each round drops
    every node whose current degree is below ``k``, together with its
    edges, and after ``rounds`` rounds the surviving nodes are
    reported with their degree inside the surviving subgraph.  When
    the peel has converged within ``rounds`` (no sub-``k`` node left —
    extra rounds are no-ops) the output IS the exact k-core; the
    fixed round count keeps the computation SQL-mirrorable the same
    way :func:`pagerank_fixed` and :func:`bfs_distance` are (the
    DuckDB oracle unrolls the identical rounds as CTEs and must agree
    bit-for-bit), and convergence at the chosen ``rounds`` is pinned
    per-dataset in tests against :func:`kcore`.

    Scale shape per round: one keyed degree aggregation (map-side
    combinable) + two semi-joins of the edge list against the
    |V|-sized survivor set — all hash-partitioned equi-joins, no
    cartesian, no driver-side graph state.  Each round's survivor
    edge list is pinned with an eager ``localCheckpoint``: the round
    body references it three times (degree build + both semi-join
    probes), so an un-truncated lineage would grow ~3× per round and
    blow up analysis long before data size matters (measured: 12
    un-checkpointed rounds hang the optimizer on a 30-node graph) —
    the same per-iteration discipline as ``dedup.neardup_clusters``.

    Output: ``node, core_degree`` (BIGINT, BIGINT) — nodes of the
    k-core with their within-core degree."""
    e = edges.select(
        F.col(src).cast("bigint").alias("a"),
        F.col(dst).cast("bigint").alias("b"),
    )
    und = (
        e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(rounds):
        keep = (
            und.groupBy("a")
            .agg(F.count(F.lit(1)).alias("dg"))
            .filter(F.col("dg") >= k)
            .select("a")
        )
        und = (
            und.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return und.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    ).select(F.col("a").alias("node"), "core_degree")


def kcore(
    edges: DataFrame,
    k: int = 2,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Exact k-core: the convergence-checked production twin of
    :func:`kcore_fixed` — peels until NO node is below degree ``k``
    (one exact scalar edge-count check per round, the same
    convergence discipline as ``dedup.neardup_clusters``), with an
    eager ``localCheckpoint`` per round so the loop's lineage stays
    O(1) instead of O(rounds).  Equal to ``kcore_fixed(rounds=R)``
    for any R ≥ the convergence depth (pinned in tests).

    Output: ``node, core_degree`` (BIGINT, BIGINT)."""
    e = edges.select(
        F.col(src).cast("bigint").alias("a"),
        F.col(dst).cast("bigint").alias("b"),
    )
    und = (
        e.unionByName(
            e.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = und.count()
    for _ in range(max_iters):
        keep = (
            und.groupBy("a")
            .agg(F.count(F.lit(1)).alias("dg"))
            .filter(F.col("dg") >= k)
            .select("a")
        )
        und = (
            und.join(keep, "a", "left_semi")
            .join(keep.select(F.col("a").alias("b")), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
        remaining = und.count()
        if remaining == n_edges:
            break
        n_edges = remaining
    return und.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("core_degree")
    ).select(F.col("a").alias("node"), "core_degree")


def ppr_fixed(
    edges: DataFrame,
    sources: list[int],
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    d_num: int = 850,
    d_den: int = 1000,
) -> DataFrame:
    """Fixed-iteration integer PERSONALIZED PageRank: random walks
    restart only at the ``sources`` set, so ranks measure proximity
    to those seeds rather than global centrality — the
    "related items / local influence" query (recommendations, fraud
    neighborhoods) that plain PageRank can't answer.  Same all-
    integer discipline as :func:`pagerank_fixed` (ppm-scaled BIGINT
    ranks, ``iters`` unrollable rounds, floor-div mass loss identical
    cross-engine): initialization and the restart base are 10^6 for
    source nodes and 0 elsewhere; each round

        rank'(v) = base_v + (d_num · Σ contrib) div d_den.

    Scale shape per round: identical to ``pagerank_fixed`` — one
    keyed equi-join + one keyed aggregation, ``iters`` shuffles, no
    driver-side state beyond the constant source list.

    Output: ``node, rank_ppm`` (BIGINT, BIGINT)."""
    if not 0 < d_num < d_den:
        raise ValueError("need 0 < d_num < d_den")
    if not sources:
        raise ValueError("need at least one source node")
    e = edges.select(
        F.col(src).cast("bigint").alias("src"),
        F.col(dst).cast("bigint").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("bigint").alias("out_deg")
    )
    src_set = ",".join(str(int(x)) for x in sorted(set(sources)))
    base_col = F.expr(
        f"CASE WHEN node IN ({src_set}) THEN"
        f" {((d_den - d_num) * 1_000_000) // d_den} ELSE 0 END"
    ).cast("bigint")
    init_col = F.expr(
        f"CASE WHEN node IN ({src_set}) THEN 1000000 ELSE 0 END"
    ).cast("bigint")
    ranks = nodes.withColumn("rank_ppm", init_col)
    for _ in range(iters):
        contrib = (
            ranks.join(deg, ranks["node"] == deg["src"])
            .select(
                "src",
                F.expr("rank_ppm div out_deg").alias("contrib"),
            )
            .join(e, "src")
            .groupBy("dst")
            .agg(F.sum("contrib").cast("bigint").alias("in_sum"))
        )
        ranks = (
            nodes.join(
                contrib, nodes["node"] == contrib["dst"], "left"
            )
            .select(
                "node",
                (
                    base_col
                    + F.expr(
                        f"({d_num} * coalesce(in_sum, 0))"
                        f" div {d_den}"
                    )
                ).cast("bigint").alias("rank_ppm"),
            )
        )
    return ranks


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 50,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the O(log n)-round alternative to
    :func:`connected_components`' min-label propagation, whose round
    count is O(component diameter).  On a near-dup CHAIN (doc A ~ B ~
    C ~ …, the transitive-overlap shape real crawls produce) label
    propagation pays diameter/2 joins while star-contraction pays
    ~log₂(n): at 100 TB the round count IS the job time, so the
    log-round algorithm is the scale path (tests pin a 1024-node path
    converging in ≤ 14 rounds).

    Each round is two keyed aggregations + joins over the edge list —
    no driver-side graph, state is only the (a, b) edge DataFrame,
    checkpointed per round to keep lineage flat:

    - large-star: every node u connects its STRICTLY LARGER
      neighbors to ``m(u) = min(Γ(u) ∪ {u})``
    - small-star: every node u connects its ≤-neighbors and itself
      to that minimum

    Both preserve connectivity and monotonically contract components
    onto their minimum id (the paper's potential argument); the fixed
    point is a star forest rooted at each component's min.

    Output: ``node, component_id`` (BIGINT, BIGINT) — identical to
    :func:`connected_components` (equality asserted in tests)."""
    e = (
        edges.select(
            F.col(src).cast("bigint").alias("x"),
            F.col(dst).cast("bigint").alias("y"),
        )
        .filter(F.col("x") != F.col("y"))
        .select(
            F.least("x", "y").alias("a"),
            F.greatest("x", "y").alias("b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _star(cur: DataFrame, large: bool) -> DataFrame:
        nbrs = cur.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).union(cur.select(F.col("b").alias("u"), F.col("a").alias("v")))
        if large:
            # min over ALL neighbors and self; attach v > u to it
            mins = nbrs.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m")
            )
            out = (
                nbrs.join(mins, "u")
                .filter(F.col("v") > F.col("u"))
                .select(F.col("m").alias("a"), F.col("v").alias("b"))
            )
        else:
            # neighbors ≤ u (parents) and self; attach all of them
            le = nbrs.filter(F.col("v") <= F.col("u"))
            mins = le.groupBy("u").agg(F.min("v").alias("m"))
            out = (
                le.join(mins, "u")
                .select("m", F.col("v").alias("t"))
                .union(mins.select("m", F.col("u").alias("t")))
                .filter(F.col("m") != F.col("t"))
                .select(F.col("m").alias("a"), F.col("t").alias("b"))
            )
        return out.distinct()

    converged = False
    prev_n = e.count()
    for _ in range(max_iters):
        # r13: LAZY checkpoint between the stars and on the round
        # output, with the count as the single materializing action —
        # one job per round.  The mid pin is load-bearing: small-star
        # consumes its input twice (symmetric union + min join), and
        # unpinned the large-star subtree re-executed ~4× per round
        # (measured on the sf0.1 embedding near-dup graph: 6.5 s vs
        # 4.1 s end-to-end; the r12 pin-both-aliases lesson).  The
        # previous round's count is cached driver-side instead of
        # re-counting ``e`` every round.
        mid = _star(e, large=True).localCheckpoint(eager=False)
        new = _star(mid, large=False).localCheckpoint(eager=False)
        n = new.count()
        # fixed point: canonical distinct edge sets equal (the
        # exceptAll only runs on count-stable rounds)
        if n == prev_n and new.exceptAll(e).isEmpty():
            e = new
            converged = True
            break
        e, prev_n = new, n
    if not converged:
        # On a non-star edge set the parent extraction below would
        # fan out to conflicting component_id rows per node — refuse
        # to return a possibly-inconsistent labeling.  log₂(n) rounds
        # suffice (paper bound), so hitting this means max_iters was
        # set far too low for the graph, not a data problem.
        raise RuntimeError(
            f"connected_components_star did not reach its fixed point "
            f"in max_iters={max_iters} rounds; raise max_iters "
            f"(~log2(n) rounds are needed)"
        )
    parent = e.select(
        F.col("b").alias("node"), F.col("a").alias("component_id")
    )
    return nodes.join(parent, "node", "left").select(
        "node",
        F.coalesce("component_id", "node").alias("component_id"),
    )
