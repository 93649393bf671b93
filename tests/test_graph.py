"""pagerank_fixed / cowindow_user_edges (operators/graph.py): the
integer power iteration is verified against hand-computed ranks on
tiny graphs and a pure-Python reference on a random graph; the edge
builder is pinned on a constructed window layout."""

import datetime as dt
import random

from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators.graph import (
    cowindow_user_edges,
    pagerank_fixed,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _py_pagerank(edges, iters=3, d_num=850, d_den=1000):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    base = ((d_den - d_num) * 1_000_000) // d_den
    r = {n: 1_000_000 for n in nodes}
    for _ in range(iters):
        in_sum = {n: 0 for n in nodes}
        for u, v in edges:
            in_sum[v] += r[u] // deg[u]
        r = {n: base + (d_num * in_sum[n]) // d_den for n in nodes}
    return r


def _run(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    got = {
        r.node: r.rank_ppm
        for r in pagerank_fixed(df, iters=iters).collect()
    }
    assert got == _py_pagerank(edges, iters)


def test_two_node_cycle(spark):
    # symmetric 2-cycle: ranks stay equal; after any iteration
    # r = 150000 + 850*r_prev//1000 (deg 1)
    edges = [(1, 2), (2, 1)]
    _run(spark, edges, iters=1)
    _run(spark, edges, iters=3)
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = {r.node: r.rank_ppm for r in pagerank_fixed(df, iters=1).collect()}
    assert out == {1: 1_000_000, 2: 1_000_000}  # fixed point


def test_star_graph_center_accumulates(spark):
    # leaves 2..5 each point at 1 and receive only from 1
    edges = [(i, 1) for i in range(2, 6)] + [(1, i) for i in range(2, 6)]
    _run(spark, edges, iters=3)
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = {r.node: r.rank_ppm for r in pagerank_fixed(df, iters=3).collect()}
    assert out[1] > out[2]
    assert len({out[i] for i in range(2, 6)}) == 1  # leaves symmetric


def test_dangling_node_keeps_base_only_inflow(spark):
    # 1 -> 2, 2 has no out-edges (dangling): node 1 gets base only
    edges = [(1, 2)]
    _run(spark, edges, iters=2)
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = {r.node: r.rank_ppm for r in pagerank_fixed(df, iters=2).collect()}
    assert out[1] == 150_000  # no in-edges: damping base only


def test_random_graph_matches_reference(spark):
    rng = random.Random(7)
    edges = list(
        {
            (rng.randint(1, 12), rng.randint(1, 12))
            for _ in range(40)
        }
    )
    edges = [(u, v) for u, v in edges if u != v]
    _run(spark, edges, iters=4)


def test_invalid_damping_rejected(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "src: bigint, dst: bigint")
    with pytest.raises(ValueError):
        pagerank_fixed(df, d_num=1000, d_den=1000)


def test_cowindow_edges(spark):
    # window A: users 1,2 (+ a duplicate event); window B: user 3 alone
    rows = [
        (1, T0 + dt.timedelta(seconds=10), 1),
        (2, T0 + dt.timedelta(seconds=20), 2),
        (3, T0 + dt.timedelta(seconds=30), 1),  # dup (window, user)
        (4, T0 + dt.timedelta(seconds=700), 3),
    ]
    df = spark.createDataFrame(
        rows, "event_id: bigint, ts: timestamp, user_id: bigint"
    )
    got = {
        (r.src, r.dst)
        for r in cowindow_user_edges(df, 600).collect()
    }
    assert got == {(1, 2), (2, 1)}


def test_triangle_count_hand_vector(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        triangle_count,
    )

    # K3 on {1,2,3} plus a pendant 4-1; edges given messy (both
    # directions, duplicates) to exercise canonicalization
    edges = [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (4, 1)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = {r.node: r for r in triangle_count(df).collect()}
    assert out[1].degree == 3 and out[1].n_triangles == 1
    assert out[2].degree == 2 and out[2].n_triangles == 1
    assert out[3].degree == 2 and out[3].n_triangles == 1
    assert out[4].degree == 1 and out[4].n_triangles == 0
    # node 2: deg 2, 1 triangle -> cc = 2*1/(2*1) = 1.0
    assert out[2].clustering_ppm == 1_000_000
    # node 1: deg 3, 1 triangle -> 2*1e6 // 6
    assert out[1].clustering_ppm == 2_000_000 // 6
    assert out[4].clustering_ppm == 0


def test_triangle_count_square_no_triangles(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        triangle_count,
    )

    edges = [(1, 2), (2, 3), (3, 4), (4, 1)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = triangle_count(df).collect()
    assert all(r.n_triangles == 0 for r in out)
    assert all(r.clustering_ppm == 0 for r in out)


def test_connected_components_generic(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        connected_components,
    )

    edges = [(1, 2), (2, 3), (5, 6), (7, 7)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = {
        r.node: r.component_id
        for r in connected_components(df).collect()
    }
    assert out[1] == out[2] == out[3] == 1
    assert out[5] == out[6] == 5


def test_bfs_distance_hand_vector(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        bfs_distance,
    )

    # path 1-2-3-4-5-6 plus shortcut 1-4
    edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (1, 4)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = {
        r.node: r.dist
        for r in bfs_distance(df, [1], max_depth=3).collect()
    }
    # shortcut wins: 4 at dist 1, 5 at 2, 6 at 3; 3 at min(2, 2)=2
    assert out == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2, 6: 3}
    # depth bound: with max_depth=2 node 6 is unreached
    out2 = {
        r.node: r.dist
        for r in bfs_distance(df, [1], max_depth=2).collect()
    }
    assert 6 not in out2 and out2[5] == 2


def test_bfs_multiple_sources(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        bfs_distance,
    )

    edges = [(1, 2), (2, 3), (3, 4)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    out = {
        r.node: r.dist
        for r in bfs_distance(df, [1, 4], max_depth=2).collect()
    }
    assert out == {1: 0, 4: 0, 2: 1, 3: 1}


def _py_kcore(edges, k):
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    while True:
        deg = {}
        for a, _ in und:
            deg[a] = deg.get(a, 0) + 1
        low = {n for n, d in deg.items() if d < k}
        if not low:
            break
        und = {
            (a, b) for a, b in und if a not in low and b not in low
        }
    deg = {}
    for a, _ in und:
        deg[a] = deg.get(a, 0) + 1
    return deg


def test_kcore_hand_vector(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        kcore,
        kcore_fixed,
    )

    # triangle {1,2,3} with a tail 3-4-5: the 2-core is the triangle
    # (5 peels first, exposing 4 — a 2-round cascade)
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    want = {1: 2, 2: 2, 3: 2}
    got = {r.node: r.core_degree for r in kcore(df, k=2).collect()}
    assert got == want
    got_f = {
        r.node: r.core_degree
        for r in kcore_fixed(df, k=2, rounds=4).collect()
    }
    assert got_f == want
    # k=3: nothing survives
    assert kcore(df, k=3).count() == 0


def test_kcore_random_matches_python(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        kcore,
        kcore_fixed,
    )

    rng = random.Random(7)
    edges = list(
        {
            (a, b)
            for a, b in (
                sorted(rng.sample(range(30), 2)) for _ in range(90)
            )
        }
    )
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    for k in (2, 4):
        want = _py_kcore(edges, k)
        got = {r.node: r.core_degree for r in kcore(df, k=k).collect()}
        assert got == want, f"k={k}"
        # fixed-round twin agrees once rounds >= convergence depth
        got_f = {
            r.node: r.core_degree
            for r in kcore_fixed(df, k=k, rounds=12).collect()
        }
        assert got_f == want, f"fixed k={k}"


def _py_ppr(edges, sources, iters=3, d_num=850, d_den=1000):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    srcs = set(sources)
    base = ((d_den - d_num) * 1_000_000) // d_den
    r = {n: (1_000_000 if n in srcs else 0) for n in nodes}
    for _ in range(iters):
        in_sum = {n: 0 for n in nodes}
        for u, v in edges:
            in_sum[v] += r[u] // deg[u]
        r = {
            n: (base if n in srcs else 0)
            + (d_num * in_sum[n]) // d_den
            for n in nodes
        }
    return r


def test_ppr_fixed_matches_python(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        ppr_fixed,
    )

    rng = random.Random(3)
    und = {
        tuple(sorted(rng.sample(range(20), 2))) for _ in range(50)
    }
    edges = [e for p in und for e in (p, p[::-1])]
    df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
    for sources in ([0], [0, 5, 7]):
        want = _py_ppr(edges, sources)
        got = {
            r.node: r.rank_ppm
            for r in ppr_fixed(df, sources).collect()
        }
        assert got == want, f"sources={sources}"
    # seeds dominate their own neighborhood: a seed outranks any
    # node at distance >= 2 from every seed
    got = {
        r.node: r.rank_ppm for r in ppr_fixed(df, [0]).collect()
    }
    nbrs = {v for u, v in edges if u == 0}
    far = set(got) - nbrs - {0}
    if far:
        assert got[0] > max(got[n] for n in far)


def test_kcore_fixed_converged_on_testdata(spark, sf_dir):
    """Pin the driver entry's convergence claim on the REAL
    co-occurrence graph: 6 fixed rounds reach the true k-core (==
    the convergence-checked kcore) at the test SF, for the driver's
    k=8 and for a k with an actual cascade on this graph."""
    from flink_window_dgim_traffic_spark.operators.graph import (
        cowindow_user_edges,
        kcore,
        kcore_fixed,
    )
    from flink_window_dgim_traffic_spark.session import table

    ev = table(spark, sf_dir, "events")
    edges = cowindow_user_edges(ev, 60).localCheckpoint(eager=True)
    for k in (2, 8):
        want = {
            r.node: r.core_degree for r in kcore(edges, k=k).collect()
        }
        got = {
            r.node: r.core_degree
            for r in kcore_fixed(edges, k=k, rounds=6).collect()
        }
        assert got == want, f"k={k}"


def test_star_cc_matches_label_prop_on_random_graphs(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ]
        edges = [(a, b) for a, b in edges if a != b] or [(0, 1)]
        df = spark.createDataFrame(edges, "src: bigint, dst: bigint")
        lp = {
            r.node: r.component_id
            for r in connected_components(df).collect()
        }
        st = {
            r.node: r.component_id
            for r in connected_components_star(df).collect()
        }
        assert st == lp, trial


def test_star_cc_path_graph_log_rounds(spark):
    """The scale claim: a 1024-node PATH (diameter 1023 — the
    transitive near-dup chain shape) must converge within the
    O(log n) star bound.  max_iters=14 would make label propagation
    fail outright here; star contraction finishes with root 0."""
    from flink_window_dgim_traffic_spark.operators.graph import (
        connected_components_star,
    )

    n = 1024
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src: bigint, dst: bigint"
    )
    out = connected_components_star(df, max_iters=14).collect()
    assert len(out) == n
    assert all(r.component_id == 0 for r in out)


def test_star_cc_self_loops_and_singleton_components(spark):
    from flink_window_dgim_traffic_spark.operators.graph import (
        connected_components_star,
    )

    df = spark.createDataFrame(
        [(9, 9), (3, 4), (4, 3), (7, 8)], "src: bigint, dst: bigint"
    )
    out = {
        r.node: r.component_id
        for r in connected_components_star(df).collect()
    }
    # self-loop-only node 9 contributes no edges => absent (same
    # contract as connected_components over pair lists)
    assert out == {3: 3, 4: 3, 7: 7, 8: 7}


def test_incremental_components_matches_batch(spark, tmp_path):
    """Graph IVM: folding edge batches through the star-forest store
    must equal batch CC over the full edge history — including a
    batch whose edge MERGES two existing components — and a replayed
    committed tag must be a no-op (exactly-once)."""
    from flink_window_dgim_traffic_spark.operators.graph import (
        connected_components,
    )
    from flink_window_dgim_traffic_spark.streaming.components import (
        build_components_store,
        read_components,
        refresh_components,
    )

    path = str(tmp_path / "ccstore")
    build_components_store(spark, path)
    batches = [
        [(1, 2), (3, 4)],          # two components
        [(5, 6), (6, 7)],          # a third
        [(2, 3)],                  # MERGES {1,2} and {3,4}
        [(8, 1)],                  # attaches a new node to the merge
    ]
    seen = []
    for i, edges in enumerate(batches):
        seen += edges
        df = spark.createDataFrame(edges, "src bigint, dst bigint")
        assert refresh_components(spark, path, df, tag=f"b{i}") is True
        got = {
            (r.node, r.component_id)
            for r in read_components(spark, path).collect()
        }
        full = spark.createDataFrame(seen, "src bigint, dst bigint")
        expect = {
            (r.node, r.component_id)
            for r in connected_components(full).collect()
        }
        assert got == expect, (i, got, expect)
    # crash-replay: re-delivering a committed batch changes nothing
    df = spark.createDataFrame(batches[-1], "src bigint, dst bigint")
    assert refresh_components(spark, path, df, tag="b3") is False
    got2 = {
        (r.node, r.component_id)
        for r in read_components(spark, path).collect()
    }
    assert got2 == got


def test_incremental_components_state_is_one_edge_per_node(spark, tmp_path):
    """The maintained state must stay O(nodes) however many raw pairs
    arrive: 200 random edges over 20 nodes collapse to ≤ 20 star rows."""
    import random as _r

    from flink_window_dgim_traffic_spark.streaming.components import (
        build_components_store,
        read_components,
        refresh_components,
    )

    rng = _r.Random(5)
    path = str(tmp_path / "ccstore2")
    build_components_store(spark, path)
    for i in range(4):
        edges = [
            (rng.randrange(20), rng.randrange(20)) for _ in range(50)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        refresh_components(
            spark,
            path,
            spark.createDataFrame(edges, "src bigint, dst bigint"),
            tag=f"b{i}",
        )
    rows = read_components(spark, path).collect()
    assert len(rows) <= 20


def test_components_store_gc(spark, tmp_path):
    """GC keeps the last N snapshots' data (and every marker for
    replay-skip), and the store stays fully readable after GC."""
    import os

    from flink_window_dgim_traffic_spark.streaming.components import (
        build_components_store,
        gc_components_store,
        read_components,
        refresh_components,
    )

    path = str(tmp_path / "ccgc")
    build_components_store(spark, path)
    for i in range(5):
        refresh_components(
            spark,
            path,
            spark.createDataFrame(
                [(i * 2, i * 2 + 1)], "src bigint, dst bigint"
            ),
            tag=f"b{i}",
        )
    snaps = lambda: sorted(os.listdir(f"{path}/star"))  # noqa: E731
    assert len(snaps()) == 6  # init + 5 refreshes
    removed = gc_components_store(path, keep=2)
    assert removed == 4 and len(snaps()) == 2
    # replay-skip survives GC (markers intact)...
    df = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    assert refresh_components(spark, path, df, tag="b4") is False
    # ...and current state is whole
    got = {
        (r.node, r.component_id)
        for r in read_components(spark, path).collect()
    }
    assert got == {(i, i - i % 2) for i in range(10)}
