#!/usr/bin/env python
"""Round-12 stress study (VERDICT r11 ask #5): the 100x rung for the
GRAPH family — the one family absent from the r11 rung table, and the
one where 100x surprises live (iterative joins, localCheckpoint
lineage, co-window edge fan-out).

Fixture discipline (the r11 lessons, applied):
- events replicas shift BOTH the time window AND the user-id space,
  so replicas are disjoint subgraphs: nodes and edges grow linearly
  and the iterative rounds do linearly more work.  (Time-shift alone
  would replay the SAME user set — edge weights would grow but the
  graph wouldn't, and the iterations would measure nothing new.)
- supplier replicas perturb the NAME with a per-replica repeated
  2-digit suffix (edit distance >= 2 between any two replicas of one
  name), so the edit-distance<=1 edge build keeps its within-replica
  near-dup structure without creating 100-way cross-replica cliques
  (the r11 prefix-tag fixture artifact).

Operators, exactly as the driver entries run them:
- kcore_users_60s          kcore_fixed(cowindow(60), k=8, rounds=6)
- pagerank_cowindow        pagerank_fixed(cowindow(600), iters=3)
- ppr_cowindow             ppr_fixed(cowindow(600), [0,1], iters=3)
- components_star_fuzzy_suppliers   star contraction over PassJoin
- triangles_fuzzy_suppliers         wedge join over PassJoin

Prints one JSON line per measurement (wall sec per rung, plus the
30x->100x ratio vs the 10/3 linear ideal).  /tmp staging;
re-runnable.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    graph as G,
    matching as MT,
)
from flink_window_dgim_traffic_spark.session import (  # noqa: E402
    get_spark,
    table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_r12_stress"


def _t(fn, reps: int = 1) -> float:
    """Warm run + min-of-N (bench.py discipline; the rung RATIO is
    the signal)."""
    fn()
    runs = []
    for _ in range(reps):
        t0 = time.time()
        fn()
        runs.append(time.time() - t0)
    return round(min(runs), 3)


def _emit(**kw) -> None:
    print(json.dumps(kw), flush=True)


def _scaled_graph_events(spark, scale: int):
    """Events replicated with disjoint time windows AND disjoint
    user-id spaces per replica (see module docstring)."""
    path = f"{OUT}/events_graph_x{scale}.parquet"
    if not os.path.exists(path):
        ev = table(spark, SF_DIR, "events")
        lo, hi, n, nu = ev.agg(
            F.min(F.unix_timestamp("ts")),
            F.max(F.unix_timestamp("ts")),
            F.count(F.lit(1)),
            F.max("user_id"),
        ).collect()[0]
        span = int(hi - lo) + 86400
        uspan = int(nu) + 1
        parts = [
            ev.select(
                (F.col("event_id") + k * n).alias("event_id"),
                F.timestamp_seconds(
                    F.unix_timestamp("ts") + F.lit(k * span)
                ).alias("ts"),
                (F.col("user_id") + k * uspan).alias("user_id"),
                "event_type",
                "value",
            )
            for k in range(scale)
        ]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        scaled.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _scaled_suppliers(spark, scale: int):
    """Suppliers replicated with the 2-digit replica tag injected
    into BOTH halves of the name (mid-string AND suffix).  Two
    lessons combined: the tag must make replicas edit distance >= 2
    apart (no cross-replica edges), AND it must land in EVERY
    PassJoin segment — a suffix-only tag leaves the first half
    shared verbatim across all replicas, which makes that signature
    bucket O(corpus) wide and the candidate join quadratic (measured
    142x wall at 30x before this fix — the exact hot-bucket
    pathology edit_distance_join's max_bucket guard documents)."""
    path = f"{OUT}/supplier_x{scale}.parquet"
    if not os.path.exists(path):
        sup = table(spark, SF_DIR, "supplier")
        n = sup.count()
        parts = [
            sup.select(
                (F.col("s_suppkey") + k * n).alias("s_suppkey"),
                F.concat(
                    F.substring("s_name", 1, 9),
                    F.lit(f"{k:02d}"),
                    F.substring("s_name", 10, 99),
                    F.lit(f"{k:02d}"),
                ).alias("s_name"),
                "s_nationkey",
            )
            for k in range(scale)
        ]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        scaled.repartition(32).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def run_noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(
        app_name="bench_r12_stress",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    )
    os.makedirs(OUT, exist_ok=True)
    rungs = tuple(
        int(x)
        for x in os.environ.get(
            "SPARK_GRAFT_STRESS_RUNGS", "1,30,100"
        ).split(",")
    )
    walls: dict[str, dict[int, float]] = {}
    for scale in rungs:
        ev = _scaled_graph_events(spark, scale)
        sup = _scaled_suppliers(spark, scale)
        # edge builds staged once per rung like the registry's
        # session cache (the driver entries amortize the same way);
        # the edge-build cost is reported as its own row
        t_edges60 = _t(
            lambda: run_noop(G.cowindow_user_edges(ev, 60))
        )
        edges60 = G.cowindow_user_edges(ev, 60).localCheckpoint(
            eager=True
        )
        t_edges600 = _t(
            lambda: run_noop(G.cowindow_user_edges(ev, 600))
        )
        edges600 = G.cowindow_user_edges(ev, 600).localCheckpoint(
            eager=True
        )
        t_sup_edges = _t(
            lambda: run_noop(
                MT.edit_distance_join(sup, "s_suppkey", "s_name", 1)
            )
        )
        sup_edges = MT.edit_distance_join(
            sup, "s_suppkey", "s_name", 1
        ).localCheckpoint(eager=True)
        cases = {
            "cowindow_edges_60s_build": None,  # timed above
            "cowindow_edges_600s_build": None,
            "fuzzy_supplier_edges_build": None,
            "kcore_users_60s": lambda: run_noop(
                G.kcore_fixed(edges60, k=8, rounds=6)
            ),
            "pagerank_cowindow": lambda: run_noop(
                G.pagerank_fixed(edges600, iters=3)
            ),
            "ppr_cowindow": lambda: run_noop(
                G.ppr_fixed(edges600, [0, 1], iters=3)
            ),
            "components_star_fuzzy_suppliers": lambda: run_noop(
                G.connected_components_star(sup_edges, "id_lo", "id_hi")
            ),
            "triangles_fuzzy_suppliers": lambda: run_noop(
                G.triangle_count(sup_edges, "id_lo", "id_hi")
            ),
        }
        pre = {
            "cowindow_edges_60s_build": t_edges60,
            "cowindow_edges_600s_build": t_edges600,
            "fuzzy_supplier_edges_build": t_sup_edges,
        }
        n_e60 = edges60.count()
        n_e600 = edges600.count()
        n_se = sup_edges.count()
        _emit(
            study="graph_rung", scale=scale,
            edges_60s=n_e60, edges_600s=n_e600, supplier_edges=n_se,
        )
        for name, fn in cases.items():
            w = pre[name] if fn is None else _t(fn)
            walls.setdefault(name, {})[scale] = w
            _emit(study="graph_rung", scale=scale, op=name, wall_sec=w)
        for df in (edges60, edges600, sup_edges):
            df.unpersist()
    if 30 in walls.get("kcore_users_60s", {}) and 100 in walls.get(
        "kcore_users_60s", {}
    ):
        for name, per in walls.items():
            if 30 in per and 100 in per and per[30] > 0:
                _emit(
                    study="graph_rung_ratio",
                    op=name,
                    ratio_30_to_100=round(per[100] / per[30], 2),
                    linear_ideal=round(100 / 30, 2),
                )


if __name__ == "__main__":
    main()
