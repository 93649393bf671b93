#!/usr/bin/env python
"""Scale-stress the bucketed dedup/similarity paths: replicate the
sf0.1 documents/embeddings corpora 1×/3×/10× (replicas are made
deliberately UNRELATED — per-replica word prefixes / dimension
rotations — so true near-dup structure stays constant per row and
runtime growth measures the OPERATOR, not output explosion), then
time the scale-path operators at each size.

The claim under test: every 100 TB-path operator is near-linear in
corpus size (bucketed LSH candidate generation, hash-partitioned
dedup, bounded-state sketches).  A superlinear trend here would mean
a hidden all-pairs or hot-key blowup that the sf0.1 bench can't see.

Writes scaled corpora under /tmp/spark_graft_scaling (re-created per
run) and prints one JSON line per (operator, scale) plus a summary
table with sec and sec-per-1×-row ratios.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from flink_window_dgim_traffic_spark.operators import corpus as C  # noqa: E402
from flink_window_dgim_traffic_spark.operators import dedup as D  # noqa: E402
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    heavy_hitters as HH,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    retrieval as RT,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    rollup as RU,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    analytics as AN,
)
from flink_window_dgim_traffic_spark.operators import graph as G  # noqa: E402
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    itemsets as IT,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    matching as MT,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    multimodal as MM,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    relational as R,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    similarity as S,
)
from flink_window_dgim_traffic_spark.operators import text as T  # noqa: E402
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    windows as W,
)
from flink_window_dgim_traffic_spark.operators import (  # noqa: E402
    sketches as SK,
)
from flink_window_dgim_traffic_spark.session import (  # noqa: E402
    get_spark,
    table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scaling"
SCALES = [
    int(s)
    for s in os.environ.get("SPARK_GRAFT_SCALES", "1,3,10").split(",")
]

# set per scale inside main() so op lambdas can reach scale-keyed
# side state (the persisted MinHash index, the rollup hierarchy)
CTX: dict = {}


def build_scaled(spark, scale: int) -> tuple[str, str]:
    """Replicate documents/embeddings `scale`× with unrelated
    replicas: word prefix r{k} per doc replica (every shingle
    changes), dimension rotation by k per embedding replica."""
    doc_path = f"{OUT}/documents_x{scale}.parquet"
    emb_path = f"{OUT}/embeddings_x{scale}.parquet"
    if not os.path.exists(doc_path):
        docs = table(spark, SF_DIR, "documents")
        n_docs = docs.count()
        parts = []
        for k in range(scale):
            prefixed = F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(F.lit(f"r{k}"), w),
                ),
                " ",
            )
            parts.append(
                docs.select(
                    (F.col("doc_id") + k * n_docs).alias("doc_id"),
                    (prefixed if k else F.col("text")).alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        scaled.write.mode("overwrite").parquet(doc_path)
    if not os.path.exists(emb_path):
        emb = table(spark, SF_DIR, "embeddings")
        n_emb = emb.count()
        dim = len(emb.select("embedding").first()["embedding"])
        parts = []
        for k in range(scale):
            rot = (
                F.concat(
                    F.slice(F.col("embedding"), k % dim + 1, dim),
                    F.slice(F.col("embedding"), 1, k % dim),
                )
                if k
                else F.col("embedding")
            )
            parts.append(
                emb.select(
                    (F.col("vec_id") + k * n_emb).alias("vec_id"),
                    rot.alias("embedding"),
                    "label",
                )
            )
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        scaled.write.mode("overwrite").parquet(emb_path)
    return doc_path, emb_path


def build_scaled_events(spark, scale: int) -> str:
    """Replicate events `scale`× with per-replica TIME SHIFTS past
    the original span, so the window count (and thus the rollup level
    tables) grows linearly with scale — the state dimension a refresh
    actually pays for."""
    path = f"{OUT}/events_x{scale}.parquet"
    if not os.path.exists(path):
        ev = table(spark, SF_DIR, "events").select("event_id", "ts")
        lo, hi, n = ev.agg(
            F.min(F.unix_timestamp("ts")),
            F.max(F.unix_timestamp("ts")),
            F.count(F.lit(1)),
        ).collect()[0]
        span = int(hi - lo) + 86400
        parts = [
            ev.select(
                (F.col("event_id") + k * n).alias("event_id"),
                F.timestamp_seconds(
                    F.unix_timestamp("ts") + F.lit(k * span)
                ).alias("ts"),
            )
            for k in range(scale)
        ]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        scaled.write.mode("overwrite").parquet(path)
    return path


def build_scaled_events_full(spark, scale: int) -> str:
    """Replicate events `scale`× with ALL columns kept and per-replica
    time shifts (same users over a scale×-longer history): windows —
    and with them every per-window distinct/quantile/churn state —
    grow linearly while per-window cardinality stays constant, which
    is the realistic longer-retention axis."""
    path = f"{OUT}/events_full_x{scale}.parquet"
    if not os.path.exists(path):
        ev = table(spark, SF_DIR, "events")
        lo, hi, n = ev.agg(
            F.min(F.unix_timestamp("ts")),
            F.max(F.unix_timestamp("ts")),
            F.count(F.lit(1)),
        ).collect()[0]
        span = int(hi - lo) + 86400
        parts = [
            ev.select(
                (F.col("event_id") + k * n).alias("event_id"),
                F.timestamp_seconds(
                    F.unix_timestamp("ts") + F.lit(k * span)
                ).alias("ts"),
                "user_id",
                "event_type",
                "value",
            )
            for k in range(scale)
        ]
        scaled = parts[0]
        for p in parts[1:]:
            scaled = scaled.unionAll(p)
        scaled.write.mode("overwrite").parquet(path)
    return path


def _sketch_rollup_refresh(spark) -> None:
    """Sketch twin of _rollup_refresh: fold a fixed 1× batch into a
    sketch hierarchy whose committed state spans scale× windows — the
    merge must track the level-table size, never raw history."""
    from flink_window_dgim_traffic_spark.operators import sketches as SK

    path = f"{OUT}/skrollup_x{CTX['scale']}"
    if not os.path.isdir(f"{path}/_commits"):
        SK.build_sketch_rollup(
            spark.read.parquet(CTX["events_full_path"]), path
        )
    batch = spark.read.parquet(f"{OUT}/events_full_x1.parquet")
    SK.refresh_sketch_rollup(spark, path, batch)


def _neardup_incremental(docs, emb):
    """Probe-side cost of the persisted-index incremental near-dup:
    the index over the even half is built ONCE per scale (warm-up
    call); timed runs measure the band-bucket probe only — the
    every-new-crawl cost."""
    idx = f"{OUT}/ndidx_x{CTX['scale']}"
    if not os.path.isdir(idx):
        D.build_neardup_index(docs.filter(F.col("doc_id") % 2 == 0), idx)
    return D.neardup_incremental_lsh(
        docs.filter(F.col("doc_id") % 2 == 1), idx, threshold=0.5
    )


def _er_canonical_synth(docs):
    """Synthetic entity-resolution corpus: one record per doc_id with
    a formatted name (dense ids ⇒ each name has a bounded set of
    edit-distance-1 digit-substitution neighbors present in the
    table, so the true match graph grows LINEARLY with rows) and a
    25-way blocking key.  Mirrors __spark_entry__._er_supplier_canonical."""
    from flink_window_dgim_traffic_spark.operators import (
        graph as G2,
        matching as MT2,
    )

    # hash-derived names (no accidental ed<=1 collisions, no shared
    # formulaic prefix to degenerate PassJoin's segments) with an
    # explicit pair structure: docs 2k/2k+1 share a base and differ
    # in ONE suffix char, so true edges are n/2 disjoint pairs —
    # LINEAR edges, constant cluster size, which keeps the row a
    # measurement of the operator rather than of a giant-component
    # propagation (dense digit-substitution names gave every node
    # ~80 neighbors and one diameter-heavy component)
    sup = docs.select(
        F.col("doc_id").alias("s_suppkey"),
        F.concat(
            F.substring(
                F.md5(F.expr("cast(doc_id div 2 as string)")), 1, 10
            ),
            F.when(F.col("doc_id") % 2 == 0, F.lit("a")).otherwise(
                F.lit("b")
            ),
        ).alias("s_name"),
        # pairs share a blocking key (div 2 BEFORE mod) so blocking
        # keeps the true edges
        F.expr("(doc_id div 2) % 25").cast("bigint").alias("nat"),
    )
    edges = MT2.edit_distance_join(sup, "s_suppkey", "s_name", 1)
    lo = sup.select(
        F.col("s_suppkey").alias("id_lo"), F.col("nat").alias("nat_lo")
    )
    hi = sup.select(
        F.col("s_suppkey").alias("id_hi"), F.col("nat").alias("nat_hi")
    )
    edges = (
        edges.join(lo, "id_lo")
        .join(hi, "id_hi")
        .filter(F.col("nat_lo") == F.col("nat_hi"))
    )
    comp = G2.connected_components(edges, "id_lo", "id_hi")
    return (
        sup.join(
            comp, sup.s_suppkey == comp.node, "left"
        )
        .select(
            "s_suppkey",
            "s_name",
            F.coalesce("component_id", F.col("s_suppkey")).alias(
                "entity_id"
            ),
        )
        .groupBy("entity_id")
        .agg(
            F.min("s_suppkey").cast("bigint").alias("canonical_key"),
            F.min_by("s_name", F.col("s_suppkey")).alias(
                "canonical_name"
            ),
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
        )
    )


def _ivm_manytag_build(spark, compact: bool) -> str:
    """State for the many-refresh IVM read rows: a join view over the
    scale× history plus 32 committed small refreshes — uncompacted
    (33 visible delta dirs) or compacted to one snapshot."""
    from flink_window_dgim_traffic_spark.operators import ivm as IV

    suffix = "_c" if compact else ""
    path = f"{OUT}/ivmmany_x{CTX['scale']}{suffix}"
    if not os.path.isdir(f"{path}/_commits"):
        ev = spark.read.parquet(CTX["events_full_path"]).select(
            "event_id", "user_id", "value"
        )
        dim = ev.select("user_id").distinct().withColumn(
            "seg", (F.col("user_id") % 7).cast("bigint")
        )
        IV.build_join_view(ev, dim, path, ["user_id"])
        batch = (
            spark.read.parquet(f"{OUT}/events_full_x1.parquet")
            .select("event_id", "user_id", "value")
            .limit(200)
            .localCheckpoint(eager=True)
        )
        for i in range(32):
            IV.refresh_join_view(
                spark, path, delta_left=batch, tag=f"m{i}"
            )
        if compact:
            IV.compact_join_view(spark, path)
    return path


def _ivm_read_32tags(spark) -> None:
    """read_join_view over 33 visible delta dirs (no compaction) —
    the O(#refreshes) fan-in the compactor exists to bound."""
    from flink_window_dgim_traffic_spark.operators import ivm as IV

    path = _ivm_manytag_build(spark, compact=False)
    IV.read_join_view(spark, path).write.format("noop").mode(
        "overwrite"
    ).save()


def _ivm_read_compacted(spark) -> None:
    """Same logical view after compact_join_view: one dir per side."""
    from flink_window_dgim_traffic_spark.operators import ivm as IV

    path = _ivm_manytag_build(spark, compact=True)
    IV.read_join_view(spark, path).write.format("noop").mode(
        "overwrite"
    ).save()


def _ivm_refresh(spark) -> None:
    """One refresh of a FIXED 1× insert batch into a join view whose
    accumulated left state spans scale× history: IVM's contract is
    that refresh cost tracks the DELTA (ΔL ⋈ R against the constant-
    size dim side), never the accumulated view — this row measures
    exactly that."""
    from flink_window_dgim_traffic_spark.operators import ivm as IV

    path = f"{OUT}/ivmjv_x{CTX['scale']}"
    ev = spark.read.parquet(CTX["events_full_path"]).select(
        "event_id", "user_id", "value"
    )
    if not os.path.isdir(f"{path}/_commits"):
        dim = ev.select("user_id").distinct().withColumn(
            "seg", (F.col("user_id") % 7).cast("bigint")
        )
        IV.build_join_view(ev, dim, path, ["user_id"])
    batch = spark.read.parquet(f"{OUT}/events_full_x1.parquet").select(
        "event_id", "user_id", "value"
    )
    CTX["ivm_seq"] = CTX.get("ivm_seq", 0) + 1
    IV.refresh_join_view(
        spark, path, delta_left=batch,
        tag=f"b{CTX['scale']}_{CTX['ivm_seq']}",
    )


def _ivm_zset_retract(spark) -> None:
    """One Z-set RETRACTION refresh (a fixed 1× batch of -1 deltas)
    into a join view whose accumulated state spans scale× history:
    deletes must cost O(|Δ|) like inserts — never a history
    rewrite."""
    from flink_window_dgim_traffic_spark.operators import ivm as IV

    path = f"{OUT}/ivmz_x{CTX['scale']}"
    ev = spark.read.parquet(CTX["events_full_path"]).select(
        "event_id", "user_id", "value"
    )
    if not os.path.isdir(f"{path}/_commits"):
        dim = ev.select("user_id").distinct().withColumn(
            "seg", (F.col("user_id") % 7).cast("bigint")
        )
        IV.build_join_view_zset(ev, dim, path, ["user_id"])
    batch = (
        spark.read.parquet(f"{OUT}/events_full_x1.parquet")
        .select("event_id", "user_id", "value")
        .withColumn("_mult", F.lit(-1))
    )
    CTX["ivmz_seq"] = CTX.get("ivmz_seq", 0) + 1
    IV.refresh_join_view_zset(
        spark, path, delta_left=batch,
        tag=f"z{CTX['scale']}_{CTX['ivmz_seq']}",
    )


def _rollup_refresh(spark) -> None:
    """One refresh of a FIXED-size batch (the 1× events) into a
    hierarchy built from the scale×-span event log: measures how the
    continuous-aggregate merge degrades as the materialized state
    grows (it should track the level-table size, never the raw
    history)."""
    path = f"{OUT}/rollup_x{CTX['scale']}"
    if not os.path.isdir(f"{path}/_commits"):
        RU.build_rollup_hierarchy(
            spark.read.parquet(CTX["events_path"]), path
        )
    batch = spark.read.parquet(f"{OUT}/events_x1.parquet")
    RU.refresh_rollup(spark, path, batch)


def _components_refresh(spark) -> None:
    """One refresh of a FIXED 1x edge batch into a component store
    whose star forest already contracted scale-x edge history: graph
    IVM's contract is that refresh cost tracks (increment + nodes),
    never the accumulated pair history — this row measures exactly
    that."""
    from flink_window_dgim_traffic_spark.operators import graph as G
    from flink_window_dgim_traffic_spark.streaming.components import (
        build_components_store,
        refresh_components,
    )

    path = f"{OUT}/ccstore_x{CTX['scale']}"
    if not os.path.isdir(f"{path}/_commits"):
        build_components_store(spark, path)
        # seed with the scale-x co-window edge history in one fold
        hist = G.cowindow_user_edges(CTX["events_full"], 60)
        refresh_components(spark, path, hist, tag="seed")
    batch = G.cowindow_user_edges(
        spark.read.parquet(f"{OUT}/events_full_x1.parquet"), 60
    )
    CTX["cc_seq"] = CTX.get("cc_seq", 0) + 1
    refresh_components(
        spark, path, batch, tag=f"b{CTX['scale']}_{CTX['cc_seq']}"
    )


def main() -> None:
    spark = get_spark(app_name="bench_scaling")
    os.makedirs(OUT, exist_ok=True)

    ops = {
        "dedup_exact": lambda docs, emb: D.dedup_exact(docs),
        "minhash_lsh_pairs": lambda docs, emb: D.minhash_lsh_pairs(
            docs, threshold=0.8
        ),
        "heavy_hitters_ngrams": lambda docs, emb: HH.heavy_hitters_ngrams(
            docs
        ),
        "source_cap": lambda docs, emb: C.source_cap(docs, cap=15),
        "embedding_neardup_lsh": lambda docs, emb: S.embedding_neardup_lsh(
            emb, threshold=0.4
        ),
        "semantic_dedup_lsh": lambda docs, emb: S.semantic_dedup(
            emb, use_lsh=True
        ),
        "semantic_dedup_lsh_capped": lambda docs, emb: S.semantic_dedup(
            emb, use_lsh=True, max_bucket=64
        ),
        "simsearch_ann_ivf": lambda docs, emb: S.simsearch_ann_ivf(emb),
        "simsearch_ann_ivfpq": lambda docs, emb: S.simsearch_ann_ivfpq(emb),
        "simsearch_ann_lsh": lambda docs, emb: S.simsearch_ann_lsh(emb),
        "ngram_jaccard_pairs": lambda docs, emb: D.ngram_jaccard_pairs(
            docs, threshold=0.5
        ),
        "simhash_pairs": lambda docs, emb: D.simhash_pairs(docs),
        "chunk_dedup": lambda docs, emb: D.chunk_dedup(docs),
        "duplicated_spans": lambda docs, emb: D.duplicated_spans(docs),
        "cdc_chunk_dedup": lambda docs, emb: D.cdc_chunk_dedup(docs),
        "importance_weights": lambda docs, emb: C.importance_weights(
            docs
        ),
        "embedding_outliers": lambda docs, emb: S.embedding_outliers(
            emb
        ),
        "neardup_clusters": lambda docs, emb: D.neardup_clusters(
            D.minhash_lsh_pairs(docs, threshold=0.8).select(
                F.col("doc_a"), F.col("doc_b")
            )
        ),
        # ---- round-4/5 additions (VERDICT r4 #3: measured rows for
        # the design-claim-only ops) ----
        "tfidf_top_terms": lambda docs, emb: RT.tfidf_top_terms(docs, 3),
        "token_budget_select": lambda docs, emb: C.token_budget_select(
            docs, 20000
        ),
        "span_dedup": lambda docs, emb: D.span_dedup(docs),
        "neardup_incremental_lsh": _neardup_incremental,
        # ---- round-5 session-2 additions ----
        "neardup_keep_best": lambda docs, emb: D.neardup_keep_best(
            docs, D.minhash_lsh_pairs(docs, threshold=0.8).select(
                "doc_a", "doc_b"
            )
        ),
        "mmr_diverse_topk": lambda docs, emb: S.mmr_diverse_topk(emb),
        "pca_project": lambda docs, emb: S.pca_project(emb),
        "theta_windowed_distinct": lambda docs, emb: SK.theta_windowed_distinct(
            CTX["events_full"], 600
        ),
        "theta_churn": lambda docs, emb: SK.theta_churn(
            CTX["events_full"], 86400
        ),
        "per_key_trend": lambda docs, emb: AN.per_key_trend(
            CTX["events_full"]
        ),
        "assoc_pairs": lambda docs, emb: AN.assoc_pairs(
            CTX["events_full"]
        ),
        "attribution_touch": lambda docs, emb: AN.attribution_touch(
            CTX["events_full"]
        ),
        "session_paths": lambda docs, emb: AN.session_paths(
            CTX["events_full"]
        ),
        "profile_drift": lambda docs, emb: AN.profile_drift(
            CTX["events_full"]
        ),
        # ---- round-5 session-3 additions ----
        # ER corpus = 12-char document prefixes: replica word-prefixes
        # make cross-replica strings differ early, so true-match
        # structure stays constant per row while the corpus grows
        "edit_distance_join": lambda docs, emb: MT.edit_distance_join(
            docs.select(
                "doc_id",
                F.substring(F.lower("text"), 1, 12).alias("name"),
            ),
            "doc_id",
            "name",
            1,
        ),
        "collocations_pmi": lambda docs, emb: T.collocations_pmi(
            docs, 5
        ),
        "posting_lists": lambda docs, emb: RT.posting_lists(docs, 100),
        "seasonal_anomaly": lambda docs, emb: W.seasonal_anomaly(
            CTX["events_full"], 60, 3600, 3, 2
        ),
        "late_data_audit": lambda docs, emb: W.late_data_audit(
            CTX["events_full"].withColumn(
                "arrival_us",
                (
                    F.unix_micros(F.col("ts"))
                    + (F.col("event_id") % 10) * F.lit(30_000_000)
                ).cast("bigint"),
            ),
            "arrival_us",
        ),
        "value_deciles": lambda docs, emb: AN.value_deciles(
            CTX["events_full"], 10
        ),
        "skew_report": lambda docs, emb: R.skew_report(
            CTX["events_full"], ["user_id", "event_type"]
        ),
        "cross_tab_chi2": lambda docs, emb: AN.cross_tab_chi2(
            CTX["events_full"]
        ),
        "lag_correlation": lambda docs, emb: AN.lag_correlation(
            CTX["events_full"], "view", "purchase", 60, 10
        ),
        "dataset_diff": lambda docs, emb: R.dataset_diff(
            CTX["events_full"]
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n")),
            CTX["events_full"]
            .filter(F.col("event_type") != "error")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n")),
            ["user_id"],
            ["n"],
        ),
        "pagerank_cowindow": lambda docs, emb: G.pagerank_fixed(
            G.cowindow_user_edges(CTX["events_full"], 600), iters=3
        ),
        "frequent_itemsets": lambda docs, emb: IT.frequent_itemsets(
            docs, 500_000
        ),
        "cms_build_estimate": lambda docs, emb: HH.cms_estimate(
            HH.cms_build(CTX["events_full"], "user_id"),
            CTX["events_full"],
            "user_id",
        ),
        # triangles over a synthetic SPARSE bounded-degree graph
        # (each node linked to its +1/+2/+3 neighbors — triangle-
        # rich, degree ~6, |E| and triangle count both linear in
        # nodes): measures the enumeration itself.  Duplicate-heavy
        # corpora form lev-0 cliques whose m³/6 triangle OUTPUT no
        # algorithm avoids (measured 36-43× at 10× on a mass-dup
        # prefix corpus with either wedge order) — the documented
        # discipline is dedup_exact before graphing.
        "triangle_count": lambda docs, emb: G.triangle_count(
            docs.select(
                F.col("doc_id").alias("src"),
                F.explode(
                    F.array(F.lit(1), F.lit(2), F.lit(3))
                ).alias("d"),
            ).select(
                "src", (F.col("src") + F.col("d")).alias("dst")
            ),
            "src",
            "dst",
        ),
        # ---- round-5 session-4 additions ----
        # sweep-line peak concurrency: deltas reduce keyed; only the
        # distinct-instant series crosses the global prefix window
        "max_concurrency": lambda docs, emb: W.max_concurrency(
            CTX["events_full"]
            .groupBy("user_id", F.to_date("ts").alias("day"))
            .agg(
                F.min("ts").alias("start_ts"),
                (F.max("ts") + F.expr("INTERVAL 60 SECONDS")).alias(
                    "end_ts"
                ),
            ),
            bucket_sec=600,
        ),
        "time_weighted_avg": lambda docs, emb: W.time_weighted_avg(
            CTX["events_full"], 1800
        ),
        # ---- round-6 additions ----
        # k-core over the co-occurrence graph of a scale×-longer
        # history: the window/user bipartite build grows linearly,
        # the user-pair edge set saturates (same user population) —
        # the realistic longer-retention shape for affinity graphs
        "kcore_users": lambda docs, emb: G.kcore_fixed(
            G.cowindow_user_edges(CTX["events_full"], 60),
            k=8,
            rounds=6,
        ),
        "cdc_apply": lambda docs, emb: R.cdc_apply(
            CTX["events_full"].select(
                "user_id",
                F.unix_micros("ts").alias("us"),
                "event_id",
                F.when(
                    F.col("event_type") == "error", F.lit("D")
                ).otherwise(F.lit("U")).alias("op"),
                "value",
            ),
            ["user_id"],
            ["us", "event_id"],
        ),
        "winsorized_stats": lambda docs, emb: AN.winsorized_stats(
            CTX["events_full"]
        ),
        "bigram_surprisal": lambda docs, emb: T.bigram_surprisal(
            docs
        ),
        "ppr_cowindow": lambda docs, emb: G.ppr_fixed(
            G.cowindow_user_edges(CTX["events_full"], 600),
            [0, 1],
            iters=3,
        ),
        "daily_movers": lambda docs, emb: AN.daily_movers(
            CTX["events_full"]
        ),
        "shuffle_shards": lambda docs, emb: C.shuffle_shards(
            docs, 64
        ),
        "kmeans_quantized": lambda docs, emb: S.kmeans_quantized(
            emb, k=8, rounds=2
        ),
        "path_regex_match": lambda docs, emb: AN.path_regex_match(
            CTX["events_full"]
        ),
        "asof_nearest": lambda docs, emb: R.asof_join(
            CTX["events_full"]
            .filter(F.col("event_type") == "purchase")
            .select("user_id", F.unix_micros("ts").alias("us"),
                    "event_id"),
            CTX["events_full"]
            .filter(F.col("event_type") == "view")
            .select("user_id", F.unix_micros("ts").alias("us"),
                    "event_id"),
            on="us",
            by=["user_id"],
            right_cols=["event_id"],
            direction="nearest",
            tiebreak="event_id",
        ),
        # ---- round-7 additions ----
        # sharded-rank RFM tiling (was 3 global single-task ntile
        # sorts): all three passes over the per-user aggregate
        "rfm_segments": lambda docs, emb: AN.rfm_segments(
            CTX["events_full"]
        ),
        # TakeOrderedAndProject top-k over the key-count join
        "join_hotspots": lambda docs, emb: R.join_hotspots(
            CTX["events_full"], CTX["events_full"], ["user_id"], 20
        ),
        # ER canonicalization end to end on a synthetic scale×
        # entity table (dense ids → formatted names: each id has a
        # bounded set of ed<=1 digit-substitution neighbors, so true
        # edges grow linearly): PassJoin → blocking → components →
        # canonical records
        "er_canonical": lambda docs, emb: _er_canonical_synth(docs),
        # window-TVF family completions: argmin dedup + slot joins
        "window_dedup": lambda docs, emb: W.window_dedup(
            CTX["events_full"], 600
        ),
        "window_join": lambda docs, emb: W.window_join(
            CTX["events_full"].filter(F.col("event_type") == "view"),
            CTX["events_full"].filter(
                F.col("event_type") == "purchase"
            ),
            600,
        ),
        # ---- round-8 additions ----
        # cumulate-mode join: constant ≤ span/step per-row explode
        "window_cumulate_join": lambda docs, emb: W.window_join(
            CTX["events_full"].filter(F.col("event_type") == "view"),
            CTX["events_full"].filter(
                F.col("event_type") == "purchase"
            ),
            600,
            cumulate_step_sec=300,
        ),
        # netpbm encode -> decode -> aggregate, all map-side
        "media_pixel_stats": lambda docs, emb: MM.media_pixel_stats(
            docs
        ),
        # decoded-pixel aHash near-dup: constant group size => true
        # pairs linear in corpus; only 3 bigints/doc leave decode
        "media_ahash_pairs": lambda docs, emb: MM.media_ahash_pairs(
            docs
        ),
        # decode + nearest-neighbor resize + aggregate (map-only)
        "media_pixel_resize_stats": lambda docs, emb: (
            MM.media_pixel_resize_stats(docs)
        ),
        # ---- round-10 additions ----
        # audio perceptual near-dup: decoded-sample aHash + pigeonhole
        # bucket join (the image twin saturated its 65k buckets at
        # 30× — r9 verdict ask #4 pushes the audio sibling too)
        "media_audio_ahash_pairs": lambda docs, emb: (
            MM.media_audio_ahash_pairs(docs)
        ),
        # PNG codec path (inflate + unfilter per doc, map-only)
        "media_png_stats": lambda docs, emb: MM.media_png_stats(docs),
        # md5-family LSH (the oracle-checked hash family added in r10)
        "minhash_lsh_pairs_md5": lambda docs, emb: D.minhash_lsh_pairs(
            docs, threshold=0.8, hash_family="md5"
        ),
        "simhash_pairs_md5": lambda docs, emb: D.simhash_pairs(
            docs, hash_family="md5"
        ),
        # ---- round-9 additions ----
        # WAV encode -> RIFF/PCM16 decode -> aggregate, map-only
        "media_audio_stats": lambda docs, emb: MM.media_audio_stats(
            docs
        ),
        "media_audio_resample_stats": lambda docs, emb: (
            MM.media_audio_resample_stats(docs)
        ),
        # star-contraction CC over the scaled co-window user graph:
        # round count must stay ~log, not grow with corpus size
        "connected_components_star": lambda docs, emb: (
            G.connected_components_star(
                G.cowindow_user_edges(CTX["events_full"], 60),
                "src",
                "dst",
            )
        ),
        # exact global order statistics (sharded pair-table recipe)
        "global_quantiles": lambda docs, emb: AN.global_quantiles(
            CTX["events_full"]
        ),
        # subsequence similarity: n·m contribution expansion
        "ts_pattern_topk": lambda docs, emb: AN.ts_pattern_topk(
            CTX["events_full"]
        ),
        "dq_checks": lambda docs, emb: R.dq_checks(
            CTX["events_full"],
            not_null=["event_id", "ts", "user_id", "event_type"],
            unique=["event_id"],
            ranges={"value": (0.0, 250.0)},
            allowed={
                "event_type": [
                    "click", "signup", "purchase", "error", "view",
                ]
            },
        ),
    }

    # side-effecting ops timed directly (no DataFrame to noop-write)
    custom_ops = {
        "rollup_refresh": _rollup_refresh,
        "sketch_rollup_refresh": _sketch_rollup_refresh,
        "ivm_refresh": _ivm_refresh,
        "components_refresh": _components_refresh,
        "ivm_zset_retract": _ivm_zset_retract,
        "ivm_read_32tags": _ivm_read_32tags,
        "ivm_read_compacted": _ivm_read_compacted,
    }

    only = os.environ.get("SPARK_GRAFT_SCALING_OPS")
    if only:
        keep = set(only.split(","))
        ops = {k: v for k, v in ops.items() if k in keep}
        custom_ops = {k: v for k, v in custom_ops.items() if k in keep}

    results: dict[str, dict[int, float]] = {
        k: {} for k in (*ops, *custom_ops)
    }
    for scale in SCALES:
        doc_path, emb_path = build_scaled(spark, scale)
        ev_full_path = build_scaled_events_full(spark, scale)
        CTX.update(
            scale=scale,
            events_path=build_scaled_events(spark, scale),
            events_full_path=ev_full_path,
            events_full=spark.read.parquet(ev_full_path),
        )
        docs = spark.read.parquet(doc_path)
        emb = spark.read.parquet(emb_path)
        for name, build in ops.items():
            build(docs, emb).write.format("noop").mode("overwrite").save()
            runs = []
            for _ in range(2):
                t0 = time.time()
                build(docs, emb).write.format("noop").mode(
                    "overwrite"
                ).save()
                runs.append(time.time() - t0)
            sec = round(min(runs), 3)
            results[name][scale] = sec
            print(
                json.dumps(
                    {"op": name, "scale": scale, "sec": sec}
                ),
                flush=True,
            )
        for name, run_op in custom_ops.items():
            run_op(spark)  # warm-up (also builds per-scale state)
            runs = []
            for _ in range(2):
                t0 = time.time()
                run_op(spark)
                runs.append(time.time() - t0)
            sec = round(min(runs), 3)
            results[name][scale] = sec
            print(
                json.dumps(
                    {"op": name, "scale": scale, "sec": sec}
                ),
                flush=True,
            )

    print("\nop                        " + "".join(f"{s:>8}x" for s in SCALES)
          + "   10x/1x (linear=10)")
    for name, by_scale in results.items():
        ratio = by_scale[SCALES[-1]] / max(by_scale[SCALES[0]], 1e-9)
        print(
            f"{name:<26}"
            + "".join(f"{by_scale[s]:>8.2f} " for s in SCALES)
            + f"  {ratio:>6.1f}"
        )


if __name__ == "__main__":
    main()
