#!/usr/bin/env python
"""Regenerate PLANS.md: the formatted physical plans of the headline
queries at sf0.01, with the scale-relevant properties called out.
Run after changing any operator: ``python tools/dump_plans.py``."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entrymod  # noqa: E402
from flink_window_dgim_traffic_spark.plans import inspect as I  # noqa: E402
from flink_window_dgim_traffic_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

# query -> one-line "why this plan is the plan you'd want at 100 TB"
SHOWCASE = {
    "q1_pricing_summary": "filter pushed to scan, 7/16 columns read, "
    "map-side partial agg, ONE shuffle",
    "q6_revenue_change": "whole filter conjunction at the scan, "
    "global agg over a pruned 4-column read",
    "tumble_exact": "2-column read, single shuffle on the window key",
    "tumble_dgim_fast": "the DGIM→g(sum(bit)) rewrite: plan is "
    "identical to tumble_exact plus one Arrow lookup",
    "tumble_dgim_two_phase": "mapInPandas partial sketches, shuffle "
    "carries (window, O(log²N) sketch) rows only",
    "hop_dgim_two_phase": "pane sharing: rows touched once, the 6× "
    "window fan-out happens on sketch-sized rows",
    "q5_local_supplier": "region/nation/supplier broadcast, fact "
    "joins shuffled on keys, no cartesian",
    "simsearch_topk": "query side broadcast; non-equi join is "
    "broadcast-nested-loop, never a shuffle cartesian",
    "minhash_lsh_pairs": "band keys from a one-row-per-doc wide "
    "aggregate; candidate joins are bucket equi-joins",
    "event_type_counts_salted": "two shuffles by design: salted "
    "partials then tiny final fold (skew resistance)",
    "event_type_pivot": "pivot values declared up front: ONE "
    "partial-aggregated shuffle, no distinct-values pre-scan",
    "training_corpus": "three-stage pipeline stays key-joins + "
    "anti-joins end to end; no collect, no cartesian",
    "corpus_mix": "map-only: scan → filter → project, ZERO shuffles; "
    "sampling is an integer compare against an md5-derived column",
    "contamination_check": "benchmark shingles broadcast (eval sets "
    "are fixed-size); corpus side is a map-side probe + one "
    "partially-aggregated shuffle on doc_id",
    "bm25_topk": "corpus stats (N, avgdl, df) reduced to ONE row and "
    "broadcast; scoring is in-row; TakeOrderedAndProject caps the "
    "top-k without a global sort",
    "sequence_pack": "single shuffle on (source, shard); the prefix "
    "sum is per-shard, so the window never degenerates to one "
    "global-order partition",
    "q7_volume_shipping": "both nation dims broadcast twice under "
    "different aliases; fact chain shuffles on its keys only",
    "q18_large_volume_customers": "heavy groupBy FIRST on the "
    "2-column projection; only qualifying orders join dimensions",
    "q17_small_quantity": "per-part threshold via groupBy + "
    "broadcast join-back — no window function, no per-row re-sort",
    "chunk_dedup": "one shuffle on chunk text with map-side min "
    "pre-aggregation; reassembly sorts in-row, never globally",
    "gopher_quality": "map-only: every rule is a JVM expression over "
    "a staged words array, ZERO shuffles",
    "unigram_commonness": "vocab shuffle is map-side combined; "
    "integer-ppm scores broadcast back; per-doc sums are exact "
    "BIGINTs so the plan can re-order freely",
    "semantic_dedup": "exact pair graph from the distributed block "
    "screen (block-pair tasks, no driver collect), components via "
    "checkpointed label propagation — DataFrame state only",
    "cumulate_exact": "CUMULATE ends exploded map-side (≤ max/step "
    "fan-out, same as HOP), ONE partially-aggregated shuffle",
    "source_cap": "mapInPandas partial top-k shuffles NOTHING; the "
    "per-source window sees ≤ cap·partitions rows per source",
    "dedup_incremental": "index scan pruned to the hash column; anti "
    "join + map-side-combined min/count, two key shuffles",
    "quality_quantile_gate": "one bounded per-lang percentile "
    "aggregate; thresholds broadcast back — the gate is map-only",
    "event_funnel": "closed-form chained minima: NO window, NO "
    "sort; per-stage map-side-combined mins joined on the user_id "
    "hash (bot users are AQE-splittable join keys)",
    "q21_waiting_suppliers": "EXISTS/NOT-EXISTS double self-join as "
    "ONE per-order aggregation; dims broadcast",
    "q2_min_cost_supplier": "correlated MIN as groupBy + broadcast "
    "equality join-back on the exact DECIMAL cost",
    "duplicated_spans": "one regex projection builds every sliding "
    "span; (span,doc) agg + map-side-combined span counts semi-"
    "joined back (hot spans skew-splittable) + doc agg; no pair join",
    "importance_weights": "ONE profile pass (conditional target "
    "count); constant-size bucket profile broadcast back; per-doc "
    "sum is map-side combined exact BIGINTs",
    "word_entropy": "explode → (doc,w) → doc: exactly two keyed "
    "aggregations, both map-side combined; ln terms quantized so "
    "combine order is free",
    "embedding_outliers": "(label,dim) partial-agg shuffle builds "
    "centroids without moving whole vectors; centroids and label "
    "means broadcast back — distance is map-side zip_with",
    "cdc_chunk_dedup": "Arrow-batched content-defined chunker (SQL "
    "HOFs re-inline staged arrays per element — 500× slower "
    "measured); dup counting is the skew-safe agg + semi-join pair",
    "curation_twin": "the whole curation pipeline as key joins, "
    "anti joins, one bounded threshold agg, and broadcast gates — "
    "no collect, no cartesian, map-only split",
    "lm_quality_gate": "constant-size LM profile broadcast back onto "
    "one token pass; per-doc margin is a map-side-combined exact "
    "BIGINT sum",
    "window_topn": "(window,user) partial-agg shuffle, then rank "
    "partitions are single-window user sets — bounded by per-window "
    "traffic, not corpus size",
    "ewma_anomaly": "events collapse to the windows table FIRST; the "
    "ordered window runs over one row per 60 s, never over events",
    "anomaly_drilldown": "range join rewritten as equi join on the "
    "tumbling bucket; anomalous-window list broadcasts, probe is "
    "map-side",
    "tfidf_top_terms": "tf and df from the same exploded pass (both "
    "map-side combined); one-row corpus count broadcast; rank "
    "partitions are per-doc vocabularies",
    "token_budget_select": "NO global doc sort: cumulative budget "
    "over the |distinct scores| bucket table; full buckets via "
    "broadcast semi-join, boundary bucket is the only ordered scan",
    "windowed_distinct_users": "two-phase exact distinct: partial "
    "(window,user) dedup then window re-agg, both map-side combined",
    "neardup_incremental_lsh": "new crawl signatures map-side; "
    "candidates are (band,key) equi-joins against the on-disk index; "
    "verification is an in-row zip_with over two 64-long arrays",
    "compression_ratio": "map-only Arrow-batched deflate, ZERO "
    "shuffles",
    "asof_generic": "MERGE-ASOF shape: union+tag+one keyed window "
    "sweep — NO join node at all; one shuffle on the by-key hash",
    "range_join_first_hour": "interval containment as a bucketed "
    "EQUI join + residual predicate, never a nested-loop cartesian",
    "grouped_topk_events": "lossless map-side partial top-k prune "
    "(≤ k rows/group/partition reach the shuffle) before the "
    "authoritative per-group rank",
    "table_profile_events": "all columns' count/null/distinct/"
    "min/max aggregates planned in ONE job over one scan",
    "rollup_serve_10min": "router reads ONLY the coarsest tiling "
    "level's tiny table — raw events never rescanned",
    "rollup_serve_realtime": "materialized windows below the "
    "high-water mark + ts-pruned raw tail (filter pushed to the "
    "events scan) — the log is read only above the threshold",
    "span_dedup": "one regex projection emits spans; owner/dup via "
    "map-side-combined span agg; excision is a (doc,pos) anti join; "
    "reassembly sorts in-row — no pair join anywhere",
    "scd2_user_state": "version collapse (lag) and validity chain "
    "(lead) share ONE hash exchange on the entity key",
    "scd2_point_in_time": "temporal lookup reduced to the as-of "
    "window sweep — no join node, no interval explode",
    "leakage_safe_split": "exact-jaccard pairs → label propagation → "
    "one equi join back; the split itself is a map-only md5",
    "gap_fill_60s": "series aggregated once (checkpointed); dense "
    "grid generated from its one-row min/max via sequence-explode; "
    "LOCF runs over the series, never the events",
    "m4_downsample_10min": "first/last/min/max in ONE map-side-"
    "combinable shuffle (struct min/max carries first/last)",
    "hybrid_rrf_topk": "both rankings are broadcast-stats scans + "
    "TakeOrderedAndProject; the fusion aggregates two top-k-sized "
    "lists — the corpora are never rescanned",
    "stratified_sample": "map-side partial top-k prune per stratum "
    "(≤ k rows/stratum/partition reach the shuffle)",
    "chunk_text_rag": "map-only: chunk count and slices are in-row "
    "JVM expressions over the staged token array, ZERO shuffles",
    "windowed_percentiles": "one shuffle on the window key; the "
    "per-window sort is bounded by window traffic (approx_percentile "
    "is the documented 100 TB swap)",
    "bigram_kn_stats": "bigrams via in-row array zip (no "
    "per-position re-tokenization); two keyed aggregations + one "
    "broadcast scalar",
    "theta_distinct_600s": "distinct count as ONE bounded theta "
    "sketch per window per task — the shuffle carries 32 KiB blobs, "
    "never a (window, user) row expansion",
    "theta_rollup_serve_10min": "serves by unioning minute-level "
    "sketch blobs: the plan reads the level-60 table only, raw "
    "events appear nowhere",
    "theta_audience_overlap_daily": "both audience sketches are "
    "conditional aggregates in ONE pass — set intersection without "
    "a self-join or key co-location",
    "theta_churn_daily": "retained/new/churned via theta set "
    "algebra on a window-key self-join of sketch BLOBS — raw keys "
    "are never re-shuffled",
    "per_key_trend": "per-key minima broadcast back; ONE partial-"
    "aggregated shuffle carries four DECIMAL(38) moments per key",
    "assoc_pairs_daily": "pair fan-out bounded by items-per-basket² "
    "(basket equi-join); item/total counts broadcast into the "
    "projection",
    "session_paths": "two window sweeps over the user partition, "
    "then a path aggregate bounded by |types|^steps",
    "neardup_keep_best": "bucketed pair candidates → label "
    "propagation; the winner pick is one window rank over "
    "(cluster, quality) — no self-join",
    # round-7 additions
    "rfm_segments": "three sharded-rank tiling passes: value-range "
    "shards + (value, id-bucket) pair offsets; the only ordered "
    "single-partition windows see <=256 shard totals — no global "
    "ntile sort anywhere",
    "global_value_quantiles": "distinct-value pair table (one "
    "raw-row aggregation) → bounded shard prefix → rank-range "
    "selection; exact global quantiles with no global sort",
    "window_dedup_first": "Window Deduplication compiled to a "
    "min_by argmin aggregation: one partially-aggregated shuffle, "
    "NO rank window",
    "window_join_views_buys": "window join on a pure slot column: "
    "one equi-join on (user, slot), event_type filters pushed to "
    "both scans",
    "ts_pattern_topk": "n·m contribution explode (map-side) + one "
    "keyed aggregation; top-k is TakeOrderedAndProject",
    "winsorized_value_stats": "order statistics from the distinct "
    "(key, value) pair table: raw rows cross ONE aggregation, every "
    "window partitioned",
    "join_hotspots": "count-table join + TakeOrderedAndProject; the "
    "rank window sees only the <=k survivors",
    "media_pixel_stats": "netpbm encode → decode → aggregate inside "
    "ONE mapInPandas: ZERO exchanges, blobs never leave the map",
    "media_ahash_pairs": "decoded-pixel aHash fingerprints pinned "
    "once (3 bigints/doc leave the decode stage); pigeonhole "
    "candidate join is a hash equi-join, dedup agg is the only "
    "shuffle",
    "window_cumulate_join_views_buys": "CUMULATE join: ≤ span/step "
    "map-side end-explode, then one (user, end-slot) equi-join — "
    "no cartesian",
    "frequent_itemsets": "PCY bucket pass bounds the candidate "
    "shuffle; basket-keyed spread pin (AQE-coalesce-exempt) keeps "
    "the pair fan-out parallel; L3 is ONE co-partitioned self-join "
    "of the pair table",
    # ---- round-9 additions ----
    "media_audio_stats": "WAV encode → RIFF/PCM16 decode → aggregate "
    "inside one mapInPandas: ZERO exchanges, only doc_id read — "
    "audio blobs never shuffle",
    "hop_dgim_bound": "bound surface = native hop window() generator "
    "+ ONE partial-aggregated shuffle; estimate is a JVM-side "
    "closed-form column, no replay",
    "cumulate_dgim_bound": "cumulate fan-out is a map-side "
    "explode(sequence(...)); one shuffle on (ws, we)",
    "mmr_diverse_topk": "pool build broadcasts queries; the greedy "
    "step is per-query applyInPandas over 50-row groups — integer "
    "objective, one shuffle on query_id",
    "media_png_stats": "PNG encode → CRC walk + inflate + unfilter → "
    "aggregate inside one mapInPandas — map-only, no shuffle",
    "embedding_neardup_lsh": "integer-plane buckets from one Arrow "
    "pass; candidates are (table, bucket) equi-joins over INT rows — "
    "vectors attach only at the final verify joins",
    "stream_tumble_dgim_tws": "transformWithStateInPandas on the real "
    "RocksDB-backed runtime; state = O(log²N) sketch per open window",
    "compression_ratio_bound": "map-only deflate + closed-form bound "
    "projection; no shuffle at all",
    "zorder_layout_stats": "deterministic Morton buckets: one "
    "repartition on the bucket id, hive partitionBy write, footer "
    "walk driver-side (the metadata scan a table format would do)",
    # ---- round-11 additions ----
    "tumble_dgim_two_phase_bound": "same sketch-only shuffle as the "
    "two-phase plan; the bound verdict is a post-agg projection — "
    "zero extra exchanges",
    "table_profile_events_approx_bound": "exact profile and HLL "
    "sketches as TWO single-row aggs cross-joined (free at 1 row "
    "each); planning them together re-evaluates the HLLs under the "
    "multi-distinct Expand — measured 42x slower",
    "simsearch_ann_ivf_bound": "both topk sides are n_query*k rows; "
    "the recall join is broadcast, verdict in integer arithmetic",
    "media_jpeg_stats": "encode->Huffman/IDCT decode->aggregate in "
    "one Arrow pass; the only exchange moves 8-byte doc ids "
    "(_spread_ids, r12) so codec parallelism never depends on the "
    "scan's split layout — blobs themselves never shuffle",
    "bpe_roundtrip_bound": "map-only encode-path verdicts with a "
    "per-batch word memo; exact counts ride the same pass",
    # ---- round-12 additions ----
    "media_jpeg_progressive_stats": "the SOF2 multi-scan decode is "
    "still one mapInPandas stage: spectral/successive reassembly "
    "happens inside the UDF, plan-identical to the sequential twin",
    "media_jpeg420_stats": "subsampled decode, same id-only "
    "exchange + map-only codec stage shape",
    "media_adpcm_stats": "RIFF walk + 89-step state machine inside "
    "the codec stage; 8 bigints per doc leave it",
}


def main() -> None:
    spark = get_spark(app_name="dump_plans")
    qs = entrymod.queries()
    out = [
        "# PLANS — physical plans of headline queries (sf0.01)",
        "",
        "Regenerate with `python tools/dump_plans.py`.  Each section",
        "states the scale property the plan carries, then the",
        "`explain(\"formatted\")` output (AQE initial plan).",
        "",
    ]
    for name, why in SHOWCASE.items():
        df = qs[name](spark, SF_DIR)
        out.append(f"## {name}")
        out.append("")
        out.append(f"**Why this plan:** {why}.")
        out.append("")
        out.append("```")
        out.append(I.plan_text(df).strip())
        out.append("```")
        out.append("")
    with open(os.path.join(REPO, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md with {len(SHOWCASE)} plans")


if __name__ == "__main__":
    main()
