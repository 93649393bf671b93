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
    similarity as S,
)
from flink_window_dgim_traffic_spark.session import (  # noqa: E402
    get_spark,
    table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/spark_graft_scaling"
SCALES = [1, 3, 10]


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
    }

    only = os.environ.get("SPARK_GRAFT_SCALING_OPS")
    if only:
        keep = set(only.split(","))
        ops = {k: v for k, v in ops.items() if k in keep}

    results: dict[str, dict[int, float]] = {k: {} for k in ops}
    for scale in SCALES:
        doc_path, emb_path = build_scaled(spark, scale)
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
