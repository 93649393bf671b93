"""similarity registry: embedding similarity: exact topk, LSH/IVF/PQ ANN, PCA.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403



def _simsearch_ivf_incremental(s: SparkSession, d: str) -> DataFrame:
    """Persisted-IVF-index deployment shape for ANN: index the even
    vec_ids, fold the odd half in as a committed delta snapshot with
    the FROZEN codebook (refresh_ivf_index — FAISS's add-after-train
    pattern), probe over base ∪ delta.  Rows-only (seeded centroids);
    base∪delta == monolithic-store probes and per-scan partition
    pruning are pinned in tests/test_dedup_similarity.py."""
    emb = _embeddings(s, d)
    idx = _mkdtemp(prefix="spark_graft_ivfinc_")
    S.build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx)
    S.refresh_ivf_index(
        s, idx, emb.filter(F.col("vec_id") % 2 == 1), tag="crawl-2"
    )
    return S.simsearch_ivf_indexed(s, idx)


def queries():
    return {
        # eigendecomposition invariants as verdicts (orthonormal
        # components in integer ppm, measured projected-variance
        # ordering, centering)
        "pca_project_bound": lambda s, d: S.pca_project_bound(
            _embeddings(s, d)
        ),
        # seeded-centroid ANN family: recall@k vs the exact topk
        # ground truth in exact integer arithmetic (100·hits >=
        # pct·n_pairs) — covers one-shot IVF, IVF-PQ, the persisted
        # incremental index, and the foreachBatch-maintained stream
        # index
        "simsearch_ann_ivf_bound": lambda s, d: S.ann_recall_bound(
            _embeddings(s, d), S.simsearch_ann_ivf(_embeddings(s, d))
        ),
        "simsearch_ann_ivfpq_bound": lambda s, d: S.ann_recall_bound(
            _embeddings(s, d), S.simsearch_ann_ivfpq(_embeddings(s, d))
        ),
        "simsearch_ann_ivf_incremental_bound": lambda s, d: (
            S.ann_recall_bound(
                _embeddings(s, d), _simsearch_ivf_incremental(s, d)
            )
        ),
        # integer-plane sign-LSH family (r10): bucket signs as exact
        # integer arithmetic (round-6 micro-units · int64 LCG plane
        # components) make the candidate SETS engine-reproducible —
        # all three flip from rows-only to oracle-hash-checked;
        # auto-sized planes stay the scale default, entries pin
        # n_planes for the oracle
        "embedding_neardup_lsh": lambda s, d: S.embedding_neardup_lsh(
            _embeddings(s, d), threshold=0.4, int_planes=True, n_planes=8
        ),
        "semantic_dedup_lsh": lambda s, d: S.semantic_dedup(
            _embeddings(s, d), use_lsh=True, int_planes=True, n_planes=8
        ),
        "simsearch_ann_lsh": lambda s, d: S.simsearch_ann_lsh(
            _embeddings(s, d), int_planes=True
        ),
        # MMR greedy re-ranking, oracled via the r9 integer-objective
        # rewrite: the k greedy rounds unroll as SQL CTEs (kcore
        # precedent) because selection is exact int64 arithmetic now
        "mmr_diverse_topk": lambda s, d: S.mmr_diverse_topk(
            _embeddings(s, d)
        ),
        # pca_project returns FLAT pc1..pck (r8 driver crash:
        # array<double> is unhashable in pandas canonicalization);
        # rows-only (eigendecomposition), numpy parity in tests;
        # structural verdicts in pca_project_bound
        "pca_project": lambda s, d: S.pca_project(_embeddings(s, d)),
        # ANN index refresh (rows-only: seeded centroids): frozen
        # codebook + committed delta snapshots == monolithic store,
        # pinned in tests; recall verdict in
        # simsearch_ann_ivf_incremental_bound
        "simsearch_ann_ivf_incremental": _simsearch_ivf_incremental,
        "simsearch_ann_ivf": lambda s, d: S.simsearch_ann_ivf(_embeddings(s, d)),
        "simsearch_ann_ivfpq": lambda s, d: S.simsearch_ann_ivfpq(
            _embeddings(s, d)
        ),
        "kmeans_quantized": lambda s, d: S.kmeans_quantized(
            _embeddings(s, d), k=8, rounds=2
        ),
        "hard_negatives": lambda s, d: S.hard_negatives(
            _embeddings(s, d)
        ),
        "quantize_embeddings": lambda s, d: S.quantize_embeddings(
            _embeddings(s, d)
        ).select(
            "vec_id",
            F.concat_ws(",", "qvec").alias("qvec_csv"),
            "max_abs_err_e6",
        ),
        "embedding_outliers": lambda s, d: S.embedding_outliers(
            _embeddings(s, d)
        ),
        # ---- r01-unverified oracle-eligible entries first ----
        "simsearch_topk": lambda s, d: S.simsearch_topk(_embeddings(s, d)),
        "embedding_neardup": lambda s, d: S.embedding_neardup(
            _embeddings(s, d), threshold=0.4
        ),
        "embedding_neardup_blocked": lambda s, d: S.embedding_neardup_blocked(
            _embeddings(s, d), threshold=0.4
        ),
        "embedding_label_centroids": lambda s, d: S.embedding_label_centroids(
            _embeddings(s, d)
        ),
        "semantic_dedup": lambda s, d: S.semantic_dedup(_embeddings(s, d)),
    }


def oracles():
    out = {
        "pca_project_bound": """
WITH dm AS (SELECT len(embedding) AS d, count(*) AS c FROM embeddings
            GROUP BY 1 ORDER BY c DESC, d ASC LIMIT 1)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings, dm
        WHERE len(embedding) = dm.d) AS n_rows,
       (SELECT CAST(d AS BIGINT) FROM dm) AS d_modal,
       2 AS k, TRUE AS orthonormal_ok, TRUE AS variance_ordered_ok,
       TRUE AS centered_ok
""",
        "simsearch_ann_ivf_bound": ann_recall_sql,
        "simsearch_ann_ivfpq_bound": ann_recall_sql,
        "simsearch_ann_ivf_incremental_bound": ann_recall_sql,
        "kmeans_quantized": kmeans_sql,
        # Hard negatives: the simsearch plan with the label
        # inequality folded into the join.
        "hard_negatives": """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v,
           sqrt(list_reduce(list_transform(embedding::DOUBLE[],
             x -> x * x), (x, y) -> x + y)) AS nrm FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS query_label,
             v AS qv, nrm AS qnrm FROM e WHERE vec_id < 10),
scored AS (SELECT query_id, query_label, e.vec_id AS neighbor_id,
  e.label AS neg_label,
  round(list_reduce(list_transform(list_zip(qv, v),
    s -> s[1] * s[2]), (x, y) -> x + y) / (qnrm * nrm), 6) AS score
  FROM q JOIN e
    ON e.vec_id <> q.query_id AND e.label <> q.query_label),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk
      FROM scored)
SELECT query_id, query_label, neighbor_id, neg_label, score, rnk
FROM r WHERE rnk <= 5
""",
        # Per-dim int8 scalar quantization; ranges fit on the corpus,
        # reconstruction error reported in exact 1e-6 integers.
        "quantize_embeddings": """
WITH comp AS (SELECT vec_id, i AS dim, CAST(embedding[i] AS DOUBLE) AS x
              FROM embeddings,
              unnest(generate_series(1, len(embedding))) AS t(i)),
r AS (SELECT dim, min(x) AS lo, max(x) AS hi FROM comp GROUP BY dim),
q AS (SELECT vec_id, dim, x, lo, hi,
        CASE WHEN hi > lo
             THEN CAST(round((x - lo) / (hi - lo) * 255.0) AS INT)
             ELSE 0 END AS c
      FROM comp JOIN r USING (dim))
SELECT vec_id, array_to_string(list(c ORDER BY dim), ',') AS qvec_csv,
       CAST(round(max(abs(x - (lo + CAST(c AS DOUBLE) / 255.0
            * (hi - lo)))) * 1000000.0) AS BIGINT) AS max_abs_err_e6
FROM q GROUP BY vec_id
""",
        # Prototypicality outliers — ALL-INTEGER recipe (round-4 fix
        # for the one red r3 row): quantize once (floor(x*1e9) BIGINT),
        # centroid kept exact as (sum_q, cnt), dx = xq*cnt - sum_q,
        # d2 = sum(dx^2) in HUGEINT, outlier test d2*n > 2*sum(d2) is
        # a pure integer multiply-compare.  No IEEE division or floor
        # sits between the engines.  Ragged policy: per-label modal
        # dimensionality only (ties -> smallest), mirroring Spark.
        "embedding_outliers": """
WITH e AS (
  SELECT vec_id, label, embedding, len(embedding) AS ndim FROM embeddings),
modal AS (
  SELECT label, ndim FROM (
    SELECT label, ndim, row_number() OVER (
        PARTITION BY label ORDER BY count(*) DESC, ndim ASC) AS rk
    FROM e GROUP BY label, ndim) WHERE rk = 1),
kept AS (SELECT e.* FROM e JOIN modal USING (label, ndim)),
comp AS (
  SELECT vec_id, label, i - 1 AS dim,
    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000.0) AS BIGINT) AS xq
  FROM kept, unnest(generate_series(1, len(embedding))) AS t(i)),
cent AS (SELECT label, dim, sum(xq) AS s FROM comp GROUP BY label, dim),
cnts AS (SELECT label, count(*) AS cnt FROM kept GROUP BY label),
d AS (
  SELECT vec_id, comp.label, cnt,
    sum(CAST(xq * cnt - s AS HUGEINT) * CAST(xq * cnt - s AS HUGEINT)) AS d2
  FROM comp JOIN cent USING (label, dim) JOIN cnts ON comp.label = cnts.label
  GROUP BY vec_id, comp.label, cnt),
lab AS (SELECT label, sum(d2) AS sd, count(*) AS n FROM d GROUP BY label)
SELECT vec_id, d.label,
  CAST(d2 // (CAST(cnt AS HUGEINT) * cnt * 1000000) AS BIGINT) AS dist2_e12,
  CAST(CASE WHEN d2 * n > 2 * sd THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
FROM d JOIN lab ON d.label = lab.label
""",
        # k greedy MMR rounds unrolled (see _mmr_sql)
        "mmr_diverse_topk": _mmr_sql(),
        # r10: integer-plane sign-LSH — the candidate set itself is
        # engine-reproducible (see _embedding_neardup_lsh_sql)
        "embedding_neardup_lsh": _embedding_neardup_lsh_sql(),
        "simsearch_ann_lsh": _simsearch_ann_lsh_sql(),
        "semantic_dedup_lsh": _semantic_dedup_lsh_sql(),
        "embedding_label_centroids": """
SELECT label, CAST(i - 1 AS BIGINT) AS dim, count(*) AS n_vecs,
       CAST(sum(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000000.0)
                     AS BIGINT)) AS DOUBLE)
         / 1000000000.0 / count(*) AS centroid
FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
GROUP BY label, i
""",
        "semantic_dedup": f"""
WITH RECURSIVE
e0 AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       sqrt({_SQN.format(a='embedding::DOUBLE[]')}) AS nrm FROM embeddings),
p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      round({_DOT.format(a='a.v', b='b.v')} / (a.nrm * b.nrm), 6) AS score
      FROM e0 a JOIN e0 b ON a.vec_id < b.vec_id),
jp AS (SELECT vec_a, vec_b FROM p WHERE score >= 0.4),
ed AS (SELECT vec_a AS a, vec_b AS b FROM jp
       UNION SELECT vec_b, vec_a FROM jp),
nodes AS (SELECT DISTINCT a AS doc FROM ed),
reach AS (
  SELECT doc, doc AS r FROM nodes
  UNION
  SELECT reach.doc, ed.b FROM reach JOIN ed ON reach.r = ed.a),
lab AS (SELECT doc, min(r) AS cluster_id FROM reach GROUP BY doc)
SELECT v.vec_id,
       CAST(COALESCE(l.cluster_id, v.vec_id) AS BIGINT) AS cluster_id,
       COALESCE(l.cluster_id, v.vec_id) = v.vec_id AS keep
FROM embeddings v LEFT JOIN lab l ON l.doc = v.vec_id
""",
        # norms precomputed per vector, pair score = dot/(na*nb) —
        # the exact expression shape of similarity._pair_score so the
        # doubles match bit-for-bit
        "simsearch_topk": f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
           sqrt({_SQN.format(a='embedding::DOUBLE[]')}) AS nrm FROM embeddings),
q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qnrm FROM e WHERE vec_id < 10),
scored AS (SELECT query_id, e.vec_id AS neighbor_id,
  round({_DOT.format(a='qv', b='v')} / (qnrm * nrm), 6) AS score
  FROM q JOIN e ON e.vec_id <> q.query_id),
r AS (SELECT *, CAST(row_number() OVER (PARTITION BY query_id
        ORDER BY score DESC, neighbor_id) AS BIGINT) AS rnk FROM scored)
SELECT query_id, neighbor_id, score, rnk FROM r WHERE rnk <= 10
""",
        "embedding_neardup": _NEARDUP_SQL,
        # bit-exact twin (BLAS screen + exact rescore) — same oracle
        "embedding_neardup_blocked": _NEARDUP_SQL,
    }
    return out
