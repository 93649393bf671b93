"""MMR diverse retrieval and distributed PCA (similarity.py round-5
additions): numpy-reference parity, diversity behavior, projection
invariants."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_window_dgim_traffic_spark.operators import similarity as S


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from flink_window_dgim_traffic_spark.session import table

    return table(spark, sf_dir, "embeddings")


def test_mmr_first_pick_is_top1_and_diversifies(spark):
    # query 0; candidates: two near-identical high-relevance vectors
    # and one moderately-relevant orthogonal-ish vector. Plain top-2 =
    # the twins; MMR must pick the diverse third instead of the twin.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # query
        (10, [0.99, 0.14, 0.0, 0.0]),     # twin A (rel ~0.990)
        (11, [0.99, 0.141, 0.0, 0.0]),    # twin B (rel ~0.990)
        (12, [0.6, 0.0, 0.8, 0.0]),       # diverse (rel 0.6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = (
        S.mmr_diverse_topk(df, n_query=1, pool=3, k=2, lam=0.5)
        .orderBy("mmr_rank")
        .collect()
    )
    assert [r.neighbor_id for r in got] == [10, 12]
    # rank-1 mmr score is lam_e6 * rel_e6 (no diversity penalty yet)
    assert got[0].mmr_score_e12 == 500_000 * round(got[0].score * 1e6)


def test_mmr_matches_numpy_reference(emb):
    lam, pool, k = 0.5, 20, 5
    got = {
        (r.query_id, r.mmr_rank): r.neighbor_id
        for r in S.mmr_diverse_topk(
            emb, n_query=3, pool=pool, k=k, lam=lam
        ).collect()
    }
    rows = emb.filter(F.size("embedding") == 64).collect()
    V = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}

    def cos(a, b):
        return round(
            float(V[a] @ V[b])
            / (np.sqrt(V[a] @ V[a]) * np.sqrt(V[b] @ V[b])),
            6,
        )

    for q in range(3):
        cands = sorted(
            ((cos(q, v), -v) for v in V if v != q), reverse=True
        )[:pool]
        cands = [(-nv, s) for s, nv in cands]
        lam_e6 = int(round(lam * 1e6))
        picked = []
        for rank in range(1, k + 1):
            best = None
            for vid, rel in cands:
                if vid in picked:
                    continue
                div_e6 = max(
                    (int(round(cos(vid, p) * 1e6)) for p in picked),
                    default=0,
                )
                rel_e6 = int(round(rel * 1e6))
                score = lam_e6 * rel_e6 - (1_000_000 - lam_e6) * div_e6
                if best is None or score > best[0] or (
                    score == best[0] and vid < best[1]
                ):
                    best = (score, vid)
            picked.append(best[1])
            assert got[(q, rank)] == best[1], (q, rank)


def test_pca_matches_numpy(emb):
    got = {
        r.vec_id: np.array([r.pc1, r.pc2])
        for r in S.pca_project(emb, k=2).collect()
    }
    rows = emb.filter(F.size("embedding") == 64).collect()
    ids = sorted(r.vec_id for r in rows)
    X = np.array(
        [
            np.asarray(r.embedding, dtype=np.float64)
            for r in sorted(rows, key=lambda r: r.vec_id)
        ]
    )
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / len(X)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:2]
    W = vecs[:, order]
    for j in range(2):
        i = int(np.argmax(np.abs(W[:, j])))
        if W[i, j] < 0:
            W[:, j] = -W[:, j]
    ref = np.round((X - mean) @ W, 6)
    assert set(got) == set(ids)
    err = max(
        float(np.abs(got[v] - ref[i]).max()) for i, v in enumerate(ids)
    )
    # partials sum in a different order than the single numpy pass —
    # allow only rounding-level drift
    assert err <= 2e-6, err


def test_pca_variance_ordering(emb):
    pcs = np.array(
        [[r.pc1, r.pc2] for r in S.pca_project(emb, k=2).collect()]
    )
    v1, v2 = pcs[:, 0].var(), pcs[:, 1].var()
    assert v1 >= v2 > 0


def test_hard_negatives_label_and_order(emb):
    got = S.hard_negatives(emb, n_query=3, k=5).collect()
    rows = emb.filter(F.size("embedding") == 64).collect()
    lab = {r.vec_id: r.label for r in rows}
    by_q = {}
    for r in got:
        assert r.neg_label != r.query_label
        assert r.query_label == lab[r.query_id]
        assert r.neg_label == lab[r.neighbor_id]
        by_q.setdefault(r.query_id, []).append((r.rnk, r.score))
    for q, pairs in by_q.items():
        pairs.sort()
        assert [rk for rk, _ in pairs] == [1, 2, 3, 4, 5]
        scores = [s for _, s in pairs]
        assert scores == sorted(scores, reverse=True)
