"""Deduplication operators over ``documents`` (north-star LLM-pipeline
surface): exact, shingle-Jaccard, MinHash+LSH, SimHash.

Design discipline follows the DGIM pattern (SURVEY.md §7.6): every
operator is expressed as joins/aggregations that scale out — no
whole-corpus collection anywhere.  The shingle→band→bucket-join LSH
shape is the 100 TB path: candidate generation touches only hash
buckets, never the O(n²) pair space.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

SHINGLE_K = 3  # 3-word shingles


def dedup_exact(documents: DataFrame) -> DataFrame:
    """Exact dedup: one kept doc per identical text (hash groupBy —
    scales as a single shuffle on a text hash)."""
    return documents.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    ).select("keep_doc_id", "n_copies")


def shingles(documents: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """Distinct k-word shingles per doc: (doc_id, s).

    Single-pass regex with a word-start lookbehind and overlapping
    lookahead capture — one codegen'd scan projection, no shuffle
    before the ``distinct``.  (A ``transform(sequence, i ->
    element_at(split, ...))`` formulation re-evaluates ``split(text)``
    per position — no common-subexpression elimination inside
    higher-order-function lambdas — and is O(words²) per doc, ~6×
    slower measured.)  Tokenization contract: words are separated by
    single spaces, the shape of the ``documents`` corpus and of the
    DuckDB oracle's ``string_split(text, ' ')``."""
    pat = r"(?<![^ ])(?=(" + r" ".join([r"[^ ]+"] * k) + r"))"
    return documents.select(
        "doc_id",
        F.explode(F.regexp_extract_all("text", F.lit(pat), 1)).alias("s"),
    ).distinct()


def _jaccard_pairs(
    documents: DataFrame, k: int, restrict_to: DataFrame | None = None
) -> DataFrame:
    """Exact shingle-Jaccard via the inverted-index formulation:
    shingle self-join → per-pair intersection counts → |A∩B| /
    (|A|+|B|-|A∩B|).  With ``restrict_to`` (doc_a, doc_b), the join is
    semi-filtered to those pairs BEFORE the per-pair aggregation — the
    LSH verify path at 100 TB only pays for candidate pairs, never the
    full shares-a-shingle pair space."""
    sh = shingles(documents, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = a.join(
        b,
        (F.col("a.s") == F.col("b.s"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
    )
    if restrict_to is not None:
        inter = inter.join(restrict_to, ["doc_a", "doc_b"], "left_semi")
    inter = inter.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("overlap")
    )
    return (
        inter.join(
            sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("c", "ca"),
            "doc_a",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("c", "cb"),
            "doc_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("overlap").cast("double")
                / (F.col("ca") + F.col("cb") - F.col("overlap")).cast("double"),
                6,
            ),
        )
    )


def ngram_jaccard_pairs(
    documents: DataFrame, threshold: float = 0.5, k: int = SHINGLE_K
) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs (inverted-index self-join;
    only docs sharing a shingle ever pair)."""
    return (
        _jaccard_pairs(documents, k)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ----------------------------------------------------------------------
# MinHash + LSH (approximate near-dup at scale)
# ----------------------------------------------------------------------
NUM_PERM = 64
LSH_BANDS = 16  # 16 bands × 4 rows: P(candidate) ≈ 1-(1-j^4)^16


def _minhash_wide(documents: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """One row per doc with ``num_perm`` min-hash columns ``h0..h{n-1}``."""
    sh = shingles(documents)
    return sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
            for i in range(num_perm)
        ]
    )


def minhash_signatures(documents: DataFrame, num_perm: int = NUM_PERM) -> DataFrame:
    """(doc_id, perm, minhash): seeded xxhash64 per shingle per
    permutation, min-reduced per doc.  All JVM-side.

    Column-wise formulation: ``num_perm`` min-aggregate columns over
    the shingle rows, instead of exploding shingles × permutations
    into rows — map-side partial ``min`` means the shuffle carries one
    ``num_perm``-wide row per doc, not |shingles|×num_perm rows.  The
    per-row (perm) shape is restored afterwards from doc-sized data."""
    mins = _minhash_wide(documents, num_perm)
    return mins.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"h{i}") for i in range(num_perm)])).alias(
            "perm", "minhash"
        ),
    )


def minhash_lsh_pairs(
    documents: DataFrame,
    threshold: float = 0.8,
    num_perm: int = NUM_PERM,
    bands: int = LSH_BANDS,
) -> DataFrame:
    """Candidate pairs from LSH band buckets, verified with exact
    shingle Jaccard ≥ threshold.  Output ≡ ngram_jaccard_pairs minus
    LSH false negatives (recall ≈ 1 at j ≥ 0.8 with 16×4 bands)."""
    rows_per_band = num_perm // bands
    # band key = hash of the band's r signature columns, computed on
    # the one-row-per-doc wide aggregate (no per-perm rows, no
    # collect_list shuffle)
    band_keys = _minhash_wide(documents, num_perm).select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col(f"h{b * rows_per_band + j}")
                            for j in range(rows_per_band)
                        ]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "band_key"),
    )
    a, b = band_keys.alias("a"), band_keys.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact verification restricted to the candidate pairs (semi-join
    # pushed below the per-pair aggregation — at scale only candidate
    # pairs are ever aggregated, not the full shingle-sharing space)
    verified = _jaccard_pairs(documents, SHINGLE_K, restrict_to=candidates)
    return verified.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


# ----------------------------------------------------------------------
# near-dup clusters: connected components over the pair graph
# ----------------------------------------------------------------------
def neardup_clusters(
    pairs: DataFrame, max_iters: int = 20
) -> DataFrame:
    """Turn near-dup PAIRS into dedup DECISIONS: connected components
    of the (doc_a, doc_b) graph via iterative label propagation —
    every doc gets the MIN doc_id of its component as ``cluster_id``.

    Each iteration is two join+aggregate rounds (propagate the
    smallest known label across edges), converging in O(diameter)
    iterations; near-dup components are tiny (dup groups), so 2-3
    iterations suffice in practice and ``max_iters`` is a hard stop.
    No driver-side graph — state is a (doc_id, label) DataFrame, so
    the algorithm scales with the cluster like everything else.
    Deterministic: labels are mins, independent of execution order."""
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .union(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        # materialize once: every iteration joins against edges, and
        # without this the full upstream pair pipeline (e.g. the
        # shingle self-join) would re-execute per iteration
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("a").alias("doc_id")).distinct().select(
        "doc_id", F.col("doc_id").alias("label")
    )
    for _ in range(max_iters):
        # smallest neighbor label per node
        neigh = (
            edges.join(labels, edges["b"] == labels["doc_id"])
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
        )
        # checkpoint FIRST (one materialization), then diff the two
        # materialized frames — computing `changed` off the lazy plan
        # would execute the propagate join a second time
        new_ckpt = new_labels.localCheckpoint(eager=True)
        changed = (
            new_ckpt.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_ckpt
        if changed == 0:
            break
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


# ----------------------------------------------------------------------
# SimHash (64-bit) near-dup
# ----------------------------------------------------------------------
def simhash_fingerprints(documents: DataFrame) -> DataFrame:
    """64-bit SimHash per doc from token hashes (stable blake2b, NOT
    Python's randomized hash()).  Vectorized Pandas UDF — the bit-vote
    loop is genuinely imperative."""

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        import numpy as np

        # per-batch vocabulary cache: hash each distinct token once,
        # pre-unpacked to its ±1 bit votes (tokens repeat heavily)
        tok_bits: dict = {}
        shifts = np.arange(64, dtype=np.uint64)

        def bits_of(tok: str):
            v = tok_bits.get(tok)
            if v is None:
                h = np.uint64(
                    int.from_bytes(
                        hashlib.blake2b(tok.encode(), digest_size=8).digest(),
                        "big",
                    )
                )
                v = tok_bits[tok] = (
                    ((h >> shifts) & np.uint64(1)).astype(np.int32) * 2 - 1
                )
            return v

        def one(t: str) -> int:
            toks = (t or "").split()
            if not toks:
                return 0
            votes = np.sum([bits_of(tok) for tok in toks], axis=0)
            fp = int(
                np.bitwise_or.reduce(
                    (votes > 0).astype(np.uint64) << shifts
                )
            )
            # wrap to signed 64-bit for LongType
            return fp - (1 << 64) if fp >= (1 << 63) else fp

        return texts.map(one)

    return documents.select("doc_id", _simhash(F.col("text")).alias("simhash"))


def simhash_pairs(documents: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming, found via
    the 4×16-bit chunk pigeonhole trick (a pair within distance 3 must
    agree exactly on ≥1 of 4 chunks) — bucket join, not O(n²)."""
    fps = simhash_fingerprints(documents)
    chunks = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(
                        F.lit(0xFFFF)
                    )
                    for i in range(4)
                ]
            )
        ).alias("chunk_no", "chunk"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk_no") == F.col("b.chunk_no"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("bigint")
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
