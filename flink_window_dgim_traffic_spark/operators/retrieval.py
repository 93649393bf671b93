"""Keyword retrieval over ``documents``: BM25 scoring (north-star
surface — the lexical-search sibling of ``similarity.simsearch_topk``).

Scale shape: for a FIXED query-term list the score needs only (a) one
tiny corpus-stats aggregate — N, avgdl, per-term document frequency —
broadcast back to every task, and (b) per-doc term frequencies computed
inside the row with JVM higher-order functions.  No explode, no
inverted-index shuffle, no join on terms: the whole query is one scan +
one broadcast of a single stats row + TakeOrderedAndProject for the
top-k.  (Building a materialized inverted index only pays off for
high-QPS serving, which is not a batch engine's job.)

Float discipline: every arithmetic step is written in the same order as
the DuckDB oracle (exact-int tf/df/dl, exact avgdl since token counts
sum exactly in doubles, then one ln per term), and the final score is
rounded to 6 dp on both sides before the ORDER BY, so the top-k set and
order are engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BM25_K1 = 1.2
BM25_B = 0.75
QUERY_TERMS = ("join", "hash", "scan")
TOP_K = 10


def bm25_topk(
    documents: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = TOP_K,
) -> DataFrame:
    """Top-``k`` docs by BM25 for the fixed ``terms`` query.

    Output: (doc_id, bm25) ordered by score desc, doc_id asc.
    idf uses the BM25+-style always-positive form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``.
    """
    toks = F.split(F.col("text"), " ")
    d = documents.select(
        "doc_id",
        toks.alias("ws"),
        F.size(toks).cast("double").alias("dl"),
    )
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.array_contains("ws", t).cast("bigint"))
            .cast("double")
            .alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = d.join(F.broadcast(stats))
    score = None
    for i, t in enumerate(terms):
        tf = F.size(
            F.filter(F.col("ws"), lambda w: w == F.lit(t))  # noqa: B023
        ).cast("double")
        df = F.col(f"df_{i}")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
        )
        # tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)), constants
        # pre-folded to the same literals the oracle SQL spells out
        comp = (
            idf
            * (tf * F.lit(BM25_K1 + 1))
            / (
                tf
                + F.lit(BM25_K1)
                * (
                    F.lit(1 - BM25_B)
                    + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
                )
            )
        )
        score = comp if score is None else score + comp
    return (
        scored.select("doc_id", F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(k)
    )


def tfidf_top_terms(documents: DataFrame, k: int = 3) -> DataFrame:
    """Per-document top-``k`` characteristic terms by TF-IDF — the
    corpus-analytics sibling of :func:`bm25_topk` (what is each doc
    ABOUT, for datasheets / topic drift monitoring / keyword-based
    routing).

    Integer determinism: tf and df are exact counts; idf is quantized
    ONCE to micro-nats (``round(ln(N/df)·10^6)`` — the same single-ln
    recipe as ``text.word_entropy``; N/df is one exact-int IEEE
    divide, identical in both engines) and the ranking score is the
    exact BIGINT ``tf·idf_micro``, tie-broken by term asc — so the
    top-k SET and order are engine-independent with no float compare
    anywhere.

    Output: (doc_id, term, tf, idf_micro, score_micro, rnk).

    Scale shape: one explode + (doc, term) partial-agg shuffle builds
    tf; df folds out of the same pass via a (term) re-aggregation
    (distinct-doc counts, partial-aggregated); the one-row corpus
    count broadcasts; ROW_NUMBER partitions per doc (vocabulary-of-
    one-doc sized).  The df table joins back on term — that join is
    shuffle-on-term over the tf table, which is |doc·distinct-term|,
    already reduced from raw token volume."""
    tf = (
        documents.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    n = documents.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.log(F.col("n_docs") / F.col("df")) * F.lit(1e6), 0
            )
            .cast("bigint")
            .alias("idf_micro"),
        )
        .withColumn("score_micro", F.col("tf") * F.col("idf_micro"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= k)
    )


def query_tfidf_topk(
    documents: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = TOP_K,
) -> DataFrame:
    """Top-``k`` docs for a fixed term query under the plain TF-IDF
    scorer (``sum_t tf(t,d) · idf_micro(t)``) — the second lexical
    ranking :func:`rrf_fuse` combines with BM25.  idf is the
    single-ln micro-nat quantization of :func:`tfidf_top_terms`
    (``ln(N/df)``), so the score is an exact BIGINT and the ranking
    is engine-independent.

    Output: (doc_id, score_micro, rnk).  Same scale shape as
    :func:`bm25_topk`: one scan, in-row tf via JVM higher-order
    functions, one broadcast stats row, TakeOrderedAndProject."""
    toks = F.split(F.col("text"), " ")
    d = documents.select("doc_id", toks.alias("ws"))
    stats = d.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        *[
            F.sum(F.array_contains("ws", t).cast("bigint"))
            .cast("double")
            .alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = d.join(F.broadcast(stats))
    score = None
    for i, t in enumerate(terms):
        tf = F.size(
            F.filter(F.col("ws"), lambda w: w == F.lit(t))  # noqa: B023
        ).cast("bigint")
        idf_micro = (
            F.round(
                F.log(F.col("n_docs") / F.col(f"df_{i}")) * F.lit(1e6), 0
            ).cast("bigint")
        )
        comp = tf * idf_micro
        score = comp if score is None else score + comp
    from pyspark.sql import Window

    ranked = (
        scored.select("doc_id", score.alias("score_micro"))
        .orderBy(F.desc("score_micro"), "doc_id")
        .limit(k)
    )
    w = Window.orderBy(F.desc("score_micro"), "doc_id")
    return ranked.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k0: int = 60,
    k: int = TOP_K,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) — the
    standard hybrid-retrieval combiner: each input ranking
    contributes ``1/(k0 + rnk)`` per item, summed across rankings;
    items high in ANY list surface without score calibration between
    scorers (exactly why RAG stacks fuse BM25 with dense ANN this
    way).  Inputs are any DataFrames with (``id_col``, ``rnk``) —
    lexical, dense, or sketch rankings alike.

    Integer determinism: the contribution is quantized as
    ``1000000 // (k0 + rnk)`` (exact integer division), so the fused
    score is a BIGINT sum — cross-engine exact, ties broken by id.

    Output: (``id_col``, rrf_micro, n_lists, rnk).

    Scale shape: a union of the (already tiny, top-k-sized) ranking
    tables, one hash aggregation on the item id, and a
    TakeOrderedAndProject — the fusion never touches the corpora
    behind the rankings."""
    contrib = None
    for r in rankings:
        part = r.select(
            F.col(id_col),
            (F.lit(1000000) / (F.lit(k0) + F.col("rnk")))
            .cast("bigint")
            .alias("c"),
        )
        contrib = part if contrib is None else contrib.unionByName(part)
    fused = (
        contrib.groupBy(id_col)
        .agg(
            F.sum("c").cast("bigint").alias("rrf_micro"),
            F.count(F.lit(1)).alias("n_lists"),
        )
        .orderBy(F.desc("rrf_micro"), id_col)
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rrf_micro"), id_col)
    return fused.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    )


def hybrid_retrieval_rrf(
    documents: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    k: int = TOP_K,
    pool: int = 50,
    k0: int = 60,
) -> DataFrame:
    """Hybrid retrieval for a fixed term query: RRF-fuse the BM25
    ranking with the plain TF-IDF ranking (two genuinely different
    lexical scorers — length-normalized saturation vs raw counts)
    over a ``pool``-deep candidate list each.  Swapping either input
    for a dense ANN ranking (``similarity.simsearch_*`` emit the
    same (id, rnk) shape) is the RAG-stack configuration."""
    from pyspark.sql import Window

    bm = bm25_topk(documents, terms, pool)
    w = Window.orderBy(F.desc("bm25"), "doc_id")
    bm_ranked = bm.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    )
    tfidf_ranked = query_tfidf_topk(documents, terms, pool)
    return rrf_fuse([bm_ranked, tfidf_ranked], k0=k0, k=k)


def posting_lists(
    documents: DataFrame, max_postings: int = 100
) -> DataFrame:
    """Materialized inverted index: per term, its document frequency,
    total term frequency, and the first ``max_postings`` doc ids
    (ascending) serialized as a comma-joined string — the build step
    behind high-QPS lexical serving (the scan-time BM25 above is the
    batch-query sibling; building the index pays off when the same
    corpus is probed many times).

    Scale shape: explode to (term, doc) pairs, ONE keyed aggregation
    to per-(term, doc) tf (map-side combine collapses the fan-out),
    then a per-term rank (``row_number`` over the term partition)
    that caps the posting set to ``max_postings`` BEFORE the
    ``collect_list`` — so a stop-word term's aggregation buffer holds
    at most ``max_postings`` ids, never an O(corpus) array; df/tf
    totals come from the same uncapped rows (conditional collect) and
    remain exact.  The rank window and the term groupBy share one
    hash Exchange (groupBy keys ⊆ window partition keys).  Output is
    fully deterministic (sorted postings, capped slice)."""
    from pyspark.sql import Window

    toks = F.split("text", " ")
    tf = (
        documents.select(
            "doc_id", F.explode(toks).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rnk = F.row_number().over(
        Window.partitionBy("term").orderBy("doc_id")
    )
    capped = tf.withColumn("_rnk", rnk)
    return capped.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("df"),
        F.sum("tf").cast("bigint").alias("total_tf"),
        F.array_join(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("_rnk") <= max_postings, F.col("doc_id")
                    )
                )
            ),
            ",",
        ).alias("postings_head"),
    )
