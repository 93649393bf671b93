"""Document-quality operators for LLM training-data curation
(north-star surface, SURVEY.md §7.6): Gopher-style rule filters,
within-document repetition signals, corpus-frequency commonness
scoring (the CCNet idea with integer arithmetic instead of a LM), and
PII redaction.

Design notes (100 TB):
- ``gopher_quality`` / ``repetition_stats`` / ``pii_redact`` are
  map-only — pure JVM expressions per row, no shuffle, trivially
  scalable.  The in-row O(n_tokens · n_distinct) frequency scans are
  bounded by document length; for multi-megabyte documents switch to
  the explode+groupBy form (same answer, one shuffle).
- ``unigram_commonness`` shuffles once to build the vocabulary
  (words → counts, map-side combined) and once to re-aggregate
  per document; the vocabulary joins back via broadcast (vocabulary
  ≪ corpus).  All scores are integer ppm (parts-per-million) so
  every engine sums them exactly in any order.

Determinism: outputs are BIGINTs or doubles produced by a fixed
sequence of IEEE ops on exact integers — hash-stable vs the DuckDB
oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .text import STOPWORDS

# mirrored in the DuckDB oracle — keep in sync with __spark_entry__
GOPHER_MIN_WORDS = 10
GOPHER_MAX_WORDS = 1000
GOPHER_MIN_MEAN_WORD_LEN = 2.0
GOPHER_MAX_MEAN_WORD_LEN = 12.0
GOPHER_MAX_TOP_WORD_FRAC = 0.20
GOPHER_MIN_DISTINCT_FRAC = 0.30

PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
PII_PHONE = "\\+?[0-9][0-9 -]{7,}[0-9]"


def _words(col: str = "text"):
    return F.split(F.col(col), " ")


def gopher_quality(documents: DataFrame) -> DataFrame:
    """Gopher-style rule filter (word-count bounds, mean word length,
    top-word concentration, distinct-word fraction, stopword
    presence) emitting the per-rule signals and the final verdict.

    Every signal is computed in-row from exact integers; the only
    doubles are final divisions in a fixed order (reference semantics:
    the published Gopher rules; thresholds adapted to the synthetic
    corpus so both branches are exercised)."""
    staged = documents.select("doc_id", _words().alias("w")).select(
        "doc_id", "w", F.array_distinct("w").alias("wd")
    )
    w = F.col("w")
    n = F.size(w)
    sum_len = F.aggregate(
        F.transform(w, lambda x: F.length(x).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda a, x: a + x,
    )
    top_cnt = F.array_max(
        F.transform(
            F.col("wd"),
            lambda d: F.size(F.filter(w, lambda x: x == d)).cast("bigint"),
        )
    )
    n_distinct = F.size(F.col("wd"))
    n_stop = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS)))
    mean_len = sum_len / n  # bigint / int -> double, one IEEE op
    top_frac = top_cnt / n
    distinct_frac = n_distinct / n
    passes = (
        (n >= GOPHER_MIN_WORDS)
        & (n <= GOPHER_MAX_WORDS)
        & (mean_len >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_len <= GOPHER_MAX_MEAN_WORD_LEN)
        & (top_frac <= GOPHER_MAX_TOP_WORD_FRAC)
        & (distinct_frac >= GOPHER_MIN_DISTINCT_FRAC)
        & (n_stop > 0)
    )
    return staged.select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        top_frac.alias("top_word_frac"),
        distinct_frac.alias("distinct_frac"),
        n_stop.cast("bigint").alias("n_stopwords"),
        passes.alias("passes_gopher"),
    )


def repetition_stats(documents: DataFrame) -> DataFrame:
    """Within-document repetition signals (the Gopher duplicate-ngram
    family): fraction of bigrams consumed by the most frequent bigram,
    and the duplicate-bigram fraction (1 - distinct/total).  In-row,
    map-only; no shuffle."""
    # Materialize words → bigrams as separate projections: each alias
    # is consumed more than once downstream, so CollapseProject keeps
    # them as attribute references instead of inlining the split()
    # into every lambda (which turns O(n) into O(n²) re-splits).
    staged = (
        documents.select("doc_id", _words().alias("w"))
        .filter(F.size("w") >= 2)
        .select(
            "doc_id",
            F.expr(
                "transform(sequence(1, size(w) - 1), "
                "i -> concat(element_at(w, i), ' ', element_at(w, i + 1)))"
            ).alias("bg"),
        )
        .select("doc_id", "bg", F.array_distinct("bg").alias("bgd"))
    )
    nb = F.size("bg")
    top_cnt = F.array_max(
        F.transform(
            F.col("bgd"),
            lambda d: F.size(
                F.filter(F.col("bg"), lambda x: x == d)
            ).cast("bigint"),
        )
    )
    return staged.select(
        "doc_id",
        nb.cast("bigint").alias("n_bigrams"),
        top_cnt.alias("top_bigram_count"),
        (top_cnt / nb).alias("top_bigram_frac"),
        ((nb - F.size("bgd")) / nb).alias("dup_bigram_frac"),
    )


def unigram_commonness(
    documents: DataFrame, broadcast_vocab: bool = True
) -> DataFrame:
    """CCNet-flavored commonness score without a language model: each
    token scores its corpus frequency in integer ppm; a document's
    score is the exact BIGINT sum (order-independent) and the mean is
    one integer division.  Rare-word-heavy documents score low —
    the same signal a unigram-LM perplexity gives, kept exact so the
    oracle hash matches.

    Two shuffles at scale: token → vocabulary counts (map-side
    combined), then per-doc re-aggregation.  ``broadcast_vocab``
    controls the token↔ppm join strategy: True (default) broadcasts
    the vocabulary, which is right while the *distinct-token* table
    fits the driver/broadcast limit (a Heaps'-law vocabulary of a
    ~100 TB web corpus is ~10⁸ rows / a few GB — past that, pass
    False to take the shuffle hash join and let AQE plan it)."""
    toks = documents.select("doc_id", F.explode(_words()).alias("w"))
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = vocab.agg(F.sum("c").alias("t"))
    ppm = vocab.crossJoin(F.broadcast(total)).select(
        "w", F.expr("CAST(c * 1000000 DIV t AS BIGINT)").alias("ppm")
    )
    return (
        toks.join(F.broadcast(ppm) if broadcast_vocab else ppm, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("ppm").alias("sum_ppm"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_ppm",
            F.expr("CAST(sum_ppm DIV n_tokens AS BIGINT)").alias("mean_ppm"),
        )
    )


def pii_redact(documents: DataFrame) -> DataFrame:
    """PII scrub for training corpora: replace emails / IPv4s / phone
    runs with typed placeholder tokens, and count each class.  Pure
    JVM regex, map-only; the patterns avoid lookaround so the Java
    and RE2 (DuckDB) engines agree.  The synthetic corpus contains no
    PII (counts are zero there) — behavior is verified on constructed
    strings in tests/test_quality.py."""
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return documents.select(
        "doc_id",
        clean.alias("clean_text"),
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("bigint").alias(
            "n_emails"
        ),
        F.regexp_count(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"), F.lit(PII_IPV4)
        )
        .cast("bigint")
        .alias("n_ips"),
        F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
                PII_IPV4,
                "<IP>",
            ),
            F.lit(PII_PHONE),
        )
        .cast("bigint")
        .alias("n_phones"),
    )


def compression_ratio(documents: DataFrame, level: int = 6) -> DataFrame:
    """Per-doc zlib-deflate compression ratio in exact permille —
    the modern redundancy quality signal (pretraining curation drops
    both tails: very low ratio = template/repetitive boilerplate,
    very high = high-entropy junk that no LM benefits from).

    Output: (doc_id, n_bytes, comp_permille) with
    ``comp_permille = len(deflate(text)) * 1000 // len(text_bytes)``
    (0 for empty/NULL text — the documented dirty-row contract).

    Rows-only for the driver (no SQL engine exposes deflate); exact
    values for fixed inputs are pinned in pytest against the same
    zlib build.  Scale shape: map-only — an Arrow-batched pandas_udf
    over the text column, no shuffle at all; cost is the deflate
    itself (~100 MB/s/core at level 6), embarrassingly parallel."""
    @pandas_udf("bigint")
    def permille(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return 0
            raw = t.encode("utf-8")
            if not raw:
                return 0
            return len(zlib.compress(raw, level)) * 1000 // len(raw)

        return texts.map(one)

    return documents.select(
        "doc_id",
        F.length(F.encode(F.coalesce("text", F.lit("")), "utf-8"))
        .cast("bigint")
        .alias("n_bytes"),
        permille("text").alias("comp_permille"),
    )


def compression_ratio_bound(
    documents: DataFrame, level: int = 6
) -> DataFrame:
    """Deflate-envelope anchor for :func:`compression_ratio` (the
    ``tumble_dgim_bound`` pattern, VERDICT r9 ask #8): per doc emit
    the CLOSED-FORM worst-case output size — zlib's documented
    ``compressBound(n) = n + (n>>12) + (n>>14) + (n>>25) + 13`` —
    next to a verdict that the ACTUAL deflate output lies inside
    ``[8, compressBound(n)]`` bytes (zlib stream floor: 2-byte
    header + ≥2-byte deflate payload + 4-byte adler32).  Every
    output column except the Spark-computed verdict is an integer
    function of ``n_bytes``, so the DuckDB twin recomputes the
    whole row and the hash check fails iff zlib ever leaves its
    own envelope — anchoring the rows-only ``compression_ratio``
    values without needing deflate in SQL.  Empty/NULL text rows
    carry the 0-permille contract and a vacuous-true verdict."""

    @pandas_udf("bigint")
    def comp_len(texts: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None:
                return 0
            raw = t.encode("utf-8")
            if not raw:
                return 0
            return len(zlib.compress(raw, level))

        return texts.map(one)

    n = F.length(F.encode(F.coalesce("text", F.lit("")), "utf-8")).cast(
        "bigint"
    )
    bound = (
        n
        + F.shiftrightunsigned(n, 12)
        + F.shiftrightunsigned(n, 14)
        + F.shiftrightunsigned(n, 25)
        + F.lit(13)
    )
    c = comp_len("text")
    return documents.select(
        "doc_id",
        n.alias("n_bytes"),
        bound.alias("bound_bytes"),
        F.when(n == 0, F.lit(True))
        .otherwise((c >= 8) & (c <= bound))
        .alias("within_bound"),
    )
