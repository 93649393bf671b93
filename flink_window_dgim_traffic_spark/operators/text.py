"""Text-analysis operators over the ``documents`` table (north-star
LLM-pipeline surface, SURVEY.md §7.6): token stats, regex token
counting, rolling-hash fingerprinting, quality scoring, language-ID.

All-JVM expressions (split / higher-order functions) — no Python in
the hot path except language-ID, which is a vectorized Pandas UDF by
design (profile lookup is genuinely non-relational).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# mirrored in the DuckDB oracle — keep in sync with __spark_entry__
TOKEN_REGEX = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "at")
FP_MOD = 2147483647  # 2^31 - 1
FP_BASE = 131


def _tokens(col: str = "text"):
    return F.split(F.col(col), " ")


def text_stats(documents: DataFrame) -> DataFrame:
    """Per-doc token counts and character length."""
    t = _tokens()
    return documents.select(
        "doc_id",
        F.size(t).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(t)).cast("bigint").alias("n_distinct_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


def token_count_regex(documents: DataFrame) -> DataFrame:
    """BPE-ish tokenizer proxy: count regex token matches (word runs,
    digit runs, single punctuation) — the whitespace-split twin is in
    text_stats."""
    return documents.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), F.lit(0)))
        .cast("bigint")
        .alias("n_regex_tokens"),
    )


def doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Rolling polynomial hash over characters, mod 2^31-1 — a
    deterministic document fingerprint computed with a sequential
    JVM-side fold (no UDF), exactly reproducible in ANSI-ish SQL."""
    chars = F.split(F.col("text"), "")
    fp = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )
    return documents.select("doc_id", fp.alias("fingerprint"))


def quality_score(documents: DataFrame) -> DataFrame:
    """Heuristic quality score: length saturation + non-stopword
    ratio.  Float ops are ordered identically to the oracle SQL so the
    doubles match bit-for-bit."""
    t = _tokens()
    n = F.size(t)
    stop_cnt = F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
    score = F.round(
        F.least(n, F.lit(50)) / F.lit(50) * F.lit(0.5)
        + (F.lit(1) - stop_cnt / n) * F.lit(0.5),
        6,
    )
    return documents.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        stop_cnt.cast("bigint").alias("n_stopwords"),
        score.alias("quality_score"),
    )


def text_normalize(documents: DataFrame) -> DataFrame:
    """Canonical text normalization for dedup pipelines: lowercase,
    strip non-alphanumerics to spaces, collapse whitespace runs, trim.
    Pure JVM regex ops; the oracle applies the identical regex chain."""
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    return documents.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).cast("bigint").alias("norm_len"),
    )


# ----------------------------------------------------------------------
# language ID — marker-word + charset heuristic.  Deterministic, so
# it IS oracle-checkable: the DuckDB twin (entry _lang_id_sql) replays
# the same membership tests; unit tests add constructed samples.
# ----------------------------------------------------------------------
_LANG_MARKERS = {
    "en": ("the", "and", "of", "is", "in"),
    "es": ("el", "la", "de", "que", "los"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "zh": (),  # no latin markers → falls through to "und"/charset rule
}


def lang_id(documents: DataFrame) -> DataFrame:
    """Marker-word + charset language-ID heuristic as a vectorized
    Pandas UDF.  Deterministic; ties broken by language code order."""

    @pandas_udf("string")
    def _pred(texts: pd.Series) -> pd.Series:
        def one(t: str) -> str:
            if t is None or not t.strip():
                return "und"
            if any(ord(ch) > 0x2E80 for ch in t):
                return "zh"
            words = set(t.lower().split())
            best, best_hits = "und", 0
            for lang in sorted(_LANG_MARKERS):
                hits = len(words & set(_LANG_MARKERS[lang]))
                if hits > best_hits:
                    best, best_hits = lang, hits
            return best

        return texts.map(one)

    return documents.select("doc_id", _pred(F.col("text")).alias("pred_lang"))


def top_ngrams(documents: DataFrame, n: int = 2, k: int = 20) -> DataFrame:
    """Corpus-wide word n-gram frequency, top-``k`` (deterministic
    tie-break on the ngram itself) — the vocabulary/contamination
    audit every corpus build runs.  Same single-pass overlapping
    lookahead regex as the shingle extractor (dedup.shingles), but
    WITHOUT per-doc distinct: frequency wants the bag.  Scale shape:
    explode → one partial-aggregated shuffle on the ngram →
    TakeOrderedAndProject (never a global sort of the full ngram
    table)."""
    pat = r"(?<![^ ])(?=(" + r" ".join([r"[^ ]+"] * n) + r"))"
    grams = documents.select(
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(1))
        ).alias("ngram")
    )
    return (
        grams.groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "ngram")
        .limit(k)
    )


def doc_length_histogram(documents: DataFrame, bin_chars: int = 100) -> DataFrame:
    """Document length distribution in fixed-width character bins —
    the first plot anyone makes over a new corpus.  One
    partial-aggregated shuffle on the bin id."""
    bin_id = (F.length("text") / F.lit(bin_chars)).cast("bigint")
    return (
        documents.groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            (F.col("bin") * bin_chars).cast("bigint").alias("len_from"),
            ((F.col("bin") + 1) * bin_chars).cast("bigint").alias("len_to"),
            "n_docs",
        )
    )


def quality_score_col():
    """The heuristic quality score as a reusable Column (same
    expression as :func:`quality_score` / the quantile gate)."""
    t = _tokens()
    n = F.size(t)
    stop_cnt = F.size(F.filter(t, lambda w: w.isin(*STOPWORDS)))
    return F.round(
        F.least(n, F.lit(50)) / F.lit(50) * F.lit(0.5)
        + (F.lit(1) - stop_cnt / n) * F.lit(0.5),
        6,
    )


def quality_thresholds(documents: DataFrame, q: float = 0.5) -> DataFrame:
    """One row per language: the q-th percentile of the heuristic
    quality score — the trainable half of the quantile gate, exposed
    so streaming pipelines can fit thresholds on an already-ingested
    history and apply them statically to new arrivals."""
    scored = documents.select(
        "lang", quality_score_col().alias("quality_score")
    )
    return scored.groupBy("lang").agg(
        F.round(F.percentile("quality_score", F.lit(q)), 6).alias(
            "lang_threshold"
        )
    )


def quality_quantile_gate(documents: DataFrame, q: float = 0.5) -> DataFrame:
    """CCNet-style per-language quality gate: keep docs whose
    heuristic quality score (same expression as
    :func:`quality_score`) reaches their LANGUAGE's q-th percentile.

    The thresholds frame is one row per language — broadcast back
    onto the scoring pass, so the gate itself is map-only after one
    bounded aggregation.  Exact PERCENTILE_CONT semantics per lang
    (languages are few; at 100 TB swap ``approx_percentile``, the
    mergeable t-digest-style twin, as ``value_percentiles_by_type``
    documents — same plan shape, no per-group sort)."""
    scored = documents.select(
        "doc_id", "lang", quality_score_col().alias("quality_score")
    )
    thr = quality_thresholds(documents, q)
    return (
        scored.join(F.broadcast(thr), "lang")
        .filter(F.col("quality_score") >= F.col("lang_threshold"))
        .select("doc_id", "lang", "quality_score", "lang_threshold")
    )


def word_entropy(documents: DataFrame) -> DataFrame:
    """Per-document unigram (word) Shannon entropy in exact
    micro-nat integers — the information-density quality signal
    (low entropy ⇔ repetitive/boilerplate text; pairs with
    ``repetition_stats`` as a Gopher-style filter input).

    Entropy = ln(n) − (Σ_w c_w·ln c_w)/n over word counts c_w.  Both
    ln terms are quantized to 1e-6-nat BIGINTs BEFORE summing, so the
    sums are exact, order-independent integers (shuffle/combine order
    cannot change a bit), and the final division is integer ``div`` —
    the same cross-engine-exactness trick as
    ``embedding_label_centroids``.  Scale shape: explode → ONE
    partially-aggregated shuffle on (doc_id, word) → ONE reduce on
    doc_id; no vector of words ever crosses the network whole and no
    per-doc Python runs."""
    q = lambda x: F.round(x * 1e6, 0).cast("bigint")  # noqa: E731
    counts = (
        documents.select("doc_id", F.explode(_tokens()).alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(q(F.col("c") * F.log(F.col("c").cast("double")))).alias(
            "sum_clnc_e6"
        ),
    )
    ent = (
        q(F.log(F.col("n").cast("double")))
        - F.expr("sum_clnc_e6 div n")
    ).cast("bigint")
    return per_doc.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        ent.alias("entropy_micro_nats"),
    )


def chunk_text(
    documents: DataFrame, size: int = 64, overlap: int = 16
) -> DataFrame:
    """RAG-style sliding-window chunking: split each document into
    ``size``-token chunks advancing by ``size - overlap`` tokens, so
    consecutive chunks share ``overlap`` tokens of context — the
    retrieval-corpus preparation step (and the fixed-window cousin of
    ``packing.sequence_pack``, which packs instead of splits).  The
    final chunk is allowed to run short; a document shorter than one
    window yields exactly one chunk; NULL/empty docs yield none.

    Output: (doc_id, chunk_id, n_chunk_tokens, chunk_text).

    Scale shape: map-only — the chunk count and every slice are
    in-row JVM expressions over the staged token array (one
    codegen'd projection, ZERO shuffles); all-integer start/count
    arithmetic so chunk boundaries are engine-exact."""
    if overlap >= size:
        raise ValueError(f"overlap {overlap} must be < size {size}")
    stride = size - overlap
    toks = F.split("text", " ")
    n = F.size(toks)
    num = F.lit(1) + F.greatest(
        F.lit(0),
        F.floor((n - F.lit(size) + F.lit(stride) - 1) / stride)
        .cast("int"),
    )
    d = documents.select(
        "doc_id", toks.alias("ws"), n.alias("n"), num.alias("num")
    ).filter(F.col("n") > 0)
    return d.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.col("num") - 1)
        ).alias("chunk_id0"),
        "ws",
        "n",
    ).select(
        "doc_id",
        F.col("chunk_id0").cast("bigint").alias("chunk_id"),
        "ws",
        "n",
    ).select(
        "doc_id",
        "chunk_id",
        F.least(
            F.lit(size), F.col("n") - F.col("chunk_id") * stride
        ).cast("bigint").alias("n_chunk_tokens"),
        F.array_join(
            F.slice(
                "ws",
                (F.col("chunk_id") * stride + 1).cast("int"),
                size,
            ),
            " ",
        ).alias("chunk_text"),
    )


def bigram_kn_stats(documents: DataFrame) -> DataFrame:
    """Kneser–Ney continuation statistics over corpus bigrams — the
    LM-training count tables behind interpolated KN smoothing: per
    word, its raw right-position count and its CONTINUATION count
    (how many distinct left contexts it follows), plus the
    continuation probability quantized to exact ppm of the distinct-
    bigram count (``n_left_types · 10^6 // |distinct bigrams|`` —
    integer arithmetic, engine-exact).  The continuation count is the
    famous fix for high-frequency-but-predictable words ("Francisco"
    is frequent yet follows only "San").

    Scale shape: bigrams are an in-row zip of two array slices (no
    per-position re-tokenization), then two keyed aggregations (word
    counts with map-side combine; distinct-left via partial distinct)
    and one broadcast scalar."""
    toks = F.split("text", " ")
    pairs = (
        documents.select(toks.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, F.size("ws") - 1).alias("w1"),
                    F.slice("ws", 2, F.size("ws") - 1).alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    stats = pairs.groupBy(F.col("w2").alias("word")).agg(
        F.count(F.lit(1)).alias("c_right"),
        F.count_distinct("w1").alias("n_left_types"),
    )
    types = pairs.distinct().agg(
        F.count(F.lit(1)).alias("types")
    )
    return stats.crossJoin(F.broadcast(types)).select(
        "word",
        F.col("c_right").cast("bigint").alias("c_right"),
        F.col("n_left_types").cast("bigint").alias("n_left_types"),
        F.expr("n_left_types * 1000000 div types")
        .cast("bigint")
        .alias("p_cont_ppm"),
    )


def collocations_pmi(
    documents: DataFrame, min_count: int = 5
) -> DataFrame:
    """Corpus collocations ranked by pointwise mutual information —
    the classic "strongly associated word pair" statistic behind
    phrase mining and tokenizer-merge candidates (Church & Hanks
    1990).  PMI = log p(xy) / (p(x)·p(y)); since log is monotone the
    ranking only needs the RATIO, which we keep as an exact integer:

        pmi_ratio_micro = c_xy · N_uni² · 10^6  //  (N_bg · c_x · c_y)

    computed in DECIMAL(38,0) (c_xy·N_uni²·10^6 can reach ~10^24 —
    past BIGINT, inside 38 digits; the DuckDB twin uses HUGEINT) so
    both engines agree bit-for-bit — the embedding_outliers
    all-integer recipe applied to text statistics.

    Scale shape: bigrams are an in-row zip of two array slices (the
    bigram_kn_stats staging), unigram/bigram counts are keyed
    aggregations with map-side combine, the two corpus totals are one
    broadcast scalar row, and the c_x/c_y attachment is two keyed
    equi-joins against the (much smaller than the corpus) distinct
    unigram table.  ``min_count`` prunes the long tail BEFORE the
    unigram joins."""
    toks = F.split("text", " ")
    words = documents.select(F.explode(toks).alias("w"))
    uni = words.groupBy("w").agg(F.count(F.lit(1)).alias("c_w"))
    pairs = (
        documents.select(toks.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, F.size("ws") - 1).alias("w1"),
                    F.slice("ws", 2, F.size("ws") - 1).alias("w2"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    bg = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_xy")
    ).filter(F.col("c_xy") >= min_count)
    totals = words.agg(
        F.count(F.lit(1)).alias("n_uni")
    ).crossJoin(pairs.agg(F.count(F.lit(1)).alias("n_bg")))
    d38 = "decimal(38,0)"
    out = (
        bg.join(uni.select(F.col("w").alias("w1"),
                           F.col("c_w").alias("c_x")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("c_w").alias("c_y")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    # integral divide (div), never decimal "/": Spark's fractional
    # decimal division rounds at scale 6, which can disagree with the
    # oracle's exact HUGEINT // at quotient boundaries
    ratio = F.expr(
        f"(cast(c_xy as {d38}) * cast(n_uni as {d38})"
        f" * cast(n_uni as {d38}) * cast(1000000 as {d38}))"
        f" div (cast(n_bg as {d38}) * cast(c_x as {d38})"
        f" * cast(c_y as {d38}))"
    )
    return out.select(
        "w1",
        "w2",
        F.col("c_xy").cast("bigint").alias("c_xy"),
        F.col("c_x").cast("bigint").alias("c_x"),
        F.col("c_y").cast("bigint").alias("c_y"),
        ratio.cast("bigint").alias("pmi_ratio_micro"),
    )


def bigram_surprisal(documents: DataFrame) -> DataFrame:
    """LM-free gibberish/novelty scoring: each document's mean
    integer bigram surprisal against the corpus bigram distribution -
    the cheap proxy for "would a language model be surprised by this
    text" that CCNet-style pipelines use to sort crawl text before
    any real LM exists.  Surprisal of a bigram with corpus count c
    (out of N total bigram occurrences) is quantized to whole BITS:

        bits(b) = floor(log2(N)) - floor(log2(c))

    computed as ``length(bin(N)) - length(bin(c))`` - the binary-
    string length is the exact integer log2 in BOTH engines (no
    float log, no libm divergence), which is what keeps the score
    hash-identical cross-engine.  High mean-bits = rare transitions
    (gibberish or genuinely novel text); low = boilerplate.

    Output per doc: ``doc_id, n_bigrams, mean_bits_milli`` (mean
    surprisal in millibits, exact integer floor-div; docs with <2
    tokens report 0 bigrams and 0 score).

    Scale shape: bigrams are the same in-row zip as
    :func:`bigram_kn_stats`; corpus counts are ONE map-side-
    combinable aggregation; the per-doc score is an equi-join of doc
    bigrams against the (vocab-squared-bounded, typically tiny)
    count table - a stop-bigram hot key is AQE-splittable - and one
    keyed per-doc aggregation.  The count table is reused via an
    eager localCheckpoint so the corpus pass runs once."""
    toks = F.split("text", " ")
    pairs = (
        documents.select("doc_id", toks.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.arrays_zip(
                    F.slice("ws", 1, F.size("ws") - 1).alias("w1"),
                    F.slice("ws", 2, F.size("ws") - 1).alias("w2"),
                )
            ).alias("bg"),
        )
        .select(
            "doc_id",
            F.concat_ws(" ", "bg.w1", "bg.w2").alias("b"),
        )
    )
    counts = (
        pairs.groupBy("b")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    total_bits = counts.agg(
        F.length(F.bin(F.sum("c"))).alias("nb")
    )
    scored = (
        pairs.join(counts, "b")
        .crossJoin(F.broadcast(total_bits))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.expr(
                "CAST(sum(nb - length(bin(c))) * 1000"
                " div count(*) AS BIGINT)"
            ).alias("mean_bits_milli"),
        )
    )
    return (
        documents.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            F.coalesce("mean_bits_milli", F.lit(0))
            .cast("bigint")
            .alias("mean_bits_milli"),
        )
    )
