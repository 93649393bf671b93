"""Entity-resolution string matching: a distributed edit-distance
self-join (fuzzy matching) built on segment signatures — the PassJoin
family (Li, Deng, Feng: "PassJoin: a partition-based method for
similarity joins", PVLDB 2011; public literature).

Why not a cross join + ``levenshtein``: the exact pair predicate is
O(n²) comparisons — the DuckDB oracle does exactly that as the
correctness anchor, but at 100 TB the engine path must generate
CANDIDATES from an equi-join.  Pigeonhole lemma: partition a string
into ``k+1`` contiguous segments; any string within edit distance
``k`` must contain at least one of those segments VERBATIM, starting
within ±``k`` of the segment's home position.  So:

- index side: each string emits its ``k+1`` segments keyed by
  (string length, segment id, segment text) — O(k) rows per string;
- probe side: each string emits, for every candidate indexed length
  ``l`` within ±``k`` of its own, every substring that could equal
  segment ``i`` of an ``l``-length string at shift ``d`` ∈ [-k, k] —
  O(k²) rows per string (the loose positional bound; the tighter
  PassJoin shift rules only shrink candidates, never correctness);
- equi-join on the signature key, canonical pair ordering + distinct,
  then the exact ``levenshtein(a, b) <= k`` residual verify.

Everything is JVM expressions (substring / sequence / explode /
levenshtein) — no Python in the path — and the only shuffles are the
signature equi-join and the pair distinct, both keyed.  Skewed
signatures (a segment shared by a mass-duplicated value) behave like
any hot equi-join key: AQE skew-split handles moderate cases; for
pathological corpora pre-dedup exact duplicates first (dedup_exact)
exactly as the LSH families here do.

Reference scope note: the reference engine (Flink DGIM jobs) has no
string-matching surface; this is part of the LLM-pipeline /
entity-resolution extension mandated by the driver's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_segment_geometry(df: DataFrame, k: int, lcol):
    """Attach segment id ``i`` (1..k+1) plus its start ``p`` and
    length ``sl`` for partitioning a string of length ``lcol`` into
    ``k+1`` even segments (first segments get the shorter length:
    base = l div (k+1), the last ``l mod (k+1)`` segments get
    base + 1).  All-integer arithmetic, identical on any engine."""
    parts = F.lit(k + 1)
    base = (lcol / parts).cast("long")  # floor for non-negative
    rem = lcol - base * parts
    i = F.col("i")
    extra = F.greatest(F.lit(0), i - (parts - rem) - 1)
    sl = base + F.when(i > parts - rem, 1).otherwise(0)
    p = (i - 1) * base + extra + 1
    return df.withColumn("sl", sl.cast("int")).withColumn(
        "p", p.cast("int")
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_ed: int = 1,
    max_bucket: int | None = None,
) -> DataFrame:
    """All pairs (id_lo < id_hi) whose ``text_col`` values are within
    Levenshtein distance ``max_ed``, with the exact distance.

    ``max_bucket`` (opt-in, default None = exact): drop signature
    buckets holding more than this many strings before the join —
    the hot-bucket cap of the LSH families applied here.  Formulaic
    corpora (zero-padded IDs, templated names) can share one segment
    VERBATIM across the whole corpus, making that signature bucket
    O(n) wide and the candidate join O(n²); under a cap the join
    stays near-linear at the cost of possibly missing pairs whose
    ONLY shared surviving segment was hot (recall trade documented,
    mirror of ``minhash_lsh_pairs(max_bucket=...)``).  Collapse
    exact duplicates first (``dedup_exact``) — duplicate classes are
    the other O(n²) source and the cap does not repair them.

    Output: ``id_lo, id_hi, ed`` (BIGINT, BIGINT, BIGINT).
    """
    if max_ed < 1:
        raise ValueError("max_ed must be >= 1 (use dedup_exact for 0)")
    k = max_ed
    s = df.select(
        F.col(id_col).cast("bigint").alias("id"),
        F.col(text_col).alias("txt"),
        F.length(text_col).cast("int").alias("m"),
    ).filter(F.col("txt").isNotNull() & (F.col("m") > 0))

    seg_ids = s.withColumn(
        "i", F.explode(F.sequence(F.lit(1), F.lit(k + 1)))
    )
    # index side: the string's own segments (l = its own length)
    idx = _with_segment_geometry(
        seg_ids.withColumn("l", F.col("m")), k, F.col("l")
    ).select(
        "id",
        F.col("txt").alias("txt_i"),
        "l",
        "i",
        F.expr("substring(txt, p, sl)").alias("sig"),
    )
    # probe side: substrings compatible with segment i of an l-length
    # string, for every l within ±k and every shift d within ±k
    probe = _with_segment_geometry(
        seg_ids.withColumn(
            "l",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(1), F.col("m") - k),
                    F.col("m") + k,
                )
            ),
        ),
        k,
        F.col("l"),
    ).withColumn(
        "st", F.explode(F.sequence(F.col("p") - k, F.col("p") + k))
    ).filter(
        (F.col("st") >= 1)
        & (F.col("st") + F.col("sl") - 1 <= F.col("m"))
        & (F.col("sl") >= 1)
    ).select(
        F.col("id").alias("id_p"),
        F.col("txt").alias("txt_p"),
        "l",
        "i",
        F.expr("substring(txt, st, sl)").alias("sig"),
    )
    # pigeonhole blind spot: a string of length <= k can have ALL its
    # segments destroyed by k edits, so pairs where BOTH sides are
    # that short can evade the segment signatures.  But any two
    # strings of length <= k are trivially within distance k
    # (substitute the overlap, insert the rest), so the class pairs
    # exhaustively with itself through ONE sentinel signature bucket
    # (l = -1) appended to both join sides — same equi-join node, no
    # cartesian, and the class ("strings shorter than k+1 chars") is
    # negligible for real corpora.
    shorts = s.filter(F.col("m") <= k)
    idx = idx.unionByName(
        shorts.select(
            "id",
            F.col("txt").alias("txt_i"),
            F.lit(-1).cast("int").alias("l"),
            F.lit(0).cast("int").alias("i"),
            F.lit("").alias("sig"),
        )
    )
    probe = probe.unionByName(
        shorts.select(
            F.col("id").alias("id_p"),
            F.col("txt").alias("txt_p"),
            F.lit(-1).cast("int").alias("l"),
            F.lit(0).cast("int").alias("i"),
            F.lit("").alias("sig"),
        )
    )
    if max_bucket is not None:
        hot = (
            idx.groupBy("l", "i", "sig")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("l", "i", "sig")
        )
        idx = idx.join(hot, ["l", "i", "sig"], "left_anti")
        probe = probe.join(hot, ["l", "i", "sig"], "left_anti")
    cand = (
        idx.join(probe, ["l", "i", "sig"])
        .filter(F.col("id") != F.col("id_p"))
        .select(
            F.least("id", "id_p").alias("id_lo"),
            F.greatest("id", "id_p").alias("id_hi"),
            F.when(F.col("id") < F.col("id_p"), F.col("txt_i"))
            .otherwise(F.col("txt_p"))
            .alias("t_lo"),
            F.when(F.col("id") < F.col("id_p"), F.col("txt_p"))
            .otherwise(F.col("txt_i"))
            .alias("t_hi"),
        )
        .distinct()
    )
    # banded verify (r12): levenshtein with a threshold runs the
    # O(len·k) diagonal band and bails out early instead of the full
    # O(len²) DP — exact for every distance ≤ k (it returns the true
    # distance, or -1 past the threshold, which the old ed <= k filter
    # discarded anyway).  On templated corpora a shared segment makes
    # the candidate set O(bucket²), so the verify is the volume stage.
    ed = F.levenshtein("t_lo", "t_hi", threshold=k).cast("bigint")
    return cand.select("id_lo", "id_hi", ed.alias("ed")).filter(
        (F.col("ed") >= 0) & (F.col("ed") <= k)
    )
