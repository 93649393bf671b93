"""Corpus-construction operators for LLM training-data prep
(north-star surface, no reference counterpart): deterministic weighted
source mixing with train/val/test splitting, and benchmark-
contamination auditing.

Both are the map-only / broadcast-join shapes that survive 100 TB:

- ``corpus_mix`` touches each row once — the keep/split decision is a
  pure function of ``doc_id`` (md5-derived uniform integer vs a bigint
  threshold), so there is NO shuffle, no sampling state, and the same
  doc lands in the same split on every run, on any cluster layout, at
  any parallelism.  Integer-threshold comparison (rather than a float
  ``rand() < p``) keeps the decision exactly reproducible in ANSI SQL
  for the oracle and immune to float-rounding drift.
- ``contamination_check`` joins the corpus's shingles against the
  benchmark set's shingles.  Benchmark/eval suites are tiny and fixed
  while the corpus grows, so the benchmark side is broadcast: the scan
  side never shuffles for the join, only for the final per-doc count
  aggregation (partially aggregated map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .dedup import SHINGLE_K, shingles

# 2^60: md5-derived hash values are uniform in [0, 2^60) (15 hex chars)
HASH_SPACE = 1 << 60
# rate_q/4 sampling thresholds compare h < rate_q * 2^58 in exact
# bigint arithmetic (2^58 * 4 == 2^60, no overflow, no floats)
_QUARTER = 1 << 58
# floor(0.90 * 2^60), floor(0.95 * 2^60): train/val split cut points
_TRAIN_CUT = 1037629354146162278
_VAL_CUT = 1095275429376504627


def _hash60(salt: str) -> F.Column:
    """Uniform bigint in [0, 2^60) from md5(salt:doc_id) — identical
    expression exists in DuckDB (``CAST('0x'||substr(md5(..),1,15) AS
    BIGINT)``), so sampling decisions are oracle-checkable."""
    h = F.md5(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def split_col() -> F.Column:
    """The deterministic 90/5/5 train/val/test assignment as a
    reusable Column (same salt + cuts as :func:`corpus_mix`, so a
    doc's split never depends on which pipeline assigned it)."""
    h = _hash60("split")
    return (
        F.when(h < _TRAIN_CUT, "train")
        .when(h < _VAL_CUT, "val")
        .otherwise("test")
    )


def corpus_mix(documents: DataFrame) -> DataFrame:
    """Weighted per-source sampling + deterministic train/val/test
    split.

    Source weight is derived from the source id (``srcN`` keeps
    ``(N mod 4 + 1)/4`` of its docs — the corpus-mixing knob large
    pipelines express as per-source epochs/repetition factors), and
    the 90/5/5 split hash is salted independently of the sampling
    hash so membership in the corpus and membership in a split are
    uncorrelated.  Map-only; no shuffle, no state, rerun-stable.
    """
    src_num = F.substring("source", 4, 10).cast("bigint")
    rate_q = F.pmod(src_num, F.lit(4)) + F.lit(1)  # 1..4 quarters
    h_mix = _hash60("mix")
    h_split = _hash60("split")
    return (
        documents.select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            rate_q.alias("rate_q"),
            h_mix.alias("h_mix"),
            h_split.alias("h_split"),
        )
        .filter(F.col("h_mix") < F.col("rate_q") * F.lit(_QUARTER))
        .select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            F.when(F.col("h_split") < _TRAIN_CUT, "train")
            .when(F.col("h_split") < _VAL_CUT, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def contamination_check(
    documents: DataFrame,
    benchmark_source: str = "src0",
    k: int = SHINGLE_K,
) -> DataFrame:
    """Benchmark decontamination audit: for every non-benchmark doc,
    the fraction of its distinct k-word shingles that also appear in
    the benchmark partition's shingle set.

    Output: (doc_id, n_shingles, n_contaminated, contamination_ratio).
    Docs whose ratio exceeds a policy threshold get dropped before
    training; the audit emits all docs so the threshold stays a
    downstream choice.  Scale shape: the benchmark shingle set is
    broadcast (eval suites are fixed-size while the corpus grows), so
    the corpus side is a map-side hash probe; the only shuffle is the
    partially-aggregated per-doc count.
    """
    is_bench = F.col("source") == benchmark_source
    bench = (
        shingles(documents.filter(is_bench), k)
        .select("s")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    doc_sh = shingles(documents.filter(~is_bench), k)
    return (
        doc_sh.join(F.broadcast(bench), "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated") / F.col("n_shingles"), 6
            ).alias("contamination_ratio"),
        )
    )


def corpus_sample_k(documents: DataFrame, k: int = 100) -> DataFrame:
    """Deterministic uniform k-sample WITHOUT replacement: the k docs
    with the smallest md5-derived hash (bottom-k order statistics on a
    uniform hash ≡ uniform sampling, but reproducible on any cluster
    layout and mergeable: bottom-k of a union is the bottom-k of each
    part's bottom-k).  The eval-set / spot-check sampler every corpus
    pipeline needs.  Plan: TakeOrderedAndProject — per-partition
    top-k then a single k-row merge, never a global sort."""
    return (
        documents.select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            _hash60("sample").alias("sample_h"),
        )
        .orderBy("sample_h", "doc_id")
        .limit(k)
    )


def corpus_datasheet(documents: DataFrame) -> DataFrame:
    """Per-source corpus datasheet: the one-glance table a dataset
    card ships — doc/token volume, length spread, language mix, exact
    duplicate rate.  Single partially-aggregated shuffle on source.

    Token counts use the whitespace contract (text_stats); duplicate
    rate is docs minus distinct texts.  All-integer aggregates, so the
    output is exactly reproducible (no float accumulation order)."""
    toks = F.size(F.split(F.col("text"), " ")).cast("bigint")
    return (
        documents.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(toks).alias("total_tokens"),
            F.min(toks).alias("min_tokens"),
            F.max(toks).alias("max_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.countDistinct("lang").alias("n_langs"),
            (F.count(F.lit(1)) - F.countDistinct("text")).alias(
                "n_exact_dupes"
            ),
        )
    )


def source_cap(documents: DataFrame, cap: int = 15) -> DataFrame:
    """Hard per-source document cap (the RefinedWeb/C4-style domain
    balancing knob): keep the ``cap`` SMALLEST doc_ids per source,
    ranked.  Complements :func:`corpus_mix`'s rate-based sampling —
    a cap bounds a dominant domain absolutely, a rate only scales it.

    Two-phase top-k, the partial-aggregation shape applied to rank:

    1. a map-side pass (``mapInPandas``, Arrow-batched, NO shuffle)
       keeps at most ``cap`` rows per source per input partition —
       memory is bounded by cap × sources-per-partition, and the
       pass only ever drops rows the final rank would drop (the
       global smallest-``cap`` of a source is a subset of the union
       of its per-partition smallest-``cap`` sets, so the pruning is
       lossless);
    2. the authoritative per-source window ranks the survivors —
       its shuffle moves ≤ cap·partitions rows per source instead of
       the full corpus, so one giant domain (the crawl's Wikipedia)
       never funnels its entire row set into a single task's INPUT.
       The per-source group the window sorts is likewise ≤
       cap·partitions rows, never the domain's raw volume.

    Deterministic for any partitioning; output matches the plain
    one-window formulation bit-for-bit."""
    from pyspark.sql import Window

    slim = documents.select("doc_id", "source", "lang", "n_chars")

    def partial(batches):
        import pandas as pd

        best: pd.DataFrame | None = None
        for pdf in batches:
            pool = pdf if best is None else pd.concat((best, pdf))
            best = (
                pool.sort_values("doc_id", kind="mergesort")
                .groupby("source", sort=False)
                .head(cap)
            )
        if best is not None and len(best):
            yield best

    pruned = slim.mapInPandas(
        partial, "doc_id bigint, source string, lang string, n_chars bigint"
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        pruned.withColumn(
            "src_rank", F.row_number().over(w).cast("bigint")
        )
        .filter(F.col("src_rank") <= cap)
    )


def importance_weights(
    documents: DataFrame,
    target_source: str = "src1",
    n_buckets: int = 4096,
) -> DataFrame:
    """Data-selection importance weighting in the DSIR style (Xie et
    al., "Data Selection for Language Models via Importance
    Resampling"): score every document by the log-likelihood ratio of
    its hashed unigram features under a TARGET-domain model vs the
    whole-corpus model, so docs that look like the target domain get
    positive weight.  The target here is the sub-corpus from
    ``target_source`` — the "high-quality exemplar set" slot of the
    published recipe.

    Model: add-one-smoothed multinomials over ``n_buckets`` hashed
    word buckets (md5-derived, the oracle-replicable ``_hash60``
    recipe — a fixed feature space regardless of vocabulary size, the
    property that makes this 100 TB-safe).  Every per-token ln term is
    quantized to a micro-nat BIGINT before summing (the
    ``word_entropy`` cross-engine-exactness trick), so scores are
    exact integers, immune to shuffle/combine order.

    Scale shape: one explode + map-side bucket hash; the two profile
    aggregations reduce to ≤ ``n_buckets`` rows each; the profile
    joins back via broadcast (n_buckets rows — constant-sized, unlike
    a vocabulary); the per-doc reduce is a single map-side-combinable
    sum.  No driver collects, no vocabulary-sized state anywhere.

    Output: doc_id, n_scored_tokens, logratio_e6 (Σ micro-nat
    log-ratio), keep = logratio_e6 > 0.
    """
    h = F.md5(F.concat(F.lit("dsir:"), F.col("w")))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    q = lambda x: F.round(x * 1e6, 0).cast("bigint")  # noqa: E731
    tokb = documents.select(
        "doc_id",
        "source",
        F.explode(F.split("text", " ")).alias("w"),
    ).withColumn("b", bucket)
    # BOTH profiles in one aggregation pass over the token stream
    # (conditional count for the target side) — the corpus is scanned
    # twice total: once for profiles, once for scoring
    counts = tokb.groupBy("b").agg(
        F.count(F.lit(1)).alias("cc"),
        F.sum(
            (F.col("source") == target_source).cast("bigint")
        ).alias("ct"),
    )
    totals = counts.agg(
        F.sum("cc").alias("nc"), F.sum("ct").alias("nt")
    )
    lnq = lambda c: q(F.log(c.cast("double")))  # noqa: E731
    prof = counts.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            (lnq(F.col("ct") + 1) - lnq(F.col("nt") + n_buckets))
            - (lnq(F.col("cc") + 1) - lnq(F.col("nc") + n_buckets))
        ).alias("lr_e6"),
    )
    return (
        tokb.join(F.broadcast(prof), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored_tokens"),
            F.sum("lr_e6").cast("bigint").alias("logratio_e6"),
        )
        .select(
            "doc_id",
            "n_scored_tokens",
            "logratio_e6",
            (F.col("logratio_e6") > 0).cast("bigint").alias("keep"),
        )
    )


def lm_bucket_counts(documents: DataFrame, n_buckets: int = 4096) -> DataFrame:
    """Hashed-unigram LM counts (b, ct) over the given documents —
    the trainable half of :func:`lm_quality_gate`, exposed so
    pipelines can fit the model on an ingested history and apply it
    statically to new arrivals.  Bounded output (≤ n_buckets rows)."""
    h = F.md5(F.concat(F.lit("dsir:"), F.col("w")))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    return (
        documents.select(F.explode(F.split("text", " ")).alias("w"))
        .select(bucket.alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("ct"))
    )


def lm_gate_with_profile(
    documents: DataFrame, counts: DataFrame, n_buckets: int = 4096
) -> DataFrame:
    """Score every doc under an add-one-smoothed hashed-unigram LM
    (``counts`` from :func:`lm_bucket_counts`) against the UNIFORM
    model — the CCNet-style LM quality filter with a hashed unigram
    LM standing in for the 5-gram KenLM: text that shares the
    model's vocabulary scores above uniform, gibberish below.

    keep ⇔ Σ_tok [q(ln(ct_b+1)) − q(ln(N+B))] > n·(−q(ln B)), i.e.
    the per-token average log-likelihood beats ln(1/B).  Every ln is
    micro-nat-quantized BIGINT (the cross-engine-exact recipe);
    scale shape mirrors :func:`importance_weights` — constant-size
    profile broadcast, one map-side-combinable per-doc reduce."""
    import math

    h = F.md5(F.concat(F.lit("dsir:"), F.col("w")))
    bucket = F.pmod(
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint"),
        F.lit(n_buckets),
    )
    q = lambda x: F.round(x * 1e6, 0).cast("bigint")  # noqa: E731
    lnq = lambda c: q(F.log(c.cast("double")))  # noqa: E731
    totals = counts.agg(F.sum("ct").alias("nt"))
    uniform_e6 = int(round(math.log(n_buckets) * 1e6))
    tokb = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).withColumn("b", bucket)
    scored = (
        tokb.join(F.broadcast(counts), "b", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            (
                lnq(F.coalesce(F.col("ct"), F.lit(0)) + 1)
                - lnq(F.col("nt") + n_buckets)
            ).alias("lp_e6"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored_tokens"),
            F.sum("lp_e6").alias("sum_lp"),
        )
        .select(
            "doc_id",
            "n_scored_tokens",
            (
                F.col("sum_lp")
                + F.col("n_scored_tokens") * F.lit(uniform_e6)
            )
            .cast("bigint")
            .alias("loglik_margin_e6"),
        )
        .withColumn(
            "keep", (F.col("loglik_margin_e6") > 0).cast("bigint")
        )
    )


def lm_quality_gate(
    documents: DataFrame,
    target_source: str = "src1",
    n_buckets: int = 4096,
) -> DataFrame:
    """LM quality filter with the model fit on ``target_source``'s
    docs (the high-quality exemplar slot): keep docs whose hashed-
    unigram average log-likelihood under that model beats uniform."""
    profile = lm_bucket_counts(
        documents.filter(F.col("source") == target_source), n_buckets
    )
    return lm_gate_with_profile(documents, profile, n_buckets)


def datasheet_unpivot(documents: DataFrame) -> DataFrame:
    """UNPIVOT (wide→long) over the per-source datasheet — the
    relational surface's melt/stack shape (Flink/ANSI UNPIVOT,
    Spark ``unpivot``/``stack``): one row per (source, metric).
    Adds nothing over the datasheet aggregation itself — a pure
    map-side row-generator on its tiny output."""
    metrics = [
        "n_docs",
        "total_tokens",
        "min_tokens",
        "max_tokens",
        "total_chars",
        "n_langs",
        "n_exact_dupes",
    ]
    return corpus_datasheet(documents).unpivot(
        "source", metrics, "metric", "value"
    )


def token_budget_select(
    documents: DataFrame, budget_tokens: int = 20000
) -> DataFrame:
    """Select the highest-quality documents until a token budget is
    filled — the "best N tokens" primitive behind fixed-compute
    training-set assembly (greedy by quality desc, doc_id tie-break,
    stop when the running token total would pass ``budget_tokens``).

    Output: (doc_id, n_tokens, q_e6) — the selected set.

    NO GLOBAL SORT: the naive form is a full corpus sort + running
    sum (single-partition window — a 100 TB non-starter).  Here the
    integer quality score (exact 1e-6 units) is its own bucket key:
    phase 1 aggregates tokens per DISTINCT SCORE (a ≤10^6-row table —
    bounded by the score codomain, not the corpus), cumulates over
    that tiny table to find the boundary score, and phase 2 keeps
    full buckets via a broadcast semi-join plus a doc_id-ordered
    prefix WITHIN the single boundary bucket (a window partitioned by
    score — only boundary-bucket rows sort).  Result is exactly the
    greedy prefix; only |distinct scores| rows ever pass through an
    ordered window."""
    from flink_window_dgim_traffic_spark.operators.text import (
        quality_score_col,
    )

    toks = F.split("text", " ")
    scored = documents.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(quality_score_col() * F.lit(1000000.0), 0)
        .cast("bigint")
        .alias("q_e6"),
    ).filter(F.col("n_tokens") > 0)
    buckets = scored.groupBy("q_e6").agg(
        F.sum("n_tokens").alias("btok")
    )
    wb = Window.orderBy(F.col("q_e6").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    b = buckets.withColumn("cum", F.sum("btok").over(wb))
    full = b.filter(F.col("cum") <= budget_tokens).select("q_e6")
    boundary = b.filter(
        (F.col("cum") > budget_tokens)
        & (F.col("cum") - F.col("btok") < budget_tokens)
    ).select(
        "q_e6",
        (F.lit(budget_tokens) - (F.col("cum") - F.col("btok"))).alias(
            "remaining"
        ),
    )
    sel_full = scored.join(F.broadcast(full), "q_e6", "left_semi")
    wd = Window.partitionBy("q_e6").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    sel_boundary = (
        scored.join(F.broadcast(boundary), "q_e6")
        .withColumn("cumd", F.sum("n_tokens").over(wd))
        .filter(F.col("cumd") <= F.col("remaining"))
        .drop("remaining", "cumd")
    )
    return sel_full.unionByName(sel_boundary).select(
        "doc_id", "n_tokens", "q_e6"
    )


def corpus_weighted_sample(
    documents: DataFrame, k: int = 100, salt: str = "ws0"
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, inclusion probability
    ∝ quality — the Efraimidis–Spirakis A-ES scheme (each doc gets
    priority u^(1/w) for a uniform u; the top-k priorities ARE a
    weighted sample without replacement).  The "pick k docs biased
    toward quality" primitive, deterministic and engine-exact.

    Determinism: u is a dyadic rational from md5(salt, doc_id) (60
    hash bits + 1 over 2^60 — the bigint→double conversion and the
    power-of-two divide round identically in every IEEE engine), and
    the log-priority ``ln(u)·10^6 / q_e6`` is ONE fixed float
    sequence quantized to a BIGINT key; ranking is key desc (closer
    to zero = higher priority), doc_id tie-break.  Changing ``salt``
    redraws the sample.

    Output: (doc_id, q_e6, key_e6, rnk).  Scale shape: the key is
    map-only; top-k is TakeOrderedAndProject (per-partition heads +
    one k-row merge), never a global sort."""
    from flink_window_dgim_traffic_spark.operators.text import (
        quality_score_col,
    )

    toks = F.split("text", " ")
    scored = documents.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.round(quality_score_col() * F.lit(1000000.0), 0)
        .cast("bigint")
        .alias("q_e6"),
    ).filter((F.col("n_tokens") > 0) & (F.col("q_e6") > 0))
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    u = (h60 + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    key = F.round(
        F.log(u) * F.lit(1000000.0) / F.col("q_e6") * F.lit(1000000.0), 0
    ).cast("bigint")
    ranked = (
        scored.withColumn("key_e6", key)
        .orderBy(F.col("key_e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("key_e6").desc(), F.col("doc_id").asc())
    return ranked.withColumn(
        "rnk", F.row_number().over(w).cast("bigint")
    ).select("doc_id", "q_e6", "key_e6", "rnk")


def leakage_safe_split(
    documents: DataFrame, threshold: float = 0.8
) -> DataFrame:
    """Contamination-safe train/val/test assignment: the split hash
    is computed on the NEAR-DUP CLUSTER id, not the doc id, so every
    member of a near-duplicate group lands in the same partition —
    the leakage mode a plain per-doc split invites (a test document
    whose near-copy sits in train silently inflates eval) cannot
    occur.  The standard eval-hygiene step of LLM corpus pipelines,
    composed from the existing exact-Jaccard pair generation +
    distributed label propagation (``dedup.neardup_clusters``), with
    the SAME salt/cut constants as :func:`split_col` — a singleton
    document (its own cluster) gets exactly the assignment the plain
    split would give it.

    Output: (doc_id, cluster_id, split).

    Scale shape: pair generation and clustering are the already-
    stress-measured bucketed paths; the cluster join back is one
    hash equi-join on doc_id; the split itself is a map-only md5.
    At 100 TB swap the exact pair source for
    ``minhash_lsh_pairs(max_bucket=…)`` — the downstream contract
    (pairs → components → hash) is unchanged."""
    from flink_window_dgim_traffic_spark.operators.dedup import (
        neardup_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(documents, threshold=threshold)
    clusters = neardup_clusters(pairs.select("doc_a", "doc_b"))
    labeled = (
        documents.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("split:"), F.col("cluster_id").cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    return labeled.select(
        "doc_id",
        "cluster_id",
        F.when(h < _TRAIN_CUT, "train")
        .when(h < _VAL_CUT, "val")
        .otherwise("test")
        .alias("split"),
    )


def stratified_sample(
    documents: DataFrame, by: str = "source", k: int = 10
) -> DataFrame:
    """Deterministic stratified sampling: exactly ``min(k, |stratum|)``
    documents per ``by`` group — the per-domain/per-language eval-set
    carve-out every corpus pipeline needs.  With uniform weights,
    Efraimidis–Spirakis reduces to keeping the k SMALLEST salted-md5
    priorities per stratum, so the sample is a pure function of doc
    ids (rerun-stable, engine-independent) and never touches a random
    number generator.

    Output: (doc_id, ``by``, rnk).

    Scale shape: routed through :func:`relational.grouped_topk` — the
    lossless map-side partial top-k prune keeps ≤ k rows per stratum
    per partition before the one authoritative per-stratum window, so
    a dominant stratum never funnels its raw volume into one task."""
    from flink_window_dgim_traffic_spark.operators.relational import (
        grouped_topk,
    )

    df = documents.withColumn("h60", _hash60("strat"))
    return grouped_topk(
        df, [by], "h60", k, ascending=True, tiebreak="doc_id"
    ).select("doc_id", by, "rnk")


def shuffle_shards(documents: DataFrame, n_shards: int = 64) -> DataFrame:
    """Deterministic corpus shuffle for training export: every doc
    gets a shard and a dense within-shard position under the salted
    md5 order — the "global shuffle" step before writing training
    shards, done WITHOUT a global sort.  Training wants examples
    decorrelated from ingest order (same-source/same-crawl runs hurt
    SGD); a hash order is a fixed uniform permutation, reproducible
    on any cluster layout and any parallelism, and appending new docs
    never reorders existing (shard, pos) pairs' relative order within
    a shard prefix... unlike ``ORDER BY rand()``, which is neither
    stable nor restartable.

    Output: ``doc_id, shard, pos`` (all BIGINT; pos is 1-based dense
    within shard).

    Scale shape: shard assignment is map-only (md5 bits); the only
    shuffle is ONE hash exchange on ``shard`` for the within-shard
    row_number — each task sorts one shard, no global sort ever;
    writing then partitions by ``shard``, which is exactly the
    training-reader layout."""
    h = _hash60("shuffle")
    base = documents.select(
        "doc_id",
        (h % F.lit(n_shards)).cast("bigint").alias("shard"),
        h.alias("_h"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("_h").asc(), F.col("doc_id").asc()
    )
    return base.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("pos"),
    )
