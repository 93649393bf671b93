"""corpus_quality registry: training-corpus curation and quality gating.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403


def queries():
    return {
        # bound anchors for two rows-only families (VERDICT ask #8,
        # the tumble_dgim_bound pattern): every emitted column except
        # the Spark-computed verdict is a closed form of the raw data,
        # so DuckDB recomputes the row and the hash gate fails iff
        # zlib leaves its compressBound envelope / the KLL sketch
        # breaks its rank-error guarantee
        "compression_ratio_bound": lambda s, d: QL.compression_ratio_bound(
            _documents(s, d)
        ),
        "compression_ratio": lambda s, d: QL.compression_ratio(
            _documents(s, d)
        ),
        "corpus_shuffle_shards": lambda s, d: C.shuffle_shards(
            _documents(s, d), 64
        ),
        "posting_lists": lambda s, d: RT.posting_lists(
            _documents(s, d), 100
        ),
        "leakage_safe_split": lambda s, d: C.leakage_safe_split(
            _documents(s, d)
        ),
        "stratified_sample": lambda s, d: C.stratified_sample(
            _documents(s, d), "source", 5
        ),
        "chunk_text_rag": lambda s, d: T.chunk_text(
            _documents(s, d), 64, 16
        ),
        "hybrid_rrf_topk": lambda s, d: RT.hybrid_retrieval_rrf(
            _documents(s, d)
        ),
        "token_budget_select": lambda s, d: C.token_budget_select(
            _documents(s, d), 20000
        ),
        "corpus_weighted_sample": lambda s, d: C.corpus_weighted_sample(
            _documents(s, d), 100
        ),
        "importance_weights": lambda s, d: C.importance_weights(
            _documents(s, d)
        ),
        "lm_quality_gate": lambda s, d: C.lm_quality_gate(
            _documents(s, d)
        ),
        "datasheet_unpivot": lambda s, d: C.datasheet_unpivot(
            _documents(s, d)
        ),
        "curation_twin": lambda s, d: SP.curation_batch_twin(
            _documents(s, d)
        ),
        "domain_balanced_corpus": lambda s, d: PL.domain_balanced_corpus(
            _documents(s, d)
        ),
        "source_cap": lambda s, d: C.source_cap(_documents(s, d), cap=15),
        "quality_quantile_gate": lambda s, d: T.quality_quantile_gate(
            _documents(s, d), q=0.5
        ),
        # --- LLM-curation quality surface (round 2, never verified) ---
        "gopher_quality": lambda s, d: QL.gopher_quality(_documents(s, d)),
        "repetition_stats": lambda s, d: QL.repetition_stats(_documents(s, d)),
        "pii_redact": lambda s, d: QL.pii_redact(_documents(s, d)),
        # --- SQL-surface completions (round 2, never verified) ---
        "curation_funnel": lambda s, d: PL.curation_funnel(_documents(s, d)),
        "training_corpus": lambda s, d: PL.training_corpus(_documents(s, d)),
        "sequence_pack": lambda s, d: PK.sequence_pack(_documents(s, d)),
        "corpus_mix": lambda s, d: C.corpus_mix(_documents(s, d)),
        "contamination_check": lambda s, d: C.contamination_check(
            _documents(s, d)
        ),
        "bm25_topk": lambda s, d: RT.bm25_topk(_documents(s, d)),
        "corpus_build": lambda s, d: PL.corpus_build(_documents(s, d)),
        "corpus_sample_k": lambda s, d: C.corpus_sample_k(_documents(s, d)),
        "corpus_datasheet": lambda s, d: C.corpus_datasheet(_documents(s, d)),
    }


def oracles():
    out = {
        # Deterministic training-shard shuffle: salted-md5 permutation
        # (the corpus_mix hash recipe), ONE exchange on shard.
        "corpus_shuffle_shards": """
WITH h AS (SELECT doc_id,
    CAST('0x' || substr(md5('shuffle:' || CAST(doc_id AS VARCHAR)), 1, 15)
         AS BIGINT) AS hv
  FROM documents)
SELECT doc_id, CAST(hv % 64 AS BIGINT) AS shard,
       CAST(row_number() OVER (PARTITION BY hv % 64
            ORDER BY hv, doc_id) AS BIGINT) AS pos
FROM h
""",
        "posting_lists": """
WITH tf AS (
    SELECT u.term, doc_id, count(*) AS tf
    FROM (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
         unnest(ws) AS u(term)
    GROUP BY 1,2)
SELECT term, CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       array_to_string(list_sort(list(doc_id))[1:100], ',')
           AS postings_head
FROM tf GROUP BY term
""",
        # Cluster-aware (leakage-safe) split: the split hash is keyed
        # by the near-dup component id (recursive closure of exact
        # jaccard>=0.8), not the doc id; singleton docs hash their own
        # id — same md5/cut recipe as corpus_mix.
        "leakage_safe_split": f"""
WITH RECURSIVE {_SHINGLE_BASE},
jp AS (SELECT doc_a, doc_b
       FROM inter JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       WHERE round(CAST(overlap AS DOUBLE) / CAST(na.c + nb.c - overlap AS DOUBLE), 6) >= 0.8),
e AS (SELECT doc_a AS a, doc_b AS b FROM jp
      UNION SELECT doc_b, doc_a FROM jp),
nodes AS (SELECT DISTINCT a AS doc FROM e),
reach AS (
  SELECT doc, doc AS r FROM nodes
  UNION
  SELECT reach.doc, e.b FROM reach JOIN e ON reach.r = e.a
),
lab AS (SELECT doc AS doc_id, CAST(min(r) AS BIGINT) AS cid
        FROM reach GROUP BY doc),
l AS (SELECT d.doc_id, coalesce(lab.cid, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN lab USING (doc_id)),
h AS (SELECT doc_id, cluster_id,
      CAST('0x' || substr(md5('split:' || CAST(cluster_id AS VARCHAR)), 1, 15)
           AS BIGINT) AS hv
      FROM l)
SELECT doc_id, cluster_id,
       CASE WHEN hv < 1037629354146162278 THEN 'train'
            WHEN hv < 1095275429376504627 THEN 'val'
            ELSE 'test' END AS split
FROM h
""",
        # Reciprocal-rank fusion of the BM25 and plain-TFIDF rankings
        # (50-deep pools, k0=60, exact integer-micro contributions).
        "hybrid_rrf_topk": """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
  FROM documents
), st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
         CAST(sum(CASE WHEN list_contains(ws, 'join') THEN 1 ELSE 0 END)
              AS DOUBLE) AS df_0,
         CAST(sum(CASE WHEN list_contains(ws, 'hash') THEN 1 ELSE 0 END)
              AS DOUBLE) AS df_1,
         CAST(sum(CASE WHEN list_contains(ws, 'scan') THEN 1 ELSE 0 END)
              AS DOUBLE) AS df_2
  FROM d
), s AS (
  SELECT doc_id, dl,
         CAST(len(list_filter(ws, w -> w = 'join')) AS DOUBLE) AS tf_0,
         CAST(len(list_filter(ws, w -> w = 'hash')) AS DOUBLE) AS tf_1,
         CAST(len(list_filter(ws, w -> w = 'scan')) AS DOUBLE) AS tf_2
  FROM d
), bm AS (
  SELECT doc_id, round(
      ln(1.0 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))
        * (tf_0 * 2.2) / (tf_0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
    + ln(1.0 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))
        * (tf_1 * 2.2) / (tf_1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
    + ln(1.0 + (n_docs - df_2 + 0.5) / (df_2 + 0.5))
        * (tf_2 * 2.2) / (tf_2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
    6) AS bm25
  FROM s, st
  ORDER BY bm25 DESC, doc_id
  LIMIT 50
), bmr AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rnk
  FROM bm
), ti AS (
  SELECT doc_id,
    CAST(tf_0 AS BIGINT)
      * CAST(round(ln(n_docs / df_0) * 1000000.0) AS BIGINT)
  + CAST(tf_1 AS BIGINT)
      * CAST(round(ln(n_docs / df_1) * 1000000.0) AS BIGINT)
  + CAST(tf_2 AS BIGINT)
      * CAST(round(ln(n_docs / df_2) * 1000000.0) AS BIGINT)
    AS score_micro
  FROM s, st
  ORDER BY score_micro DESC, doc_id
  LIMIT 50
), tir AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rnk
  FROM ti
), c AS (
  SELECT doc_id, 1000000 // (60 + rnk) AS c FROM bmr
  UNION ALL
  SELECT doc_id, 1000000 // (60 + rnk) AS c FROM tir
), f AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_micro,
         count(*) AS n_lists
  FROM c GROUP BY 1
  ORDER BY rrf_micro DESC, doc_id
  LIMIT 10
)
SELECT doc_id, rrf_micro, n_lists,
       CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
            AS BIGINT) AS rnk
FROM f
""",
        # Deterministic stratified sampling: the 5 smallest salted-md5
        # priorities per source (Efraimidis-Spirakis under uniform
        # weights), doc_id tie-broken.
        "stratified_sample": """
WITH h AS (SELECT doc_id, source,
           CAST('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 15)
                AS BIGINT) AS h60
           FROM documents),
r AS (SELECT doc_id, source,
      CAST(row_number() OVER (PARTITION BY source ORDER BY h60, doc_id)
           AS BIGINT) AS rnk
      FROM h)
SELECT doc_id, source, rnk FROM r WHERE rnk <= 5
""",
        # RAG sliding-window chunking: 64-token chunks, stride 48;
        # chunking stops once a window reaches the doc end.
        "chunk_text_rag": """
WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws,
             len(string_split(text,' ')) AS n FROM documents),
c AS (SELECT doc_id, ws, n,
      1 + greatest(0, (n - 64 + 47) // 48) AS num
      FROM tok WHERE n > 0),
e AS (SELECT doc_id, ws, n,
      unnest(generate_series(0, num - 1)) AS i FROM c)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(least(64, n - i*48) AS BIGINT) AS n_chunk_tokens,
       array_to_string(ws[i*48+1 : i*48+64], ' ') AS chunk_text
FROM e
""",
        # Token-budget greedy selection: highest-quality docs first
        # (quality in exact 1e-6 integers, doc_id tie-break) until the
        # running token total passes the budget.  The oracle is the
        # naive sorted prefix; Spark computes the identical set with
        # a bucket-cumulative two-phase plan (no global doc sort).
        "token_budget_select": f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents),
s AS (SELECT doc_id, len(ws) AS n,
      len(list_filter(ws, w -> w IN {_STOP_LIST})) AS stop_cnt
      FROM tok),
q AS (SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
      CAST(round(round(least(n, 50) / 50 * 0.5
                       + (1 - stop_cnt / n) * 0.5, 6)
                 * 1000000.0) AS BIGINT) AS q_e6
      FROM s WHERE n > 0),
o AS (SELECT *, sum(n_tokens) OVER (
        ORDER BY q_e6 DESC, doc_id ASC
        ROWS UNBOUNDED PRECEDING) AS cum FROM q)
SELECT doc_id, n_tokens, q_e6 FROM o WHERE cum <= 20000
""",
        # Efraimidis-Spirakis weighted sample w/o replacement: priority
        # u^(1/w) as one fixed float sequence (dyadic-rational u, ln,
        # two multiplies, one divide) quantized to BIGINT micro-keys.
        "corpus_weighted_sample": f"""
WITH tok AS (SELECT doc_id, string_split(text, ' ') AS ws
             FROM documents),
s AS (SELECT doc_id, len(ws) AS n,
      len(list_filter(ws, w -> w IN {_STOP_LIST})) AS stop_cnt
      FROM tok),
q AS (SELECT doc_id,
      CAST(round(round(least(n, 50) / 50 * 0.5
                       + (1 - stop_cnt / n) * 0.5, 6)
                 * 1000000.0) AS BIGINT) AS q_e6
      FROM s WHERE n > 0),
k AS (SELECT doc_id, q_e6,
      CAST(round(
        ln((CAST('0x' || substr(md5('ws0:' || CAST(doc_id AS VARCHAR)),
                                1, 15) AS BIGINT) + 1)
           / 1152921504606846976.0)
        * 1000000.0 / q_e6 * 1000000.0) AS BIGINT) AS key_e6
      FROM q WHERE q_e6 > 0)
SELECT doc_id, q_e6, key_e6,
       CAST(row_number() OVER (ORDER BY key_e6 DESC, doc_id ASC)
            AS BIGINT) AS rnk
FROM k ORDER BY key_e6 DESC, doc_id ASC LIMIT 100
""",
        # The streaming curation pipeline's exact semantics as one
        # batch statement: arrival-order cap (=doc_id order), md5
        # dedup vs the src0 history + min-doc_id, history-fit LM gate
        # and per-lang quality thresholds, deterministic train split.
        "curation_twin": f"""
WITH capped AS (
  SELECT doc_id, source, lang, text FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents d WHERE source <> 'src0')
  WHERE rn <= 20),
idx AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE source = 'src0'),
newd AS (SELECT doc_id, source, lang, text, md5(text) AS fp FROM capped),
surv AS (SELECT min(doc_id) AS doc_id FROM newd
         WHERE fp NOT IN (SELECT fp FROM idx) GROUP BY fp),
kept1 AS (SELECT n.doc_id, n.source, n.lang, n.text
          FROM newd n JOIN surv USING (doc_id)),
lmtok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents
          WHERE source = 'src0'),
lmc AS (SELECT CAST('0x' || substr(md5('dsir:' || w), 1, 15) AS BIGINT)
               % 4096 AS b, count(*) AS ct FROM lmtok GROUP BY 1),
lmt AS (SELECT sum(ct) AS nt FROM lmc),
kb AS (SELECT doc_id,
       CAST('0x' || substr(md5('dsir:' || w), 1, 15) AS BIGINT) % 4096 AS b
       FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM kept1)),
ks AS (SELECT doc_id,
         CAST(round(ln(coalesce(ct, 0) + 1) * 1000000.0) AS BIGINT)
       - CAST(round(ln(nt + 4096) * 1000000.0) AS BIGINT) AS lp
       FROM kb LEFT JOIN lmc USING (b), lmt),
lmkeep AS (SELECT doc_id FROM ks GROUP BY doc_id
           HAVING sum(lp) + count(*)
                  * CAST(round(ln(4096) * 1000000.0) AS BIGINT) > 0),
kept2 AS (SELECT k.* FROM kept1 k JOIN lmkeep USING (doc_id)),
bsc AS (SELECT lang,
        round(least(len(ws), 50) / 50 * 0.5
              + (1 - len(list_filter(ws, w -> w IN {_STOP_LIST}))
                 / len(ws)) * 0.5, 6) AS q
        FROM (SELECT lang, string_split(text, ' ') AS ws FROM documents
              WHERE source = 'src0')),
thr AS (SELECT lang, round(quantile_cont(q, 0.5), 6) AS lt
        FROM bsc GROUP BY lang),
scored AS (SELECT doc_id, source, lang,
           round(least(len(ws), 50) / 50 * 0.5
                 + (1 - len(list_filter(ws, w -> w IN {_STOP_LIST}))
                    / len(ws)) * 0.5, 6) AS quality_score
           FROM (SELECT doc_id, source, lang,
                 string_split(text, ' ') AS ws FROM kept2))
SELECT s.doc_id, s.source, s.lang, s.quality_score
FROM scored s JOIN thr USING (lang)
WHERE s.quality_score >= thr.lt
  AND CAST('0x' || substr(md5('split:' || CAST(s.doc_id AS VARCHAR)), 1, 15)
      AS BIGINT) < 1037629354146162278
""",
        # ANSI UNPIVOT of the per-source datasheet (wide -> long)
        "datasheet_unpivot": """
WITH t AS (SELECT source, lang, text, n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           FROM documents),
d AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST(min(n_toks) AS BIGINT) AS min_tokens,
       CAST(max(n_toks) AS BIGINT) AS max_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(count(*) - count(DISTINCT text) AS BIGINT) AS n_exact_dupes
      FROM t GROUP BY source)
SELECT source, metric, value FROM d
UNPIVOT (value FOR metric IN (n_docs, total_tokens, min_tokens,
         max_tokens, total_chars, n_langs, n_exact_dupes))
""",
        # CCNet-style LM quality filter: hashed-unigram LM fit on the
        # src1 exemplars; keep docs whose per-token avg log-likelihood
        # beats uniform.  Micro-nat BIGINT quantization throughout.
        "lm_quality_gate": """
WITH tok AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS w
             FROM documents),
tb AS (SELECT doc_id, source,
         CAST('0x' || substr(md5('dsir:' || w), 1, 15) AS BIGINT) % 4096 AS b
       FROM tok),
c AS (SELECT b, count(*) AS ct FROM tb WHERE source = 'src1' GROUP BY b),
tot AS (SELECT sum(ct) AS nt FROM c),
s AS (SELECT doc_id,
        CAST(round(ln(coalesce(ct, 0) + 1) * 1000000.0) AS BIGINT)
      - CAST(round(ln(nt + 4096) * 1000000.0) AS BIGINT) AS lp
      FROM tb LEFT JOIN c USING (b), tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored_tokens,
  CAST(sum(lp) + count(*)
       * CAST(round(ln(4096) * 1000000.0) AS BIGINT) AS BIGINT)
    AS loglik_margin_e6,
  CAST(CASE WHEN sum(lp) + count(*)
            * CAST(round(ln(4096) * 1000000.0) AS BIGINT) > 0
       THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM s GROUP BY doc_id
""",
        # DSIR importance weights: add-one-smoothed hashed-unigram
        # multinomials (4096 md5 buckets), per-token micro-nat
        # log-ratio quantized to BIGINT before summing.
        "importance_weights": """
WITH tok AS (SELECT doc_id, source, unnest(string_split(text,' ')) AS w
             FROM documents),
tb AS (SELECT doc_id, source,
         CAST('0x' || substr(md5('dsir:' || w), 1, 15) AS BIGINT) % 4096 AS b
       FROM tok),
c AS (SELECT b, count(*) AS cc FROM tb GROUP BY b),
t AS (SELECT b, count(*) AS ct FROM tb WHERE source = 'src1' GROUP BY b),
tot AS (SELECT (SELECT sum(cc) FROM c) AS nc, (SELECT sum(ct) FROM t) AS nt),
prof AS (SELECT c.b,
    (CAST(round(ln(coalesce(ct, 0) + 1) * 1000000.0) AS BIGINT)
     - CAST(round(ln(nt + 4096) * 1000000.0) AS BIGINT))
  - (CAST(round(ln(cc + 1) * 1000000.0) AS BIGINT)
     - CAST(round(ln(nc + 4096) * 1000000.0) AS BIGINT)) AS lr_e6
  FROM c LEFT JOIN t USING (b), tot)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_scored_tokens,
       CAST(sum(lr_e6) AS BIGINT) AS logratio_e6,
       CAST(CASE WHEN sum(lr_e6) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM tb JOIN prof USING (b) GROUP BY doc_id
""",
        # Round-3 composed pipeline: cap → incremental dedup vs the
        # benchmark index → per-lang quality gate (thresholds on the
        # post-dedup population, as the Spark stage computes them) →
        # mix train split.
        "domain_balanced_corpus": f"""
WITH capped AS (
  SELECT doc_id, source, lang, text FROM (
    SELECT d.*, ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents d WHERE source <> 'src0')
  WHERE rn <= 20),
idx AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE source = 'src0'),
newd AS (SELECT doc_id, source, lang, text, md5(text) AS fp FROM capped),
surv AS (SELECT min(doc_id) AS doc_id FROM newd
         WHERE fp NOT IN (SELECT fp FROM idx) GROUP BY fp),
kept1 AS (SELECT n.doc_id, n.source, n.lang, n.text
          FROM newd n JOIN surv USING (doc_id)),
tok AS (SELECT doc_id, source, lang, string_split(text, ' ') AS ws FROM kept1),
c AS (SELECT doc_id, source, lang, len(ws) AS n,
      len(list_filter(ws, w -> w IN {_STOP_LIST})) AS stop_cnt FROM tok),
scored AS (SELECT doc_id, source, lang,
      round(least(n, 50) / 50 * 0.5 + (1 - stop_cnt / n) * 0.5, 6) AS quality_score
      FROM c),
thr AS (SELECT lang, round(quantile_cont(quality_score, 0.5), 6) AS lt
        FROM scored GROUP BY lang),
kept2 AS (SELECT s.doc_id, s.source, s.lang, s.quality_score
          FROM scored s JOIN thr t2 USING (lang)
          WHERE s.quality_score >= t2.lt),
mixed AS (
  SELECT k.*,
         CAST(substr(k.source, 4) AS BIGINT) % 4 + 1 AS rate_q,
         CAST('0x' || substr(md5('mix:' || CAST(k.doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h_mix,
         CAST('0x' || substr(md5('split:' || CAST(k.doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h_split
  FROM kept2 k)
SELECT doc_id, source, lang, quality_score
FROM mixed
WHERE h_mix < rate_q * 288230376151711744
  AND h_split < 1037629354146162278
""",
        "source_cap": """
SELECT doc_id, source, lang, n_chars, CAST(rn AS BIGINT) AS src_rank
FROM (SELECT doc_id, source, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      FROM documents)
WHERE rn <= 15
""",
        "quality_quantile_gate": f"""
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
c AS (SELECT doc_id, lang, len(ws) AS n,
      len(list_filter(ws, w -> w IN {_STOP_LIST})) AS stop_cnt FROM t),
scored AS (SELECT doc_id, lang,
      round(least(n, 50) / 50 * 0.5 + (1 - stop_cnt / n) * 0.5, 6) AS quality_score
      FROM c),
thr AS (SELECT lang, round(quantile_cont(quality_score, 0.5), 6) AS lang_threshold
        FROM scored GROUP BY lang)
SELECT s.doc_id, s.lang, s.quality_score, t2.lang_threshold
FROM scored s JOIN thr t2 USING (lang)
WHERE s.quality_score >= t2.lang_threshold
""",
        "compression_ratio_bound": """
WITH d AS (SELECT doc_id,
           octet_length(encode(coalesce(text, ''))) AS n FROM documents)
SELECT doc_id, CAST(n AS BIGINT) AS n_bytes,
       CAST(n + (n // 4096) + (n // 16384) + (n // 33554432) + 13
            AS BIGINT) AS bound_bytes,
       TRUE AS within_bound
FROM d
""",
        # full pipeline: exact dedup -> near-dup representative keep
        # (recursive closure of jaccard>=0.8 among survivors) ->
        # quality gate; same three stages as operators/pipeline.py
        "training_corpus": f"""
WITH RECURSIVE
k1 AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY text),
d AS (SELECT doc_id, text FROM documents
      WHERE doc_id IN (SELECT doc_id FROM k1)),
{_SHINGLE_BASE.replace("FROM documents", "FROM d")},
jp AS (SELECT doc_a, doc_b
       FROM inter JOIN n na ON na.doc_id = doc_a JOIN n nb ON nb.doc_id = doc_b
       WHERE round(CAST(overlap AS DOUBLE) / CAST(na.c + nb.c - overlap AS DOUBLE), 6) >= 0.8),
e AS (SELECT doc_a AS a, doc_b AS b FROM jp UNION SELECT doc_b, doc_a FROM jp),
nodes AS (SELECT DISTINCT a AS doc FROM e),
reach AS (SELECT doc, doc AS r FROM nodes
          UNION
          SELECT reach.doc, e.b FROM reach JOIN e ON reach.r = e.a),
lab AS (SELECT doc, min(r) AS cluster FROM reach GROUP BY doc),
kept AS (SELECT doc_id, text FROM d
         WHERE doc_id NOT IN (SELECT doc FROM lab WHERE cluster <> doc)),
t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM kept),
c AS (SELECT doc_id, len(ws) AS n,
      len(list_filter(ws, w -> w IN {_STOP_LIST})) AS stop_cnt FROM t)
SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
 round(least(n, 50) / 50 * 0.5 + (1 - stop_cnt / n) * 0.5, 6) AS quality_score
FROM c
WHERE round(least(n, 50) / 50 * 0.5 + (1 - stop_cnt / n) * 0.5, 6) >= 0.5
""",
        "curation_funnel": """
WITH nobench AS (SELECT * FROM documents WHERE source <> 'src0'),
dedup AS (SELECT * FROM nobench WHERE doc_id IN
          (SELECT min(doc_id) FROM nobench GROUP BY text)),
tok AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        FROM documents),
idx AS (SELECT doc_id, source, ws,
               unnest(generate_series(1, len(ws) - 2)) AS i FROM tok),
sh AS (SELECT DISTINCT doc_id, source,
              ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM idx),
bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
dsh AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
dirty AS (
  SELECT dsh.doc_id FROM dsh LEFT JOIN bench b ON dsh.s = b.s
  GROUP BY dsh.doc_id
  HAVING round(CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) / count(*), 6) > 0.2),
clean AS (SELECT * FROM dedup
          WHERE doc_id NOT IN (SELECT doc_id FROM dirty)),
gw AS (SELECT doc_id, string_split(text, ' ') AS w FROM clean),
gpass AS (SELECT doc_id FROM gw WHERE
  len(w) >= 10 AND len(w) <= 1000
  AND CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
        / len(w) >= 2.0
  AND CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
        / len(w) <= 12.0
  AND CAST(list_max(list_transform(list_distinct(w),
        d2 -> len(list_filter(w, x -> x = d2)))) AS BIGINT)
        / len(w) <= 0.20
  AND len(list_distinct(w)) / len(w) >= 0.30
  AND len(list_filter(w, x -> list_contains(
    ['the','a','of','to','and','in','is','for','on','at'], x))) > 0)
SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS stage_name,
       count(*) AS n_docs FROM documents
UNION ALL SELECT 1, 'drop_benchmark', count(*) FROM nobench
UNION ALL SELECT 2, 'exact_dedup', count(*) FROM dedup
UNION ALL SELECT 3, 'decontaminated', count(*) FROM clean
UNION ALL SELECT 4, 'gopher_pass', count(*) FROM gpass
""",
        "gopher_quality": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
SELECT doc_id,
 CAST(len(w) AS BIGINT) AS n_words,
 CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
   / len(w) AS mean_word_len,
 CAST(list_max(list_transform(list_distinct(w),
        d2 -> len(list_filter(w, x -> x = d2)))) AS BIGINT)
   / len(w) AS top_word_frac,
 len(list_distinct(w)) / len(w) AS distinct_frac,
 CAST(len(list_filter(w, x -> list_contains(
   ['the','a','of','to','and','in','is','for','on','at'], x))) AS BIGINT)
   AS n_stopwords,
 (len(w) >= 10 AND len(w) <= 1000
  AND CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
        / len(w) >= 2.0
  AND CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
        / len(w) <= 12.0
  AND CAST(list_max(list_transform(list_distinct(w),
        d2 -> len(list_filter(w, x -> x = d2)))) AS BIGINT)
        / len(w) <= 0.20
  AND len(list_distinct(w)) / len(w) >= 0.30
  AND len(list_filter(w, x -> list_contains(
   ['the','a','of','to','and','in','is','for','on','at'], x))) > 0)
   AS passes_gopher
FROM d
""",
        "repetition_stats": """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
b AS (SELECT doc_id,
             list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1]) AS bg
      FROM d WHERE len(w) >= 2)
SELECT doc_id,
 CAST(len(bg) AS BIGINT) AS n_bigrams,
 CAST(list_max(list_transform(list_distinct(bg),
        d2 -> len(list_filter(bg, x -> x = d2)))) AS BIGINT)
   AS top_bigram_count,
 CAST(list_max(list_transform(list_distinct(bg),
        d2 -> len(list_filter(bg, x -> x = d2)))) AS BIGINT)
   / len(bg) AS top_bigram_frac,
 (len(bg) - len(list_distinct(bg))) / len(bg) AS dup_bigram_frac
FROM b
""",
        "pii_redact": """
SELECT doc_id,
 regexp_replace(regexp_replace(regexp_replace(text,
   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
   '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g'),
   '\\+?[0-9][0-9 -]{7,}[0-9]', '<PHONE>', 'g') AS clean_text,
 CAST(len(regexp_extract_all(text,
   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
 CAST(len(regexp_extract_all(regexp_replace(text,
   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
   '([0-9]{1,3}\\.){3}[0-9]{1,3}')) AS BIGINT) AS n_ips,
 CAST(len(regexp_extract_all(regexp_replace(regexp_replace(text,
   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
   '([0-9]{1,3}\\.){3}[0-9]{1,3}', '<IP>', 'g'),
   '\\+?[0-9][0-9 -]{7,}[0-9]')) AS BIGINT) AS n_phones
FROM documents
""",
        "sequence_pack": """
WITH t AS (
  SELECT doc_id, source,
         CAST(doc_id % 4 AS BIGINT) AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT *, SUM(n_tokens) OVER (
    PARTITION BY source, shard ORDER BY doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM t
)
SELECT doc_id, source, shard, n_tokens,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
       CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_pos,
       ((cum - n_tokens) // 2048) != ((cum - 1) // 2048) AS spans_boundary
FROM c
""",
        "corpus_build": f"""
WITH nb AS (SELECT * FROM documents WHERE source <> 'src0'),
ke AS (SELECT min(doc_id) AS doc_id FROM nb GROUP BY text),
d1 AS (SELECT * FROM nb WHERE doc_id IN (SELECT doc_id FROM ke)),
tok AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
idx AS (SELECT doc_id, source, ws,
               unnest(generate_series(1, len(ws) - 2)) AS i FROM tok),
sh AS (SELECT DISTINCT doc_id, source,
              ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM idx),
bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
dsh AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
cont AS (SELECT dsh.doc_id,
         round(CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) / count(*), 6) AS ratio
         FROM dsh LEFT JOIN bench b ON dsh.s = b.s GROUP BY dsh.doc_id),
d2 AS (SELECT * FROM d1 WHERE doc_id NOT IN
       (SELECT doc_id FROM cont WHERE ratio > 0.2)),
mx AS (SELECT doc_id,
       CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS rate_q,
       CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
            AS BIGINT) AS h_mix,
       CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
            AS BIGINT) AS h_split
       FROM d2),
d3 AS (SELECT d2.* FROM d2 JOIN mx USING (doc_id)
       WHERE h_mix < rate_q * 288230376151711744
         AND h_split < 1037629354146162278),
qt AS (SELECT doc_id, string_split(text, ' ') AS ws FROM d3),
qc AS (SELECT doc_id, len(ws) AS n,
       len(list_filter(ws, w -> w IN {_STOP_LIST})) AS stop_cnt FROM qt),
d4 AS (SELECT d3.* FROM d3 JOIN qc USING (doc_id)
       WHERE round(least(n, 50) / 50 * 0.5 + (1 - stop_cnt / n) * 0.5, 6)
             >= 0.5),
p0 AS (SELECT doc_id, source, CAST(doc_id % 4 AS BIGINT) AS shard,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM d4),
pc AS (SELECT *, SUM(n_tokens) OVER (
       PARTITION BY source, shard ORDER BY doc_id
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM p0)
SELECT doc_id, source, shard, n_tokens,
       CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_id,
       CAST((cum - n_tokens) % 2048 AS BIGINT) AS pack_pos,
       ((cum - n_tokens) // 2048) != ((cum - 1) // 2048) AS spans_boundary
FROM pc
""",
        "corpus_sample_k": """
SELECT doc_id, source, lang, n_chars,
       CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 15)
            AS BIGINT) AS sample_h
FROM documents
ORDER BY sample_h, doc_id
LIMIT 100
""",
        "corpus_datasheet": """
WITH t AS (SELECT source, lang, text, n_chars,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           FROM documents)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       min(n_toks) AS min_tokens, max(n_toks) AS max_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT lang) AS n_langs,
       count(*) - count(DISTINCT text) AS n_exact_dupes
FROM t GROUP BY source
""",
        "corpus_mix": """
WITH t AS (
  SELECT doc_id, source, lang, n_chars,
         CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS rate_q,
         CAST('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h_mix,
         CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 15)
              AS BIGINT) AS h_split
  FROM documents
)
SELECT doc_id, source, lang, n_chars,
       CASE WHEN h_split < 1037629354146162278 THEN 'train'
            WHEN h_split < 1095275429376504627 THEN 'val'
            ELSE 'test' END AS split
FROM t WHERE h_mix < rate_q * 288230376151711744
""",
        "contamination_check": """
WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS ws
             FROM documents),
idx AS (SELECT doc_id, source, ws,
               unnest(generate_series(1, len(ws) - 2)) AS i FROM tok),
sh AS (SELECT DISTINCT doc_id, source,
              ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS s FROM idx),
bench AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
d AS (SELECT doc_id, s FROM sh WHERE source <> 'src0')
SELECT d.doc_id, count(*) AS n_shingles,
       CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       round(CAST(sum(CASE WHEN b.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             / count(*), 6) AS contamination_ratio
FROM d LEFT JOIN bench b ON d.s = b.s
GROUP BY d.doc_id
""",
        "bm25_topk": """
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS ws,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
  FROM documents
), st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
         CAST(sum(CASE WHEN list_contains(ws, 'join') THEN 1 ELSE 0 END)
              AS DOUBLE) AS df_0,
         CAST(sum(CASE WHEN list_contains(ws, 'hash') THEN 1 ELSE 0 END)
              AS DOUBLE) AS df_1,
         CAST(sum(CASE WHEN list_contains(ws, 'scan') THEN 1 ELSE 0 END)
              AS DOUBLE) AS df_2
  FROM d
), s AS (
  SELECT doc_id, dl,
         CAST(len(list_filter(ws, w -> w = 'join')) AS DOUBLE) AS tf_0,
         CAST(len(list_filter(ws, w -> w = 'hash')) AS DOUBLE) AS tf_1,
         CAST(len(list_filter(ws, w -> w = 'scan')) AS DOUBLE) AS tf_2
  FROM d
)
SELECT doc_id, round(
    ln(1.0 + (n_docs - df_0 + 0.5) / (df_0 + 0.5))
      * (tf_0 * 2.2) / (tf_0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln(1.0 + (n_docs - df_1 + 0.5) / (df_1 + 0.5))
      * (tf_1 * 2.2) / (tf_1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
  + ln(1.0 + (n_docs - df_2 + 0.5) / (df_2 + 0.5))
      * (tf_2 * 2.2) / (tf_2 + 1.2 * (0.25 + 0.75 * dl / avgdl)),
  6) AS bm25
FROM s, st
ORDER BY bm25 DESC, doc_id
LIMIT 10
""",
    }
    return out
