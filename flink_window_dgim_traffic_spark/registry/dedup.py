"""dedup registry: exact and near-duplicate detection (MinHash/SimHash/spans).

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403



def _neardup_incremental(s: SparkSession, d: str) -> DataFrame:
    """Persisted-MinHash-index deployment shape: index the even-doc_id
    half of the corpus on disk, probe the odd half (both halves from
    the same crawl here, so true near-dups exist across them).  r10:
    md5 hash family — index signatures, band keys and the signature-
    estimated Jaccard are all DuckDB-reproducible, so the whole
    index-build → probe → estimate pipeline is hash-checked."""

    docs = _documents(s, d)
    idx = _mkdtemp(prefix="spark_graft_ndidx_")
    D.build_neardup_index(
        docs.filter(F.col("doc_id") % 2 == 0), idx, hash_family="md5"
    )
    return D.neardup_incremental_lsh(
        docs.filter(F.col("doc_id") % 2 == 1),
        idx,
        threshold=0.5,
        hash_family="md5",
    )


def queries():
    return {
        # ---- round-10 additions / changes (window policy (b):
        # new or implementation-changed this round come first) ----
        # md5 hash family (shared by Spark AND DuckDB) makes the full
        # LSH band structure engine-independent — these two flip from
        # rows-only to oracle-hash-checked (VERDICT r9 ask #1); the
        # xxhash64/blake2b throughput defaults stay pinned in pytest
        "minhash_lsh_pairs": lambda s, d: D.minhash_lsh_pairs(
            _documents(s, d), threshold=0.8, hash_family="md5"
        ),
        "simhash_pairs": lambda s, d: D.simhash_pairs(
            _documents(s, d), hash_family="md5"
        ),
        # md5-family persisted MinHash index: build -> probe ->
        # signature-estimated Jaccard, all hash-checked (r10)
        "neardup_incremental_lsh": lambda s, d: _neardup_incremental(s, d),
        # ---- round-5 additions ----
        "span_dedup": lambda s, d: D.span_dedup(_documents(s, d)),
        "neardup_keep_best": lambda s, d: D.neardup_keep_best(
            _documents(s, d),
            D.ngram_jaccard_pairs(_documents(s, d), threshold=0.8),
        ),
        # ---- round-3 additions ----
        "duplicated_spans": lambda s, d: D.duplicated_spans(
            _documents(s, d)
        ),
        "cdc_chunk_dedup": lambda s, d: D.cdc_chunk_dedup(
            _documents(s, d)
        ),
        "dedup_incremental": lambda s, d: D.dedup_incremental(
            _documents(s, d).filter(F.col("doc_id") % 2 == 1),
            _documents(s, d).filter(F.col("doc_id") % 2 == 0),
        ),
        "chunk_dedup": lambda s, d: D.chunk_dedup(_documents(s, d)),
        # --- dedup + text (north star, oracle-eligible) ---
        "neardup_clusters": lambda s, d: D.neardup_clusters(
            D.ngram_jaccard_pairs(_documents(s, d), threshold=0.8)
        ),
        "dedup_exact": lambda s, d: D.dedup_exact(_documents(s, d)),
    }


def oracles():
    out = {
        # Quality-aware near-dup resolution: component closure
        # (recursive CTE) + the oracle-exact quality heuristic; keep
        # the best-quality doc per cluster (ties -> min doc_id).
        "neardup_keep_best": f"""
WITH RECURSIVE {{shingle_base}},
jp AS (SELECT doc_a, doc_b
       FROM inter JOIN n na ON na.doc_id = doc_a
                  JOIN n nb ON nb.doc_id = doc_b
       WHERE round(CAST(overlap AS DOUBLE)
                   / CAST(na.c + nb.c - overlap AS DOUBLE), 6) >= 0.8),
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
qc AS (SELECT doc_id, len(ws) AS nt,
              len(list_filter(ws, w -> w IN ('the','a','of','to','and',
                'in','is','for','on','at'))) AS stop_cnt
       FROM tok),
q AS (SELECT doc_id,
             round(least(nt, 50) / 50 * 0.5
                   + (1 - stop_cnt / nt) * 0.5, 6) AS quality_score
      FROM qc),
r AS (SELECT l.doc_id, cluster_id, quality_score,
             row_number() OVER (PARTITION BY cluster_id
               ORDER BY quality_score DESC, l.doc_id) AS rn
      FROM l JOIN q USING (doc_id))
SELECT doc_id, CAST(cluster_id AS BIGINT) AS cluster_id, quality_score,
       CAST(rn = 1 AS BIGINT) AS is_kept
FROM r
""".replace("{shingle_base}", _SHINGLE_BASE),
        # ---- round-5 additions ----
        # Cross-document span excision: every 5-token span occurring
        # in >=2 distinct docs is removed from every doc except its
        # min-doc_id owner; surviving tokens reassembled in order.
        "span_dedup": """
WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
t AS (SELECT doc_id, i-1 AS pos, ws[i] AS token
      FROM tok, unnest(generate_series(1, len(ws))) AS u(i)),
sp AS (SELECT doc_id, i-1 AS pos, array_to_string(ws[i:i+4], ' ') AS span
       FROM tok, unnest(generate_series(1, len(ws)-4)) AS u(i)),
own AS (SELECT span, min(doc_id) AS owner,
               count(DISTINCT doc_id) AS n_docs
        FROM sp GROUP BY 1),
cov AS (SELECT DISTINCT sp.doc_id, sp.pos + j AS pos
        FROM sp JOIN own USING (span),
             unnest(generate_series(0, 4)) AS g(j)
        WHERE own.n_docs >= 2 AND sp.doc_id <> own.owner),
kept AS (SELECT t.doc_id, t.pos, t.token
         FROM t ANTI JOIN cov
           ON t.doc_id = cov.doc_id AND t.pos = cov.pos),
reb AS (SELECT doc_id, count(*) AS kept_tokens,
               string_agg(token, ' ' ORDER BY pos) AS dedup_text
        FROM kept GROUP BY 1),
tot AS (SELECT doc_id, coalesce(len(ws), 0) AS n_tokens FROM tok)
SELECT tot.doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_tokens - coalesce(kept_tokens, 0) AS BIGINT)
         AS n_removed_tokens,
       coalesce(dedup_text, '') AS dedup_text
FROM tot LEFT JOIN reb USING (doc_id)
""",
        # ---- round-3 additions ----
        # Sliding 5-token spans; a span is duplicated when it occurs
        # in >=2 distinct docs; per-doc coverage in exact permille.
        "duplicated_spans": """
WITH tok AS (SELECT doc_id, string_split(text,' ') AS ws FROM documents),
sp AS (SELECT doc_id, array_to_string(ws[i:i+4], ' ') AS span
       FROM tok, unnest(generate_series(1, len(ws)-4)) AS t(i)),
sd AS (SELECT span, doc_id, count(*) AS c FROM sp GROUP BY 1, 2),
sg AS (SELECT span, count(*) AS n_docs FROM sd GROUP BY 1),
d AS (SELECT doc_id, sum(c) AS n_dup FROM sd JOIN sg USING (span)
      WHERE n_docs >= 2 GROUP BY 1),
tot AS (SELECT doc_id, greatest(len(ws) - 4, 0) AS n_spans FROM tok)
SELECT doc_id, CAST(n_spans AS BIGINT) AS n_spans,
       CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_spans,
       CAST(CASE WHEN n_spans > 0 THEN coalesce(n_dup, 0) * 1000 // n_spans
            ELSE 0 END AS BIGINT) AS dup_permille
FROM tot LEFT JOIN d USING (doc_id)
""",
        # Content-defined chunking: boundaries where the w=4-token
        # polynomial hash (base 131, 7 md5 hex chars per token — all
        # under 2^51, no modular reduction) divides 8; forced at doc
        # end.  Dup = chunk present in >=2 distinct docs.
        "cdc_chunk_dedup": """
WITH base AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
th AS (SELECT doc_id, ws, len(ws) AS n,
       list_transform(ws, tk -> CAST('0x' || substr(md5(tk), 1, 7)
                                     AS BIGINT)) AS h
       FROM base),
bp AS (SELECT doc_id, ws, n,
       list_sort(list_distinct(list_append(
         list_filter(generate_series(4, n), i ->
           (h[i] * 1 + h[i-1] * 131 + h[i-2] * 17161
            + h[i-3] * 2248091) % 8 = 0),
         n))) AS bpos
       FROM th),
ch AS (SELECT doc_id,
       list_transform(generate_series(1, len(bpos)), k ->
         array_to_string(
           ws[(CASE WHEN k = 1 THEN 1 ELSE bpos[k-1] + 1 END):bpos[k]],
           ' ')) AS chunks
       FROM bp),
ex AS (SELECT doc_id, unnest(chunks) AS chunk FROM ch),
cd AS (SELECT chunk, doc_id, count(*) AS c FROM ex GROUP BY 1, 2),
dup AS (SELECT chunk FROM cd GROUP BY chunk HAVING count(*) >= 2),
dd AS (SELECT doc_id, sum(c) AS n_dup FROM cd
       WHERE chunk IN (SELECT chunk FROM dup) GROUP BY 1),
-- coalesce pins the NULL-text contract to the Spark side's (the
-- chunker UDF emits [] for NULL text -> n_chunks 0, dup counts 0);
-- without it string_split(NULL) propagates NULL here (advisor r3)
tot AS (SELECT doc_id, coalesce(len(chunks), 0) AS n_chunks FROM ch)
SELECT doc_id, CAST(n_chunks AS BIGINT) AS n_chunks,
       CAST(coalesce(n_dup, 0) AS BIGINT) AS n_dup_chunks,
       CAST(CASE WHEN n_chunks > 0
            THEN coalesce(n_dup, 0) * 1000 // n_chunks
            ELSE 0 END AS BIGINT) AS dup_permille
FROM tot LEFT JOIN dd USING (doc_id)
""",
        "dedup_incremental": """
WITH newd AS (SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 2 = 1),
idx AS (SELECT DISTINCT md5(text) AS fp FROM documents WHERE doc_id % 2 = 0)
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_batch_copies
FROM newd
WHERE fp NOT IN (SELECT fp FROM idx)
GROUP BY fp
""",
        "dedup_exact": """
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies
FROM documents GROUP BY text
""",
        # r10: md5 hash family (shared by Spark and DuckDB) makes the
        # full LSH band structure engine-independent — these two flip
        # from rows-only to hash-checked (VERDICT r9 ask #1)
        "minhash_lsh_pairs": _minhash_lsh_sql(),
        "simhash_pairs": _simhash_pairs_sql(),
        # r10: md5-family persisted index — build->probe->estimate
        # all engine-reproducible (see _neardup_incremental_sql)
        "neardup_incremental_lsh": _neardup_incremental_sql(),
        # connected components of the jaccard>=0.8 pair graph via
        # recursive transitive closure (components are small dup
        # groups, so the closure stays tiny)
        "neardup_clusters": f"""
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
)
SELECT doc AS doc_id, CAST(min(r) AS BIGINT) AS cluster_id
FROM reach GROUP BY doc
""",
        "chunk_dedup": """
WITH docs AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
chunks AS (
 SELECT doc_id, CAST(x.i AS INT) AS pos,
        array_to_string(list_slice(w, CAST(x.i AS INT) * 8 + 1,
                                   CAST(x.i AS INT) * 8 + 8), ' ') AS chunk
 FROM docs, unnest(range(0, CAST(ceil(len(w) / 8.0) AS BIGINT))) AS x(i)),
ranked AS (
 SELECT doc_id, pos, chunk,
        row_number() OVER (PARTITION BY chunk ORDER BY doc_id, pos) AS rn
 FROM chunks),
rebuilt AS (
 SELECT doc_id, count(*) AS kept_chunks,
        string_agg(chunk, ' ' ORDER BY pos) AS dedup_text
 FROM ranked WHERE rn = 1 GROUP BY doc_id),
tot AS (SELECT doc_id,
               CAST(ceil(len(string_split(text, ' ')) / 8.0) AS BIGINT)
                 AS total_chunks
        FROM documents)
SELECT t.doc_id, t.total_chunks,
       CAST(COALESCE(r.kept_chunks, 0) AS BIGINT) AS kept_chunks,
       COALESCE(r.dedup_text, '') AS dedup_text
FROM tot t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
""",
    }
    return out
