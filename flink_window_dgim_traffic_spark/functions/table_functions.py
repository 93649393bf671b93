"""Python UDTFs (user-defined TABLE functions, Spark ≥ 3.5) — the
one-row-in / many-rows-out extension point of the function surface
(scalar: functions/vectors.py expressions; aggregate: the DGIM UDAF
shapes; table: here).

``TopWordsPerDoc`` yields a document's top-k words by count with a
deterministic (count desc, word asc) tie-break — the per-row
explode-and-rank pattern (keyword extraction, tag emission) as a
LATERAL-joinable table function.

Scale note: a UDTF runs row-at-a-time in Python workers and is the
SLOW path by design — kept for API parity and for logic that is
genuinely per-row imperative.  The set-oriented twin (explode →
groupBy → row_number) in the oracle is the shape to prefer when the
logic fits relational operators; the test suite asserts both produce
identical rows so users can switch freely.
"""

from __future__ import annotations

import uuid
from collections import Counter

from pyspark.sql.functions import udtf


@udtf(returnType="word: string, n: bigint, rnk: bigint")
class TopWordsPerDoc:
    """yield (word, count, rank) for the top-k words of one text."""

    def eval(self, text: str, k: int):
        if text is None:
            return
        counts = Counter(text.split(" "))
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (w, n) in enumerate(ranked[: int(k)]):
            yield w, n, i + 1


def top_words_per_doc(documents, k: int = 5):
    """LATERAL-join the UDTF against the documents table (the SQL
    ``FROM t, LATERAL f(t.col)`` form — the canonical correlated
    table-function call): one output row per (doc, top-word).  The
    view name is per-call unique and dropped after plan analysis so
    concurrent callers can't race on a shared catalog entry."""
    spark = documents.sparkSession
    spark.udtf.register("top_words_per_doc_udtf", TopWordsPerDoc)
    view = f"_udtf_docs_{uuid.uuid4().hex}"
    documents.createOrReplaceTempView(view)
    try:
        return spark.sql(
            f"""
            SELECT doc_id, word, n, rnk
            FROM {view}, LATERAL top_words_per_doc_udtf(text, {int(k)})
            """
        )
    finally:
        spark.catalog.dropTempView(view)
