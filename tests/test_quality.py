"""Quality-operator semantics on constructed documents (the corpus
hash validation is the DuckDB oracle; these pin behaviors the
synthetic corpus can't exercise: rule edges, PII hits, chunk-dedup
first-occurrence semantics)."""

import duckdb
import pytest

from flink_window_dgim_traffic_spark.operators import dedup as D
from flink_window_dgim_traffic_spark.operators import quality as QL


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


GOOD = "the quick brown fox jumps over a lazy dog near the old river bank today"


def test_gopher_rules(spark):
    rows = [
        GOOD,                                   # passes everything
        "spam spam spam spam spam spam spam spam spam eggs the",  # top-word frac
        "short the text",                       # too few words
        "the a b c d e f g h i j",              # mean word length < 2 fails
    ]
    out = {r["doc_id"]: r for r in QL.gopher_quality(_docs(spark, rows)).collect()}
    assert out[0]["passes_gopher"]
    assert not out[1]["passes_gopher"] and out[1]["top_word_frac"] > 0.5
    assert not out[2]["passes_gopher"] and out[2]["n_words"] == 3
    assert not out[3]["passes_gopher"] and out[3]["mean_word_len"] < 2.0
    assert out[0]["n_stopwords"] == 3  # the, a, the


def test_repetition_stats(spark):
    rows = [
        "a b a b a b a b",   # bigrams: 'a b'x4, 'b a'x3 -> top 4/7
        "x y z w",           # all distinct bigrams
        "solo",              # filtered out (n < 2)
    ]
    out = {r["doc_id"]: r for r in QL.repetition_stats(_docs(spark, rows)).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_bigrams"] == 7 and out[0]["top_bigram_count"] == 4
    assert out[1]["dup_bigram_frac"] == 0.0
    assert abs(out[0]["dup_bigram_frac"] - 5 / 7) < 1e-12  # 7 total, 2 distinct


def test_unigram_commonness_exact(spark):
    rows = ["a a b", "c"]  # counts: a=2,b=1,c=1, total=4
    out = {r["doc_id"]: r for r in QL.unigram_commonness(_docs(spark, rows)).collect()}
    # ppm: a=500000, b=250000, c=250000
    assert out[0]["sum_ppm"] == 2 * 500000 + 250000
    assert out[0]["mean_ppm"] == out[0]["sum_ppm"] // 3
    assert out[1]["sum_ppm"] == 250000 and out[1]["n_tokens"] == 1


PII_ROWS = [
    "contact bob.smith+x@example.co.uk or 10.0.255.1 now",
    "call +1 555 123-4567 or 555 987 6543 today",
    "no pii here at all",
]


def test_pii_redact_constructed(spark):
    out = {r["doc_id"]: r for r in QL.pii_redact(_docs(spark, PII_ROWS)).collect()}
    assert out[0]["n_emails"] == 1 and out[0]["n_ips"] == 1
    assert "<EMAIL>" in out[0]["clean_text"] and "<IP>" in out[0]["clean_text"]
    assert "example" not in out[0]["clean_text"]
    assert out[1]["n_phones"] >= 1 and "<PHONE>" in out[1]["clean_text"]
    assert out[2]["clean_text"] == PII_ROWS[2]
    assert out[2]["n_emails"] == out[2]["n_ips"] == out[2]["n_phones"] == 0


def test_pii_redact_matches_duckdb_dialect(spark):
    """The Java-regex and RE2 engines must agree on these patterns
    (the corpus has no PII, so the driver's hash check can't see a
    dialect divergence — this pins it on strings that do)."""
    import __spark_entry__ as entry

    spark_rows = sorted(
        (r["doc_id"], r["clean_text"], r["n_emails"], r["n_ips"], r["n_phones"])
        for r in QL.pii_redact(_docs(spark, PII_ROWS)).collect()
    )
    con = duckdb.connect()
    con.register(
        "documents",
        _docs(spark, PII_ROWS).toPandas(),
    )
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(entry.oracle_sql()["pii_redact"]).fetchall()
    )
    assert spark_rows == duck_rows


def test_chunk_dedup_first_occurrence(spark):
    k = 8
    c1 = "w1 w2 w3 w4 w5 w6 w7 w8"
    c2 = "x1 x2 x3 x4 x5 x6 x7 x8"
    c3 = "y1 y2 y3 y4 y5 y6 y7 y8"
    rows = [
        f"{c1} {c2}",       # doc 0: keeps both
        f"{c2} {c3}",       # doc 1: c2 already seen -> keeps c3 only
        c1,                 # doc 2: fully duplicate -> empty
        "tail only short",  # doc 3: short chunk, unique
    ]
    out = {r["doc_id"]: r for r in D.chunk_dedup(_docs(spark, rows), k=k).collect()}
    assert out[0]["kept_chunks"] == 2 and out[0]["dedup_text"] == f"{c1} {c2}"
    assert out[1]["kept_chunks"] == 1 and out[1]["dedup_text"] == c3
    assert out[2]["kept_chunks"] == 0 and out[2]["dedup_text"] == ""
    assert out[3]["kept_chunks"] == 1 and out[3]["total_chunks"] == 1


def test_chunk_dedup_within_doc_duplicates(spark):
    c = "r1 r2 r3 r4 r5 r6 r7 r8"
    out = D.chunk_dedup(_docs(spark, [f"{c} {c} {c}"]), k=8).collect()[0]
    assert out["total_chunks"] == 3
    assert out["kept_chunks"] == 1 and out["dedup_text"] == c


def test_chunk_dedup_properties_hypothesis(spark):
    """Property: for any corpus, (a) every chunk text survives exactly
    once globally, (b) each doc's dedup_text is the in-order
    concatenation of its surviving chunks, (c) kept counts sum to the
    number of distinct chunk texts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    k = 4
    word = st.sampled_from(["aa", "bb", "cc", "dd"])
    doc = st.lists(word, min_size=1, max_size=12).map(" ".join)

    @settings(max_examples=12, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=6))
    def run(texts):
        out = {
            r["doc_id"]: r
            for r in D.chunk_dedup(_docs(spark, texts), k=k).collect()
        }
        # reference computation
        seen = set()
        expected = {}
        all_chunks = set()
        for i, t in enumerate(texts):
            ws = t.split(" ")
            chunks = [
                " ".join(ws[j * k : (j + 1) * k])
                for j in range((len(ws) + k - 1) // k)
            ]
            all_chunks.update(chunks)
            # seen advances PER CHUNK: a chunk repeated within one doc
            # survives only at its first position, same as cross-doc
            # (the operator's global min-(doc_id,pos) rule)
            kept = []
            for c in chunks:
                if c not in seen:
                    kept.append(c)
                    seen.add(c)
            expected[i] = (len(chunks), len(kept), " ".join(kept))
        for i, (total, kept_n, text) in expected.items():
            r = out[i]
            assert r["total_chunks"] == total
            assert r["kept_chunks"] == kept_n
            assert r["dedup_text"] == text
        assert sum(r["kept_chunks"] for r in out.values()) == len(all_chunks)

    run()


def test_compression_ratio_signal_and_exact_values(spark):
    import zlib

    from flink_window_dgim_traffic_spark.operators.quality import (
        compression_ratio,
    )

    rep = "spam ham " * 200                      # highly compressible
    import random

    rng = random.Random(7)
    junk = "".join(
        chr(rng.randint(0x21, 0x7E)) for _ in range(1600)
    )                                            # high entropy
    docs = spark.createDataFrame(
        [
            (1, rep, "en", "s", len(rep)),
            (2, junk, "en", "s", len(junk)),
            (3, None, "en", "s", 0),
            (4, "", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_bytes"], r["comp_permille"])
        for r in compression_ratio(docs).collect()
    }
    # exact permille pinned against the same zlib build
    exp = lambda t: len(zlib.compress(t.encode(), 6)) * 1000 // len(  # noqa: E731
        t.encode()
    )
    assert got[1] == (len(rep), exp(rep))
    assert got[2] == (len(junk), exp(junk))
    assert got[3] == (0, 0) and got[4] == (0, 0)
    # the signal: boilerplate compresses far better than junk
    assert got[1][1] < 100 < 500 < got[2][1]


def test_compression_ratio_bound_envelope(spark):
    """r10 bound anchor: verdict TRUE on real text (zlib stays inside
    its own compressBound), bound_bytes equals the documented closed
    form, and the empty/NULL contract rows are vacuous-true."""
    from flink_window_dgim_traffic_spark.operators.quality import (
        compression_ratio_bound,
    )

    docs = spark.createDataFrame(
        [
            (1, "hello world " * 100),
            (2, "x"),
            (3, ""),
            (4, None),
            (5, "".join(chr(65 + (i * 7) % 26) for i in range(5000))),
        ],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in compression_ratio_bound(docs).collect()}
    assert all(r["within_bound"] for r in rows.values())
    for d, r in rows.items():
        n = r["n_bytes"]
        assert r["bound_bytes"] == n + (n >> 12) + (n >> 14) + (n >> 25) + 13
    assert rows[3]["n_bytes"] == 0 and rows[4]["n_bytes"] == 0
