"""Text-analysis + multimodal operators: language-ID heuristic on
constructed samples, fingerprint determinism, blob plumbing, decode
stub contract."""

import pytest

from flink_window_dgim_traffic_spark.operators import multimodal as M
from flink_window_dgim_traffic_spark.operators import text as T
from flink_window_dgim_traffic_spark.session import table


@pytest.fixture(scope="module")
def documents(spark, sf_dir):
    return table(spark, sf_dir, "documents")


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat is in the house and it is warm"),
            (2, "el perro de la casa que ladra los dias"),
            (3, "der hund und die katze das ist gut"),
            (4, "le chat et la souris est dans les champs"),
            (5, "这是中文文本"),
            (6, ""),
            (7, "zzz qqq xxx"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in T.lang_id(df).collect()}
    assert got == {1: "en", 2: "es", 3: "de", 4: "fr", 5: "zh", 6: "und", 7: "und"}


def test_quality_score_range(documents):
    for r in T.quality_score(documents).collect():
        assert 0.0 <= r["quality_score"] <= 1.0
        assert r["n_stopwords"] <= r["n_tokens"]


def test_fingerprint_sensitivity(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "hello worle")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r["fingerprint"] for r in T.doc_fingerprint(df).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
    assert 0 <= got[1] < 2147483647


def test_media_blob_schema_and_features(documents):
    blobs = M.with_media_blob(documents.limit(20))
    schema = dict((f.name, f.dataType.simpleString()) for f in blobs.schema.fields)
    assert schema["payload"] == "binary"
    assert schema["meta"].startswith("struct<")
    feats = M.multimodal_features(documents.limit(20)).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["byte_len"] > 0
        assert r["byte_sum"] > 0
        assert 0 < r["n_distinct_bytes"] <= min(r["byte_len"], 256)
        assert 1 <= r["width"] <= 64


def test_decode_stub_contract():
    # PNG is REAL since r10, JPEG since r11: garbage bytes are a
    # codec ValueError, not a missing-codec NotImplementedError
    with pytest.raises(ValueError):
        M.decode_media(b"\x00\x01", "image/png")
    with pytest.raises(ValueError):
        M.decode_media(b"\xff\xd8\xff", "image/jpeg")
    # the remaining documented codec boundary: unsupported mimes
    with pytest.raises(NotImplementedError):
        M.decode_media(b"\x00\x01", "image/webp")


def test_resize_media_shape(spark):
    from flink_window_dgim_traffic_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, "x" * 500), (2, "short")], ["doc_id", "text"]
    )
    out = M.resize_media(M.with_media_blob(df), 8, 8).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {1, 2}
    for r in out:
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["payload"]) == 64  # 8x8 raster, always full size
    # deterministic
    out2 = M.resize_media(M.with_media_blob(df), 8, 8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_frame_sample_every_nth(spark):
    from flink_window_dgim_traffic_spark.operators import multimodal as M

    # 300 bytes -> 4 full 64-byte frames -> keep frames 0 (every 4th)
    df = spark.createDataFrame([(1, "a" * 300)], ["doc_id", "text"])
    rows = M.frame_sample(M.with_media_blob(df)).collect()
    assert [r["frame_no"] for r in rows] == [0]
    assert all(len(r["frame"]) == 64 for r in rows)
    # 600 bytes -> 9 frames -> keep 0, 4, 8
    df = spark.createDataFrame([(1, "a" * 600)], ["doc_id", "text"])
    rows = M.frame_sample(M.with_media_blob(df)).collect()
    assert sorted(r["frame_no"] for r in rows) == [0, 4, 8]


def test_top_ngrams_hand_corpus(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "solo")],
        ["doc_id", "text"],
    )
    got = [
        (r["ngram"], r["n_occurrences"])
        for r in T.top_ngrams(docs, n=2, k=10).collect()
    ]
    # bag counts (not per-doc distinct), ties broken by ngram asc
    assert got == [("a b", 3), ("b a", 1), ("b c", 1), ("b x", 1)]


def test_doc_length_histogram_bins(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 5), (2, "y" * 150), (3, "z" * 199), (4, "w" * 200)],
        ["doc_id", "text"],
    )
    got = {
        (r["len_from"], r["len_to"]): r["n_docs"]
        for r in T.doc_length_histogram(docs).collect()
    }
    assert got == {(0, 100): 1, (100, 200): 2, (200, 300): 1}


def test_udtf_matches_relational_twin(spark, sf_dir):
    """The row-at-a-time UDTF and the set-oriented explode/groupBy/
    row_number twin must emit identical rows (users can switch to the
    relational shape at scale with no semantic change)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from flink_window_dgim_traffic_spark.functions.table_functions import (
        top_words_per_doc,
    )
    from flink_window_dgim_traffic_spark.session import table

    docs = table(spark, sf_dir, "documents")
    udtf_rows = sorted(map(tuple, top_words_per_doc(docs, 5).collect()))
    w = Window.partitionBy("doc_id").orderBy(F.desc("n"), "word")
    twin = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select("doc_id", "word", "n", "rnk")
    )
    assert udtf_rows == sorted(map(tuple, twin.collect()))


def test_word_entropy_hand_values(spark):
    """Uniform words -> ln(k) exactly (in micro-nats); single repeated
    word -> 0; mixed counts follow ln(n) - (sum c ln c)/n."""
    import math

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "en", "s", 7),      # uniform over 4 -> ln 4
            (2, "a a a a", "en", "s", 7),      # one word -> 0
            (3, "a a b", "en", "s", 5),        # ln 3 - (2 ln 2)/3
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from flink_window_dgim_traffic_spark.operators.text import word_entropy

    got = {r["doc_id"]: r for r in word_entropy(docs).collect()}
    assert got[1]["n_tokens"] == 4
    assert got[1]["entropy_micro_nats"] == round(math.log(4) * 1e6)
    assert got[2]["entropy_micro_nats"] == 0
    q = lambda x: round(x * 1e6)  # noqa: E731
    expect3 = q(math.log(3)) - (q(2 * math.log(2)) // 3)
    assert got[3]["entropy_micro_nats"] == expect3


def test_null_and_empty_text_rows(spark):
    """Dirty-crawl rows: NULL or empty text must not poison the new
    text ops — duplicated_spans reports zeros, word_entropy and
    importance_weights simply emit no row for token-less docs."""
    from flink_window_dgim_traffic_spark.operators import corpus as C
    from flink_window_dgim_traffic_spark.operators import dedup as D
    from flink_window_dgim_traffic_spark.operators.text import word_entropy

    docs = spark.createDataFrame(
        [
            (1, None, "en", "src1", 0),
            (2, "", "en", "src1", 0),
            (3, "real words here exist in this doc", "en", "src1", 7),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    spans = {r["doc_id"]: r for r in D.duplicated_spans(docs).collect()}
    assert (spans[1]["n_spans"], spans[1]["dup_permille"]) == (0, 0)
    assert (spans[2]["n_spans"], spans[2]["dup_permille"]) == (0, 0)
    assert spans[3]["n_spans"] == 3
    ent_ids = {r["doc_id"] for r in word_entropy(docs).collect()}
    assert 1 not in ent_ids and 3 in ent_ids
    iw_ids = {r["doc_id"] for r in C.importance_weights(docs).collect()}
    assert 1 not in iw_ids and 3 in iw_ids


def test_media_dedup_exact_copies(spark):
    from flink_window_dgim_traffic_spark.operators.multimodal import (
        media_dedup,
    )

    docs = spark.createDataFrame(
        [
            (1, "same bytes", "en", "s", 10),
            (5, "same bytes", "en", "s", 10),
            (3, "other bytes", "en", "s", 11),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    got = {
        r["keep_doc_id"]: r["n_copies"]
        for r in media_dedup(docs).collect()
    }
    assert got == {1: 2, 3: 1}  # min doc_id survives, copies counted


def test_chunk_text_windows_and_overlap(spark):
    """Hand case: 10 tokens, size 4, overlap 2 (stride 2) -> starts
    0,2,4,6,8; last chunk short; short docs yield one chunk; empty
    and NULL docs yield none.  Property: de-overlapped chunks
    reconstruct the document."""
    from flink_window_dgim_traffic_spark.operators.text import chunk_text

    text = "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9"
    docs = spark.createDataFrame(
        [(1, text), (2, "a b"), (3, ""), (4, None)],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_id"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_text(docs, size=4, overlap=2).collect()
    )
    d1 = [r for r in rows if r[0] == 1]
    # chunking stops once a window reaches the end (start 6 covers
    # t6..t9); no redundant trailing sub-window is emitted
    assert [r[3] for r in d1] == [
        "t0 t1 t2 t3", "t2 t3 t4 t5", "t4 t5 t6 t7", "t6 t7 t8 t9",
    ]
    assert [r[2] for r in d1] == [4, 4, 4, 4]
    assert [r for r in rows if r[0] == 2] == [(2, 0, 2, "a b")]
    # empty-string doc: one 1-token chunk (the empty token) — same
    # tokenization contract as every other text operator
    assert [r for r in rows if r[0] == 3] == [(3, 0, 1, "")]
    assert [r for r in rows if r[0] == 4] == []
    # reconstruction: first chunk + each later chunk minus overlap
    toks = []
    for i, (_, _, _, c) in enumerate(d1):
        ws = c.split(" ")
        toks.extend(ws if i == 0 else ws[2:])
    assert " ".join(toks) == text


def test_chunk_text_rejects_bad_overlap(spark):
    import pytest as _pytest

    from flink_window_dgim_traffic_spark.operators.text import chunk_text

    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="overlap"):
        chunk_text(docs, size=4, overlap=4)


def test_bigram_kn_continuation_counts(spark):
    """The KN fixture: 'francisco' is frequent but always follows
    'san' -> continuation count 1; a word following many distinct
    lefts gets a high continuation count."""
    from flink_window_dgim_traffic_spark.operators.text import (
        bigram_kn_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "san francisco san francisco san francisco"),
            (2, "the cat and the dog and the bird"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["word"]: (r["c_right"], r["n_left_types"])
        for r in bigram_kn_stats(docs).collect()
    }
    assert got["francisco"] == (3, 1)      # frequent, ONE left context
    # doc2 bigrams: (the,cat)(cat,and)(and,the)(the,dog)(dog,and)
    # (and,the)(the,bird) -> 'the' as right word: 2x, follows {and}
    assert got["the"] == (2, 1)
    assert got["and"] == (2, 2)            # follows {cat, dog}


def test_media_neardup_catches_near_identical_blobs(spark):
    from flink_window_dgim_traffic_spark.operators.multimodal import (
        media_neardup,
    )

    base = "the quick brown fox jumps over the lazy dog " * 30
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base[:-4] + "cat "),        # tiny byte-level edit
            (3, "completely different payload " * 40),
            (4, base),                       # exact duplicate
        ],
        "doc_id: bigint, text: string",
    )
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in media_neardup(docs, max_hamming=3).collect()
    }
    assert pairs[(1, 4)] == 0          # identical payloads
    assert (1, 2) in pairs             # near-identical caught
    assert not any(3 in p for p in pairs)  # unrelated stays out


def test_media_simhash_deterministic_and_short_blobs(spark):
    from flink_window_dgim_traffic_spark.operators.multimodal import (
        media_simhash_fingerprints,
        with_media_blob,
    )

    docs = spark.createDataFrame(
        [(1, "abc"), (2, ""), (3, "abcdefgh")],
        "doc_id: bigint, text: string",
    )
    fp1 = dict(
        (r.doc_id, r.simhash)
        for r in media_simhash_fingerprints(
            with_media_blob(docs)
        ).collect()
    )
    fp2 = dict(
        (r.doc_id, r.simhash)
        for r in media_simhash_fingerprints(
            with_media_blob(docs)
        ).collect()
    )
    assert fp1 == fp2                  # rerun-stable
    assert fp1[1] == 0 and fp1[2] == 0  # < 4 bytes -> sentinel 0
    assert fp1[3] != 0


def test_bigram_surprisal_hand_vector(spark):
    from flink_window_dgim_traffic_spark.operators.text import (
        bigram_surprisal,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        "doc_id bigint, text string",
    )
    # corpus bigrams: "a b" x3, "b a" x1, "b c" x1; N=5 -> 3 bits
    # bits: "a b" = 3-2 = 1, "b a" = "b c" = 3-1 = 2
    got = {
        r.doc_id: (r.n_bigrams, r.mean_bits_milli)
        for r in bigram_surprisal(docs).collect()
    }
    assert got == {
        1: (3, (1 + 2 + 1) * 1000 // 3),  # 1333
        2: (2, (1 + 2) * 1000 // 2),      # 1500
        3: (0, 0),
    }


def test_bigram_surprisal_python_reference(spark, sf_dir):
    from collections import Counter

    from flink_window_dgim_traffic_spark.operators.text import (
        bigram_surprisal,
    )
    from flink_window_dgim_traffic_spark.session import table

    docs = table(spark, sf_dir, "documents").limit(200)
    rows = docs.select("doc_id", "text").collect()
    cnt = Counter()
    per_doc = {}
    for r in rows:
        ws = r.text.split(" ")
        bgs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        per_doc[r.doc_id] = bgs
        cnt.update(bgs)
    n_total = sum(cnt.values())
    nb = n_total.bit_length()
    want = {}
    for d, bgs in per_doc.items():
        if not bgs:
            want[d] = (0, 0)
        else:
            s = sum(nb - cnt[b].bit_length() for b in bgs)
            want[d] = (len(bgs), s * 1000 // len(bgs))
    got = {
        r.doc_id: (r.n_bigrams, r.mean_bits_milli)
        for r in bigram_surprisal(docs).collect()
    }
    assert got == want


def test_decode_media_pnm_hand_vectors():
    """decode_media parses binary P6/P5 headers (with comments) and
    returns exact pixel bytes; non-netpbm mimes still raise."""
    # 2x2 RGB P6 with a header comment
    body6 = bytes(range(12))
    p6 = b"P6\n# c\n2 2\n255\n" + body6
    assert M.decode_media(p6, M.PPM_MIME) == (2, 2, 3, body6)
    # 3x1 gray P5, multi-space separators
    body5 = bytes([7, 8, 9])
    p5 = b"P5  3\t1\n255\n" + body5
    assert M.decode_media(p5, M.PGM_MIME) == (3, 1, 1, body5)
    # PNG dispatches to the real codec since r10: a truncated
    # signature is a codec ValueError now
    with pytest.raises(ValueError):
        M.decode_media(b"\x89PNG", "image/png")
    with pytest.raises(ValueError):
        M.decode_media(b"P6\n2 2\n255\n" + body6[:5], M.PPM_MIME)
    with pytest.raises(ValueError):
        M.decode_media(b"P5\n2 2\n255\n" + body6, M.PPM_MIME)


def test_media_pixel_stats_roundtrip(spark, sf_dir):
    """Encode -> decode_media -> aggregate equals the closed-form
    pixel formula, for both P6 (even doc_id) and P5 (odd)."""
    docs = table(spark, sf_dir, "documents").limit(24)
    got = {
        r["doc_id"]: (r["px_sum"], r["px_min"], r["px_max"], r["n_px"])
        for r in M.media_pixel_stats(docs).collect()
    }
    for doc_id in (d["doc_id"] for d in docs.select("doc_id").collect()):
        d = int(doc_id)
        w, h = d % 13 + 2, d % 11 + 2
        ch = 3 if d % 2 == 0 else 1
        vals = [(d * 7 + i * 13) % 256 for i in range(w * h * ch)]
        assert got[doc_id] == (
            sum(vals), min(vals), max(vals), len(vals)
        )


def test_media_pixel_resize_stats_python_reference(spark, sf_dir):
    """Decoded-pixel nearest-neighbor resize equals the pure-Python
    index-math replay for both channel layouts."""
    docs = table(spark, sf_dir, "documents").limit(24)
    got = {
        r["doc_id"]: (r["px_sum"], r["px_min"], r["px_max"], r["n_px"])
        for r in M.media_pixel_resize_stats(docs).collect()
    }
    for doc_id in (d["doc_id"] for d in docs.select("doc_id").collect()):
        d = int(doc_id)
        w, h = d % 13 + 2, d % 11 + 2
        ch = 3 if d % 2 == 0 else 1
        vals = [
            (d * 7 + (((ty * h // 8) * w + (tx * w // 8)) * ch + c) * 13)
            % 256
            for ty in range(8)
            for tx in range(8)
            for c in range(ch)
        ]
        assert got[doc_id] == (
            sum(vals), min(vals), max(vals), len(vals)
        ), f"doc {d}"


def test_media_ahash_pairs_python_reference(spark, sf_dir):
    """aHash fingerprints from decoded pixels equal the pure-Python
    replay, and the pair set equals the all-pairs hamming<=3 filter
    (the pigeonhole bucket join must lose nothing at this radius)."""
    docs = table(spark, sf_dir, "documents").limit(40)
    ids = [int(r["doc_id"]) for r in docs.select("doc_id").collect()]

    def ahash(d):
        g = d // 10
        w, h = g % 13 + 2, g % 11 + 2
        ch = 3 if g % 2 == 0 else 1
        n = w * h * ch
        body = [(g * 7 + i * 13) % 256 for i in range(n)]
        body[d % n] = (body[d % n] + 128) % 256
        gray = [
            [sum(body[(y * w + x) * ch + c] for c in range(ch)) // ch
             for x in range(w)]
            for y in range(h)
        ]
        small = [
            gray[(ty * h) // 8][(tx * w) // 8]
            for ty in range(8)
            for tx in range(8)
        ]
        m = sum(small) // 64
        return sum((1 << j) for j, v in enumerate(small) if v > m)

    fps = {d: ahash(d) for d in ids}
    # Spark fingerprints equal the replay
    got_fp = {
        r["doc_id"]: (r["hash_lo"], r["hash_hi"])
        for r in M.media_ahash_fingerprints(
            M.with_pnm_blob_grouped(docs)
        ).collect()
    }
    for d in ids:
        assert got_fp[d] == (fps[d] & 0xFFFFFFFF, fps[d] >> 32), d
    # pair set == brute-force hamming filter
    expect = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            lo, hi = (a, b) if a < b else (b, a)
            ham = bin(fps[lo] ^ fps[hi]).count("1")
            if ham <= 3:
                expect.add((lo, hi, ham))
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in M.media_ahash_pairs(docs).collect()
    }
    assert got == expect
    # the group structure must actually produce near-dups
    assert any(a // 10 == b // 10 for a, b, _ in expect)


def test_decode_audio_stdlib_wave_roundtrip():
    """The hand-rolled RIFF parser must agree byte-for-byte with the
    stdlib `wave` reader on the synthesized payloads — an INDEPENDENT
    decoder check (wave is a separate RIFF implementation), plus the
    error-path contract."""
    import io
    import struct
    import wave

    # build payloads with the same params helper the operator uses
    for d in (0, 1, 2, 3, 7, 50, 123):
        rate, ch, n_frames = M._wav_params(d)
        n_samp = n_frames * ch
        body = struct.pack(
            f"<{n_samp}h",
            *(((d * 31 + i * 17) % 65536) - 32768 for i in range(n_samp)),
        )
        block = ch * 2
        payload = (
            b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
            + b"fmt " + struct.pack(
                "<IHHIIHH", 16, 1, ch, rate, rate * block, block, 16
            )
            + b"data" + struct.pack("<I", len(body)) + body
        )
        got_rate, got_ch, got_samples = M.decode_audio(
            payload, M.WAV_MIME
        )
        with wave.open(io.BytesIO(payload)) as w:
            assert w.getframerate() == got_rate == rate
            assert w.getnchannels() == got_ch == ch
            assert w.getsampwidth() == 2
            frames = w.readframes(w.getnframes())
        ref = list(struct.unpack(f"<{len(frames) // 2}h", frames))
        assert got_samples == ref
        assert len(got_samples) == n_samp
    # error paths
    with pytest.raises(NotImplementedError):
        M.decode_audio(b"ID3\x04", "audio/mpeg")
    with pytest.raises(ValueError):
        M.decode_audio(b"RIFX" + b"\x00" * 20, M.WAV_MIME)
    # non-PCM fmt tag rejected
    bad = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError):
        M.decode_audio(bad, M.WAV_MIME)


def test_decode_audio_tolerates_extra_chunks():
    """RIFF chunk walk: LIST metadata between fmt and data (with an
    odd-sized body exercising word-alignment padding) must be skipped."""
    import struct

    body = struct.pack("<4h", 1, -2, 3, -4)
    chunks = (
        b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # pad
        + b"data" + struct.pack("<I", len(body)) + body
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    assert M.decode_audio(payload, M.WAV_MIME) == (8000, 2, [1, -2, 3, -4])


def test_media_audio_stats_closed_form(spark, sf_dir):
    """Encode WAV -> decode_audio -> aggregate equals the closed-form
    sample formula for both mono and stereo docs."""
    docs = table(spark, sf_dir, "documents").limit(24)
    got = {
        r["doc_id"]: (
            r["sample_rate"], r["channels"], r["amp_sum"],
            r["amp_min"], r["amp_max"], r["sq_sum"], r["n_samples"],
        )
        for r in M.media_audio_stats(docs).collect()
    }
    for doc_id in (d["doc_id"] for d in docs.select("doc_id").collect()):
        d = int(doc_id)
        rate, ch, n_frames = M._wav_params(d)
        vals = [
            ((d * 31 + i * 17) % 65536) - 32768
            for i in range(n_frames * ch)
        ]
        assert got[doc_id] == (
            rate, ch, sum(vals), min(vals), max(vals),
            sum(v * v for v in vals), len(vals),
        )


def test_media_audio_resample_stats_python_reference(spark, sf_dir):
    """Nearest-neighbor frame resample equals the pure-Python index
    replay, channels preserved."""
    docs = table(spark, sf_dir, "documents").limit(24)
    got = {
        r["doc_id"]: (r["rs_sum"], r["rs_min"], r["rs_max"], r["n_rs"])
        for r in M.media_audio_resample_stats(docs, target_frames=16).collect()
    }
    for doc_id in (d["doc_id"] for d in docs.select("doc_id").collect()):
        d = int(doc_id)
        rate, ch, n_frames = M._wav_params(d)
        sample = lambda i: ((d * 31 + i * 17) % 65536) - 32768  # noqa: E731
        vals = [
            sample(((t * n_frames) // 16) * ch + c)
            for t in range(16)
            for c in range(ch)
        ]
        assert got[doc_id] == (sum(vals), min(vals), max(vals), len(vals))


def test_media_audio_ahash_pairs_brute_force(spark, sf_dir):
    """Pigeonhole candidates + hamming filter must equal the brute
    force over all fingerprint pairs (the pigeonhole guarantee:
    hamming ≤ 3 ⇒ ≥ 1 exact 16-bit chunk match), and same-group docs
    (one perturbed sample apart) must dominate the pairs."""
    docs = table(spark, sf_dir, "documents").limit(60)
    fps = {
        r.doc_id: (r.hash_lo, r.hash_hi)
        for r in M.media_audio_fingerprints(
            M.with_wav_blob_grouped(docs)
        ).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.hamming
        for r in M.media_audio_ahash_pairs(docs).collect()
    }
    expect = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            ham = bin(
                (fps[a][0] ^ fps[b][0]) | ((fps[a][1] ^ fps[b][1]) << 32)
            ).count("1")
            if ham <= 3:
                expect[(a, b)] = ham
    assert got == expect and len(got) > 0
    within = sum(1 for (a, b) in got if a // 10 == b // 10)
    assert within / len(got) > 0.8


def test_media_audio_fingerprint_additive_invariance_guard():
    """The aHash bit rule is invariant to adding a constant to every
    sample — pin that the GROUPED fixture's group term is therefore
    multiplicative: two groups with equal (ch, n_frames) params must
    still produce different fingerprints."""
    import struct

    import numpy as np

    def fp_of(g):
        rate, ch, nf = M._wav_params(g)
        m = (g * 2654435761 + 1) % 65536
        vals = [
            ((m * (i * 17 + 1)) % 65536) - 32768
            for i in range(nf * ch)
        ]
        frames = np.asarray(vals, dtype=np.int64).reshape(-1, ch)
        mono = frames.sum(axis=1)
        fi = (np.arange(64) * nf) // 64
        small = mono[fi]
        bits = (small * 64 > int(small.sum())).astype(np.uint64)
        return int((bits << np.arange(64, dtype=np.uint64)).sum())

    # groups 0 and 100 share (ch, n_frames) (params cycle mod 100)
    assert M._wav_params(0)[1:] == M._wav_params(100)[1:]
    assert fp_of(0) != fp_of(100)


def test_decode_audio_hypothesis_roundtrip():
    """Property: for ANY PCM16 WAV (arbitrary rate/channels/samples,
    with or without an extra metadata chunk), decode_audio ==
    stdlib wave; truncated data chunks always raise, never return
    wrong samples silently."""
    import io
    import struct
    import wave

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        rate=st.integers(8000, 48000),
        ch=st.integers(1, 2),
        samples=st.lists(
            st.integers(-32768, 32767), min_size=0, max_size=80
        ),
        extra_chunk=st.booleans(),
        truncate=st.integers(0, 3),
    )
    def check(rate, ch, samples, extra_chunk, truncate):
        if ch == 2 and len(samples) % 2:
            samples = samples[:-1]
        body = struct.pack(f"<{len(samples)}h", *samples)
        block = ch * 2
        chunks = b"fmt " + struct.pack(
            "<IHHIIHH", 16, 1, ch, rate, rate * block, block, 16
        )
        if extra_chunk:
            chunks += b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        chunks += b"data" + struct.pack("<I", len(body)) + body
        payload = (
            b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE"
            + chunks
        )
        if truncate and len(body) >= truncate:
            bad = payload[: len(payload) - truncate]
            if truncate <= len(body):
                with pytest.raises(ValueError):
                    M.decode_audio(bad, M.WAV_MIME)
        got = M.decode_audio(payload, M.WAV_MIME)
        assert got[0] == rate and got[1] == ch
        assert got[2] == samples
        with wave.open(io.BytesIO(payload)) as w:
            assert (w.getframerate(), w.getnchannels()) == (rate, ch)
            ref = w.readframes(w.getnframes())
        assert struct.pack(f"<{len(samples)}h", *got[2]) == ref

    check()


def test_decode_media_netpbm_hypothesis_roundtrip():
    """Property: for ANY dimensions/channel layout and any header
    comment/whitespace shape the spec allows, decode_media recovers
    the exact pixel bytes; short pixel payloads always raise."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(1, 40),
        h=st.integers(1, 30),
        rgb=st.booleans(),
        comment=st.booleans(),
        sep=st.sampled_from([b"\n", b" ", b"\t", b"  \n"]),
        data=st.data(),
        short=st.integers(0, 2),
    )
    def check(w, h, rgb, comment, sep, data, short):
        ch = 3 if rgb else 1
        n = w * h * ch
        body = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=n, max_size=n
                )
            )
        )
        magic = b"P6" if rgb else b"P5"
        hdr = magic + sep
        if comment:
            hdr += b"# synthetic comment\n"
        hdr += b"%d" % w + sep + b"%d" % h + sep + b"255\n"
        mime = M.PPM_MIME if rgb else M.PGM_MIME
        assert M.decode_media(hdr + body, mime) == (w, h, ch, body)
        if short and short <= n:
            with pytest.raises(ValueError):
                M.decode_media(hdr + body[:-short], mime)

    check()


# ----------------------------------------------------------------------
# PNG codec (r10): stdlib-zlib decode with CRC walk + all 5 unfilters
# ----------------------------------------------------------------------
def test_png_roundtrip_all_filters_and_channels():
    """decode(encode(x)) == x for every channel layout (gray, GA,
    RGB, RGBA), every scanline filter type, and multi-IDAT splits."""
    import random

    rng = random.Random(7)
    for _ in range(60):
        w, h = rng.randint(1, 20), rng.randint(1, 16)
        ch = rng.choice([1, 2, 3, 4])
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        filters = [rng.randrange(5) for _ in range(h)]
        enc = M.encode_png(
            w, h, ch, px, filters, idat_chunk=rng.choice([7, 64, 512])
        )
        assert M.decode_png(enc) == (w, h, ch, px)
    # each filter type alone, uniform rows (degenerate predictors)
    for f in range(5):
        px = bytes([5] * 24)
        assert M.decode_png(M.encode_png(4, 2, 3, px, [f, f]))[3] == px


def test_png_decodes_real_encoder_output():
    """A PNG written by a REAL third-party encoder decodes to the
    expected uniform raster — validates CRC framing, inflate and
    unfiltering against an independent implementation, not just our
    own round-trip.  Fixture: IPython's 71-byte 2×2 grayscale test
    asset (BSD-licensed), embedded verbatim."""
    import base64

    data = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAIAAAACCAAAAABX3VL4AAAADklEQVR4nGNs"
        "YGBiYAAAApIAhPd8o1gAAAAASUVORK5CYII="
    )
    w, h, ch, px = M.decode_png(data)
    assert (w, h, ch) == (2, 2, 1)
    assert px == bytes([128] * 4)


def test_png_corruption_raises():
    """Structural fuzz: bad signature, truncation anywhere, a flipped
    byte (CRC), bad filter byte, inflated-size mismatch — all
    ValueError, never garbage output."""
    enc = M.encode_png(5, 4, 3, bytes(range(60)), [0, 1, 2, 4])
    with pytest.raises(ValueError):
        M.decode_png(b"X" + enc[1:])
    for cut in range(8, len(enc), 7):
        with pytest.raises(ValueError):
            M.decode_png(enc[:cut])
    for pos in range(8, len(enc) - 4, 11):
        bad = enc[:pos] + bytes([enc[pos] ^ 0xFF]) + enc[pos + 1:]
        with pytest.raises(ValueError):
            M.decode_png(bad)
    # filter byte out of range survives the deflate round trip
    import struct
    import zlib

    raw = b"\x07" + bytes(15)  # filter 7 invalid
    comp = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 5, 1, 8, 2, 0, 0, 0)

    def chunk(t, b):
        return (
            struct.pack(">I", len(b)) + t + b
            + struct.pack(">I", zlib.crc32(t + b))
        )

    bad_png = (
        M._PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", comp)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        M.decode_png(bad_png)


def test_png_hypothesis_roundtrip():
    """Property: arbitrary rasters, filter sequences and IDAT chunk
    sizes round-trip exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 18),
        ch=st.sampled_from([1, 2, 3, 4]),
        seed=st.integers(0, 2**31),
        idat_chunk=st.sampled_from([5, 100, 10_000]),
        data=st.data(),
    )
    def check(w, h, ch, seed, idat_chunk, data):
        import random

        rng = random.Random(seed)
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        filters = data.draw(
            st.lists(
                st.integers(0, 4), min_size=h, max_size=h
            )
        )
        enc = M.encode_png(w, h, ch, px, filters, idat_chunk=idat_chunk)
        assert M.decode_png(enc) == (w, h, ch, px)

    check()


def test_media_png_stats_matches_pnm_family(spark, sf_dir):
    """The PNG fixture carries the SAME closed-form raster as the
    netpbm fixture, so media_png_stats must equal media_pixel_stats
    row for row — the filtered+deflated codec is the only difference
    in the path."""
    docs = table(spark, sf_dir, "documents").limit(30)
    png = sorted(map(tuple, M.media_png_stats(docs).collect()))
    pnm = sorted(map(tuple, M.media_pixel_stats(docs).collect()))
    assert png == pnm and len(png) == 30


def test_media_png_ahash_pairs_matches_pnm_pairs(spark, sf_dir):
    """Grouped PNG fixture rasters equal the grouped pnm fixture's, so
    the perceptual pair sets must be identical through either codec."""
    docs = table(spark, sf_dir, "documents").limit(60)
    png = sorted(map(tuple, M.media_png_ahash_pairs(docs).collect()))
    pnm = sorted(map(tuple, M.media_ahash_pairs(docs).collect()))
    assert png == pnm and len(png) > 0


def test_decode_media_dispatches_png():
    """decode_media('image/png') goes through decode_png; unknown
    mimes still raise NotImplementedError (JPEG is a real codec
    since r11 — truncated bytes are its ValueError now)."""
    px = bytes((3 * 7 + i * 13) % 256 for i in range(12))
    enc = M.encode_png(4, 3, 1, px, [0, 2, 4])
    assert M.decode_media(enc, M.PNG_MIME) == (4, 3, 1, px)
    with pytest.raises(NotImplementedError):
        M.decode_media(b"\xff\xd8\xff", "image/webp")


def test_adpcm_step_hand_vector():
    """The IMA state machine against a pinned vector (generated with
    stdlib audioop.adpcm2lin, the Intel/DVI IMA reference, and baked
    as literals so the pin survives audioop's 3.13 removal)."""
    nibs = [0, 1, 2, 4, 7, 8, 9, 15, 4, 4, 4, 4, 8, 12, 3, 5]
    expect = [0, 1, 4, 11, 27, 25, 19, -11, 27, 73, 129, 196,
              187, 113, 183, 283]
    pred, idx = 0, 0
    got = []
    for n in nibs:
        pred, idx = M._adpcm_step(pred, idx, n)
        got.append(pred)
    assert got == expect


def test_adpcm_step_matches_audioop():
    """Property pin against stdlib audioop while it exists: random
    nibble streams decode identically (audioop packs high nibble
    first in its raw stream; the WAV container is low-first)."""
    import random
    import struct

    audioop = pytest.importorskip("audioop")
    rng = random.Random(11)
    nibs = [rng.randrange(16) for _ in range(512)]
    data = bytes(
        (nibs[i] << 4) | nibs[i + 1] for i in range(0, len(nibs), 2)
    )
    pcm, _ = audioop.adpcm2lin(data, 2, (0, 0))
    ref = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    pred, idx = 0, 0
    mine = []
    for n in nibs:
        pred, idx = M._adpcm_step(pred, idx, n)
        mine.append(pred)
    assert mine == ref


def test_adpcm_wav_roundtrip_bounded():
    """Smooth signals round-trip through encode_adpcm_wav +
    decode_audio within the adaptive quantizer's tracking error,
    mono and stereo, including the zero-padded + fact-trimmed last
    block."""
    import math

    src = [int(3000 * math.sin(i / 30)) for i in range(2000)]
    wav = M.encode_adpcm_wav(8000, 1, src, frames_per_block=505)
    rate, ch, out = M.decode_audio(wav, M.WAV_MIME)
    assert (rate, ch) == (8000, 1)
    assert len(out) == len(src)
    assert max(abs(a - b) for a, b in zip(src, out)) <= 512

    st = []
    for i in range(600):
        st += [int(2000 * math.sin(i / 25)), int(1500 * math.cos(i / 40))]
    wav2 = M.encode_adpcm_wav(11025, 2, st, frames_per_block=249)
    rate2, ch2, out2 = M.decode_audio(wav2, M.WAV_MIME)
    assert (rate2, ch2) == (11025, 2)
    assert len(out2) == len(st)
    assert max(abs(a - b) for a, b in zip(st, out2)) <= 512


def test_adpcm_fixture_closed_form():
    """The with_adpcm_blob container decodes to exactly
    predictor + (frame odd) per block/channel with the fact trim —
    the closed form the DuckDB oracle replays."""
    import struct

    for d in (0, 1, 2, 3, 4, 5, 11):
        rate, ch, nb, spb, trim = M._adpcm_fixture_params(d)
        dbc = (spb - 1) // 2
        ba = 4 * ch + dbc * ch
        data = bytearray()
        for b in range(nb):
            for c in range(ch):
                p = (d * 37 + b * 101 + c * 53) % 4001 - 2000
                data += struct.pack("<hBB", p, 0, 0)
            for _ in range(dbc // 4):
                data += bytes((0x91,)) * (4 * ch)
        n_frames = nb * spb - trim
        fmt = struct.pack(
            "<HHIIHHHH", 0x11, ch, rate, rate * ba // spb, ba, 4, 2, spb
        )
        body = (
            b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"fact" + struct.pack("<II", 4, n_frames)
            + b"data" + struct.pack("<I", len(data)) + data
        )
        wav = b"RIFF" + struct.pack("<I", len(body)) + body
        r2, c2, out = M.decode_audio(wav, M.WAV_MIME)
        assert (r2, c2) == (rate, ch)
        expect = []
        for b in range(nb):
            k = spb - trim if b == nb - 1 else spb
            for j in range(k):
                for c in range(ch):
                    p = (d * 37 + b * 101 + c * 53) % 4001 - 2000
                    expect.append(p + (1 if j % 2 else 0))
        assert out == expect


def test_adpcm_corruption_raises():
    """Structural corruption fails loudly: truncated block, step
    index out of range, inconsistent wSamplesPerBlock, bad encoder
    block size."""
    import struct

    src = list(range(0, 600, 3))
    wav = M.encode_adpcm_wav(8000, 1, src, frames_per_block=65)
    with pytest.raises(ValueError):
        M.decode_audio(wav[:-5], M.WAV_MIME)  # truncated data chunk
    # step index byte > 88 in the first block header
    data_at = wav.find(b"data") + 8
    bad = bytearray(wav)
    bad[data_at + 2] = 97
    with pytest.raises(ValueError):
        M.decode_audio(bytes(bad), M.WAV_MIME)
    # wSamplesPerBlock inconsistent with block_align
    bad2 = bytearray(wav)
    fmt_at = wav.find(b"fmt ") + 8
    bad2[fmt_at + 18 : fmt_at + 20] = struct.pack("<H", 9)
    with pytest.raises(ValueError):
        M.decode_audio(bytes(bad2), M.WAV_MIME)
    with pytest.raises(ValueError):
        M.encode_adpcm_wav(8000, 1, src, frames_per_block=64)


def test_jpeg_flat_block_roundtrip_exact():
    """Flat-per-8x8-block rasters with all-ones quant tables must
    round-trip BIT-EXACTLY through the full baseline pipeline (DCT →
    quantize → Huffman → byte stuffing → entropy decode → dequant →
    IDCT → clamp), in grayscale AND gray-valued RGB (chroma-neutral
    YCbCr), with and without restart intervals."""
    for d in (0, 1, 5, 11, 42):
        wb, hb = d % 4 + 1, d % 3 + 1
        w, h = wb * 8, hb * 8
        for ch in (1, 3):
            body = bytearray()
            for y in range(h):
                for x in range(w):
                    v = (d * 7 + ((y // 8) * wb + x // 8) * 13) % 256
                    body += bytes((v,) * ch)
            for rst in (0, 1, 3):
                enc = M.encode_jpeg(
                    w, h, ch, bytes(body), restart_interval=rst
                )
                assert M.decode_jpeg(enc) == (w, h, ch, bytes(body))


def test_jpeg_lossy_roundtrip_bounded():
    """Arbitrary rasters (including non-block-aligned dims) must
    round-trip within quantization error: with the all-ones quantizer
    the reconstruction differs from the source only by DCT/IDCT float
    rounding, bounded by ±2 per pixel."""
    import random

    rng = random.Random(97)
    for w, h, ch in ((16, 24, 1), (13, 9, 1), (8, 8, 3), (21, 10, 3)):
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        enc = M.encode_jpeg(w, h, ch, px)
        w2, h2, ch2, out = M.decode_jpeg(enc)
        assert (w2, h2, ch2) == (w, h, ch)
        if ch == 1:
            # grayscale has no color-transform rounding: +/-2
            assert max(abs(a - b) for a, b in zip(px, out)) <= 2
        else:
            # RGB pays YCbCr forward+inverse float rounding too
            assert max(abs(a - b) for a, b in zip(px, out)) <= 6


def test_jpeg_corruption_and_scope_raise():
    """Truncation, bad SOI, in-stream markers, and out-of-scope
    encodings must fail loudly: ValueError for corruption,
    NotImplementedError for the documented progressive/subsampling
    boundary."""
    import struct

    import pytest

    d = 6
    wb, hb = d % 4 + 1, d % 3 + 1
    w, h = wb * 8, hb * 8
    body = bytes(
        (d * 7 + ((i // w // 8) * wb + (i % w) // 8) * 13) % 256
        for i in range(w * h)
    )
    enc = M.encode_jpeg(w, h, 1, body)
    with pytest.raises(ValueError):
        M.decode_jpeg(b"\x00\x01" + enc[2:])  # bad SOI
    with pytest.raises(ValueError):
        M.decode_jpeg(enc[: len(enc) // 2])  # truncated mid-stream
    # SOF2 is SUPPORTED since r12, but a sequential full-band scan
    # inside a progressive frame is structurally invalid — loud
    # ValueError, not a silent mis-decode
    sof_at = enc.find(b"\xff\xc0")
    prog = enc[:sof_at] + b"\xff\xc2" + enc[sof_at + 2 :]
    with pytest.raises(ValueError):
        M.decode_jpeg(prog)
    # lossless (SOF3) / arithmetic (SOF9) stay scope boundaries
    for m in (b"\xff\xc3", b"\xff\xc9"):
        with pytest.raises(NotImplementedError):
            M.decode_jpeg(enc[:sof_at] + m + enc[sof_at + 2 :])
    # claim 2x2 subsampling in SOF: documented scope boundary
    sub = bytearray(enc)
    sub[sof_at + 11] = 0x22  # component 1 sampling factors
    with pytest.raises(NotImplementedError):
        M.decode_jpeg(bytes(sub))
    # corrupt a Huffman-coded byte so an invalid code appears
    sos_at = enc.find(b"\xff\xda")
    bad = bytearray(enc)
    # force an impossible all-ones 16-bit prefix run inside entropy data
    for i in range(sos_at + 14, min(sos_at + 20, len(bad) - 2)):
        bad[i] = 0xEE
    with pytest.raises(ValueError):
        M.decode_jpeg(bytes(bad))


def test_jpeg_hypothesis_flat_blocks():
    """Property: ANY flat-block raster (random block values, random
    block-grid dims, random restart interval) round-trips exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        wb=st.integers(1, 5),
        hb=st.integers(1, 4),
        ch=st.sampled_from([1, 3]),
        seed=st.integers(0, 2**31),
        rst=st.integers(0, 4),
    )
    def check(wb, hb, ch, seed, rst):
        import random

        rng = random.Random(seed)
        vals = [rng.randrange(256) for _ in range(wb * hb)]
        w, h = wb * 8, hb * 8
        body = bytearray()
        for y in range(h):
            for x in range(w):
                v = vals[(y // 8) * wb + x // 8]
                body += bytes((v,) * ch)
        enc = M.encode_jpeg(w, h, ch, bytes(body), restart_interval=rst)
        assert M.decode_jpeg(enc) == (w, h, ch, bytes(body))

    check()


def test_jpeg_420_flat_macroblock_roundtrip_exact():
    """4:2:0 (r12): gray-valued RGB rasters flat per 16x16 MACROBLOCK
    round-trip BIT-EXACTLY through the subsampled pipeline — 2x2 luma
    blocks per MCU, box-mean chroma downsample (exact on flat
    chroma), replication upsample, ragged-dim edge replication +
    crop, restart markers.  Mirrors the with_jpeg420_blob fixture."""
    for d in (0, 1, 7, 13, 29, 38):
        wm, hm = d % 3 + 1, d % 2 + 1
        w, h = wm * 16 - d % 5, hm * 16 - d % 7
        body = bytearray()
        for y in range(h):
            for x in range(w):
                v = (d * 11 + ((y // 16) * wm + x // 16) * 29) % 256
                body += bytes((v, v, v))
        enc = M.encode_jpeg(
            w, h, 3, bytes(body), restart_interval=d % 3,
            subsampling="420",
        )
        assert M.decode_jpeg(enc) == (w, h, 3, bytes(body))


def test_jpeg_420_color_macroblocks_bounded():
    """4:2:0 with NON-neutral chroma: flat-per-16x16 COLOR macroblocks
    keep the box-mean downsample exact (chroma is flat inside every
    2x2 group), so reconstruction error is only DC-quantize rounding
    spread over the block plus YCbCr float round-trip: within +/-3."""
    import random

    rng = random.Random(7)
    for w, h in ((32, 16), (48, 32), (29, 23)):
        wm, hm = -(-w // 16), -(-h // 16)
        cols = [
            tuple(rng.randrange(256) for _ in range(3))
            for _ in range(wm * hm)
        ]
        body = bytearray()
        for y in range(h):
            for x in range(w):
                body += bytes(cols[(y // 16) * wm + x // 16])
        enc = M.encode_jpeg(w, h, 3, bytes(body), subsampling="420")
        w2, h2, ch2, out = M.decode_jpeg(enc)
        assert (w2, h2, ch2) == (w, h, 3)
        assert max(abs(a - b) for a, b in zip(body, out)) <= 3


def test_jpeg_420_lossy_roundtrip_bounded():
    """Color rasters constant per 2x2 pixel group (random otherwise)
    through 4:2:0: the box-mean chroma downsample is EXACT on such
    rasters while the chroma blocks still carry full random AC
    content (real chroma entropy decode, not just DC), so the
    round trip stays within the 444 RGB float-rounding bound (+/-6
    per channel) — no subsampling information loss to excuse."""
    import random

    rng = random.Random(41)
    w, h = 21, 18
    gw = -(-w // 2)
    cols = [
        tuple(rng.randrange(256) for _ in range(3))
        for _ in range(gw * -(-h // 2))
    ]
    body = bytearray()
    for y in range(h):
        for x in range(w):
            body += bytes(cols[(y // 2) * gw + x // 2])
    enc = M.encode_jpeg(w, h, 3, bytes(body), subsampling="420")
    w2, h2, ch2, out = M.decode_jpeg(enc)
    assert (w2, h2, ch2) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(body, out)) <= 6


def test_jpeg_420_scope_and_corruption_raise():
    """4:4:4:4-ish luma factors beyond 2 stay a documented
    NotImplementedError boundary; a truncated 4:2:0 stream still
    fails loudly with ValueError."""
    import pytest

    body = bytes(64 * [33]) * 4 * 3
    enc = M.encode_jpeg(16, 16, 3, body, subsampling="420")
    sof_at = enc.find(b"\xff\xc0")
    sub = bytearray(enc)
    sub[sof_at + 11] = 0x44  # component 1: 4x4 tiles — out of scope
    with pytest.raises(NotImplementedError):
        M.decode_jpeg(bytes(sub))
    with pytest.raises(ValueError):
        M.decode_jpeg(enc[: len(enc) - 4])  # truncated entropy data
    with pytest.raises(ValueError):
        M.encode_jpeg(16, 16, 3, body, subsampling="411")


def test_jpeg_422_440_flat_macroblock_roundtrip_exact():
    """4:2:2 and 4:4:0 (r12): the same generic MCU machinery at
    (2,1) / (1,2) luma factors — gray-valued rasters flat per MCU
    tile round-trip bit-exactly, ragged dims included."""
    for subsampling, tw, th in (("422", 16, 8), ("440", 8, 16)):
        for d in (0, 3, 10, 21):
            wm, hm = d % 3 + 1, d % 2 + 2
            w, h = wm * tw - d % 5, hm * th - d % 7
            body = bytearray()
            for y in range(h):
                for x in range(w):
                    v = (d * 13 + ((y // th) * wm + x // tw) * 41) % 256
                    body += bytes((v, v, v))
            enc = M.encode_jpeg(
                w, h, 3, bytes(body), restart_interval=d % 3,
                subsampling=subsampling,
            )
            assert M.decode_jpeg(enc) == (w, h, 3, bytes(body)), (
                subsampling, d,
            )


def test_jpeg_420_hypothesis_flat_macroblocks():
    """Property: ANY flat-macroblock gray-valued raster (random
    values, grid dims, ragged crop, restart interval) round-trips
    exactly through the 4:2:0 path."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        wm=st.integers(1, 3),
        hm=st.integers(1, 3),
        dx=st.integers(0, 15),
        dy=st.integers(0, 15),
        seed=st.integers(0, 2**31),
        rst=st.integers(0, 3),
    )
    def check(wm, hm, dx, dy, seed, rst):
        import random

        rng = random.Random(seed)
        vals = [rng.randrange(256) for _ in range(wm * hm)]
        w, h = max(1, wm * 16 - dx), max(1, hm * 16 - dy)
        body = bytearray()
        for y in range(h):
            for x in range(w):
                v = vals[(y // 16) * wm + x // 16]
                body += bytes((v, v, v))
        enc = M.encode_jpeg(
            w, h, 3, bytes(body), restart_interval=rst,
            subsampling="420",
        )
        assert M.decode_jpeg(enc) == (w, h, 3, bytes(body))

    check()


def test_jpeg_progressive_equals_baseline():
    """THE progressive property (r12): the scan script (DC at Al=1,
    AC bands at Al=1, DC/AC refinement to full precision, EOBn runs,
    correction-bit buffering) reassembles the IDENTICAL quantized
    coefficients, so progressive decode == baseline decode
    bit-for-bit on any raster, every subsampling shape."""
    import random

    rng = random.Random(5)
    for w, h, ch, sub in (
        (8, 8, 1, "444"), (16, 24, 1, "444"), (13, 9, 1, "444"),
        (21, 10, 3, "444"), (32, 16, 3, "420"), (29, 23, 3, "420"),
        (24, 16, 3, "422"), (16, 24, 3, "440"),
    ):
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        base = M.decode_jpeg(M.encode_jpeg(w, h, ch, px, subsampling=sub))
        prog = M.decode_jpeg(
            M.encode_jpeg(
                w, h, ch, px, subsampling=sub, progressive=True
            )
        )
        assert base == prog, (w, h, ch, sub)


def test_jpeg_progressive_flat_block_exact():
    """Flat-block rasters stay bit-exact through the progressive
    path (DC-only blocks exercise the EOBn band-skip runs across
    whole scans)."""
    for d in (0, 1, 5, 11, 42):
        wb, hb = d % 4 + 1, d % 3 + 1
        w, h = wb * 8, hb * 8
        for ch in (1, 3):
            body = bytearray()
            for y in range(h):
                for x in range(w):
                    v = (d * 7 + ((y // 8) * wb + x // 8) * 13) % 256
                    body += bytes((v,) * ch)
            enc = M.encode_jpeg(w, h, ch, bytes(body), progressive=True)
            assert M.decode_jpeg(enc) == (w, h, ch, bytes(body))


def test_jpeg_progressive_corruption_raises():
    """Truncating a progressive stream mid-scan fails loudly; restart
    intervals are rejected at encode (documented)."""
    import random

    rng = random.Random(9)
    px = bytes(rng.randrange(256) for _ in range(24 * 16 * 3))
    enc = M.encode_jpeg(24, 16, 3, px, progressive=True)
    for cut in (len(enc) // 2, len(enc) - 6):
        with pytest.raises(ValueError):
            M.decode_jpeg(enc[:cut])
    with pytest.raises(ValueError):
        M.encode_jpeg(
            24, 16, 3, px, progressive=True, restart_interval=2
        )


def test_jpeg_progressive_hypothesis_equivalence():
    """Property: progressive == baseline on arbitrary random rasters
    and shapes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=20, deadline=None)
    @given(
        w=st.integers(4, 33),
        h=st.integers(4, 33),
        ch=st.sampled_from([1, 3]),
        sub=st.sampled_from(["444", "420", "422", "440"]),
        seed=st.integers(0, 2**31),
    )
    def check(w, h, ch, sub, seed):
        import random

        if ch == 1:
            sub = "444"
        rng = random.Random(seed)
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        base = M.decode_jpeg(M.encode_jpeg(w, h, ch, px, subsampling=sub))
        prog = M.decode_jpeg(
            M.encode_jpeg(w, h, ch, px, subsampling=sub, progressive=True)
        )
        assert base == prog

    check()


def test_decode_media_dispatches_jpeg():
    """decode_media routes image/jpeg to the baseline decoder (so the
    aHash fingerprint family works over JPEG blobs unchanged)."""
    body = bytes([17] * 64)
    enc = M.encode_jpeg(8, 8, 1, body)
    assert M.decode_media(enc, M.JPEG_MIME) == (8, 8, 1, body)
