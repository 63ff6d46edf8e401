"""Multimodal decode query surface (SURVEY §2.10 north star; the reference
has no media counterpart — this extends it the way a training-data
pipeline needs: media as opaque binary columns, decoded/feature-extracted
by Arrow-batched kernels).

The driver's oracle is DuckDB over the same parquet — it cannot decode
PPM/WAV/PPMV payloads. The differential trick: the media table is built
IN-PLAN from a deterministic generation law seeded by ``documents.doc_id``
(one payload per seed; pure-numpy encoders from operators/multimodal.py),
Spark then REALLY decodes the bytes (header parse, pixel/PCM/frame reads,
feature kernels), and the oracle recomputes the expected metadata from the
same law in closed form — widths, sample counts, container byte sizes, and
the quantized feature values are all exact functions of the seed. A decode
bug (wrong stride, wrong chunk walk, off-by-one header) breaks the hash;
the law itself never decodes anything.

Generation law (m = doc_id % 3):
- m=0 image: solid-color P6 PPM, w = 16 + (id%7)*4, h = 12 + (id%5)*4,
  RGB = (id%256, id*7%256, id*13%256).
- m=1 audio: constant-amplitude PCM WAV, rate 8000, ch = 1 + id%2,
  n = 800 + (id%10)*80 samples, amplitude (20 + id%70)/100 — quantized to
  16-bit by the encoder, so the decoded RMS is exactly
  round(amp*32768)/32768 (no half-way cases for this amplitude grid:
  0.68k mod 1 never hits .5).
- m=2 video: PPMV container (length-prefixed P6 frames), 2 + id%3 frames
  at the image w/h law, 24 fps.

Scale: generation and decode are row-local mapInPandas passes — zero
shuffles; the feature join is on the generated media_id (collision-free by
construction). At 100 TB the same plan reads payloads from parquet binary
columns instead of generating them; everything downstream is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    encode_ppm,
    encode_ppmv,
    encode_wav,
    extract_features,
    resize_media,
    sample_frames,
)
from ..sources.tpch import load_table
from .spec import Registry

MD = Registry()

N_SEEDS = 60


def synthetic_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic media table: one payload per documents.doc_id
    below N_SEEDS, built by the module's generation law (see docstring)."""
    import numpy as np
    import pandas as pd

    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id")
        .filter(F.col("doc_id") < N_SEEDS)
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                m = i % 3
                w = 16 + (i % 7) * 4
                h = 12 + (i % 5) * 4
                if m == 0:
                    px = np.empty((h, w, 3), np.uint8)
                    px[..., 0] = i % 256
                    px[..., 1] = (i * 7) % 256
                    px[..., 2] = (i * 13) % 256
                    rows.append(
                        (i, "image", encode_ppm(px), "image/x-portable-pixmap", "synthetic")
                    )
                elif m == 1:
                    n = 800 + (i % 10) * 80
                    ch = 1 + (i % 2)
                    amp = (20 + (i % 70)) / 100.0
                    samples = np.full((n, ch), amp, dtype=np.float64)
                    rows.append(
                        (i, "audio", encode_wav(samples, 8000), "audio/wav", "synthetic")
                    )
                else:
                    nfr = 2 + (i % 3)
                    frames = []
                    for f in range(nfr):
                        px = np.empty((h, w, 3), np.uint8)
                        px[...] = (i + f) % 256
                        frames.append(px)
                    rows.append(
                        (i, "video", encode_ppmv(frames, 24.0), "video/x-ppmv", "synthetic")
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime", "source"]
            )

    return docs.mapInPandas(gen, MEDIA_SCHEMA)


@MD.add(
    "q98_media_decode",
    oracle="""
WITH law AS (
  SELECT doc_id,
         doc_id % 3 AS m,
         16 + (doc_id % 7) * 4 AS w,
         12 + (doc_id % 5) * 4 AS h,
         800 + (doc_id % 10) * 80 AS n_samp,
         1 + (doc_id % 2) AS ch,
         2 + (doc_id % 3) AS nfr,
         (20 + doc_id % 70) / 100.0 AS amp
  FROM documents WHERE doc_id < 60
),
sized AS (
  SELECT *,
         9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR)) + 3 * w * h
           AS ppm_bytes
  FROM law
)
SELECT doc_id AS media_id,
       CASE m WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
       CASE m WHEN 1 THEN 0 ELSE w END AS width,
       CASE m WHEN 1 THEN 0 ELSE h END AS height,
       CASE m WHEN 0 THEN 1 WHEN 1 THEN n_samp ELSE nfr END AS n_frames,
       CASE m WHEN 0 THEN 0.0
              WHEN 1 THEN round(n_samp / 8000.0, 6)
              ELSE round(nfr / 24.0, 6) END AS duration_sec,
       CASE m WHEN 0 THEN ppm_bytes
              WHEN 1 THEN 44 + 2 * n_samp * ch
              ELSE 12 + nfr * (4 + ppm_bytes) END AS payload_bytes,
       CASE m WHEN 1 THEN 8000 ELSE 0 END AS sample_rate,
       CASE m WHEN 1 THEN ch ELSE 3 END AS n_channels,
       CASE m WHEN 0 THEN round((doc_id % 256) / 255.0, 6)
              WHEN 1 THEN round(round(amp * 32768) / 32768.0, 6)
              ELSE NULL END AS feat_stat
FROM sized
""",
    doc="REAL multimodal decode, driver-checked: generate PPM/WAV/PPMV "
    "payloads in-plan from a seed law (operators/multimodal.py encoders), "
    "decode the actual bytes back (header parse, BGR/stride/chunk-walk "
    "pixel+PCM reads, frame container walk) plus the feature kernels "
    "(image channel means, audio RMS), and hash-compare against the "
    "closed-form law the oracle evaluates without ever decoding. Covers "
    "the full §2.10 plumbing: MEDIA_SCHEMA binary columns, mapInPandas "
    "Arrow batches, decode_media(real=True), extract_features(real=True). "
    "feat_stat pins the kernels to exact values: a solid image's mean-R "
    "is id%256/255; a constant 16-bit PCM signal's RMS is its quantized "
    "amplitude round(amp*32768)/32768 (video rows are NULL — features of "
    "frame containers go through sample_frames instead).",
    tags=("multimodal", "decode", "mapInPandas", "llm"),
)
def q98(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = synthetic_media(spark, sf_dir)
    decoded = decode_media(media, real=True)
    feats = extract_features(media.filter(F.col("kind") != "video"), real=True)
    stat = F.when(
        F.col("kind") == "image", F.round(F.element_at("features", 1), 6)
    ).when(F.col("kind") == "audio", F.round(F.element_at("features", 4), 6))
    return (
        decoded.join(feats, "media_id", "left")
        .select(
            "media_id",
            "kind",
            "width",
            "height",
            "n_frames",
            "duration_sec",
            "payload_bytes",
            "sample_rate",
            "n_channels",
            stat.alias("feat_stat"),
        )
    )


@MD.add(
    "q101_frame_dedup",
    oracle="""
WITH law AS (
  SELECT doc_id,
         16 + (doc_id % 7) * 4 AS w,
         12 + (doc_id % 5) * 4 AS h,
         2 + (doc_id % 3) AS nfr
  FROM documents WHERE doc_id < 60 AND doc_id % 3 = 2
),
frames AS (
  -- a solid frame's pixel buffer is its color byte repeated w*h*3 times,
  -- so md5(buffer) equality is exactly (w*h, color) equality — including
  -- ACROSS different shapes with equal areas (16x24 == 24x16 == 32x12)
  SELECT l.w * l.h AS npix, (l.doc_id + f.range) % 256 AS color
  FROM law l JOIN range(0, 4) f ON f.range < l.nfr
),
per_fp AS (
  SELECT npix, color, count(*) AS n_occurrences
  FROM frames GROUP BY npix, color
)
SELECT n_occurrences, count(*) AS n_fingerprints
FROM per_fp GROUP BY n_occurrences
""",
    doc="Video-frame dedup over REAL decoded pixels: sample_frames("
    "real=True) walks every PPMV container, decodes each frame, and "
    "fingerprints the pixel BUFFER (md5) — so two videos sharing a frame "
    "collide, which is the frame-dedup contract. The output is the "
    "fingerprint-multiplicity histogram; the oracle rebuilds it from the "
    "generation law, where buffer equality reduces to (pixel-count, "
    "color) equality — deliberately INCLUDING cross-shape collisions "
    "(a 16x24 solid buffer is byte-identical to a 24x16 one), which a "
    "fingerprint-of-decoded-header implementation would get wrong. "
    "Plan: one mapInPandas fan-out (frames expand inside the Arrow "
    "batch, no explode shuffle) + two grouped counts.",
    tags=("multimodal", "video", "dedup", "llm"),
)
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = sample_frames(synthetic_media(spark, sf_dir), every_nth=1, real=True)
    per_fp = frames.groupBy("frame_fingerprint").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    return per_fp.groupBy("n_occurrences").agg(
        F.count(F.lit(1)).alias("n_fingerprints")
    )


@MD.add(
    "q102_media_resize",
    oracle="""
SELECT doc_id AS media_id,
       13 AS width,
       9 AS height,
       9 + length(CAST(13 AS VARCHAR)) + length(CAST(9 AS VARCHAR))
         + 3 * 13 * 9 AS payload_bytes,
       round((doc_id % 256) / 255.0, 6) AS mean_r
FROM documents WHERE doc_id < 60 AND doc_id % 3 = 0
""",
    doc="Resize round-trip: resize_media (nearest-neighbor resample -> "
    "P6 re-encode) produces an opaque binary column that decode_media/"
    "extract_features consume unchanged — the normalize-resolution step "
    "composes with the rest of the media pipeline in ONE lazy plan "
    "(generate -> resize -> decode -> features, three mapInPandas "
    "stages, zero shuffles until the final checks). The oracle pins the "
    "re-encoded header layout byte-exactly and the channel-mean feature "
    "of the resampled pixels (nearest-neighbor of a solid image is the "
    "same solid, so mean-R survives the resize).",
    tags=("multimodal", "resize", "mapInPandas", "llm"),
)
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    imgs = synthetic_media(spark, sf_dir).filter(F.col("kind") == "image")
    resized = resize_media(imgs, out_h=9, out_w=13)
    decoded = decode_media(resized, real=True).select(
        "media_id", "width", "height", "payload_bytes"
    )
    feats = extract_features(resized, real=True).select(
        "media_id", F.round(F.element_at("features", 1), 6).alias("mean_r")
    )
    return decoded.join(feats, "media_id")


# ---------------------------------------------------------------------------
# q113 — REAL compressed-format decode (PNG: DEFLATE + filter reconstruction)
# ---------------------------------------------------------------------------
@MD.add(
    "q113_png_decode",
    oracle="""
WITH law AS (
  SELECT doc_id,
         16 + (doc_id % 7) * 4 AS w,
         12 + (doc_id % 5) * 4 AS h,
         doc_id % 100 AS base
  FROM documents WHERE doc_id < 60
)
SELECT doc_id AS media_id,
       w AS width,
       h AS height,
       (w * h)::BIGINT AS n_pixels,
       (3 * w * h * base
        + 3 * h * (w * (w - 1) // 2)
        + 3 * w * (h * (h - 1))
        + 3 * w * h)::BIGINT AS pixel_sum,
       base::BIGINT AS first_px,
       (base + (w - 1) + 2 * (h - 1) + 2)::BIGINT AS last_px
FROM law
""",
    doc="REAL compressed-image decode, driver-checked: gradient images "
    "(pixel(y,x,c) = base + x + 2y + c, wrap-free by construction) are "
    "encoded in-plan to genuine PNG — stdlib-zlib DEFLATE, CRC-chunked, "
    "with the row filter CYCLING through all five spec types "
    "(None/Sub/Up/Average/Paeth) so the decoder cannot pass without the "
    "complete filter reconstruction — then decode_png inflates and "
    "unfilters the actual bytes and the spec emits whole-image pixel "
    "aggregates. The oracle evaluates the gradient law in closed form "
    "(pixel_sum = 3whb + 3h*w(w-1)/2 + 3w*h(h-1) + 3wh; corner pixels "
    "exact), never touching a byte: any inflate/unfilter/stride bug "
    "changes pixel_sum and fails the hash. This upgrades the r05 "
    "'compressed formats are a NotImplementedError seam' note: PNG is "
    "now a real decode path (operators/multimodal.py:decode_png), "
    "integrated into decode_image's dispatch so decode_media/"
    "extract_features/resize_media accept PNG payloads too; JPEG/MP3/MP4 "
    "(lossy, codec-library territory) remain the documented PIL/pyav "
    "seam. mapInPandas end-to-end, zero shuffles.",
    tags=("multimodal", "decode", "mapInPandas", "llm"),
)
def q113(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import decode_image, encode_png

    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id")
        .filter(F.col("doc_id") < N_SEEDS)
    )

    def gen_and_decode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w = 16 + (i % 7) * 4
                h = 12 + (i % 5) * 4
                base = i % 100
                px = (
                    base
                    + np.arange(w)[None, :, None]
                    + 2 * np.arange(h)[:, None, None]
                    + np.arange(3)[None, None, :]
                ).astype(np.uint8)
                payload = encode_png(px)
                dec = decode_image(payload).astype(np.int64)
                rows.append(
                    (
                        i,
                        dec.shape[1],
                        dec.shape[0],
                        dec.shape[0] * dec.shape[1],
                        int(dec.sum()),
                        int(dec[0, 0, 0]),
                        int(dec[-1, -1, -1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_pixels",
                    "pixel_sum",
                    "first_px",
                    "last_px",
                ],
            )

    return docs.mapInPandas(
        gen_and_decode,
        "media_id long, width int, height int, n_pixels long, "
        "pixel_sum long, first_px long, last_px long",
    )


# ---------------------------------------------------------------------------
# q114 — REAL compressed-audio decode (IMA ADPCM, wFormatTag 0x11)
# ---------------------------------------------------------------------------
@MD.add(
    "q114_adpcm_decode",
    oracle="""
WITH law AS (
  SELECT doc_id, 600 + (doc_id % 10) * 120 AS n FROM documents
  WHERE doc_id < 60
)
SELECT doc_id AS media_id,
       n::BIGINT AS n_samples,
       8000 AS sample_rate,
       ((n + 504) // 505)::BIGINT AS n_blocks,
       (12 + 8 + 20 + 8 + 4 + 8 + ((n + 504) // 505) * 256)::BIGINT
         AS payload_bytes,
       TRUE AS err_within_bound
FROM law
""",
    doc="REAL compressed-audio decode, driver-checked: deterministic "
    "triangle waveforms (amplitude/period from the seed law, slew-rate "
    "bounded so the codec tracks them) are encoded in-plan to genuine "
    "IMA-ADPCM WAV (wFormatTag 0x11: 256-byte blocks, 4-bit codes, fact "
    "chunk) and decoded back through the full integer reconstruction "
    "(operators/multimodal.py:decode_adpcm_wav — shared step kernel with "
    "the encoder's predictor loop, per the IMA spec). ADPCM is LOSSY, so "
    "unlike q113's PNG the oracle cannot closed-form the samples; what "
    "it CAN price exactly is the container — 4:1 fixed-rate compression "
    "makes payload_bytes and block count closed forms of n_samples "
    "(DEFLATE has no such form) — plus the decode-quality contract "
    "err_within_bound = max|decoded - law| <= 256 (empirical worst over "
    "the seed grid: 166; decode is integer-deterministic so the flag is "
    "stable). A nibble-order, step-table, or index-clamp bug either "
    "breaks the error bound or the trimmed sample count. JPEG/MP3/MP4 "
    "remain the documented lossy-codec-library seam. mapInPandas, zero "
    "shuffles.",
    tags=("multimodal", "decode", "mapInPandas", "llm"),
)
def q114(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import (
        ADPCM_BLOCK_ALIGN,
        ADPCM_SAMPLES_PER_BLOCK,
        decode_adpcm_wav,
        encode_adpcm_wav,
    )

    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id")
        .filter(F.col("doc_id") < N_SEEDS)
    )

    def gen_and_decode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                n = 600 + (i % 10) * 120
                amp = 2000 + (i % 10) * 500
                period = 200 + (i % 5) * 40
                t = np.arange(n)
                s = (
                    (amp * (4 * np.abs((t % period) / period - 0.5) - 1))
                    .astype(np.int64)
                    .clip(-32768, 32767)
                )
                payload = encode_adpcm_wav(s, 8000)
                rate, back = decode_adpcm_wav(payload)
                err = int(np.abs(back.astype(np.int64) - s).max())
                n_blocks = -(-n // ADPCM_SAMPLES_PER_BLOCK)
                rows.append(
                    (
                        i,
                        len(back),
                        rate,
                        n_blocks,
                        len(payload),
                        bool(err <= 256),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_samples",
                    "sample_rate",
                    "n_blocks",
                    "payload_bytes",
                    "err_within_bound",
                ],
            )

    return docs.mapInPandas(
        gen_and_decode,
        "media_id long, n_samples long, sample_rate int, n_blocks long, "
        "payload_bytes long, err_within_bound boolean",
    )


# ---------------------------------------------------------------------------
# q127 — REAL compressed-format decode (GIF: LZW + palette mapping)
# ---------------------------------------------------------------------------
@MD.add(
    "q127_gif_decode",
    oracle="""
WITH law AS (
  SELECT doc_id,
         20 + (doc_id % 6) * 8 AS w,
         16 + (doc_id % 4) * 8 AS h,
         doc_id % 200 AS base
  FROM documents WHERE doc_id < 60
),
px AS (
  SELECT doc_id, w, h, base, ((base + x + 2 * y) % 256) AS v
  FROM law
  CROSS JOIN unnest(generate_series(0, w - 1)) AS ux(x)
  CROSS JOIN unnest(generate_series(0, h - 1)) AS uy(y)
)
SELECT doc_id AS media_id,
       min(w) AS width,
       min(h) AS height,
       (min(w) * min(h))::BIGINT AS n_pixels,
       (3 * sum(v))::BIGINT AS pixel_sum,
       (min(base) % 256)::BIGINT AS first_px,
       ((min(base) + (min(w) - 1) + 2 * (min(h) - 1)) % 256)::BIGINT
         AS last_px
FROM px
GROUP BY doc_id
""",
    doc="REAL LZW-compressed image decode, driver-checked: wrapped "
    "gradient index images (idx(y,x) = (base + x + 2y) mod 256 — the "
    "wrap keeps repeated byte sequences flowing so the LZW dictionary "
    "genuinely builds multi-symbol entries) are encoded in-plan to "
    "genuine GIF89a — 256-entry palette, variable-width 9->12-bit LZW "
    "with clear-code resets and sub-block framing "
    "(operators/multimodal.py:encode_gif) — then decode_gif runs the "
    "full dictionary-rebuild decompression (KwKwK case, width-growth "
    "clock, palette mapping) on the actual bytes and the spec emits "
    "whole-image aggregates. The oracle re-evaluates the seed law by "
    "direct summation over a generated (x, y) grid, never touching a "
    "byte: any bit-packing, dictionary, or width-clock bug changes "
    "pixel_sum and fails the hash. Second REAL compressed format after "
    "q113's PNG/DEFLATE (dictionary coding vs entropy coding+filters); "
    "GIF payloads also dispatch through decode_image, so decode_media/"
    "extract_features/resize_media accept them. mapInPandas end-to-end, "
    "zero shuffles.",
    tags=("multimodal", "decode", "mapInPandas", "llm"),
)
def q127(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    from ..operators.multimodal import decode_image, encode_gif

    docs = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id")
        .filter(F.col("doc_id") < N_SEEDS)
    )

    def gen_and_decode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w = 20 + (i % 6) * 8
                h = 16 + (i % 4) * 8
                base = i % 200
                idx = (
                    (base + np.arange(w)[None, :] + 2 * np.arange(h)[:, None])
                    % 256
                ).astype(np.uint8)
                payload = encode_gif(idx)
                dec = decode_image(payload).astype(np.int64)
                rows.append(
                    (
                        i,
                        dec.shape[1],
                        dec.shape[0],
                        dec.shape[0] * dec.shape[1],
                        int(dec.sum()),
                        int(dec[0, 0, 0]),
                        int(dec[-1, -1, -1]),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_pixels",
                    "pixel_sum",
                    "first_px",
                    "last_px",
                ],
            )

    return docs.mapInPandas(
        gen_and_decode,
        "media_id long, width int, height int, n_pixels long, "
        "pixel_sum long, first_px long, last_px long",
    )
