"""Tests for the multimodal plumbing and the remaining UDF-tier surfaces
(applyInPandas grouped dedup, UDTF chunker). The real=True decode path is
exercised end-to-end on pure-numpy-parsed PPM/BMP fixtures; the
deterministic-fake path pins the schema, batch shape, fan-out, and
feature contract; unknown formats on the real path raise the documented
NotImplementedError (the PIL/pyav seam)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from etl_dag_paris_velib_spark.functions.udfs import make_chunk_udtf
from etl_dag_paris_velib_spark.operators.dedup import keep_first, keep_first_grouped
from etl_dag_paris_velib_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    extract_features,
    sample_frames,
)
from etl_dag_paris_velib_spark.operators.similarity import brute_force_topk
from etl_dag_paris_velib_spark.operators.textstats import chunk_documents


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (i, ["image", "audio", "video"][i % 3], bytes([i % 251]) * (100 + i), "x/y", "s")
        for i in range(30)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_schema_and_determinism(spark, media):
    out = decode_media(media)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 30
    again = {r.media_id: r for r in decode_media(media).collect()}
    assert rows == again  # deterministic fake
    r0 = rows[0]
    assert r0.payload_bytes == 100
    assert 64 <= r0.width < 256 and 64 <= r0.height < 256


def test_decode_media_real_path_rejects_unknown_formats(spark, media):
    """Real decode handles PPM/BMP; anything else hits the documented
    PIL/pyav seam."""
    import py4j.protocol
    from pyspark.errors import PythonException

    with pytest.raises((PythonException, py4j.protocol.Py4JJavaError)) as e:
        decode_media(media, real=True).collect()
    assert "NotImplementedError" in str(e.value)


def _ppm_bytes(w, h, rgb):
    header = f"P6\n# synthetic fixture\n{w} {h}\n255\n".encode()
    return header + bytes(rgb) * (w * h)


def _bmp_bytes(w, h, pixel_rows):
    """Minimal 24-bit BI_RGB BMP, bottom-up, rows padded to 4 bytes.
    pixel_rows is top-down [[(r,g,b), ...], ...]."""
    stride = (w * 3 + 3) & ~3
    body = b""
    for row in reversed(pixel_rows):  # bottom-up storage
        line = b"".join(bytes((b, g, r)) for (r, g, b) in row)
        body += line + b"\x00" * (stride - len(line))
    offset = 14 + 40
    size = offset + len(body)
    file_header = b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00" + offset.to_bytes(4, "little")
    info = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return file_header + info + body


def test_real_decode_ppm_bmp_end_to_end(spark):
    """decode_media(real=True) / extract_features(real=True) on actual
    pure-numpy-parsed pixels: a 9x5 solid PPM and a 3x2 patterned BMP
    (odd width forces row padding; bottom-up storage forces the flip)."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.multimodal import (
        decode_image,
        image_features,
    )

    ppm = _ppm_bytes(9, 5, (10, 20, 30))
    bmp_rows = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
                [(1, 2, 3), (4, 5, 6), (7, 8, 9)]]
    bmp = _bmp_bytes(3, 2, bmp_rows)

    # kernel level: exact pixels
    px_ppm = decode_image(ppm)
    assert px_ppm.shape == (5, 9, 3)
    assert (px_ppm == np.array([10, 20, 30], dtype=np.uint8)).all()
    px_bmp = decode_image(bmp)
    assert px_bmp.shape == (2, 3, 3)
    assert px_bmp.tolist() == [[list(p) for p in r] for r in bmp_rows]

    # Spark level: identical mapInPandas plumbing as the fake path
    media = spark.createDataFrame(
        [(1, "image", ppm, "image/x-ppm", "s"), (2, "image", bmp, "image/bmp", "s")],
        MEDIA_SCHEMA,
    )
    meta = {r.media_id: r for r in decode_media(media, real=True).collect()}
    assert (meta[1].width, meta[1].height, meta[1].n_frames) == (9, 5, 1)
    assert (meta[2].width, meta[2].height) == (3, 2)

    feats = {r.media_id: r.features for r in extract_features(media, real=True).collect()}
    assert len(feats[1]) == 16
    # solid color: exact channel means, zero variance, zero gradient
    assert feats[1][0] == pytest.approx(10 / 255)
    assert feats[1][1] == pytest.approx(20 / 255)
    assert feats[1][2] == pytest.approx(30 / 255)
    assert feats[1][3] == pytest.approx(0.0, abs=1e-12)
    assert feats[1][15] == pytest.approx(0.0, abs=1e-12)
    assert feats[1] == image_features(px_ppm)


def test_extract_features_feed_similarity(spark, media):
    feats = extract_features(media)
    first = feats.first()
    assert len(first.features) == 16
    # the feature column plugs straight into the vector-search operators
    qs = (
        feats.filter(F.col("media_id") < 2)
        .selectExpr(
            "media_id as q_id",
            "cast(features as array<double>) as qv",
            "sqrt(aggregate(features, cast(0.0 as double), (a, x) -> a + x*x)) as nq",
        )
    )
    top = brute_force_topk(feats, qs, k=3, id_col="media_id", vec_col="features")
    assert top.groupBy("q_id").count().filter("count != 3").count() == 0


def test_sample_frames_fanout(spark, media):
    frames = sample_frames(media, every_nth=8)
    rows = frames.collect()
    assert rows, "video rows must fan out to frames"
    # only video rows fan out; every fingerprint deterministic + distinct per idx
    vid_ids = {r.media_id for r in rows}
    kinds = {r.media_id: r.kind for r in media.select("media_id", "kind").collect()}
    assert all(kinds[m] == "video" for m in vid_ids)
    assert len({(r.media_id, r.frame_idx) for r in rows}) == len(rows)


def test_keep_first_grouped_matches_window_variant(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = docs.select("doc_id", "lang", "source")
    a = {tuple(r) for r in keep_first(df, ["lang"], ["doc_id"]).collect()}
    b = {tuple(r) for r in keep_first_grouped(df, ["lang"], ["doc_id"]).collect()}
    assert a == b


def test_chunk_udtf_matches_jvm_chunker(spark):
    from etl_dag_paris_velib_spark.operators.textstats import chunk_documents_expr

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(25)
    jvm = {
        (r.doc_id, r.chunk_idx): r.chunk_hash
        for r in chunk_documents(docs).collect()
    }
    # the pure-expression reference formulation agrees with the Arrow path
    expr = {
        (r.doc_id, r.chunk_idx): r.chunk_hash
        for r in chunk_documents_expr(docs).collect()
    }
    assert expr == jvm
    chunker = make_chunk_udtf(chunk_tokens=50, overlap=10)
    spark.udtf.register("chunk_text", chunker)
    docs.createOrReplaceTempView("chunk_in")
    got = spark.sql(
        "SELECT c.doc_id, c.chunk_idx, c.chunk_text "
        "FROM chunk_in, LATERAL chunk_text(doc_id, text) c"
    ).collect()
    udtf_hashes = {
        (r.doc_id, r.chunk_idx): hashlib.md5(r.chunk_text.encode()).hexdigest()
        for r in got
    }
    assert udtf_hashes == jvm


def test_resize_media_round_trips_through_decode(spark):
    """resize -> re-encode must produce payloads decode_image can read
    back at the target resolution, with pixel values drawn from the
    source (nearest-neighbor: no new colors invented)."""
    from etl_dag_paris_velib_spark.operators.multimodal import (
        decode_image,
        resize_media,
    )

    ppm = _ppm_bytes(9, 5, (10, 20, 30))
    bmp = _bmp_bytes(3, 2, [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
                            [(1, 2, 3), (4, 5, 6), (7, 8, 9)]])
    df = spark.createDataFrame(
        [(1, "image", ppm), (2, "image", bmp)],
        "media_id long, kind string, payload binary",
    )
    out = {r.media_id: r for r in resize_media(df, out_h=4, out_w=4).collect()}
    assert set(out) == {1, 2}
    for mid, r in out.items():
        assert (r.width, r.height) == (4, 4)
        px = decode_image(bytes(r.payload))
        assert px.shape == (4, 4, 3)
    # uniform source stays uniform after resize
    px1 = decode_image(bytes(out[1].payload))
    import numpy as np

    assert (px1 == np.array([10, 20, 30], dtype=np.uint8)).all()
    # nearest-neighbor only copies existing pixels
    src_px = {tuple(p) for row in decode_image(bmp).tolist() for p in row}
    got_px = {tuple(p) for row in decode_image(bytes(out[2].payload)).tolist() for p in row}
    assert got_px <= src_px


def test_real_wav_decode_end_to_end(spark):
    """decode_media(real=True) / extract_features(real=True) on an actual
    pure-numpy-parsed PCM WAV: a 440 Hz stereo sine at 8 kHz. The decode
    must recover rate/channels/duration exactly and the features must
    match the kernel-level computation."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.multimodal import (
        audio_features,
        decode_wav,
        encode_wav,
    )

    rate, n = 8000, 8000  # 1.0 s
    t = np.arange(n) / rate
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    wav = encode_wav(np.stack([left, 0.25 * left], axis=1), rate)

    got_rate, got_ch, samples = decode_wav(wav)
    assert (got_rate, got_ch) == (rate, 2)
    assert samples.shape == (n, 2)
    # 16-bit quantization: recovered within 1 LSB
    assert np.abs(samples[:, 0] - left).max() < 1.5 / 32768

    media = spark.createDataFrame(
        [(1, "audio", wav, "audio/wav", "s")], MEDIA_SCHEMA
    )
    meta = decode_media(media, real=True).collect()[0]
    assert (meta.sample_rate, meta.n_channels) == (rate, 2)
    assert meta.n_frames == n
    assert meta.duration_sec == pytest.approx(1.0)
    assert (meta.width, meta.height) == (0, 0)

    (feats,) = [r.features for r in extract_features(media, real=True).collect()]
    assert len(feats) == 16
    assert feats == audio_features(samples, rate)
    # sine RMS = amplitude/sqrt(2); mono mix amplitude = (0.5 + 0.125)/2
    assert feats[3] == pytest.approx(0.3125 / np.sqrt(2), rel=1e-3)
    # energy concentrated in the lowest spectral third at 440/4000 Hz
    assert feats[11] > 0.99


def test_wav_decode_rejects_non_pcm(spark):
    from etl_dag_paris_velib_spark.operators.multimodal import decode_wav

    with pytest.raises(NotImplementedError):
        decode_wav(b"RIFF\x00\x00\x00\x00AVI LIST")  # not WAVE
    # IEEE-float WAV (format tag 3) is the documented seam
    import numpy as np

    from etl_dag_paris_velib_spark.operators.multimodal import encode_wav

    wav = bytearray(encode_wav(np.zeros((4, 1)), 8000))
    wav[20:22] = (3).to_bytes(2, "little")  # fmt tag -> IEEE float
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(wav))


def test_real_video_frame_sampling(spark):
    """sample_frames(real=True) over an actual PPMV container: every 2nd
    decoded frame fingerprinted by pixel content — identical frames in
    different videos collide (the frame-dedup property), distinct frames
    don't."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.multimodal import (
        decode_ppmv,
        encode_ppmv,
        sample_frames,
    )

    def frame(v):
        return np.full((4, 6, 3), v, dtype=np.uint8)

    vid_a = encode_ppmv([frame(i * 10) for i in range(6)], fps=12.0)
    vid_b = encode_ppmv([frame(0), frame(99)], fps=12.0)  # shares frame 0 pixels
    fps, frames = decode_ppmv(vid_a)
    assert fps == 12.0 and len(frames) == 6
    assert (frames[3] == 30).all()

    media = spark.createDataFrame(
        [(1, "video", vid_a, "video/x-ppmv", "s"), (2, "video", vid_b, "video/x-ppmv", "s")],
        MEDIA_SCHEMA,
    )
    out = sample_frames(media, every_nth=2, real=True).collect()
    by_vid = {}
    for r in out:
        by_vid.setdefault(r.media_id, {})[r.frame_idx] = r.frame_fingerprint
    assert sorted(by_vid[1]) == [0, 2, 4]
    assert sorted(by_vid[2]) == [0]
    # pixel-content fingerprints: shared frame collides, others distinct
    assert by_vid[1][0] == by_vid[2][0]
    assert len({*by_vid[1].values()}) == 3

    meta = {r.media_id: r for r in decode_media(media, real=True).collect()}
    assert (meta[1].width, meta[1].height, meta[1].n_frames) == (6, 4, 6)
    assert meta[1].duration_sec == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# PNG encode/decode (the compressed-format path, r06)
# ---------------------------------------------------------------------------

def test_png_roundtrip_exercises_all_five_filters():
    """encode_png cycles row filters None/Sub/Up/Average/Paeth (row % 5);
    any image taller than 4 rows therefore cannot round-trip unless the
    decoder reconstructs every filter type correctly."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (2, 3), (6, 5), (13, 29), (28, 44)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        payload = encode_png(px)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        back = decode_png(payload)
        assert back.dtype == np.uint8 and np.array_equal(back, px)
        # integrated into the generic image dispatch
        assert np.array_equal(decode_image(payload), px)


def test_png_rejects_corruption_and_foreign_profiles():
    import numpy as np
    import pytest

    from etl_dag_paris_velib_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    payload = bytearray(encode_png(px))
    # flip one IDAT byte: the chunk CRC must catch it
    payload[50] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(payload))
    with pytest.raises(NotImplementedError):
        decode_png(b"not a png at all")


def test_resize_accepts_png_payloads(spark):
    """resize_media decodes via the shared dispatch, so a PNG column
    resizes like PPM/BMP — the compose-with-decode contract."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.multimodal import (
        decode_image,
        encode_png,
        resize_media,
    )

    px = (np.arange(12 * 16 * 3) % 256).reshape(12, 16, 3).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, "image", bytearray(encode_png(px)))],
        "media_id long, kind string, payload binary",
    )
    out = resize_media(df, 6, 8).collect()
    assert out[0]["width"] == 8 and out[0]["height"] == 6
    resized = decode_image(bytes(out[0]["payload"]))
    assert resized.shape == (6, 8, 3)


def test_adpcm_roundtrip_and_container():
    """IMA ADPCM: exact container math (fixed 4:1 rate — payload size is
    a closed form of n), fact-chunk trimming to the true sample count,
    and tracking error bounded on slew-limited signals. Also pins the
    spec's profile seam: stereo/PCM payloads are not silently
    mis-decoded."""
    import numpy as np
    import pytest

    from etl_dag_paris_velib_spark.operators.multimodal import (
        ADPCM_BLOCK_ALIGN,
        ADPCM_SAMPLES_PER_BLOCK,
        decode_adpcm_wav,
        decode_wav,
        encode_adpcm_wav,
        encode_wav,
    )

    for n in (1, 100, 505, 506, 1680):
        t = np.arange(n)
        s = (3000 * (4 * np.abs((t % 200) / 200 - 0.5) - 1)).astype(np.int64)
        payload = encode_adpcm_wav(s, 8000)
        blocks = -(-n // ADPCM_SAMPLES_PER_BLOCK)
        assert len(payload) == 12 + 8 + 20 + 8 + 4 + 8 + blocks * ADPCM_BLOCK_ALIGN
        rate, back = decode_adpcm_wav(payload)
        assert rate == 8000 and len(back) == n
        assert int(np.abs(back.astype(np.int64) - s).max()) <= 256
    # a plain PCM WAV is not an ADPCM payload (and vice versa): the PCM
    # decoder rejects the 0x11 format tag, the ADPCM decoder rejects PCM
    pcm = encode_wav(np.full((16, 1), 0.25), 8000)
    with pytest.raises(NotImplementedError):
        decode_adpcm_wav(pcm)
    with pytest.raises(NotImplementedError):
        decode_wav(encode_adpcm_wav(np.zeros(16, dtype=np.int64), 8000))


# ---------------------------------------------------------------------------
# GIF encode/decode (the LZW dictionary-coding path, r06)
# ---------------------------------------------------------------------------

def test_gif_roundtrip_exercises_lzw_regimes():
    """Exact round-trip across the regimes that break naive LZW
    implementations: pure noise (dictionary grows fastest, width climbs
    9->10->...), constant runs (long matches + the KwKwK code==next
    case), short-period tiles (repeated dictionary hits), and an image
    large enough to fill the 4096-entry table and force a mid-stream
    clear-code reset."""
    import numpy as np

    from etl_dag_paris_velib_spark.operators.multimodal import (
        decode_gif,
        decode_image,
        encode_gif,
    )

    rng = np.random.RandomState(11)
    cases = [
        rng.randint(0, 256, size=(23, 31)),
        np.zeros((17, 9)),
        np.tile(rng.randint(0, 4, size=(1, 13)), (19, 1)),
        ((np.arange(16)[:, None] * 2 + np.arange(33)[None, :]) % 256),
        np.array([[5]]),
        rng.randint(0, 256, size=(150, 150)),  # > 4096 dict entries: reset
    ]
    for idx in cases:
        idx = idx.astype(np.uint8)
        payload = encode_gif(idx)
        assert payload[:6] == b"GIF89a" and payload[-1:] == b"\x3b"
        back = decode_gif(payload)
        expected = np.stack([idx, idx, idx], axis=-1)
        assert back.dtype == np.uint8 and np.array_equal(back, expected)
        # integrated into the generic image dispatch
        assert np.array_equal(decode_image(payload), expected)


def test_gif_rejects_foreign_profiles():
    import numpy as np
    import pytest

    from etl_dag_paris_velib_spark.operators.multimodal import (
        decode_gif,
        encode_gif,
    )

    with pytest.raises(NotImplementedError):
        decode_gif(b"not a gif")
    # interlace flag set on a real payload: the documented PIL seam
    payload = bytearray(encode_gif(np.zeros((4, 4), np.uint8)))
    # image descriptor sits right after header(6)+LSD(7)+GCT(768)
    desc = 6 + 7 + 768
    assert payload[desc] == 0x2C
    payload[desc + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif(bytes(payload))
