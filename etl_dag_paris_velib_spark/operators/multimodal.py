"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (SURVEY §2.10 north star; no reference counterpart).

The container has no decode libraries (PIL/ffmpeg/torchaudio), but the
``real=True`` path IS real for the uncompressed formats a no-dependency
environment can honestly parse: a pure-numpy PPM (P6) / BMP (24-bit
BI_RGB) parser decodes actual pixels, and a pure-numpy RIFF/WAVE parser
decodes actual 8/16-bit PCM audio — both feeding the metadata kernel and
the feature extractor (per-channel statistics + quadrant lumas for
images; RMS/ZCR/envelope/spectral bands for audio — deterministic,
model-free, same FEATURE_DIM width). Video gets a real path through the
module's own PPMV container (length-prefixed uncompressed PPM frames):
frame sampling decodes and fingerprints actual pixels. COMPRESSED
formats raise a clearly-marked
``NotImplementedError`` (wire PIL/pyav there on a real cluster); the
deterministic fake (md5-derived pseudo-metadata / pseudo-features)
remains for tests that only pin the plumbing. Everything AROUND the
kernel — schema convention, ``mapInPandas`` batch shape, Arrow batch
sizing, the fan-out UDTF-style frame sampler, and the feature-column
contract the similarity operators consume — is identical on both paths.

Scale design for 100 TB of media:
- payloads stay in binary columns co-located with metadata — one scan, no
  side-channel fetch per row; Parquet stores them as byte arrays with
  column-level compression;
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds decode-batch
  memory (payload_bytes x batch_rows is the working set, not partition
  size);
- decode is a row-local map — zero shuffles; the expensive part
  parallelizes embarrassingly, so partition count = throughput knob;
- frame sampling fans 1 video row out to N frame rows *inside* the Arrow
  batch (no explode shuffle).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Schema convention for a media table — the multimodal analogue of
#: ``documents``: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("source", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("duration_sec", DoubleType()),
        StructField("payload_bytes", LongType()),
        # audio-only fields (0 for stills/video): PCM sample rate and
        # channel count from the WAV fmt chunk
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_fingerprint", StringType()),
    ]
)

FEATURE_DIM = 16


def decode_image(payload: bytes) -> "np.ndarray":
    """Pure-numpy raster decode -> (H, W, 3) uint8 RGB array.

    Supports the two headerable uncompressed formats a no-dependency
    environment can honestly parse:

    - **PPM (P6)**: ASCII header ``P6 <w> <h> <maxval>`` (``#`` comments
      allowed) followed by raw RGB rows, top-down.
    - **BMP**: BITMAPINFOHEADER, 24 bits per pixel, BI_RGB (uncompressed)
      only; rows are 4-byte aligned, stored bottom-up, channels BGR.

    Anything else raises ``NotImplementedError`` — that is the seam where
    PIL/pyav plug in on a real cluster.
    """
    if payload[:2] == b"P6":
        # tokenize the ASCII header: whitespace-separated fields, '#'
        # starts a comment running to end-of-line
        pos = 2
        fields: list[int] = []
        while len(fields) < 3:
            while pos < len(payload) and payload[pos : pos + 1].isspace():
                pos += 1
            if payload[pos : pos + 1] == b"#":
                while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                    pos += 1
                continue
            start = pos
            while pos < len(payload) and not payload[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(payload[start:pos]))
        pos += 1  # single whitespace byte after maxval, then raw data
        w, h, maxval = fields
        if maxval != 255:
            raise NotImplementedError("PPM maxval != 255 not supported")
        data = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
        return data.reshape(h, w, 3).copy()
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:2] == b"BM":
        offset = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0:
            raise NotImplementedError("only 24-bit uncompressed BI_RGB BMP")
        top_down = h < 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
        rows = np.frombuffer(
            payload, dtype=np.uint8, count=stride * h, offset=offset
        ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if not top_down:
            rows = rows[::-1]
        return rows[..., ::-1].copy()  # BGR -> RGB
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    raise NotImplementedError(
        "real decode implemented for PPM(P6)/BMP(24-bit)/PNG(8-bit RGB)/"
        "GIF(non-interlaced) only; other formats need PIL/pyav "
        "(deliberate seam — see module docstring)"
    )


PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        len(body).to_bytes(4, "big")
        + tag
        + body
        + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(pixels: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 -> real PNG bytes (8-bit RGB, color type 2, no
    interlace) using only stdlib zlib. The row filter CYCLES through all
    five spec filter types (None/Sub/Up/Average/Paeth, row % 5) so a
    decoder must implement the COMPLETE filter reconstruction to round-
    trip — a None-only encoder would let a decoder skip 4/5 of the spec
    and still pass."""
    import zlib

    px = pixels.astype(np.int64)
    h, w = px.shape[:2]
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int64)
    for y in range(h):
        row = px[y]
        f = y % 5
        left = np.zeros((w, 3), dtype=np.int64)
        left[1:] = row[:-1]
        ul = np.zeros((w, 3), dtype=np.int64)
        ul[1:] = prev[:-1]
        if f == 0:
            filt = row
        elif f == 1:
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            filt = row - (left + prev) // 2
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = row - pred
        raw.append(f)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, 2, 0, 0, 0])  # bit depth 8, RGB, deflate, adaptive, no interlace
    )
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> "np.ndarray":
    """Real PNG decode without PIL: chunk walk (CRC-verified), IDAT
    concat + zlib inflate, and the FULL per-row filter reconstruction
    (None/Sub/Up/Average/Paeth). Supports the 8-bit-RGB/no-interlace
    profile :func:`encode_png` writes — the profile check raises the
    usual ``NotImplementedError`` seam for anything else (palette,
    alpha, 16-bit, Adam7 need a full PIL)."""
    import zlib

    if payload[:8] != PNG_SIGNATURE:
        raise NotImplementedError("not a PNG payload")
    pos = 8
    w = h = None
    idat = bytearray()
    while pos < len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + ln]
        crc = int.from_bytes(payload[pos + 8 + ln : pos + 12 + ln], "big")
        if (zlib.crc32(tag + body) & 0xFFFFFFFF) != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w = int.from_bytes(body[0:4], "big")
            h = int.from_bytes(body[4:8], "big")
            depth, ctype, _comp, _filt, interlace = body[8:13]
            if (depth, ctype, interlace) != (8, 2, 0):
                raise NotImplementedError(
                    "PNG profile beyond 8-bit RGB non-interlaced needs PIL"
                )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, w, 3), dtype=np.int64)
    prev = np.zeros((w, 3), dtype=np.int64)
    for y in range(h):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).reshape(w, 3).astype(np.int64)
        if f == 0:
            rec = row
        elif f == 2:
            rec = (row + prev) % 256
        elif f in (1, 3, 4):
            # Sub/Average/Paeth predict from the RECONSTRUCTED left
            # neighbor — inherently sequential along the row
            rec = np.zeros((w, 3), dtype=np.int64)
            for x in range(w):
                left = rec[x - 1] if x else np.zeros(3, dtype=np.int64)
                up = prev[x]
                ul = prev[x - 1] if x else np.zeros(3, dtype=np.int64)
                if f == 1:
                    pred = left
                elif f == 3:
                    pred = (left + up) // 2
                else:
                    p = left + up - ul
                    pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, ul)
                    )
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"PNG row filter {f} out of spec")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8)


def _lzw_pack_codes(codes: "list[int]", min_code_size: int) -> bytes:
    """Pack LZW codes LSB-first with the GIF variable-width law: width
    starts at min_code_size+1 and grows when the encoder's next free
    code passes the current width's capacity (the same clock the
    decoder runs — see :func:`_lzw_decode`)."""
    out = bytearray()
    acc = 0
    nbits = 0
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    next_code = clear + 2  # == decoder table size after a clear
    fresh = True  # decoder adds NO entry on the first data code
    for code in codes:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
        if code == clear:
            width = min_code_size + 1
            next_code = clear + 2
            fresh = True
        elif code == eoi:
            pass
        elif fresh:
            fresh = False
        else:
            # decoder appends one entry per subsequent data code and
            # widens when its table hits the width's capacity — run the
            # identical clock so both sides switch on the same code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(pixels: "np.ndarray") -> bytes:
    """Real GIF89a encode without PIL: 256-entry grayscale global color
    table (palette[i] = (i, i, i)), one image block, and GENUINE LZW
    compression — dictionary build, variable code width 9→12, clear-code
    reset when the table fills, sub-block framing — so
    :func:`decode_gif` cannot pass without a complete LZW decompressor.
    Input is (H, W) uint8 palette indices or (H, W, 3) grayscale RGB
    (all channels equal; the palette reproduces them)."""
    if pixels.ndim == 3:
        idx = pixels[..., 0]
    else:
        idx = pixels
    h, w = idx.shape
    stream = idx.astype(np.uint8).reshape(-1).tobytes()

    min_code_size = 8
    clear, eoi = 256, 257
    dict_: dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    codes = [clear]
    wseq = stream[:1]
    for i in range(1, len(stream)):
        k = stream[i : i + 1]
        if wseq + k in dict_:
            wseq += k
            continue
        codes.append(dict_[wseq])
        dict_[wseq + k] = next_code
        next_code += 1
        wseq = k
        if next_code == 4096:  # table full: reset (decoder mirrors)
            codes.append(clear)
            dict_ = {bytes([j]): j for j in range(256)}
            next_code = 258
    codes.append(dict_[wseq])
    codes.append(eoi)
    packed = _lzw_pack_codes(codes, min_code_size)

    out = bytearray()
    out += b"GIF89a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0xF7, 0, 0])  # GCT present, 256 entries
    for i in range(256):  # grayscale palette
        out += bytes([i, i, i])
    out += b"\x2c" + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00"
    out.append(min_code_size)
    for off in range(0, len(packed), 255):
        block = packed[off : off + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    """GIF LZW decompression: LSB-first variable-width codes, dictionary
    rebuild (including the code==next 'KwKwK' case), clear/EOI handling,
    width growth when the table reaches the current capacity."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while len(out) < n_expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"LZW code {code} beyond table ({len(table)})")
        out += entry
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return bytes(out)


def decode_gif(payload: bytes) -> "np.ndarray":
    """Real GIF decode without PIL: header + logical-screen-descriptor
    parse, global color table, extension-block skip, sub-block
    reassembly, FULL LZW decompression (:func:`_lzw_decode`) and palette
    mapping -> (H, W, 3) uint8 RGB. Supports the non-interlaced
    single-image profile :func:`encode_gif` writes; interlace, local
    color tables and animation raise the usual ``NotImplementedError``
    PIL seam."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")
    pos = 6
    sw = int.from_bytes(payload[pos : pos + 2], "little")
    sh = int.from_bytes(payload[pos + 2 : pos + 4], "little")
    packed = payload[pos + 4]
    pos += 7
    gct: "np.ndarray | None" = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, np.uint8, count=n * 3, offset=pos).reshape(
            n, 3
        )
        pos += n * 3
    while pos < len(payload):
        b0 = payload[pos]
        pos += 1
        if b0 == 0x21:  # extension: label + sub-blocks, skip
            pos += 1
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b0 == 0x3B:  # trailer before any image
            raise ValueError("GIF contains no image block")
        if b0 != 0x2C:
            raise NotImplementedError(f"unsupported GIF block 0x{b0:02x}")
        w = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        h = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        ipacked = payload[pos + 8]
        pos += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF needs PIL")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            pal = np.frombuffer(
                payload, np.uint8, count=n * 3, offset=pos
            ).reshape(n, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF image with no color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while payload[pos] != 0:
            ln = payload[pos]
            data += payload[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        idx = np.frombuffer(
            _lzw_decode(bytes(data), min_code_size, w * h), np.uint8
        ).reshape(h, w)
        return pal[idx].astype(np.uint8)
    raise ValueError("GIF truncated before image block")


def encode_ppmv(frames: "list[np.ndarray]", fps: float = 24.0) -> bytes:
    """Trivial uncompressed video container (this module's own format,
    for exercising the REAL video path without ffmpeg): ``PPMV`` magic,
    frame count, fps (milli-fps int), then length-prefixed P6 PPM frames.
    Every frame round-trips through :func:`decode_image`."""
    out = [b"PPMV", len(frames).to_bytes(4, "big"), int(fps * 1000).to_bytes(4, "big")]
    for fr in frames:
        ppm = encode_ppm(fr)
        out.append(len(ppm).to_bytes(4, "big"))
        out.append(ppm)
    return b"".join(out)


def decode_ppmv(payload: bytes) -> tuple[float, "list[np.ndarray]"]:
    """(fps, frames) from a PPMV payload; anything else raises the
    documented ``NotImplementedError`` seam (real codecs need pyav)."""
    if payload[:4] != b"PPMV":
        raise NotImplementedError("not a PPMV payload (compressed video needs pyav)")
    n = int.from_bytes(payload[4:8], "big")
    fps = int.from_bytes(payload[8:12], "big") / 1000.0
    pos = 12
    frames = []
    for _ in range(n):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        frames.append(decode_image(payload[pos + 4 : pos + 4 + ln]))
        pos += 4 + ln
    return fps, frames


def decode_wav(payload: bytes) -> tuple[int, int, "np.ndarray"]:
    """Pure-numpy WAV (RIFF/WAVE PCM) decode -> (sample_rate, n_channels,
    float64 samples in [-1, 1] shaped (n_samples, n_channels)).

    Parses the RIFF chunk list: ``fmt `` must declare PCM (format tag 1)
    at 8 or 16 bits — the uncompressed cases a no-dependency environment
    can honestly decode; anything else (IEEE float, ADPCM, extensible)
    raises ``NotImplementedError`` (the torchaudio/ffmpeg seam)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    n_ch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if tag != 1 or bits not in (8, 16) or n_ch < 1 or rate <= 0:
        raise NotImplementedError("only 8/16-bit integer PCM WAV supported")
    if bits == 16:
        raw = np.frombuffer(data, dtype="<i2", count=len(data) // 2)
        samples = raw.astype(np.float64) / 32768.0
    else:
        raw = np.frombuffer(data, dtype=np.uint8)
        samples = (raw.astype(np.float64) - 128.0) / 128.0
    n = len(samples) // n_ch
    return rate, n_ch, samples[: n * n_ch].reshape(n, n_ch)


#: IMA ADPCM step-size table (89 entries) and index-adjust table — the
#: values fixed by the IMA/DVI specification; both encoder and decoder
#: walk them with pure integer arithmetic, so decode is bit-deterministic.
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]

ADPCM_BLOCK_ALIGN = 256  # mono block: 4-byte header + 252 data bytes
ADPCM_SAMPLES_PER_BLOCK = (ADPCM_BLOCK_ALIGN - 4) * 2 + 1  # 505


def _ima_step(sample: int, pred: int, index: int) -> tuple[int, int, int]:
    """One IMA ADPCM encode step: quantize (sample - pred) to a 4-bit
    code, return (code, new_pred, new_index). Integer-exact per spec."""
    step = _IMA_STEPS[index]
    diff = sample - pred
    code = 0
    if diff < 0:
        code = 8
        diff = -diff
    if diff >= step:
        code |= 4
        diff -= step
    if diff >= step >> 1:
        code |= 2
        diff -= step >> 1
    if diff >= step >> 2:
        code |= 1
    pred = _ima_decode_step(code, pred, index)[0]
    index = min(88, max(0, index + _IMA_INDEX_ADJ[code & 7]))
    return code, pred, index


def _ima_decode_step(code: int, pred: int, index: int) -> tuple[int, int]:
    """Reconstruct one sample from a 4-bit code (shared by encoder's
    predictor loop and the decoder, so they cannot drift)."""
    step = _IMA_STEPS[index]
    delta = step >> 3
    if code & 1:
        delta += step >> 2
    if code & 2:
        delta += step >> 1
    if code & 4:
        delta += step
    if code & 8:
        delta = -delta
    return max(-32768, min(32767, pred + delta)), index


def encode_adpcm_wav(samples: "np.ndarray", rate: int) -> bytes:
    """Mono int16 PCM -> a REAL IMA-ADPCM WAV (wFormatTag 0x11): fmt
    chunk with the samples-per-block extension, a fact chunk carrying the
    true sample count, and standard 256-byte blocks (4-byte header =
    seed sample + step index, then 252 bytes of 4-bit codes, low nibble
    first). 4:1 fixed-rate compression — unlike DEFLATE the payload size
    is a CLOSED FORM of n_samples, which is what lets q114's oracle
    price the container without running the codec."""
    import struct

    s = np.asarray(samples, dtype=np.int64)
    n = len(s)
    spb = ADPCM_SAMPLES_PER_BLOCK
    n_blocks = max(1, -(-n // spb))
    data = bytearray()
    index = 0
    for b in range(n_blocks):
        chunk = s[b * spb : (b + 1) * spb]
        if len(chunk) < spb:  # pad the tail block by repeating the last value
            pad = np.full(spb - len(chunk), chunk[-1] if len(chunk) else 0)
            chunk = np.concatenate([chunk, pad])
        pred = int(chunk[0])
        data += struct.pack("<hBB", pred, index, 0)
        codes = []
        for x in chunk[1:]:
            code, pred, index = _ima_step(int(x), pred, index)
            codes.append(code)
        for lo, hi in zip(codes[0::2], codes[1::2]):
            data.append(lo | (hi << 4))
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, rate, rate * ADPCM_BLOCK_ALIGN // spb,
        ADPCM_BLOCK_ALIGN, 4, 2, spb,
    )
    fact = struct.pack("<I", n)
    riff_body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<I", len(fact)) + fact
        + b"data" + struct.pack("<I", len(data)) + bytes(data)
    )
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_adpcm_wav(payload: bytes) -> tuple[int, "np.ndarray"]:
    """Real IMA ADPCM decode (mono): chunk walk, block-header seed +
    nibble stream reconstruction via the shared :func:`_ima_decode_step`,
    trimmed to the fact chunk's sample count. Returns (rate, int16
    samples). Non-IMA compressed WAVs raise the usual seam."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    pos = 12
    fmt = fact_n = data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        ln = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + ln]
        if tag == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16]) + (
                struct.unpack("<H", body[18:20])[0] if ln >= 20 else None,
            )
        elif tag == b"fact":
            fact_n = struct.unpack("<I", body[:4])[0]
        elif tag == b"data":
            data = body
        pos += 8 + ln + (ln & 1)
    if fmt is None or data is None:
        raise NotImplementedError("WAV missing fmt/data chunk")
    tag_, ch, rate, _br, block_align, bits, spb = fmt
    if tag_ != 0x11 or ch != 1 or bits != 4:
        raise NotImplementedError("only mono 4-bit IMA ADPCM (0x11) supported")
    out: list[int] = []
    for off in range(0, len(data), block_align):
        block = data[off : off + block_align]
        pred = struct.unpack("<h", block[0:2])[0]
        index = block[2]
        out.append(pred)
        for byte in block[4:]:
            for code in (byte & 0xF, byte >> 4):
                pred, _ = _ima_decode_step(code, pred, index)
                index = min(88, max(0, index + _IMA_INDEX_ADJ[code & 7]))
                out.append(pred)
    samples = np.array(out, dtype=np.int16)
    if fact_n is not None:
        samples = samples[:fact_n]
    return rate, samples


def encode_wav(samples: "np.ndarray", rate: int) -> bytes:
    """(n_samples, n_channels) float in [-1, 1] -> 16-bit PCM WAV bytes
    (inverse of :func:`decode_wav`, so generated fixtures round-trip)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    # round (not truncate) at the decoder's own 1/32768 scale so the
    # round-trip error is bounded by half an LSB (full LSB at +1.0 clip)
    pcm = np.clip(np.round(samples * 32768.0), -32768, 32767).astype("<i2").tobytes()
    fmt = (
        (1).to_bytes(2, "little")
        + ch.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * ch * 2).to_bytes(4, "little")
        + (ch * 2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(pcm).to_bytes(4, "little") + pcm
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def audio_features(samples: "np.ndarray", rate: int) -> list[float]:
    """(n_samples, n_channels) float audio -> FEATURE_DIM deterministic
    floats: duration, RMS/peak/crest, zero-crossing rate, 4-segment RMS
    envelope, and low/mid/high spectral-band energy fractions — the
    model-free analogue of :func:`image_features`, same width so both
    modalities feed the same downstream similarity operators."""
    mono = samples.mean(axis=1)
    n = len(mono)
    if n == 0:
        return [0.0] * FEATURE_DIM
    rms = float(np.sqrt((mono**2).mean()))
    peak = float(np.abs(mono).max())
    zcr = float((np.diff(np.signbit(mono)) != 0).mean()) if n > 1 else 0.0
    seg = [float(np.sqrt((s**2).mean())) if len(s) else 0.0 for s in np.array_split(mono, 4)]
    spec = np.abs(np.fft.rfft(mono)) ** 2
    tot = float(spec.sum()) or 1.0
    k = len(spec)
    bands = [float(b.sum()) / tot for b in np.array_split(spec, 3)] if k >= 3 else [1.0, 0.0, 0.0]
    out = [
        n / rate,
        rate / 48000.0,
        float(samples.shape[1]),
        rms,
        peak,
        peak / rms if rms > 0 else 0.0,
        zcr,
        *seg,
        *bands,
        float(mono.mean()),
        float(mono.std()),
    ]
    assert len(out) == FEATURE_DIM
    return out


def image_features(pixels: "np.ndarray") -> list[float]:
    """(H, W, 3) uint8 -> FEATURE_DIM deterministic floats: per-channel
    mean/std, quadrant luma means, global luma mean/std, shape terms, and
    a horizontal-gradient energy — a model-free feature vector that still
    separates real images (solid vs gradient vs noise) for the similarity
    operators downstream."""
    px = pixels.astype(np.float64) / 255.0
    luma = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
    h, w = luma.shape
    quad = [
        float(luma[: h // 2 or 1, : w // 2 or 1].mean()),
        float(luma[: h // 2 or 1, w // 2 :].mean()) if w > 1 else 0.0,
        float(luma[h // 2 :, : w // 2 or 1].mean()) if h > 1 else 0.0,
        float(luma[h // 2 :, w // 2 :].mean()) if h > 1 and w > 1 else 0.0,
    ]
    grad = float(np.abs(np.diff(luma, axis=1)).mean()) if w > 1 else 0.0
    out = [
        *(float(px[..., c].mean()) for c in range(3)),
        *(float(px[..., c].std()) for c in range(3)),
        *quad,
        float(luma.mean()),
        float(luma.std()),
        w / 1024.0,
        h / 1024.0,
        w / h,
        grad,
    ]
    assert len(out) == FEATURE_DIM
    return out


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic pseudo-metadata from the payload hash — stands in for
    the real header parse so tests pin the plumbing end-to-end."""
    h = hashlib.md5(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 32
    return width, height, n_frames, round(n_frames / 24.0, 3)


def decode_media(df: DataFrame, real: bool = False) -> DataFrame:
    """Decode metadata for every media row via ``mapInPandas``.

    ``real=True`` runs :func:`decode_image` — an actual pure-numpy
    PPM/BMP pixel decode (n_frames=1, duration 0 for stills); compressed
    formats raise ``NotImplementedError`` there (the PIL/pyav seam). The
    default deterministic fake exercises the identical batch shape.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = []
            for p in pdf["payload"]:
                payload = bytes(p)
                if not real:
                    meta.append((*_fake_decode(payload), 0, 0))
                elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                    rate, ch, samples = decode_wav(payload)
                    meta.append(
                        (0, 0, len(samples), round(len(samples) / rate, 6), rate, ch)
                    )
                elif payload[:4] == b"PPMV":
                    fps, frames = decode_ppmv(payload)
                    h0, w0 = frames[0].shape[:2] if frames else (0, 0)
                    meta.append(
                        (w0, h0, len(frames), round(len(frames) / fps, 6), 0, 3)
                    )
                else:
                    px = decode_image(payload)
                    meta.append((px.shape[1], px.shape[0], 1, 0.0, 0, 3))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "duration_sec": [m[3] for m in meta],
                    "payload_bytes": [len(bytes(p)) for p in pdf["payload"]],
                    "sample_rate": [m[4] for m in meta],
                    "n_channels": [m[5] for m in meta],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


def extract_features(df: DataFrame, real: bool = False) -> DataFrame:
    """Payload -> fixed-width feature vector (the embedding-extraction
    seam; output plugs straight into operators.similarity).

    ``real=True`` computes :func:`image_features` over actually-decoded
    PPM/BMP pixels (per-channel statistics, quadrant lumas, gradient
    energy); swapping in a model forward pass keeps the identical batch
    shape. The default is the deterministic hash-derived stand-in."""

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vecs = []
            for p in pdf["payload"]:
                if real:
                    payload = bytes(p)
                    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                        rate, _, samples = decode_wav(payload)
                        vecs.append(audio_features(samples, rate))
                    else:
                        vecs.append(image_features(decode_image(payload)))
                else:
                    h = hashlib.md5(bytes(p)).digest()
                    v = np.frombuffer(h, dtype=np.uint8).astype(np.float64)
                    v = (v - 127.5) / 127.5
                    vecs.append(v.tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": vecs})

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )
    return df.select("media_id", "payload").mapInPandas(feat_batches, schema)


def resize_pixels(pixels: "np.ndarray", out_h: int, out_w: int) -> "np.ndarray":
    """Nearest-neighbor resample to (out_h, out_w, 3) — pure numpy index
    gather (the standard pixel-grid mapping: output pixel i samples input
    row floor((i + 0.5) * H/out_h)). Deterministic, no interpolation
    dependencies; swap in PIL/opencv for bilinear on a real cluster."""
    h, w = pixels.shape[:2]
    rows = ((np.arange(out_h) + 0.5) * (h / out_h)).astype(np.int64).clip(0, h - 1)
    cols = ((np.arange(out_w) + 0.5) * (w / out_w)).astype(np.int64).clip(0, w - 1)
    return pixels[rows[:, None], cols[None, :]]


def encode_ppm(pixels: "np.ndarray") -> bytes:
    """(H, W, 3) uint8 -> P6 PPM bytes (inverse of the decode path, so a
    resized payload round-trips through decode_image)."""
    h, w = pixels.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def resize_media(df: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (P6), per media row
    via ``mapInPandas``: the canonical normalize-resolution step before
    batch feature extraction. The output payload is again an opaque
    binary column (re-decodable by :func:`decode_image`), so resize
    composes with decode_media/extract_features in one lazy plan. Only
    the genuinely decodable formats are accepted — this op has no fake
    path; it IS the real path."""

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                encode_ppm(resize_pixels(decode_image(bytes(p)), out_h, out_w))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": payloads,
                    "width": out_w,
                    "height": out_h,
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return df.select("media_id", "kind", "payload").mapInPandas(
        resize_batches, schema
    )


def sample_frames(
    df: DataFrame, every_nth: int = 8, real: bool = False
) -> DataFrame:
    """1 video row -> N sampled frame rows, fanned out inside the Arrow
    batch (the UDTF shape expressed as mapInPandas so the fan-out happens
    columnar-side, no shuffle).

    ``real=True`` decodes PPMV containers and fingerprints the ACTUAL
    decoded pixels of every ``every_nth``-th frame (md5 of the pixel
    buffer — two videos sharing a frame collide, which is what a frame
    dedup wants); the default fake path fingerprints
    md5(payload || frame_idx) over pseudo-metadata, pinning the identical
    plumbing without a decodable payload."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p)
                if real:
                    _, frames = decode_ppmv(payload)
                    for fi in range(0, len(frames), every_nth):
                        ids.append(mid)
                        idxs.append(fi)
                        fps.append(hashlib.md5(frames[fi].tobytes()).hexdigest())
                    continue
                _, _, n_frames, _ = _fake_decode(payload)
                for fi in range(0, n_frames, every_nth):
                    ids.append(mid)
                    idxs.append(fi)
                    fps.append(
                        hashlib.md5(payload + fi.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_fingerprint": fps}
            )

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .mapInPandas(frame_batches, FRAME_SCHEMA)
    )
