"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata (SURVEY §2.10 north star; no reference counterpart).

The container has no decode libraries (PIL/ffmpeg/torchaudio), so the
*decode kernels* are stubs — a clearly-marked ``NotImplementedError`` on
the real path and a deterministic fake (md5-derived pseudo-metadata /
pseudo-features) for tests. Everything AROUND the kernel is real and
tested: the schema convention, the ``mapInPandas`` batch shape, Arrow
batch sizing, the fan-out UDTF-style frame sampler, and the feature-column
contract the similarity operators consume.

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

    ``real=True`` is the production path and requires decode libraries
    that are NOT in this environment — it raises ``NotImplementedError``
    by design (STUB; wire PIL/pyav here on a real cluster). The default
    deterministic fake exercises the identical batch shape.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real media decode requires PIL/pyav; not available in "
                    "this environment (deliberate stub — see module docstring)"
                )
            meta = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "n_frames": [m[2] for m in meta],
                    "duration_sec": [m[3] for m in meta],
                    "payload_bytes": [len(bytes(p)) for p in pdf["payload"]],
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        decode_batches, DECODED_SCHEMA
    )


def extract_features(df: DataFrame, real: bool = False) -> DataFrame:
    """Payload -> fixed-width feature vector (the embedding-extraction
    seam; output plugs straight into operators.similarity). Stubbed with a
    deterministic hash-derived vector; the real path is a model forward
    pass batched per Arrow batch."""

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real:
                raise NotImplementedError(
                    "real feature extraction requires a vision/audio model; "
                    "deliberate stub in this environment"
                )
            vecs = []
            for p in pdf["payload"]:
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


def sample_frames(df: DataFrame, every_nth: int = 8) -> DataFrame:
    """1 video row -> N sampled frame rows, fanned out inside the Arrow
    batch (the UDTF shape expressed as mapInPandas so the fan-out happens
    columnar-side, no shuffle). Frame fingerprints are deterministic
    md5(payload || frame_idx) stand-ins for decoded frame content."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, fps = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                payload = bytes(p)
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
