"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side architecture is real and tested — schemas, Arrow batch
shapes, mapInPandas signatures, partition-size control — while the codec
step itself is stubbed: the sandbox has no image/audio libraries, so
``decoder='fake'`` runs a deterministic stand-in (parses the tiny header
convention used by the fixtures) and ``decoder='real'`` raises
NotImplementedError at the exact point a Pillow/ffmpeg call would go.
Swapping in a real codec changes only the body of ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _decode_one(payload: bytes, decoder: str) -> tuple[int, int, str]:
    """(width, height, format) of one binary image payload."""
    if decoder == "real":
        raise NotImplementedError(
            "image codec not available in this environment; "
            "plug Pillow/libvips here"
        )
    # deterministic fake: dimensions derived from a stable digest
    d = hashlib.sha256(payload).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, "fake"


def decode_images(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    decoder: str = "fake",
    feature_dim: int = 8,
) -> DataFrame:
    """binary column -> typed metadata + a unit-norm feature vector.
    One Arrow batch in, one out; numpy for the feature math."""
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, ws, hs, fmts, feats = [], [], [], [], []
            for pid, payload in zip(pdf["id"].tolist(), pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                w, h, fmt = _decode_one(raw, decoder)
                digest = hashlib.sha256(raw).digest()
                v = np.frombuffer(digest[:feature_dim * 4], dtype=np.uint32)
                v = v.astype(np.float64)
                nrm = np.linalg.norm(v)
                v = (v / nrm if nrm else v).astype(np.float32)
                ids.append(pid)
                ws.append(w)
                hs.append(h)
                fmts.append(fmt)
                feats.append(v.tolist())
            yield pd.DataFrame(
                {"id": ids, "width": ws, "height": hs, "format": fmts, "feature": feats}
            )

    return src.mapInPandas(gen, schema=IMAGE_META_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str, bin_col: str, every_n: int = 10, decoder: str = "fake"
) -> DataFrame:
    """Video frame sampling plumbing: one input row fans out to n frame
    rows (mapInPandas output may be longer than input — the shape a real
    ffmpeg-backed sampler needs)."""
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, idxs, hashes = [], [], []
            for pid, payload in zip(pdf["id"].tolist(), pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                if decoder == "real":
                    raise NotImplementedError("video codec not available; plug ffmpeg here")
                n_frames = 1 + len(raw) % 50
                for i in range(0, n_frames, every_n):
                    ids.append(pid)
                    idxs.append(i)
                    hashes.append(hashlib.sha256(raw + i.to_bytes(4, "little")).hexdigest()[:16])
            yield pd.DataFrame({"id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return src.mapInPandas(gen, schema=FRAME_SCHEMA)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("mfcc", ArrayType(FloatType())),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str, bin_col: str, decoder: str = "fake", n_mfcc: int = 8
) -> DataFrame:
    """Audio binary column -> (sample_rate, duration, MFCC-shaped feature
    vector).  Same contract as decode_images: the Arrow plumbing is real,
    the codec is a deterministic stand-in ('real' raises where a
    librosa/ffmpeg call would go)."""
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, srs, durs, mfccs = [], [], [], []
            for pid, payload in zip(pdf["id"].tolist(), pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                if decoder == "real":
                    raise NotImplementedError(
                        "audio codec not available; plug librosa/ffmpeg here"
                    )
                d = hashlib.sha256(raw).digest()
                ids.append(pid)
                srs.append((8000, 16000, 22050, 44100)[d[2] % 4])
                durs.append(100 + len(raw))
                v = np.frombuffer(d[: n_mfcc * 4], dtype=np.uint32).astype(np.float64)
                nrm = np.linalg.norm(v)
                mfccs.append(((v / nrm) if nrm else v).astype(np.float32).tolist())
            yield pd.DataFrame(
                {"id": ids, "sample_rate": srs, "duration_ms": durs, "mfcc": mfccs}
            )

    return src.mapInPandas(gen, schema=AUDIO_META_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    target_w: int,
    target_h: int,
    decoder: str = "fake",
) -> DataFrame:
    """Image resize plumbing: binary in -> binary out at the target
    geometry.  The fake codec re-encodes deterministically (digest-seeded
    payload of size proportional to the target area) so downstream
    batch-shape/size behavior is realistic; 'real' raises where the
    Pillow resample call would go."""
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids, outs = [], []
            for pid, payload in zip(pdf["id"].tolist(), pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                if decoder == "real":
                    raise NotImplementedError(
                        "image codec not available; plug Pillow here"
                    )
                seed = hashlib.sha256(raw).digest()
                size = max(16, (target_w * target_h) // 64)
                body = (seed * (size // len(seed) + 1))[:size]
                ids.append(pid)
                outs.append(body)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "payload": outs,
                    "width": [target_w] * len(ids),
                    "height": [target_h] * len(ids),
                }
            )

    return src.mapInPandas(gen, schema=RESIZE_SCHEMA)
