"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded by real (pure-stdlib) codecs.

The Spark-side architecture — schemas, Arrow batch shapes, mapInPandas
signatures, 1->N frame fan-out — is the shape a Pillow/ffmpeg-backed
pipeline needs; the codecs themselves are real binary parsers for the
formats that need no external library:

  - BMP (BITMAPINFOHEADER, 24bpp bottom-up BGR rows, 4-byte row padding)
  - PPM (P6, maxval 255, RGB)
  - WAV (RIFF/WAVE, fmt + data chunks, PCM16 mono)
  - PVID (a minimal length-prefixed container of PPM frames used as the
    test stand-in for a video bitstream — the container parsing is real,
    the inter-frame codec is where ffmpeg would plug in)

``decoder='codec'`` (default) runs these parsers; ``decoder='fake'``
keeps the legacy digest-derived stand-in (payloads that aren't media at
all); ``decoder='real'`` decodes COMPRESSED formats: PNG and baseline
JPEG natively (``operators/imagecodecs.py`` — zlib+unfilter and
Huffman+IDCT, numpy/stdlib only), WAV via the same real RIFF parser,
with Pillow / soundfile / PyAV used transparently when installed for
the formats that genuinely need a binary codec (GIF/TIFF/WebP,
MP3/OGG/FLAC, MP4/WebM — those raise ``NotImplementedError`` naming
the library when it is absent).

Correctness story: ``gen_*_payloads`` synthesize deterministic media
from an integer id (dimensions, sample counts and pixel/sample values
are fixed arithmetic in the id), so an external oracle can recompute
the decoded metadata — width/height/pixel checksums/sample-rate/
duration — from the ids alone while Spark recovers them by actually
parsing the bytes; see __spark_entry__.oracle_sql (decode_images /
resize_images / audio_features / video_frames are full DuckDB-oracled
round-trips).
"""

from __future__ import annotations

import hashlib
import struct
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

# ---------------------------------------------------------------------------
# pure-stdlib codecs (numpy for the pixel math; executor-safe, no Spark)
# ---------------------------------------------------------------------------


def encode_ppm(pix: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary P6."""
    h, w, _ = pix.shape
    return f"P6\n{w} {h}\n255\n".encode() + pix.astype(np.uint8).tobytes()


def parse_ppm(raw: bytes) -> np.ndarray:
    if not raw.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval as whitespace-separated tokens
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(raw[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    body = raw[pos : pos + w * h * 3]
    if len(body) != w * h * 3:
        raise ValueError("truncated PPM body")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(pix: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24bpp BMP (BITMAPINFOHEADER, bottom-up
    BGR rows padded to 4 bytes)."""
    h, w, _ = pix.shape
    row = w * 3
    pad = (-row) % 4
    body = bytearray()
    bgr = pix[:, :, ::-1]  # RGB -> BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        body += bgr[y].astype(np.uint8).tobytes() + b"\x00" * pad
    size = 14 + 40 + len(body)
    header = struct.pack("<2sIHHI", b"BM", size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    return header + info + bytes(body)


def parse_bmp(raw: bytes) -> np.ndarray:
    if raw[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", raw, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", raw, 14)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    if hdr_size < 40 or bpp != 24 or planes != 1:
        raise ValueError(f"unsupported BMP variant (hdr={hdr_size}, bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row = w * 3
    stride = row + ((-row) % 4)
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        y = (h - 1 - i) if bottom_up else i
        off = data_off + i * stride
        out[y] = (
            np.frombuffer(raw[off : off + row], dtype=np.uint8).reshape(w, 3)[:, ::-1]
        )  # BGR -> RGB
    return out


def parse_image(raw: bytes) -> tuple[np.ndarray, str]:
    if raw[:2] == b"BM":
        return parse_bmp(raw), "bmp"
    if raw[:2] == b"P6":
        return parse_ppm(raw), "ppm"
    raise ValueError("unknown image format (expected BMP or P6 PPM)")


def encode_wav(sample_rate: int, samples: np.ndarray) -> bytes:
    """int16 mono PCM -> RIFF/WAVE."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def parse_wav(raw: bytes) -> tuple[int, np.ndarray]:
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(raw):
        cid, clen = raw[pos : pos + 4], struct.unpack_from("<I", raw, pos + 4)[0]
        body = raw[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            codec, ch, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if codec != 1 or ch != 1 or bits != 16:
                raise ValueError("unsupported WAV (need PCM16 mono)")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + clen + (clen % 2)  # chunks are word-aligned
    if sr is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return sr, data


PVID_MAGIC = b"PVID"


def encode_pvid(frames: list[np.ndarray]) -> bytes:
    """Minimal video container: magic + u32 frame count + per-frame
    u32 length + PPM bytes."""
    out = bytearray(PVID_MAGIC + struct.pack("<I", len(frames)))
    for f in frames:
        p = encode_ppm(f)
        out += struct.pack("<I", len(p)) + p
    return bytes(out)


def parse_pvid(raw: bytes) -> list[np.ndarray]:
    if raw[:4] != PVID_MAGIC:
        raise ValueError("not a PVID payload")
    n = struct.unpack_from("<I", raw, 4)[0]
    pos, frames = 8, []
    for _ in range(n):
        ln = struct.unpack_from("<I", raw, pos)[0]
        frames.append(parse_ppm(raw[pos + 4 : pos + 4 + ln]))
        pos += 4 + ln
    return frames


# ---------------------------------------------------------------------------
# deterministic media generators (id -> payload; the oracle's arithmetic)
# ---------------------------------------------------------------------------


def _image_pixels(d: int, w: int, h: int, salt: int = 0) -> np.ndarray:
    """Pixel (x, y) has all three channels = (d + salt*13 + 3x + 7y) % 256
    — recomputable in SQL for checksum oracles."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    v = ((d + salt * 13 + 3 * x + 7 * y) % 256).astype(np.uint8)
    return np.repeat(v[:, :, None], 3, axis=2)


def image_payload(d: int) -> bytes:
    """Even ids -> BMP, odd -> PPM; w = 4 + d%13, h = 4 + (7d)%11."""
    w, h = 4 + d % 13, 4 + (d * 7) % 11
    pix = _image_pixels(d, w, h)
    return encode_bmp(pix) if d % 2 == 0 else encode_ppm(pix)


AUDIO_RATES = (8000, 16000, 22050, 44100)


def audio_payload(d: int) -> bytes:
    """sr = AUDIO_RATES[d%4]; n = 100 + d%401 samples of
    ((31d + 17i) % 65536) - 32768."""
    sr = AUDIO_RATES[d % 4]
    n = 100 + d % 401
    i = np.arange(n, dtype=np.int64)
    samples = ((d * 31 + i * 17) % 65536) - 32768
    return encode_wav(sr, samples)


VIDEO_W, VIDEO_H = 8, 6


def video_payload(d: int) -> bytes:
    """1 + d%17 PPM frames of 8x6, frame f salted into the pixel formula."""
    n = 1 + d % 17
    return encode_pvid([_image_pixels(d, VIDEO_W, VIDEO_H, salt=f) for f in range(n)])


def _gen_payloads(df: DataFrame, id_col: str, fn) -> DataFrame:
    src = df.select(F.col(id_col).cast("long").alias("id"))
    schema = StructType(
        [StructField("id", LongType()), StructField("payload", BinaryType())]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].tolist()
            yield pd.DataFrame({"id": ids, "payload": [fn(int(i)) for i in ids]})

    return src.mapInPandas(gen, schema=schema)


def gen_image_payloads(df: DataFrame, id_col: str) -> DataFrame:
    return _gen_payloads(df, id_col, image_payload)


def gen_audio_payloads(df: DataFrame, id_col: str) -> DataFrame:
    return _gen_payloads(df, id_col, audio_payload)


def gen_video_payloads(df: DataFrame, id_col: str) -> DataFrame:
    return _gen_payloads(df, id_col, video_payload)


# ---------------------------------------------------------------------------
# decode / transform operators
# ---------------------------------------------------------------------------

IMAGE_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("format", StringType()),
        StructField("pix_sum", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _feature_vec(pix: np.ndarray, dim: int) -> list[float]:
    """Unit-norm block-mean feature from the decoded pixels (a real
    function of image content, not of the encoded bytes)."""
    flat = pix.astype(np.float64).mean(axis=2).ravel()
    chunks = np.array_split(flat, dim)
    v = np.array([c.mean() if c.size else 0.0 for c in chunks])
    nrm = np.linalg.norm(v)
    return ((v / nrm) if nrm else v).astype(np.float32).tolist()


def decode_images(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    decoder: str = "codec",
    feature_dim: int = 8,
) -> DataFrame:
    """binary column -> (width, height, format, pixel checksum, unit-norm
    feature).  decoder='codec' parses BMP/PPM for real; 'fake' is the
    legacy digest stand-in for non-media payloads; 'real' decodes
    compressed formats — PNG/baseline-JPEG natively
    (operators/imagecodecs.py), Pillow fallback when installed."""
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {k: [] for k in ("id", "width", "height", "format", "pix_sum", "feature")}
            for pid, payload in zip(pdf["id"].tolist(), pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                if decoder in ("codec", "real"):
                    if decoder == "real":
                        # compressed formats: native PNG + baseline
                        # JPEG decoders (operators/imagecodecs.py),
                        # Pillow fallback for anything else when
                        # installed; BMP/PPM route to the stdlib codecs
                        from .imagecodecs import parse_image_real

                        pix, fmt = parse_image_real(raw)
                    else:
                        pix, fmt = parse_image(raw)
                    w, h = pix.shape[1], pix.shape[0]
                    psum = int(pix.astype(np.int64).sum())
                    feat = _feature_vec(pix, feature_dim)
                else:  # fake: digest-derived dims for non-media payloads
                    dg = hashlib.sha256(raw).digest()
                    w, h, fmt, psum = 16 + dg[0] % 240, 16 + dg[1] % 240, "fake", 0
                    v = np.frombuffer(dg[: feature_dim * 4], dtype=np.uint32).astype(
                        np.float64
                    )
                    nrm = np.linalg.norm(v)
                    feat = ((v / nrm) if nrm else v).astype(np.float32).tolist()
                rows["id"].append(pid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["format"].append(fmt)
                rows["pix_sum"].append(psum)
                rows["feature"].append(feat)
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=IMAGE_META_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pix_sum", LongType()),
    ]
)


def resize_images(
    df: DataFrame,
    id_col: str,
    bin_col: str,
    target_w: int,
    target_h: int,
    decoder: str = "codec",
) -> DataFrame:
    """Nearest-neighbor resample to (target_w, target_h), re-encoded as
    PPM (source pixel of output (x, y) is (x*w // tw, y*h // th) — the
    same arithmetic an external oracle can replay).  'real' decodes
    PNG/JPEG natively (Pillow fallback for other formats) and
    re-encodes losslessly as PNG."""
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {k: [] for k in ("id", "payload", "width", "height", "pix_sum")}
            for pid, payload in zip(pdf["id"].tolist(), pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                if decoder in ("codec", "real"):
                    if decoder == "real":
                        # decode PNG/JPEG (native) or Pillow formats;
                        # re-encode LOSSLESSLY as PNG so a resize chain
                        # never re-quantizes
                        from .imagecodecs import encode_png, parse_image_real

                        pix, _fmt = parse_image_real(raw)
                    else:
                        pix, _fmt = parse_image(raw)
                    h, w = pix.shape[0], pix.shape[1]
                    sx = (np.arange(target_w) * w) // target_w
                    sy = (np.arange(target_h) * h) // target_h
                    out = pix[sy][:, sx]
                    body = (
                        encode_png(out) if decoder == "real" else encode_ppm(out)
                    )
                    psum = int(out.astype(np.int64).sum())
                else:
                    seed = hashlib.sha256(raw).digest()
                    size = max(16, (target_w * target_h) // 64)
                    body = (seed * (size // len(seed) + 1))[:size]
                    psum = 0
                rows["id"].append(pid)
                rows["payload"].append(body)
                rows["width"].append(target_w)
                rows["height"].append(target_h)
                rows["pix_sum"].append(psum)
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=RESIZE_SCHEMA)


AUDIO_META_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("amp_sum", LongType()),
        StructField("mfcc", ArrayType(FloatType())),
    ]
)


def extract_audio_features(
    df: DataFrame, id_col: str, bin_col: str, decoder: str = "codec", n_mfcc: int = 8
) -> DataFrame:
    """WAV binary -> (sample_rate, n_samples, duration_ms, sum of |PCM|
    amplitudes, an MFCC-shaped band-energy vector).  The RIFF parsing is
    real; 'real' decodes WAV with the same parser and compressed
    audio via soundfile when installed."""
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {
                k: []
                for k in ("id", "sample_rate", "n_samples", "duration_ms", "amp_sum", "mfcc")
            }
            for pid, payload in zip(pdf["id"].tolist(), pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                if decoder == "real" and not raw.startswith(b"RIFF"):
                    # WAV is decoded natively below (the RIFF parser is
                    # real); compressed audio needs a binary codec —
                    # soundfile when installed, else this is the one
                    # genuinely library-bound seam
                    try:
                        import io

                        import soundfile  # type: ignore

                        data, sr = soundfile.read(
                            io.BytesIO(raw), dtype="int16"
                        )
                        samples = np.asarray(data)
                        if samples.ndim > 1:
                            samples = samples[:, 0]
                    except ImportError:
                        raise NotImplementedError(
                            "compressed-audio codec not available; WAV "
                            "decodes natively — install soundfile for "
                            "MP3/OGG/FLAC"
                        )
                elif decoder in ("codec", "real"):
                    sr, samples = parse_wav(raw)
                if decoder in ("codec", "real"):
                    n = len(samples)
                    dur = n * 1000 // sr
                    amp = int(np.abs(samples.astype(np.int64)).sum())
                    chunks = np.array_split(np.abs(samples.astype(np.float64)), n_mfcc)
                    v = np.array([c.mean() if c.size else 0.0 for c in chunks])
                    nrm = np.linalg.norm(v)
                    mfcc = ((v / nrm) if nrm else v).astype(np.float32).tolist()
                else:
                    dg = hashlib.sha256(raw).digest()
                    sr = AUDIO_RATES[dg[2] % 4]
                    n, dur, amp = 0, 100 + len(raw), 0
                    v = np.frombuffer(dg[: n_mfcc * 4], dtype=np.uint32).astype(np.float64)
                    nrm = np.linalg.norm(v)
                    mfcc = ((v / nrm) if nrm else v).astype(np.float32).tolist()
                rows["id"].append(pid)
                rows["sample_rate"].append(sr)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(dur)
                rows["amp_sum"].append(amp)
                rows["mfcc"].append(mfcc)
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=AUDIO_META_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pix_sum", LongType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(
    df: DataFrame, id_col: str, bin_col: str, every_n: int = 10, decoder: str = "codec"
) -> DataFrame:
    """Video container -> every_n-th frame's metadata; one input row fans
    out to n frame rows (the mapInPandas shape a real ffmpeg-backed
    sampler needs).  PVID container parsing is real; 'real' decodes
    actual video bitstreams via PyAV when installed."""
    src = df.select(F.col(id_col).alias("id"), F.col(bin_col).alias("payload"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            rows = {
                k: [] for k in ("id", "frame_idx", "width", "height", "pix_sum", "frame_hash")
            }
            for pid, payload in zip(pdf["id"].tolist(), pdf["payload"].tolist()):
                raw = bytes(payload or b"")
                if decoder == "real" and not raw.startswith(b"PVID"):
                    # the PVID container decodes natively below; a real
                    # video BITSTREAM (MP4/WebM) needs ffmpeg — PyAV
                    # when installed, else the one genuinely
                    # library-bound video seam
                    try:
                        import io

                        import av  # type: ignore

                        frames = []
                        with av.open(io.BytesIO(raw)) as container:
                            for frame in container.decode(video=0):
                                frames.append(
                                    frame.to_ndarray(format="rgb24")
                                )
                    except ImportError:
                        raise NotImplementedError(
                            "video codec not available; PVID decodes "
                            "natively — install PyAV for MP4/WebM"
                        )
                elif decoder in ("codec", "real"):
                    frames = parse_pvid(raw)
                if decoder in ("codec", "real"):
                    for i in range(0, len(frames), every_n):
                        pix = frames[i]
                        rows["id"].append(pid)
                        rows["frame_idx"].append(i)
                        rows["width"].append(pix.shape[1])
                        rows["height"].append(pix.shape[0])
                        rows["pix_sum"].append(int(pix.astype(np.int64).sum()))
                        rows["frame_hash"].append(
                            hashlib.sha256(pix.tobytes()).hexdigest()[:16]
                        )
                else:
                    n_frames = 1 + len(raw) % 50
                    for i in range(0, n_frames, every_n):
                        rows["id"].append(pid)
                        rows["frame_idx"].append(i)
                        rows["width"].append(0)
                        rows["height"].append(0)
                        rows["pix_sum"].append(0)
                        rows["frame_hash"].append(
                            hashlib.sha256(raw + i.to_bytes(4, "little")).hexdigest()[:16]
                        )
            yield pd.DataFrame(rows)

    return src.mapInPandas(gen, schema=FRAME_SCHEMA)
