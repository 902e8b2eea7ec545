"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata.

No reference counterpart (DeezyMatch is text-only); first-class for the
100 TB training-data use-case. The Spark-side plumbing — schemas,
Arrow batch shape, ``mapInPandas`` signatures, partition behavior — is
real and tested; the actual codec calls are stubbed behind
``NotImplementedError`` (this container ships no image/audio libs) with
a deterministic fake decoder for the synthetic payload format below, so
the distributed path is exercised end to end.

Synthetic payload format (deterministic, self-describing):
    b"FAKEIMG1" + width:uint16 + height:uint16 + channels:uint8 + pixels
    b"FAKEAUD1" + sample_rate:uint32 + n_samples:uint32 + pcm16 samples
    b"FAKEVID1" + fps:uint16 + n_frames:uint16 + width:uint16
                + height:uint16 + channels:uint8 + raw frames
Real decoders (PIL / soundfile / av) drop into the same ``_decode_*``
seams without touching any Spark code.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

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

__all__ = [
    "MEDIA_SCHEMA",
    "encode_fake_image",
    "encode_fake_audio",
    "encode_fake_video",
    "encode_png",
    "image_features",
    "audio_features",
    "frame_sample",
]

# canonical media-table schema: payload is opaque bytes + typed metadata
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),       # 'image' | 'audio' | 'video'
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("src_url", StringType()),
    ]
)

_IMG_MAGIC = b"FAKEIMG1"
_AUD_MAGIC = b"FAKEAUD1"
_VID_MAGIC = b"FAKEVID1"


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal standards-compliant PNG encoder (RFC 2083) from stdlib
    ``zlib`` + ``struct`` only — no PIL in this container. Accepts
    8-bit grayscale ``(h, w)`` or RGB ``(h, w, 3)`` arrays; each
    scanline uses filter type 0 (None), one zlib-compressed IDAT.
    Output opens in any standard viewer."""
    import zlib

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type = 0  # grayscale
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type = 2  # truecolor RGB
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {px.shape}")
    h, w = px.shape[:2]
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def encode_fake_image(width: int, height: int, channels: int, seed: int) -> bytes:
    """Deterministic synthetic image payload (pixels from Philox(seed))."""
    rng = np.random.Generator(np.random.Philox(seed))
    px = rng.integers(0, 256, size=width * height * channels, dtype=np.uint8)
    return _IMG_MAGIC + struct.pack("<HHB", width, height, channels) + px.tobytes()


def encode_fake_audio(sample_rate: int, n_samples: int, seed: int) -> bytes:
    rng = np.random.Generator(np.random.Philox(seed))
    pcm = rng.integers(-32768, 32767, size=n_samples, dtype=np.int16)
    return _AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + pcm.tobytes()


def encode_fake_video(
    fps: int, n_frames: int, width: int, height: int, channels: int, seed: int
) -> bytes:
    """Deterministic synthetic video payload: raw frames from
    Philox(seed), one contiguous w*h*c block per frame."""
    rng = np.random.Generator(np.random.Philox(seed))
    frames = rng.integers(
        0, 256, size=n_frames * width * height * channels, dtype=np.uint8
    )
    return (
        _VID_MAGIC
        + struct.pack("<HHHHB", fps, n_frames, width, height, channels)
        + frames.tobytes()
    )


def _decode_image(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """→ (width, height, channels, float32 pixel array). Only the
    synthetic format is implemented; real formats raise."""
    if payload[:8] == _IMG_MAGIC:
        w, h, c = struct.unpack("<HHB", payload[8:13])
        px = np.frombuffer(payload, dtype=np.uint8, offset=13, count=w * h * c)
        return w, h, c, px.astype(np.float32)
    raise NotImplementedError(
        "real image codecs (PIL/turbojpeg) are not available in this "
        "environment — only the FAKEIMG1 synthetic format decodes"
    )


def _decode_audio(payload: bytes) -> tuple[int, np.ndarray]:
    if payload[:8] == _AUD_MAGIC:
        sr, n = struct.unpack("<II", payload[8:16])
        pcm = np.frombuffer(payload, dtype=np.int16, offset=16, count=n)
        return sr, pcm.astype(np.float32) / 32768.0
    raise NotImplementedError(
        "real audio codecs (soundfile/av) are not available in this "
        "environment — only the FAKEAUD1 synthetic format decodes"
    )


_IMG_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("feat", ArrayType(FloatType())),
    ]
)


def image_features(df: DataFrame, *, n_bins: int = 16) -> DataFrame:
    """Decode + feature-extract image payloads → [media_id, width,
    height, channels, feat] where feat is an ``n_bins`` intensity
    histogram (the stand-in for a real embedding model).

    ``mapInPandas``: whole Arrow batches cross the boundary once; the
    per-row loop stays inside numpy. Partitioning is preserved — no
    shuffle; at scale, payload bytes are column-pruned away by
    Catalyst for any query not touching them.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [], "feat": []}
            for mid, payload in zip(b["media_id"], b["payload"]):
                w, h, c, px = _decode_image(bytes(payload))
                hist, _ = np.histogram(px, bins=n_bins, range=(0, 256))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(c)
                out["feat"].append((hist / max(px.size, 1)).astype(np.float32))
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(fn, schema=_IMG_FEAT_SCHEMA)


_AUD_FEAT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("rms", FloatType()),
        StructField("feat", ArrayType(FloatType())),
    ]
)


def audio_features(df: DataFrame, *, n_frames: int = 8) -> DataFrame:
    """Decode audio payloads → per-frame RMS energy vector (stand-in
    for a real spectral featurizer). Same mapInPandas batch shape as
    :func:`image_features`."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                sr, pcm = _decode_audio(bytes(payload))
                frames = np.array_split(pcm, n_frames) if pcm.size else []
                feat = np.array(
                    [float(np.sqrt(np.mean(f**2))) if f.size else 0.0 for f in frames],
                    dtype=np.float32,
                )
                rms = float(np.sqrt(np.mean(pcm**2))) if pcm.size else 0.0
                rows.append((mid, sr, len(pcm), rms, feat))
            yield pd.DataFrame(
                rows, columns=["media_id", "sample_rate", "n_samples", "rms", "feat"]
            )

    return df.select("media_id", "payload").mapInPandas(fn, schema=_AUD_FEAT_SCHEMA)


def _decode_video(payload: bytes) -> tuple[int, int, int, int, int, np.ndarray]:
    """→ (fps, n_frames, width, height, channels, frames[n, w*h*c]).
    Only the synthetic format is implemented; real formats raise."""
    if payload[:8] == _VID_MAGIC:
        fps, n, w, h, c = struct.unpack("<HHHHB", payload[8:17])
        frames = np.frombuffer(
            payload, dtype=np.uint8, offset=17, count=n * w * h * c
        ).reshape(n, w * h * c)
        return fps, n, w, h, c, frames
    raise NotImplementedError(
        "real video codecs (av/ffmpeg) are not available in this "
        "environment — only the FAKEVID1 synthetic format decodes"
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frame_png", BinaryType()),
    ]
)


def frame_sample(df: DataFrame, *, every_n: int = 10) -> DataFrame:
    """Video frame sampling → one row per sampled frame
    [media_id, frame_idx, width, height, frame_png]: decode the video
    payload, keep every ``every_n``-th frame, re-encode each kept frame
    as a REAL standalone PNG (:func:`encode_png` — stdlib zlib, opens
    in any viewer; only the upstream video DEcode is format-stubbed).

    Same scale shape as :func:`image_features`: ``mapInPandas``
    preserves partitioning (no shuffle), one Arrow crossing per batch,
    and the (wide) video payload column never leaves the map — each
    output row carries only its single frame's bytes. Fan-out is
    bounded at n_frames/every_n rows per input row."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, payload in zip(b["media_id"], b["payload"]):
                _, n, w, h, c, frames = _decode_video(bytes(payload))
                for idx in range(0, n, every_n):
                    frame = frames[idx].reshape(
                        (h, w) if c == 1 else (h, w, c)
                    )
                    rows.append((mid, idx, w, h, encode_png(frame)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "width", "height", "frame_png"]
            )

    return df.select("media_id", "payload").mapInPandas(fn, schema=_FRAME_SCHEMA)


def synthetic_media(spark, n_rows: int, *, kind: str = "image") -> DataFrame:
    """Deterministic media table in MEDIA_SCHEMA (distributed generation
    via mapInPandas over spark.range — same pattern as sources.pages)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for i in b["id"]:
                i = int(i)
                if kind == "image":
                    payload = encode_fake_image(8 + i % 8, 8 + (i * 3) % 8, 3, seed=i)
                    mime = "image/x-fake"
                elif kind == "video":
                    payload = encode_fake_video(
                        24, 12 + i % 12, 4 + i % 4, 4 + (i * 3) % 4, 3, seed=i
                    )
                    mime = "video/x-fake"
                else:
                    payload = encode_fake_audio(16000, 64 + (i * 7) % 64, seed=i)
                    mime = "audio/x-fake"
                rows.append((i, kind, payload, mime, f"https://m.example.com/{kind}/{i}"))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "payload", "mime", "src_url"]
            )

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)
