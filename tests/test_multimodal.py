"""Multimodal binary-column plumbing: the Spark-side schema /
partitioning / Arrow batch path is real; codecs are stubbed (container
ships no image/audio libs) with a deterministic fake format."""

import numpy as np
import pytest

from deezymatch_spark.multimodal import (
    audio_features,
    encode_fake_audio,
    encode_fake_image,
    frame_sample,
    image_features,
    synthetic_media,
)


def test_image_features_roundtrip(spark):
    media = synthetic_media(spark, 20, kind="image")
    out = image_features(media, n_bins=16).orderBy("media_id").collect()
    assert len(out) == 20
    r0 = out[0]
    assert r0.width == 8 and r0.height == 8 and r0.channels == 3
    assert len(r0.feat) == 16
    # histogram is a probability mass over pixels
    assert abs(sum(r0.feat) - 1.0) < 1e-5
    # determinism across runs
    again = image_features(media, n_bins=16).orderBy("media_id").collect()
    assert [list(r.feat) for r in again] == [list(r.feat) for r in out]


def test_image_features_matches_local_decode(spark):
    payload = encode_fake_image(9, 11, 3, seed=7)
    import struct

    w, h, c = struct.unpack("<HHB", payload[8:13])
    px = np.frombuffer(payload, dtype=np.uint8, offset=13, count=w * h * c)
    hist, _ = np.histogram(px.astype(np.float32), bins=16, range=(0, 256))
    expected = (hist / px.size).astype(np.float32)

    df = spark.createDataFrame([(7, payload)], "media_id long, payload binary")
    row = image_features(df, n_bins=16).collect()[0]
    assert np.allclose(row.feat, expected)


def test_audio_features(spark):
    media = synthetic_media(spark, 10, kind="audio")
    out = audio_features(media, n_frames=8).orderBy("media_id").collect()
    assert len(out) == 10
    assert all(r.sample_rate == 16000 for r in out)
    assert all(len(r.feat) == 8 for r in out)
    assert all(0.0 <= r.rms <= 1.0 for r in out)


def test_real_codec_raises(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG\r\n\x1a\nnotreally")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        image_features(df).collect()


def _parse_png(data: bytes):
    """Dependency-free PNG reader for the test: validates signature,
    chunk layout, CRCs, and the filter-0 scanline structure; returns
    (w, h, color_type, raw pixel bytes)."""
    import struct
    import zlib

    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pos, chunks = 8, []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        assert crc == (zlib.crc32(tag + body) & 0xFFFFFFFF), f"bad CRC in {tag}"
        chunks.append((tag, body))
        pos += 12 + length
    assert [t for t, _ in chunks][0] == b"IHDR" and chunks[-1][0] == b"IEND"
    w, h, depth, color_type, comp, filt, inter = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    assert (depth, comp, filt, inter) == (8, 0, 0, 0)
    idat = b"".join(b for t, b in chunks if t == b"IDAT")
    raw = zlib.decompress(idat)
    n_ch = {0: 1, 2: 3}[color_type]
    stride = 1 + w * n_ch
    assert len(raw) == h * stride
    rows = []
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        assert line[0] == 0  # filter type None
        rows.append(line[1:])
    return w, h, color_type, b"".join(rows)


def test_frame_sample(spark):
    """Every every_n-th frame of each video comes back as a REAL PNG
    (valid chunks/CRCs, filter-0 scanlines) carrying the source
    frame's exact pixel bytes."""
    from deezymatch_spark.multimodal import _decode_video

    media = synthetic_media(spark, 12, kind="video")
    out = frame_sample(media, every_n=5).orderBy("media_id", "frame_idx").collect()

    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    n_expected = 0
    for mid, payload in payloads.items():
        _, n, w, h, c, frames = _decode_video(payload)
        idxs = list(range(0, n, 5))
        n_expected += len(idxs)
        got = [r for r in out if r.media_id == mid]
        assert [r.frame_idx for r in got] == idxs
        for r in got:
            fw, fh, ct, px = _parse_png(bytes(r.frame_png))
            assert (fw, fh) == (w, h) == (r.width, r.height)
            assert ct == (2 if c == 3 else 0)
            assert px == frames[r.frame_idx].tobytes()
    assert len(out) == n_expected


def test_encode_png_grayscale():
    import numpy as np

    from deezymatch_spark.multimodal import encode_png

    arr = np.arange(24, dtype=np.uint8).reshape(4, 6)
    w, h, ct, px = _parse_png(encode_png(arr))
    assert (w, h, ct) == (6, 4, 0)
    assert px == arr.tobytes()


def test_frame_sample_real_codec_raises(spark):
    df = spark.createDataFrame(
        [(1, b"\x00\x00\x00\x18ftypmp42notreally")], "media_id long, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        frame_sample(df).collect()
