"""Round-trip tests for the from-spec PNG decoder
(operators/png_codec.py): an independently-written minimal PNG ENCODER
here emits real spec-conformant files (correct chunk CRCs, chosen
scanline filters), and the decoder must reproduce the input pixels
byte-identically — including through every filter type — plus the
Spark-side image-features operator running the REAL codec path."""

from __future__ import annotations

import struct
import zlib

import numpy as np


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, filters: list[int] | None = None) -> bytes:
    """Minimal PNG writer: 8-bit gray/RGB/RGBA from a (h, w, c) uint8
    array; per-row filter types as given (default all 0 = None)."""
    h, w, c = pixels.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    stride = w * c
    flat = pixels.reshape(h, stride).astype(np.int64)
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        row = flat[y]
        f = filters[y]
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(c, dtype=np.int64), row[:-c]])
            enc = (row - left) % 256
        elif f == 2:  # Up
            enc = (row - prev) % 256
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(c, dtype=np.int64), row[:-c]])
            enc = (row - ((left + prev) // 2)) % 256
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(c, dtype=np.int64), row[:-c]])
            upleft = np.concatenate([np.zeros(c, dtype=np.int64), prev[:-c]])
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = (row - pred) % 256
        else:  # pragma: no cover
            raise ValueError(f)
        raw += bytes(int(v) for v in enc)
        prev = row
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _random_pixels(h, w, c, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c)).astype(np.uint8)


def test_roundtrip_all_filters_rgb():
    from fund_data_etl_pipeline_spark.operators.png_codec import decode_png

    px = _random_pixels(5, 7, 3, seed=1)
    png = encode_png(px, filters=[0, 1, 2, 3, 4])
    w, h, c, out = decode_png(png)
    assert (w, h, c) == (7, 5, 3)
    assert np.array_equal(out, px)


def test_roundtrip_grayscale_and_rgba():
    from fund_data_etl_pipeline_spark.operators.png_codec import decode_png

    for ch in (1, 4):
        px = _random_pixels(9, 4, ch, seed=ch)
        _, _, c, out = decode_png(encode_png(px, filters=[4] * 9))
        assert c == ch and np.array_equal(out, px)


def test_mean_luma_matches_numpy():
    from fund_data_etl_pipeline_spark.operators.png_codec import (
        decode_png,
        mean_luma,
    )

    px = _random_pixels(8, 8, 3, seed=7)
    _, _, _, out = decode_png(encode_png(px))
    rgb = px.astype(np.float64)
    expect = (
        0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    ).mean()
    assert abs(mean_luma(out) - expect) < 1e-9


def test_corrupt_crc_and_unsupported_are_named():
    import pytest

    from fund_data_etl_pipeline_spark.operators.png_codec import decode_png

    png = bytearray(encode_png(_random_pixels(2, 2, 3, seed=3)))
    png[20] ^= 0xFF  # flip a byte inside IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\xff\xd8\xffJPEG-ish")


def test_image_features_real_codec_path(spark):
    """The Spark operator must run the REAL decode (fake=False) for PNG
    blobs: width/height from IHDR, mean_luma from actual pixels."""
    from fund_data_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_features,
    )
    from fund_data_etl_pipeline_spark.operators.png_codec import mean_luma

    pxs = [_random_pixels(6, 10, 3, seed=s) for s in (11, 12)]
    rows = [
        (
            i,
            "image",
            bytearray(encode_png(px, filters=[0, 1, 2, 3, 4, 1])),
            (10, 6, 3, None, None, None),
        )
        for i, px in enumerate(pxs)
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_image_features(df).collect()}
    for i, px in enumerate(pxs):
        r = out[i]
        assert (r["width"], r["height"]) == (10, 6)
        assert abs(r["mean_luma"] - mean_luma(px)) < 1e-9
