"""Round-trip tests for the from-spec BMP decoder
(operators/bmp_codec.py) against an independently written in-test BMP
writer (24/32-bit truecolor and 1/4/8-bit palettized, bottom-up and
top-down, row padding)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fund_data_etl_pipeline_spark.operators.bmp_codec import decode_bmp


def write_bmp(
    rgb: np.ndarray,
    bpp: int = 24,
    palette: np.ndarray | None = None,
    idx: np.ndarray | None = None,
    top_down: bool = False,
) -> bytes:
    """In-test BMP writer: rgb[h, w, 3] for 24/32-bit, or palette +
    idx[h, w] for 1/4/8-bit."""
    if bpp in (1, 4, 8):
        h, w = idx.shape
        n_pal = len(palette)
        pal = b"".join(
            struct.pack("<BBBB", int(b), int(g), int(r), 0)
            for r, g, b in palette
        )
        per_byte = 8 // bpp
        rows = bytearray()
        order = idx if top_down else idx[::-1]
        for row in order:
            rb = bytearray()
            for i in range(0, w, per_byte):
                byte = 0
                for j, v in enumerate(row[i : i + per_byte]):
                    byte |= int(v) << ((per_byte - 1 - j) * bpp)
                rb.append(byte)
            while len(rb) % 4:
                rb.append(0)
            rows += rb
    else:
        h, w = rgb.shape[:2]
        n_pal = 0
        pal = b""
        rows = bytearray()
        order = rgb if top_down else rgb[::-1]
        for row in order:
            rb = bytearray()
            for r, g, b in row:
                rb += bytes([b, g, r] if bpp == 24 else [b, g, r, 255])
            while len(rb) % 4:
                rb.append(0)
            rows += rb
    pix_off = 14 + 40 + len(pal)
    info = struct.pack(
        "<IiihHIIiiII",
        40,
        w,
        -h if top_down else h,
        1,
        bpp,
        0,
        len(rows),
        2835,
        2835,
        n_pal,
        0,
    )
    hdr = b"BM" + struct.pack("<IHHI", pix_off + len(rows), 0, 0, pix_off)
    return hdr + info + pal + bytes(rows)


def _rgb(h=13, w=17, seed=5):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


def test_bmp_24_and_32_bit_roundtrip():
    img = _rgb()
    for bpp in (24, 32):
        w, h, ch, px = decode_bmp(write_bmp(img, bpp=bpp))
        assert (w, h, ch) == (17, 13, 3)
        assert np.array_equal(px, img)


def test_bmp_top_down():
    img = _rgb(h=6, w=6)
    _, _, _, px = decode_bmp(write_bmp(img, top_down=True))
    assert np.array_equal(px, img)


def test_bmp_palettized_roundtrip():
    rng = np.random.default_rng(11)
    for bpp, n in ((1, 2), (4, 16), (8, 200)):
        idx = rng.integers(0, n, size=(9, 14), dtype=np.uint8)
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        _, _, _, px = decode_bmp(
            write_bmp(None, bpp=bpp, palette=pal, idx=idx)
        )
        assert np.array_equal(px, pal[idx])


def test_bmp_named_errors():
    img = _rgb(h=4, w=4)
    blob = write_bmp(img)
    with pytest.raises(ValueError, match="signature"):
        decode_bmp(b"XX" + blob[2:])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(blob[:-9])
    rle = bytearray(blob)
    rle[30:34] = struct.pack("<I", 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(rle))


def test_bmp_spark_image_path(spark):
    from fund_data_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_features,
    )
    from fund_data_etl_pipeline_spark.operators.png_codec import mean_luma

    img = _rgb(h=8, w=10)
    rows = [(31, "image", write_bmp(img), (10, 8, 3, None, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    r = decode_image_features(df, fake=False).collect()[0]
    assert (r["width"], r["height"]) == (10, 8)
    assert abs(r["mean_luma"] - mean_luma(img)) < 1e-9
