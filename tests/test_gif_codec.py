"""Round-trip tests for the from-spec GIF decoder
(operators/gif_codec.py): an independently-written minimal GIF writer
here builds real GIF87a/89a byte streams — including a genuine
dictionary-building LZW compressor with variable code widths and clear
codes — and the decoder must reproduce the palette-mapped pixels
exactly. The xls/pdf/png/jpeg/wav round-trip strategy applied to GIF.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from fund_data_etl_pipeline_spark.operators.gif_codec import decode_gif


class _BitWriter:
    """LSB-first bit packer (the GIF LZW packing order)."""

    def __init__(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.out = bytearray()

    def put(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(min_code_size: int, idx: bytes) -> bytes:
    """Dictionary-building GIF LZW encoder (spec appendix, forward
    direction): emits clear, then codes with width growing in lockstep
    with the decoder, clearing when the table hits 4096."""
    clear = 1 << min_code_size
    eoi = clear + 1
    bw = _BitWriter()

    def fresh() -> tuple[dict, int, int]:
        return (
            {bytes([i]): i for i in range(clear)},
            eoi + 1,
            min_code_size + 1,
        )

    table, next_code, width = fresh()
    bw.put(clear, width)
    run = b""
    for byte in idx:
        cand = run + bytes([byte])
        if cand in table:
            run = cand
            continue
        bw.put(table[run], width)
        table[cand] = next_code
        # decoder grows width when ITS table reaches 2^width; its table
        # size equals next_code, so grow after the entry lands
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4096:
            bw.put(clear, width)
            table, next_code, width = fresh()
        run = bytes([byte])
    if run:
        bw.put(table[run], width)
    bw.put(eoi, width)
    return bw.flush()


def _interlace_rows(h: int) -> list[int]:
    rows = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, h, step))
    return rows


def write_gif(
    idx: np.ndarray,
    palette: np.ndarray,
    version: bytes = b"89a",
    interlace: bool = False,
    min_code_size: int | None = None,
    extensions: bool = False,
) -> bytes:
    """In-test GIF writer: idx[h, w] palette indices + palette[n, 3]."""
    h, w = idx.shape
    n = len(palette)
    bits = max(1, (n - 1).bit_length())
    size_field = max(0, bits - 1)
    gct = np.zeros((2 << size_field, 3), dtype=np.uint8)
    gct[:n] = palette
    out = bytearray(b"GIF" + version)
    out += struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
    out += gct.tobytes()
    if extensions:  # graphic control + comment, both skippable chains
        out += b"\x21\xf9" + bytes([4, 0, 0, 0, 0, 0])
        out += b"\x21\xfe" + bytes([5]) + b"hello" + b"\x00"
    out += b"\x2c" + struct.pack(
        "<HHHHB", 0, 0, w, h, 0x40 if interlace else 0
    )
    mcs = min_code_size if min_code_size is not None else max(2, bits)
    rows = idx[_interlace_rows(h)] if interlace else idx
    data = _lzw_encode(mcs, rows.tobytes())
    out += bytes([mcs])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _checkerboard(h=23, w=31, n_colors=4, seed=7):
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    return idx, pal


def test_gif_roundtrip_exact():
    idx, pal = _checkerboard()
    w, h, ch, px = decode_gif(write_gif(idx, pal))
    assert (w, h, ch) == (31, 23, 3)
    assert np.array_equal(px, pal[idx])


def test_gif_interlaced_roundtrip():
    idx, pal = _checkerboard(h=17, w=9)
    _, _, _, px = decode_gif(write_gif(idx, pal, interlace=True))
    assert np.array_equal(px, pal[idx])


def test_gif_extensions_skipped_and_87a():
    idx, pal = _checkerboard(h=5, w=5)
    _, _, _, px = decode_gif(write_gif(idx, pal, extensions=True))
    assert np.array_equal(px, pal[idx])
    _, _, _, px87 = decode_gif(write_gif(idx, pal, version=b"87a"))
    assert np.array_equal(px87, pal[idx])


def test_gif_dictionary_growth_and_clear():
    # a large low-entropy image drives the LZW table through several
    # width bumps and past 4096 entries (forcing a mid-stream clear)
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 2, size=(200, 300), dtype=np.uint8)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    _, _, _, px = decode_gif(write_gif(idx, pal, min_code_size=2))
    assert np.array_equal(px, pal[idx])


def test_gif_named_errors():
    idx, pal = _checkerboard(h=4, w=4)
    blob = write_gif(idx, pal)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTGIF" + blob)
    with pytest.raises(ValueError, match="truncated|ended"):
        decode_gif(blob[:-10])
    # no color table at all: clear the GCT flag and strip the table
    hdr = bytearray(blob[:13])
    size_field = hdr[10] & 0x07
    hdr[10] &= 0x7F
    rest = blob[13 + 3 * (2 << size_field):]
    with pytest.raises(ValueError, match="color table"):
        decode_gif(bytes(hdr) + rest)


def test_gif_spark_image_path(spark):
    from fund_data_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_features,
    )
    from fund_data_etl_pipeline_spark.operators.png_codec import mean_luma

    idx, pal = _checkerboard(h=8, w=12)
    blob = write_gif(idx, pal)
    rows = [(21, "image", blob, (12, 8, 3, None, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    r = decode_image_features(df, fake=False).collect()[0]
    assert (r["width"], r["height"]) == (12, 8)
    assert abs(r["mean_luma"] - mean_luma(pal[idx])) < 1e-9
