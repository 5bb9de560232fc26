"""Minimal from-spec PNG decoder (the multimodal image-decode stage).

Third from-spec codec after operators/xls_writer.py (BIFF8/CFB) and
sources/pdf_text.py (ISO 32000): the container ships no image library,
but PNG (W3C PNG spec / RFC 2083 — public) is zlib + per-scanline
filters, both expressible with the stdlib + numpy. This turns the
multimodal decode step from an honest stub into a real decoder for the
PNG subset that matters:

- chunk stream: signature, IHDR, concatenated IDAT, IEND (ancillary
  chunks skipped); CRCs validated with zlib.crc32;
- bit depth 8, color types 0 (grayscale), 2 (RGB) and 6 (RGBA),
  non-interlaced — the shapes synthetic/ML corpora actually use;
- all five scanline filters (None/Sub/Up/Average/Paeth, §6) undone
  row-by-row with vectorized numpy per-row arithmetic (the byte-serial
  dependency is within a row's filter, rows stream in order).

Out of scope, raising a NAMED error (the S7 quarantine convention —
never silently wrong): interlaced images, palette color, 16-bit depth,
and JPEG (DCT entropy coding is a genuinely different engineering
project; that stub remains, documented).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, channels, pixels[h, w, c] uint8) of a PNG blob."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_MAGIC)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG has no IHDR chunk")
    if bit_depth != 8:
        raise ValueError(f"PNG bit depth {bit_depth} unsupported (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(
            f"PNG color type {color_type} unsupported (0/2/6 only)"
        )
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row_start = y * (stride + 1)
        ftype = raw[row_start]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=row_start + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256, as specified
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth depend on the left neighbor -> serial in
            # x at pixel granularity, vectorized across channels
            cur = line
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0  # left
                b = int(prev[x])  # up
                if ftype == 1:
                    cur[x] = (int(cur[x]) + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (int(cur[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0  # up-left
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (
                        b if pb <= pc else c
                    )
                    cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur
        prev = out[y]
    return width, height, ch, out.reshape(height, width, ch)


def mean_luma(pixels: np.ndarray) -> float:
    """Mean BT.601 luma of decoded pixels (gray: the value itself; RGBA:
    alpha ignored) — the feature the image-features operator extracts."""
    if pixels.shape[2] == 1:
        return float(pixels[:, :, 0].mean())
    rgb = pixels[:, :, :3].astype(np.float64)
    luma = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    return float(luma.mean())
