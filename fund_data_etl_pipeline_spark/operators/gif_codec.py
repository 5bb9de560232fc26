"""Minimal from-spec GIF decoder (the multimodal image stage).

Seventh from-spec codec after BIFF8/CFB (xls_writer), ISO 32000
(pdf_text), W3C PNG (png_codec), ITU-T T.81 JPEG (jpeg_codec), RIFF/PCM
+ G.711 WAV (wav_codec) and ISO-BMFF MP4 (mp4_meta): GIF87a/89a per the
public CompuServe/W3C specification —

- header + logical screen descriptor, global color table;
- extension blocks (0x21) skipped via their sub-block chains (graphic
  control, comment, application — animation timing is metadata the
  feature extractor doesn't need);
- image descriptor (0x2C): local color table, 4-pass interlace
  de-scrambling, and the variable-code-width LZW decompressor
  (LSB-first bit packing, clear / end-of-information codes, dictionary
  growth to 12 bits) defined in the spec's Appendix;
- output is the FIRST frame as [h, w, 3] uint8 RGB (palette-mapped),
  matching decode_png's convention so mean_luma is shared. Later
  frames of an animation are ignored by design — features describe the
  still image a training corpus would embed.

Out of scope, raising a NAMED error (the S7 quarantine convention —
never silently wrong): truncated streams, a frame with neither local
nor global color table, and LZW code-stream corruption. Round-trip
tests in tests/test_gif_codec.py drive this against an independently
written in-test GIF writer with a real dictionary-building LZW
compressor.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF8"  # GIF87a / GIF89a


def _skip_subblocks(data: bytes, pos: int) -> int:
    """Advance past a sub-block chain (size-prefixed blocks, 0 ends)."""
    while True:
        if pos >= len(data):
            raise ValueError("GIF truncated inside sub-block chain")
        n = data[pos]
        pos += 1 + n
        if n == 0:
            return pos


def _lzw_decode(min_code_size: int, stream: bytes, n_pixels: int) -> bytes:
    """GIF LZW per the spec appendix: variable code width starting at
    min_code_size+1, codes packed LSB-first, clear resets the table,
    width grows when the next code would not fit, capped at 12 bits."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state
    acc = nbits = pos = 0

    def read_code(width: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < width:
            if pos >= len(stream):
                return eoi  # truncated: treat as end, caller checks len
            acc |= stream[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    table: list[bytes] = []

    def reset() -> int:
        nonlocal table
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return min_code_size + 1

    width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read_code(width)
        if code == clear:
            width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError("GIF LZW code out of range (corrupt stream)")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended before the frame filled")
    return bytes(out[:n_pixels])


def _deinterlace(idx: np.ndarray, w: int, h: int) -> np.ndarray:
    """Reorder the spec's 4-pass interlaced row sequence to natural."""
    rows = np.empty((h, w), dtype=np.uint8)
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        for y in range(start, h, step):
            rows[y] = idx[src]
            src += 1
    return rows


def decode_gif(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """(width, height, 3, pixels[h, w, 3] uint8 RGB) of a GIF blob's
    first frame, composed onto the logical screen's background color
    when the frame is smaller than the screen."""
    if len(data) < 13 or not data.startswith(GIF_MAGIC) or data[4:6] not in (
        b"7a",
        b"9a",
    ):
        raise ValueError("not a GIF (bad signature)")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size < 3 * n:
            raise ValueError("GIF truncated inside global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-block chain
            if pos >= len(data):
                raise ValueError("GIF truncated at extension label")
            pos = _skip_subblocks(data, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError(f"GIF unknown block 0x{block:02x}")
        if pos + 9 > len(data):
            raise ValueError("GIF truncated in image descriptor")
        fx, fy, fw, fh, fpacked = struct.unpack("<HHHHB", data[pos : pos + 9])
        pos += 9
        pal = gct
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8)
            if pal.size < 3 * n:
                raise ValueError("GIF truncated inside local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF frame with neither local nor global "
                             "color table")
        if pos >= len(data):
            raise ValueError("GIF truncated before LZW code size")
        min_code = data[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"GIF LZW minimum code size {min_code} "
                             "out of range")
        chunks = bytearray()
        while True:
            if pos >= len(data):
                raise ValueError("GIF truncated inside image data")
            n = data[pos]
            chunks += data[pos + 1 : pos + 1 + n]
            pos += 1 + n
            if n == 0:
                break
        idx = np.frombuffer(
            _lzw_decode(min_code, bytes(chunks), fw * fh), dtype=np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx, fw, fh)
        if (idx >= len(pal)).any():
            raise ValueError("GIF pixel index outside the color table")
        frame = pal[idx]  # [fh, fw, 3]
        if (fx, fy, fw, fh) == (0, 0, sw, sh):
            return sw, sh, 3, frame
        # compose a smaller first frame onto the screen background
        screen = np.zeros((sh, sw, 3), dtype=np.uint8)
        if gct is not None and bg < len(gct):
            screen[:, :] = gct[bg]
        h2, w2 = min(fh, sh - fy), min(fw, sw - fx)
        screen[fy : fy + h2, fx : fx + w2] = frame[:h2, :w2]
        return sw, sh, 3, screen
    raise ValueError("GIF contains no image frame")
