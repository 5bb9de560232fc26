"""Minimal from-spec PCM WAV decoder (the multimodal audio stage).

Fifth from-spec codec after operators/xls_writer.py (BIFF8/CFB),
sources/pdf_text.py (ISO 32000), operators/png_codec.py (W3C PNG) and
operators/jpeg_codec.py (ITU-T T.81): linear-PCM WAV is the RIFF
container (Microsoft/IBM WAVE spec, public) around raw samples — pure
struct parsing plus numpy, no DSP library needed:

- RIFF/WAVE chunk walk: ``fmt `` (format tag, channels, sample rate,
  bits per sample), ``data`` payload; other chunks (LIST, fact, cue)
  skipped; word-aligned chunk sizes honored (odd sizes pad one byte);
- sample decode: 8-bit unsigned and 16/24/32-bit signed little-endian
  PCM to float64 in [-1, 1), interleaved channels -> [frames, channels];
- ITU-T G.711 logarithmic companding (format tags 6 = A-law, 7 = mu-law;
  the telephony-corpus standard): 8-bit companded bytes expand to the
  spec's 13/14-bit linear values via the published segment/mantissa
  formulas (G.711 Tables 1a/2a), scaled into 16-bit range like every
  reference C implementation, then normalized by 32768.

Out of scope, raising a NAMED error (the S7 quarantine convention —
never silently wrong): other compressed formats (MP3/AAC/ADPCM/
IEEE-float/extensible need real DSP or float handling the corpora we
model don't), and truncated containers. Round-trip tests in
tests/test_wav_codec.py drive this against an independently-written
in-test WAV writer, and the G.711 expanders against an in-test
compressor implementing the spec's forward (compress) direction.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"

# WAVE format tags (RIFF registry): linear PCM plus the two G.711
# companded telephony formats this codec expands from spec
_TAG_PCM = 1
_TAG_ALAW = 6
_TAG_MULAW = 7


def expand_mulaw(b: np.ndarray) -> np.ndarray:
    """ITU-T G.711 mu-law byte -> linear float64 in [-1, 1).

    The transmitted byte is the COMPLEMENT of sign|exponent|mantissa
    (G.711 §, Table 2a). Decode: u = ~b; seg = bits 4-6, mantissa =
    bits 0-3; magnitude = ((mantissa << 3) + 0x84) << seg, minus the
    0x84 bias — the standard 14-bit value left-shifted into 16-bit
    range (max 32124), normalized by 32768.
    """
    u = (~b.astype(np.int64)) & 0xFF
    sign = (u & 0x80) != 0
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << seg) - 0x84
    return np.where(sign, -mag, mag).astype(np.float64) / 32768.0


def expand_alaw(b: np.ndarray) -> np.ndarray:
    """ITU-T G.711 A-law byte -> linear float64 in [-1, 1).

    The transmitted byte has even bits inverted (0x55 toggle, G.711
    Table 1a). Decode: u = b ^ 0x55; seg = bits 4-6, mantissa = bits
    0-3; segment 0 is linear ((mantissa << 4) + 8), higher segments add
    the implicit leading 1 and shift (((mantissa << 4) + 0x108) <<
    (seg - 1)) — the 13-bit value left-shifted into 16-bit range
    (max 32256), normalized by 32768.
    """
    u = b.astype(np.int64) ^ 0x55
    # A-law sign convention is INVERTED vs mu-law: bit 7 set = positive
    positive = (u & 0x80) != 0
    seg = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(positive, mag, -mag).astype(np.float64) / 32768.0


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """(sample_rate, channels, samples[frames, channels] float64 in
    [-1, 1)) of a linear-PCM WAV blob."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (missing RIFF/WAVE header)")
    pos = 12
    fmt = None
    payload = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated")
            tag, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if tag not in (_TAG_PCM, _TAG_ALAW, _TAG_MULAW):
                raise ValueError(
                    f"WAV format tag {tag} (non-PCM: float/compressed/"
                    "extensible) not supported — linear PCM or G.711 "
                    "A-law/mu-law only"
                )
            fmt = (tag, channels, rate, bits)
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("WAV data chunk truncated")
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk (truncated?)")
    tag, channels, rate, bits = fmt
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if tag in (_TAG_ALAW, _TAG_MULAW):
        if bits != 8:
            raise ValueError(
                f"G.711 WAV must be 8 bits per sample, got {bits}"
            )
        expand = expand_alaw if tag == _TAG_ALAW else expand_mulaw
        x = expand(np.frombuffer(payload, dtype=np.uint8))
    elif bits == 8:  # unsigned
        x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif bits == 16:
        x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
    elif bits in (24, 32):
        width = bits // 8
        n = len(payload) // width
        raw = np.frombuffer(
            payload[: n * width], dtype=np.uint8
        ).reshape(n, width)
        # little-endian sign-extend to int32
        acc = np.zeros(n, dtype=np.int64)
        for i in range(width):
            acc |= raw[:, i].astype(np.int64) << (8 * i)
        sign = 1 << (bits - 1)
        acc = (acc ^ sign) - sign
        x = acc.astype(np.float64) / float(sign)
    else:
        raise ValueError(f"{bits}-bit WAV PCM not supported (8/16/24/32)")
    frames = len(x) // channels
    return rate, channels, x[: frames * channels].reshape(frames, channels)


def rms(samples: np.ndarray) -> float:
    """Root-mean-square level over all channels — the loudness feature
    the audio-features operator extracts."""
    if samples.size == 0:
        return 0.0
    return float(np.sqrt(np.mean(np.square(samples))))
