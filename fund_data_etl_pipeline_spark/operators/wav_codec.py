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
  PCM to float64 in [-1, 1), interleaved channels -> [frames, channels].

Out of scope, raising a NAMED error (the S7 quarantine convention —
never silently wrong): compressed formats (format tag != 1 — MP3/AAC/
IEEE-float/extensible need real DSP or float handling the corpora we
model don't), and truncated containers. Round-trip tests in
tests/test_wav_codec.py drive this against an independently-written
in-test WAV writer.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


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
            if tag != 1:
                raise ValueError(
                    f"WAV format tag {tag} (non-PCM: float/compressed/"
                    "extensible) not supported — linear PCM only"
                )
            fmt = (channels, rate, bits)
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("WAV data chunk truncated")
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or payload is None:
        raise ValueError("WAV missing fmt/data chunk (truncated?)")
    channels, rate, bits = fmt
    if channels < 1:
        raise ValueError("WAV with zero channels")
    if bits == 8:  # unsigned
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
