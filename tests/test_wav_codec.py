"""Round-trip tests for the from-spec PCM WAV decoder
(operators/wav_codec.py): an independently-written minimal RIFF/WAVE
writer here builds real WAV byte streams (fmt + data chunks, 8/16/24-bit
PCM, word alignment, skippable LIST chunk), and the decoder must read
the samples back exactly — the xls_writer/pdf_text/png/jpeg round-trip
strategy applied to audio.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest


def write_wav(
    samples: np.ndarray,
    rate: int = 16000,
    bits: int = 16,
    extra_chunk: bool = False,
) -> bytes:
    """In-test RIFF/WAVE writer: samples[frames, channels] float64 in
    [-1, 1) -> linear PCM."""
    frames, channels = samples.shape
    flat = samples.reshape(-1)
    if bits == 8:
        payload = (np.round(flat * 128.0) + 128.0).clip(0, 255).astype(
            np.uint8
        ).tobytes()
    elif bits == 16:
        payload = (
            np.round(flat * 32768.0).clip(-32768, 32767).astype("<i2").tobytes()
        )
    elif bits == 24:
        ints = np.round(flat * (1 << 23)).clip(
            -(1 << 23), (1 << 23) - 1
        ).astype(np.int64)
        b = bytearray()
        for v in ints:
            b += int(v & 0xFFFFFF).to_bytes(3, "little")
        payload = bytes(b)
    else:
        raise ValueError(bits)
    ba = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * ba, ba, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # a skippable odd-sized chunk exercises word alignment
        note = b"tool"
        chunks += b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    chunks += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _tone(frames=800, channels=2, rate=16000):
    t = np.arange(frames) / rate
    left = 0.5 * np.sin(2 * np.pi * 440 * t)
    right = 0.25 * np.sin(2 * np.pi * 880 * t)
    return np.stack([left, right], axis=1)[:, :channels]


def test_roundtrip_16bit_stereo():
    from fund_data_etl_pipeline_spark.operators.wav_codec import decode_wav

    s = _tone()
    rate, ch, back = decode_wav(write_wav(s, bits=16))
    assert (rate, ch) == (16000, 2)
    assert back.shape == s.shape
    assert np.abs(back - s).max() <= 1.0 / 32768.0  # one quantization step


def test_roundtrip_8bit_and_24bit_with_extra_chunk():
    from fund_data_etl_pipeline_spark.operators.wav_codec import decode_wav

    s = _tone(frames=321, channels=1)[:, :1]
    for bits, step in ((8, 1.0 / 128.0), (24, 1.0 / (1 << 23))):
        rate, ch, back = decode_wav(
            write_wav(s, bits=bits, extra_chunk=True)
        )
        assert (rate, ch) == (16000, 1)
        assert back.shape == s.shape
        assert np.abs(back - s).max() <= step


def test_rms_matches_numpy():
    from fund_data_etl_pipeline_spark.operators.wav_codec import (
        decode_wav,
        rms,
    )

    s = _tone()
    _, _, back = decode_wav(write_wav(s))
    assert abs(rms(back) - float(np.sqrt(np.mean(s**2)))) < 1e-3


def test_named_errors():
    from fund_data_etl_pipeline_spark.operators.wav_codec import decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3\x03mp3-ish-bytes")
    blob = bytearray(write_wav(_tone(frames=10)))
    i = blob.index(b"fmt ") + 8
    blob[i:i + 2] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(ValueError, match="format tag 3"):
        decode_wav(bytes(blob))
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(write_wav(_tone(frames=10))[:-25])


def test_audio_features_real_wav_path(spark):
    """The Spark operator must run the REAL WAV decode (fake=False):
    sample_rate/duration/rms from the actual PCM samples."""
    from fund_data_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_audio_features,
    )

    s = _tone(frames=1600)
    blob = write_wav(s, rate=16000, bits=16)
    rows = [
        (7, "audio", blob, (None, None, None, 16000, None, None)),
        (8, "image", b"\x89PNGnotaudio", (4, 4, 3, None, None, None)),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_audio_features(df, fake=False).collect()
    assert len(out) == 1  # kind filter drops the image row
    r = out[0]
    assert r["sample_rate"] == 16000 and r["channels"] == 2
    assert r["n_frames"] == 1600
    assert abs(r["duration_s"] - 0.1) < 1e-9
    expected_rms = float(np.sqrt(np.mean(s**2)))
    assert abs(r["rms"] - expected_rms) < 1e-3


def test_audio_features_quarantines_compressed(spark):
    from fund_data_etl_pipeline_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_audio_features,
    )

    rows = [(9, "audio", b"\xff\xfb\x90mp3frame", (None, None, None, 44100, None, None))]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    with pytest.raises(Exception) as e:
        decode_audio_features(df, fake=False).collect()
    assert "NotImplementedError" in str(e.value) or "codec" in str(e.value)
