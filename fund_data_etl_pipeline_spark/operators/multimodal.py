"""Multimodal column plumbing (engine extension: image/audio/video as
opaque ``binary`` columns with typed metadata).

The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas`` operator
shape, partition sizing — is real and tested. The codec stage (rounds
5–6) decodes every common scraped-corpus format via builtin from-spec
codecs, zero third-party media libraries: images (PNG, baseline JPEG,
GIF, BMP, baseline TIFF), audio (PCM / G.711 / IMA-ADPCM WAV), video
containers (ISO-BMFF/MP4 metadata, MJPEG AVI metadata AND real sampled
frames through the T.81 decoder). The remaining stubs are honest and
NAMED (``NotImplementedError``): H.264/AV1 frame decode and perceptual
audio (MP3/AAC) are genuine codec-library territory. ``fake=True``
substitutes a deterministic md5-derived decode so the downstream
plumbing (feature extraction, resize bookkeeping, frame sampling)
stays executable and assertable codec-independently.

Scale notes: media blobs make rows wide — the loaders keep
``spark.sql.files.maxPartitionBytes`` small relative to blob size, and all
per-row work runs in ``mapInPandas`` so blobs stream through Arrow batches
without JVM<->Python row churn.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("fps", T.DoubleType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, bytes_md5 string, width int, height int, "
    "mean_luma double"
)


def _fake_decode(data: bytes, width: int, height: int) -> list[int]:
    """Deterministic stand-in for a pixel decode: md5-keystream bytes."""
    out: list[int] = []
    seed = data or b""
    block = b""
    counter = 0
    need = min(width * height, 256)  # bounded: plumbing test, not a codec
    while len(out) < need:
        block = hashlib.md5(seed + counter.to_bytes(4, "big")).digest()
        out.extend(block)
        counter += 1
    return out[:need]


def decode_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Image decode + feature extraction as an Arrow-batched mapInPandas
    operator.

    Real path (round 5 PNG; round 6 JPEG, GIF, BMP, TIFF): every common
    scraped-corpus still-image format decodes via a builtin from-spec
    codec — PNG (png_codec.py: zlib inflate + scanline unfilter),
    baseline JPEG (jpeg_codec.py: ITU-T T.81 canonical Huffman +
    dequant + separable IDCT + YCbCr), GIF (gif_codec.py: LZW +
    interlace + palettes), BMP (bmp_codec.py: DIB truecolor +
    palettized) and baseline TIFF (tiff_codec.py: IFD walk, strips,
    PackBits, gray/RGB/palette) — so width/height/mean_luma come from
    actual pixels with zero third-party libraries. Audio/video
    remain honest ``NotImplementedError`` stubs, and ``fake=True`` keeps
    the deterministic md5 stand-in for plumbing tests that want
    codec-independent values."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .bmp_codec import BMP_MAGIC, decode_bmp
        from .gif_codec import GIF_MAGIC, decode_gif
        from .jpeg_codec import JPEG_MAGIC, decode_jpeg
        from .png_codec import PNG_MAGIC, decode_png, mean_luma
        from .tiff_codec import TIFF_MAGIC_BE, TIFF_MAGIC_LE, decode_tiff

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["data"]) if r["data"] is not None else b""
                meta = r["meta"]
                if fake:
                    w = int(meta["width"] or 0) if meta is not None else 0
                    h = int(meta["height"] or 0) if meta is not None else 0
                    pixels = _fake_decode(data, w, h)
                    luma = (sum(pixels) / len(pixels)) if pixels else 0.0
                elif data.startswith(PNG_MAGIC):
                    w, h, _ch, px = decode_png(data)
                    luma = mean_luma(px)
                elif data.startswith(JPEG_MAGIC[:2]):
                    w, h, _ch, px = decode_jpeg(data)
                    luma = mean_luma(px)
                elif data.startswith(GIF_MAGIC):
                    w, h, _ch, px = decode_gif(data)
                    luma = mean_luma(px)
                elif data.startswith(BMP_MAGIC):
                    w, h, _ch, px = decode_bmp(data)
                    luma = mean_luma(px)
                elif data.startswith((TIFF_MAGIC_LE, TIFF_MAGIC_BE)):
                    w, h, _ch, px = decode_tiff(data)
                    luma = mean_luma(px)
                else:
                    raise NotImplementedError(
                        "no builtin codec for this image format (PNG, "
                        "baseline JPEG, GIF, BMP and baseline TIFF "
                        "decode from spec; others need a library); run "
                        "with fake=True for plumbing tests"
                    )
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(data),
                        "bytes_md5": hashlib.md5(data).hexdigest(),
                        "width": w,
                        "height": h,
                        "mean_luma": luma,
                    }
                )
            yield pd.DataFrame(rows)

    # explicit projection before the opaque op (guide §4.1): Spark cannot
    # see which columns the Python function touches, so without this every
    # column of ``df`` is shipped through Arrow and read from storage
    return (
        df.filter(F.col("kind") == "image")
        .select("media_id", "data", "meta")
        .mapInPandas(op, schema=IMAGE_FEATURES_SCHEMA)
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, bytes_md5 string, sample_rate int, "
    "channels int, n_frames long, duration_s double, rms double"
)


def decode_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio decode + feature extraction as an Arrow-batched mapInPandas
    operator — the audio twin of ``decode_image_features``.

    Real path (round 6): linear-PCM WAV blobs decode with the builtin
    from-spec RIFF codec (operators/wav_codec.py — chunk walk + 8/16/
    24/32-bit PCM), and FLAC blobs with the builtin from-spec RFC 9639
    decoder (operators/flac_codec.py — fixed + LPC subframes,
    partitioned Rice, stereo decorrelation, CRC-verified frames), so
    sample_rate/channels/duration/rms come from actual samples with
    zero third-party libraries. Compressed-lossy audio (MP3/AAC) raises
    a named error -> S7-style quarantine at the caller; ``fake=True``
    substitutes the deterministic md5 keystream (scaled to [-1, 1)) for
    plumbing tests that want codec-independent values."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .flac_codec import FLAC_MAGIC, decode_flac
        from .wav_codec import (
            AIFF_MAGIC,
            WAV_MAGIC,
            decode_aiff,
            decode_wav,
            rms,
        )

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["data"]) if r["data"] is not None else b""
                meta = r["meta"]
                if fake:
                    rate = (
                        int(meta["sample_rate"] or 0)
                        if meta is not None
                        else 0
                    )
                    ch = 1
                    keyst = _fake_decode(data, 16, 16)
                    samples = (
                        np.array(keyst, dtype=np.float64)[:, None] - 128.0
                    ) / 128.0
                elif data.startswith(WAV_MAGIC):
                    rate, ch, samples = decode_wav(data)
                elif data.startswith(FLAC_MAGIC):
                    rate, ch, samples = decode_flac(data)
                elif data.startswith(AIFF_MAGIC):
                    rate, ch, samples = decode_aiff(data)
                else:
                    raise NotImplementedError(
                        "no builtin codec for this audio format (linear-"
                        "PCM/G.711/ADPCM WAV, AIFF and FLAC decode from "
                        "spec; MP3/AAC need a DSP library); run with "
                        "fake=True for plumbing tests"
                    )
                frames = int(samples.shape[0])
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(data),
                        "bytes_md5": hashlib.md5(data).hexdigest(),
                        "sample_rate": rate,
                        "channels": ch,
                        "n_frames": frames,
                        "duration_s": (frames / rate) if rate else 0.0,
                        "rms": rms(samples),
                    }
                )
            yield pd.DataFrame(rows)

    # column pruning before the opaque op — see decode_image_features
    return (
        df.filter(F.col("kind") == "audio")
        .select("media_id", "data", "meta")
        .mapInPandas(op, schema=AUDIO_FEATURES_SCHEMA)
    )


VIDEO_META_SCHEMA = (
    "media_id long, n_bytes long, bytes_md5 string, duration_s double, "
    "width int, height int, n_frames int, fps double"
)


def decode_video_meta(df: DataFrame) -> DataFrame:
    """Video CONTAINER metadata from real bytes as an Arrow-batched
    mapInPandas operator (round 6): ISO-BMFF/MP4 blobs parse with the
    builtin from-spec box reader (operators/mp4_meta.py — mvhd/tkhd/stsz
    walk) and MJPEG AVI blobs with the from-spec RIFF demuxer
    (operators/avi_mjpeg.py — avih/strh/movi), so duration/dims/
    frame-count/fps come from the file, not from caller-supplied
    metadata; ``sample_frames`` can then run on a meta column rebuilt
    from these values. FRAME decode is real for MJPEG
    (``decode_video_frames``) and an honest named stub for H.264/AV1
    (entropy decoding is codec-library territory); other containers
    raise the named ``NotImplementedError`` -> S7 quarantine at the
    caller."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi_mjpeg import AVI_MAGIC, read_avi_meta
        from .mp4_meta import read_mp4_meta

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["data"]) if r["data"] is not None else b""
                if len(data) >= 12 and data[4:8] == b"ftyp":
                    m = read_mp4_meta(data)
                elif data.startswith(AVI_MAGIC) and data[8:12] == b"AVI ":
                    m = read_avi_meta(data)
                else:
                    raise NotImplementedError(
                        "no builtin container reader for this video "
                        "format (ISO-BMFF/MP4 and MJPEG AVI parse from "
                        "spec; MKV/others need a demuxer library)"
                    )
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "n_bytes": len(data),
                        "bytes_md5": hashlib.md5(data).hexdigest(),
                        **m,
                    }
                )
            yield pd.DataFrame(rows)

    # column pruning before the opaque op — see decode_image_features
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "data")
        .mapInPandas(op, schema=VIDEO_META_SCHEMA)
    )


RESIZE_SCHEMA = "media_id long, out_width int, out_height int, scale double"


def resize_plan(df: DataFrame, target: int = 224) -> DataFrame:
    """Resize bookkeeping (shortest-side -> target, aspect preserved) as a
    pure expression — the actual pixel resample belongs in the stubbed
    codec stage."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.lit(float(target)) / F.least(w, h)
    return df.filter(F.col("kind") == "image").select(
        "media_id",
        F.round(w * scale).cast("int").alias("out_width"),
        F.round(h * scale).cast("int").alias("out_height"),
        F.round(scale, 6).alias("scale"),
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plan: one output row per sampled frame index —
    pure sequence+explode, the decode of each frame is the stubbed stage."""
    n = F.coalesce(F.col("meta.n_frames"), F.lit(0))
    idx = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
    return (
        df.filter((F.col("kind") == "video") & (n > 0))
        .select("media_id", F.explode(idx).alias("frame_index"))
    )


FRAME_FEATURES_SCHEMA = (
    "media_id long, frame_index int, width int, height int, "
    "mean_luma double"
)


def decode_video_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """REAL sampled-frame decode for MJPEG AVI videos (round 6): the
    from-spec RIFF demuxer (operators/avi_mjpeg.py) yields each '##dc'
    frame chunk, which for the MJPG handler is a baseline JPEG the
    from-spec ITU-T T.81 decoder turns into pixels — so per-frame
    width/height/mean_luma come from actual video frames with zero
    media libraries. Every ``every_n``-th frame is decoded (the
    ``sample_frames`` cadence applied at the demuxer, so skipped frames
    are never entropy-decoded). Non-MJPEG video (H.264/AV1 in MP4)
    raises the named error -> S7 quarantine; that stub is the honest
    boundary, this path is the proof the plumbing is real."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi_mjpeg import AVI_MAGIC, iter_mjpeg_frames
        from .jpeg_codec import decode_jpeg
        from .png_codec import mean_luma

        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["data"]) if r["data"] is not None else b""
                if not (
                    data.startswith(AVI_MAGIC) and data[8:12] == b"AVI "
                ):
                    raise NotImplementedError(
                        "frame decode is builtin for MJPEG AVI only "
                        "(H.264/AV1 need a codec library)"
                    )
                for idx, jpeg in iter_mjpeg_frames(data):
                    if idx % every_n:
                        continue
                    w, h, _ch, px = decode_jpeg(jpeg)
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_index": idx,
                            "width": w,
                            "height": h,
                            "mean_luma": mean_luma(px),
                        }
                    )
            yield pd.DataFrame(rows)

    # column pruning before the opaque op — see decode_image_features
    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "data")
        .mapInPandas(op, schema=FRAME_FEATURES_SCHEMA)
    )
