"""Multimodal column plumbing (engine extension: image/audio/video as
opaque ``binary`` columns with typed metadata).

The Spark-side plumbing — schemas, Arrow-batched ``mapInPandas`` operator
shape, partition sizing — is real and tested. The codec stage (round 5):
PNG decodes for real via the builtin from-spec codec
(operators/png_codec.py, zero third-party libraries); JPEG/audio/video
remain honestly STUBBED (``NotImplementedError`` naming the missing
capability) since DCT/audio codecs are genuine library territory, and
``fake=True`` substitutes a deterministic md5-derived decode so the
downstream plumbing (feature extraction, resize bookkeeping, frame
sampling) stays executable and assertable codec-independently.

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
    "media_id long, n_bytes long, sha bytes_md5 string, width int, height int, "
    "mean_luma double"
).replace("sha bytes_md5", "bytes_md5")


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

    Real path (round 5 PNG, round 6 JPEG): PNG blobs decode with the
    builtin from-spec codec (operators/png_codec.py — zlib inflate +
    scanline unfilter) and baseline JPEG blobs with the from-spec
    ITU-T T.81 decoder (operators/jpeg_codec.py — canonical Huffman +
    dequant + separable IDCT + YCbCr), so width/height/mean_luma come
    from actual pixels with zero third-party libraries. Audio/video
    remain honest ``NotImplementedError`` stubs, and ``fake=True`` keeps
    the deterministic md5 stand-in for plumbing tests that want
    codec-independent values."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg_codec import JPEG_MAGIC, decode_jpeg
        from .png_codec import PNG_MAGIC, decode_png, mean_luma

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
                else:
                    raise NotImplementedError(
                        "no builtin codec for this image format (PNG and "
                        "baseline JPEG decode from spec; others need a "
                        "library); run with fake=True for plumbing tests"
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

    return df.filter(F.col("kind") == "image").mapInPandas(
        op, schema=IMAGE_FEATURES_SCHEMA
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
