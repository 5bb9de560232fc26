"""Deterministic sampling / dataset-split operators (engine extension:
the split stage of a large-scale training-data pipeline).

Both operators key on ``H(salt || id)`` — the cross-engine md5 hash from
functions/text.py — so assignment is

- deterministic: re-running the pipeline (or re-reading a partition after
  failure) assigns every row identically; no RNG state, no seed plumbing
- stable under growth: adding documents never reassigns existing ones
  (each row's bucket depends only on its own id), unlike fraction-based
  ``df.sample``/``randomSplit`` whose membership shifts with partitioning
- map-only: a pure per-row expression, no shuffle, trivially 100 TB-safe

The salt separates independent splits (e.g. a train/val/test split and a
10% eval sample must not correlate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_hash

SPLIT_BUCKETS = 10_000  # 0.01% assignment granularity


def split_bucket(id_col: Column, salt: str) -> Column:
    """The row's deterministic bucket in [0, SPLIT_BUCKETS)."""
    return word_hash(F.concat(F.lit(salt), id_col.cast("string"))) % SPLIT_BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    salt: str = "split-v1",
    weights: tuple[tuple[str, float], ...] = (
        ("train", 0.8),
        ("val", 0.1),
        ("test", 0.1),
    ),
) -> DataFrame:
    """Assign every row to a named split by hash bucket: cumulative weight
    thresholds over ``split_bucket``. Appends ``bucket`` and ``split``."""
    bucket = split_bucket(F.col(id_col), salt)
    out = df.withColumn("bucket", bucket)
    expr = None
    acc = 0.0
    for name, w in weights:
        acc += w
        cond = F.col("bucket") < int(round(acc * SPLIT_BUCKETS))
        expr = (
            F.when(cond, F.lit(name))
            if expr is None
            else expr.when(cond, F.lit(name))
        )
    # rows past the last threshold (weights summing < 1) fall in the last
    # split, keeping the assignment total
    return out.withColumn("split", expr.otherwise(F.lit(weights[-1][0])))


def hash_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "sample-v1",
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose bucket falls
    below ``rate``. Same row set every run, any partitioning."""
    return df.filter(
        split_bucket(F.col(id_col), salt) < int(round(rate * SPLIT_BUCKETS))
    )
