"""Parquet loaders for the synthetic star schema (TESTDATA.md).

All reads are plain ``spark.read.parquet`` — Catalyst pushes filters and
prunes columns into the scan, so loaders never pre-select; callers declare
what they need and the optimizer trims the ``ReadSchema``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) (which Spark's
        # vectorized reader rejects) in some generator versions and as plain
        # TIMESTAMP(MICROS) in others. Enable the nanos-as-long fallback
        # (a no-op for micros) and adapt on the decoded type so both
        # generations load to a microsecond timestamp.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":  # raw nanos from the legacy fallback
            df = df.withColumn(
                "ts", F.expr("timestamp_micros(cast(ts / 1000 as long))")
            )
        elif ts_type == "timestamp_ntz":
            # session tz is pinned to UTC (session.py), so this cast is a
            # pure type-system normalization with identical wall-clock values
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
