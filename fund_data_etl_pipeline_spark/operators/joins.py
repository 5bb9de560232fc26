"""Join operators beyond Spark's built-ins (engine extension).

``asof_join`` — the time-series "most recent right row at or before the
left row's timestamp" join. Spark has no native ASOF; the scalable
formulation here is the union + forward-fill window:

    union(left tagged, right tagged)
      -> window partitionBy(key) orderBy(ts, side)   [right sorts first]
      -> last_value(right payload, ignoreNulls) up to current row
      -> keep left rows

One shuffle on the key (same as any join), no range explosion, no
per-key driver loops — this is the plan that survives 100 TB of events.

``salted_agg`` — two-stage aggregation for skewed group keys: stage 1
aggregates on (key, salt) spreading a hot key over N reducers, stage 2
merges the partials. With AQE's skew handling this is rarely needed for
joins, but hot-key GROUP BYs still benefit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    suffix: str = "_asof",
    right_order: str | None = None,
) -> DataFrame:
    """For every left row, attach the payload of the latest right row with
    ``right[right_ts] <= left[left_ts]`` and the same ``on`` key (NULLs if
    none). Ties on the timestamp resolve to the right row (>= semantics,
    matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``).

    Three row-integrity rules (r11 review):
    - the payload travels as ONE struct, so every attached column comes
      from the SAME right row — per-column forward-fills would compose a
      row that never existed whenever the matched right row holds a NULL
      in one payload column (the fill would reach back to an older row
      for just that column);
    - ``right_order`` optionally names a right column whose MAXIMUM picks
      the winner among right rows sharing the same (key, ts) — without
      it that pick is partition-order dependent (and DuckDB's native
      ASOF tie pick is documented arbitrary, so an oracle comparison
      needs the right side deduplicated either way);
    - NULL join keys never match (SQL equality semantics): a NULL-key
      right row's payload struct is NULL, so NULL-key left rows — which
      the window would otherwise group WITH them — always get NULLs.
    """
    lcols = left.columns
    struct_cols = list(dict.fromkeys(list(payload)))
    rstruct = F.when(
        F.col(on).isNotNull(),
        F.struct(*[F.col(c) for c in struct_cols]),
    )
    p_type = right.select(rstruct.alias("__p")).schema[0].dataType
    ord_src = F.col(right_order) if right_order else F.lit(0)
    ord_type = (
        right.schema[right_order].dataType if right_order else None
    )
    l = left.select(
        F.col(on),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at equal ts
        (
            F.lit(None).cast(ord_type) if right_order else F.lit(0)
        ).alias("__ord"),
        *[F.col(c).alias(f"__l_{c}") for c in lcols],
        F.lit(None).cast(p_type).alias("__p"),
    )
    r = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        ord_src.alias("__ord"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in lcols],
        rstruct.alias("__p"),
    )
    w = (
        W.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__ord").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = l.unionByName(r).select(
        "*", F.last("__p", ignorenulls=True).over(w).alias("__pf")
    )
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(f"__l_{c}").alias(c) for c in lcols],
        *[F.col("__pf")[c].alias(f"{c}{suffix}") for c in payload],
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, Column]],
    salt_col: Column,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation. ``aggs`` maps output name to
    (merge_fn_name, partial_expr): stage 1 computes partial_expr per
    (keys, salt); stage 2 merges with merge_fn (sum/min/max/...)."""
    salted = df.withColumn("__salt", F.pmod(salt_col, F.lit(buckets)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[expr.alias(f"__p_{name}") for name, (_, expr) in aggs.items()]
    )
    merged = partial.groupBy(*keys).agg(
        *[
            getattr(F, merge)(f"__p_{name}").alias(name)
            for name, (merge, _) in aggs.items()
        ]
    )
    return merged
