"""Stream-stream joins (engine extension): watermarked event-time
attribution — each purchase joined to the same user's clicks inside a
bounded look-back window.

This is the Structured Streaming capability the windowed-agg and keyed-
state operators don't cover: BOTH sides are unbounded, and correctness
depends on watermark-bounded state retention on each side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ATTRIBUTION_WINDOW = "30 minutes"
CLICK_WATERMARK = "1 hour"
PURCHASE_WATERMARK = "30 minutes"


def click_purchase_attribution(
    clicks: DataFrame, purchases: DataFrame
) -> DataFrame:
    """Join every purchase to the same user's clicks at most
    ``ATTRIBUTION_WINDOW`` before it (click_ts <= purchase_ts <
    click_ts + window) — last-touch candidates for ad attribution.

    Works identically on batch and streaming frames: on streams, the
    watermarks plus the two-sided event-time range condition let Spark
    BOUND the join state — clicks are dropped from state once the
    purchase-side watermark passes click_ts + window, purchases once the
    click-side watermark passes purchase_ts — so state is O(traffic in
    the window), not O(stream history). Without the range condition a
    stream-stream equi-join must keep every row forever; the condition IS
    the scale design. The join key (user_id) hash-partitions both sides
    in one co-shuffle; a pytest replays both sides in micro-batches and
    asserts the streamed result row-equals the batch join.
    """
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("value").alias("click_value"),
    )
    p = purchases.select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", CLICK_WATERMARK)
    if purchases.isStreaming:
        p = p.withWatermark("purchase_ts", PURCHASE_WATERMARK)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("purchase_ts")
            < F.col("click_ts") + F.expr(f"INTERVAL {ATTRIBUTION_WINDOW}")
        )
    )
    return c.join(p, cond, "inner").select(
        "purchase_id",
        F.col("p_user").alias("user_id"),
        "purchase_ts",
        "purchase_value",
        "click_id",
        "click_ts",
        "click_value",
    )


def enrich_with_dim(
    stream: DataFrame,
    dim: DataFrame,
    key: str = "user_id",
    attrs: list[str] | None = None,
) -> DataFrame:
    """Stream-static dimension enrichment: left-join each incoming row to
    a broadcast static dim on ``key``; unmatched rows keep NULL attrs.

    This completes the streaming join matrix next to the stream-stream
    attribution join above — and unlike it, a stream-static join is
    STATELESS: the static side is (re)read and broadcast per micro-batch,
    so no watermark, no join state, and a file-backed dim picks up
    dimension updates between batches. That makes it the right tool for
    the ingest-time enrichment the batch pipeline does with
    ``normalize.dim_join`` (J1) — identical code runs on batch frames,
    so batch/streaming parity is code-level, proven in pytest by
    replaying micro-batches against the batch join.

    ``attrs`` names the dim columns to attach; ``None`` means every dim
    column except the key AND except names the stream already has — a
    dim carrying its own ``ts``/``value`` would otherwise produce
    duplicate output columns and AMBIGUOUS_REFERENCE on the next select
    (r11 review; the batch ``dim_join`` projects the lookup columns the
    same way).
    """
    if attrs is None:
        taken = set(stream.columns)
        attrs = [c for c in dim.columns if c != key and c not in taken]
    return stream.join(
        F.broadcast(dim.select(key, *attrs)), on=key, how="left"
    )
