"""Structured Streaming file ingestion (engine extension; SURVEY.md §2.12).

The reference is a manually-triggered daily batch over a dated folder tree
(`<root>/<year>/<YYYYMMDD>/...`, dividend_extractor.py:1265) where new
statement files appear during the day. The streaming engine models exactly
that: a file source watching the corpus directory, incremental processing
with ``Trigger.AvailableNow`` (catch-up-and-stop, the daily-run analogue)
or continuous micro-batches, checkpointed so every file is processed once.

At scale: the file source lists incrementally, state lives in the
checkpoint, and the same single-scan extract pipeline (jobs.py) applies
per micro-batch unchanged — batch/streaming parity is the point of
Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import FUND_DOCUMENTS_SCHEMA


def read_document_stream(
    spark: SparkSession, path: str, fmt: str = "json"
) -> DataFrame:
    """Incremental document source over a watched directory."""
    return (
        spark.readStream.schema(FUND_DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 100)
        .format(fmt)
        .load(path)
    )


def stream_dividend_pipeline(docs_stream: DataFrame, dim: DataFrame, run_date: str):
    """The batch dividend pipeline applied to a stream — same plan, the
    explode/normalize/broadcast-join stages are all stateless so no
    watermark is needed until an aggregation is added."""
    from .. import jobs

    return jobs.dividend_job(docs_stream, dim, run_date)


def write_available_now(
    df: DataFrame, out_path: str, checkpoint: str, fmt: str = "parquet"
):
    """Catch-up-and-stop write: processes everything currently in the
    source (the daily-run analogue), exactly-once via the checkpoint."""
    return (
        df.writeStream.format(fmt)
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming tumbling-window counts with late-data handling: events
    later than the watermark are dropped, window state is evicted once the
    watermark passes the window end."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_dedup(
    docs_stream: DataFrame,
    watermark: str = "1 hour",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact dedup: drop re-ingested duplicates by the SAME
    normalized content hash as the batch ``operators/dedup.exact_dedup``
    (batch/streaming parity on the dedup key). ``dropDuplicatesWithin
    Watermark`` keeps per-key state only inside the watermark horizon, so
    state is bounded at any ingest rate — ``dropDuplicates`` on a stream
    would grow state forever. Re-deliveries beyond the horizon fall
    through to the batch dedup pass; the two stages compose.

    Contentless rows (text NULL — the extract_text parse-failure shape)
    hash to NULL, and dropDuplicatesWithinWatermark groups NULL keys as
    EQUAL — without a guard every distinct parse-failure doc after the
    first would be silently dropped as a "duplicate" (r11 review). No
    content = no content identity: the state key falls back to the doc
    id, so distinct contentless docs all pass through while true
    same-id re-deliveries still collapse."""
    from ..functions.text import normalized_md5

    hashed = (
        docs_stream.withColumn(
            "content_hash", normalized_md5(F.col(text_col))
        )
        .withColumn("ingest_ts", F.current_timestamp())
        .withColumn(
            "__dk",
            F.coalesce(
                F.col("content_hash"),
                F.concat(
                    F.lit("__contentless__:"), F.col(id_col).cast("string")
                ),
            ),
        )
    )
    return (
        hashed.withWatermark("ingest_ts", watermark)
        .dropDuplicatesWithinWatermark(["__dk"])
        .drop("__dk")
    )


def streaming_minhash_neardup(
    docs_stream: DataFrame,
    index_docs: DataFrame | None = None,
    threshold: float = 0.8,
    watermark: str = "1 hour",
    index_tables: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Streaming incremental NEAR-dup against a persisted minhash band
    index (VERDICT r7 #8) — completes the dedup family's
    batch/streaming story next to streaming_dedup's exact-hash form.
    This is literally the batch ``operators/dedup.
    incremental_minhash_pairs`` builder applied to a stream (the
    attribution_join shared-builder parity pattern): banding via the
    same minhash_band_keys code as the full-corpus path, candidates via
    a stream-static equi-join against the capped index band table,
    exact hashed-shingle jaccard verify, within-watermark pair dedup as
    the only stateful operator (bounded state at any ingest rate).
    Output: (d1 = index doc, d2 = incoming doc, jaccard) verified
    pairs; "d2 appeared" is the dup signal a curation sink filters on.

    ``index_tables=(prepped, bands)`` passes a PREBUILT persisted index
    (operators/dedup.build_minhash_index written to storage) straight
    through — the production streaming shape: the long-running query
    reads static index parquet instead of re-prepping the corpus at
    start-up. tools/stream_probe.py times exactly this form."""
    from ..operators.dedup import incremental_minhash_pairs

    return incremental_minhash_pairs(
        docs_stream,
        index_docs,
        threshold=threshold,
        watermark=watermark,
        index_tables=index_tables,
    )


def streaming_curation(
    docs_stream: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """The corpus-curation pass on a document STREAM: identical per-row
    signal columns as the batch ``plans/textops.corpus_curation``
    (imported, not reimplemented — parity is column-level), with batch
    exact-dup canonicality replaced by within-watermark first-occurrence
    dedup on the same content hash. Kept rows stream straight to the
    training sink; re-deliveries beyond the watermark horizon fall
    through to the periodic batch pass, exactly like ``streaming_dedup``.

    Scale shape: signals are stateless map-only columns (no state at
    all); the only stateful operator is dropDuplicatesWithinWatermark,
    whose per-key state is bounded by the horizon. NULL-text rows take a
    per-doc fallback state key like streaming_dedup, so distinct
    parse-failure docs are never collapsed as NULL-key "duplicates"
    (they are then dropped by the quality gate, not by dedup)."""
    from ..plans.textops import curation_quality_keep, with_curation_signals

    # append-form signals: every source column (text, filename, ...)
    # stays on the row so kept documents really can stream to the sink
    sig = (
        with_curation_signals(docs_stream)
        .withColumn("ingest_ts", F.current_timestamp())
        .withColumn(
            "__dk",
            F.coalesce(
                F.col("__h"),
                F.concat(
                    F.lit("__contentless__:"), F.col("doc_id").cast("string")
                ),
            ),
        )
    )
    deduped = sig.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["__dk"]
    )
    return deduped.filter(curation_quality_keep()).drop(
        "ingest_ts", "__h", "__dk"
    )


def windowed_distinct_users(
    events_stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    rsd: float = 0.05,
) -> DataFrame:
    """Streaming windowed DISTINCT-user rollup via the HLL sketch — the
    streaming twin of the batch ``event_value_stats_approx`` path. Exact
    ``count_distinct`` is unsupported in streaming aggregations for a
    reason: its state is the full value set per (window, type) group;
    ``approx_count_distinct`` keeps one constant-size sketch per group
    and merges it across micro-batches, so state stays bounded at any
    ingest rate. Watermark evicts closed windows' sketches — the same
    bounded-state discipline as ``windowed_event_counts``."""
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.approx_count_distinct("user_id", rsd).alias("n_users"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
            "n_users",
        )
    )


def streaming_dim_maintenance(
    changes_stream: DataFrame,
    base: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
):
    """Continuously-maintained dimension table (r10 — the streaming twin
    of ``operators/normalize.merge_dim``, closing the dim-CRUD story the
    way streaming_cdc_snapshot closes the fact-CDC one): each
    micro-batch of the change feed folds into the current dimension via
    THE SAME ``merge_dim`` builder the batch query registers
    (shared-builder parity, the attribution_join pattern), and the
    merged dimension is committed as a new immutable version directory
    with an atomically-replaced ``_CURRENT`` pointer.

    Correctness contract: with per-key seq monotone in arrival order
    across micro-batches (any keyed, ordered change feed — the standard
    CDC delivery assumption the other streaming twins also make), the
    fold is EQUAL to one batch ``merge_dim(base, union_of_all_changes)``
    — merge_dim's last-write-wins per key composes associatively over a
    seq-ordered partition of the feed. The parity pytest replays a
    split feed and asserts bit-equality with the batch form.

    Scale shape: the dimension is small by definition (the reference's
    is ~10^2 rows) — each fold is one broadcast anti-join + union, and
    the version commit is a full rewrite of a tiny table. On a cluster
    the version-directory + pointer-file device becomes the table
    format's atomic commit (Delta/Iceberg MERGE INTO); this stand-in
    keeps the engine dependency-free while preserving the semantics
    (immutable versions, atomic pointer swap, idempotent per-batch-id
    overwrite so checkpoint replays converge).

    Version directories are keyed by (streaming-query id, batch id):
    ``q{id8}_v{batchId}``. Batch ids are only unique WITHIN one
    checkpoint — a LOST checkpoint restarts numbering at 0 over a
    superset feed, and r10's bare ``v{batchId}`` naming let that replay
    rewrite the committed v0 and move ``_CURRENT`` backwards (ADVICE
    r10). The query id lives in the checkpoint's metadata file, so a
    wiped checkpoint mints a fresh id and the recovery fold lands in a
    fresh namespace: old versions stay immutable, within-checkpoint
    crash replays still overwrite their own deterministic path, and the
    lost-checkpoint re-fold converges because merge_dim re-application
    is idempotent under the monotone-seq contract (parity pytest)."""
    import json
    import os

    from ..operators.normalize import merge_dim

    def _query_ns() -> str:
        meta = os.path.join(checkpoint_dir, "metadata")
        try:
            with open(meta) as fh:
                return "q" + json.load(fh)["id"].replace("-", "")[:8]
        except (OSError, KeyError, ValueError):
            # metadata is written at stream start, before batch 0; an
            # unreadable file means a non-local checkpoint store — fall
            # back to a location-stable namespace (weaker: a wiped
            # SAME-PATH checkpoint reuses it, restoring only the r10
            # pointer==vdir guarantee)
            import hashlib

            return "q" + hashlib.md5(checkpoint_dir.encode()).hexdigest()[:8]

    def _fold(batch_df: DataFrame, batch_id: int) -> None:
        sess = batch_df.sparkSession
        cur_file = os.path.join(out_dir, "_CURRENT")
        vdir = os.path.join(out_dir, f"{_query_ns()}_v{batch_id}")
        if os.path.exists(cur_file):
            with open(cur_file) as fh:
                cur = fh.read().strip()
            if cur == vdir:
                # checkpoint replay AFTER the pointer committed: this
                # batch's fold already completed — and re-folding here
                # would read and overwrite the SAME parquet path. The
                # pointer only ever advances after a successful version
                # write, so pointer==vdir proves the merged result is
                # already on disk.
                return
            current = sess.read.parquet(cur)
        else:
            current = base
        # overwrite => a replayed batch id (same-checkpoint restart)
        # rewrites ITS OWN version path instead of double-applying; a
        # different checkpoint's committed versions are out of reach by
        # the namespace construction above
        merge_dim(current, batch_df).write.mode("overwrite").parquet(vdir)
        tmp = cur_file + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(vdir)
        os.replace(tmp, cur_file)

    return (
        changes_stream.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
