"""Streaming micro-batch latency probe (VERDICT r8 #6).

The streaming twins are parity-tested (bit-equal outputs vs their batch
builders) but had no LATENCY number next to their semantics. This tool
measures end-to-end micro-batch latency — trigger fire to sink commit —
for the two production streaming paths, at a realistic batch size
against the sf0.1 corpus index:

  streaming_minhash_neardup  — prebuilt persisted band index
                               (build_minhash_index parquet, the r9
                               index_tables= form), one parquet file per
                               micro-batch through a watched directory;
  streaming_curation         — the stateless-signals + within-watermark
                               dedup curation pass on the same stream.

Numbers come from the engine's own instrumentation
(StreamingQueryProgress): per-batch triggerExecution / addBatch
durations, input rows, and the state-store footprint (rows + bytes) of
the within-watermark dedup — the only stateful operator on either path,
so the reported state size IS the path's total state.

Usage: python tools/stream_probe.py [--sf /root/testdata/sf0.1]
       [--batch-rows 500] [--batches 5]

Run SOLO (probe numbers share the 32 cores; BASELINE.md note 8).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import REPO  # noqa: E402


def _stage_batches(spark, sf: str, root: str, batch_rows: int, batches: int):
    """One parquet file per micro-batch under root/in, ids offset so the
    stream never collides with index ids; returns the watched dir."""
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    import glob

    in_dir = os.path.join(root, "in")
    os.makedirs(in_dir, exist_ok=True)
    docs = (
        load_table(spark, sf, "documents")
        .withColumn("doc_id", F.col("doc_id") + F.lit(1_000_000_000))
        .limit(batch_rows * batches)
        .collect()
    )
    schema = load_table(spark, sf, "documents").schema
    for b in range(batches):
        chunk = docs[b * batch_rows : (b + 1) * batch_rows]
        stage = os.path.join(root, f"stage_b{b}")
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        # the file stream lists FILES at the watched path (no recursion):
        # surface the single part file flat, one file per micro-batch
        (part,) = glob.glob(os.path.join(stage, "part-*.parquet"))
        shutil.move(part, os.path.join(in_dir, f"batch{b}.parquet"))
        shutil.rmtree(stage)
    return in_dir


def _run_query(spark, df, root: str, name: str) -> list[dict]:
    """availableNow run to a parquet sink; returns per-batch progress."""
    out = os.path.join(root, f"out_{name}")
    ck = os.path.join(root, f"ck_{name}")
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = []
    for p in q.recentProgress:
        if p is None or p["numInputRows"] == 0:
            continue
        st = (p.get("stateOperators") or [{}])[0]
        rows.append(
            {
                "batch": p["batchId"],
                "input_rows": p["numInputRows"],
                "trigger_ms": p["durationMs"].get("triggerExecution"),
                "add_batch_ms": p["durationMs"].get("addBatch"),
                "state_rows": st.get("numRowsTotal"),
                "state_bytes": st.get("memoryUsedBytes"),
            }
        )
    return rows


def _summ(rows: list[dict]) -> dict:
    lats = sorted(r["trigger_ms"] for r in rows)
    return {
        "batches": len(rows),
        "rows_per_batch": rows[0]["input_rows"] if rows else 0,
        "trigger_ms_median": lats[len(lats) // 2] if lats else None,
        "trigger_ms_max": lats[-1] if lats else None,
        "state_rows_final": rows[-1]["state_rows"] if rows else None,
        "state_bytes_final": rows[-1]["state_bytes"] if rows else None,
        "per_batch": rows,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--batch-rows", type=int, default=500)
    ap.add_argument("--batches", type=int, default=5)
    args = ap.parse_args()

    from fund_data_etl_pipeline_spark.operators.dedup import (
        build_minhash_index,
    )
    from fund_data_etl_pipeline_spark.session import get_spark
    from fund_data_etl_pipeline_spark.sources.tables import load_table
    from fund_data_etl_pipeline_spark.streaming.file_ingest import (
        streaming_curation,
        streaming_minhash_neardup,
    )

    spark = get_spark("stream-probe")
    root = os.path.join(REPO, ".stream_probe_run")
    shutil.rmtree(root, ignore_errors=True)
    in_dir = _stage_batches(spark, args.sf, root, args.batch_rows, args.batches)

    # prebuilt persisted index — the production streaming shape
    pp = os.path.join(root, "idx_prepped")
    bp = os.path.join(root, "idx_bands")
    prepped, bands = build_minhash_index(load_table(spark, args.sf, "documents"))
    prepped.write.parquet(pp)
    bands.write.parquet(bp)

    schema = load_table(spark, args.sf, "documents").schema

    def source():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )

    results = {}
    nd = streaming_minhash_neardup(
        source(),
        index_tables=(spark.read.parquet(pp), spark.read.parquet(bp)),
    )
    results["streaming_minhash_neardup"] = _summ(
        _run_query(spark, nd, root, "neardup")
    )
    results["streaming_curation"] = _summ(
        _run_query(spark, streaming_curation(source()), root, "curation")
    )

    for name, s in results.items():
        print(
            f"{name}: {s['batches']} batches x {s['rows_per_batch']} rows, "
            f"median {s['trigger_ms_median']} ms, max {s['trigger_ms_max']} ms, "
            f"state {s['state_rows_final']} rows / {s['state_bytes_final']} B"
        )
    print(
        json.dumps(
            {
                "sf": args.sf,
                "index_docs": spark.read.parquet(pp).count(),
                "results": results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
