"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes through the ``noop`` sink — full computation of every
operator, no driver-side collect — so the numbers measure the engine, not
Arrow transfer.

Methodology: every headline query is first executed once at sf0.001 to pay
Catalyst plan compile + JVM JIT (which at production scale amortizes to
zero — the same generated code runs over 10^6x more data), then timed at
the target SF. Per-query numbers therefore measure steady-state data-path
throughput; run-to-run JIT variance on the small local corpus was +/-4x
before this (text_quality 2.9s vs 13s on identical code).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "dim_join_left",
    "group_merge",
    "date_math",
    "window_running",
    "when_cascade_tier",
    "events_session_window",
    "fund_dividend",
    "fund_dividend_scaled",
    "text_quality",
    "text_fingerprint",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_spans",
    "contamination_check",
    "sequence_packing",
    "stratified_sample",
    "vector_cosine_topk",
    # round-3 event-analytics + mixing stages
    "source_mixture_weights",
    "user_retention_cohorts",
    "events_funnel",
    "event_value_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from fund_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()

    # warm plan compile + JIT for every headline query on the tiny SF so
    # the timed pass below measures the data path, not codegen
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    for name in HEADLINE:
        try:
            qs[name](spark, warm_dir).write.format("noop").mode("overwrite").save()
        except Exception:
            pass  # the timed pass records the failure per-query
    spark.catalog.clearCache()

    # Per-query fault isolation: a single broken query (e.g. a testdata
    # schema change) must cost its own number, never the whole JSON line —
    # round 2's bench was lost entirely to one AnalysisException.
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_suite = time.time()
    for name in HEADLINE:
        t0 = time.time()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)
        finally:
            # queries persist intermediates (LSH signature tables, prepped
            # embeddings) and never unpersist — across a 22-query session
            # the accumulated storage memory squeezes execution and GC,
            # inflating later queries 5-10x. Each query is timed cold.
            spark.catalog.clearCache()
    total = round(time.time() - t_suite, 3)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    payload = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload, ensure_ascii=False))
    spark.stop()


if __name__ == "__main__":
    main()
