"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query executes through the ``noop`` sink — full computation of every
operator, no driver-side collect — so the numbers measure the engine, not
Arrow transfer.
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
    "vector_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from fund_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("bench")
    qs = e.queries()

    # warm the JVM + parquet footers once so per-query times are steady-state
    qs["pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    t_suite = time.time()
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    total = round(time.time() - t_suite, 3)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            },
            ensure_ascii=False,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
