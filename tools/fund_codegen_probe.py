"""A/B probe for the fund cascade's compile cost (VERDICT r13 #5).

fund_dividend / fund_dividend_scaled exec is dominated by Catalyst
optimization + whole-stage-codegen compilation of the 87-rule CASE
cascade — data-independent driver/JIT cost that amortizes at production
scale. This probe measures whether any codegen-side session config moves
that cost at sf0.1, using the bench's exact methodology (uncounted cold
pass, then fresh-rebuild timed passes, min), one VARIANT per process so
each config set gets a fresh JVM + JIT.

Variants (all Spark-documented public configs):
  base            — the shipped session defaults
  split512        — spark.sql.codegen.methodSplitThreshold=512 (smaller
                    generated methods -> more JIT-friendly, maybe)
  split4096       — =4096 (fewer, bigger methods)
  nosubexpr       — spark.sql.subexpressionElimination.enabled=false
  nowholestage    — spark.sql.codegen.wholeStage=false (interpreted
                    expressions; measures how much of exec IS codegen)

Usage:  python tools/fund_codegen_probe.py [--variant NAME]
Without --variant, re-execs itself once per variant and prints a table.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["fund_dividend", "fund_dividend_scaled"]
VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "split512": {"spark.sql.codegen.methodSplitThreshold": "512"},
    "split4096": {"spark.sql.codegen.methodSplitThreshold": "4096"},
    "nosubexpr": {"spark.sql.subexpressionElimination.enabled": "false"},
    "nowholestage": {"spark.sql.codegen.wholeStage": "false"},
}


def calibration() -> float:
    import numpy as np

    a = np.random.RandomState(0).rand(2_000_000)
    t0 = time.time()
    for _ in range(2):
        np.sort(a, kind="mergesort").sum()
    return round(time.time() - t0, 3)


def run_variant(name: str) -> None:
    from fund_data_etl_pipeline_spark.session import get_spark
    from fund_data_etl_pipeline_spark import plans

    plans.load_all()
    extra = VARIANTS[name]
    spark = get_spark(f"fundprobe-{name}", extra_conf=extra)
    out = {"variant": name, "calib": calibration(), "queries": {}}
    for q in QUERIES:
        fn = plans.QUERIES[q]
        # uncounted cold pass (codegen + C2 JIT at full size)
        df = fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        times = []
        for _ in range(3):
            t0 = time.time()
            df = fn(spark, SF)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        out["queries"][q] = {"min": min(times), "all": times}
    out["calib_after"] = calibration()
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 2 and sys.argv[1] == "--variant":
        run_variant(sys.argv[2])
        return
    rows = []
    for name in VARIANTS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--variant", name],
            capture_output=True, text=True, timeout=900,
        )
        line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        if not line:
            print(f"{name}: FAILED\n{r.stdout[-500:]}\n{r.stderr[-500:]}")
            continue
        d = json.loads(line[-1])
        rows.append(d)
        qs = "  ".join(
            f"{q}={d['queries'][q]['min']:.3f}" for q in QUERIES
        )
        print(f"{name:14s} calib={d['calib']:.3f}/{d['calib_after']:.3f}  {qs}",
              flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
