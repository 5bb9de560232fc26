"""Fund-ETL cascade scale probe (round-5 VERDICT next-step #7).

tools/scale_probe.py measures the analytics queries by replicating the
parquet tables; the flagship ETL cascade (`fund_dividend_scaled`)
instead replicates its fixture corpus INSIDE the plan, so this dedicated
probe drives the same builder (plans/fundetl.dividend_scaled_agg) at
1x/10x/100x its standard 1000-fold replication — 25k / 250k / 2.5M
documents through the full 21-platform dividend extraction cascade — and
fits the empirical cost exponent (least-squares slope on log-log), the
two-decade protocol.

Expectation: sub-linear. The cascade is a single scan + map-side regex
extraction + one A1 group-merge shuffle; at 25k docs the measured time
is mostly plan compile (the spec cascade compiles ~87 rule branches), so
doubling data should cost far less than double until extraction
dominates.

Usage: python tools/fund_cascade_probe.py [--factors 10,100] [--passes 2]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_REP = 1000


def timed(spark, n: int, passes: int) -> tuple[float, float]:
    """bench.py protocol: cold build+exec uncounted, then best-of-N
    fresh rebuild+exec timed."""
    from fund_data_etl_pipeline_spark.plans.fundetl import dividend_scaled_agg

    t0 = time.time()
    dividend_scaled_agg(spark, n).write.format("noop").mode("overwrite").save()
    cold = round(time.time() - t0, 3)
    best = math.inf
    for _ in range(passes):
        spark.catalog.clearCache()
        t1 = time.time()
        dividend_scaled_agg(spark, n).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, round(time.time() - t1, 3))
    return best, cold


def compile_breakdown(spark, passes: int = 3) -> dict:
    """Where does a 25k-doc batch's fixed cost live? Splits one cascade
    run into (a) Python-side plan construction (py4j; spec cache warm
    after pass 1), (b) JVM analysis+optimization+physical planning
    (forced via queryExecution().executedPlan()), (c) execution. The
    VERDICT r6 #4 before/after number is (a)+(b) — 'plan-construction
    time' — with the target <0.5 s warm."""
    from fund_data_etl_pipeline_spark.plans.fundetl import dividend_scaled_agg

    rows = []
    for i in range(passes + 1):  # pass 0 = cold (spec cache empty)
        spark.catalog.clearCache()
        t0 = time.time()
        df = dividend_scaled_agg(spark, BASE_REP)
        t1 = time.time()
        df._jdf.queryExecution().executedPlan()
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        rows.append(
            {
                "pass": "cold" if i == 0 else i,
                "build_s": round(t1 - t0, 3),
                "plan_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
            }
        )
        print(rows[-1], flush=True)
    warm = rows[1:]
    return {
        "docs": BASE_REP * 25,
        "passes": rows,
        "warm_best_build_plus_plan_s": round(
            min(r["build_s"] + r["plan_s"] for r in warm), 3
        ),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--compile",
        action="store_true",
        help="measure the compile-cost breakdown at 1x instead of the "
        "scale exponent (VERDICT r6 #4)",
    )
    args = ap.parse_args()
    factors = [1] + [int(f) for f in args.factors.split(",") if f.strip()]

    from fund_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("fund-cascade-probe")
    if args.compile:
        print(json.dumps(compile_breakdown(spark, args.passes)), flush=True)
        spark.stop()
        return
    warm: dict[int, float] = {}
    cold: dict[int, float] = {}
    for f in factors:
        warm[f], cold[f] = timed(spark, BASE_REP * f, args.passes)
        print(
            f"x{f}: {BASE_REP * f * 25} docs  warm {warm[f]} s"
            f"  cold {cold[f]} s",
            flush=True,
        )
        spark.catalog.clearCache()
    # least-squares slope on log-log (the scale_probe fit)
    xs = [math.log10(f) for f in factors]
    ys = [math.log10(max(warm[f], 1e-3)) for f in factors]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom
    print(
        json.dumps(
            {
                "query": "fund_dividend_scaled (dividend_scaled_agg)",
                "docs_at_1x": BASE_REP * 25,
                "warm_by_factor": warm,
                "cold_by_factor": cold,
                "fitted_exponent": round(slope, 3),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
