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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100")
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()
    factors = [1] + [int(f) for f in args.factors.split(",") if f.strip()]

    from fund_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("fund-cascade-probe")
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
