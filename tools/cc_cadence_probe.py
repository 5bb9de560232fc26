"""Driver-sync probe for the r14 connected-components convergence
cadence (VERDICT r13 #4): on a DEEP graph (a pure chain, diameter D,
needing ~D propagation rounds), count the driver-blocked Spark jobs the
CC fixpoint issues and the wall time, plus the rounds stat.

The r13 form probed the monotone label-sum after EVERY round (one
blocking job per round). The r14 form probes rounds 1-2 every round
(shallow near-dup graphs converge there — zero change for them), then
every 2nd round, leaving unprobed rounds as pure lineage computed inside
the next probe's job — jobs ≈ rounds/2 on deep graphs, at most one
semantics-free extra round past the fixpoint.

Usage: python tools/cc_cadence_probe.py [--chain 16] [--reps 2]
Run twice for A/B:  git checkout <old> -- .../operators/dedup.py first.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chain", type=int, default=16)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from fund_data_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from fund_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("cc-cadence-probe")
    st = spark.sparkContext.statusTracker()
    n = args.chain
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "d1 long, d2 long"
    )
    ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")

    results = []
    for rep in range(args.reps):
        stats: dict = {}
        jobs0 = len(st.getJobIdsForGroup(None))
        t0 = time.time()
        out = connected_components(pairs, ids, stats=stats)
        rows = out.collect()
        wall = round(time.time() - t0, 3)
        jobs = len(st.getJobIdsForGroup(None)) - jobs0
        assert all(r.group_id == 0 for r in rows), "chain must collapse to 0"
        assert len(rows) == n
        results.append(
            {"rep": rep, "rounds": stats["rounds"], "jobs": jobs,
             "wall_s": wall}
        )
        spark.catalog.clearCache()
    print(json.dumps({"chain": n, "runs": results}))


if __name__ == "__main__":
    main()
