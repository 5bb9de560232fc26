"""Adaptive-width ANN probe (r11, VERDICT r10 #3 follow-up).

The three-decade run of the REGISTERED ANN queries found a third-decade
regime change (ann_lsh segment exponent 0.95, ivf 1.10 at 100x->1000x).
That is by construction: the registered queries PIN their widths
(planes=4 / n_lists=16) so their DuckDB oracles replay the exact
banding — at 2M vectors a 4-plane table holds ~N/16 rows per bucket, so
the pinned forms' candidate volume grows linearly with the corpus (the
note-10 fixed-parameter trap, deliberately retained for oracle
determinism at driver SFs).

The PRODUCTION default is the adaptive width (ann_planes /
ivf_lists — planes and lists track N), where per-query candidate
volume stays ~ANN_OCC_TARGET. This tool times the adaptive forms on
the SAME staged corpora so BASELINE §3 can carry both rows: pinned
(registered, linear by design) and adaptive (production, the 100 TB
path).

The two ops measure DIFFERENT production shapes, matching how each is
deployed at scale: lsh times the full inline adaptive query (signature
build is one linear map pass — there is no index to amortize); ivf at
the adaptive sqrt(N) width pays an N^1.5 corpus assignment that
production amortizes ONCE per ingest (build_ivf_index, numpy GEMM), so
the ivf row builds + materializes the index per staging (build seconds
reported) and times the PROBE via index_tables= — re-assigning inline
per query at 1000x would measure ~hours of index build, a shape no
deployment runs (the r10 715 s lesson, one decade further).

Usage: python tools/ann_adaptive_probe.py [--factors 10,100,1000]
       [--passes 2] [--ops lsh,ivf]. Run SOLO (note 8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import build_scaled_dir, fit_exponent  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100,1000")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--ops", default="lsh,ivf")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    ops = [o.strip() for o in args.ops.split(",")]

    from fund_data_etl_pipeline_spark.operators.similarity import (
        ann_lsh_topk,
        ann_planes,
        ivf_lists,
        ivf_seed_topk,
    )
    from fund_data_etl_pipeline_spark.session import get_spark
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    spark = get_spark("ann-adaptive-probe")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"rows": []}
    times: dict[str, dict[int, float]] = {op: {} for op in ops}
    for f in sorted({1, *factors}):
        d = (
            args.sf
            if f == 1
            else build_scaled_dir(spark, args.sf, f, only={"embeddings"})
        )
        emb = load_table(spark, d, "embeddings")
        n = emb.count()
        queries = emb.filter(F.col("vec_id") < 10)
        for op in ops:
            t_build = None
            index_tables = None
            if op == "ivf":
                # build → persist → reload through the production store
                # module (operators/index_store), not a hand-rolled
                # parquet round-trip — the probe should exercise the
                # same prebuilt-index path a pipeline deploys
                from fund_data_etl_pipeline_spark.operators.index_store import (
                    load_ivf_index,
                    save_ivf_index,
                )
                from fund_data_etl_pipeline_spark.operators.similarity import (
                    build_ivf_index,
                )

                idx_dir = os.path.abspath(".ivf_recall_idx_adaptive")
                t0 = time.time()
                save_ivf_index(
                    build_ivf_index(
                        emb, n_lists=None, id_col="vec_id", vec_col="embedding"
                    ),
                    idx_dir,
                    prefix="aap_ivf",
                )
                t_build = round(time.time() - t0, 3)
                spark.catalog.clearCache()
                index_tables = load_ivf_index(spark, idx_dir, prefix="aap_ivf")

            def run():
                if op == "lsh":
                    res = ann_lsh_topk(emb, queries, k=5, planes=None)
                else:
                    res = ivf_seed_topk(
                        emb,
                        queries,
                        k=5,
                        n_probe=2,
                        index_tables=index_tables,
                    )
                res.write.format("noop").mode("overwrite").save()

            run()  # cold, uncounted
            best = None
            for _ in range(args.passes):
                spark.catalog.clearCache()
                t0 = time.time()
                run()
                dt = round(time.time() - t0, 3)
                best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
            width = ann_planes(n) if op == "lsh" else ivf_lists(n)
            times[op][f] = best
            row = {
                "op": op,
                "factor": f,
                "n": n,
                "width": width,
                "sec": best,
                "t_build": t_build,
            }
            out["rows"].append(row)
            extra = f" build={t_build}s" if t_build is not None else ""
            print(f"{op} x{f}: N={n} width={width} {best}s{extra}")
    for op in ops:
        pts = sorted(times[op].items())
        exp = fit_exponent(pts)
        seg = [
            round(
                (  # per-decade segment exponents
                    __import__("math").log10(t2 / t1)
                    / __import__("math").log10(f2 / f1)
                ),
                3,
            )
            for (f1, t1), (f2, t2) in zip(pts, pts[1:])
        ]
        out[f"exponent_{op}"] = exp
        out[f"segments_{op}"] = seg
        print(f"{op}: exponent={exp} segments={seg}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
