"""Per-query profiler for the r13 optimization round (guide §1).

For each named query (default: the bench HEADLINE list), measures with a
warm JVM:
  - build_s: Python-side DataFrame construction (plan build + analysis
    triggered by any eager bits in the builder — counts, index attach)
  - exec_s:  noop-sink execution of the built DataFrame
  - total_s: fresh rebuild + execute (the bench's timed shape)
  - jobs/stages: Spark job+stage count for the exec pass (statusTracker
    delta), which exposes driver-loop-heavy queries (CC, PageRank)
  - exchanges / joins / codegen spans / Python-eval nodes parsed from
    explain("formatted")

Optionally writes the formatted plan per query to --plans-dir
(plans/r13/<name>_<tag>.txt) so before/after diffs are committed evidence.

Usage:
  python tools/query_profile.py [--sf DIR] [--plans-dir plans/r13]
      [--tag before] [names...]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_stats(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"^\s*[+:*-]*\s*\(?\d*\)?\s*Exchange", txt, re.M)),
        "smj": txt.count("SortMergeJoin"),
        "bhj": txt.count("BroadcastHashJoin"),
        "shj": txt.count("ShuffledHashJoin"),
        "bnlj": txt.count("BroadcastNestedLoopJoin"),
        "cartesian": txt.count("CartesianProduct"),
        "codegen": txt.count("WholeStageCodegen"),
        "pyeval": txt.count("BatchEvalPython") + txt.count("ArrowEvalPython"),
        "mapinpandas": txt.count("MapInPandas") + txt.count("MapInArrow"),
        "scans": txt.count("Scan parquet"),
        "sorts": len(re.findall(r"\bSort \[", txt)),
        "windows": txt.count("Window ["),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--tag", default="before")
    ap.add_argument("--reps", type=int, default=1,
                    help="timed fresh rebuild+exec passes (min reported)")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as e
    from fund_data_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        "query_profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()
    names = args.names
    if not names:
        import bench

        names = list(bench.HEADLINE)

    # one warm-up pass (the bench's protocol) so JIT noise doesn't land on
    # the first profiled query
    try:
        qs["text_quality"](spark, args.sf).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception as exc:  # noqa: BLE001
        print(f"warm-up failed: {exc}", file=sys.stderr)
    finally:
        spark.catalog.clearCache()

    st = spark.sparkContext.statusTracker()
    results = {}
    for name in names:
        if name not in qs:
            print(f"unknown query {name}", file=sys.stderr)
            continue
        try:
            # cold pass (uncounted: codegen+index warm)
            spark.sparkContext.setJobDescription(f"profile-cold:{name}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            build_cold = time.time() - t0
            df.write.format("noop").mode("overwrite").save()
            cold_s = time.time() - t0
            spark.catalog.clearCache()

            txt = plan_text(df)
            if args.plans_dir:
                os.makedirs(args.plans_dir, exist_ok=True)
                with open(
                    os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
                ) as fh:
                    fh.write(txt)

            best = None
            for _ in range(max(1, args.reps)):
                spark.catalog.clearCache()
                jobs0 = len(st.getJobIdsForGroup(None))
                spark.sparkContext.setJobDescription(f"profile:{name}")
                t1 = time.time()
                df2 = qs[name](spark, args.sf)
                build_s = time.time() - t1
                df2.write.format("noop").mode("overwrite").save()
                total_s = time.time() - t1
                jobs1 = len(st.getJobIdsForGroup(None))
                rec = {
                    "build_s": round(build_s, 3),
                    "exec_s": round(total_s - build_s, 3),
                    "total_s": round(total_s, 3),
                    "jobs": jobs1 - jobs0,
                }
                if best is None or rec["total_s"] < best["total_s"]:
                    best = rec
            best["cold_s"] = round(cold_s, 3)
            best["build_cold_s"] = round(build_cold, 3)
            best.update(plan_stats(txt))
            results[name] = best
            print(json.dumps({name: best}), flush=True)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"error": f"{type(exc).__name__}: {exc}"[:200]}
            print(json.dumps({name: results[name]}), flush=True)
        finally:
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)

    print("== summary (slowest first) ==")
    ok = {k: v for k, v in results.items() if "total_s" in v}
    for k, v in sorted(ok.items(), key=lambda x: -x[1]["total_s"]):
        print(
            f"{v['total_s']:7.2f}s build={v['build_s']:5.2f} exec={v['exec_s']:5.2f}"
            f" jobs={v['jobs']:3d} exch={v['exchanges']:2d} smj={v['smj']}"
            f" bhj={v['bhj']} sort={v['sorts']} win={v['windows']} {k}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
