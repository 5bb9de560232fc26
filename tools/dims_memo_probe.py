"""Root-cause probe for the r12 check_dims-memoization degradation
(VERDICT r12 next-step #2).

Round 12 observed: memoizing check_dims' LIMIT-1 probe (keyed by plan
semanticHash) made repeated same-session rebuilds of dedup_semantic_lsh
degrade progressively (6.6 s -> 28 s by the 5th rebuild), while the
plain probe-per-build form stayed flat. Mechanism was left
"unidentified" (d588578). This probe reproduces the loop and records,
per rebuild, the signals that discriminate the candidate mechanisms:

- elapsed seconds (the symptom);
- JVM persistent-RDD count (sc.getPersistentRDDs) BEFORE the rebuild —
  if the memoized variant accumulates entries, the mechanism is cache
  accumulation: the builder's persist() caches are released by a Python
  GC finalizer (operators/caching.release_on_gc), and the probe job's
  py4j traffic was what incidentally drove Python GC between rebuilds;
- Python gc.get_count() generations (corroborates GC pressure timing);
- optionally forces gc.collect() each rebuild (--gc) — if that flattens
  the memoized variant, GC-timing is confirmed as the mechanism.

Variants:
  python tools/dims_memo_probe.py                 # plain (shipped) form
  python tools/dims_memo_probe.py --memo          # r12 memoized form
  python tools/dims_memo_probe.py --memo --gc     # memoized + explicit GC
  python tools/dims_memo_probe.py --meta          # metadata fast path
                                                  # (no probe job at all)

The --meta variant matters independently: VERDICT r12 #3 wants the
schema-first branch wired into load_table, which ALSO removes the
per-build probe job — if the mechanism is "the probe job was doing the
GC's work", the metadata path needs the same mitigation or it
reintroduces the degradation under a different name.

CONCLUSION (r13, BASELINE lesson 19): the degradation does NOT
reproduce as a code mechanism. With full instrumentation (--jobstats:
build/exec wall split, Spark-job durations via the UI REST API, JVM GC
ms, persisted-RDD count), EVERY variant measures flat — memo over 8
rebuilds: 6.5-10.4 s wall, ~2.5 s summed job time, GC 50-300 ms,
persisted_rdds_before always 0 (release_on_gc finalizers keep up
without the probe's py4j traffic). Un-instrumented A/B runs on the
same host earlier showed 2-50x swings with a DIFFERENT variant slow
each run — the BASELINE lesson 17 shared-host variance fingerprint.
The r12 revert stands for a different reason: load_table's `dims`
metadata (the --meta path) makes any probe memoization redundant for
every registered caller.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--memo", action="store_true")
    ap.add_argument("--gc", action="store_true", dest="force_gc")
    ap.add_argument("--meta", action="store_true")
    ap.add_argument(
        "--jobstats",
        action="store_true",
        help="enable the UI REST API and print per-job wall durations "
        "for each rebuild — localizes WHICH job eats the extra time in "
        "probe-less variants",
    )
    ap.add_argument(
        "--sleep",
        type=float,
        default=0.0,
        help="pause between rebuilds — if this flattens --memo, the "
        "probe's role was a BARRIER letting the previous rebuild's "
        "async cleanup (non-blocking unpersist, shuffle removal) drain "
        "before the next heavy job competes for the same cores/memory",
    )
    ap.add_argument("--rebuilds", type=int, default=6)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from fund_data_etl_pipeline_spark.session import get_spark
    from fund_data_etl_pipeline_spark.operators import similarity as S
    from fund_data_etl_pipeline_spark import plans

    plans.load_all()
    conf = {"spark.ui.showConsoleProgress": "false"}
    if args.jobstats:
        conf["spark.ui.enabled"] = "true"
        conf["spark.ui.port"] = "4047"
    spark = get_spark("dims_memo_probe", extra_conf=conf)
    spark.sparkContext.setLogLevel("ERROR")

    if args.memo:
        # the exact r12 memoized form (from d588578^)
        _CACHE: dict[tuple[int, str], int] = {}
        plain = S.check_dims

        def memoized(df, vec_col, dims):
            width = None
            try:
                field = df.schema[vec_col]
                if field.metadata and "dims" in field.metadata:
                    width = int(field.metadata["dims"])
            except (KeyError, TypeError, ValueError):
                pass
            if width is None:
                try:
                    key = (df.semanticHash(), vec_col)
                except Exception:
                    key = None
                if key is not None and key in _CACHE:
                    width = _CACHE[key]
                else:
                    row = df.select(
                        S.F.size(S.F.col(vec_col)).alias("d")
                    ).first()
                    if row is not None and row["d"] is not None:
                        width = int(row["d"])
                        if key is not None:
                            _CACHE[key] = width
            if width is not None and width != dims:
                plain(df, vec_col, dims)  # re-raise with the real message

        S.check_dims = memoized
        # plans/dedup imported check_dims by name at module import time
        import fund_data_etl_pipeline_spark.plans.dedup as PD  # noqa: F401
    if args.meta:
        noop_probe = lambda df, vec_col, dims: None  # noqa: E731
        S.check_dims = noop_probe

    import fund_data_etl_pipeline_spark.plans.dedup as PD

    if args.memo or args.meta:
        # the builder imports check_dims lazily inside the function body
        # (plans/dedup.py:1138 `from ..operators.similarity import
        # check_dims`), so patching the module attribute is enough IF the
        # import is function-local. Verify:
        import inspect

        src = inspect.getsource(PD)
        assert "from ..operators.similarity import check_dims" in src

    build = plans.QUERIES["dedup_semantic_lsh"]
    sc = spark.sparkContext

    def job_stats(since_job: int) -> tuple[int, list]:
        """(next_since, [(jobId, sec, tasks, desc40)] for jobs >= since)."""
        if not args.jobstats:
            return since_job, []
        import datetime
        import urllib.request

        app_id = sc.applicationId
        with urllib.request.urlopen(
            f"http://localhost:4047/api/v1/applications/{app_id}/jobs"
        ) as r:
            jobs = json.load(r)
        out = []
        top = since_job
        for j in jobs:
            if j["jobId"] < since_job:
                continue
            top = max(top, j["jobId"] + 1)
            fmt = "%Y-%m-%dT%H:%M:%S.%fGMT"
            try:
                dur = (
                    datetime.datetime.strptime(j["completionTime"], fmt)
                    - datetime.datetime.strptime(j["submissionTime"], fmt)
                ).total_seconds()
            except (KeyError, ValueError):
                dur = -1.0
            out.append(
                (
                    j["jobId"],
                    round(dur, 2),
                    j.get("numTasks"),
                    (j.get("description") or j.get("name") or "")[:60],
                )
            )
        return top, sorted(out)

    def jvm_gc_ms() -> int:
        beans = sc._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans()
        return sum(
            beans.get(i).getCollectionTime() for i in range(beans.size())
        )

    rows = []
    since = 0
    for i in range(args.rebuilds):
        n_persisted = sc._jsc.sc().getPersistentRDDs().size()
        counts = gc.get_count()
        gc0 = jvm_gc_ms()
        t0 = time.time()
        df = build(spark, args.sf)
        t_built = time.time()
        df.write.format("noop").mode("overwrite").save()
        t1 = time.time()
        dt = round(t1 - t0, 2)
        gc_delta = jvm_gc_ms() - gc0
        since, jstats = job_stats(since)
        for js in jstats:
            print(f"    job {js[0]}: {js[1]}s tasks={js[2]} {js[3]!r}")
        if args.force_gc:
            gc.collect()
        if args.sleep:
            time.sleep(args.sleep)
        rows.append(
            {
                "rebuild": i + 1,
                "sec": dt,
                "build_sec": round(t_built - t0, 2),
                "exec_sec": round(t1 - t_built, 2),
                "jvm_gc_ms": gc_delta,
                "job_sec": round(sum(j[1] for j in jstats if j[1] > 0), 2)
                if jstats
                else None,
                "persisted_rdds_before": n_persisted,
                "gc_counts_before": counts,
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    variant = (
        ("memo" if args.memo else "meta" if args.meta else "plain")
        + ("+gc" if args.force_gc else "")
        + (f"+sleep{args.sleep}" if args.sleep else "")
    )
    print(json.dumps({"variant": variant, "rows": rows}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
