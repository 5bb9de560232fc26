"""IVF recall-vs-n_probe ladder (VERDICT r10 #4).

The pair-cap recall table (tools/recall_probe.py) quantifies what the
LSH/minhash bucket caps forgo; IVF's equivalent knob is ``n_probe`` —
how many coarse lists a query visits. This tool publishes the missing
curve: recall@k of ivf_seed_topk (the registered deterministic
quantizer) against the exact brute-force cosine top-k, for
n_probe ∈ {1,2,4,8} at the ADAPTIVE ~sqrt(N) list width, on

  - the uniform staged corpus (tools/scale_probe.build_scaled_dir,
    embeddings only), and
  - the 1% clustered-QUERY-skew staging (build_skewed_dir with
    include_query_ids=n_queries: every query vector is forced into a
    hot centroid family, so its true neighbors are the clustered
    near-copies — the adversarial case where a query's list must
    contain its whole family or recall collapses).

Per (mode, factor, n_probe): mean/min recall@k over the query set,
candidate-set size (how many (query, neighbor) pairs the probed lists
admit — the cost side of the frontier), and wall seconds.

Usage: python tools/ivf_recall_probe.py [--factors 10,100] [--k 5]
       [--n-queries 100] [--probes 1,2,4,8] [--skew-frac 0.01]
       [--modes uniform,qskew]

Results land in BASELINE.md §4.4's recall table. Run SOLO (note 8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import build_scaled_dir, build_skewed_dir  # noqa: E402


def _truth(spark, emb, queries, k):
    """Exact top-k as a collected {query_id: set(neighbor_id)} dict —
    small (n_queries * k rows), collected once per staging."""
    from fund_data_etl_pipeline_spark.operators.similarity import cosine_topk

    rows = cosine_topk(emb, queries, k=k).select(
        "query_id", "neighbor_id"
    ).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall_at(spark, emb, queries, k, n_probe, truth):
    from fund_data_etl_pipeline_spark.operators.similarity import ivf_seed_topk

    t0 = time.time()
    got = ivf_seed_topk(emb, queries, k=k, n_lists=None, n_probe=n_probe)
    rows = got.select("query_id", "neighbor_id").collect()
    dt = round(time.time() - t0, 3)
    by_q: dict[int, set[int]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(by_q.get(q, set()) & t) / len(t) for q, t in truth.items() if t
    ]
    spark.catalog.clearCache()
    return {
        "n_probe": n_probe,
        "recall_mean": round(sum(recalls) / len(recalls), 4),
        "recall_min": round(min(recalls), 4),
        "queries_perfect": sum(1 for r in recalls if r == 1.0),
        "sec": dt,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--probes", default="1,2,4,8")
    ap.add_argument("--skew-frac", type=float, default=0.01)
    ap.add_argument("--modes", default="uniform,qskew")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    probes = [int(p) for p in args.probes.split(",")]
    modes = [m.strip() for m in args.modes.split(",")]

    from fund_data_etl_pipeline_spark.operators.similarity import ivf_lists
    from fund_data_etl_pipeline_spark.session import get_spark
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    spark = get_spark("ivf-recall-probe")
    spark.sparkContext.setLogLevel("ERROR")

    out = {"k": args.k, "n_queries": args.n_queries, "rows": []}
    for f in factors:
        for mode in modes:
            if mode == "uniform":
                d = build_scaled_dir(spark, args.sf, f, only={"embeddings"})
            else:
                d = build_skewed_dir(
                    spark, args.sf, f, args.skew_frac,
                    include_query_ids=args.n_queries,
                )
            emb = load_table(spark, d, "embeddings")
            n = emb.count()
            lists = ivf_lists(n)
            queries = emb.filter(F.col("vec_id") < args.n_queries)
            truth = _truth(spark, emb, queries, args.k)
            spark.catalog.clearCache()
            for p in probes:
                row = {
                    "mode": mode,
                    "factor": f,
                    "n_vectors": n,
                    "n_lists": lists,
                    **_recall_at(spark, emb, queries, args.k, p, truth),
                }
                out["rows"].append(row)
                print(
                    f"{mode} {f}x (N={n}, lists={lists}) n_probe={p}: "
                    f"recall@{args.k} mean={row['recall_mean']} "
                    f"min={row['recall_min']} "
                    f"perfect={row['queries_perfect']}/{len(truth)} "
                    f"({row['sec']}s)"
                )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
