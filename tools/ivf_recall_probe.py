"""IVF recall-vs-n_probe ladder (VERDICT r10 #4).

The pair-cap recall table (tools/recall_probe.py) quantifies what the
LSH/minhash bucket caps forgo; IVF's equivalent knob is ``n_probe`` —
how many coarse lists a query visits. This tool publishes the missing
curve: recall@k of ivf_seed_topk (the registered deterministic
quantizer shape) against the exact brute-force cosine top-k, for
n_probe ∈ {1,2,4,8} at the ADAPTIVE ~sqrt(N) list width, on

  - the uniform staged corpus (tools/scale_probe.build_scaled_dir,
    embeddings only), and
  - the 1% clustered-QUERY-skew staging (build_skewed_dir with
    include_query_ids=n_queries: every query vector is forced into a
    hot centroid family, so its true neighbors are the clustered
    near-copies — the adversarial case where a query's list must
    contain its whole family or recall collapses).

The corpus assignment comes from a PREBUILT build_ivf_index
materialized once per staging (the steady-state daily-index shape —
paying the N·n_lists pass per n_probe run would measure the build, not
the probe; numpy assignment, pytest-pinned equal to the HOF quantizer
on the test corpora). Per (mode, factor, n_probe): mean/min recall@k
over the query set, mean/max candidate-set size (how many (query,
neighbor) pairs the probed lists admit — the cost side of the
frontier), and wall seconds for the probe query itself.

Usage: python tools/ivf_recall_probe.py [--factors 10,100] [--k 5]
       [--n-queries 100] [--probes 1,2,4,8] [--skew-frac 0.01]
       [--modes uniform,qskew]

Results land in BASELINE.md §4.4's recall table. Run SOLO (note 8).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
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


def _build_index(spark, emb, idx_dir):
    """Materialize build_ivf_index once per staging; return the
    (seeds, assigned) reader pair + build seconds + list sizes."""
    from fund_data_etl_pipeline_spark.operators.similarity import (
        build_ivf_index,
    )

    from fund_data_etl_pipeline_spark.operators.index_store import (
        load_ivf_index,
        save_ivf_index,
    )

    # persist/reload via the production store module (same path the
    # ann_adaptive probe and a deployed pipeline use), not a hand-rolled
    # parquet round-trip
    t0 = time.time()
    save_ivf_index(
        build_ivf_index(
            emb, n_lists=None, id_col="vec_id", vec_col="embedding"
        ),
        idx_dir,
        prefix="irp_ivf",
    )
    dt = round(time.time() - t0, 3)
    spark.catalog.clearCache()
    seeds_r, assigned_r = load_ivf_index(spark, idx_dir, prefix="irp_ivf")
    sizes = {
        r["list_id"]: r["n"]
        for r in assigned_r.groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    return seeds_r, assigned_r, dt, sizes


def _candidates(seeds_rows, qrows, n_probe, sizes):
    """Mean/max candidate volume per query: the probed lists' sizes
    summed. Probe-list choice replicated in numpy (rounded cosine,
    min-list_id ties — immaterial at this precision for a COST
    metric; the recall column itself uses the real operator)."""
    import numpy as np

    smat = np.array([r["sv"] for r in seeds_rows], dtype="float64")
    snorm = np.array([r["ns"] for r in seeds_rows], dtype="float64")
    sids = [r["list_id"] for r in seeds_rows]
    qm = np.array([r["embedding"] for r in qrows], dtype="float64")
    qn = np.sqrt((qm * qm).sum(axis=1))
    den = np.outer(qn, snorm)
    den[den == 0.0] = 1.0
    cos = np.round(qm @ smat.T / den, 6)
    order = np.argsort(-cos, axis=1, kind="stable")[:, :n_probe]
    tot = [
        sum(sizes.get(sids[j], 0) for j in row) for row in order
    ]
    return (
        int(round(sum(tot) / max(len(tot), 1))),
        int(max(tot)) if tot else 0,
    )


def _recall_at(spark, emb, queries, k, n_probe, truth, index_tables):
    from fund_data_etl_pipeline_spark.operators.similarity import ivf_seed_topk

    t0 = time.time()
    got = ivf_seed_topk(
        emb, queries, k=k, n_probe=n_probe, index_tables=index_tables
    )
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
    idx_dir = os.path.abspath(".ivf_recall_idx")
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
            seeds_r, assigned_r, t_build, sizes = _build_index(
                spark, emb, idx_dir
            )
            seeds_rows = seeds_r.collect()
            qrows = queries.select("vec_id", "embedding").collect()
            print(
                f"{mode} {f}x: N={n} lists={lists} "
                f"index build+save={t_build}s"
            )
            for p in probes:
                cand_mean, cand_max = _candidates(
                    seeds_rows, qrows, p, sizes
                )
                row = {
                    "mode": mode,
                    "factor": f,
                    "n_vectors": n,
                    "n_lists": lists,
                    "t_build": t_build,
                    "cand_mean": cand_mean,
                    "cand_max": cand_max,
                    **_recall_at(
                        spark, emb, queries, args.k, p, truth,
                        (seeds_r, assigned_r),
                    ),
                }
                out["rows"].append(row)
                print(
                    f"{mode} {f}x (N={n}, lists={lists}) n_probe={p}: "
                    f"recall@{args.k} mean={row['recall_mean']} "
                    f"min={row['recall_min']} "
                    f"perfect={row['queries_perfect']}/{len(truth)} "
                    f"cand mean={cand_mean} max={cand_max} "
                    f"({row['sec']}s)"
                )
    shutil.rmtree(idx_dir, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
