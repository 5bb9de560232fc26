"""Incremental near-dup per-batch flatness probe (VERDICT r8 #4).

The 100 TB claim for the daily-ingest path (operators/dedup.
incremental_minhash_pairs) is: per-batch cost is ~flat in CORPUS size,
because the index side the batch joins is (a) prebuilt once per ingest
day (build_minhash_index — linear, amortized) and (b) bucket-capped, so
an incoming doc fans out to at most cap rows per band no matter how many
corpus docs collide in its buckets. This tool MEASURES that claim:

  - a FIXED batch (the base sf's full documents table, ids offset so
    they never collide with index ids) runs against 1x/10x/100x staged
    indexes — uniform (scale_probe.build_scaled_dir) and twin-family
    doc-skew (build_clustered_dir) staging, the same corpora every other
    probe uses;
  - each index is MATERIALIZED to parquet via build_minhash_index (the
    steady-state daily-pipeline shape, parity-pytested bit-equal to the
    inline path) and its one-time build cost reported separately;
  - per factor: best-of-N per-batch wall time (trigger -> noop sink),
    raw band-join candidate rows vs the cap*BANDS*|batch| bound, and
    verified pair counts;
  - the log-log exponent of per-batch time vs index scale — the
    deliverable. ~0 is the flat-cost claim; the residual growth is the
    verify join's scan of the index shingle table (at production scale:
    bucketed by doc_id + runtime bloom-filter pruned, see the operator
    docstring).

Usage: python tools/inc_probe.py [--factors 10,100] [--doc-skew 0.05]
       [--passes 2] [--sf /root/testdata/sf0.1]

Run SOLO — probe numbers share the 32 cores (BASELINE.md note 8).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.scale_probe import (  # noqa: E402
    REPO,
    build_clustered_dir,
    build_scaled_dir,
    fit_exponent,
)

_ID_OFFSET = 1_000_000_000  # batch ids never collide with any staged index id


def _materialize_index(spark, index_dir: str, tag: str) -> tuple[str, str, float]:
    """build_minhash_index over ``index_dir``'s documents, written to a
    fingerprinted parquet staging dir (the persisted daily index).
    Returns (prepped_path, bands_path, build_seconds; 0.0 on cache hit).
    """
    from fund_data_etl_pipeline_spark.operators.dedup import (
        build_minhash_index,
    )
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    out_dir = os.path.join(REPO, f".inc_probe_idx_{tag}")
    marker = os.path.join(out_dir, ".complete")
    src = os.path.join(index_dir, "documents.parquet")
    st = os.stat(src)
    fingerprint = f"{src}:{st.st_size}:{st.st_mtime_ns}:v1"
    pp = os.path.join(out_dir, "prepped.parquet")
    bp = os.path.join(out_dir, "bands.parquet")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == fingerprint:
                return pp, bp, 0.0
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    prepped, bands = build_minhash_index(load_table(spark, index_dir, "documents"))
    prepped.write.mode("overwrite").parquet(pp)
    bands.write.mode("overwrite").parquet(bp)
    dt = round(time.time() - t0, 3)
    with open(marker, "w") as fh:
        fh.write(fingerprint)
    return pp, bp, dt


def _materialize_hash_index(spark, index_dir: str, tag: str) -> tuple[str, float]:
    """The exact path's persisted index: one normalized content md5 per
    corpus doc, written to fingerprinted parquet staging. Returns
    (path, build_seconds; 0.0 on cache hit)."""
    from fund_data_etl_pipeline_spark.functions.text import normalized_md5
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    out_dir = os.path.join(REPO, f".inc_probe_hash_{tag}")
    marker = os.path.join(out_dir, ".complete")
    src = os.path.join(index_dir, "documents.parquet")
    st = os.stat(src)
    fingerprint = f"{src}:{st.st_size}:{st.st_mtime_ns}:v1"
    hp = os.path.join(out_dir, "hashes.parquet")
    if os.path.exists(marker):
        with open(marker) as fh:
            if fh.read() == fingerprint:
                return hp, 0.0
        import shutil

        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.time()
    load_table(spark, index_dir, "documents").select(
        normalized_md5(F.col("text")).alias("content_hash")
    ).write.mode("overwrite").parquet(hp)
    dt = round(time.time() - t0, 3)
    with open(marker, "w") as fh:
        fh.write(fingerprint)
    return hp, dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="10,100")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument(
        "--doc-skew",
        type=float,
        default=None,
        help="probe against the twin-family clustered staging at this "
        "member fraction instead of the uniform replicas",
    )
    ap.add_argument(
        "--op",
        default="minhash",
        choices=["minhash", "exact"],
        help="which incremental path to probe: the near-dup band index "
        "(minhash) or the content-hash anti-join (exact)",
    )
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    from fund_data_etl_pipeline_spark.functions.text import (
        MINHASH_BANDS,
        MINHASH_BUCKET_CAP,
    )
    from fund_data_etl_pipeline_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_band_keys,
        shingle_hash_prepped,
    )
    from fund_data_etl_pipeline_spark.session import get_spark
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    spark = get_spark("inc-probe")
    mode = f"skew{args.doc_skew}" if args.doc_skew else "uniform"

    # the FIXED batch: every base-sf document, ids offset out of the
    # staged id space; persisted parquet so each timed pass re-reads the
    # same files a real micro-batch would
    batch_path = os.path.join(REPO, f".inc_probe_batch_{mode.replace('.', 'p')}")
    base_for_batch = (
        build_clustered_dir(spark, args.sf, 1, args.doc_skew)
        if args.doc_skew
        else args.sf
    )
    load_table(spark, base_for_batch, "documents").withColumn(
        "doc_id", F.col("doc_id") + F.lit(_ID_OFFSET)
    ).write.mode("overwrite").parquet(batch_path)
    batch = spark.read.parquet(batch_path)
    n_batch = batch.count()
    bound = MINHASH_BUCKET_CAP * MINHASH_BANDS * n_batch
    if args.op == "minhash":
        print(
            f"batch: {n_batch} docs (fixed); candidate bound "
            f"cap*bands*batch={bound}"
        )
    else:
        print(f"batch: {n_batch} docs (fixed); op=exact (hash anti-join)")

    rows = []
    for f in sorted({1, *factors}):
        if f == 1:
            index_dir = base_for_batch
        elif args.doc_skew:
            index_dir = build_clustered_dir(spark, args.sf, f, args.doc_skew)
        else:
            # documents is the only table this probe reads — subset
            # staging keeps the 1000x decade at ~600 MB, not ~60 GB
            index_dir = build_scaled_dir(
                spark, args.sf, f, only={"documents"}
            )
        tag = f"{mode.replace('.', 'p')}_x{f}"
        if args.op == "exact":
            from fund_data_etl_pipeline_spark.operators.dedup import (
                incremental_exact_dedup,
            )

            hp, t_build = _materialize_hash_index(spark, index_dir, tag)
            n_index = spark.read.parquet(hp).count()
            hist = spark.read.parquet(hp)
            t_batch = None
            for _ in range(args.passes):
                spark.catalog.clearCache()
                t0 = time.time()
                fresh, _hist2 = incremental_exact_dedup(batch, hist)
                fresh.write.format("noop").mode("overwrite").save()
                dt = round(time.time() - t0, 3)
                t_batch = dt if t_batch is None else min(t_batch, dt)
            fresh, _hist2 = incremental_exact_dedup(batch, hist)
            n_fresh = fresh.count()
            spark.catalog.clearCache()
            row = {
                "factor": f,
                "index_docs": n_index,
                "t_index_build": t_build,
                "t_batch": t_batch,
                "fresh_survivors": n_fresh,
            }
            rows.append(row)
            print(
                f"x{f:<4} index={n_index:<8} build={t_build:<8} "
                f"batch={t_batch:<7} fresh={n_fresh}"
            )
            continue
        pp, bp, t_build = _materialize_index(spark, index_dir, tag)
        n_index = spark.read.parquet(pp).count()

        idx_tables = (spark.read.parquet(pp), spark.read.parquet(bp))
        t_batch = None
        for _ in range(args.passes):
            spark.catalog.clearCache()
            t0 = time.time()
            incremental_minhash_pairs(batch, index_tables=idx_tables).write.format(
                "noop"
            ).mode("overwrite").save()
            dt = round(time.time() - t0, 3)
            t_batch = dt if t_batch is None else min(t_batch, dt)
        spark.catalog.clearCache()

        # diagnostics (untimed): raw band-join candidate rows vs bound,
        # verified pairs
        new_bands = minhash_band_keys(
            shingle_hash_prepped(batch), "doc_id"
        ).select("band", "key")
        cand = new_bands.join(idx_tables[1].select("band", "key"), ["band", "key"])
        n_cand = cand.count()
        n_pairs = incremental_minhash_pairs(batch, index_tables=idx_tables).count()
        spark.catalog.clearCache()

        row = {
            "factor": f,
            "index_docs": n_index,
            "t_index_build": t_build,
            "t_batch": t_batch,
            "candidates": n_cand,
            "cand_bound": bound,
            "bound_ok": n_cand <= bound,
            "verified_pairs": n_pairs,
        }
        rows.append(row)
        print(
            f"x{f:<4} index={n_index:<8} build={t_build:<8} "
            f"batch={t_batch:<7} cand={n_cand} (<= {bound}: {row['bound_ok']}) "
            f"pairs={n_pairs}"
        )

    exp = fit_exponent([(r["factor"], r["t_batch"]) for r in rows])
    print(f"per-batch exponent vs index scale: {exp}")
    print(
        json.dumps(
            {
                "mode": mode,
                "op": args.op,
                "batch_docs": n_batch,
                "rows": rows,
                "exponent": exp,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
