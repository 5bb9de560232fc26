"""On-disk bucketed-index probe latency (VERDICT r10 #2, measurement
half — the plan asserts live in tests/test_index_store.py).

The steady-state 100 TB shape is: the ANN / minhash indexes are WRITTEN
OUT as bucketed tables (operators/index_store.py) and every
batch/query probe joins against the attached tables. This tool measures
that path against the plain-parquet handoff the ≤r10 probes used, on
the same staged corpora:

  minhash — the fixed base-sf batch (ids offset) probed against a
    1x/10x/100x staged index via incremental_minhash_pairs, once with
    index_tables = plain parquet reads of the saved files, once with
    index_tables = the attached BUCKETED tables (same bytes, catalog
    bucketing metadata on). The delta is what the two removed
    index-side exchanges (band-join + verify-join) are worth.
  ivf — the registered 10-query probe via ivf_seed_topk against a
    saved build_ivf_index, plain vs attached (one removed exchange on
    the list_id candidate join).

Per row: one-time build+save seconds (the amortized ingest cost),
best-of-N probe seconds for both forms. Run SOLO (note 8).

Usage: python tools/index_store_probe.py [--factors 1,10,100]
       [--ops minhash,ivf] [--passes 3] [--n-buckets 32]
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

from tools.scale_probe import REPO, build_scaled_dir  # noqa: E402

_ID_OFFSET = 1_000_000_000


def _timed_passes(fn, passes: int) -> float:
    best = None
    for _ in range(passes):
        t0 = time.time()
        fn()
        dt = round(time.time() - t0, 3)
        best = dt if best is None else min(best, dt)
    return best


def _staged_batch(spark, sf: str):
    """The fixed probe batch (sf documents, ids offset out of the index's
    id space), cached on disk but keyed on the SOURCE table's
    size+mtime_ns — the driver regenerates /root/testdata between
    rounds, and an existence-only cache would silently probe an old
    round's batch against an index built from the new corpus (the
    build_scaled_dir staleness lesson applied to this cache)."""
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    src = os.path.join(sf, "documents.parquet")
    st = os.stat(src)
    fingerprint = f"{src}:{st.st_size}:{st.st_mtime_ns}:off{_ID_OFFSET}"
    batch_path = os.path.join(REPO, ".idx_store_batch_docs")
    marker = os.path.join(batch_path, ".complete")
    stale = True
    if os.path.exists(marker):
        with open(marker) as fh:
            stale = fh.read() != fingerprint
    if stale:
        load_table(spark, sf, "documents").withColumn(
            "doc_id", F.col("doc_id") + F.lit(_ID_OFFSET)
        ).write.mode("overwrite").parquet(batch_path)
        with open(marker, "w") as fh:
            fh.write(fingerprint)
    return spark.read.parquet(batch_path)


def probe_minhash(spark, sf: str, factor: int, passes: int, n_buckets: int):
    from fund_data_etl_pipeline_spark.operators.dedup import (
        build_minhash_index,
        incremental_minhash_pairs,
    )
    from fund_data_etl_pipeline_spark.operators.index_store import (
        load_minhash_index,
        save_minhash_index,
    )
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    index_dir = (
        sf if factor == 1
        else build_scaled_dir(spark, sf, factor, only={"documents"})
    )
    batch = _staged_batch(spark, sf)

    base = os.path.join(REPO, f".idx_store_mh_x{factor}")
    shutil.rmtree(base, ignore_errors=True)
    prefix = f"isp_mh_x{factor}"
    for t in (f"{prefix}_prepped", f"{prefix}_bands"):
        spark.sql(f"DROP TABLE IF EXISTS `{t}`")
    t0 = time.time()
    save_minhash_index(
        build_minhash_index(load_table(spark, index_dir, "documents")),
        base, n_buckets=n_buckets, prefix=prefix,
    )
    t_build = round(time.time() - t0, 3)

    disk_idx = load_minhash_index(spark, base, prefix=prefix)
    plain_idx = (
        spark.read.parquet(os.path.join(base, "prepped")),
        spark.read.parquet(os.path.join(base, "bands")),
    )

    def run(idx):
        spark.catalog.clearCache()
        incremental_minhash_pairs(batch, index_tables=idx).write.format(
            "noop"
        ).mode("overwrite").save()

    t_plain = _timed_passes(lambda: run(plain_idx), passes)
    t_bucketed = _timed_passes(lambda: run(disk_idx), passes)
    n_index = plain_idx[0].count()
    return {
        "op": "minhash", "factor": factor, "index_docs": n_index,
        "t_build_save": t_build, "t_probe_plain": t_plain,
        "t_probe_bucketed": t_bucketed,
    }


def probe_ivf(spark, sf: str, factor: int, passes: int, n_buckets: int):
    from fund_data_etl_pipeline_spark.operators.index_store import (
        load_ivf_index,
        save_ivf_index,
    )
    from fund_data_etl_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_seed_topk,
    )
    from fund_data_etl_pipeline_spark.sources.tables import load_table

    index_dir = (
        sf if factor == 1
        else build_scaled_dir(spark, sf, factor, only={"embeddings"})
    )
    emb = load_table(spark, index_dir, "embeddings")
    base = os.path.join(REPO, f".idx_store_ivf_x{factor}")
    shutil.rmtree(base, ignore_errors=True)
    prefix = f"isp_ivf_x{factor}"
    spark.sql(f"DROP TABLE IF EXISTS `{prefix}_assigned`")
    t0 = time.time()
    save_ivf_index(
        build_ivf_index(emb), base, n_buckets=n_buckets, prefix=prefix
    )
    t_build = round(time.time() - t0, 3)

    disk_idx = load_ivf_index(spark, base, prefix=prefix)
    plain_idx = (
        spark.read.parquet(os.path.join(base, "seeds")),
        spark.read.parquet(os.path.join(base, "assigned")),
    )
    queries = emb.filter(F.col("vec_id") < 10)

    def run(idx):
        spark.catalog.clearCache()
        ivf_seed_topk(
            emb, queries, k=5, n_probe=2, index_tables=idx
        ).write.format("noop").mode("overwrite").save()

    t_plain = _timed_passes(lambda: run(plain_idx), passes)
    t_bucketed = _timed_passes(lambda: run(disk_idx), passes)
    return {
        "op": "ivf", "factor": factor, "index_vectors": emb.count(),
        "t_build_save": t_build, "t_probe_plain": t_plain,
        "t_probe_bucketed": t_bucketed,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--ops", default="minhash,ivf")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]
    ops = [o.strip() for o in args.ops.split(",")]

    from fund_data_etl_pipeline_spark.session import get_spark

    spark = get_spark("index-store-probe")
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for f in factors:
        for op in ops:
            fn = probe_minhash if op == "minhash" else probe_ivf
            row = fn(spark, args.sf, f, args.passes, args.n_buckets)
            rows.append(row)
            print(
                f"{op} x{f}: build+save={row['t_build_save']}s "
                f"probe plain={row['t_probe_plain']}s "
                f"bucketed={row['t_probe_bucketed']}s"
            )
    print(json.dumps({"rows": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
