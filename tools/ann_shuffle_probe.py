"""Candidate-stage shuffle-byte measurement for the r10 ann_lsh_topk
restructure (VERDICT r9 #2 "Done" criterion: show candidate-stage bytes
shuffled DROPPED, not just wall-clock).

Runs the shipped ID-only ann_lsh_topk and, for comparison only, an
inline reconstruction of the pre-r10 payload-carrying form (vectors
carried through the (tbl, bucket) explode + equi-join + pair dedup —
the exact shape operators/similarity.py:343-357 had in r9), over the
same scaled embeddings corpus, and reports each run's total shuffle
write bytes from the Spark UI REST API (stage-level shuffleWriteBytes,
diffed around each run so the numbers are per-run, same JVM).

Usage: python tools/ann_shuffle_probe.py [--factor 10] [--sf DIR]
Prints one JSON line {"factor": F, "id_only_bytes": .., "payload_bytes":
.., "ratio": .., "id_only_sec": .., "payload_sec": ..}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

from pyspark.sql import DataFrame, functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _shuffle_write_bytes(spark) -> int:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(
        f"{base}/api/v1/applications/{app}/stages?status=complete"
    ) as r:
        stages = json.loads(r.read())
    return sum(s.get("shuffleWriteBytes", 0) for s in stages)


def payload_carrying_lsh_topk(
    vectors: DataFrame, queries: DataFrame, k: int, planes: int,
    tables: int, dims: int,
) -> DataFrame:
    """The PRE-r10 form, reconstructed for measurement only: qv/nv
    (dims-wide double arrays) ride every exploded (tbl, bucket) row
    through the candidate equi-join and the pair dedup."""
    from pyspark.sql.window import Window as W

    from fund_data_etl_pipeline_spark.functions.numeric import round2
    from fund_data_etl_pipeline_spark.operators.similarity import (
        as_double,
        cosine,
        rhp_bucket,
    )

    def with_buckets(df, idn, vn):
        v = as_double(F.col("embedding"))
        buckets = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    rhp_bucket(v, planes, dims, offset=t * planes).alias(
                        "bucket"
                    ),
                )
                for t in range(tables)
            ]
        )
        return df.select(
            F.col("vec_id").alias(idn), v.alias(vn),
            F.explode(buckets).alias("tb"),
        ).select(
            idn, vn, F.col("tb.tbl").alias("tbl"),
            F.col("tb.bucket").alias("bucket"),
        )

    q = with_buckets(queries, "query_id", "qv")
    v = with_buckets(vectors, "neighbor_id", "nv")
    cand = (
        q.join(v, ["tbl", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "nv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        round2(cosine(F.col("qv"), F.col("nv")), 6).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from fund_data_etl_pipeline_spark.operators.similarity import ann_lsh_topk
    from fund_data_etl_pipeline_spark.plans.vectors import (
        _K,
        _LSH_DIMS,
        _LSH_PLANES,
        _LSH_TABLES,
        _N_QUERIES,
    )
    from fund_data_etl_pipeline_spark.session import get_spark
    from fund_data_etl_pipeline_spark.sources.tables import load_table
    from scale_probe import build_scaled_dir

    spark = get_spark(
        "ann-shuffle-probe", extra_conf={"spark.ui.enabled": "true"}
    )
    d = (
        build_scaled_dir(spark, args.sf, args.factor)
        if args.factor > 1
        else args.sf
    )
    emb = load_table(spark, d, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)

    out = {"factor": args.factor}
    for name, fn in (
        ("id_only", lambda: ann_lsh_topk(
            emb, queries, k=_K, planes=_LSH_PLANES, tables=_LSH_TABLES,
            dims=_LSH_DIMS,
        )),
        ("payload", lambda: payload_carrying_lsh_topk(
            emb, queries, k=_K, planes=_LSH_PLANES, tables=_LSH_TABLES,
            dims=_LSH_DIMS,
        )),
        # the r10 adaptive default: planes from the ann_planes ladder —
        # candidate volume per query stays ~OCC*tables as N grows
        ("adaptive", lambda: ann_lsh_topk(
            emb, queries, k=_K, tables=_LSH_TABLES, dims=_LSH_DIMS,
        )),
    ):
        spark.catalog.clearCache()
        before = _shuffle_write_bytes(spark)
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        out[f"{name}_sec"] = round(time.time() - t0, 3)
        out[f"{name}_bytes"] = _shuffle_write_bytes(spark) - before
    out["ratio"] = round(out["payload_bytes"] / max(out["id_only_bytes"], 1), 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
