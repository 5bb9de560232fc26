"""Stateful streaming operator + IVF ANN tests."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from fund_data_etl_pipeline_spark.operators.similarity import cosine_topk, ivf_topk
from fund_data_etl_pipeline_spark.sources import load_table
from fund_data_etl_pipeline_spark.streaming.stateful import user_running_totals

EVENT_SCHEMA = "ts timestamp, user_id long, value double"


def _write_events(path, rows):
    with open(path, "w") as f:
        for ts, uid, v in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid, "value": v}) + "\n")


def test_stateful_running_totals_across_restarts(spark, tmp_path):
    """applyInPandasWithState keeps per-user state in the checkpoint: a
    second AvailableNow run over NEW files continues the totals."""
    src = tmp_path / "events"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _write_events(src / "b1.json", [
        ("2026-01-15 10:00:00", 1, 10.0),
        ("2026-01-15 10:01:00", 1, 5.0),
        ("2026-01-15 10:02:00", 2, 7.0),
    ])

    out = str(tmp_path / "totals")

    def run_batch(_):
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
        q = (
            user_running_totals(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # latest snapshot per user = row with the max running count
        rows = spark.read.parquet(out).collect()
        latest = {}
        for r in rows:
            cur = latest.get(r["user_id"])
            if cur is None or r["n_events"] > cur[0]:
                latest[r["user_id"]] = (r["n_events"], r["sum_value"])
        return latest

    first = run_batch("totals1")
    assert first[1] == (2, 15.0)
    assert first[2] == (1, 7.0)

    _write_events(src / "b2.json", [
        ("2026-01-15 11:00:00", 1, 1.0),
        ("2026-01-15 11:01:00", 3, 2.5),
    ])
    second = run_batch("totals2")
    assert second[1] == (3, 16.0)  # state carried over: 2+1 events, 15+1
    assert second[3] == (1, 2.5)


def test_ivf_recall_and_candidate_reduction(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    approx_rows = ivf_topk(emb, queries, k=5, n_lists=8, n_probe=2).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.2, f"IVF recall too low: {recall:.2f}"
    # every query returns at most k candidates, ranked contiguously
    by_q = {}
    for r in approx_rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_ivf_sampled_training_recall(spark, sf_dir):
    """Training the quantizer on a 50% hash sample keeps recall in the
    same band as full training, and assignment stays deterministic."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    sampled = ivf_topk(
        emb, queries, k=5, n_lists=8, n_probe=2, train_fraction=0.5
    )
    rows = sampled.collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    assert len(approx & exact) / len(exact) >= 0.2
    again = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            emb, queries, k=5, n_lists=8, n_probe=2, train_fraction=0.5
        ).collect()
    }
    assert again == approx


def test_ivf_tiny_sample_falls_back_to_full_training(spark, sf_dir):
    """A train_fraction that would undersample the quantizer (fewer than
    4 vectors per list) silently retrains on the full corpus instead of
    degenerating or throwing."""
    emb = load_table(spark, sf_dir, "embeddings").limit(40)
    queries = emb.filter(F.col("vec_id") < 3)
    out = ivf_topk(
        emb, queries, k=3, n_lists=8, n_probe=2, train_fraction=0.01
    ).collect()
    assert len(out) > 0


def test_ivf_seed_quantizer_recall_and_determinism(spark, sf_dir):
    """The oracle-checkable seed-quantizer IVF (ivf_seed_topk — the
    registered vector_ann_ivf path) keeps recall in the same band as the
    KMeans variant, returns contiguous per-query ranks, and is exactly
    reproducible run-to-run (the property its DuckDB oracle relies on)."""
    from fund_data_etl_pipeline_spark.operators.similarity import ivf_seed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk(emb, queries, k=5).collect()
    }
    rows = ivf_seed_topk(emb, queries, k=5, n_lists=8, n_probe=2).collect()
    approx = {(r["query_id"], r["neighbor_id"]) for r in rows}
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.2, f"seed-IVF recall too low: {recall:.2f}"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    for ranks in by_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
    again = {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"])
        for r in ivf_seed_topk(emb, queries, k=5, n_lists=8, n_probe=2).collect()
    }
    assert again == {
        (r["query_id"], r["neighbor_id"], r["cos_sim"], r["rank"]) for r in rows
    }


def test_ivf_seed_plan_shape(spark, sf_dir):
    """The seed-IVF plan must be the scale shape its docstring claims:
    seeds reach the assignment as a BROADCAST (map-side dot folds, no
    shuffle of the corpus against seeds) and nothing degenerates to an
    unbroadcast CartesianProduct; the candidate stage is an equi-join on
    list_id."""
    from fund_data_etl_pipeline_spark.operators.similarity import ivf_seed_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    plan = (
        ivf_seed_topk(emb, queries, k=5, n_lists=8, n_probe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_ivf_index_build_paths_agree(spark, sf_dir):
    """r10 build_ivf_index: (a) the numpy (Arrow matmul) assignment and
    the HOF fold assignment pick identical lists on the test corpus
    (same float64 arithmetic, rounded to 6, min-list_id ties — bit
    agreement is empirical, which is exactly what this pins); (b) a
    query over the prebuilt index_tables= is row-identical to the
    inline form at the same width — the amortized daily-index shape
    changes cost, never results."""
    from pyspark.sql import functions as F

    from fund_data_etl_pipeline_spark.operators.similarity import (
        build_ivf_index,
        ivf_seed_topk,
    )
    from fund_data_etl_pipeline_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)

    seeds_np, assigned_np = build_ivf_index(emb, n_lists=8)
    _seeds_hof, assigned_hof = build_ivf_index(
        emb, n_lists=8, numpy_assign=False
    )
    np_map = {r["neighbor_id"]: r["list_id"] for r in assigned_np.collect()}
    hof_map = {r["neighbor_id"]: r["list_id"] for r in assigned_hof.collect()}
    assert np_map == hof_map and len(np_map) == emb.count()

    inline = sorted(
        map(tuple, ivf_seed_topk(emb, queries, k=5, n_lists=8,
                                 n_probe=2).collect())
    )
    via_index = sorted(
        map(
            tuple,
            ivf_seed_topk(
                emb, queries, k=5, n_probe=2,
                index_tables=(seeds_np, assigned_np),
            ).collect(),
        )
    )
    assert via_index == inline and inline


def test_ivf_topk_literal_vs_numpy_assignment(spark, sf_dir, monkeypatch):
    """r10: above _IVF_LITERAL_MAX the KMeans variant assigns via the
    Arrow GEMM instead of per-centroid literal expressions (the 512-list
    expression tree stalls analysis). Forcing the threshold to 0 routes
    the same (n_lists=8) quantizer through the numpy branch — the picks
    and final top-k must match the literal branch on the test corpus."""
    from pyspark.sql import functions as F

    import fund_data_etl_pipeline_spark.operators.similarity as S
    from fund_data_etl_pipeline_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    lit_rows = sorted(
        map(tuple, S.ivf_topk(emb, q, k=5, n_lists=8, n_probe=2).collect())
    )
    monkeypatch.setattr(S, "_IVF_LITERAL_MAX", 0)
    np_rows = sorted(
        map(tuple, S.ivf_topk(emb, q, k=5, n_lists=8, n_probe=2).collect())
    )
    assert np_rows == lit_rows and lit_rows
