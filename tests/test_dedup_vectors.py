"""Property tests for dedup + similarity operators (sf0.001 + synthetic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from fund_data_etl_pipeline_spark.operators import dedup as D
from fund_data_etl_pipeline_spark.operators.similarity import ann_lsh_topk, cosine_topk
from fund_data_etl_pipeline_spark.sources import load_table


def test_exact_dedup_identical_docs(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.exact_dedup(df).collect()}
    # whitespace-collapsed, lowercased -> docs 1 and 2 are the same group
    assert out[1]["canonical_id"] == 1 and out[2]["canonical_id"] == 1
    assert out[1]["group_size"] == 2
    assert out[3]["group_size"] == 1


def test_minhash_lsh_recall_vs_exhaustive(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["d1"], r["d2"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r["d1"], r["d2"])
        for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    # LSH verifies candidates with the exact jaccard, so it can only miss
    # pairs, never invent them
    assert lsh <= exact
    if exact:
        assert len(lsh) / len(exact) >= 0.8  # banding recall at t=0.8


def test_simhash_identical_and_perturbed(spark):
    base = "the quick brown fox jumps over the lazy dog " * 5
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, base + " extra token appended here"),
         (4, "completely different content about spark engines and joins")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]  # identical docs -> identical signature

    def ham(a, b):
        return bin(a ^ b).count("1")

    assert ham(sigs[1], sigs[3]) <= ham(sigs[1], sigs[4])


def test_ann_lsh_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, k=5)
    approx = ann_lsh_topk(emb, queries, k=5, planes=4, tables=4, dims=64)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(approx_pairs & exact_pairs) / len(exact_pairs)
    assert recall >= 0.3, f"multi-table LSH recall too low: {recall:.2f}"


def test_cosine_topk_self_excluded_and_ranked(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    out = cosine_topk(emb, queries, k=5).collect()
    assert all(r["query_id"] != r["neighbor_id"] for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cos_sim"]))
    for q, rows in by_q.items():
        rows.sort()
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) == 5


def test_ngram_hot_shingle_cap(spark, sf_dir):
    """A cap above every shingle's document frequency is a no-op (capped ==
    exhaustive); a tiny cap prunes the candidate space — the 100 TB guard
    against one stop-phrase shingle creating O(k^2) pairs."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    nofx = {
        (r["d1"], r["d2"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(
            docs, threshold=0.8, max_doc_freq=10**9
        ).collect()
    }
    assert nofx == exact

    capped = {
        (r["d1"], r["d2"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8, max_doc_freq=1).collect()
    }
    # dropping every shared shingle (df>1) removes all candidate pairs
    assert capped == set()
