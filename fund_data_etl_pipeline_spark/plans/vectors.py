"""Similarity-search queries over the ``embeddings`` table.

``vector_cosine_topk`` is the exact baseline with a DuckDB oracle;
``vector_ann_lsh`` is the LSH-bucketed approximate path (no SQL oracle —
driver records a rows-only check; recall vs the exact baseline is asserted
in tests/test_vectors.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import ann_lsh_topk, cosine_topk, ivf_topk
from ..sources import load_table
from . import _sqlgen as G
from . import register

_K = 5
_N_QUERIES = 10

_COS = (
    "list_dot_product(q.v, n.v) /"
    " (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(n.v, n.v)))"
)


@register(
    "vector_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             {G.round_sql(_COS, 6)} AS cos_sim
      FROM e q JOIN e n ON q.vec_id <> n.vec_id
      WHERE q.vec_id < {_N_QUERIES}
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_K}
    """,
)
def vector_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-k for the first {_N_QUERIES} vectors."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return cosine_topk(emb, queries, k=_K)


@register("vector_ann_lsh")  # no oracle: approximate operator, rows-only
def vector_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: bucketed equi-join instead of the cross
    join — the plan that survives 100 TB. Recall measured in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ann_lsh_topk(emb, queries, k=_K, planes=4, tables=4, dims=64)


@register("vector_ann_ivf")  # no oracle: approximate operator, rows-only
def vector_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN: KMeans coarse quantizer trained on a deterministic 50%
    hash sample (the 100 TB shape — the quantizer never needs the full
    corpus), queries probe the nearest 2 of 16 inverted lists —
    candidates shrink ~8x vs brute force. Recall measured in pytest
    against the exact baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ivf_topk(emb, queries, k=_K, n_lists=16, n_probe=2, train_fraction=0.5)
