"""Similarity-search queries over the ``embeddings`` table.

``vector_cosine_topk`` is the exact baseline with a DuckDB oracle.
``vector_ann_lsh`` ALSO carries an exact oracle despite being the
"approximate" path: its hyperplanes are deterministic +-1 constants
(``rhp_sign_vector``) shipped as literals into both engines, and both
engines fold the projection sequentially, so bucket assignment — and
therefore the candidate set and the exact-cosine rank over it — is
engine-reproducible. ``vector_ann_ivf`` stays rows-only: the KMeans
quantizer is not SQL-expressible; recall vs the exact baseline is
pytest-asserted for both ANN paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    ivf_topk,
    rhp_sign_vector,
)
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


_LSH_PLANES = 4
_LSH_TABLES = 4
_LSH_DIMS = 64


def _bucket_sql(tbl: int) -> str:
    """DuckDB twin of ``rhp_bucket``: the same +-1 hyperplane constants as
    array literals, the same sequential dot product, the same >= 0 sign
    bit, concatenated in the same plane order."""
    bits = []
    for p in range(_LSH_PLANES):
        signs = rhp_sign_vector(tbl * _LSH_PLANES + p, _LSH_DIMS)
        arr = ", ".join(f"{s:.1f}" for s in signs)
        bits.append(
            f"CASE WHEN list_dot_product(v, [{arr}]) >= 0"
            " THEN '1' ELSE '0' END"
        )
    return " || ".join(bits)


_SIG_SQL = "\n      UNION ALL\n      ".join(
    f"SELECT vec_id, v, {t} AS tbl, {_bucket_sql(t)} AS bucket FROM e"
    for t in range(_LSH_TABLES)
)


@register(
    "vector_ann_lsh",
    # exact oracle for an ANN query: hyperplanes are shared literal
    # constants, so candidate generation + exact-cosine rank reproduce
    # bit-for-bit in DuckDB (round-3 VERDICT next-step #3)
    oracle=f"""
    WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
               FROM embeddings),
    sig AS (
      {_SIG_SQL}
    ),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, n.vec_id AS neighbor_id
      FROM sig q JOIN sig n ON q.tbl = n.tbl AND q.bucket = n.bucket
      WHERE q.vec_id < {_N_QUERIES} AND q.vec_id <> n.vec_id
    ),
    scored AS (
      SELECT c.query_id, c.neighbor_id, {G.round_sql(_COS, 6)} AS cos_sim
      FROM cand c
      JOIN e q ON q.vec_id = c.query_id
      JOIN e n ON n.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cos_sim, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM scored
    ) WHERE rank <= {_K}
    """,
)
def vector_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: bucketed equi-join instead of the cross
    join — the plan that survives 100 TB. Recall measured in pytest."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES)
    return ann_lsh_topk(
        emb, queries, k=_K, planes=_LSH_PLANES, tables=_LSH_TABLES,
        dims=_LSH_DIMS,
    )


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
