"""Focused equivalence tests for the r13 single-aggregation LSH pairing
(operators/dedup.grouped_bucket_pairs, capped_bucket_ids).

The optimization replaced the occupancy-window + sort-merge self-join +
lead-window + union shape with ONE groupBy(bucket).collect_list(id)
aggregation and map-side pair generation. These tests pin the emitted
pair set against an independent pure-Python reference of the contract:

  - bucket occupancy <= cap: all pairs (i < j) over the bucket's ids
  - bucket occupancy  > cap: id-rank doubling — rank r pairs with
    r + 2^j for every stride 2^j < occupancy

and capped_bucket_ids against "the cap smallest ids per bucket" (the
former ROW_NUMBER <= cap window). Inputs include a bucket exactly AT the
cap, one just above it, a singleton, and ids deliberately inserted out
of order so the sort inside the aggregation is exercised.
"""

from __future__ import annotations

import itertools

from fund_data_etl_pipeline_spark.operators.dedup import (
    capped_bucket_ids,
    grouped_bucket_pairs,
)

# (bucket, id) rows; ids shuffled within buckets on purpose
_BUCKETS = {
    "a": [7, 3, 11, 5],          # occ 4  == cap -> all pairs (6)
    "b": [20, 24, 21, 23, 22],   # occ 5  >  cap -> doubling
    "c": [30],                   # singleton -> nothing
    "d": [41, 40],               # occ 2 -> one pair
    "e": list(range(100, 117)),  # occ 17 > cap -> strides 1,2,4,8,16
}
_CAP = 4


def _ref_pairs() -> set[tuple[int, int]]:
    out: set[tuple[int, int]] = set()
    for ids in _BUCKETS.values():
        s = sorted(ids)
        n = len(s)
        if n <= _CAP:
            out.update(
                (s[i], s[j]) for i, j in itertools.combinations(range(n), 2)
            )
        else:
            strides = [1 << j for j in range(31) if (1 << j) < n]
            out.update(
                (s[r], s[r + st])
                for r in range(n)
                for st in strides
                if r + st < n
            )
    return out


def _rows():
    return [(b, i) for b, ids in _BUCKETS.items() for i in ids]


def test_grouped_bucket_pairs_matches_reference(spark):
    df = spark.createDataFrame(_rows(), "bucket string, doc_id long")
    got = {
        (r.d1, r.d2)
        for r in grouped_bucket_pairs(df, "doc_id", ["bucket"], _CAP).collect()
    }
    assert got == _ref_pairs()
    # orientation invariant the downstream dedups rely on
    assert all(d1 < d2 for d1, d2 in got)


def test_grouped_bucket_pairs_all_pairs_at_cap_boundary(spark):
    # a bucket exactly at the cap takes the exhaustive branch
    df = spark.createDataFrame(
        [("a", i) for i in (3, 5, 7, 11)], "bucket string, doc_id long"
    )
    got = {
        (r.d1, r.d2)
        for r in grouped_bucket_pairs(df, "doc_id", ["bucket"], 4).collect()
    }
    assert got == {
        (x, y) for x, y in itertools.combinations((3, 5, 7, 11), 2)
    }


def test_capped_bucket_ids_keeps_smallest(spark):
    df = spark.createDataFrame(_rows(), "bucket string, doc_id long")
    got = {
        (r.bucket, r.doc_id)
        for r in capped_bucket_ids(df, "doc_id", ["bucket"], _CAP).collect()
    }
    want = {
        (b, i) for b, ids in _BUCKETS.items() for i in sorted(ids)[:_CAP]
    }
    assert got == want
