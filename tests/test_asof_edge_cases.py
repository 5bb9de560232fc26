"""asof_join row-integrity rules + the LSH dims guard (r11 review)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

L = "user_id bigint, ts timestamp, err_id bigint"
R = "user_id bigint, ts timestamp, click_id bigint, click_value double"


def _frames(spark, lrows, rrows):
    left = spark.createDataFrame(
        [(u, ts, e) for u, ts, e in lrows],
        "user_id bigint, ts string, err_id bigint",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [(u, ts, c, v) for u, ts, c, v in rrows],
        "user_id bigint, ts string, click_id bigint, click_value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    return left, right


def _run(spark, lrows, rrows, **kw):
    from fund_data_etl_pipeline_spark.operators.joins import asof_join

    left, right = _frames(spark, lrows, rrows)
    return {
        r["err_id"]: (r["click_id"], r["click_value"])
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            payload=["click_id", "click_value"], suffix="", **kw
        ).collect()
    }


def test_asof_payload_is_one_right_row(spark):
    """A NULL in the matched right row's payload stays NULL — the fill
    must not compose click_id from the latest row with click_value from
    an OLDER one (the per-column fill bug)."""
    got = _run(
        spark,
        [(1, "2026-01-15 10:00:03", 100)],
        [
            (1, "2026-01-15 10:00:01", 7, 5.0),
            (1, "2026-01-15 10:00:02", 8, None),  # matched row, NULL value
        ],
    )
    assert got[100] == (8, None)


def test_asof_same_ts_tie_is_deterministic_with_right_order(spark):
    """Two right rows at the SAME (key, ts): right_order picks the max —
    and the whole payload comes from that row."""
    rrows = [
        (1, "2026-01-15 10:00:01", 7, 70.0),
        (1, "2026-01-15 10:00:01", 9, 90.0),
        (1, "2026-01-15 10:00:01", 8, 80.0),
    ]
    got = _run(
        spark,
        [(1, "2026-01-15 10:00:05", 100)],
        rrows,
        right_order="click_id",
    )
    assert got[100] == (9, 90.0)


def test_asof_null_keys_never_match(spark):
    """SQL equality semantics: a NULL-key left row gets NULL payload even
    when NULL-key right rows exist earlier (the window would otherwise
    group them together)."""
    got = _run(
        spark,
        [(None, "2026-01-15 10:00:05", 100), (1, "2026-01-15 10:00:05", 101)],
        [
            (None, "2026-01-15 10:00:01", 7, 5.0),
            (1, "2026-01-15 10:00:02", 8, 6.0),
        ],
    )
    assert got[100] == (None, None)
    assert got[101] == (8, 6.0)


def test_ann_lsh_rejects_dims_mismatch(spark):
    """A dims= that disagrees with the corpus's vector width must raise,
    not silently collapse every signature into the all-zeros bucket
    (zip_with NULL-padding poisons the projection fold)."""
    from fund_data_etl_pipeline_spark.operators.similarity import (
        ann_lsh_topk,
        check_dims,
    )

    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0]) for i in range(6)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(ValueError, match="all-zeros bucket"):
        ann_lsh_topk(vecs, vecs.limit(1), k=2, planes=2, dims=64)
    check_dims(vecs, "embedding", 3)  # matching width passes
    out = ann_lsh_topk(vecs, vecs.limit(1), k=2, planes=2, dims=3)
    assert out.count() >= 0  # plan builds and runs at the true width
