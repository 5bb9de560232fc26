"""Smoke + semantics tests for the relational plan suite at sf0.001.

The heavy value-level verification runs through tools/check_correctness.py
(DuckDB oracle at sf0.01); these tests pin scheme-level invariants that the
hash compare can't express (e.g. first-match cascade order, broadcast hint
presence).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sum_qty", "avg_qty", "count_order"} <= set(df.columns)


def test_every_query_has_unique_columns(spark, sf_dir):
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        assert len(df.columns) == len(set(df.columns)), name


def test_oracles_reference_known_queries():
    qs = entrymod.queries()
    for name in entrymod.oracle_sql():
        assert name in qs, f"oracle {name} without query"


def test_when_cascade_first_match_wins(spark, sf_dir):
    # PROMO & size>30 rows must land in promo_large, never plain promo.
    from pyspark.sql import functions as F

    from fund_data_etl_pipeline_spark.sources import load_table

    part = load_table(spark, sf_dir, "part")
    promo_large = part.filter(
        F.col("p_type").contains("PROMO") & (F.col("p_size") > 30)
    ).count()
    tiers = {
        r["tier"]: r["n_parts"]
        for r in entrymod.queries()["when_cascade_tier"](spark, sf_dir).collect()
    }
    if promo_large:
        assert tiers.get("promo_large") == promo_large


def test_dim_join_left_keeps_unmatched(spark, sf_dir):
    df = entrymod.queries()["dim_join_left"](spark, sf_dir)
    assert df.filter("cust_name IS NULL").count() > 0
    assert df.count() == df.select("o_orderkey", "o_custkey").count()


def test_dim_join_is_broadcast(spark, sf_dir):
    plan = entrymod.queries()["dim_join_left"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


@pytest.mark.parametrize("name", ["pricing_summary", "group_merge", "topk_revenue"])
def test_query_nonempty(spark, sf_dir, name):
    assert entrymod.queries()[name](spark, sf_dir).count() > 0
