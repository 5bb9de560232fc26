"""Data-governance ops (plans/quality.py): planted contract violations
must flip exactly their own rule to fail; k-anonymity flags small groups."""

from __future__ import annotations

from pyspark.sql import functions as F

from fund_data_etl_pipeline_spark.plans.quality import constraint_report


def _report(spark, orders_rows, li_rows, cust_rows):
    orders = spark.createDataFrame(
        orders_rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double",
    )
    li = spark.createDataFrame(
        li_rows, "l_orderkey long, l_discount double, l_quantity double"
    )
    cust = spark.createDataFrame(cust_rows, "c_custkey long")
    return {
        r["rule"]: (r["violations"], r["status"])
        for r in constraint_report(orders, li, cust).collect()
    }


def test_clean_tables_all_pass(spark):
    rep = _report(
        spark,
        [(1, 10, "O", 5.0), (2, 11, "F", 7.0)],
        [(1, 0.05, 3.0), (2, 0.0, 50.0)],
        [(10,), (11,)],
    )
    assert len(rep) == 8
    assert all(v == (0, "pass") for v in rep.values()), rep


def test_each_planted_violation_flips_its_own_rule(spark):
    rep = _report(
        spark,
        [
            (1, 10, "O", 5.0),
            (1, None, "X", -2.0),  # dup key, null cust, bad status, bad price
            (3, 99, "F", 1.0),     # cust 99 missing -> referential fail
        ],
        [(1, 1.5, 0.0), (7, 0.0, 3.0)],  # bad discount+qty; orderkey 7 orphan
        [(10,)],
    )
    expect_fail = {
        "orders.o_orderkey is unique": 1,
        "orders.o_custkey is complete": 1,
        "orders.o_orderstatus in (O,F,P)": 1,
        "orders.o_totalprice > 0": 1,
        "lineitem.l_discount in [0,1]": 1,
        "lineitem.l_quantity in (0,50]": 1,
        "lineitem.l_orderkey references orders": 1,
        "orders.o_custkey references customer": 2,  # cust 99 + the NULL row? no: NULL never matches -> anti-join keeps it
    }
    # NULL o_custkey also fails the referential anti-join (NULL joins nothing)
    for rule, n in expect_fail.items():
        viol, status = rep[rule]
        assert status == "fail", rule
        assert viol == n, (rule, viol)


def test_k_anonymity_flags_small_groups(spark, sf_dir):
    import __spark_entry__ as e

    rows = e.queries()["k_anonymity_audit"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["anonymous"] == (r["group_size"] >= 5)


def test_group_capped_sample_caps_and_is_deterministic(spark):
    from fund_data_etl_pipeline_spark.operators.sampling import (
        group_capped_sample,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 40 else "small") for i in range(43)],
        "doc_id long, source string",
    )
    out = group_capped_sample(df, "source", cap=5).collect()
    by_src: dict[str, list[int]] = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    assert len(by_src["big"]) == 5  # capped
    assert len(by_src["small"]) == 3  # under cap -> kept whole
    again = group_capped_sample(df, "source", cap=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
