"""Property-based tests (SURVEY.md §5.3) — hypothesis drives the cleaning
scalars through one Spark evaluation per property batch."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fund_data_etl_pipeline_spark.functions.cleaning import (
    clean_number,
    complete_name_suffix,
    correct_fund_code,
)

SETTINGS = dict(max_examples=20, deadline=None)


def _eval(spark, expr_builder, values):
    df = spark.createDataFrame([(v,) for v in values], "v string")
    return [r["o"] for r in df.select(expr_builder(F.col("v")).alias("o")).collect()]


@settings(**SETTINGS)
@given(
    st.lists(
        st.decimals(
            min_value=-10_000_000, max_value=10_000_000, places=2, allow_nan=False
        ),
        min_size=1,
        max_size=20,
    )
)
def test_clean_number_roundtrip_on_canonical_numbers(spark, xs):
    """comma-format ∘ clean_number = identity on canonical 2dp numbers."""
    formatted = [f"{x:,.2f}" for x in xs]
    out = _eval(spark, clean_number, formatted)
    assert out == [float(x) for x in xs]


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(
            alphabet="万联资管臻选号集合单一资产管理计划FO123", min_size=1, max_size=12
        ),
        min_size=1,
        max_size=20,
    )
)
def test_suffix_completion_idempotent(spark, names):
    once = _eval(spark, complete_name_suffix, names)
    twice = _eval(spark, complete_name_suffix, once)
    assert once == twice


@settings(**SETTINGS)
@given(
    st.lists(
        st.text(alphabet="0123456789l8B", min_size=6, max_size=6),
        min_size=1,
        max_size=20,
    )
)
def test_correct_fund_code_fixpoint(spark, codes):
    """Applying the OCR repair twice changes nothing (fixpoint), and the
    output never contains a lowercase l after position 0."""
    once = _eval(spark, correct_fund_code, codes)
    twice = _eval(spark, correct_fund_code, [c or "" for c in once])
    assert once == twice
    for c in once:
        assert c is None or "l" not in c[1:]


def test_clean_number_garbage_to_null(spark):
    out = _eval(spark, clean_number, ["abc", "", "  ", "12,34,5x", "1.2.3"])
    assert out == [None, None, None, None, None]
