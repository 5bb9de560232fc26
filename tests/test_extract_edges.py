"""Extraction-builder edge semantics pinned by the r11 review fixes."""

from __future__ import annotations

from pyspark.sql import functions as F


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_label_value_never_crosses_lines(spark):
    """A label with no same-line value yields NULL — the old \\s*
    separator captured the first number on a FOLLOWING line (a date or
    account masquerading as a money amount)."""
    from fund_data_etl_pipeline_spark.functions.extract import label_value

    doc = F.lit("红利金额：\n20240101 对账单")
    assert _one(spark, label_value(doc, "红利金额")) is None
    doc2 = F.lit("红利金额：\n\n 99.50元")
    assert _one(spark, label_value(doc2, "红利金额")) is None
    # same-line values still extract, with or without the colon
    assert _one(spark, label_value(F.lit("红利金额： 99.50元"), "红利金额")) == "99.50"
    assert _one(spark, label_value(F.lit("红利金额 99.50"), "红利金额")) == "99.50"


def test_label_value_until_multiple_stops(spark):
    """Every stop keyword cuts the line, not just the last one in the
    alternation (the precedence bug attached [^\\n]* to the final stop
    only)."""
    from fund_data_etl_pipeline_spark.functions.extract import (
        label_value_until,
    )

    line = F.lit("客户名称：张三 基金账号 12345")
    got = _one(
        spark, label_value_until(line, "客户名称", stops=("基金账号", "电话"))
    )
    assert got == "张三"
    got2 = _one(
        spark, label_value_until(line, "客户名称", stops=("电话", "基金账号"))
    )
    assert got2 == "张三"


def test_stitched_name_empty_stop_list_stitches(spark):
    """No stop keywords means only the empty-line / lookahead bounds end
    the stitch — the bare ''.join built an always-matching empty regex
    that stopped before the first appended line."""
    from fund_data_etl_pipeline_spark.functions.extract import stitched_name

    lines = F.split(F.lit("客户名称：华泰\n资产管理计划\n\n尾部行"), "\n")
    got = _one(spark, stitched_name(lines, "客户名称", []))
    assert got == "华泰资产管理计划"
    # a stop keyword containing an ASCII regex metachar matches literally
    lines2 = F.split(F.lit("客户名称：华泰\nA(B\n资产"), "\n")
    got2 = _one(spark, stitched_name(lines2, "客户名称", ["A(B"]))
    assert got2 == "华泰"


def test_write_sized_small_partitions_stay_one_file(spark, tmp_path):
    """Per-partition-value slot sizing: a huge partition splits, tiny
    sibling partitions do NOT shatter into the huge partition's slot
    count (the global-max bug wrote ~slots near-empty files per small
    value)."""
    import glob

    from fund_data_etl_pipeline_spark.operators.sinks import write_sized

    df = spark.range(0, 5300).select(
        F.when(F.col("id") < 5000, F.lit("big"))
        .otherwise(F.concat(F.lit("small"), (F.col("id") % 3).cast("string")))
        .alias("day"),
        F.col("id").alias("v"),
    )
    out = str(tmp_path / "sized")
    n_files = write_sized(df, out, partition_cols=("day",),
                          target_rows_per_file=1000)
    per_part = {
        p.rsplit("day=", 1)[1]: len(glob.glob(f"{p}/*.parquet"))
        for p in glob.glob(f"{out}/day=*")
    }
    assert per_part["big"] >= 5  # ~5000/1000
    for k, n in per_part.items():
        if k != "big":
            assert n == 1, (k, n)  # 100 rows -> exactly one file
    assert n_files == sum(per_part.values())

    # append returns only THIS call's files, not the directory total
    n2 = write_sized(
        spark.range(5).select(F.lit("small0").alias("day"),
                              F.col("id").alias("v")),
        out, partition_cols=("day",), target_rows_per_file=1000,
        mode="append",
    )
    assert n2 == 1
