"""The reference's 9 job pipelines, re-expressed as single-scan Spark plans
(SURVEY.md §3, §7).

Scale design: each job is ONE declarative pipeline over the document
corpus —

    scan -> filename prefilter (S2, before any parsing)
         -> classify (C1 ordered when-cascade -> ``platform``)
         -> per-platform record extraction compiled into ONE
            ``array<struct>`` column via a second when-cascade (CASE WHEN
            evaluates only the matched branch per row), multi-record
            platforms (F1-F4) produce >1 element
         -> a single ``explode`` (the flatMap)
         -> normalize (clean/cast/round/dates/constants)
         -> broadcast dimension join (J1)
         -> target-schema select (N5)

No per-platform branch re-scans the corpus, no Python UDFs anywhere, and
the only shuffles are the optional final aggregation (A1) — at 100 TB the
whole extract stage is a map-only pass inside whole-stage codegen.

The reference dispatches to ~80 hand-written parser functions
(dividend_extractor.py:1326-1396 etc.); here each platform is a SPEC — a
dict of field -> expression built from functions/extract.py — interpreted
by the same generic machinery (SURVEY §7.0 "platforms are data, not code").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .functions import extract as X
from .functions.numeric import round2
from .functions.cleaning import (
    clean_name,
    clean_number,
    complete_name_suffix,
    correct_fund_code,
    strip_currency,
)
from .operators.classify import (
    PlatformRule,
    all_of,
    any_of,
    classify,
    fname_has,
    fname_not,
    line_has,
    not_,
    text_has,
)
from .operators.normalize import dim_join, require_fields, split_quarantine, to_target
from .schemas import (
    BT_PURCHASE_APPLY,
    BT_PURCHASE_CONFIRM,
    BT_REDEMPTION_CONFIRM,
    CONVERSION_COLS,
    DIVIDEND_COLS,
    MANUAL_APPLY_COLS,
    MANUAL_CONFIRM_COLS,
    MANUAL_DIVIDEND_COLS,
    MANUAL_REDEMPTION_COLS,
    MARKET_INTERBANK,
    TXN_COLS,
)

NAME = r"[^\n　 ]+"  # single-line product-name capture


def _prep(docs: DataFrame) -> DataFrame:
    return docs.withColumn("lines", F.split(F.col("text"), "\n"))


def _rec(fields: dict[str, Column], all_fields: list[str]) -> Column:
    """One extraction record as a fixed-shape struct; absent fields NULL."""
    return F.struct(
        *[
            (fields[f] if f in fields else F.lit(None).cast("string")).alias(f)
            for f in all_fields
        ]
    )


def _single(fields: dict[str, Column], all_fields: list[str]) -> Column:
    return F.array(_rec(fields, all_fields))


def _records_column(
    specs: list[tuple[str, Column]], platform: Column
) -> Column:
    """Second when-cascade: platform -> its array<struct> of records."""
    expr = None
    for name, records in specs:
        cond = platform == name
        expr = F.when(cond, records) if expr is None else expr.when(cond, records)
    return expr


def _explode_records(
    df: DataFrame, specs: list[tuple[str, Column]], all_fields: list[str]
) -> DataFrame:
    recs = _records_column(specs, F.col("platform"))
    exploded = df.withColumn("rec", F.explode(recs))
    return exploded.select(
        "doc_id", "filename", "platform", *[F.col(f"rec.{f}").alias(f) for f in all_fields]
    )


def _run_date(run_date: str) -> Column:
    return F.to_date(F.lit(run_date))


def _yyyymmdd(col: Column) -> Column:
    return F.date_format(col, "yyyyMMdd")


# ==========================================================================
# Dividend-reinvest job (dividend_extractor.py:9-1488)
# ==========================================================================

DIVIDEND_RULES = [
    PlatformRule("好买基金", line_has("好买基金", 0, 2)),
    PlatformRule("天天基金", fname_has("天天基金")),
    PlatformRule("兴证全球基金", text_has("兴证全球基金")),
    PlatformRule("交通银行", any_of(fname_has("交行"), text_has("交通银行"))),
    PlatformRule("盈米基金", line_has("盈米", 0, 3)),
    PlatformRule("证达通基金", text_has("证达通")),
    PlatformRule(
        "国信嘉利基金", any_of(fname_has("国信嘉利"), text_has("国信嘉利"))
    ),
    PlatformRule("平安行E通", line_has("行E通", 5)),
    PlatformRule("利得基金", text_has("利得基金")),
    PlatformRule("长量基金", text_has("长量基金")),
    PlatformRule("招赢通基金", text_has("招赢通")),
    PlatformRule("邮储银行", text_has("邮储银行")),
    PlatformRule("和讯科技", text_has("和讯")),
    PlatformRule("建行直销", text_has("建设银行")),
    # C2 compound guard: 宁波 file that is NOT a 北极星 doc
    # (purchase_extractor.py:1004)
    PlatformRule("宁波银行", all_of(fname_has("宁波"), fname_not("北极星"))),
    PlatformRule("攀赢基金", text_has("攀赢")),
    PlatformRule("民生同业e+", text_has("民生同业")),
    PlatformRule("基煜基金", text_has("基煜")),
    PlatformRule("融联创同业交易平台", text_has("融联创")),
    PlatformRule("腾元基金", text_has("腾元")),
    PlatformRule("交e通", text_has("交e通")),
]

_DIV_FIELDS = ["product_name", "fund_code", "amount", "shares", "cutoff_date"]

# 证达通 tabular dividend row (P8, dividend_extractor.py:946-983)
_ZDT_DIV_ROW = r"(?m)^\d+\s+\d{10,}\s+(\S+)\s+([0-9]{6})\s+红利再投资\s+([\d,.]+)\s+([\d,.]+)[ \t]*$"


def _dividend_specs(text: Column, lines: Column, filename: Column):
    shares_xz = X.label_value(text, "再投资份额")
    gxjl_row = F.try_element_at(
        F.filter(lines, lambda l: l.contains("分红")), F.lit(1)
    )
    gxjl_shares = X.positional_value(lines, "分红", 5)
    zdt_rows = X.row_table_records(text, _ZDT_DIV_ROW)

    def zdt_rec(row: Column) -> Column:
        return _rec(
            {
                "product_name": F.regexp_extract(row, _ZDT_DIV_ROW.replace("(?m)", ""), 1),
                "fund_code": F.regexp_extract(row, _ZDT_DIV_ROW.replace("(?m)", ""), 2),
                "amount": F.regexp_extract(row, _ZDT_DIV_ROW.replace("(?m)", ""), 3),
                "shares": F.regexp_extract(row, _ZDT_DIV_ROW.replace("(?m)", ""), 4),
            },
            _DIV_FIELDS,
        )

    ym_segments = X.marker_records(text, r"序号:\d+\n")

    def ym_rec(seg: Column) -> Column:
        return _rec(
            {
                "product_name": X.label_value(text, "产品名称", NAME),
                "fund_code": X.label_value(seg, "基金代码", X.CODE6),
                "amount": X.label_value(seg, "确认金额"),
                "shares": X.label_value(seg, "确认份额"),
            },
            _DIV_FIELDS,
        )

    return [
        (
            "好买基金",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利总金额"),
                    "shares": strip_currency(
                        X.label_value(text, "再投资份额", rf"(?:CNY\s*)?{X.NUM}")
                    ),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "天天基金",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.next_line_value(text, "红利资金（元）"),
                    "shares": X.next_line_value(text, "再投资份额（份）", lookahead=2),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "兴证全球基金",
            _single(
                {
                    "product_name": X.label_value(
                        text, "产品名称", NAME, tolerate_spacing=True
                    ),
                    "fund_code": X.label_value(
                        text, "基金代码", X.CODE6, tolerate_spacing=True
                    ),
                    # P10 value aliasing: amount := reinvested shares
                    "amount": shares_xz,
                    "shares": shares_xz,
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "交通银行",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利金额"),
                    "shares": X.label_value(text, "再投资份额"),
                    # N3: 交行 cutoff = confirm_date - 1 day
                    # (dividend_extractor.py:443-456)
                    "cutoff_date": _yyyymmdd(
                        F.date_sub(
                            F.to_date(
                                X.label_value(text, "确认日期", r"\d{8}"), "yyyyMMdd"
                            ),
                            1,
                        )
                    ),
                },
                _DIV_FIELDS,
            ),
        ),
        ("盈米基金", F.transform(ym_segments, ym_rec)),
        ("证达通基金", F.transform(zdt_rows, zdt_rec)),
        (
            "国信嘉利基金",
            _single(
                {
                    # P9: name from filename
                    "product_name": X.filename_value(
                        filename, r"】?([^_】]+)_交易确认单", 1
                    ),
                    "fund_code": F.nullif(
                        F.regexp_extract(
                            F.coalesce(gxjl_row, F.lit("")), r"([0-9]{6})\s+分红", 1
                        ),
                        F.lit(""),
                    ),
                    # P10: amount := shares (positional P7)
                    "amount": gxjl_shares,
                    "shares": gxjl_shares,
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "平安行E通",
            _single(
                {
                    # P4 multi-line name stitching
                    "product_name": X.stitched_name(
                        lines, "产品名称", ["基金代码", "金额", "份额"], 4
                    ),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利总金额"),
                    "shares": X.label_value(text, "再投资份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "利得基金",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利金额"),
                    "shares": X.label_value(text, "再投份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "长量基金",
            # P10: amount := shares (dividend_extractor.py:171)
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": shares_xz,
                    "shares": shares_xz,
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "招赢通基金",
            # P11: CNY-prefixed amount (dividend_extractor.py:280-286)
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": strip_currency(
                        X.label_value(text, "红利金额", rf"(?:CNY\s*)?{X.NUM}")
                    ),
                    "shares": X.label_value(text, "再投资份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "邮储银行",
            # P4 stitching (dividend_extractor.py:300-321)
            _single(
                {
                    "product_name": X.stitched_name(
                        lines, "产品名称", ["基金代码", "金额", "份额"], 4
                    ),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "分红金额"),
                    "shares": X.label_value(text, "再投资份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "和讯科技",
            # P4 stitching (dividend_extractor.py:463-489)
            _single(
                {
                    "product_name": X.stitched_name(
                        lines, "产品名称", ["基金代码", "金额", "份额"], 4
                    ),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利总额"),
                    "shares": X.label_value(text, "再投份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "建行直销",
            # P5 letter-spaced labels + P10 (dividend_extractor.py:551-569)
            _single(
                {
                    "product_name": X.label_value(
                        text, "产品名称", NAME, tolerate_spacing=True
                    ),
                    "fund_code": X.label_value(
                        text, "基金代码", X.CODE6, tolerate_spacing=True
                    ),
                    "amount": X.label_value(
                        text, "再投资份额", tolerate_spacing=True
                    ),
                    "shares": X.label_value(
                        text, "再投资份额", tolerate_spacing=True
                    ),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "宁波银行",
            # P10 via 再投资确认份额 (dividend_extractor.py:1082-1094)
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "再投资确认份额"),
                    "shares": X.label_value(text, "再投资确认份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "攀赢基金",
            # P3 same-line-else-next-line fallback (dividend_extractor.py:1246-1259)
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利金额"),
                    "shares": F.coalesce(
                        X.label_value(text, "再投资份额"),
                        X.next_line_value(text, "再投资份额"),
                    ),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "民生同业e+",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利金额"),
                    "shares": X.label_value(text, "再投份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "基煜基金",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利金额"),
                    "shares": X.label_value(text, "再投份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "融联创同业交易平台",
            # P4 stitching (dividend_extractor.py:769-794)
            _single(
                {
                    "product_name": X.stitched_name(
                        lines, "产品名称", ["基金代码", "金额", "份额"], 4
                    ),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利金额"),
                    "shares": X.label_value(text, "再投份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "腾元基金",
            # P6 box-drawing cells (dividend variant)
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.box_cell(text, "基金代码", X.CODE6),
                    "amount": X.box_cell(text, "红利金额"),
                    "shares": X.box_cell(text, "再投份额"),
                },
                _DIV_FIELDS,
            ),
        ),
        (
            "交e通",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "红利金额"),
                    "shares": X.label_value(text, "再投份额"),
                },
                _DIV_FIELDS,
            ),
        ),
    ]


def dividend_records(docs: DataFrame) -> DataFrame:
    """Classify + extract, one row per extracted dividend record (pre
    normalization). Unmatched docs keep platform NULL and are split off by
    the caller via split_quarantine."""
    df = classify(_prep(docs), DIVIDEND_RULES)
    specs = _dividend_specs(F.col("text"), F.col("lines"), F.col("filename"))
    return _explode_records(df, specs, _DIV_FIELDS)


def dividend_job(
    docs: DataFrame, dim: DataFrame, run_date: str = "2026-01-15"
) -> DataFrame:
    """Full dividend pipeline -> 11-col target (SURVEY §1.4 schema 1)."""
    rd = _run_date(run_date)
    recs = dividend_records(docs)
    recs = require_fields(recs, ["fund_code", "amount", "shares"])
    norm = (
        recs.withColumn(
            "product_name", complete_name_suffix(clean_name(F.col("product_name")))
        )
        .withColumn("amount", clean_number(F.col("amount")))
        .withColumn("shares", clean_number(F.col("shares")))
        .withColumn(
            "cutoff_date",
            F.coalesce(F.col("cutoff_date"), _yyyymmdd(F.date_sub(rd, 1))),
        )
        .withColumn("market", F.lit(MARKET_INTERBANK))
        .withColumn("biz_date", _yyyymmdd(rd))
    )
    joined = dim_join(norm, dim.filter(F.col("map_kind") == "default"))
    return to_target(joined, DIVIDEND_COLS).withColumns(
        {
            "amount": F.col("amount").cast("double"),
            "shares": F.col("shares").cast("double"),
        }
    )


# ==========================================================================
# Purchase-apply / purchase-confirm / redemption-confirm (txn 16-col jobs)
# ==========================================================================

_TXN_FIELDS = ["product_name", "fund_code", "qty", "amount", "fee", "est_date"]

PURCHASE_APPLY_EXCLUDES = ("赎回", "超级", "转换", "分红方式", "分红设置", "失效")
PURCHASE_APPLY_RULES = [
    PlatformRule("好买基金", line_has("好买基金", 0, 2)),
    PlatformRule("天天基金", fname_has("天天基金")),
    PlatformRule("联泰基金", text_has("联泰")),
    PlatformRule("盈米基金", line_has("盈米", 0, 3)),
    PlatformRule("证达通基金", text_has("证达通")),
    PlatformRule("兴证全球基金", text_has("兴证全球基金")),
]

# F4 purchase variant (purchase_extractor.py:918-946)
_ZDT_APPLY_ROW = (
    r"(?m)^\d+\s+\d{10,}\s+(\S+)\s+([0-9]{6})\s+申购\s+"
    r"([\d,.]+)\s+([\d,.]+)[ \t]*$"
)


def _purchase_apply_specs(text: Column, lines: Column, filename: Column):
    lt_segments = X.marker_records(text, r"交易信息（\d+/\d+）")

    def lt_rec(seg: Column) -> Column:
        return _rec(
            {
                "product_name": X.label_value(seg, "产品名称", NAME),
                "fund_code": X.label_value(seg, "基金代码", X.CODE6),
                "amount": X.label_value(seg, "申购金额"),
                "fee": X.label_value(seg, "手续费"),
            },
            _TXN_FIELDS,
        )

    common = {
        "product_name": X.label_value(text, "产品名称", NAME),
        "fund_code": X.label_value(text, "基金代码", X.CODE6),
        "amount": X.label_value(text, "申请金额"),
        "fee": X.label_value(text, "手续费"),
    }

    ym_segments = X.marker_records(text, r"序号:\d+\n")

    def ym_rec(seg: Column) -> Column:
        return _rec(
            {
                "product_name": X.label_value(text, "产品名称", NAME),
                "fund_code": X.label_value(seg, "基金代码", X.CODE6),
                "amount": X.label_value(seg, "申购金额"),
                "fee": X.label_value(seg, "手续费"),
            },
            _TXN_FIELDS,
        )

    zdt_rows = X.row_table_records(text, _ZDT_APPLY_ROW)
    _za = _ZDT_APPLY_ROW.replace("(?m)", "")

    def zdt_rec(row: Column) -> Column:
        return _rec(
            {
                "product_name": F.regexp_extract(row, _za, 1),
                "fund_code": F.regexp_extract(row, _za, 2),
                "amount": F.regexp_extract(row, _za, 3),
                "fee": F.regexp_extract(row, _za, 4),
            },
            _TXN_FIELDS,
        )

    return [
        ("好买基金", _single({**common, "amount": X.label_value(text, "申购金额")}, _TXN_FIELDS)),
        ("天天基金", _single(common, _TXN_FIELDS)),
        ("联泰基金", F.transform(lt_segments, lt_rec)),
        ("盈米基金", F.transform(ym_segments, ym_rec)),
        ("证达通基金", F.transform(zdt_rows, zdt_rec)),
        (
            "兴证全球基金",
            _single(
                {
                    "product_name": X.label_value(
                        text, "产品名称", NAME, tolerate_spacing=True
                    ),
                    "fund_code": X.label_value(
                        text, "基金代码", X.CODE6, tolerate_spacing=True
                    ),
                    "amount": X.label_value(text, "申请金额", tolerate_spacing=True),
                    "fee": X.label_value(text, "手续费", tolerate_spacing=True),
                },
                _TXN_FIELDS,
            ),
        ),
    ]


PURCHASE_CONFIRM_EXCLUDES = ("强行调", "调增", "超级转换", "转换", "分红方式")
PURCHASE_CONFIRM_RULES = [
    # C2 compound guard: 好买 confirm must NOT be a conversion doc
    # (purchase_confirm_extractor.py:1479)
    PlatformRule(
        "好买基金", all_of(line_has("好买基金", 0, 2), not_(text_has("转换")))
    ),
    PlatformRule("腾元基金", text_has("腾元")),
    PlatformRule("平安行E通", line_has("行E通", 5)),
    # the reference's 2025-10-22 changelog regression (更新日志.txt:24-25):
    # confirm jobs wrongly picked up 天天/好买 super-conversion docs whose
    # FILENAME looks like a confirm — the guard must be content-based
    PlatformRule(
        "天天基金", all_of(fname_has("天天基金"), not_(text_has("超级转换")))
    ),
    PlatformRule("盈米基金", line_has("盈米", 0, 3)),
    PlatformRule("网金基金", text_has("网金")),
]


def _purchase_confirm_specs(text: Column, lines: Column, filename: Column):
    ym_segments = X.marker_records(text, r"序号:\d+\n")

    def ym_rec(seg: Column) -> Column:
        return _rec(
            {
                "product_name": X.label_value(text, "产品名称", NAME),
                "fund_code": X.label_value(seg, "基金代码", X.CODE6),
                "amount": X.label_value(seg, "确认金额"),
                "qty": X.label_value(seg, "确认份额"),
            },
            _TXN_FIELDS,
        )

    # P15 dual format in the confirm context
    wj_fmt2 = F.exists(lines, lambda l: l.contains("─────"))
    wj_amount = F.when(wj_fmt2, X.next_line_value(text, "确认金额")).otherwise(
        X.label_value(text, "确认金额")
    )
    return [
        (
            "好买基金",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "确认金额"),
                    "qty": X.label_value(text, "确认份额"),
                    "fee": X.label_value(text, "手续费"),
                },
                _TXN_FIELDS,
            ),
        ),
        (
            "腾元基金",
            _single(
                {
                    # P6 box-drawing cells (purchase_confirm_extractor.py:610-656)
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.box_cell(text, "基金代码", X.CODE6),
                    "amount": X.box_cell(text, "确认金额"),
                    "qty": X.box_cell(text, "确认份额"),
                    "fee": X.box_cell(text, "手续费"),
                },
                _TXN_FIELDS,
            ),
        ),
        (
            "平安行E通",
            _single(
                {
                    "product_name": X.stitched_name(
                        lines, "产品名称", ["基金代码", "金额", "份额"], 4
                    ),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "确认金额"),
                    "qty": X.label_value(text, "确认份额"),
                    "fee": X.label_value(text, "手续费"),
                },
                _TXN_FIELDS,
            ),
        ),
        (
            "天天基金",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "确认金额"),
                    "qty": X.label_value(text, "确认份额"),
                    "fee": X.label_value(text, "手续费"),
                },
                _TXN_FIELDS,
            ),
        ),
        ("盈米基金", F.transform(ym_segments, ym_rec)),
        (
            "网金基金",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": wj_amount,
                    "qty": X.label_value(text, "确认份额"),
                    "fee": X.label_value(text, "手续费"),
                },
                _TXN_FIELDS,
            ),
        ),
    ]


REDEMPTION_EXCLUDES = ("申购", "认购", "分红方式", "失效")
REDEMPTION_RULES = [
    PlatformRule("平安行E通", line_has("行E通", 5)),
    PlatformRule("网金基金", text_has("网金")),
    # P16: JD conversion doc's page-2 forced-redemption block feeds the
    # redemption job (redemption_extractor.py:379-459)
    PlatformRule(
        "京东肯特瑞强赎", all_of(fname_has("肯特瑞"), text_has("强行赎回确认"))
    ),
    PlatformRule("腾元基金", text_has("腾元")),
    PlatformRule("证达通基金", text_has("证达通")),
]

# F4 redemption variant: tabular rows incl. fee column
# (redemption_extractor.py:1112-1145)
_ZDT_RED_ROW = (
    r"(?m)^\d+\s+\d{10,}\s+(\S+)\s+([0-9]{6})\s+赎回\s+"
    r"([\d,.]+)\s+([\d,.]+)\s+([\d,.]+)[ \t]*$"
)


def _redemption_specs(text: Column, lines: Column, filename: Column):
    # P15 — 网金 dual format: format 2 marked by a ───── separator line
    # (dividend_extractor.py:615-716 analogue for redemptions)
    wj_fmt2 = F.exists(lines, lambda l: l.contains("─────"))
    wj_amount = F.when(wj_fmt2, X.next_line_value(text, "到账金额")).otherwise(
        X.label_value(text, "赎回金额")
    )
    # N3 — 平安 T+n: est arrival = run date + (n-1) days
    # (redemption_extractor.py:662-672); resolved in the job (needs run_date)
    pa_tn = F.nullif(
        F.regexp_extract(text, r"[TＴ]\s*\+\s*(\d+)", 1), F.lit("")
    )
    # P16: scope to the forced-redemption section only
    jd_section = X.section_after(text, "强行赎回确认")
    # F3: 腾元 multi-page — one segment per 业务类型│赎回确认 marker
    # (redemption_extractor.py:769-835)
    ty_segments = X.marker_records(text, r"业务类型│赎回确认\n")

    def ty_rec(seg: Column) -> Column:
        return _rec(
            {
                "product_name": X.label_value(text, "产品名称", NAME),
                "fund_code": X.box_cell(seg, "基金代码", X.CODE6),
                "qty": X.box_cell(seg, "赎回份额"),
                "amount": X.box_cell(seg, "赎回金额"),
                "fee": X.box_cell(seg, "手续费"),
            },
            _TXN_FIELDS,
        )

    zdt_rows = X.row_table_records(text, _ZDT_RED_ROW)
    _zr = _ZDT_RED_ROW.replace("(?m)", "")

    def zdt_red_rec(row: Column) -> Column:
        return _rec(
            {
                "product_name": F.regexp_extract(row, _zr, 1),
                "fund_code": F.regexp_extract(row, _zr, 2),
                "qty": F.regexp_extract(row, _zr, 3),
                "amount": F.regexp_extract(row, _zr, 4),
                "fee": F.regexp_extract(row, _zr, 5),
            },
            _TXN_FIELDS,
        )

    return [
        (
            "平安行E通",
            _single(
                {
                    "product_name": X.stitched_name(
                        lines, "产品名称", ["基金代码", "金额", "份额"], 4
                    ),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": X.label_value(text, "赎回金额"),
                    "qty": X.label_value(text, "赎回份额"),
                    "fee": X.label_value(text, "手续费"),
                    "est_date": pa_tn,  # raw n; job converts to a date
                },
                _TXN_FIELDS,
            ),
        ),
        (
            "网金基金",
            _single(
                {
                    "product_name": X.label_value(text, "产品名称", NAME),
                    "fund_code": X.label_value(text, "基金代码", X.CODE6),
                    "amount": wj_amount,
                    "qty": X.label_value(text, "赎回份额"),
                    "fee": X.label_value(text, "手续费"),
                },
                _TXN_FIELDS,
            ),
        ),
        (
            "京东肯特瑞强赎",
            _single(
                {
                    "product_name": X.label_value(jd_section, "产品名称", NAME),
                    "fund_code": X.label_value(jd_section, "基金代码", X.CODE6),
                    "amount": X.label_value(jd_section, "赎回金额"),
                    "qty": X.label_value(jd_section, "赎回份额"),
                },
                _TXN_FIELDS,
            ),
        ),
        ("腾元基金", F.transform(ty_segments, ty_rec)),
        ("证达通基金", F.transform(zdt_rows, zdt_red_rec)),
    ]


def _txn_job(
    docs: DataFrame,
    dim: DataFrame,
    run_date: str,
    rules,
    specs_fn,
    excludes,
    business_type: str,
    required: list[str],
    redemption: bool = False,
) -> DataFrame:
    rd = _run_date(run_date)
    pre = _prep(docs)
    for sub in excludes:  # S2: cheap filename pruning BEFORE any extraction
        pre = pre.filter(~F.col("filename").contains(sub))
    df = classify(pre, rules)
    specs = specs_fn(F.col("text"), F.col("lines"), F.col("filename"))
    recs = _explode_records(df, specs, _TXN_FIELDS)
    recs = require_fields(recs, required)
    arrival = (
        F.when(
            F.col("est_date").isNotNull(),
            _yyyymmdd(
                F.date_add(rd, F.col("est_date").try_cast("int") - F.lit(1))
            ),
        ).otherwise(_yyyymmdd(rd))
        if redemption
        else F.lit(None).cast("string")
    )
    norm = (
        recs.withColumn(
            "product_name", complete_name_suffix(clean_name(F.col("product_name")))
        )
        .withColumn("qty", clean_number(F.col("qty")))
        .withColumn("amount", clean_number(F.col("amount")))
        .withColumn("fee", clean_number(F.col("fee")))
        .withColumn("market", F.lit(MARKET_INTERBANK))
        .withColumn("biz_date", _yyyymmdd(rd))
        .withColumn("business_type", F.lit(business_type))
        .withColumn("redemption_arrival_date", arrival)
    )
    joined = dim_join(norm, dim.filter(F.col("map_kind") == "default"))
    return to_target(joined, TXN_COLS).withColumns(
        {
            "qty": F.col("qty").cast("double"),
            "amount": F.col("amount").cast("double"),
            "fee": F.col("fee").cast("double"),
        }
    )


def purchase_apply_job(docs, dim, run_date: str = "2026-01-15") -> DataFrame:
    return _txn_job(
        docs, dim, run_date, PURCHASE_APPLY_RULES, _purchase_apply_specs,
        PURCHASE_APPLY_EXCLUDES, BT_PURCHASE_APPLY, required=["fund_code", "amount"],
    )


def purchase_confirm_job(docs, dim, run_date: str = "2026-01-15") -> DataFrame:
    return _txn_job(
        docs, dim, run_date, PURCHASE_CONFIRM_RULES, _purchase_confirm_specs,
        PURCHASE_CONFIRM_EXCLUDES, BT_PURCHASE_CONFIRM, required=["fund_code", "amount"],
    )


def redemption_confirm_job(docs, dim, run_date: str = "2026-01-15") -> DataFrame:
    return _txn_job(
        docs, dim, run_date, REDEMPTION_RULES, _redemption_specs,
        REDEMPTION_EXCLUDES, BT_REDEMPTION_CONFIRM,
        required=["fund_code"], redemption=True,
    )


# ==========================================================================
# Super-conversion job (conversion_extractor.py)
# ==========================================================================

CONVERSION_RULES = [
    PlatformRule(
        "京东肯特瑞",
        all_of(fname_has("肯特瑞"), any_of(fname_has("超级"), fname_has("转换"))),
    ),
]


def conversion_job(docs, dim, run_date: str = "2026-01-15") -> DataFrame:
    """19-col conversion output; P16 section scoping + N4 derived
    in_amount = out_amount - in_fee with fallback to out_amount
    (conversion_extractor.py:212-219)."""
    rd = _run_date(run_date)
    pre = _prep(docs).filter(
        F.col("filename").contains("超级") | F.col("filename").contains("转换")
    )
    df = classify(pre, CONVERSION_RULES)
    text = F.col("text")
    section = F.coalesce(X.section_after(text, "转换确认"), text)  # P16
    extracted = df.filter(F.col("platform").isNotNull()).select(
        "doc_id",
        "filename",
        "platform",
        clean_name(X.label_value(text, "产品名称", NAME)).alias("product_name"),
        X.label_value(section, "转出基金代码", X.CODE6).alias("out_fund_code"),
        X.label_value(section, "转入基金代码", X.CODE6).alias("in_fund_code"),
        clean_number(X.label_value(section, "转出金额")).alias("out_amount"),
        clean_number(X.label_value(section, "转出份额")).alias("out_shares"),
        clean_number(X.label_value(section, "转入份额")).alias("in_shares"),
        clean_number(X.label_value(section, "转入手续费")).alias("in_fee"),
        X.label_value(section, "确认日期", r"\d{8}").alias("out_confirm_date"),
    )
    derived = extracted.withColumns(
        {
            # N4: in_amount = out_amount - in_fee, fallback out_amount
            "in_amount": F.coalesce(
                round2(F.col("out_amount") - F.col("in_fee"), 2),
                F.col("out_amount"),
            ),
            "out_market": F.lit(MARKET_INTERBANK),
            "in_market": F.lit(MARKET_INTERBANK),
        }
    )
    # a JD doc without the conversion block (e.g. pure forced-redemption,
    # handled by the redemption job) must not emit an empty conversion row
    derived = require_fields(derived, ["out_fund_code", "in_fund_code"])
    # conversion uses the SECOND dimension map -> product_code
    # (conversion_extractor.py:300)
    joined = dim_join(
        derived, dim.filter(F.col("map_kind") == "conversion"), code_col="ledger_code"
    ).withColumnRenamed("ledger_code", "product_code")
    out = to_target(joined, CONVERSION_COLS)
    return out.withColumns(
        {
            c: F.col(c).cast("double")
            for c in ["out_shares", "out_amount", "out_fee", "in_shares", "in_amount", "in_fee"]
        }
    )


# ==========================================================================
# Manual (OCR) jobs — manual_*_extractor.py; the OCR adapter itself is an
# I/O concern (S4) stubbed behind the documents table (SURVEY §7.4.6)
# ==========================================================================

MANUAL_PRODUCT = "万联资管万事如意FOF1号单一资产管理计划"
MANUAL_CASH_ACCOUNT = "051010100102026063"
_AMT = r"[\d,，]+\.\d{2}"


def _manual_base(docs: DataFrame, marker: str) -> DataFrame:
    """C3 doc-type detection: filename must contain 万事如意 and the first
    5 lines must contain the job marker (manual_purchase_apply_extractor.py:
    283,301)."""
    df = _prep(docs).filter(F.col("filename").contains("万事如意"))
    in_head = F.exists(
        F.slice(F.col("lines"), 1, 5), lambda l: l.contains(marker)
    )
    return df.filter(in_head)


def manual_purchase_apply_job(docs, dim, run_date: str = "2026-01-15") -> DataFrame:
    rd = _run_date(run_date)
    base = _manual_base(docs, "基金交易申请受理单")
    text = F.col("text")
    out = base.select(
        _yyyymmdd(rd).alias("biz_date"),
        # P13 OCR code repair after extraction
        correct_fund_code(
            X.label_value(text, "基金代码", r"[0-9A-Za-z8l]{6}")
        ).alias("fund_code"),
        F.lit(MANUAL_PRODUCT).alias("product_name"),
        # P12 candidate-max across OCR-noisy duplicated amounts
        X.candidate_max(text, _AMT).alias("amount"),
        F.lit("申购申请").alias("business_type"),
        F.lit(MANUAL_CASH_ACCOUNT).alias("cash_account"),
        F.lit(None).cast("string").alias("counterparty"),
        F.lit("万事如意直销").alias("platform"),
    )
    return require_fields(to_target_manual(out, MANUAL_APPLY_COLS), ["fund_code", "amount"])


def manual_purchase_confirm_job(docs, dim, run_date: str = "2026-01-15") -> DataFrame:
    rd = _run_date(run_date)
    base = _manual_base(docs, "交易确认单")
    text = F.col("text")
    apply_amt = X.candidate_max(text, rf"申请金额[：: ]*({_AMT})")
    confirm_amt = X.candidate_max(text, rf"确认金额[：: ]*({_AMT})")
    out = base.select(
        _yyyymmdd(rd).alias("biz_date"),
        correct_fund_code(
            X.label_value(text, "基金代码", r"[0-9A-Za-z8l]{6}")
        ).alias("fund_code"),
        F.lit(MANUAL_PRODUCT).alias("product_name"),
        apply_amt.alias("amount"),
        confirm_amt.alias("confirm_amount"),
        # N4: refund = apply - confirm (manual_purchase_confirm_extractor.py:348-354)
        round2(apply_amt - confirm_amt, 2).alias("refund"),
        X.label_value(text, "业务类型", r"[^\n 　]+").alias("business_type"),
        F.lit(MANUAL_CASH_ACCOUNT).alias("cash_account"),
        F.lit(None).cast("string").alias("counterparty"),
        F.lit("万事如意直销").alias("platform"),
    )
    # Q1 business-type whitelist (manual_purchase_confirm_extractor.py:407)
    out = out.filter(F.col("business_type").isin("申购确认", "认购确认"))
    return require_fields(to_target_manual(out, MANUAL_CONFIRM_COLS), ["fund_code"])


def manual_redemption_job(docs, dim, run_date: str = "2026-01-15") -> DataFrame:
    rd = _run_date(run_date)
    base = _manual_base(docs, "交易确认单")
    text = F.col("text")
    out = base.select(
        _yyyymmdd(rd).alias("biz_date"),
        correct_fund_code(
            X.label_value(text, "基金代码", r"[0-9A-Za-z8l]{6}")
        ).alias("fund_code"),
        F.lit(MANUAL_PRODUCT).alias("product_name"),
        X.candidate_max(text, rf"确认份额[：: ]*({_AMT})").alias("shares"),
        X.candidate_max(text, rf"确认金额[：: ]*({_AMT})").alias("amount"),
        X.label_value(text, "业务类型", r"[^\n 　]+").alias("business_type"),
        F.lit("否").alias("carry_over_income"),   # :367
        F.lit("1").alias("redemption_type"),       # :368
        F.lit(MANUAL_CASH_ACCOUNT).alias("cash_account"),
        F.lit(None).cast("string").alias("counterparty"),
        _yyyymmdd(rd).alias("arrival_date"),
        F.lit("万事如意直销").alias("platform"),
    )
    out = out.filter(F.col("business_type").isin("赎回确认", "强制赎回"))
    return require_fields(to_target_manual(out, MANUAL_REDEMPTION_COLS), ["fund_code"])


def manual_dividend_job(docs, dim, run_date: str = "2026-01-15") -> DataFrame:
    rd = _run_date(run_date)
    base = _manual_base(docs, "分红")
    text = F.col("text")
    ex_right = _yyyymmdd(F.date_sub(rd, 1))  # manual_dividen_extractor.py:329-330
    out = base.select(
        ex_right.alias("voucher_date"),
        ex_right.alias("register_date"),
        correct_fund_code(
            X.label_value(text, "基金代码", r"[0-9A-Za-z8l]{6}")
        ).alias("fund_code"),
        F.lit(MANUAL_PRODUCT).alias("product_name"),
        X.candidate_max(text, rf"分红份额[：: ]*({_AMT})").alias("shares"),
        X.candidate_max(text, rf"分红金额[：: ]*({_AMT})").alias("amount"),
        F.lit("万事如意直销").alias("platform"),
    )
    return require_fields(to_target_manual(out, MANUAL_DIVIDEND_COLS), ["fund_code"])


def to_target_manual(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(*cols)


# ==========================================================================
# Run-all entry point (SURVEY §3.1: the reference's 9-job sequential plan,
# main - 基金单提取程序.py:471-548)
# ==========================================================================

JOB_PATH_KEYWORDS = {
    # reference: path must contain the job's folder keyword (S1)
    "dividend": "分红",
    "purchase_apply": "受理",
    "purchase_confirm": "确认",
    "redemption_confirm": "确认",
    "conversion": "确认",
}


def run_all(
    spark,
    corpus_root: str,
    dim: DataFrame,
    run_date: str,
    out_dir: str,
) -> dict[str, object]:
    """Scan the corpus ONCE, fan out into the 9 job pipelines, write each
    to a date-partitioned parquet sink plus one shared quarantine sink.

    The reference runs 9 sequential jobs each re-walking the share
    (main:501-527); here a single binaryFile scan + parse stage is
    persisted and every job is a filter over it — at 100 TB this is the
    difference between 9 corpus reads and 1.
    Returns {job: output path | False (empty)} plus audit counts.
    """
    from .operators.sinks import audit_summary, write_partitioned, write_quarantine
    from .sources.corpus import load_corpus

    parsed = load_corpus(spark, corpus_root).persist()
    ok = parsed.filter(F.col("status") == "ok").select(
        "doc_id", "filename", "rel_path", "text"
    )
    errors = parsed.filter(F.col("status") == "error")

    def sub(keyword: str) -> DataFrame:
        return ok.filter(F.col("rel_path").contains(keyword))

    pipelines = {
        "dividend": dividend_job(sub("分红"), dim, run_date),
        "purchase_apply": purchase_apply_job(sub("受理"), dim, run_date),
        "purchase_confirm": purchase_confirm_job(sub("确认"), dim, run_date),
        "redemption_confirm": redemption_confirm_job(sub("确认"), dim, run_date),
        "conversion": conversion_job(sub("确认"), dim, run_date),
        "manual_apply": manual_purchase_apply_job(ok, dim, run_date),
        "manual_confirm": manual_purchase_confirm_job(ok, dim, run_date),
        "manual_redemption": manual_redemption_job(ok, dim, run_date),
        "manual_dividend": manual_dividend_job(ok, dim, run_date),
    }
    status: dict[str, object] = {}
    for name, df in pipelines.items():
        path = f"{out_dir}/{name}"
        status[name] = path if write_partitioned(df, path) else False
    status["dividend_merged"] = (
        f"{out_dir}/dividend_merged"
        if write_partitioned(
            __import__(
                "fund_data_etl_pipeline_spark.operators.aggregate",
                fromlist=["dividend_merge"],
            ).dividend_merge(pipelines["dividend"]),
            f"{out_dir}/dividend_merged",
        )
        else False
    )
    status["quarantined"] = write_quarantine(errors, f"{out_dir}/quarantine")
    status["audit"] = {
        r["status"]: r["n"] for r in audit_summary(parsed).collect()
    }
    parsed.unpersist()
    return status
