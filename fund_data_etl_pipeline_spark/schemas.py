"""Explicit schemas for every engine dataset (SURVEY.md §1).

The reference declares one ordered column list per job (`target_cols`,
e.g. dividend_extractor.py:22, purchase_extractor.py:22,
conversion_extractor.py:22-24). The engine uses English column names
internally; ``CN_NAMES`` maps them back to the reference's Chinese headers
for the Excel-compat sink only.

Typing rules (SURVEY.md §1.2):
- fund/product codes stay STRING (leading zeros);
- money/shares are DOUBLE rounded to 2dp, unparseable -> NULL;
- dates are handled as DateType internally, serialized 'yyyyMMdd' at the
  edge (the reference's 8-char strings);
- missing is NULL everywhere inside the engine ('' only in the Excel shim).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# Input corpus: one row per statement document, post text extraction
# (FIXTURES.md §1; reference scan+parse dividend_extractor.py:1278-1298).
# --------------------------------------------------------------------------

FUND_DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("filename", T.StringType(), False),
        T.StructField("rel_path", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
    ]
)

# Dimension: product name -> ledger code (product_code_dict,
# dividend_extractor.py:25-30; conversion map conversion_extractor.py:28-41).
PRODUCT_CODES_SCHEMA = T.StructType(
    [
        T.StructField("product_name", T.StringType(), False),
        T.StructField("ledger_code", T.StringType(), True),
        T.StructField("map_kind", T.StringType(), False),  # default | conversion
    ]
)

# --------------------------------------------------------------------------
# Output schemas (SURVEY.md §1.4). Column ORDER is part of the contract.
# --------------------------------------------------------------------------

# 1. dividend_reinvest — dividend_extractor.py:22 (11 cols)
DIVIDEND_COLS = [
    "ledger_code",       # 账套编号 (dim join)
    "product_code",      # 产品代码 ('')
    "fund_code",         # 基金市场代码
    "market",            # 交易市场 = '国内银行间'
    "biz_date",          # 日期 = run_date
    "shares",            # 派送份额
    "amount",            # 派送金额
    "cutoff_date",       # 红利截止日期 (run_date-1 unless platform-supplied)
    "position_class",    # 持仓分类 ('')
    "product_name",      # 产品名称
    "platform",          # 基金平台
]

# 2. txn_16col — purchase apply/confirm + redemption confirm
# (purchase_extractor.py:22)
TXN_COLS = [
    "ledger_code",               # 账套编号
    "fund_code",                 # 基金市场代码
    "market",                    # 交易市场
    "biz_date",                  # 日期
    "business_type",             # 业务类别 (constant per job)
    "qty",                       # 数量
    "amount",                    # 金额
    "fee",                       # 手续费
    "commission",                # 佣金 ('')
    "counterparty",              # 交易对手 ('')
    "cash_account",              # 资金账户 ('')
    "redemption_arrival_date",   # 赎回到账日期 (redemptions only)
    "shareholder_account",       # 股东账户 ('')
    "seat_no",                   # 席位号 ('')
    "product_name",              # 产品名称
    "platform",                  # 基金平台
]

# 3. conversion_19col — conversion_extractor.py:22-24
CONVERSION_COLS = [
    "product_code",        # from the conversion dimension map (:300)
    "out_fund_code",
    "out_market",
    "out_confirm_date",
    "out_shares",
    "out_amount",
    "out_fee",
    "in_fund_code",
    "in_market",
    "in_shares",
    "in_amount",           # = out_amount - in_fee, fallback out_amount (:212-219)
    "in_fee",
    "cash_account",
    "shareholder_code",
    "seat_code",
    "refund_settle_date",
    "in_confirm_date",
    "product_name",
    "platform",
]

# 4. manual_* (OCR path) — manual_*_extractor.py:249/281/279/247
MANUAL_APPLY_COLS = [
    "biz_date",
    "fund_code",
    "product_name",
    "amount",
    "business_type",
    "cash_account",
    "counterparty",
    "platform",
]
MANUAL_CONFIRM_COLS = MANUAL_APPLY_COLS[:4] + [
    "confirm_amount",
    "refund",             # 返款金额 = apply - confirm (:348-354)
    "business_type",
    "cash_account",
    "counterparty",
    "platform",
]
MANUAL_REDEMPTION_COLS = [
    "biz_date",
    "fund_code",
    "product_name",
    "shares",
    "amount",
    "business_type",
    "carry_over_income",  # 是否结转收益 = '否' (:367)
    "redemption_type",    # 赎回类型 = '1' (:368)
    "cash_account",
    "counterparty",
    "arrival_date",
    "platform",
]
MANUAL_DIVIDEND_COLS = [
    "voucher_date",       # 凭证日期 = run_date-1 (manual_dividen_extractor.py:329)
    "register_date",      # 登记日期 = run_date-1 (:330)
    "fund_code",
    "product_name",
    "shares",
    "amount",
    "platform",
]

# Chinese headers for the Excel-compat sink (reference parity only).
CN_NAMES = {
    "ledger_code": "账套编号",
    "product_code": "产品代码",
    "fund_code": "基金市场代码",
    "market": "交易市场",
    "biz_date": "日期",
    "shares": "派送份额",
    "amount": "派送金额",
    "cutoff_date": "红利截止日期",
    "position_class": "持仓分类",
    "product_name": "产品名称",
    "platform": "基金平台",
    "business_type": "业务类别",
    "qty": "数量",
    "fee": "手续费",
    "commission": "佣金",
    "counterparty": "交易对手",
    "cash_account": "资金账户",
    "redemption_arrival_date": "赎回到账日期",
    "shareholder_account": "股东账户",
    "seat_no": "席位号",
    "confirm_amount": "确认金额",
    "refund": "返款金额",
    "carry_over_income": "是否结转收益",
    "redemption_type": "赎回类型",
    "arrival_date": "到账日期",
    "voucher_date": "凭证日期",
    "register_date": "登记日期",
}

# Market / business-type constants (N1, SURVEY §2.6).
MARKET_INTERBANK = "国内银行间"
BT_PURCHASE_APPLY = "基金申购申请"      # purchase_extractor.py:1091
BT_PURCHASE_CONFIRM = "基金申购确认"    # purchase_confirm_extractor.py:1593
BT_REDEMPTION_CONFIRM = "基金赎回确认"  # redemption_extractor.py:1313
