"""Deterministic fund-document fixtures (FIXTURES.md §1-§3).

Synthetic statement documents — one per extraction technique P1-P16 /
F1-F4 — plus the product-code dimension. The golden EXPECTED_* tables are
hand-derived from these texts; plans/fundetl.py freezes them into VALUES
oracles so the driver's DuckDB compare verifies the whole classify ->
extract -> normalize -> join pipeline end to end.

RUN_DATE is a fixed job parameter (the reference's wall-clock `today`
becomes an argument, SURVEY §7.4.5) so results are reproducible.
"""

from __future__ import annotations

RUN_DATE = "2026-01-15"  # biz_date 20260115, default cutoff 20260114

NAME_FULL = "万联资管臻选3号FOF集合资产管理计划"
NAME_TRUNC = "万联资管臻选3号FOF集"
NAME_TK = "泰康稳健增利"
NAME_YD = "英大安惠纯债"

# (product_name, ledger_code, map_kind)
PRODUCT_CODES = [
    (NAME_FULL, "1001", "default"),
    (NAME_YD, "1002", "default"),
    (NAME_TK, "1003", "default"),
    ("从未出现的产品", "9999", "default"),
    (NAME_FULL, "C100", "conversion"),
    (NAME_TK, "C300", "conversion"),
]

# (doc_id, filename, rel_path, text)
DIVIDEND_DOCS = [
    # P1 single-line label+value (好买)
    (101, "好买-红利再投确认.pdf", "2026/20260115/1场外开基/分红/",
     "好买基金销售有限公司\n产品名称：" + NAME_FULL +
     "\n基金代码：000001\n红利总金额：1,234.56\n再投资份额：1,000.00"),
    # P3 label line -> value on following line (天天)
    (102, "天天基金-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "产品名称：" + NAME_TK +
     "\n基金代码：000002\n红利资金（元）\n2,345.67\n再投资份额（份）\n（见说明）\n2,000.00"),
    # P5 letter-spaced labels + P10 amount:=shares (兴证)
    (103, "兴证-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "兴证全球基金管理有限公司\n产 品 名 称 ： " + NAME_YD +
     "\n基 金 代 码 ： 000003\n再投资份额：3,000.50"),
    # N3 platform-supplied cutoff = confirm-1 (交行)
    (104, "交行-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "交通银行股份有限公司\n产品名称：" + NAME_FULL +
     "\n基金代码：000004\n红利金额：500.00\n再投资份额：400.00\n确认日期：20260110"),
    # F1 multi-record marker blocks (盈米)
    (105, "盈米-红利对账.pdf", "2026/20260115/1场外开基/分红/",
     "盈米基金平台对账单\n产品名称：" + NAME_TK +
     "\n序号:1\n基金代码:000011\n确认金额:100.10\n确认份额:90.10\n"
     "序号:2\n基金代码:000022\n确认金额:200.20\n确认份额:180.20"),
    # P8/F4 tabular rows (证达通)
    (106, "证达通-红利结算.pdf", "2026/20260115/1场外开基/分红/",
     "证达通基金结算单\n1 0000000011738 " + NAME_YD +
     " 018655 红利再投资 0.00 87.09\n2 0000000022738 " + NAME_TK +
     " 018656 红利再投资 10.50 20.00"),
    # P9 filename-derived name + P7 positional token (国信嘉利)
    (107, "【万联】" + NAME_YD + "_交易确认单_2026-01-10.pdf",
     "2026/20260115/1场外开基/分红/",
     "国信嘉利基金结算平台\n确认 明细\n1 0000000011738 " + NAME_YD +
     " 018657 分红 a b c d 87.09"),
    # poison: unmatched platform -> quarantine (§2.14.3)
    (108, "未知平台-红利.pdf", "2026/20260115/1场外开基/分红/",
     "某未知平台\n产品名称：谁也不认识\n基金代码：999999"),
    # P14 truncated name -> suffix completion (好买 body)
    (110, "好买-红利再投2.pdf", "2026/20260115/1场外开基/分红/",
     "好买基金销售有限公司\n产品名称：" + NAME_TRUNC +
     "\n基金代码：000006\n红利总金额：700.00\n再投资份额：700.00"),
    # P4 multi-line name stitching (平安行E通; marker line index >= 5)
    (111, "平安-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "平安银行业务凭证\n凭证编号 123\n日期 2026-01-10\n页码 1\n附言\n渠道：行E通\n"
     "产品名称：万联资管\n臻选3号FOF集\n合资产管理计划\n基金代码：000005\n"
     "红利总金额：600.00\n再投资份额：600.00"),
    # A1 merge partner for doc 101 (same ledger+fund via different platform)
    (112, "天天基金-红利再投2.pdf", "2026/20260115/1场外开基/分红/",
     "产品名称：" + NAME_FULL +
     "\n基金代码：000001\n红利资金（元）\n55.55\n再投资份额（份）\n50.50"),
    # J1 dim miss -> ledger NULL (好买 body, unknown product)
    (113, "好买-红利再投3.pdf", "2026/20260115/1场外开基/分红/",
     "好买基金销售有限公司\n产品名称：神秘产品\n基金代码：000007\n"
     "红利总金额：10.00\n再投资份额：9.00"),
    # P1 plain labels (利得)
    (114, "利得-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "利得基金销售有限公司\n产品名称：" + NAME_TK +
     "\n基金代码：000014\n红利金额：140.00\n再投份额：141.00"),
    # P10 amount:=shares (长量)
    (115, "长量-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "长量基金大连运营中心\n产品名称：" + NAME_YD +
     "\n基金代码：000015\n再投资份额：150.50"),
    # P11 CNY prefix (招赢通)
    (116, "招赢通-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "招赢通平台通知\n产品名称：" + NAME_FULL +
     "\n基金代码：000016\n红利金额：CNY 1,600.00\n再投资份额：1,601.00"),
    # P4 stitch (邮储)
    (117, "邮储-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "邮储银行理财对账\n产品名称：万联资管\n臻选3号FOF集合资产管理计划\n"
     "基金代码：000017\n分红金额：170.00\n再投资份额：171.00"),
    # P4 stitch (和讯)
    (118, "和讯-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "和讯科技平台\n产品名称：英大安惠\n纯债\n基金代码：000018\n"
     "红利总额：180.00\n再投份额：181.00"),
    # P5 spaced labels + P10 (建行)
    (119, "建行直销-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "中国建设银行股份有限公司\n产 品 名 称 ： " + NAME_TK +
     "\n基 金 代 码 ： 000019\n再 投 资 份 额 ： 190.50"),
    # C2 filename guard + P10 (宁波)
    (120, "宁波-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "宁波银行股份有限公司\n产品名称：" + NAME_FULL +
     "\n基金代码：000020\n再投资确认份额：200.50"),
    # P3 fallback: label empty on its line -> value on next line (攀赢)
    (121, "攀赢-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "攀赢基金平台\n产品名称：" + NAME_TK +
     "\n基金代码：000021\n红利金额：210.00\n再投资份额：\n211.00"),
    (122, "民生-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "民生同业e+平台\n产品名称：" + NAME_YD +
     "\n基金代码：000122\n红利金额：122.00\n再投份额：123.00"),
    (123, "基煜-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "基煜基金服务\n产品名称：" + NAME_FULL +
     "\n基金代码：000123\n红利金额：230.00\n再投份额：231.00"),
    # P4 stitch (融联创)
    (124, "融联创-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "融联创同业交易平台\n产品名称：万联资管臻选\n3号FOF集合资产管理计划\n"
     "基金代码：000124\n红利金额：240.00\n再投份额：241.00"),
    # P6 box cells, dividend variant (腾元)
    (125, "腾元-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "腾元基金服务平台\n┃基金代码 │000125 │确认日期 │20260114┃\n"
     "┃红利金额 │250.00 │再投份额 │251.00┃\n产品名称：" + NAME_TK),
    (126, "交e通-红利再投.pdf", "2026/20260115/1场外开基/分红/",
     "交e通金融服务\n产品名称：" + NAME_YD +
     "\n基金代码：000126\n红利金额：260.00\n再投份额：261.00"),
]

# expected 11-col dividend rows (hand-derived; order irrelevant)
# (ledger_code, product_code, fund_code, market, biz_date, shares, amount,
#  cutoff_date, position_class, product_name, platform)
EXPECTED_DIVIDEND = [
    ("1001", None, "000001", "国内银行间", "20260115", 1000.0, 1234.56, "20260114", None, NAME_FULL, "好买基金"),
    ("1003", None, "000002", "国内银行间", "20260115", 2000.0, 2345.67, "20260114", None, NAME_TK, "天天基金"),
    ("1002", None, "000003", "国内银行间", "20260115", 3000.5, 3000.5, "20260114", None, NAME_YD, "兴证全球基金"),
    ("1001", None, "000004", "国内银行间", "20260115", 400.0, 500.0, "20260109", None, NAME_FULL, "交通银行"),
    ("1003", None, "000011", "国内银行间", "20260115", 90.1, 100.1, "20260114", None, NAME_TK, "盈米基金"),
    ("1003", None, "000022", "国内银行间", "20260115", 180.2, 200.2, "20260114", None, NAME_TK, "盈米基金"),
    ("1002", None, "018655", "国内银行间", "20260115", 87.09, 0.0, "20260114", None, NAME_YD, "证达通基金"),
    ("1003", None, "018656", "国内银行间", "20260115", 20.0, 10.5, "20260114", None, NAME_TK, "证达通基金"),
    ("1002", None, "018657", "国内银行间", "20260115", 87.09, 87.09, "20260114", None, NAME_YD, "国信嘉利基金"),
    ("1001", None, "000006", "国内银行间", "20260115", 700.0, 700.0, "20260114", None, NAME_FULL, "好买基金"),
    ("1001", None, "000005", "国内银行间", "20260115", 600.0, 600.0, "20260114", None, NAME_FULL, "平安行E通"),
    ("1001", None, "000001", "国内银行间", "20260115", 50.5, 55.55, "20260114", None, NAME_FULL, "天天基金"),
    (None, None, "000007", "国内银行间", "20260115", 9.0, 10.0, "20260114", None, "神秘产品", "好买基金"),
    ("1003", None, "000014", "国内银行间", "20260115", 141.0, 140.0, "20260114", None, NAME_TK, "利得基金"),
    ("1002", None, "000015", "国内银行间", "20260115", 150.5, 150.5, "20260114", None, NAME_YD, "长量基金"),
    ("1001", None, "000016", "国内银行间", "20260115", 1601.0, 1600.0, "20260114", None, NAME_FULL, "招赢通基金"),
    ("1001", None, "000017", "国内银行间", "20260115", 171.0, 170.0, "20260114", None, NAME_FULL, "邮储银行"),
    ("1002", None, "000018", "国内银行间", "20260115", 181.0, 180.0, "20260114", None, NAME_YD, "和讯科技"),
    ("1003", None, "000019", "国内银行间", "20260115", 190.5, 190.5, "20260114", None, NAME_TK, "建行直销"),
    ("1001", None, "000020", "国内银行间", "20260115", 200.5, 200.5, "20260114", None, NAME_FULL, "宁波银行"),
    ("1003", None, "000021", "国内银行间", "20260115", 211.0, 210.0, "20260114", None, NAME_TK, "攀赢基金"),
    ("1002", None, "000122", "国内银行间", "20260115", 123.0, 122.0, "20260114", None, NAME_YD, "民生同业e+"),
    ("1001", None, "000123", "国内银行间", "20260115", 231.0, 230.0, "20260114", None, NAME_FULL, "基煜基金"),
    ("1001", None, "000124", "国内银行间", "20260115", 241.0, 240.0, "20260114", None, NAME_FULL, "融联创同业交易平台"),
    ("1003", None, "000125", "国内银行间", "20260115", 251.0, 250.0, "20260114", None, NAME_TK, "腾元基金"),
    ("1002", None, "000126", "国内银行间", "20260115", 261.0, 260.0, "20260114", None, NAME_YD, "交e通"),
]

# expected platform classification over DIVIDEND_DOCS (doc_id, platform)
EXPECTED_CLASSIFY = [
    (101, "好买基金"),
    (102, "天天基金"),
    (103, "兴证全球基金"),
    (104, "交通银行"),
    (105, "盈米基金"),
    (106, "证达通基金"),
    (107, "国信嘉利基金"),
    (108, None),
    (110, "好买基金"),
    (111, "平安行E通"),
    (112, "天天基金"),
    (113, "好买基金"),
    (114, "利得基金"),
    (115, "长量基金"),
    (116, "招赢通基金"),
    (117, "邮储银行"),
    (118, "和讯科技"),
    (119, "建行直销"),
    (120, "宁波银行"),
    (121, "攀赢基金"),
    (122, "民生同业e+"),
    (123, "基煜基金"),
    (124, "融联创同业交易平台"),
    (125, "腾元基金"),
    (126, "交e通"),
]

PURCHASE_APPLY_DOCS = [
    # P1 labels (天天)
    (201, "天天基金-申购申请.pdf", "2026/20260115/1场外开基/申购受理/",
     "产品名称：" + NAME_TK + "\n基金代码：100001\n申请金额：5,000.00\n手续费：5.00"),
    # F2 联泰 multi-record 交易信息（X/Y）
    (202, "联泰-申购受理单.pdf", "2026/20260115/1场外开基/申购受理/",
     "联泰基金销售平台\n交易信息（1/2）\n产品名称：" + NAME_FULL +
     "\n基金代码：100002\n申购金额：6,000.00\n手续费：6.00\n"
     "交易信息（2/2）\n产品名称：" + NAME_YD +
     "\n基金代码：100003\n申购金额：7,000.00\n手续费：7.00"),
    # S2 filename exclusion: must never appear in output
    (203, "天天基金-赎回申请.pdf", "2026/20260115/1场外开基/申购受理/",
     "产品名称：" + NAME_TK + "\n基金代码：100009\n申请金额：9,999.00"),
    # P1 (好买, 申购金额 label)
    (204, "好买-申购受理.pdf", "2026/20260115/1场外开基/申购受理/",
     "好买基金销售有限公司\n产品名称：" + NAME_FULL +
     "\n基金代码：100004\n申购金额：8,000.00\n手续费：8.88"),
]

# (ledger, fund_code, market, biz_date, business_type, qty, amount, fee,
#  commission, counterparty, cash_account, redemption_arrival_date,
#  shareholder_account, seat_no, product_name, platform)
EXPECTED_PURCHASE_APPLY = [
    ("1003", "100001", "国内银行间", "20260115", "基金申购申请", None, 5000.0, 5.0,
     None, None, None, None, None, None, NAME_TK, "天天基金"),
    ("1001", "100002", "国内银行间", "20260115", "基金申购申请", None, 6000.0, 6.0,
     None, None, None, None, None, None, NAME_FULL, "联泰基金"),
    ("1002", "100003", "国内银行间", "20260115", "基金申购申请", None, 7000.0, 7.0,
     None, None, None, None, None, None, NAME_YD, "联泰基金"),
    ("1001", "100004", "国内银行间", "20260115", "基金申购申请", None, 8000.0, 8.88,
     None, None, None, None, None, None, NAME_FULL, "好买基金"),
]

PURCHASE_CONFIRM_DOCS = [
    # P6 box-drawing cells (腾元)
    (301, "腾元-申购确认.pdf", "2026/20260115/1场外开基/确认/",
     "腾元基金服务平台\n产品名称：" + NAME_TK +
     "\n┃基金代码 │200001 │确认日期 │20260114┃\n"
     "┃确认金额 │8,000,000.00 │确认份额 │7,997,600.96┃\n┃手续费 │2,399.04 │备注 │无┃"),
    # P4 stitch (平安行E通)
    (302, "平安-申购确认.pdf", "2026/20260115/1场外开基/确认/",
     "平安银行业务凭证\n凭证编号 456\n日期 2026-01-14\n页码 1\n附言\n渠道：行E通\n"
     "产品名称：万联资管\n臻选3号FOF集合资产管理计划\n基金代码：200002\n"
     "确认金额：9,000.00\n确认份额：8,991.00\n手续费：9.00"),
    # C2 negative guard: 好买 + 转换 doc must NOT classify as 好买
    (303, "好买-申购确认.pdf", "2026/20260115/1场外开基/确认/",
     "好买基金销售有限公司\n本单为基金转换业务确认\n产品名称：" + NAME_TK +
     "\n基金代码：200003\n确认金额：1.00"),
]

EXPECTED_PURCHASE_CONFIRM = [
    ("1003", "200001", "国内银行间", "20260115", "基金申购确认", 7997600.96, 8000000.0,
     2399.04, None, None, None, None, None, None, NAME_TK, "腾元基金"),
    ("1001", "200002", "国内银行间", "20260115", "基金申购确认", 8991.0, 9000.0, 9.0,
     None, None, None, None, None, None, NAME_FULL, "平安行E通"),
]

REDEMPTION_DOCS = [
    # N3 T+n arrival (平安): T+3 -> run_date + 2
    (401, "平安-赎回确认.pdf", "2026/20260115/1场外开基/确认/",
     "平安银行业务凭证\n凭证编号 789\n日期 2026-01-14\n页码 1\n附言\n渠道：行E通\n"
     "产品名称：万联资管\n臻选3号FOF集合资产管理计划\n基金代码：300001\n"
     "赎回金额：4,000.00\n赎回份额：4,004.00\n手续费：4.00\n预计到账：T+3"),
    # P15 网金 format 1 (no separator)
    (402, "网金-赎回确认1.pdf", "2026/20260115/1场外开基/确认/",
     "网金基金平台\n产品名称：" + NAME_TK +
     "\n基金代码：300002\n赎回金额：5,500.00\n赎回份额：5,505.00"),
    # P15 网金 format 2 (───── separator -> next-line 到账金额)
    (403, "网金-赎回确认2.pdf", "2026/20260115/1场外开基/确认/",
     "网金基金平台\n─────────────\n产品名称：" + NAME_YD +
     "\n基金代码：300003\n到账金额\n6,600.00\n赎回份额：6,606.00"),
    # S2 exclusion for redemption job
    (404, "网金-申购确认.pdf", "2026/20260115/1场外开基/确认/",
     "网金基金平台\n产品名称：" + NAME_TK + "\n基金代码：300009\n赎回金额：1.00"),
]

EXPECTED_REDEMPTION = [
    ("1001", "300001", "国内银行间", "20260115", "基金赎回确认", 4004.0, 4000.0, 4.0,
     None, None, None, "20260117", None, None, NAME_FULL, "平安行E通"),
    ("1003", "300002", "国内银行间", "20260115", "基金赎回确认", 5505.0, 5500.0, None,
     None, None, None, "20260115", None, None, NAME_TK, "网金基金"),
    ("1002", "300003", "国内银行间", "20260115", "基金赎回确认", 6606.0, 6600.0, None,
     None, None, None, "20260115", None, None, NAME_YD, "网金基金"),
]

CONVERSION_DOCS = [
    # P16 section scoping + N4 in_amount = out_amount - in_fee
    (501, "肯特瑞-超级转换确认.pdf", "2026/20260115/1场外开基/确认/",
     "京东肯特瑞基金超市\n第一页 摘要\n转换确认 结果明细\n产品名称：" + NAME_FULL +
     "\n转出基金代码：400001\n转出金额：10,000.00\n转出份额：10,010.00\n"
     "转入基金代码：400002\n转入份额：9,990.00\n转入手续费：10.00\n确认日期：20260114"),
]

# 19-col conversion expected
EXPECTED_CONVERSION = [
    ("C100", "400001", "国内银行间", "20260114", 10010.0, 10000.0, None,
     "400002", "国内银行间", 9990.0, 9990.0, 10.0, None, None, None, None, None,
     NAME_FULL, "京东肯特瑞"),
]

MANUAL_DOCS = [
    # C3 + P12 + P13: apply receipt, OCR noise, code 8l2345 -> B12345
    (601, "万事如意-申购受理单.pdf", "2026/20260115/2理财/受理/",
     "万联证券\n基金交易申请受理单\n基金代码 8l2345\n申请金额 2,500.00\n"
     "小写 2,500.00\n大写金额 贰仟伍佰元\n申请金额 2,499.00"),
    # confirm: refund = apply - confirm (N4) + Q1 isin keep
    (602, "万事如意-申购确认.pdf", "2026/20260115/2理财/确认/",
     "万联证券\n交易确认单\n业务类型：申购确认\n基金代码 B12346\n"
     "申请金额：2,500.00\n确认金额：2,400.00"),
    # Q1 isin drop: business type not whitelisted
    (603, "万事如意-失效确认.pdf", "2026/20260115/2理财/确认/",
     "万联证券\n交易确认单\n业务类型：失效\n基金代码 B12347\n确认金额：1.00"),
    # redemption confirm with constants
    (604, "万事如意-赎回确认.pdf", "2026/20260115/2理财/确认/",
     "万联证券\n交易确认单\n业务类型：赎回确认\n基金代码 B12348\n"
     "确认份额 3,000.00\n确认金额 3,030.00"),
    # dividend ex-right (dates = run_date - 1)
    (605, "万事如意-分红单.pdf", "2026/20260115/2理财/分红/",
     "万联证券\n产品分红通知单\n基金代码 B12349\n分红份额 111.00\n分红金额 222.00"),
]

MANUAL_PRODUCT = "万联资管万事如意FOF1号单一资产管理计划"
MANUAL_CASH = "051010100102026063"

EXPECTED_MANUAL_APPLY = [
    ("20260115", "B12345", MANUAL_PRODUCT, 2500.0, "申购申请", MANUAL_CASH, None, "万事如意直销"),
]
EXPECTED_MANUAL_CONFIRM = [
    ("20260115", "B12346", MANUAL_PRODUCT, 2500.0, 2400.0, 100.0, "申购确认",
     MANUAL_CASH, None, "万事如意直销"),
]
EXPECTED_MANUAL_REDEMPTION = [
    ("20260115", "B12348", MANUAL_PRODUCT, 3000.0, 3030.0, "赎回确认", "否", "1",
     MANUAL_CASH, None, "20260115", "万事如意直销"),
]
EXPECTED_MANUAL_DIVIDEND = [
    ("20260114", "20260114", "B12349", MANUAL_PRODUCT, 111.0, 222.0, "万事如意直销"),
]


def docs_df(spark, docs):
    from ..schemas import FUND_DOCUMENTS_SCHEMA

    return spark.createDataFrame(
        [(d[0], d[1], d[2], d[3]) for d in docs], FUND_DOCUMENTS_SCHEMA
    )


def dim_df(spark):
    from ..schemas import PRODUCT_CODES_SCHEMA

    return spark.createDataFrame(PRODUCT_CODES, PRODUCT_CODES_SCHEMA)
