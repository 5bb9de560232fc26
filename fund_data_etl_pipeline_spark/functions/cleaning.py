"""Field-cleaning scalar expressions (SURVEY.md §2.3 tail).

All JVM-side built-ins — no Python UDFs. Each helper cites the reference
behavior it reproduces.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .numeric import round2


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def clean_number(col: Column | str, scale: int = 2) -> Column:
    """Thousands-separator strip + coerce-to-NULL cast + round
    (`.replace(',', '')` dividend_extractor.py:52 +
    `pd.to_numeric(errors='coerce').round(2)` :1406-1407).
    Empty string -> NULL (not 0)."""
    s = F.regexp_replace(F.trim(_c(col)), "[,，]", "")
    return round2(F.nullif(s, F.lit("")).try_cast("double"), scale)


def clean_name(col: Column | str) -> Column:
    """Strip ASCII/ideographic spaces, newlines and box-drawing chars from
    product names (dividend_extractor.py:46,381,542). '' -> NULL."""
    cleaned = F.regexp_replace(_c(col), "[\\s　┃│]+", "")
    return F.nullif(cleaned, F.lit(""))


def correct_fund_code(col: Column | str) -> Column:
    """OCR error repair (P13): leading '8' -> 'B', any 'l' after position 0
    -> '1' (`correct_fund_code` manual_purchase_apply_extractor.py:43-72)."""
    c = F.trim(_c(col))
    c = F.regexp_replace(c, "^8(?=[0-9l]{5})", "B")
    first = F.substring(c, 1, 1)
    rest = F.regexp_replace(c.substr(F.lit(2), F.length(c)), "l", "1")
    return F.nullif(F.concat(first, rest), F.lit(""))


def complete_name_suffix(col: Column | str) -> Column:
    """Truncated product-name repair (P14, dividend_extractor.py:1173-1206):
    `…集` -> `…集合资产管理计划`, `…单一` -> `…单一资产管理计划`,
    `…资产管理计` -> `…资产管理计划`. Idempotent."""
    c = _c(col)
    return (
        F.when(c.isNull(), c)
        .when(c.endswith("资产管理计划"), c)
        .when(c.endswith("资产管理计"), F.concat(c, F.lit("划")))
        .when(c.endswith("集"), F.concat(c, F.lit("合资产管理计划")))
        .when(c.endswith("单一"), F.concat(c, F.lit("资产管理计划")))
        .otherwise(c)
    )


def strip_currency(col: Column | str) -> Column:
    """Unit/currency stripping (P11): 'CNY 1,234.56', '1,234.56元',
    '100.00份' -> bare number string (dividend_extractor.py:280-286;
    purchase_extractor.py:287,663)."""
    c = F.trim(_c(col))
    c = F.regexp_replace(c, "^(CNY|RMB|￥)\\s*", "")
    c = F.regexp_replace(c, "\\s*(元|份)$", "")
    return c
