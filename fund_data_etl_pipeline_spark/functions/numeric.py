"""Numeric helpers shared by every plan.

``round2`` replaces ``F.round`` for DOUBLE money columns (SURVEY.md §2.14.4):
Spark's ``round`` routes doubles through their shortest decimal string and
applies HALF_UP, so a binary value like 130.544999...99 (printed "130.545")
rounds to 130.55, while C-style engines (DuckDB ``ROUND``) compute
``round(x*100)/100`` on the binary value and get 130.54. The engine pins ONE
convention — round-half-away-from-zero on the binary double — so results are
reproducible against the DuckDB oracle and across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round2(col: Column | str, scale: int = 2) -> Column:
    """Round a DOUBLE like C/DuckDB ``ROUND(x, scale)``: half away from zero
    on the binary value. NULL-preserving."""
    c = F.col(col) if isinstance(col, str) else col
    p = F.lit(float(10**scale))
    return F.signum(c) * F.floor(F.abs(c) * p + F.lit(0.5)) / p
