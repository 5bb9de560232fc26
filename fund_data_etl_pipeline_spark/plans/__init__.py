"""Query registry.

Every implemented operator from SURVEY.md §2 (and the scale extensions)
registers here as a named query: a DataFrame builder ``(spark, sf_dir) ->
DataFrame`` plus, when SQL-expressible, the equivalent ANSI SQL string a
DuckDB oracle can run on the same parquet tables. ``__spark_entry__.py``
re-exports this registry to the driver.

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name before
value-hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as query ``name``; ``oracle`` is DuckDB SQL or None
    for non-SQL-expressible ops (driver then does a rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every plan module so registration side effects run."""
    from . import (  # noqa: F401
        dedup,
        fundetl,
        multimodal,
        relational,
        relational2,
        textops,
        vectors,
        windows,
    )
