"""Query registry — every implemented operator from SURVEY.md §2 registers a
(name, builder, oracle_sql) triple here. ``catalog.collect()`` imports the
operator modules and returns the dicts the driver contract
(``__spark_entry__.py``) exposes.

The oracle_sql is ANSI SQL DuckDB runs on the same parquet tables; an
operator genuinely not SQL-expressible registers ``sql=None`` and the
driver records a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, sql: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if sql is not None:
            _ORACLES[name] = sql
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    return dict(_ORACLES)
