"""Query registry: single source of truth for the oracle-checked inventory.

Each operator registers a builder ``(spark, sf_dir) -> DataFrame`` and,
when SQL-expressible, the equivalent ANSI SQL for the DuckDB oracle.
``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an inventory query; `oracle` is DuckDB SQL over the fixture
    views, or None for non-SQL-expressible ops (driver then does a weaker
    rows-only check)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
