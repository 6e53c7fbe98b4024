"""Registry mapping query name -> (Spark callable, optional DuckDB oracle)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Decorator registering a query plan and its oracle SQL.

    The callable takes ``(spark, sf_dir)`` and returns a DataFrame. The
    oracle is ANSI SQL runnable by DuckDB over the same parquet tables
    (views pre-registered by the driver). ``oracle=None`` marks a
    non-SQL-expressible operator (driver falls back to a rows-only check).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            # a duplicate would silently REPLACE the original plan,
            # shrinking coverage with no visible count change — fail at
            # import time instead
            raise ValueError(f"query {name!r} registered twice")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
