"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query; ``queries()`` /
``oracle_sql()`` expose every implemented operator plan from SURVEY.md §2
plus the beyond-reference LLM-data-pipeline surface, paired with DuckDB
oracle SQL (beavers_spark/plans/*).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the ETF-valuation shape
    (broadcast join -> arithmetic -> keyed sum), reference
    examples/pyarrow_concepts.py:64-74."""
    from beavers_spark.plans import QUERIES

    return QUERIES["etf_valuation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator plan (SURVEY.md §2)."""
    from beavers_spark.plans import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys absent here (approximate or
    non-SQL-expressible operators) get the driver's rows-only check."""
    from beavers_spark.plans import ORACLES

    return dict(ORACLES)
