"""File sources with explicit schemas (reference: CSV example adapters,
examples/replay_concepts.py:78-121; parquet replay pyarrow_replay.py).

All readers take explicit schemas — the reference's schema system is
fixed/declared, never inferred (SURVEY §1.2) — so scans stay
pushdown-friendly and stable under file drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet_source(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv_source(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json_source(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.schema(schema).json(path)
