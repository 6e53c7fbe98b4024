"""Shared helpers for query plans."""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


@lru_cache(maxsize=128)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Column names stored as nanosecond timestamps in the parquet footer.

    Spark 4 refuses TIMESTAMP(NANOS) parquet columns unless
    ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case they
    surface as BIGINT nanos — we convert them back to timestamps below.
    DuckDB truncates the same columns to microseconds on read, so
    truncating ns->us keeps both engines value-identical.
    """
    schema = pq.read_schema(path)
    out = []
    for field in schema:
        t = field.type
        if str(t).startswith("timestamp[ns"):
            out.append(field.name)
    return tuple(out)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table with normalized timestamps.

    - ns-timestamp columns (read as BIGINT under nanosAsLong) become
      TimestampType via integer-division truncation to us — integer ``div``
      not ``/`` (double division loses precision above 2^53).
    - TIMESTAMP_NTZ columns are cast to TIMESTAMP (session tz is UTC, so
      the conversion is value-preserving and matches DuckDB's naive-as-UTC
      reading).

    Catalyst still prunes/pushes down through these projections.
    """
    # The harness may hand us ITS OWN SparkSession (driver contract):
    # ensure the two session confs our semantics depend on, both
    # runtime-settable — ns-parquet readability and the UTC time domain
    # (NTZ->LTZ casts and window bucketing use the session timezone).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col_name in _nanos_ts_columns(path):
        if col_name in df.columns and isinstance(
            df.schema[col_name].dataType, T.LongType
        ):
            df = df.withColumn(
                col_name, F.timestamp_micros(F.expr(f"`{col_name}` div 1000"))
            )
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def ts_us(col: str | Column) -> Column:
    """Epoch microseconds of a timestamp column (DuckDB twin: epoch_us)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_micros(c.cast("timestamp"))
