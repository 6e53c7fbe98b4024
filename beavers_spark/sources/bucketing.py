"""Bucketed tables: pre-shuffled storage for co-located, exchange-free
joins.

At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
both sides. Writing a table with ``bucketBy(n, keys)`` persists it
pre-hash-partitioned on the join keys; any later equi-join (or groupBy)
on those keys between two tables bucketed with the SAME bucket count
needs NO Exchange on either side — the shuffle was paid once at write
time and amortized over every subsequent query. This is the storage-side
twin of the runtime tricks in operators/skew.py.

Sizing rule: pick ``n_buckets`` so one bucket of the LARGER table is
100-500 MB on disk (fits an executor task comfortably); bucket counts
must match across tables you intend to co-join, so standardize per key
domain (e.g. all orderkey-bucketed tables at 4096).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-within-bucket)
    parquet table in the metastore. ``sort_cols`` additionally makes
    merge joins sort-free (SortMergeJoin without the Sort)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, *keys)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys — planned
    with zero Exchange (verify with ``.explain``: no
    ``Exchange hashpartitioning`` above either scan)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
