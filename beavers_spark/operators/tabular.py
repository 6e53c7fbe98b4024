"""Core tabular operators, Catalyst-visible (no Python UDFs on the hot path).

Scale notes apply to every operator here: each is a pure DataFrame
transformation, so predicate pushdown / column pruning / AQE all apply, and
nothing touches the driver. Shuffle-bearing operators note their shuffle key
so callers can pre-partition or bucket to avoid repeated shuffles.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Ordering / sequencing
# ---------------------------------------------------------------------------


def with_seq(df: DataFrame, seq_col: str = "_seq") -> DataFrame:
    """Attach a DETERMINISTIC arrival-sequence column to a file-source
    DataFrame: ``struct(file_path, row_index)`` from the scan's hidden
    ``_metadata`` column.

    Spark has no implicit row order (the reference's pyarrow variant keys
    "last" off the physical row index, pyarrow_wrapper.py:23-30). Any
    operator with arrival-order semantics must thread an explicit
    sequence. This one orders rows file-major (path lexicographic — which
    is write order for part-NNNNN files) then by physical position within
    the file, i.e. "file/batch order", and it is a pure function of the
    INPUT: two runs over the same files agree exactly, regardless of
    partition layout, task retries, or speculative execution. Structs
    order lexicographically in Spark, so the column works directly as an
    ``order_by`` key in ``last_by_keys`` / ``merge_sorted``.

    Only resolvable when ``df`` reads from a file source (parquet/csv/
    json/orc); for non-file DataFrames use a real data column, a
    ``(batch_id, offset)`` pair from the streaming layer, or — single
    attempt only — ``with_seq_unstable``.

    At scale: zero shuffle (narrow), safe at any size.
    """
    return df.withColumn(
        seq_col,
        F.struct(
            F.col("_metadata.file_path").alias("file"),
            F.col("_metadata.row_index").alias("pos"),
        ),
    )


def with_seq_unstable(df: DataFrame, seq_col: str = "_seq") -> DataFrame:
    """``monotonically_increasing_id`` sequence — monotone within a
    partition, partition-major across partitions, works on ANY DataFrame.

    SINGLE-ATTEMPT ONLY: the assignment is a function of the runtime
    partition layout, so a task retry, speculative duplicate, or
    different parallelism can renumber rows between runs. Never persist
    it, never key durable state on it; for anything replayed or retried
    use ``with_seq`` (file sources) or an explicit (batch_id, offset).
    """
    return df.withColumn(seq_col, F.monotonically_increasing_id())


# ---------------------------------------------------------------------------
# Keyed latest state (the reference's flagship stateful operator)
# ---------------------------------------------------------------------------


def last_by_keys(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Latest row per key — the reference's keyed upsert state.

    Reference: ``pa.last_by_keys`` (pyarrow_wrapper.py:127-133, arrival
    order = max row index) and ``pl.last_by_keys`` (polars_wrapper.py:88-95,
    ``group_by(maintain_order=True).last()``). Spark needs the order made
    explicit: ``order_by`` is the arrival-order surrogate (event timestamp +
    tiebreaker, or a ``with_seq`` column).

    Implementation: window ``row_number`` descending over ``order_by`` per
    key. At scale this is a single hash shuffle on ``keys`` with AQE skew
    splitting; for repeated use over the same keys, pre-``repartition`` on
    the keys so downstream joins/aggs reuse the exchange.
    """
    order_cols = [F.col(c).desc() if isinstance(c, str) else c.desc() for c in order_by]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


# ---------------------------------------------------------------------------
# Stateless tabular ops (thin, but named to mirror the reference surface)
# ---------------------------------------------------------------------------


def filter_stream(df: DataFrame, *predicates: Column, **equals) -> DataFrame:
    """Row filter by predicate columns plus keyword equality constraints.

    Reference: ``pa.filter_stream`` (pyarrow_wrapper.py:112-125) and
    ``pl.filter_stream`` (polars_wrapper.py:75-86, kwargs = equality).
    Catalyst pushes the conjunction down to the scan.
    """
    out = df
    for p in predicates:
        out = out.filter(p)
    for col_name, value in equals.items():
        out = out.filter(F.col(col_name) == F.lit(value))
    return out


def get_column(df: DataFrame, name: str) -> DataFrame:
    """Project a single column (reference: pyarrow_wrapper.py:135-141)."""
    return df.select(name)


def concat_streams(*dfs: DataFrame) -> DataFrame:
    """Schema-checked union of streams.

    Reference: ``pa.concat_arrays`` / ``pl.concat_series``
    (pyarrow_wrapper.py:143-159, polars_wrapper.py:97-109) — type-checked
    concatenation that fires if any input fired. ``unionByName`` gives the
    name/type check; narrow op, no shuffle.
    """
    if not dfs:
        raise ValueError("concat_streams needs at least one input")
    out = dfs[0]
    for other in dfs[1:]:
        out = out.unionByName(other)
    return out


def merge_sorted(dfs: Sequence[DataFrame], ts_col: str) -> DataFrame:
    """Union N timestamped streams into one globally time-ordered stream.

    Reference: the kafka test bench merges two topics sorted by message
    timestamp (scripts/kafka_test_bench.py:20-22). Spark: union (narrow) +
    range-partitioned sort — at scale, ``orderBy`` range-partitions by a
    sampled histogram of ``ts_col`` so the sort parallelizes.
    """
    return concat_streams(*dfs).orderBy(ts_col)


def topk(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Top-k view (reference: perspective view sort+limit,
    perspective_wrapper.py:52-57).

    At scale Spark compiles orderBy+limit into ``TakeOrderedAndProject`` —
    per-partition top-k then a driver-side merge of k rows per partition,
    no global sort.
    """
    return df.orderBy(*order).limit(k)


def weighted_average(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    weight_col: str,
    out_col: str = "wavg",
) -> DataFrame:
    """Weighted average per key, null if *any* component value is missing.

    Reference: the ETF NAV computation — sum(price*weight)/sum(weight),
    returning None when any constituent price is absent
    (examples/etfs.py:70-91, golden scenario tests/test_etfs.py:60-76).

    The missing-component null is expressed relationally: a group has a
    hole iff ANY row's value OR weight is null (count(*) exceeds either
    column's non-null count — comparing count(value) to count(weight)
    alone missed groups where a null value and a null weight sit on
    DIFFERENT rows and silently dropped null-weight rows). A group whose
    weights sum to zero is also null, not a division error. One
    hash-shuffle on ``keys`` with map-side partial aggregation.
    """
    v, w = F.col(value_col), F.col(weight_col)
    n = F.count(F.lit(1))
    return df.groupBy(*keys).agg(
        F.when(
            (F.count(v) < n) | (F.count(w) < n) | (F.sum(w) == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(F.sum(v * w) / F.sum(w))
        .alias(out_col)
    )


def join_counts(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_name: str = "left_count",
    right_name: str = "right_count",
) -> DataFrame:
    """Full-outer join of two keyed counters, missing side = 0.

    Reference: ``join_counts`` cross-tab via pandas concat+fillna
    (tests/test_util.py:78-81). Relational form: two partial-aggregated
    counts, full outer join on the key, coalesce to 0.
    """
    lc = left.groupBy(key).agg(F.count(F.lit(1)).alias(left_name))
    rc = right.groupBy(key).agg(F.count(F.lit(1)).alias(right_name))
    return (
        lc.join(rc, key, "full_outer")
        .select(
            key,
            F.coalesce(F.col(left_name), F.lit(0)).alias(left_name),
            F.coalesce(F.col(right_name), F.lit(0)).alias(right_name),
        )
    )
