"""Interval (range) join: match right rows whose timestamp falls in a
window relative to each left row — the general form of the as-of join
(operators/asof.py picks ONE match; this keeps them all).

Spark has no native range-join optimization for the DataFrame API: a
naive ``l.ts < r.ts AND r.ts <= l.ts + Δ`` condition attached to an
equi-join is fine (hash join on the keys, predicate as a post-filter),
but WITHOUT equality keys it degenerates to a broadcast-nested-loop /
cartesian plan. The scale path used here is time-binning: both sides get
a bucket id of width >= the window span, the join is an equi-join on
(keys..., bin) with the left side exploded to the (at most two) bins its
window can touch, and the exact range predicate filters the candidates.
Candidate volume is O(rows-per-bin), never O(n^2).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    lower: pd.Timedelta,
    upper: pd.Timedelta,
) -> DataFrame:
    """All (left, right) pairs with equal ``keys`` and
    ``left_ts + lower < right_ts <= left_ts + upper`` (half-open window,
    so ``lower=0`` means strictly-after).

    Returns left columns + right columns (right's renamed with an ``r_``
    prefix on collisions).
    """
    lower_us = int(lower.total_seconds() * 1_000_000)
    upper_us = int(upper.total_seconds() * 1_000_000)
    if upper_us <= lower_us:
        raise ValueError("upper must be greater than lower")
    w = max(upper_us - lower_us, 1)

    overlap = set(left.columns) & set(right.columns)
    renamed = right
    for c in overlap:
        renamed = renamed.withColumnRenamed(c, f"r_{c}")
    r_keys = [f"r_{k}" if k in overlap else k for k in keys]
    r_ts = f"r_{right_ts}" if right_ts in overlap else right_ts

    l_us = F.unix_micros(F.col(left_ts))
    r_us = F.unix_micros(F.col(r_ts))

    # window spans < w, so it touches at most 2 bins: explode left to
    # the distinct bins of its window endpoints (1 or 2 rows per left row)
    lo_bin = F.floor((l_us + F.lit(lower_us) + 1) / w)
    hi_bin = F.floor((l_us + F.lit(upper_us)) / w)
    l_binned = left.withColumn(
        "__bin", F.explode(F.array_distinct(F.array(lo_bin, hi_bin)))
    )
    r_binned = renamed.withColumn("__bin", F.floor(r_us / w))

    cond = F.lit(True)
    for k, rk in zip(keys, r_keys):
        cond = cond & (l_binned[k] == r_binned[rk])
    cond = (
        cond
        & (r_binned["__bin"] == l_binned["__bin"])
        & (F.unix_micros(r_binned[r_ts]) > F.unix_micros(l_binned[left_ts]) + lower_us)
        & (F.unix_micros(r_binned[r_ts]) <= F.unix_micros(l_binned[left_ts]) + upper_us)
    )
    out = l_binned.join(r_binned, cond)
    return out.drop(l_binned["__bin"]).drop(r_binned["__bin"]).drop(
        *[r_binned[rk] for rk in r_keys if rk.startswith("r_")]
    )
