"""Deterministic sampling and dataset splitting for training pipelines.

Random sampling (``df.sample``/``rand()``) is irreproducible across
engines, partitionings and reruns. Training-data pipelines instead
sample by CONTENT HASH: a row is kept iff ``hash(id) mod N`` falls in a
range. That makes the sample

- reproducible: same ids → same sample, on any engine or cluster layout
  (our hash is the md5-derived 60-bit family of ``functions.dedup``, so
  DuckDB computes the identical buckets — the sample is oracle-checkable);
- stable under growth: adding new rows never changes membership of old
  ones (the property behind consistent train/test splits across corpus
  versions);
- free: a scan-level filter / projection, no shuffle, no state.

Reference: the reference has no sampling surface (README.md:43-50);
this is part of the beyond-reference training-data tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beavers_spark.functions.dedup import md5_hash64

BUCKETS = 10_000


def hash_bucket(col: Column, salt: str = "") -> Column:
    """Stable bucket in [0, BUCKETS) from the md5-derived hash. ``salt``
    decorrelates independent sampling decisions over the same ids."""
    keyed = F.concat(col.cast("string"), F.lit(salt))
    return F.pmod(md5_hash64(keyed), F.lit(BUCKETS))


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows by id-hash bucket — reproducible on any
    engine/partitioning, membership stable as the corpus grows.
    Contract: ``id_col`` must be non-null — ``hash_bucket(null)`` is
    null and the ``bucket < N`` filter silently DROPS null-id rows.
    """
    return df.filter(
        hash_bucket(F.col(id_col), salt) < int(round(fraction * BUCKETS))
    )


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column partitioning rows into named fractions
    (default 90/5/5 train/val/test) by contiguous hash-bucket ranges.

    Every row lands in exactly one split; the assignment is a pure
    projection (no shuffle) and deterministic forever for a given id.
    
    Contract: ``id_col`` must be non-null — a null id hashes to null,
    falls through every ``bucket < N`` branch, and lands in the LAST
    split; validate ids upstream or such rows contaminate one split.
    """
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError("split fractions must sum to 1")
    bucket = hash_bucket(F.col(id_col), salt)
    expr = None
    bound = 0.0
    names = list(splits)
    for name in names[:-1]:
        bound += splits[name]
        cond = bucket < int(round(bound * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    )
    return df.withColumn("split", expr)
