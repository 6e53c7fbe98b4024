"""Skew-mitigation joins: explicit key salting.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on in session.py): it splits oversized shuffle partitions at runtime
with zero user code. Explicit salting is for the cases AQE can't fix —
a stateful/streaming stage keyed on a hot key, a sort-merge join whose
skewed side must ALSO be the partitioning of a later stage, or a
deliberately co-partitioned pipeline where runtime re-splitting would
break alignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``n_salts``
    shuffle partitions.

    The skewed side gets a deterministic per-row salt (hash of all
    columns — stable across retries, so no shuffle-replay
    inconsistency); the other side is replicated ``n_salts`` times via a
    single narrow ``explode`` (cost: |other| * n_salts rows through the
    shuffle — keep ``other`` the smaller side). The join keys become
    (keys..., salt), so each hot key's rows land on ``n_salts`` separate
    reducers instead of one straggler.

    Semantics match ``skewed.join(other, on, how)`` for inner/left joins.
    Right/full joins would duplicate unmatched ``other`` rows per salt —
    rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(right/full would duplicate unmatched rows per salt)"
        )
    salted = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salts))
    )
    replicated = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return (
        salted.join(replicated, [*on, SALT_COL], how)
        .drop(SALT_COL)
    )
