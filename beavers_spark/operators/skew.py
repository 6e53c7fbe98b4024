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

    The skewed side gets a per-row salt from a uniform column over the
    partition's row position (monotonically_increasing_id mod n_salts) —
    a content hash here was a silent no-op for the exact case salting
    exists for: identical hot-key rows all hashed to ONE salt and still
    landed on a single reducer (review r5). The id is deterministic
    within a task attempt, and on a replayed task a row may get a
    different salt — harmless, any salt joins the same replicated
    other-side rows. The other side is replicated ``n_salts`` times via a
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
        SALT_COL,
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)),
    )
    replicated = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return (
        salted.join(replicated, [*on, SALT_COL], how)
        .drop(SALT_COL)
    )
