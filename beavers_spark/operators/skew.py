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
    salt_by: str | None = None,
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over ``n_salts``
    shuffle partitions.

    The per-row salt must be (a) roughly uniform WITHIN a hot key —
    hashing only the join keys would send every hot-key row to one
    reducer again (review r5) — and (b) DETERMINISTIC per row across
    task retries: a retry-variable salt (e.g. one derived from
    ``monotonically_increasing_id``) changes the row's reduce partition
    between attempts, and Spark's partial stage retries then duplicate
    or drop rows (the SPARK-23207 class of bug — review r6). So:

    * pass ``salt_by`` naming any unique-per-row column (an event id,
      a primary key): the salt is ``pmod(xxhash64(salt_by), n_salts)``
      — uniform and retry-stable, the recommended mode;
    * without ``salt_by``, the salt hashes every HASHABLE column of
      ``skewed`` (columns containing a map ANYWHERE in their type tree
      — top-level, ``array<map>``, struct field — are skipped:
      ``xxhash64`` rejects MapType at any nesting depth, and such
      schemas used to make the default mode crash outright) — still retry-stable, and uniform whenever
      hot-key rows differ in any hashed column. Degenerate cases: hot
      rows that are bit-identical across every hashed column share a
      salt and stay on one reducer (balance degrades, results stay
      correct) — dedup them or provide ``salt_by``; a frame with NO
      hashable column at all is rejected (pass ``salt_by``).

    The other side is replicated ``n_salts`` times via a single narrow
    ``explode`` (cost: |other| * n_salts rows through the shuffle —
    keep ``other`` the smaller side). The join keys become
    (keys..., salt), so each hot key's rows land on ``n_salts``
    separate reducers instead of one straggler.

    Semantics match ``skewed.join(other, on, how)`` for inner/left joins.
    Right/full joins would duplicate unmatched ``other`` rows per salt —
    rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports inner/left joins, got {how!r} "
            "(right/full would duplicate unmatched rows per salt)"
        )
    if salt_by is not None:
        salt_src = [F.col(salt_by)]
    else:
        from pyspark.sql.types import ArrayType, MapType, StructType

        def _has_map(dt) -> bool:
            # xxhash64 rejects MapType anywhere in the type tree, not
            # just at top level (array<map<..>>, struct{m: map<..>}).
            if isinstance(dt, MapType):
                return True
            if isinstance(dt, ArrayType):
                return _has_map(dt.elementType)
            if isinstance(dt, StructType):
                return any(_has_map(f.dataType) for f in dt.fields)
            return False

        salt_src = [
            F.col(f.name)
            for f in skewed.schema.fields
            if not _has_map(f.dataType)
        ]
        if not salt_src:
            raise ValueError(
                "salted_join: no hashable columns for the default salt "
                "(every column contains a map type) — pass salt_by"
            )
    salted = skewed.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)),
    )
    replicated = other.withColumn(
        SALT_COL,
        F.explode(F.array(*[F.lit(i) for i in range(n_salts)])),
    )
    return (
        salted.join(replicated, [*on, SALT_COL], how)
        .drop(SALT_COL)
    )
