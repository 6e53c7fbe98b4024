"""As-of (point-in-time) join — beyond-reference operator (SURVEY.md §2.7
notes the reference lacks it; it is table stakes for a stream-analytics
engine joining quotes to trades).

Strategy: union-based merge rather than a windowed cross join —
scales to 100 TB because it is one shuffle on the join keys and one
per-key sort, with no row explosion.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    *,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (direction='backward') or the earliest with
    ``right_ts >= left_ts`` ('forward'), per key.

    Implementation: tag both sides, union, then ``last(ignorenulls)`` over a
    per-key window ordered by (ts, side) — the classic merge-asof as a
    single window pass. One shuffle on ``on`` keys; no range-join explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    on = list(on)
    right_payload = [c for c in right.columns if c not in on and c != right_ts]

    lhs = left.withColumn("_ts", F.col(left_ts)).withColumn("_side", F.lit(1))
    for c in right_payload:
        lhs = lhs.withColumn(f"{c}{suffix}", F.lit(None).cast(right.schema[c].dataType))

    rhs = right.withColumn("_ts", F.col(right_ts)).withColumn("_side", F.lit(0))
    rhs = rhs.select(
        *on,
        "_ts",
        "_side",
        *[F.col(c).alias(f"{c}{suffix}") for c in right_payload],
    )
    for c in left.columns:
        if c not in on and c not in rhs.columns:
            rhs = rhs.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    rhs = rhs.select(*[c for c in lhs.columns])

    merged = lhs.unionByName(rhs)

    if direction == "backward":
        # right rows sort before left rows at equal ts: quote at t matches trade at t
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )

    out = merged
    for c in right_payload:
        out = out.withColumn(
            f"{c}{suffix}", F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
        )
    return out.filter(F.col("_side") == 1).drop("_ts", "_side")
