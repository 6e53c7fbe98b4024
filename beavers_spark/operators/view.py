"""Declarative latest-state table views — the analog of the reference's
perspective live-dashboard sink (beavers/perspective_wrapper.py: indexed
table updated per cycle, declarative sort/filters/hidden-columns/limit
with a comparator whitelist, perspective_wrapper.py:22-57, 143-153).

Spark-first: the view definition compiles to a DataFrame expression over
the keyed-latest state, so serving a dashboard page is
``view.apply(state_df)`` — ordinary Catalyst planning, no bespoke store.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Sequence
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beavers_spark.operators.tabular import last_by_keys

#: comparator whitelist (reference: perspective_wrapper.py:22-36)
COMPARATORS = (
    "==", "!=", ">", ">=", "<", "<=",
    "begins with", "contains", "ends with",
    "in", "not in", "is null", "is not null",
)


@dataclasses.dataclass(frozen=True)
class ViewFilter:
    column: str
    op: str
    value: Any = None

    def to_column(self) -> Column:
        c = F.col(self.column)
        if self.op == "==":
            return c == F.lit(self.value)
        if self.op == "!=":
            return c != F.lit(self.value)
        if self.op == ">":
            return c > F.lit(self.value)
        if self.op == ">=":
            return c >= F.lit(self.value)
        if self.op == "<":
            return c < F.lit(self.value)
        if self.op == "<=":
            return c <= F.lit(self.value)
        if self.op == "begins with":
            return c.startswith(str(self.value))
        if self.op == "contains":
            return c.contains(str(self.value))
        if self.op == "ends with":
            return c.endswith(str(self.value))
        if self.op in ("in", "not in"):
            # a bare string would star-expand into characters — reject it
            if isinstance(self.value, str) or not isinstance(
                self.value, (list, tuple, set, frozenset)
            ):
                raise ValueError(
                    f"{self.op!r} filter on {self.column!r} needs a collection, "
                    f"got {type(self.value).__name__}"
                )
            col = c.isin(*self.value)
            return col if self.op == "in" else ~col
        if self.op == "is null":
            return c.isNull()
        if self.op == "is not null":
            return c.isNotNull()
        raise ValueError(
            f"unsupported comparator {self.op!r}; allowed: {COMPARATORS}"
        )


@dataclasses.dataclass(frozen=True)
class TableView:
    """Declarative view over keyed latest state.

    - ``index_columns``: upsert key (reference ``index_column``,
      perspective_wrapper.py:143-153); rows are deduped to the latest
      per key by ``order_by`` before the view applies.
    - ``sort``: [(column, 'asc'|'desc')] (perspective_wrapper.py:52-57)
    - ``filters``: whitelisted comparators only
    - ``columns``: projection (None = all); ``limit``: row cap
    """

    index_columns: Sequence[str]
    order_by: Sequence[str]
    sort: Sequence[tuple[str, str]] = ()
    filters: Sequence[ViewFilter] = ()
    columns: Sequence[str] | None = None
    limit: int | None = None

    def __post_init__(self) -> None:
        for f in self.filters:
            if f.op not in COMPARATORS:
                raise ValueError(
                    f"unsupported comparator {f.op!r}; allowed: {COMPARATORS}"
                )
        for _, direction in self.sort:
            if direction not in ("asc", "desc"):
                raise ValueError(f"sort direction must be asc|desc, got {direction!r}")

    def apply(self, df: DataFrame) -> DataFrame:
        """Compile the view over an update stream: latest-per-key, then
        filter -> sort -> limit -> project. All Catalyst-visible; the
        sort+limit pair compiles to TakeOrderedAndProject."""
        out = last_by_keys(df, list(self.index_columns), list(self.order_by))
        for f in self.filters:
            out = out.filter(f.to_column())
        if self.sort:
            out = out.orderBy(
                *[
                    F.col(c).desc() if d == "desc" else F.col(c).asc()
                    for c, d in self.sort
                ]
            )
        if self.limit is not None:
            out = out.limit(self.limit)
        if self.columns is not None:
            out = out.select(*self.columns)
        return out
