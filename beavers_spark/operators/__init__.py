"""Tabular operators re-expressing the reference's table-operator surface.

Reference: beavers/pyarrow_wrapper.py + beavers/polars_wrapper.py (typed
table sources, filter_stream, last_by_keys, get_column, concat) and the
relational idioms used inside node functions across the reference's
examples/tests (SURVEY.md §2.4).
"""

from beavers_spark.operators.tabular import (  # noqa: F401
    concat_streams,
    filter_stream,
    get_column,
    join_counts,
    last_by_keys,
    merge_sorted,
    topk,
    weighted_average,
    with_seq,
    with_seq_unstable,
)
from beavers_spark.operators.asof import asof_join  # noqa: F401
from beavers_spark.operators.interval import interval_join  # noqa: F401
from beavers_spark.operators.skew import salted_join  # noqa: F401
from beavers_spark.operators.view import (  # noqa: F401
    COMPARATORS,
    TableView,
    ViewFilter,
)
