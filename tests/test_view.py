"""TableView (perspective analog) semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beavers_spark.operators import TableView, ViewFilter


@pytest.fixture()
def updates(spark):
    return spark.createDataFrame(
        [
            (0, "k1", 10.0, "x"),
            (1, "k2", 30.0, "ya"),
            (2, "k1", 20.0, "yb"),  # k1 upserted
            (3, "k3", 5.0, "z"),
        ],
        "seq long, key string, value double, tag string",
    )


def test_view_latest_filter_sort_limit(spark, updates):
    view = TableView(
        index_columns=["key"],
        order_by=["seq"],
        filters=(ViewFilter("value", ">=", 10),),
        sort=(("value", "desc"),),
        limit=1,
        columns=["key", "value"],
    )
    rows = [tuple(r) for r in view.apply(updates).collect()]
    assert rows == [("k2", 30.0)]  # k1's latest is 20, k2 wins the sort


def test_view_string_comparators(spark, updates):
    view = TableView(
        index_columns=["key"],
        order_by=["seq"],
        filters=(ViewFilter("tag", "begins with", "y"),),
    )
    keys = sorted(r.key for r in view.apply(updates).collect())
    assert keys == ["k1", "k2"]  # k1 latest tag 'yb', k2 'ya'


def test_view_null_comparators(spark):
    df = spark.createDataFrame(
        [(0, "a", None), (1, "b", 1.0)], "seq long, key string, v double"
    )
    view = TableView(["key"], ["seq"], filters=(ViewFilter("v", "is null"),))
    assert [r.key for r in view.apply(df).collect()] == ["a"]


def test_view_rejects_unknown_comparator():
    with pytest.raises(ValueError, match="unsupported comparator"):
        TableView(["k"], ["seq"], filters=(ViewFilter("v", "like", "x"),))


def test_view_rejects_bad_sort_direction():
    with pytest.raises(ValueError, match="sort direction"):
        TableView(["k"], ["seq"], sort=(("v", "descending"),))


def test_view_compiles_to_take_ordered(spark, updates):
    """sort+limit must become TakeOrderedAndProject (no global sort)."""
    view = TableView(["key"], ["seq"], sort=(("value", "desc"),), limit=2)
    plan = view.apply(updates)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
