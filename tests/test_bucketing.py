"""Bucketed tables: the join must plan with zero shuffle Exchange."""

from __future__ import annotations

import pytest

from beavers_spark.sources import bucketed_join, write_bucketed


@pytest.fixture()
def bucketed_tables(spark):
    orders = spark.createDataFrame(
        [(i, f"c{i % 7}", float(i)) for i in range(200)],
        "o_key int, cust string, total double",
    )
    items = spark.createDataFrame(
        [(i % 150, j, float(i * j)) for i in range(300) for j in range(2)],
        "o_key int, line int, amount double",
    )
    write_bucketed(orders, "b_orders", ["o_key"], 4, sort_cols=["o_key"])
    write_bucketed(items, "b_items", ["o_key"], 4, sort_cols=["o_key"])
    # force a non-broadcast plan: at test size the planner would broadcast
    # (correct for tiny dims, but here we're testing the fact-fact path)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield "b_orders", "b_items"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = bucketed_join(spark, left, right, ["o_key"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # the whole point of bucketing
    assert "Bucketed: true" in plan

    # and the result is a correct join: every item key (0..149) matches
    assert joined.count() == 600


def test_unbucketed_join_does_exchange(spark, bucketed_tables):
    """Control: the same join on de-bucketed inputs shuffles both sides
    (sanity that the no-Exchange assertion above is meaningful)."""
    left, right = bucketed_tables
    a = spark.table(left).localCheckpoint()  # strips bucketing metadata
    b = spark.table(right).localCheckpoint()
    joined = a.join(b, ["o_key"])
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan
