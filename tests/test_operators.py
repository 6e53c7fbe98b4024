"""Tabular operator semantics (reference golden-table tests:
tests/test_pyarrow_wrapper.py, tests/test_polars_wrapper.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import utils  # noqa: F401

from beavers_spark.operators import (
    asof_join,
    concat_streams,
    filter_stream,
    join_counts,
    last_by_keys,
    merge_sorted,
    topk,
    weighted_average,
    with_seq,
)


@pytest.fixture()
def simple(spark):
    # reference fixture F1: two batches keyed by col1
    return spark.createDataFrame(
        [
            (0, 1, "a"),
            (1, 2, "b"),
            (2, 3, "c"),
            (3, 1, "d"),
            (4, 2, "e"),
        ],
        "seq long, col1 int, col2 string",
    )


def test_last_by_keys_upsert(spark, simple):
    out = last_by_keys(simple, ["col1"], ["seq"]).select("col1", "col2")
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, "d"),
        (2, "e"),
        (3, "c"),
    ]


def test_last_by_keys_multi_key(spark):
    df = spark.createDataFrame(
        [(0, "e1", "a", 1.0), (1, "e1", "a", 2.0), (2, "e2", "a", 3.0)],
        "seq long, etf string, ticker string, qty double",
    )
    out = last_by_keys(df, ["etf", "ticker"], ["seq"])
    assert sorted(tuple(r) for r in out.select("etf", "qty").collect()) == [
        ("e1", 2.0),
        ("e2", 3.0),
    ]


def test_filter_stream_predicates_and_kwargs(spark, simple):
    out = filter_stream(simple, F.col("col1") > 1, col2="e")
    assert [tuple(r) for r in out.select("col1", "col2").collect()] == [(2, "e")]


def test_concat_streams_schema_check(spark, simple):
    a = simple.select("col1")
    b = simple.select("col2")
    with pytest.raises(Exception):
        concat_streams(a, b).collect()  # mismatched schemas must fail
    both = concat_streams(a, a)
    assert both.count() == 10


def test_merge_sorted(spark):
    a = spark.createDataFrame([(3, "a"), (1, "a")], "ts long, src string")
    b = spark.createDataFrame([(2, "b")], "ts long, src string")
    out = merge_sorted([a, b], "ts")
    assert [r.ts for r in out.collect()] == [1, 2, 3]


def test_topk_deterministic(spark, simple):
    out = topk(simple, [F.col("col1").desc(), F.col("seq").asc()], 2)
    assert [r.seq for r in out.collect()] == [2, 1]


def test_weighted_average_null_on_missing(spark):
    df = spark.createDataFrame(
        [("e1", 1.0, 2.0), ("e1", None, 3.0), ("e2", 4.0, 1.0)],
        "etf string, price double, weight double",
    )
    out = {r.etf: r.wavg for r in weighted_average(df, ["etf"], "price", "weight").collect()}
    assert out["e1"] is None  # any missing component -> null (etfs.py:70-91)
    assert out["e2"] == 4.0


def test_join_counts_zero_fill(spark):
    left = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    right = spark.createDataFrame([("b",), ("c",)], "k string")
    out = {r.k: (r.left_count, r.right_count) for r in join_counts(left, right, "k").collect()}
    assert out == {"a": (2, 0), "b": (1, 1), "c": (0, 1)}


def test_with_seq_deterministic_across_runs(spark, tmp_path):
    """with_seq is a pure function of the input files: two reads — even
    with different partition layouts — assign identical sequences
    (the monotonically_increasing_id retry hazard this replaces)."""
    p = str(tmp_path / "seq_src")
    spark.range(100).selectExpr("id", "id * 2 AS v").repartition(4).write.parquet(p)

    run1 = {r.id: r._seq for r in with_seq(spark.read.parquet(p)).collect()}
    df2 = spark.read.option("maxSplitBytes", "1024").parquet(p)
    run2 = {r.id: r._seq for r in with_seq(df2).collect()}
    assert run1 == run2
    assert len({tuple(s) for s in run1.values()}) == 100  # unique

    # file-major order: sorting by the struct gives file order then
    # in-file position — usable directly as last_by_keys order_by
    from beavers_spark.operators import last_by_keys

    tagged = with_seq(spark.read.parquet(p)).withColumn("k", F.col("id") % 5)
    latest = last_by_keys(tagged, ["k"], ["_seq"])
    assert latest.count() == 5


def test_with_seq_unstable_monotone_within_partition(spark):
    from beavers_spark.operators import with_seq_unstable

    df = spark.range(100).repartition(4)
    seqs = [r._seq for r in with_seq_unstable(df).collect()]
    assert len(set(seqs)) == 100  # unique


def test_asof_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, 1.0), ("A", 20, 2.0), ("B", 15, 3.0)],
        "k string, ts long, qty double",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 15, 110.0), ("A", 20, 120.0), ("B", 30, 200.0)],
        "k string, ts long, px double",
    )
    out = asof_join(trades, quotes, ["k"], "ts", "ts", direction="backward")
    got = {(r.k, r.ts): r.px_right for r in out.collect()}
    assert got == {
        ("A", 10): 100.0,  # latest quote <= 10
        ("A", 20): 120.0,  # quote AT 20 matches (<=)
        ("B", 15): None,  # no prior quote
    }


def test_asof_join_forward(spark):
    trades = spark.createDataFrame([("A", 10, 1.0)], "k string, ts long, qty double")
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 12, 110.0)], "k string, ts long, px double"
    )
    out = asof_join(trades, quotes, ["k"], "ts", "ts", direction="forward")
    assert out.collect()[0].px_right == 110.0  # earliest quote >= 10


def test_asof_join_preserves_left_rows(spark):
    trades = spark.createDataFrame(
        [("A", i, float(i)) for i in range(50)], "k string, ts long, qty double"
    )
    quotes = spark.createDataFrame([("A", 25, 1.0)], "k string, ts long, px double")
    out = asof_join(trades, quotes, ["k"], "ts", "ts")
    assert out.count() == 50
    nulls = out.filter(F.col("px_right").isNull()).count()
    assert nulls == 25  # ts 0..24 precede the only quote


def test_salted_join_matches_plain_join(spark):
    """Salting must not change join semantics — only the shuffle layout."""
    from beavers_spark.operators import salted_join

    # skewed: 90% of rows share key 'hot'
    skewed = spark.createDataFrame(
        [("hot", i) for i in range(90)] + [("cold", i) for i in range(10)],
        "k string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C"), ("unmatched", "U")], "k string, label string"
    )
    plain = skewed.join(dim, ["k"], "inner")
    salted = salted_join(skewed, dim, ["k"], n_salts=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))
    assert salted.columns == plain.columns

    # left join keeps unmatched skewed rows exactly once
    skewed2 = skewed.unionByName(
        spark.createDataFrame([("orphan", 1)], "k string, v int")
    )
    left_plain = skewed2.join(dim, ["k"], "left")
    left_salted = salted_join(skewed2, dim, ["k"], n_salts=8, how="left")
    assert sorted(map(tuple, left_salted.collect())) == sorted(
        map(tuple, left_plain.collect())
    )

    import pytest as _pytest

    with _pytest.raises(ValueError):
        salted_join(skewed, dim, ["k"], how="full")


def test_interval_join_matches_naive(spark):
    """Binned interval join == naive inequality join, incl. matches that
    cross bin boundaries."""
    import pandas as pd

    from beavers_spark.operators import interval_join

    base = pd.Timestamp("2024-01-01T00:00:00")
    left = spark.createDataFrame(
        [
            (i, "u", (base + pd.Timedelta(seconds=37 * i)).to_pydatetime())
            for i in range(40)
        ]
        + [(100, "v", base.to_pydatetime())],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1000 + i, "u", (base + pd.Timedelta(seconds=13 * i)).to_pydatetime())
            for i in range(120)
        ],
        "event_id long, user_id string, ts timestamp",
    )
    lower, upper = pd.Timedelta(0), pd.Timedelta(seconds=60)

    got = {
        (r.event_id, r.r_event_id)
        for r in interval_join(
            left, right, ["user_id"], "ts", "ts", lower, upper
        ).collect()
    }
    naive = {
        (l.event_id, 1000 + i)
        for l in left.collect()
        for i in range(120)
        if base + pd.Timedelta(seconds=13 * i) > l.ts
        and base + pd.Timedelta(seconds=13 * i) <= l.ts + upper
        and l.user_id == "u"
    }
    assert got == naive and len(naive) > 50


def test_weighted_average_null_contract(spark):
    """Null if ANY component value or weight is missing (review r5: a
    null value and a null weight on DIFFERENT rows used to slip through
    the count(v) < count(w) hole detector), and a zero-weight group is
    null rather than a division error."""
    from beavers_spark.operators.tabular import weighted_average

    df = spark.createDataFrame(
        [
            ("a", None, 1.0), ("a", 2.0, None), ("a", 3.0, 4.0),   # holes on different rows
            ("b", 1.0, 2.0), ("b", 3.0, 2.0),                      # clean
            ("c", 5.0, 0.0), ("c", 6.0, 0.0),                      # zero weights
            ("d", None, 2.0), ("d", 3.0, 4.0),                     # value hole
        ],
        "k string, v double, w double",
    )
    out = {r.k: r.wavg for r in weighted_average(df, ["k"], "v", "w").collect()}
    assert out["a"] is None and out["d"] is None and out["c"] is None
    assert abs(out["b"] - (1 * 2 + 3 * 2) / 4.0) < 1e-9


def test_salted_join_matches_plain_join_and_spreads_hot_rows(spark):
    from beavers_spark.operators.skew import salted_join

    skewed = spark.createDataFrame(
        [("hot", i) for i in range(50)] + [("cold", 0)],
        "k string, v long",
    )
    dim = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "k string, w double")
    out = salted_join(skewed, dim, ["k"], n_salts=4)
    plain = skewed.join(dim, ["k"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))
    # hot-key rows (distinct payloads) must take MULTIPLE salts, and
    # the salt must be DETERMINISTIC per row (retry-stable — a
    # monotonically_increasing_id salt changed reduce partitions
    # between task attempts, the SPARK-23207 class of bug, review r6):
    # the operator's own salt expression over the full row
    import pyspark.sql.functions as F2

    salt = F2.pmod(F2.xxhash64(F2.col("k"), F2.col("v")), F2.lit(4))
    hot = skewed.filter(F2.col("k") == "hot").withColumn("s", salt)
    assert hot.select("s").distinct().count() > 1
    # deterministic: recomputing yields identical per-row salts
    a = {(r.k, r.v): r.s for r in hot.collect()}
    b = {(r.k, r.v): r.s for r in hot.collect()}
    assert a == b
    # salt_by mode: a unique id column spreads even byte-identical rows
    ident = spark.createDataFrame(
        [(i, "hot", 7) for i in range(40)], "rid long, k string, v long"
    )
    by = salted_join(ident, dim, ["k"], n_salts=4, salt_by="rid")
    assert by.count() == 40
    # left join keeps unmatched skewed rows exactly once
    left = salted_join(
        skewed.union(spark.createDataFrame([("orphan", 9)], "k string, v long")),
        dim, ["k"], how="left",
    )
    assert left.filter(F2.col("k") == "orphan").count() == 1


def test_salted_join_skips_map_columns_in_default_salt(spark):
    # review r6: the default salt hashed every column; xxhash64 rejects
    # MapType, so any frame with a map column crashed
    from beavers_spark.operators import salted_join

    skewed = spark.createDataFrame(
        [(1, {"a": 1}, 10), (1, {"b": 2}, 20), (2, {"c": 3}, 30)],
        "k int, payload map<string,int>, v int",
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    out = salted_join(skewed, dim, ["k"], n_salts=4)
    assert out.count() == 3
    got = sorted((r.k, r.v, r.name) for r in out.collect())
    assert got == [(1, 10, "x"), (1, 20, "x"), (2, 30, "y")]


def test_salted_join_skips_nested_map_columns_too(spark):
    # ADVICE r6: xxhash64 rejects MapType at ANY nesting depth, not
    # just top level — array<map<..>> and struct{m: map<..>} columns
    # must also be excluded from the default salt
    import pytest as _pytest

    from beavers_spark.operators import salted_join

    skewed = spark.createDataFrame(
        [(1, [{"a": 1}], ({"x": 1}, 5), 10), (2, [{"b": 2}], ({"y": 2}, 6), 20)],
        "k int, am array<map<string,int>>, "
        "st struct<m: map<string,int>, n: int>, v int",
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k int, name string")
    out = salted_join(skewed, dim, ["k"], n_salts=4)
    got = sorted((r.k, r.v, r.name) for r in out.collect())
    assert got == [(1, 10, "x"), (2, 20, "y")]
    # every column map-bearing -> loud refusal, not an analyzer crash
    allmaps = spark.createDataFrame(
        [([{"a": 1}],)], "am array<map<string,int>>"
    )
    with _pytest.raises(ValueError, match="salt_by"):
        salted_join(allmaps, dim, ["k"], n_salts=4)
