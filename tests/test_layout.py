"""Z-order layout writer: key correctness, span narrowing, roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beavers_spark.sources.layout import (
    column_bounds,
    file_span_report,
    write_zordered,
    zorder_key,
)


@pytest.fixture()
def grid(spark):
    # full 64x64 integer grid — uniform in both dimensions
    return spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_key_locality(spark, grid):
    # Morton property: the 4 quadrants of the grid occupy 4 disjoint
    # contiguous key ranges — i.e. the top bits of the key are the top
    # bits of (x, y) interleaved
    bounds = {"x": (0, 63), "y": (0, 63)}
    keyed = grid.withColumn("z", zorder_key(["x", "y"], bounds, bits=6))
    rows = keyed.select("x", "y", "z").collect()
    assert len({r.z for r in rows}) == 64 * 64  # bijective on the grid
    quad_ranges = {}
    for r in rows:
        q = (r.x >= 32, r.y >= 32)
        lo, hi = quad_ranges.get(q, (r.z, r.z))
        quad_ranges[q] = (min(lo, r.z), max(hi, r.z))
    ranges = sorted(quad_ranges.values())
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo  # disjoint and contiguous blocks


def test_zorder_write_narrows_both_columns(spark, grid, tmp_path):
    z_path = str(tmp_path / "z")
    s_path = str(tmp_path / "sorted")
    write_zordered(grid, z_path, ["x", "y"], n_files=16, bits=6)
    # contrast: single-column sort layout
    (
        grid.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.parquet(s_path)
    )
    z = file_span_report(z_path, ["x", "y"])
    s = file_span_report(s_path, ["x", "y"])
    # sorted-by-x: x is narrow but y spans ~the whole domain per file
    assert s["x"] < 0.2 and s["y"] > 0.8
    # z-ordered: BOTH dimensions narrow per file
    assert z["x"] < 0.5 and z["y"] < 0.5
    assert z["x"] + z["y"] < s["x"] + s["y"]


def test_zorder_roundtrip_and_null_handling(spark, tmp_path):
    df = spark.createDataFrame(
        [(None, 5, "a"), (3, None, "b"), (7, 2, "c"), (100, 50, "d")],
        "x int, y int, tag string",
    )
    path = str(tmp_path / "nulls")
    write_zordered(df, path, ["x", "y"], n_files=2, bits=8)
    back = spark.read.parquet(path)
    assert sorted(r.tag for r in back.collect()) == ["a", "b", "c", "d"]
    assert "__zkey" not in back.columns


def test_zorder_key_validates(spark, grid):
    bounds = {"x": (0, 63), "y": (0, 63)}
    with pytest.raises(ValueError, match=">= 2 columns"):
        zorder_key(["x"], bounds)
    with pytest.raises(ValueError, match="exceeds 62"):
        zorder_key(["x", "y"], bounds, bits=32)


def test_column_bounds_one_pass(spark, grid):
    assert column_bounds(grid, ["x", "y"]) == {"x": (0.0, 63.0), "y": (0.0, 63.0)}


def test_constant_column_contributes_nothing(spark, tmp_path):
    df = spark.range(100).select(
        F.lit(7).alias("c"), F.col("id").alias("x")
    )
    # constant first column: key degrades to x-only ordering, still valid
    bounds = {"c": (7.0, 7.0), "x": (0.0, 99.0)}
    keyed = df.withColumn("z", zorder_key(["c", "x"], bounds, bits=8))
    rows = keyed.orderBy("x").collect()
    zs = [r.z for r in rows]
    assert zs == sorted(zs)


def test_all_null_zorder_column_is_skipped(spark, tmp_path):
    # review r6: (None, None) bounds from an all-NULL column crashed
    # zorder_key with a TypeError instead of clustering like a
    # constant column
    from beavers_spark.sources.layout import write_zordered

    df = spark.createDataFrame(
        [(i, float(i % 7), None) for i in range(40)],
        "id long, x double, y double",
    )
    path = str(tmp_path / "z")
    write_zordered(df, path, ["x", "y"], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == 40
