"""Behavioral tests for the power-iteration top PC (functions/pca.py):
recovers a planted dominant direction, sign convention, scan-only
projection plan, determinism, degenerate inputs."""

from __future__ import annotations

from beavers_spark.functions.pca import (
    mean_vector,
    pca_project,
    power_component,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


def test_recovers_planted_direction(spark):
    # variance almost entirely along axis 2 of 4
    rows = [[0.01 * i, 0.02, 10.0 * (i % 5), 0.03] for i in range(40)]
    emb = _vecs(spark, rows)
    _, v = power_component(spark, emb, iters=3)
    assert abs(v[2]) > 0.99
    # sign convention: the dominant cell is positive
    assert v[2] > 0
    # unit length at 6 dp quantization
    assert abs(sum(c * c for c in v) - 1.0) < 1e-4


def test_projection_orders_along_direction(spark):
    rows = [[float(i), 0.0] for i in range(10)]
    emb = _vecs(spark, rows)
    out = sorted(
        pca_project(spark, emb, iters=2).collect(), key=lambda r: r.vec_id
    )
    scores = [r.score for r in out]
    # monotone along the planted axis, centered around 0
    assert scores == sorted(scores)
    assert abs(sum(scores)) < 1e-3


def test_projection_plan_is_scan_only(spark):
    emb = _vecs(spark, [[float(i), 1.0, 2.0] for i in range(6)])
    plan = (
        pca_project(spark, emb, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for op in ("Join", "Exchange", "Sort", "Window"):
        assert op not in plan, f"unexpected {op} in scan-only projection"


def test_component_is_deterministic(spark):
    emb = _vecs(
        spark, [[float(i % 7), float((i * 3) % 5), 0.1] for i in range(30)]
    )
    _, a = power_component(spark, emb, iters=2)
    _, b = power_component(spark, emb, iters=2)
    assert a == b


def test_mean_vector_exact(spark):
    emb = _vecs(spark, [[1.0, 2.0], [3.0, 6.0]])
    assert mean_vector(emb) == [2.0, 4.0]


def test_empty_corpus(spark):
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>")
    mu, v = power_component(spark, emb)
    assert (mu, v) == ([], [])
    assert pca_project(spark, emb).count() == 0


def test_residual_outlier_is_the_orthogonal_point(spark):
    from beavers_spark.functions.pca import pca_residual_outliers

    # main mode along axis 0; vec 8 sits orthogonal to it on axis 1 —
    # modest |x|, but nothing of it is explained by the top PC
    rows = [[float(i - 4) * 10.0, 0.0] for i in range(8)] + [[0.0, 15.0]]
    emb = _vecs(spark, rows)
    out = pca_residual_outliers(spark, emb, n=3, iters=3).collect()
    assert out[0].vec_id == 8
    assert out[0].r2 > out[1].r2
    # top-n plan: per-partition heaps, not a global sort
    plan = (
        pca_residual_outliers(spark, emb, n=3, iters=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_zero_variance_degenerates_to_zero(spark):
    emb = _vecs(spark, [[5.0, 5.0]] * 4)
    _, v = power_component(spark, emb, iters=2)
    assert v == [0.0, 0.0]
