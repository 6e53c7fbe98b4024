"""Top-PC power-iteration plans: component cells and scan-only
projection, with a DuckDB oracle that replays the same two fixed
iterations (uniform 1/√d init, 6 dp quantized normalize, argmax sign
fix) — the third exactly-replayable iterative fit after k-means and
the GD classifier.

Reference: no linear-algebra surface in the reference
(README.md:43-50) — beyond-reference tier, conventions of
plans/selection.py.
"""

from __future__ import annotations

from beavers_spark.functions.pca import (
    pca_component_cells,
    pca_project,
    pca_residual_outliers,
)
from beavers_spark.plans.common import t
from beavers_spark.plans.registry import query

_ITERS = 2

_SQL_PCA_BASE = """
vecs AS (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vec
    FROM embeddings
),
posx AS (
    SELECT vec_id, unnest(generate_series(1, len(vec))) - 1 AS pos,
           unnest(vec) AS x
    FROM vecs
),
mu AS (
    SELECT pos,
           round(CAST(sum(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
                 / count(*), 4) + 0.0 AS m
    FROM posx GROUP BY pos
),
dd AS (SELECT max(pos) + 1 AS d FROM mu),
v0 AS (SELECT pos, round(1.0 / sqrt(dd.d), 6) AS v FROM mu, dd)
"""


def _sql_power_step(step: int) -> str:
    """One power iteration off ``v{step}``: per-vec in-order centered
    fold (6 dp), decimal position sums of 9 dp terms, 6 dp normalize,
    largest-|cell| sign fix — cell-for-cell the documented driver
    math of functions/pca.py."""
    n = step + 1
    return f"""
s{n} AS (
    SELECT p.vec_id,
           round(list_reduce(list_prepend(0.0::DOUBLE,
               list((p.x - mu.m) * v{step}.v ORDER BY p.pos)),
               (a, b) -> a + b), 6) AS s
    FROM posx p JOIN mu USING (pos) JOIN v{step} USING (pos)
    GROUP BY p.vec_id
),
u{n} AS (
    SELECT p.pos,
           round(sum(CAST(round((p.x - mu.m) * s{n}.s, 9)
                          AS DECIMAL(27,9)))::DOUBLE, 6) + 0.0 AS u
    FROM posx p JOIN mu USING (pos) JOIN s{n} USING (vec_id)
    GROUP BY p.pos
),
nrm{n} AS (
    SELECT sqrt((sum(CAST(u AS DECIMAL(18,6))
                     * CAST(u AS DECIMAL(18,6))))::DOUBLE) AS nv
    FROM u{n}
),
vraw{n} AS (
    SELECT pos, round(u / nrm{n}.nv, 6) + 0.0 AS vv FROM u{n}, nrm{n}
),
sg{n} AS (
    SELECT CASE WHEN vv < 0 THEN -1.0 ELSE 1.0 END AS sg
    FROM vraw{n} ORDER BY abs(vv) DESC, pos LIMIT 1
),
v{n} AS (
    SELECT pos, round(vv * sg{n}.sg, 6) + 0.0 AS v FROM vraw{n}, sg{n}
)
"""


_SQL_PCA_CHAIN = (
    f"WITH {_SQL_PCA_BASE}, {_sql_power_step(0)}, {_sql_power_step(1)}"
)


@query(
    "pca_component",
    oracle=f"""
    {_SQL_PCA_CHAIN}
    SELECT pos, v FROM v2
    """,
)
def pca_component_q(spark, sf_dir):
    """Top principal component of the embedding corpus after 2 power
    iterations, as flat (pos, v) cells. The covariance matrix is never
    materialized: each iteration is one O(n·d) corpus pass; only d
    doubles visit the driver — the plan itself is a literal scan."""
    return pca_component_cells(
        spark, t(spark, sf_dir, "embeddings"), iters=_ITERS
    )


@query(
    "pca_project",
    oracle=f"""
    {_SQL_PCA_CHAIN}
    SELECT p.vec_id,
           round(list_reduce(list_prepend(0.0::DOUBLE,
               list((p.x - mu.m) * v2.v ORDER BY p.pos)),
               (a, b) -> a + b), 6) + 0.0 AS score
    FROM posx p JOIN mu USING (pos) JOIN v2 USING (pos)
    GROUP BY p.vec_id
    """,
)
def pca_project_q(spark, sf_dir):
    """Every vector's signed projection onto the fitted top PC — the
    dominant-mode / outlier score. The Spark plan is SCAN-ONLY (a
    literal-array fold inside the projection): no join, no shuffle —
    embarrassingly parallel at 100 TB."""
    return pca_project(spark, t(spark, sf_dir, "embeddings"), iters=_ITERS)


@query(
    "pca_residual_outliers",
    oracle=f"""
    {_SQL_PCA_CHAIN},
    proj AS (
        SELECT p.vec_id,
               round(list_reduce(list_prepend(0.0::DOUBLE,
                   list((p.x - mu.m) * v2.v ORDER BY p.pos)),
                   (a, b) -> a + b), 6) + 0.0 AS score,
               round(list_reduce(list_prepend(0.0::DOUBLE,
                   list((p.x - mu.m) * (p.x - mu.m) ORDER BY p.pos)),
                   (a, b) -> a + b), 6) AS n2
        FROM posx p JOIN mu USING (pos) JOIN v2 USING (pos)
        GROUP BY p.vec_id
    )
    SELECT vec_id, score, round(n2 - score * score, 6) + 0.0 AS r2
    FROM proj
    ORDER BY r2 DESC, vec_id LIMIT 50
    """,
)
def pca_residual_outliers_q(spark, sf_dir):
    """Top-50 vectors by squared residual AFTER removing the top-PC
    mode (|x-μ|² − score²): the structurally-unusual cut — an outlier
    ORTHOGONAL to the dominant direction, not merely along it.
    Scan-only folds + TakeOrderedAndProject."""
    return pca_residual_outliers(
        spark, t(spark, sf_dir, "embeddings"), n=50, iters=_ITERS
    )
