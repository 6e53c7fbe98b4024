"""Top-principal-component extraction over an embedding column via
power iteration — the embedding-space direction finder (dominant-mode
analysis, outlier scoring along the first PC, the first step of
PCA-based debiasing / whitening in an embedding curation pipeline).

Spark-first shape, third member of the bounded-driver-model family
(``functions.kmeans``, ``functions.classifier``):

- the covariance matrix is NEVER materialized: one power step is
  ``u = Σ_i (x_i - μ) · ((x_i - μ)ᵀ v)`` — a single corpus pass per
  iteration computing a per-row scalar then d position-keyed partial
  sums (O(n·d) work, map-side combinable, shuffle volume d rows per
  task — not the O(n·d²) outer-product explode);
- only μ and v (d doubles each) ever visit the driver — bounded by
  contract; each iteration's plan starts from literal μ/v arrays, so
  no lineage grows across iterations;
- the projection plan is SCAN-ONLY: a pure Column fold against the
  literal component — no join, no shuffle, embarrassingly parallel at
  any corpus size.

Determinism contract (engine-exact, any partition layout): μ is the
4 dp decimal-exact per-position mean; per-row scores are in-order
double folds rounded to 6 dp; position sums add 9 dp-rounded terms as
decimals; normalization divides by ``sqrt`` of a decimal-exact sum of
squares (IEEE sqrt is correctly rounded — engine-identical); the
component's sign is fixed so its largest-|value| cell (lowest position
on ties) is positive. A DuckDB replay of the same fixed iterations
reproduces component and projections hash-exactly.

Reference: no linear-algebra surface in the reference
(README.md:43-50) — beyond-reference training-data tier.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _round_half_up(x: float, nd: int) -> float:
    """Driver-side twin of ``F.round`` on doubles: exact binary value,
    HALF_UP — matching Spark and DuckDB (ties on doubles are
    vanishingly rare and both engines resolve them away from zero)."""
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP)) + 0.0


def _normalize_signed(u: list[float]) -> list[float]:
    """Normalize to unit length (6 dp) and fix the sign: the cell with
    the largest |value| (lowest position on ties) ends positive. Sums
    of squares run in exact Decimal so the norm is order-independent;
    ``math.sqrt`` is IEEE-correctly-rounded — identical in SQL."""
    norm_sq = sum(
        (Decimal(repr(c)) * Decimal(repr(c)) for c in u), Decimal(0)
    )
    norm = math.sqrt(float(norm_sq))
    if norm == 0.0:
        return [0.0 for _ in u]
    v = [_round_half_up(c / norm, 6) for c in u]
    p_star = max(range(len(v)), key=lambda p: (abs(v[p]), -p))
    if v[p_star] < 0:
        v = [_round_half_up(-c, 6) for c in v]
    return v


def _centered_dot(vec: Column, mu: list[float], v: list[float]) -> Column:
    """In-order fold ``Σ_p (vec[p] - μ[p]) · v[p]`` rounded to 6 dp —
    both engines fold the position list left-to-right, so the doubles
    agree bit-for-bit (the kmeans d2 scheme)."""
    terms = F.zip_with(
        F.zip_with(
            vec.cast("array<double>"),
            F.lit(mu).cast("array<double>"),
            lambda x, m: x - m,
        ),
        F.lit(v).cast("array<double>"),
        lambda c, w: c * w,
    )
    return F.round(
        F.aggregate(terms, F.lit(0.0), lambda acc, t: acc + t), 6
    )


def mean_vector(
    emb: DataFrame, vec_col: str = "embedding"
) -> list[float]:
    """Decimal-exact per-position mean, rounded to 4 dp — identical
    under any partition layout (the kmeans centroid-cell scheme)."""
    rows = (
        emb.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                   .alias("pos", "x"))
        .groupBy("pos")
        .agg(
            (
                F.round(
                    F.sum(F.col("x").cast("decimal(27,12)"))
                    .cast("double")
                    / F.count(F.lit(1)),
                    4,
                )
                + F.lit(0.0)
            ).alias("m")
        )
        .collect()
    )
    mu = [0.0] * len(rows)
    for r in rows:
        mu[r["pos"]] = r["m"]
    return mu


def power_component(
    spark: SparkSession,
    emb: DataFrame,
    iters: int = 2,
    vec_col: str = "embedding",
) -> tuple[list[float], list[float]]:
    """Fit ``iters`` power iterations; returns ``(mu, v)`` — the mean
    and the unit top-principal-component estimate, both d-element
    driver lists (bounded by contract).

    v0 is the uniform unit vector ``1/√d`` (6 dp) — deterministic, no
    data-dependent init to replay. Each iteration is ONE corpus pass:
    per-row centered score s_i (in-order fold, 6 dp), then d decimal
    position sums of ``round((x_ip - μ_p)·s_i, 9)``.
    """
    first = emb.select(F.size(vec_col).alias("d")).limit(1).collect()
    if not first:
        return [], []
    d = first[0]["d"]
    mu = mean_vector(emb, vec_col)
    v = [_round_half_up(1.0 / math.sqrt(d), 6)] * d
    for _ in range(iters):
        s = emb.select(
            F.col(vec_col).alias("vec"),
            _centered_dot(F.col(vec_col), mu, v).alias("s"),
        )
        cells = (
            s.select(
                "s",
                F.posexplode(F.col("vec").cast("array<double>"))
                .alias("pos", "x"),
            )
            .groupBy("pos")
            .agg(
                F.sum(
                    F.round(
                        (F.col("x") - F.element_at(F.lit(mu), F.col("pos") + 1))
                        * F.col("s"),
                        9,
                    ).cast("decimal(27,9)")
                ).alias("u")
            )
            .collect()
        )
        u = [0.0] * d
        for r in cells:
            u[r["pos"]] = _round_half_up(float(r["u"]), 6)
        v = _normalize_signed(u)
    return mu, v


def pca_component_cells(
    spark: SparkSession,
    emb: DataFrame,
    iters: int = 2,
    vec_col: str = "embedding",
) -> DataFrame:
    """The fitted component as hash-checkable scalar rows ``(pos, v)``
    — a literal scan, like ``kmeans_centroid_cells``."""
    _, v = power_component(spark, emb, iters, vec_col)
    return spark.createDataFrame(
        list(enumerate(v)), "pos int, v double"
    )


def pca_project(
    spark: SparkSession,
    emb: DataFrame,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Every vector's signed projection onto the top PC:
    ``(id_col, score)`` with ``score = round((x - μ)·v, 6)``.

    The plan is scan-only — a literal-array fold inside the projection,
    no join, no shuffle: the 100 TB-ready shape for scoring/debiasing
    along a fitted direction.
    """
    mu, v = power_component(spark, emb, iters, vec_col)
    if not v:
        return emb.select(id_col, F.lit(0.0).alias("score")).limit(0)
    return emb.select(
        id_col,
        (_centered_dot(F.col(vec_col), mu, v) + F.lit(0.0)).alias("score"),
    )


def pca_residual_outliers(
    spark: SparkSession,
    emb: DataFrame,
    n: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-``n`` vectors by squared residual AFTER removing the top-PC
    mode: ``r2 = |x - μ|² - score²`` — the "what does the dominant
    direction NOT explain" outlier cut (an outlier along the main mode
    is ordinary; an outlier ORTHOGONAL to it is structurally unusual).

    Emits ``(id_col, score, r2)``, ``r2`` rounded to 6 dp, largest
    first (id tie-break on the rounded value). Like the projection,
    the plan is scan-only up to the TakeOrderedAndProject top-n:
    two in-order folds against literal μ/v — no join, no shuffle.
    """
    mu, v = power_component(spark, emb, iters, vec_col)
    if not v:
        return emb.select(
            id_col, F.lit(0.0).alias("score"), F.lit(0.0).alias("r2")
        ).limit(0)
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.lit(mu).cast("array<double>"),
        lambda x, m: (x - m) * (x - m),
    )
    norm2 = F.round(
        F.aggregate(centered, F.lit(0.0), lambda acc, t: acc + t), 6
    )
    s = _centered_dot(F.col(vec_col), mu, v)
    scored = emb.select(
        id_col,
        (s + F.lit(0.0)).alias("score"),
        (F.round(norm2 - s * s, 6) + F.lit(0.0)).alias("r2"),
    )
    return scored.orderBy(F.desc("r2"), F.asc(id_col)).limit(n)
