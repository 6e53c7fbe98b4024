"""Embedding-column analytics: per-class centroids and
distance-to-centroid outlier mining — the embedding-space QA pass of a
training pipeline (mislabeled examples, drift by class, cluster
profiling).

Reference: no embedding surface in the reference (README.md:43-50) —
beyond-reference tier, sibling of functions/similarity.py (which owns
the search-style ops: brute-force / IVF / LSH top-k).

Scale notes
-----------
Centroids are computed as a position-exploded partial aggregation:
``posexplode`` is narrow (fan-out inside the scan stage), and the
``groupBy(label, pos)`` benefits from map-side combine, so the shuffle
volume is ``n_labels × dim`` partial sums per task — not rows × dim.
The centroid table itself is ``n_labels × dim`` rows (tiny), so the
join back onto the corpus for distance scoring is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from beavers_spark.functions.similarity import cosine_sim


def label_centroids(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Elementwise mean embedding per label, as ``(label, pos, m)`` rows.

    The mean is a decimal-exact sum divided ONCE: ``avg`` over doubles is
    summation-order-dependent, and with per-group term counts growing with
    the scale factor a half-ulp of drift crosses the 4 dp rounding
    boundary (observed at sf0.1: 3 of 640 centroid cells flipped vs the
    DuckDB oracle). Casting each element to ``decimal(27,12)`` makes the
    sum associative/exact in any order; the single IEEE division and the
    final round are then bit-identical across engines. Emitting rows
    rather than re-assembled arrays keeps the result hash-checkable
    scalar-by-scalar; ``centroid_arrays`` folds them back into vectors."""
    pos = emb.select(
        label_col, F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    # `+ 0.0` collapses IEEE negative zero: Spark's round goes through
    # BigDecimal (no -0.0) while DuckDB's keeps the sign bit, and the
    # value-hash compares reprs ('-0.0' != '0.0')
    return pos.groupBy(label_col, "pos").agg(
        (
            F.round(
                F.sum(F.col("v").cast("decimal(27,12)")).cast("double")
                / F.count(F.lit(1)),
                4,
            )
            + F.lit(0.0)
        ).alias("m")
    )


def centroid_arrays(
    cents: DataFrame, label_col: str = "label"
) -> DataFrame:
    """Fold ``(label, pos, m)`` centroid rows back into
    ``(label, centroid: array<double>)`` — n_labels × dim input, trivially
    small; the array form is what distance scoring broadcasts."""
    return cents.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))),
            lambda x: x["m"],
        ).alias("centroid")
    )


def embedding_outliers(
    emb: DataFrame,
    k: int = 5,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-``k`` outliers per label: vectors with the LOWEST cosine
    similarity to their own label's centroid — the mislabeled-example /
    contamination detector.

    The centroid table (n_labels × dim) broadcasts into the corpus
    scan; similarity is a 2·dim-element HOF fold (JVM-side); ranking is
    a per-label window. One corpus-keyed shuffle total (the window) —
    and ``k`` rows per label survive it.

    Determinism: similarity is rounded to 4 dp and the window orders by
    the ROUNDED value with ``id_col`` as tie-break.
    """
    cents = centroid_arrays(label_centroids(emb, label_col, vec_col))
    scored = emb.join(F.broadcast(cents), label_col).withColumn(
        "cos_sim",
        F.round(
            cosine_sim(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                F.col("centroid"),
            ),
            4,
        ),
    )
    w = Window.partitionBy(label_col).orderBy(
        F.asc("cos_sim"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(label_col, id_col, "cos_sim", "rk")
    )
