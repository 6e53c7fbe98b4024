"""Embedding similarity search: brute-force cosine top-k and an
LSH-bucketed approximate variant (the 100 TB scale path).

Vector math is expressed with ``F.zip_with`` / ``F.aggregate`` over
``array<float>`` columns — JVM-side higher-order functions, no Python in
the loop. Accumulation is in double precision in strict index order, which
makes results bit-reproducible (and oracle-comparable).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<numeric> columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Plan shape: broadcast the (small) query set against the corpus — a
    broadcast nested-loop that scans the corpus ONCE for all queries —
    then per-query top-k via window row_number. Ranking is on the rounded
    similarity with corpus-id tiebreak so results are deterministic.

    At 100 TB: corpus scan parallelizes perfectly; the window shuffle is
    keyed on query_id (cardinality = |queries|), so for large query sets
    switch to ``lsh_bucketed_topk``.
    """
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    return scored.withColumn("rnk", w).filter(F.col("rnk") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a hash counter (no RNG
    state, reproducible across runs/machines)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            v = (int(h[:15], 16) / float(1 << 60)) * 2.0 - 1.0
            row.append(v)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucketing, candidates restricted
    to the query's bucket, then exact cosine rerank within the bucket.

    The scale path: the corpus is hashed once (narrow map), the join is an
    equi-join on bucket id (hash shuffle on a 2^n_planes-ary key), and the
    rerank only touches bucket-mates. Recall < 1.0 by construction; raise
    n_planes for precision/bucket-size trade-off, or probe multiple buckets
    (multi-probe LSH) for higher recall.
    """
    planes = _hyperplanes(dim, n_planes)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    return scored.withColumn("rnk", w).filter(F.col("rnk") <= k)
