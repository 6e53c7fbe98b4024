"""Embedding similarity search: brute-force cosine top-k, an
LSH-bucketed approximate variant, and an IVF (inverted-file) variant
with a KMeans-trained quantizer (the 100 TB scale paths).

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
    # Precompute each side's norm ONCE behind a projection boundary —
    # inlining cosine_sim would re-fold both norms per pair. Repartition
    # the corpus: a single parquet file scans as one partition, which
    # would serialize the (CPU-heavy) higher-order dot products.
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = (
        corpus.repartition(parallelism)
        .select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("cn", _norm(F.col("cv")))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    return scored.withColumn("rnk", w).filter(F.col("rnk") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    train_fraction: float = 1.0,
) -> DataFrame:
    """IVF ANN: KMeans-partitioned corpus, queries probe the ``n_probe``
    nearest cells, exact cosine rerank within probed cells only.

    The classic inverted-file index, Spark-first:

    1. *Train*: fit a ``n_cells``-way KMeans quantizer (pyspark.ml, all
       JVM) — on a sample at scale (``train_fraction``), the standard IVF
       practice since the quantizer only needs the coarse density shape.
    2. *Assign*: one narrow ``model.transform`` pass labels each corpus
       vector with its cell — no shuffle, and at 100 TB the assignment
       can be written back as a partition column so later queries prune
       cells at the parquet-scan level.
    3. *Probe*: each query computes its distance to all ``n_cells``
       centroids (a tiny broadcast literal), keeps the ``n_probe``
       closest via ``array_sort`` + ``slice``, and equi-joins the corpus
       on cell id — candidate volume ~ ``n_probe/n_cells`` of the data,
       never a cross join.

    Recall/cost dial: ``n_probe = n_cells`` degenerates to exact brute
    force; ``n_probe = 1`` is the fastest/lowest-recall point.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    train = corpus if train_fraction >= 1.0 else corpus.sample(
        fraction=train_fraction, seed=seed
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="__fv", predictionCol="cell")
    model = km.fit(train.select(array_to_vector(F.col(vec_col)).alias("__fv")))
    centroids = [c.tolist() for c in model.clusterCenters()]

    c = (
        corpus.repartition(parallelism)
        .withColumn("__fv", array_to_vector(F.col(vec_col)))
        .transform(model.transform)
        .select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            "cell",
        )
        .withColumn("cn", _norm(F.col("cv")))
    )

    # per-query centroid distances as a literal array of structs:
    # sort by L2 distance, keep the n_probe nearest cells, explode
    cent_structs = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("qv"),
                        F.array(*[F.lit(x) for x in cent]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(i).alias("cell"),
            )
            for i, cent in enumerate(centroids)
        ]
    )
    q = (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .withColumn("qn", _norm(F.col("qv")))
        .withColumn(
            "probe", F.explode(F.slice(F.array_sort(cent_structs), 1, n_probe))
        )
        .select("query_id", "qv", "qn", F.col("probe.cell").alias("cell"))
    )

    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
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
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucketing with multi-probe,
    candidates restricted to probed buckets, exact cosine rerank inside.

    The scale path: the corpus is hashed once (narrow map), the join is an
    equi-join on bucket id (hash shuffle on a 2^n_planes-ary key), and the
    rerank only touches bucket-mates. ``multi_probe`` additionally probes
    every bucket at Hamming distance 1 from the query's bucket (a near
    neighbor falling on the wrong side of ONE hyperplane is the dominant
    miss mode) — recall rises steeply for (n_planes+1)x more candidate
    volume, still an equi-join, never a cross join.
    """
    planes = _hyperplanes(dim, n_planes)
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    ).withColumn("qn", _norm(F.col("qv")))
    if multi_probe:
        probe_offsets = F.array(
            F.lit(0), *[F.lit(1 << i) for i in range(n_planes)]
        )
        q = q.withColumn(
            "bucket",
            F.explode(
                F.transform(
                    probe_offsets, lambda m: F.col("bucket").bitwiseXOR(m)
                )
            ),
        )
    c = (
        corpus.repartition(parallelism)
        .select(
            F.col(corpus_id).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
        .withColumn("cn", _norm(F.col("cv")))
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    return scored.withColumn("rnk", w).filter(F.col("rnk") <= k)
