"""Distributed Lloyd k-means over an embedding column — the clustering
pass of an embedding-space curation pipeline (topic discovery,
cluster-balanced sampling, cluster-pruning à la SemDeDup's first stage).

Spark-first design, same as MLlib's KMeans but DataFrame-native and
deterministic end-to-end:

- the CORPUS never leaves the executors: assignment is a broadcast
  nested probe of the k-row centroid table (k × dim doubles), distance
  is a JVM-side higher-order-function fold, the argmin is a ``min_by``
  aggregation — one map-side-combinable shuffle per iteration;
- only the CENTROIDS visit the driver (k × dim values per iteration —
  the same bounded-collect contract MLlib uses, and the reason each
  iteration's plan starts from literals instead of a lineage that
  re-executes every previous iteration);
- updates are position-exploded partial aggregations (shuffle volume
  k × dim partial sums per task, not rows × dim), decimal-exact sums
  so the new centroids are bit-identical on any engine or partition
  layout (see ``embeddings.label_centroids`` for the observed failure
  mode this prevents).

Determinism contract (what makes an ITERATIVE algorithm exactly
oracle-checkable): init = the k lowest-id vectors; distances rounded to
4 dp with cluster id as tie-break; centroid cells rounded to 4 dp after
the exact-decimal mean. Every quantity either is integer, is rounded
from an exact decimal, or tie-breaks on a rounded value — so a DuckDB
replay of the same fixed number of iterations reproduces the clustering
hash-exactly.

Empty clusters (possible once k approaches the corpus size) drop out of
the centroid table and stay dropped — documented, deterministic, and
identical in the oracle replay.

Reference: no clustering surface in the reference (README.md:43-50) —
beyond-reference training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beavers_spark.functions.sampling import hash_bucket


def _as_double_vec(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return emb.select(
        id_col,
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("vec"),
    )


def _assign(vecs: DataFrame, centroids: DataFrame, id_col: str) -> DataFrame:
    """Nearest-centroid assignment: ``(id_col, cluster, d2)``.

    ``crossJoin(broadcast(centroids))`` is the k-NN-to-k-points shape —
    k rows replicated to every task, corpus scanned once. ``d2`` is the
    squared L2 distance as an in-order fold (both engines fold the
    position list left-to-right, so the doubles agree bit-for-bit),
    rounded to 4 dp; the argmin tie-breaks on cluster id via ``min``
    over a (d2, cluster) struct.
    """
    d2 = F.round(
        F.aggregate(
            F.zip_with(
                F.col("vec"), F.col("cen"), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        4,
    )
    scored = vecs.crossJoin(F.broadcast(centroids)).select(
        id_col, F.struct(d2.alias("d2"), F.col("cluster")).alias("dc")
    )
    best = scored.groupBy(id_col).agg(F.min("dc").alias("dc"))
    return best.select(
        id_col, F.col("dc.cluster").alias("cluster"), F.col("dc.d2").alias("d2")
    )


def kmeans_fit(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit ``iters`` Lloyd iterations from the deterministic init and
    return the final centroid table ``(cluster, cen: array<double>)``.

    Each iteration runs assignment (one broadcast probe + one keyed
    shuffle), recomputes means as decimal-exact position aggregates,
    and collects the k × dim centroid cells to the driver — bounded by
    contract, like MLlib — so iteration N+1's plan starts from literal
    centroids instead of re-executing iterations 1..N.
    """
    vecs = _as_double_vec(emb, id_col, vec_col)
    init_w = Window.orderBy(id_col)
    centroids = (
        vecs.orderBy(id_col)
        .limit(k)
        .select(
            (F.row_number().over(init_w) - 1).alias("cluster"),
            # init centroids get the same 4 dp quantization as updates,
            # so iteration arithmetic sees one centroid precision
            F.transform(F.col("vec"), lambda x: F.round(x, 4)).alias("cen"),
        )
    )
    for _ in range(iters):
        assigned = _assign(vecs, centroids, id_col)
        cells = (
            assigned.join(vecs, id_col)
            .select("cluster", F.posexplode("vec").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.round(
                        F.sum(F.col("v").cast("decimal(27,12)"))
                        .cast("double")
                        / F.count(F.lit(1)),
                        4,
                    )
                    + F.lit(0.0)
                ).alias("m")
            )
        )
        rows = cells.groupBy("cluster").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda x: x["m"],
            ).alias("cen")
        ).collect()
        centroids = spark.createDataFrame(
            [(r["cluster"], r["cen"]) for r in rows],
            "cluster int, cen array<double>",
        )
    return centroids


def kmeans_assign(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit + final assignment: ``(id_col, cluster, d2)`` for every
    vector, against the post-``iters`` centroids."""
    centroids = kmeans_fit(spark, emb, k, iters, id_col, vec_col)
    return _assign(_as_double_vec(emb, id_col, vec_col), centroids, id_col)


def kmeans_centroid_cells(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final centroids as hash-checkable scalar rows ``(cluster, pos,
    m)`` — the flat twin of ``kmeans_fit``'s array form."""
    cents = kmeans_fit(spark, emb, k, iters, id_col, vec_col)
    return cents.select(
        "cluster", F.posexplode("cen").alias("pos", "m")
    )


def cluster_balanced_sample(
    spark: SparkSession,
    emb: DataFrame,
    cap: int,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "kmeans-balance",
) -> DataFrame:
    """At most ``cap`` vectors per k-means cluster, chosen by id-hash
    order — the cluster-balanced diet that stops one dominant mode from
    monopolizing a training mix (the embedding-space analog of
    ``curation.domain_cap``).

    Hash order (not id order) avoids systematically preferring early
    ids; the hash is the engine-portable md5 family so the sample is
    reproducible anywhere. One window shuffle over the assignment.
    Emits ``(id_col, cluster, rk)``.
    """
    assigned = kmeans_assign(spark, emb, k, iters, id_col, vec_col)
    w = Window.partitionBy("cluster").orderBy(
        hash_bucket(F.col(id_col), salt), F.col(id_col)
    )
    return (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= cap)
        .select(id_col, "cluster", "rk")
    )
