"""Semantic deduplication: cluster-then-dedup-within-cluster over an
embedding column — the SemDeDup recipe (Abbas et al. 2023,
arXiv:2303.09540) expressed Spark-first.

Where MinHash/SimHash catch *lexical* near-duplicates and
``lsh_near_dup_pairs`` catches *any* high-cosine pair, SemDeDup targets
web-scale *semantic* redundancy: k-means the corpus into cells, compare
pairs ONLY within a cell, and keep one representative per duplicate
group. The pairwise stage is an equi-join on the cell id, so compare
volume is Σ|cell|² — dialed by ``n_cells`` (the paper runs 50k clusters
on LAION; cells stay small and the join never degenerates into a cross
product).

Keep policy follows the paper: within each duplicate group, keep the
member with the LOWEST cosine similarity to its cluster centroid (the
most "marginal" example preserves diversity), ties to the lowest id.

Scale shape:

- quantizer: seeded driver-side Lloyd's on a bounded sample
  (``vectorized.train_quantizer``) — O(sample), never O(corpus);
- assignment: one Arrow-vectorized numpy pass (``best_cells``), narrow;
- centroid similarity: n_cells × dim table broadcast into the scan;
- candidate pairs: self equi-join on cell (shuffle keyed on cell);
- duplicate groups: ``connected_components`` (iterations ≈ group
  diameter, shallow for near-dup graphs);
- keeper election: one window over cluster_id.

Reference parity: no embedding surface in the reference (README.md:43-50)
— beyond-reference LLM-data-pipeline tier, sibling of
``functions/dedup.py`` (lexical) and ``functions/similarity.py`` (search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from beavers_spark.functions.dedup import connected_components
from beavers_spark.functions.similarity import cosine_sim
from beavers_spark.functions.vectorized import best_cells, train_quantizer


def semantic_dedup(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.95,
    seed: int = 7,
) -> DataFrame:
    """Per-vector semantic-dedup verdicts:
    ``(id, cell, cluster_id, centroid_sim, keep)``.

    ``cluster_id`` is null for vectors with no within-cell duplicate
    (always kept); duplicate groups keep exactly one member (lowest
    ``centroid_sim``, ties to lowest id). Deterministic for a given seed:
    the quantizer, assignment argsort, rounded similarities, component
    labels, and the keeper window are all order-stable.
    """
    spark = emb.sparkSession
    parallelism = spark.sparkContext.defaultParallelism
    centroids = train_quantizer(emb, vec_col, n_cells, seed=seed)
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    # assignment + own-centroid similarity in one narrow pass; the
    # repartition spreads the (CPU-heavy) HOF cosine folds — a single
    # parquet file would otherwise scan as one partition. Materialized
    # once (eager localCheckpoint): three consumers (both pair sides +
    # the verdict join) reuse the checkpointed blocks, which the
    # ContextCleaner releases when the returned plan is GC'd — unlike a
    # .persist(), which would leak a CacheManager entry for session
    # lifetime (no caller ever holds a handle to unpersist).
    assigned = (
        emb.repartition(parallelism)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("cell", F.element_at(best_cells(F.col("v"), centroids, 1), 1))
        .join(F.broadcast(cent_df), "cell")
        .withColumn(
            "centroid_sim",
            F.round(cosine_sim(F.col("v"), F.col("centroid")), 6),
        )
        .drop("centroid")
        .localCheckpoint()
    )
    a = assigned.select(
        F.col("cell"), F.col("id").alias("doc1"), F.col("v").alias("v1")
    )
    b = assigned.select(
        F.col("cell"), F.col("id").alias("doc2"), F.col("v").alias("v2")
    )
    # within-cell candidate pairs: equi-join keyed on cell, never a
    # cross join; the id inequality canonicalizes pair order
    edges = (
        a.join(b, "cell")
        .filter(F.col("doc1") < F.col("doc2"))
        .withColumn(
            "sim", F.round(cosine_sim(F.col("v1"), F.col("v2")), 6)
        )
        .filter(F.col("sim") >= threshold)
        .select("doc1", "doc2")
    )
    groups = connected_components(edges)
    joined = assigned.join(groups, assigned.id == groups.doc_id, "left").drop(
        "doc_id", "v"
    )
    # keeper election runs ONLY over grouped rows: a window partitioned
    # by cluster_id would lump every singleton (NULL key — typically most
    # of the corpus) into one partition on one task, a straggler/OOM at
    # scale even though the singleton result is discarded
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("centroid_sim").asc(), F.col("id").asc()
    )
    grouped = joined.filter(F.col("cluster_id").isNotNull()).withColumn(
        "keep", F.row_number().over(w) == 1
    )
    singles = joined.filter(F.col("cluster_id").isNull()).withColumn(
        "keep", F.lit(True)
    )
    return grouped.unionByName(singles).select(
        F.col("id").alias(id_col), "cell", "cluster_id", "centroid_sim", "keep"
    )


def semantic_dedup_check(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    threshold: float = 0.95,
    seed: int = 7,
    require_drop: bool = False,
) -> DataFrame:
    """Structural gate over ``semantic_dedup``, emitted as
    ``(metric, passed)`` so the driver's hash compare enforces it:

    - every duplicate group elects exactly ONE keeper;
    - every duplicate group has >= 2 members;
    - singletons (null ``cluster_id``) are all kept;
    - verdicts partition the corpus (|keep| + |drop| = |corpus|).

    ``require_drop=True`` additionally demands at least one duplicate
    was dropped — a property of a KNOWN-redundant corpus (the registered
    plan sets it for the self-similar testdata), not a generic
    invariant: a genuinely clean corpus passes the four invariants with
    zero drops.
    """
    verdicts = semantic_dedup(
        emb, id_col, vec_col, n_cells=n_cells, threshold=threshold, seed=seed
    )
    per_group = (
        verdicts.filter(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("keep").cast("int")).alias("n_keep"),
        )
        .agg(
            F.coalesce(F.max((F.col("n_keep") != 1).cast("int")), F.lit(0)).alias(
                "bad_keepers"
            ),
            F.coalesce(F.max((F.col("n") < 2).cast("int")), F.lit(0)).alias(
                "bad_groups"
            ),
        )
    )
    totals = verdicts.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.col("keep").cast("int")).alias("n_keep"),
        F.sum(
            (F.col("cluster_id").isNull() & ~F.col("keep")).cast("int")
        ).alias("dropped_singletons"),
    )
    ok = (
        (F.col("bad_keepers") == 0)
        & (F.col("bad_groups") == 0)
        & (F.col("dropped_singletons") == 0)
    )
    if require_drop:
        ok = ok & (F.col("n_total") > F.col("n_keep"))
    return per_group.crossJoin(totals).select(
        F.lit("semantic_dedup_invariants").alias("metric"),
        ok.alias("passed"),
    )
