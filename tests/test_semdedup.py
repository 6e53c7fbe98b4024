"""semantic_dedup: SemDeDup-style cluster-then-dedup over embeddings.

Pins the keep policy (lowest centroid similarity wins, ties to lowest
id), determinism across runs, and the structural invariants the
driver-visible gate (semantic_dedup_check) enforces.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.semdedup import semantic_dedup, semantic_dedup_check
from beavers_spark.plans.common import t

SF_DIR = "/root/testdata/sf0.001"


def _toy(spark):
    # two tight duplicate pairs on orthogonal axes + two singletons;
    # vectors are 4-d so the quantizer (n_cells=2) splits the axes
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.999, 0.01, 0.0]),   # dup of 3
        (5, [0.5, 0.5, 0.5, 0.5]),      # singleton
        (6, [0.0, 0.0, 0.0, -1.0]),     # singleton
    ]
    return spark.createDataFrame(rows, "vec_id int, embedding array<double>")


def test_duplicate_groups_and_singletons(spark):
    out = semantic_dedup(
        _toy(spark), "vec_id", "embedding", n_cells=2, threshold=0.95
    ).collect()
    by_id = {r["vec_id"]: r for r in out}
    assert len(by_id) == 6
    # the two tight pairs form groups; exactly one member of each kept
    assert by_id[1]["cluster_id"] is not None
    assert by_id[1]["cluster_id"] == by_id[2]["cluster_id"]
    assert by_id[3]["cluster_id"] == by_id[4]["cluster_id"]
    assert by_id[1]["keep"] != by_id[2]["keep"]
    assert by_id[3]["keep"] != by_id[4]["keep"]
    # singletons have no group and are always kept
    assert by_id[5]["cluster_id"] is None and by_id[5]["keep"]
    assert by_id[6]["cluster_id"] is None and by_id[6]["keep"]
    # keep policy: the kept member has the LOWER centroid similarity
    for g in [(1, 2), (3, 4)]:
        kept = next(i for i in g if by_id[i]["keep"])
        dropped = next(i for i in g if not by_id[i]["keep"])
        assert (
            by_id[kept]["centroid_sim"],
            kept,
        ) <= (by_id[dropped]["centroid_sim"], dropped)


def test_deterministic_across_runs(spark):
    emb = t(spark, SF_DIR, "embeddings")
    args = dict(n_cells=8, threshold=0.3)
    one = sorted(map(tuple, semantic_dedup(emb, **args).collect()))
    two = sorted(map(tuple, semantic_dedup(emb, **args).collect()))
    assert one == two and len(one) > 0


def test_check_gate_passes_on_testdata(spark):
    emb = t(spark, SF_DIR, "embeddings")
    [row] = semantic_dedup_check(
        emb, "vec_id", "embedding", n_cells=8, threshold=0.3
    ).collect()
    assert row["metric"] == "semantic_dedup_invariants"
    assert row["passed"] is True


def test_drop_fraction_sane(spark):
    emb = t(spark, SF_DIR, "embeddings")
    out = semantic_dedup(emb, "vec_id", "embedding", n_cells=8, threshold=0.3)
    total = out.count()
    kept = out.filter(F.col("keep")).count()
    # something must drop at threshold 0.3 on this (heavily self-similar
    # synthetic) corpus, and every group keeps exactly one member — so
    # drops = Σ(|group| - 1), strictly between 0 and the corpus size
    assert 0 < total - kept < total
    grouped = out.filter(F.col("cluster_id").isNotNull())
    n_groups = grouped.select("cluster_id").distinct().count()
    assert total - kept == grouped.count() - n_groups
