"""IncrementalClusters: live connected-component labels over a pair
stream must equal the batch operator over the union of all pairs, for
ANY split of the stream into batches — including batches that merge
existing clusters and batches that introduce a new minimum id.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.dedup import (
    connected_components,
    minhash_lsh_pairs,
)
from beavers_spark.plans.common import t
from beavers_spark.streaming import IncrementalClusters

SF_DIR = "/root/testdata/sf0.001"


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc1 long, doc2 long")


def _labels(df):
    return sorted((r["doc_id"], r["cluster_id"]) for r in df.collect())


def test_merge_and_new_minimum_across_batches(spark, tmp_path):
    clusters = IncrementalClusters(str(tmp_path / "state"), n_buckets=8)
    # wave 0: two separate clusters {1,2} and {5,6}
    clusters(_pairs(spark, [(1, 2), (5, 6)]), 0)
    assert _labels(clusters.read_clusters(spark)) == [
        (1, 1), (2, 1), (5, 5), (6, 5),
    ]
    # wave 1: an edge between them merges everything into label 1,
    # including members (2, 6) that do NOT appear in the new pair
    clusters(_pairs(spark, [(2, 6)]), 1)
    assert _labels(clusters.read_clusters(spark)) == [
        (1, 1), (2, 1), (5, 1), (6, 1),
    ]
    # wave 2: a new doc with a smaller id becomes the representative of
    # the whole merged cluster — every member relabels
    clusters(_pairs(spark, [(0, 5)]), 2)
    assert _labels(clusters.read_clusters(spark)) == [
        (0, 0), (1, 0), (2, 0), (5, 0), (6, 0),
    ]
    # disjoint late cluster unaffected
    clusters(_pairs(spark, [(10, 11)]), 3)
    labels = dict(_labels(clusters.read_clusters(spark)))
    assert labels[10] == 10 and labels[11] == 10 and labels[2] == 0


def test_incremental_equals_batch_on_minhash_pairs(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    all_pairs = (
        minhash_lsh_pairs(docs, "text", "doc_id", threshold=0.3)
        .select("doc1", "doc2")
        .localCheckpoint()
    )
    assert all_pairs.count() > 0
    clusters = IncrementalClusters(str(tmp_path / "state"), n_buckets=8)
    # stream the SAME pair set in three arbitrary slices
    for wave in range(3):
        clusters(all_pairs.filter(F.pmod("doc1", F.lit(3)) == wave), wave)
    expected = _labels(connected_components(all_pairs))
    assert _labels(clusters.read_clusters(spark)) == expected


def test_distributed_fallback_matches_local(spark, tmp_path):
    # force the capped fallback: every batch takes the distributed
    # connected_components path instead of driver-side union-find
    a = IncrementalClusters(str(tmp_path / "a"), n_buckets=4)
    b = IncrementalClusters(str(tmp_path / "b"), n_buckets=4)
    b.MAX_LOCAL_EDGES = 0
    waves = [[(1, 2), (5, 6)], [(2, 6)], [(0, 5), (8, 9)]]
    for i, w in enumerate(waves):
        a(_pairs(spark, w), i)
        b(_pairs(spark, w), i)
    assert _labels(a.read_clusters(spark)) == _labels(b.read_clusters(spark))


def test_replayed_batch_is_skipped(spark, tmp_path):
    clusters = IncrementalClusters(str(tmp_path / "state"), n_buckets=4)
    clusters(_pairs(spark, [(1, 2)]), 0)
    before = _labels(clusters.read_clusters(spark))
    clusters(_pairs(spark, [(7, 8)]), 0)  # same batch id: replay, skipped
    assert _labels(clusters.read_clusters(spark)) == before
    clusters(_pairs(spark, []), 1)  # empty batch: no-op
    assert _labels(clusters.read_clusters(spark)) == before
