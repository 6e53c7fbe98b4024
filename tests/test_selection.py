"""Behavioral tests for the data-selection tier (functions/dsir.py,
functions/kmeans.py) — crafted corpora exercising the semantics the
synthetic fixtures can't (disjoint vocabularies, separated blobs, empty
clusters). Plan-vs-oracle hash checks live in the driver gate; these
pin the kernels."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beavers_spark.functions.dsir import (
    dsir_logweights,
    dsir_select,
    hashed_ngram_features,
)
from beavers_spark.functions.kmeans import (
    cluster_balanced_sample,
    kmeans_assign,
    kmeans_fit,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(rows)], "doc_id long, text string"
    )


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rows)],
        "vec_id long, embedding array<float>",
    )


# ---------------------------------------------------------------------------
# DSIR
# ---------------------------------------------------------------------------


def test_hashed_ngram_features_unigrams_plus_bigrams(spark):
    df = _docs(spark, ["a b c", "solo", "   "])
    out = (
        hashed_ngram_features(df, "text", "doc_id", 64)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    counts = {r.doc_id: r["count"] for r in out}
    # "a b c": 3 unigrams + 2 bigrams; "solo": 1 unigram, no bigram;
    # whitespace-only: no feature rows at all (doc drops out).
    assert counts == {0: 5, 1: 1}


def test_dsir_weights_zero_when_target_equals_pool(spark):
    df = _docs(spark, ["alpha beta gamma", "delta epsilon", "alpha delta"])
    out = dsir_logweights(df, df, "text", "doc_id", n_buckets=64).collect()
    assert len(out) == 3
    assert all(abs(r.logw) < 1e-9 for r in out)


def test_dsir_prefers_target_like_docs(spark):
    # Target speaks "wiki"; the pool has one wiki-like doc and one
    # junk-vocabulary doc of the same length.
    target = _docs(
        spark, ["wiki facts prose wiki", "facts prose citation wiki"]
    )
    pool = spark.createDataFrame(
        [
            (100, "wiki facts prose citation"),
            (101, "zz94 qqx7 blob9 vv22"),
        ],
        "doc_id long, text string",
    )
    w = {
        r.doc_id: r.logw
        for r in dsir_logweights(
            pool, target, "text", "doc_id", n_buckets=512
        ).collect()
    }
    assert w[100] > w[101]


def test_dsir_select_deterministic_top_n(spark):
    docs = _docs(spark, [f"token{i} filler common words" for i in range(20)])
    target = docs.filter(F.col("doc_id") < 5)
    a = dsir_select(docs, target, "text", "doc_id", n=7, n_buckets=256)
    b = dsir_select(docs, target, "text", "doc_id", n=7, n_buckets=256)
    ra, rb = a.collect(), b.collect()
    assert [r.doc_id for r in ra] == [r.doc_id for r in rb]
    assert len(ra) == 7
    # keys are sorted descending and rows come from the pool
    keys = [r.sel_key for r in ra]
    assert keys == sorted(keys, reverse=True)
    assert {r.doc_id for r in ra} <= set(range(20))


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans_separates_two_blobs(spark):
    blob_a = [[0.0 + d, 0.0] for d in (0.0, 0.1, 0.2)]
    blob_b = [[10.0 + d, 10.0] for d in (0.0, 0.1, 0.2)]
    emb = _vecs(spark, blob_a + blob_b)
    out = kmeans_assign(spark, emb, k=2, iters=2).collect()
    by_id = {r.vec_id: r.cluster for r in sorted(out, key=lambda r: r.vec_id)}
    assert len({by_id[0], by_id[1], by_id[2]}) == 1
    assert len({by_id[3], by_id[4], by_id[5]}) == 1
    assert by_id[0] != by_id[3]
    # centroids land on the blob means (exact: decimal sums, 4 dp round)
    cents = {
        r.cluster: r.cen
        for r in kmeans_fit(spark, emb, k=2, iters=2).collect()
    }
    assert cents[by_id[0]] == [0.1, 0.0]
    assert cents[by_id[3]] == [10.1, 10.0]


def test_kmeans_assign_is_deterministic(spark):
    emb = _vecs(
        spark, [[float(i % 7), float((i * 3) % 5)] for i in range(30)]
    )
    a = sorted(
        kmeans_assign(spark, emb, k=3, iters=2).collect(),
        key=lambda r: r.vec_id,
    )
    b = sorted(
        kmeans_assign(spark, emb, k=3, iters=2).collect(),
        key=lambda r: r.vec_id,
    )
    assert [(r.vec_id, r.cluster, r.d2) for r in a] == [
        (r.vec_id, r.cluster, r.d2) for r in b
    ]


def test_kmeans_empty_cluster_drops_out(spark):
    # init takes the 3 lowest ids: two identical points seed clusters 0
    # and 1; every vector ties to the lower cluster id, so cluster 1
    # empties after the first update and stays gone.
    emb = _vecs(spark, [[0.0, 0.0], [0.0, 0.0], [9.0, 9.0], [9.0, 9.1]])
    cents = kmeans_fit(spark, emb, k=3, iters=2).collect()
    assert sorted(r.cluster for r in cents) == [0, 2]
    out = kmeans_assign(spark, emb, k=3, iters=2).collect()
    assert {r.cluster for r in out} == {0, 2}


def test_cluster_balanced_sample_caps_each_cluster(spark):
    blob_a = [[0.0, float(i) / 100] for i in range(6)]
    blob_b = [[50.0, float(i) / 100] for i in range(2)]
    emb = _vecs(spark, blob_a + blob_b)
    out = cluster_balanced_sample(spark, emb, cap=3, k=2, iters=2).collect()
    sizes = {}
    for r in out:
        sizes[r.cluster] = sizes.get(r.cluster, 0) + 1
        assert 1 <= r.rk <= 3
    # big blob capped at 3, small blob keeps both members
    assert sorted(sizes.values()) == [2, 3]


def test_dsir_empty_target_uses_uniform_floor(spark):
    # review r6: an empty target model made t_tot an EMPTY frame whose
    # cross join silently annihilated every scored row
    docs = _docs(spark, ["alpha beta", "gamma delta", "alpha gamma"])
    empty_target = docs.filter(F.col("doc_id") < 0)
    out = dsir_logweights(
        docs, empty_target, "text", "doc_id", n_buckets=64
    ).collect()
    assert len(out) == 3  # every doc still scored
    # uniform target floor vs the fitted raw model: weights are finite
    assert all(r.logw == r.logw and abs(r.logw) < 1e6 for r in out)
