"""Behavioral tests for the quality classifier (functions/classifier.py)
— separability, determinism, the decimal-exactness spec vs a pure-Python
model, and the bounded-fit contract. Plan-vs-oracle hash checks live in
the driver gate; these pin the kernel."""

from __future__ import annotations

import hashlib
import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from beavers_spark.functions.classifier import (
    logreg_fit,
    logreg_score,
    quality_select,
)


def _docs(spark, rows):
    """rows: list of (text, y)."""
    return spark.createDataFrame(
        [(i, s, y) for i, (s, y) in enumerate(rows)],
        "doc_id long, text string, y int",
    )


# -- pure-Python replay of the documented math spec ------------------------


def _py_bucket(feat: str, n_buckets: int) -> int:
    h = int(hashlib.md5((feat + "#0").encode()).hexdigest()[:15], 16)
    return h % n_buckets


def _py_features(text: str) -> list[str]:
    tk = [w for w in text.lower().split() if w]
    return tk + [f"{a} {b}" for a, b in zip(tk, tk[1:])]


def _py_round(x: float, nd: int) -> float:
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(x).quantize(q, rounding=ROUND_HALF_UP)) + 0.0


def _py_fit(rows, n_buckets, iters, lr):
    """(text, y) rows -> {bucket: w}; Decimal-exact sums, floats rounded
    exactly as the engine spec says."""
    tf = {}  # (doc, bucket) -> count
    ys = {}
    for d, (text, y) in enumerate(rows):
        ys[d] = y
        for f_ in _py_features(text):
            k = (d, _py_bucket(f_, n_buckets))
            tf[k] = tf.get(k, 0) + 1
    docs = sorted({d for d, _ in tf})
    n = len(docs)
    w = {b: 0.0 for _, b in tf}
    for step in range(iters):
        if step == 0:
            r = {d: _py_round(0.5 - ys[d], 9) for d in docs}
        else:
            m = {d: Decimal(0) for d in docs}
            for (d, b), c in tf.items():
                m[d] += Decimal(repr(w[b])) * c
            r = {
                d: _py_round(
                    1.0 / (1.0 + math.exp(-float(m[d]))) - ys[d], 9
                )
                for d in docs
            }
        s = {b: Decimal(0) for b in w}
        for (d, b), c in tf.items():
            s[b] += Decimal(repr(r[d])) * c
        w = {
            b: _py_round(w[b] - lr * float(s[b]) / n, 6) for b in w
        }
    return w


def test_matches_pure_python_spec(spark):
    rows = [
        ("the curated encyclopedia prose reads well", 1),
        ("curated prose with careful citations", 1),
        ("zz94 qqx7 blob9 spam spam buy now", 0),
        ("buy now qqx7 zz94 lottery blob9", 0),
        ("prose citations and a little spam", 1),
    ]
    df = _docs(spark, rows)
    got = {
        r.bucket: r.w
        for r in logreg_fit(
            spark, df, "y", n_buckets=128, iters=2, lr=0.5
        ).collect()
    }
    want = _py_fit(rows, n_buckets=128, iters=2, lr=0.5)
    assert got == want


def test_separates_and_ranks(spark):
    pos = [(f"quality prose citation facts v{i}", 1) for i in range(6)]
    neg = [(f"spamword{i} lottery buy clicks", 0) for i in range(6)]
    df = _docs(spark, pos + neg)
    w = logreg_fit(spark, df, "y", n_buckets=512, iters=2, lr=0.5)
    scored = {r.doc_id: r.prob for r in logreg_score(df, w, n_buckets=512).collect()}
    # every positive-class doc outscores every negative-class doc
    assert min(scored[d] for d in range(6)) > max(
        scored[d] for d in range(6, 12)
    )
    top = quality_select(df, w, n=6, n_buckets=512).collect()
    assert {r.doc_id for r in top} == set(range(6))
    # probs come back sorted descending
    probs = [r.prob for r in top]
    assert probs == sorted(probs, reverse=True)


def test_fit_is_deterministic(spark):
    rows = [(f"token{i % 5} filler words here", i % 2) for i in range(20)]
    df = _docs(spark, rows)
    a = sorted(
        logreg_fit(spark, df, "y", n_buckets=64, iters=2).collect()
    )
    b = sorted(
        logreg_fit(spark, df, "y", n_buckets=64, iters=2).collect()
    )
    assert a == b


def test_empty_pool_yields_empty_model(spark):
    df = spark.createDataFrame([], "doc_id long, text string, y int")
    w = logreg_fit(spark, df, "y", n_buckets=64)
    assert w.count() == 0


def test_featureless_docs_drop_from_scores(spark):
    df = _docs(spark, [("real words", 1), ("   ", 0)])
    w = logreg_fit(spark, df, "y", n_buckets=64)
    out = logreg_score(df, w, n_buckets=64).collect()
    assert [r.doc_id for r in out] == [0]


def test_score_plan_broadcasts_the_model(spark):
    df = _docs(spark, [(f"some words {i}", i % 2) for i in range(8)])
    w = logreg_fit(spark, df, "y", n_buckets=64)
    plan = (
        logreg_score(df, w, n_buckets=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
