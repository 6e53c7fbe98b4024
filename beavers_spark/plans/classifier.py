"""Quality-classifier plans: fastText-style hashed logistic regression
(fit, per-doc scoring, top-n selection) with a DuckDB oracle that
replays the SAME two fixed gradient-descent iterations.

The oracle is exact for the same reason the k-means one is: w0 = 0
makes iteration 1 closed-form (every margin is exactly 0, p = 0.5);
every weight is quantized to 6 dp after each update; margins are
decimal-exact sums of (6 dp weight × integer count); residuals round
to 9 dp before the decimal-exact gradient sum. No reduce ever sums
raw floats.

Reference: no model-training surface in the reference (README.md:43-50)
— beyond-reference tier, conventions of plans/selection.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.classifier import (
    _doc_tf,
    logreg_fit_from_counts,
    logreg_score_from_counts,
)
from beavers_spark.plans.common import t
from beavers_spark.plans.llmops import _SQL_TOKS, _sql_hash64
from beavers_spark.plans.registry import query
from beavers_spark.plans.selection import _SQL_TGT, _TARGET_SOURCES

_N_BUCKETS = 4096
_ITERS = 2
_LR = 0.5

#: shared replay chain: features -> per-doc counts -> labels -> two GD
#: steps. ``w1`` is the closed-form first step (w0 = 0 ⇒ r = 0.5 - y);
#: ``w2`` is the second step off the decimal-exact margins under w1.
_SQL_GD_CHAIN = f"""
toks AS (SELECT doc_id, source, {_SQL_TOKS} AS tk FROM documents),
feats AS (
    SELECT doc_id,
           unnest(list_concat(tk,
               CASE WHEN len(tk) >= 2
                   THEN list_transform(generate_series(1, len(tk) - 1),
                        i -> tk[i] || ' ' || tk[i+1])
                   ELSE [] END)) AS feat
    FROM toks
),
tf AS (
    SELECT doc_id, {_sql_hash64('feat', 0)} % {_N_BUCKETS} AS bucket,
           count(*) AS tf
    FROM feats GROUP BY 1, 2
),
lab AS (
    SELECT doc_id,
           CASE WHEN source IN {_SQL_TGT} THEN 1 ELSE 0 END AS y
    FROM documents
),
nn AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
s1 AS (
    SELECT tf.bucket,
           sum(CAST(round(0.5 - lab.y, 9) AS DECIMAL(20,9)) * tf.tf) AS s
    FROM tf JOIN lab USING (doc_id) GROUP BY 1
),
w1 AS (
    SELECT bucket, round(0.0 - {_LR} * (s::DOUBLE) / nn.n, 6) + 0.0 AS w
    FROM s1, nn
),
m2 AS (
    SELECT tf.doc_id,
           round(sum(CAST(w1.w AS DECIMAL(18,6)) * tf.tf)::DOUBLE, 6) AS m
    FROM tf JOIN w1 USING (bucket) GROUP BY 1
),
r2 AS (
    SELECT m2.doc_id,
           round(1.0 / (1.0 + exp(-m2.m)) - lab.y, 9) AS r
    FROM m2 JOIN lab USING (doc_id)
),
s2 AS (
    SELECT tf.bucket, sum(CAST(r2.r AS DECIMAL(20,9)) * tf.tf) AS s
    FROM tf JOIN r2 USING (doc_id) GROUP BY 1
),
w2 AS (
    SELECT w1.bucket,
           round(w1.w - {_LR} * (s2.s::DOUBLE) / nn.n, 6) + 0.0 AS w
    FROM w1 JOIN s2 USING (bucket), nn
),
score AS (
    SELECT tf.doc_id,
           round(sum(CAST(w2.w AS DECIMAL(18,6)) * tf.tf)::DOUBLE, 6)
               + 0.0 AS margin
    FROM tf JOIN w2 USING (bucket) GROUP BY 1
)
"""


def _fit(spark, sf_dir):
    """Featurize ONCE (checkpointed), fit, and hand the same counts to
    the caller — scoring plans must not pay the explode+md5 feature
    pass a second time."""
    docs = t(spark, sf_dir, "documents")
    labels = docs.select(
        "doc_id",
        F.col("source").isin(*_TARGET_SOURCES).cast("int").alias("y"),
    )
    doc_tf = _doc_tf(docs, "text", "doc_id", _N_BUCKETS).localCheckpoint(
        eager=False
    )
    w = logreg_fit_from_counts(
        spark, doc_tf, labels, iters=_ITERS, lr=_LR
    )
    return doc_tf, w


@query(
    "quality_classifier_weights",
    oracle=f"""
    WITH {_SQL_GD_CHAIN}
    SELECT bucket, w FROM w2
    """,
)
def quality_classifier_weights_q(spark, sf_dir):
    """Trained hashed-LR weights after 2 full-batch GD steps (positive
    class = the clean sources). The plan is a literal scan of the
    driver-held model — ≤ n_buckets rows by contract, like
    kmeans_centroids; training ran as bounded per-iteration jobs."""
    _, w = _fit(spark, sf_dir)
    return w


@query(
    "quality_classifier_score",
    oracle=f"""
    WITH {_SQL_GD_CHAIN}
    SELECT doc_id, margin, round(1.0 / (1.0 + exp(-margin)), 6) AS prob
    FROM score
    """,
)
def quality_classifier_score_q(spark, sf_dir):
    """Every pool document scored under the trained classifier: ONE
    feature pass (shared with the fit via the checkpoint) + one
    ≤n_buckets-row broadcast join — the plan that runs over the full
    100 TB pool after fitting on a sample."""
    doc_tf, w = _fit(spark, sf_dir)
    return logreg_score_from_counts(doc_tf, w)


@query(
    "quality_classifier_select",
    oracle=f"""
    WITH {_SQL_GD_CHAIN}
    SELECT doc_id, round(1.0 / (1.0 + exp(-margin)), 6) AS prob
    FROM score
    ORDER BY prob DESC, doc_id LIMIT 100
    """,
)
def quality_classifier_select_q(spark, sf_dir):
    """Top-100 documents by classifier probability — the selection cut.
    Global top-k executes as TakeOrderedAndProject (per-partition
    heaps), id tie-break on the rounded prob."""
    doc_tf, w = _fit(spark, sf_dir)
    scored = logreg_score_from_counts(doc_tf, w)
    return (
        scored.orderBy(F.desc("prob"), F.asc("doc_id"))
        .limit(100)
        .select("doc_id", "prob")
    )


@query(
    "quality_threshold_by_source",
    oracle=f"""
    WITH {_SQL_GD_CHAIN},
    probs AS (
        SELECT s.doc_id, d.source,
               round(1.0 / (1.0 + exp(-s.margin)), 6) AS prob
        FROM score s JOIN documents d USING (doc_id)
    ),
    thr AS (
        SELECT source, round(quantile_cont(prob, 0.75), 6) AS thr
        FROM probs GROUP BY 1
    )
    SELECT p.doc_id, p.source, p.prob, t.thr
    FROM probs p JOIN thr t USING (source)
    WHERE p.prob > t.thr
    """,
)
def quality_threshold_by_source_q(spark, sf_dir):
    """ADAPTIVE per-source quality gate: keep documents above their own
    source's P75 classifier score — a fixed global threshold would
    empty low-quality sources entirely and keep all of high-quality
    ones; a per-source quantile keeps the best slice of each. The
    thresholds collapse to |sources| rows (exact interpolated
    percentile, map-side combinable) and broadcast back; one corpus
    id-join attaches sources to scores."""
    doc_tf, w = _fit(spark, sf_dir)
    scored = logreg_score_from_counts(doc_tf, w)
    src = t(spark, sf_dir, "documents").select("doc_id", "source")
    probs = scored.join(src, "doc_id").select("doc_id", "source", "prob")
    thr = probs.groupBy("source").agg(
        F.round(F.percentile("prob", 0.75), 6).alias("thr")
    )
    return probs.join(F.broadcast(thr), "source").filter(
        F.col("prob") > F.col("thr")
    ).select("doc_id", "source", "prob", "thr")
