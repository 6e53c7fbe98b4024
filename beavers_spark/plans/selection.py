"""Data-selection and clustering plans: DSIR importance resampling and
deterministic Lloyd k-means (assignment, centroids, cluster-balanced
sampling).

These are the "choose what to train on" stage of an LLM data pipeline:
DSIR scores the raw pool against a target distribution; k-means gives
the embedding-space partition that balanced sampling and cluster
pruning act on. Both are exactly oracle-checkable — DSIR because the
Gumbel noise is an id-hash function, k-means because every iteration
quantizes to engine-identical values (see functions/kmeans.py).

Reference: no selection/clustering surface in the reference
(README.md:43-50) — beyond-reference tier, conventions of
plans/llmops.py (identical aliases both sides, doubles rounded, ties
broken on rounded values).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.dsir import dsir_logweights, dsir_select
from beavers_spark.functions.kmeans import (
    cluster_balanced_sample,
    kmeans_assign,
    kmeans_centroid_cells,
)
from beavers_spark.plans.common import t
from beavers_spark.plans.llmops import _SQL_TOKS, _sql_hash64
from beavers_spark.plans.registry import query

# --------------------------------------------------------------------------
# DSIR importance resampling
# --------------------------------------------------------------------------

#: The "clean reference corpus" role in the test fixtures: three of the
#: twenty sources. At 100 TB this is Wikipedia/books vs the crawl.
_TARGET_SOURCES = ("src0", "src1", "src2")
_N_BUCKETS = 4096

_SQL_TGT = "('" + "', '".join(_TARGET_SOURCES) + "')"

# Hashed unigram+bigram feature buckets of every document, with source
# carried through for the target-side filter.
_SQL_DSIR_BUCKETS = f"""
toks AS (SELECT doc_id, source, {_SQL_TOKS} AS tk FROM documents),
feats AS (
    SELECT doc_id, source,
           unnest(list_concat(tk,
               CASE WHEN len(tk) >= 2
                   THEN list_transform(generate_series(1, len(tk) - 1),
                        i -> tk[i] || ' ' || tk[i+1])
                   ELSE [] END)) AS feat
    FROM toks
),
fb AS (
    SELECT doc_id, source,
           {_sql_hash64('feat', 0)} % {_N_BUCKETS} AS bucket
    FROM feats
),
tc AS (
    SELECT bucket, count(*) AS c FROM fb
    WHERE source IN {_SQL_TGT} GROUP BY 1
),
tt AS (SELECT sum(c) AS t FROM tc),
qc AS (SELECT bucket, count(*) AS c FROM fb GROUP BY 1),
qt AS (SELECT sum(c) AS t FROM qc),
tf AS (SELECT doc_id, bucket, count(*) AS tf FROM fb GROUP BY 1, 2),
scored AS (
    SELECT f.doc_id, f.tf,
           coalesce(ln((tc.c + 1.0) / (tt.t + {_N_BUCKETS}.0)),
                    ln(1.0 / (tt.t + {_N_BUCKETS}.0)))
         - coalesce(ln((qc.c + 1.0) / (qt.t + {_N_BUCKETS}.0)),
                    ln(1.0 / (qt.t + {_N_BUCKETS}.0))) AS ratio
    FROM tf f LEFT JOIN tc USING (bucket) LEFT JOIN qc USING (bucket),
         tt, qt
),
w AS (
    SELECT doc_id,
           round(sum(CAST(round(tf * ratio, 9) AS DECIMAL(27,9)))::DOUBLE,
                 6) AS logw,
           sum(tf)::BIGINT AS n_feats
    FROM scored GROUP BY doc_id
)
"""


@query(
    "dsir_logweights",
    oracle=f"""
    WITH {_SQL_DSIR_BUCKETS}
    SELECT doc_id, logw, n_feats FROM w
    """,
)
def dsir_logweights_q(spark, sf_dir):
    """DSIR importance log-weights for the whole pool against the
    clean-source target model. Two fixed-size hashed-n-gram model fits
    (each ≤ 4096 rows — broadcast probes at any corpus size), one
    doc-bucket count shuffle, one doc-keyed reduce."""
    docs = t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin(*_TARGET_SOURCES))
    # target_pred: the target model's counts ride the pool's ONE
    # feature pass (ReuseExchange) — no second explode+md5 over the
    # target slice; weights identical (r13, oracle re-verified)
    return dsir_logweights(
        docs, target, "text", "doc_id", n_buckets=_N_BUCKETS, alpha=1.0,
        target_pred=F.col("source").isin(*_TARGET_SOURCES),
    )


@query(
    "dsir_select",
    oracle=f"""
    WITH {_SQL_DSIR_BUCKETS},
    keyed AS (
        SELECT doc_id, logw,
               round(logw - ln(-ln(
                   (({_sql_hash64("doc_id::VARCHAR || '|gumbel'", 0)})::DOUBLE
                    + 0.5) / 1152921504606846976.0)), 6) AS sel_key
        FROM w
    )
    SELECT doc_id, logw, sel_key FROM keyed
    ORDER BY sel_key DESC, doc_id LIMIT 100
    """,
)
def dsir_select_q(spark, sf_dir):
    """End-to-end DSIR selection: Gumbel-top-100 over the importance
    weights — sampling-without-replacement proportional to exp(logw),
    reproducible because the Gumbel uniform is the id hash. The global
    top-k runs as TakeOrderedAndProject (per-partition heaps)."""
    docs = t(spark, sf_dir, "documents")
    target = docs.filter(F.col("source").isin(*_TARGET_SOURCES))
    # target_pred: one feature pass for both models (see dsir_logweights)
    return dsir_select(
        docs, target, "text", "doc_id", n=100,
        n_buckets=_N_BUCKETS, alpha=1.0,
        target_pred=F.col("source").isin(*_TARGET_SOURCES),
    )


# --------------------------------------------------------------------------
# Deterministic Lloyd k-means (k=8, iters=2) — the oracle replays the
# SAME fixed iterations in SQL: init from the 8 lowest vec_ids, in-order
# list_reduce distance fold (bit-identical to Spark's F.aggregate),
# decimal-exact means, everything quantized to 4 dp.
# --------------------------------------------------------------------------

_K = 8
_ITERS = 2

_SQL_KM_VECS = """
vecs AS (
    SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS vec
    FROM embeddings
),
cen0 AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster,
           list_transform(vec, x -> round(x, 4)) AS cen
    FROM (SELECT * FROM vecs ORDER BY vec_id LIMIT 8)
)
"""


def _sql_km_assign(step: int, cen: str) -> str:
    """Assignment CTE pair: distances to ``cen``, then per-vector argmin
    with cluster-id tie-break on the ROUNDED distance."""
    return f"""
d{step} AS (
    SELECT v.vec_id, c.cluster,
           round(list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(1, len(v.vec)),
                   i -> (v.vec[i] - c.cen[i]) * (v.vec[i] - c.cen[i]))),
               (a, b) -> a + b), 4) AS d2
    FROM vecs v, {cen} c
),
a{step} AS (
    SELECT vec_id, cluster, d2 FROM (
        SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY d2, cluster) AS rn
        FROM d{step}
    ) WHERE rn = 1
)
"""


def _sql_km_update(step: int) -> str:
    """Mean-update CTE pair from assignment ``a{step}``: decimal-exact
    position sums, one division, 4 dp round (label_centroids scheme)."""
    return f"""
p{step} AS (
    SELECT a.cluster,
           unnest(generate_series(1, len(v.vec))) - 1 AS pos,
           unnest(v.vec) AS x
    FROM a{step} a JOIN vecs v USING (vec_id)
),
m{step} AS (
    SELECT cluster, pos,
           round(CAST(sum(CAST(x AS DECIMAL(27,12))) AS DOUBLE)
                 / count(*), 4) + 0.0 AS m
    FROM p{step} GROUP BY 1, 2
),
cen{step + 1} AS (
    SELECT cluster, list(m ORDER BY pos) AS cen FROM m{step} GROUP BY 1
)
"""


_SQL_KM_CHAIN = (
    f"WITH {_SQL_KM_VECS}, {_sql_km_assign(0, 'cen0')},"
    f" {_sql_km_update(0)}, {_sql_km_assign(1, 'cen1')},"
    f" {_sql_km_update(1)}, {_sql_km_assign(2, 'cen2')}"
)


@query(
    "kmeans_assign",
    oracle=f"""
    {_SQL_KM_CHAIN}
    SELECT vec_id, cluster, d2 FROM a2
    """,
)
def kmeans_assign_q(spark, sf_dir):
    """Final cluster assignment after 2 deterministic Lloyd iterations
    (k=8). Per iteration: one k-row broadcast probe over the corpus +
    one map-side-combinable shuffle; only the k×dim centroid cells ever
    reach the driver (the MLlib contract)."""
    return kmeans_assign(
        spark, t(spark, sf_dir, "embeddings"), k=_K, iters=_ITERS
    )


@query(
    "kmeans_centroids",
    oracle=f"""
    {_SQL_KM_CHAIN}
    SELECT cluster, pos, m FROM m1
    """,
)
def kmeans_centroids_q(spark, sf_dir):
    """Post-fit centroids as flat (cluster, pos, m) rows — the
    hash-checkable scalar form of the model itself."""
    return kmeans_centroid_cells(
        spark, t(spark, sf_dir, "embeddings"), k=_K, iters=_ITERS
    )


@query(
    "cluster_balanced_sample",
    oracle=f"""
    {_SQL_KM_CHAIN}
    SELECT vec_id, cluster, rk FROM (
        SELECT vec_id, cluster, row_number() OVER (
            PARTITION BY cluster ORDER BY hb, vec_id) AS rk
        FROM (
            SELECT vec_id, cluster,
                   {_sql_hash64("vec_id::VARCHAR || 'kmeans-balance'", 0)}
                       % 10000 AS hb
            FROM a2
        )
    ) WHERE rk <= 25
    """,
)
def cluster_balanced_sample_q(spark, sf_dir):
    """At most 25 vectors per k-means cluster by id-hash order — the
    embedding-space domain_cap: stops one dominant mode from
    monopolizing the mix. One window shuffle over the assignment."""
    return cluster_balanced_sample(
        spark, t(spark, sf_dir, "embeddings"), cap=25, k=_K, iters=_ITERS
    )
