"""DSIR-style data selection: importance resampling with hashed-n-gram
language models (Xie et al. 2023, "Data Selection for Language Models
via Importance Resampling").

The pipeline shape: fit two bag-of-hashed-n-grams models — one on a
small TARGET corpus (the distribution you want more of), one on the RAW
pool being selected from — then weight every raw document by the
log-likelihood ratio of its features under the two models and sample
proportionally. Documents that "look like" the target score high.

Everything is hash-bucketed so the model is a FIXED-size table
(``n_buckets`` rows) regardless of corpus size:

- features are unigrams + bigrams of the shared whitespace tokenizer
  (``functions.text.tokens``), bucketed by the md5-derived 60-bit hash
  (``functions.dedup.md5_hash64``) mod ``n_buckets`` — so DuckDB can
  compute identical buckets and every step is oracle-checkable;
- each model is one vocabulary-keyed shuffle over its corpus, then a
  ``n_buckets``-row table — broadcast-joined into scoring at any scale;
- scoring is per-doc bucket counts (one doc-keyed shuffle with map-side
  combine) + the broadcast model probe: the same plan shape as
  ``terms.lm_score``, with a bounded feature space.

Selection uses the Gumbel-top-k trick with a DETERMINISTIC Gumbel: the
uniform comes from the document-id hash, so the "random" sample is
reproducible across engines, reruns and cluster layouts — the same
design as ``sampling.deterministic_sample``, and the reason the sampler
itself has an exact SQL oracle.

Reference: the reference engine has no data-selection surface
(README.md:43-50) — beyond-reference training-data tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beavers_spark.functions.dedup import md5_hash64
from beavers_spark.functions.text import tokens

#: 2^60 — md5_hash64 yields 60-bit non-negative ints; (h + 0.5) / 2^60
#: is a uniform in (0, 1) exactly representable identically in DuckDB.
_HASH_SPACE = float(1 << 60)


def hashed_ngram_features(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    flag: Column | None = None,
) -> DataFrame:
    """Explode each document into hashed-n-gram feature buckets:
    ``(id_col, bucket)`` with one row per feature OCCURRENCE (unigrams
    and bigrams, multiplicity preserved — DSIR models are count-based).

    Every downstream aggregation groups on ``bucket`` or ``id_col`` and
    gets map-side combine, so shuffle volume is bounded by ``n_buckets``
    (model fit) or the doc count (scoring) — never tokens × corpus. The
    input is repartitioned BEFORE the fan-out: a single small parquet
    file arrives as ONE partition, which would serialize this CPU-heavy
    (md5-per-occurrence) stage (same rationale as dedup.shingle_sets).
    """
    # tokenize behind its own projection: inlined, every element_at in
    # the bigram lambda would re-split the document (Catalyst does not
    # duplicate non-cheap exprs across a project boundary — the same
    # boundary fix as dedup.shingle_sets)
    extra = [] if flag is None else [flag.alias("tgt")]
    toked = docs.repartition(
        docs.sparkSession.sparkContext.defaultParallelism
    ).select(id_col, tokens(F.col(text_col)).alias("tk"), *extra)
    tk = F.col("tk")
    bigrams = F.when(
        F.size(tk) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(tk) - 2),
            lambda i: F.concat(
                F.element_at(tk, i + 1), F.lit(" "), F.element_at(tk, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.concat(tk, bigrams)
    keep = [id_col] if flag is None else [id_col, "tgt"]
    return toked.select(
        *keep, F.explode(feats).alias("feat")
    ).select(
        *keep,
        F.pmod(md5_hash64(F.col("feat")), F.lit(n_buckets)).alias("bucket"),
    )


def _model_from_counts(
    counts: DataFrame, n_buckets: int, alpha: float
) -> DataFrame:
    """Smoothed model table from occupied-bucket counts ``(bucket, c)``:
    ``(bucket, logp, t_total)``."""
    tot = counts.agg(F.sum("c").alias("t_total"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.log(
            (F.col("c") + F.lit(alpha))
            / (F.col("t_total") + F.lit(alpha * n_buckets))
        ).alias("logp"),
        "t_total",
    )


def hashed_ngram_model(
    corpus: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int,
    alpha: float = 1.0,
) -> DataFrame:
    """Additively-smoothed hashed-n-gram model: ``(bucket, logp)`` for
    every occupied bucket, plus the totals needed to reconstruct the
    smoothing floor for EMPTY buckets (``log(alpha / (T + alpha*B))``).

    Unlike an open-vocabulary LM there is no OOV event — the bucket
    space is finite, so smoothing over all ``n_buckets`` cells makes
    the model a proper distribution. The table is at most ``n_buckets``
    rows: broadcastable forever, one shuffle to fit.
    """
    counts = (
        hashed_ngram_features(corpus, text_col, id_col, n_buckets)
        .groupBy("bucket")
        .agg(F.count("*").alias("c"))
    )
    return _model_from_counts(counts, n_buckets, alpha)


def dsir_logweights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    target_pred: Column | None = None,
) -> DataFrame:
    """Per-document DSIR importance log-weight: ``Σ_features
    log p_target(bucket) - log p_raw(bucket)`` over the document's
    hashed-n-gram occurrences. Emits ``(id_col, logw, n_feats)`` with
    ``logw`` rounded to 6 dp.

    Plan shape: the RAW pool is scanned exactly once — the per-doc
    bucket counts it produces (one doc×bucket shuffle with map-side
    combine) are re-aggregated into the raw model's bucket totals
    (``Σ_docs tf`` ≡ occurrence count; a second shuffle of ≤ pool-size
    ×n_buckets rows, NOT a second explode+hash pass over 100 TB of
    text). The target fit scans only the target slice. Scoring is then
    two ≤``n_buckets``-row BROADCAST left joins.

    Documents with no features (empty text) produce no feature rows and
    drop out — callers that need them keep a left join on the pool.

    ``target_pred``: when the target IS a predicate-filtered slice of
    ``raw`` (the plans' shape), pass the predicate instead of relying
    on the separate ``target`` frame — the flag rides the ONE feature
    pass and the target model's counts aggregate from the same
    materialized ``doc_tf``, instead of paying a second explode+md5
    pass over the target slice. Counts — and so every weight — are
    identical either way (same tokenizer, same hash, same doc set).

    ``doc_tf`` (and each ≤``n_buckets``-row model table) is
    materialized ONCE via a lazy ``localCheckpoint``: it has five
    consumer subtrees (both model fits, both smoothing-floor totals,
    the scoring join), and without the checkpoint Catalyst compiles a
    separate copy of the explode+md5 feature pass into every one of
    them — the r13 executed plan ran the full-pool feature pass 9
    times and runtime exchange reuse never fired (column pruning makes
    each consumer's exchange differ). Lazy (not eager) so the
    materialization happens inside the caller's action, and a
    checkpoint (not ``persist``) so no CacheManager entry outlives the
    plan (the semdedup precedent).
    """
    if target_pred is not None:
        doc_tf = (
            hashed_ngram_features(
                raw, text_col, id_col, n_buckets, flag=target_pred
            )
            .groupBy(id_col, "tgt", "bucket")
            .agg(F.count("*").alias("tf"))
            .localCheckpoint(eager=False)
        )
        p_t = _model_from_counts(
            doc_tf.filter(F.col("tgt"))
            .groupBy("bucket")
            .agg(F.sum("tf").alias("c"))
            .localCheckpoint(eager=False),
            n_buckets,
            alpha,
        )
        doc_tf = doc_tf.drop("tgt")
    else:
        doc_tf = (
            hashed_ngram_features(raw, text_col, id_col, n_buckets)
            .groupBy(id_col, "bucket")
            .agg(F.count("*").alias("tf"))
            .localCheckpoint(eager=False)
        )
        p_t = _model_from_counts(
            hashed_ngram_features(target, text_col, id_col, n_buckets)
            .groupBy("bucket")
            .agg(F.count("*").alias("c"))
            .localCheckpoint(eager=False),
            n_buckets,
            alpha,
        )
    p_q = _model_from_counts(
        doc_tf.groupBy("bucket")
        .agg(F.sum("tf").alias("c"))
        .localCheckpoint(eager=False),
        n_buckets,
        alpha,
    )
    # Smoothing floors for buckets absent from a model's count table.
    # agg (not limit(1)): an EMPTY model — a target filter matching
    # nothing, or only empty-text docs — still yields exactly one row
    # (null total, coalesced to 0 ⇒ the uniform floor ln(1/n_buckets)),
    # instead of an empty frame whose cross join would silently
    # annihilate every scored row.
    t_tot = p_t.agg(
        F.coalesce(F.max("t_total"), F.lit(0.0)).alias("tt_t")
    )
    q_tot = p_q.agg(
        F.coalesce(F.max("t_total"), F.lit(0.0)).alias("tt_q")
    )
    floor_t = F.log(F.lit(alpha) / (F.col("tt_t") + F.lit(alpha * n_buckets)))
    floor_q = F.log(F.lit(alpha) / (F.col("tt_q") + F.lit(alpha * n_buckets)))
    scored = (
        doc_tf.join(
            F.broadcast(p_t.select("bucket", F.col("logp").alias("logp_t"))),
            "bucket",
            "left",
        )
        .join(
            F.broadcast(p_q.select("bucket", F.col("logp").alias("logp_q"))),
            "bucket",
            "left",
        )
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(q_tot))
        .select(
            id_col,
            "tf",
            (
                F.coalesce(F.col("logp_t"), floor_t)
                - F.coalesce(F.col("logp_q"), floor_q)
            ).alias("ratio"),
        )
    )
    # per-term 9 dp round + decimal-exact sum: the reduce is identical
    # under ANY partition layout / merge order (the anomaly_zscore
    # order-exact-sum pattern), so logw never drifts across engines,
    # reruns or cluster sizes
    term = F.round(F.col("tf") * F.col("ratio"), 9).cast("decimal(27,9)")
    return scored.groupBy(id_col).agg(
        F.round(F.sum(term).cast("double"), 6).alias("logw"),
        F.sum("tf").alias("n_feats"),
    )


def gumbel_key(id_col: str, logw_col: str, salt: str = "gumbel") -> Column:
    """Deterministic Gumbel-perturbed selection key: ``logw + G`` where
    ``G = -ln(-ln(u))`` and ``u`` is the id-hash uniform in (0, 1).

    Gumbel-top-k over these keys IS sampling-without-replacement with
    probability proportional to ``exp(logw)`` — but reproducible: the
    noise is a pure function of the id, so the same pool always yields
    the same sample on any engine or partitioning (and membership of a
    document never depends on which OTHER documents are present).
    """
    u = (
        md5_hash64(
            F.concat(F.col(id_col).cast("string"), F.lit("|" + salt))
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(_HASH_SPACE)
    return F.round(F.col(logw_col) - F.log(-F.log(u)), 6)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    n_buckets: int = 4096,
    alpha: float = 1.0,
    salt: str = "gumbel",
    target_pred: Column | None = None,
) -> DataFrame:
    """Select ``n`` documents from ``raw`` by Gumbel-top-k over the DSIR
    importance weights — the end-to-end DSIR selection step. Emits
    ``(id_col, logw, sel_key)`` for the selected documents.

    The ranking is a global top-``n``: Spark executes it as
    TakeOrderedAndProject (per-partition heaps, no full sort) so the
    selection cost is one scan over the scored pool. Ties on the
    ROUNDED key break by id, keeping the sample engine-independent.
    """
    w = dsir_logweights(
        raw, target, text_col, id_col, n_buckets, alpha,
        target_pred=target_pred,
    )
    keyed = w.select(
        id_col, "logw", gumbel_key(id_col, "logw", salt).alias("sel_key")
    )
    return keyed.orderBy(
        F.desc("sel_key"), F.asc(id_col)
    ).limit(n)
