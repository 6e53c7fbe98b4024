"""Quality-classifier data selection: a fastText-style linear model
over hashed bag-of-n-gram features, trained with full-batch gradient
descent (the GPT-3 / CCNet "quality classifier" stage — score every
pool document by how much it looks like the curated positive class).

Spark-first shape, same parameter-server-bounded contract as
``functions.kmeans``:

- features are the SHARED hashed unigram+bigram space of
  ``functions.dsir`` (fixed ``n_buckets`` dimensionality, md5-parity
  hashing — every step has a DuckDB twin);
- the MODEL lives on the driver between iterations (≤ ``n_buckets``
  floats — bounded by contract, like MLlib's LBFGS aggregates), and
  enters each per-iteration job as a BROADCAST literal table; the
  corpus never leaves the executors;
- one iteration = one doc-keyed margin aggregation + one bucket-keyed
  gradient aggregation, both map-side combinable: shuffle volume is
  O(docs) + O(n_buckets) per iteration, never tokens × corpus;
- the FINAL scoring plan starts from the literal trained weights (no
  lineage back through training), exactly like ``kmeans_fit``.

Determinism contract (what makes iterative training exactly
oracle-checkable): weights are quantized to 6 dp after every update;
margins are decimal-exact sums of (6 dp weight × integer count) — an
exact multiple of 1e-6 under ANY partition layout; sigmoid residuals
are rounded to 9 dp before the decimal-exact gradient sum. Every
reduce is integer or decimal; every float enters a reduce only after
an explicit round — so a DuckDB replay of the same fixed iterations
reproduces weights, margins and probabilities hash-exactly.

Reference: no model-training surface in the reference (README.md:43-50)
— beyond-reference training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beavers_spark.functions.dsir import hashed_ngram_features


def _doc_tf(
    docs: DataFrame, text_col: str, id_col: str, n_buckets: int
) -> DataFrame:
    """Per-doc hashed-feature counts ``(id_col, bucket, tf)``. Documents
    with no features (empty text) drop out — same contract as DSIR."""
    return (
        hashed_ngram_features(docs, text_col, id_col, n_buckets)
        .groupBy(id_col, "bucket")
        .agg(F.count("*").alias("tf"))
    )


def _margins(doc_tf: DataFrame, weights: DataFrame, id_col: str) -> DataFrame:
    """Per-doc linear margin ``Σ_b w_b · tf_b`` as ``(id_col, margin)``.

    The weight table is ≤ ``n_buckets`` rows — broadcast at any corpus
    size; the sum is decimal-exact (6 dp weight × integer tf), so the
    margin is an exact multiple of 1e-6 regardless of merge order.
    LEFT join + zero-coalesce: a bucket unseen at fit time contributes
    0, and a document whose EVERY bucket is unseen still scores
    (margin 0 ⇒ prob 0.5) instead of vanishing from the output.
    """
    return (
        doc_tf.join(F.broadcast(weights), "bucket", "left")
        .withColumn("w", F.coalesce(F.col("w"), F.lit(0.0)))
        .groupBy(id_col)
        .agg(
            (
                F.round(
                    F.sum(
                        # tf as decimal(10,0), NOT bigint: a bigint
                        # operand becomes decimal(20,0) and pushes the
                        # product past precision 38, where Spark's
                        # allowPrecisionLoss silently DROPS scale — the
                        # sum would stop being exact
                        F.col("w").cast("decimal(18,6)")
                        * F.col("tf").cast("decimal(10,0)")
                    ).cast("double"),
                    6,
                )
                + F.lit(0.0)  # -0.0 -> +0.0, engine-identical sign
            ).alias("margin")
        )
    )


def logreg_fit(
    spark: SparkSession,
    docs: DataFrame,
    label_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    iters: int = 2,
    lr: float = 0.5,
) -> DataFrame:
    """Fit ``iters`` full-batch GD steps of bias-free logistic regression
    on hashed n-gram counts; returns the literal trained weight table
    ``(bucket, w)`` — one row per bucket observed in the pool.

    ``label_col`` must be an integer 0/1 column on ``docs``. No
    intercept: the hashed space covers every token, so a constant
    feature is redundant for the RANKING use (selection thresholds are
    chosen on the score distribution anyway) and dropping it keeps the
    iteration-1 margins identically zero — which the SQL oracle
    exploits (w0 = 0 ⇒ p = 0.5 exactly).

    Per iteration the driver holds ≤ ``n_buckets`` (bucket, weight)
    pairs — the bounded-collect contract — and the update itself is
    computed IN Spark (``F.round`` half-up) so driver Python rounding
    semantics never enter the math.
    """
    labels = docs.select(
        id_col, F.col(label_col).cast("int").alias("y")
    )
    doc_tf = _doc_tf(docs, text_col, id_col, n_buckets).localCheckpoint(
        eager=False
    )  # one explode+hash pass shared by every GD iteration (callers
    # that also score should featurize once themselves and use the
    # *_from_counts pair — see plans/classifier.py)
    return logreg_fit_from_counts(
        spark, doc_tf, labels, id_col=id_col, iters=iters, lr=lr
    )


def logreg_fit_from_counts(
    spark: SparkSession,
    doc_tf: DataFrame,
    labels: DataFrame,
    id_col: str = "doc_id",
    iters: int = 2,
    lr: float = 0.5,
) -> DataFrame:
    """The GD core of ``logreg_fit`` on pre-featurized counts: ``doc_tf
    = (id_col, bucket, tf)``, ``labels = (id_col, y∈{0,1})``. Weights
    are a pure deterministic function of the (doc_tf, labels) SET —
    feed it the same rows from any storage/partitioning and the model
    is byte-identical (what the incremental refit relies on).

    PRECONDITION (ADVICE r13): every ``doc_tf`` id must carry a label —
    ``labels``' id set ⊇ ``doc_tf``'s. The fused iteration-1 path
    derives the observed-bucket set from the gradient join with
    ``labels``, so a bucket appearing only under unlabeled ids would no
    longer emit its ``w = 0.0`` row (and a non-empty ``doc_tf`` with
    EMPTY ``labels`` returns the empty model, not all-zero weights).
    Every in-repo caller featurizes labeled docs, so the sets match by
    construction; an external caller with partially-labeled counts must
    filter ``doc_tf`` to labeled ids first (or seed missing buckets
    itself) to get the same bytes as the pre-r13 two-pass form.

    r13: the old separate setup job (countDistinct + collect_set to
    seed w0 = 0 per observed bucket) is folded away — iteration 1's
    gradient groupBy already emits exactly the observed-bucket set
    (every doc_tf row participates, r = 0.5 - y is never NULL), and
    the doc count rides IN-plan as a broadcast single-row aggregate
    (the oracle SQL's own ``FROM s1, nn`` shape) — one driver action
    per iteration instead of 1 + setup. Weights are byte-identical:
    w1 = round(0 - lr*s/n, 6) + 0.0 either way."""
    if iters < 1:
        # w0 = 0 for every observed bucket (no gradient has run) —
        # the degenerate contract the fused path below cannot serve
        setup = doc_tf.agg(
            F.collect_set("bucket").alias("buckets")
        ).collect()[0]
        return spark.createDataFrame(
            [(b, 0.0) for b in sorted(setup["buckets"])],
            "bucket bigint, w double",
        )

    nn = doc_tf.agg(F.countDistinct(id_col).alias("n"))
    n_docs: int | None = None  # collected with iteration 1's rows
    weights: list = []
    w_df = None
    for step in range(iters):
        if step == 0:
            # all margins are exactly 0 ⇒ p = 0.5 for every doc
            resid = labels.select(
                id_col, F.round(0.5 - F.col("y"), 9).alias("r")
            )
        else:
            w_df = spark.createDataFrame(
                weights, "bucket bigint, w double"
            )
            m = _margins(doc_tf, w_df, id_col)
            resid = m.join(labels, id_col).select(
                id_col,
                F.round(
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-F.col("margin")))
                    - F.col("y"),
                    9,
                ).alias("r"),
            )
        grad = (
            doc_tf.join(resid, id_col)
            .groupBy("bucket")
            .agg(
                # decimal(10,0) tf for the same precision-38 reason as
                # _margins: keeps the product at scale 9, sum exact
                F.sum(
                    F.col("r").cast("decimal(20,9)")
                    * F.col("tf").cast("decimal(10,0)")
                ).alias("s")
            )
        )
        if step == 0:
            # w0 = 0: grad's bucket set IS the observed set, so the
            # update needs no prior-weights join; the doc count rides
            # out on every collected row (``n``), so iteration 2 can
            # divide by a driver literal instead of re-running the
            # countDistinct subtree
            updated = (
                grad.crossJoin(F.broadcast(nn))
                .select(
                    "bucket",
                    (
                        F.round(
                            F.lit(0.0)
                            - F.lit(lr)
                            * F.col("s").cast("double")
                            / F.col("n").cast("double"),
                            6,
                        )
                        + F.lit(0.0)  # -0.0 -> +0.0
                    ).alias("w"),
                    "n",
                )
                .collect()
            )
            if updated:
                n_docs = updated[0]["n"]
        else:
            updated = (
                w_df.join(grad, "bucket", "left")
                .select(
                    "bucket",
                    (
                        F.round(
                            F.col("w")
                            - F.lit(lr)
                            * F.coalesce(
                                F.col("s").cast("double"), F.lit(0.0)
                            )
                            / F.lit(float(n_docs)),
                            6,
                        )
                        + F.lit(0.0)  # -0.0 -> +0.0
                    ).alias("w"),
                )
                .collect()
            )
        weights = [(r["bucket"], r["w"]) for r in updated]
        if not weights:
            # empty doc_tf: every later iteration is empty too — the
            # old early-return-on-zero-docs contract
            break
    return spark.createDataFrame(weights, "bucket bigint, w double")


def logreg_score(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Score every document under a trained weight table: ``(id_col,
    margin, prob)`` with ``prob = round(σ(margin), 6)``.

    One feature pass + one broadcast join — the plan you'd run over
    100 TB after fitting on a sample. Buckets unseen at fit time
    contribute exactly 0 (LEFT join + coalesce in ``_margins``), so a
    document whose every feature is new still scores margin 0 /
    prob 0.5 rather than dropping from the output. Only genuinely
    featureless documents (empty text) are absent.
    """
    doc_tf = _doc_tf(docs, text_col, id_col, n_buckets)
    return logreg_score_from_counts(doc_tf, weights, id_col)


def logreg_score_from_counts(
    doc_tf: DataFrame,
    weights: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """``logreg_score`` on pre-featurized counts — lets a caller that
    already built (or checkpointed) ``doc_tf`` score without paying
    the explode+hash feature pass a second time."""
    m = _margins(doc_tf, weights, id_col)
    return m.select(
        id_col,
        "margin",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6
        ).alias("prob"),
    )


def quality_select(
    docs: DataFrame,
    weights: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
) -> DataFrame:
    """Top-``n`` documents by classifier probability (id tie-break on
    the ROUNDED prob — engine-independent). Executes as
    TakeOrderedAndProject: per-partition heaps, no global sort."""
    scored = logreg_score(docs, weights, text_col, id_col, n_buckets)
    return scored.orderBy(F.desc("prob"), F.asc(id_col)).limit(n)
