"""Corpus-level term statistics: TF-IDF keyword extraction and
vocabulary/coverage profiling — the "what is in this corpus" pass a
training-data pipeline runs before mixing decisions.

Reference: no term-statistics surface in the reference (README.md:43-50)
— beyond-reference tier. All plans are pure DataFrame compositions:
explode → partial-aggregated groupBy, vocabulary-sized joins, per-doc
windows. Nothing touches the driver.

Scale notes
-----------
The load-bearing asymmetry everywhere here: the *corpus* is huge (100 TB
of text) but the *vocabulary* is bounded (tens of millions of distinct
terms ≪ corpus rows × terms). Document-frequency and total-count tables
are therefore vocabulary-sized — they flow into joins where AQE can pick
a broadcast/shuffled-hash strategy from observed size, and into windows
whose partition count is the vocabulary, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from beavers_spark.functions.text import tokens


def doc_terms(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """One row per (doc, term occurrence): explode of the whitespace
    tokenization. Narrow (no shuffle) — the fan-out stays inside the
    scan stage."""
    return docs.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("term")
    )


def tfidf_top_terms(
    docs: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` TF-IDF terms per document, score = tf · ln(N/df).

    Plan shape: one corpus-keyed shuffle for per-doc term counts, one
    vocabulary-keyed shuffle for document frequency, then a
    vocabulary-sized join back (AQE picks broadcast when df-table is
    small) and a per-doc window for the top-k. N arrives as a 1-row
    broadcast crossJoin (the repo's scalar-subquery idiom — never
    ``.collect()``).

    Determinism: the score is rounded to 6 dp and the window orders by
    the ROUNDED value with ``term`` as tie-break, so ranking is
    identical on any engine or partitioning.
    """
    tf = (
        doc_terms(docs, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df")),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "tfidf", "rk")
    )


def unigram_logprob(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document average token log-probability under the corpus's own
    unigram language model — the CCNet-style perplexity-proxy quality
    signal (documents of improbable tokens score low; head/middle/tail
    buckets fall out of thresholding the score).

    Emits ``(doc_id, avg_logp, n_toks)`` with ``avg_logp = Σ tf·ln(c/T)
    / Σ tf`` rounded to 6 dp.

    Plan shape: one corpus-keyed shuffle for per-doc term frequencies,
    one vocabulary-keyed shuffle for global term counts, a
    vocabulary-sized equi-join back (AQE broadcasts the count table
    when it fits), and the corpus total as a 1-row broadcast crossJoin.
    Scoring 100 TB costs the same two shuffles as TF-IDF — the model IS
    the aggregation, no driver-side fit.
    """
    tf = (
        doc_terms(docs, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    total = counts.agg(F.sum("c").alias("total"))
    return (
        tf.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("c") / F.col("total").cast("double"))
                )
                / F.sum("tf"),
                6,
            ).alias("avg_logp"),
            F.sum("tf").alias("n_toks"),
        )
    )


def train_unigram_lm(
    docs: DataFrame, text_col: str, id_col: str, alpha: float = 1.0
) -> DataFrame:
    """Additively-smoothed unigram LM from a training corpus:
    ``(term, logp)`` with ``p(term) = (c + alpha) / (T + alpha*(V+1))``.
    The ``+1`` in the denominator reserves one pseudo-count of mass for
    the OOV event, so ``lm_score`` can assign unseen terms
    ``log(alpha / (T + alpha*(V+1)))`` and the model stays a proper
    distribution over V known terms plus OOV.

    The output is vocabulary-sized — persist it (or write it as a
    table) and score any number of corpora against it; training is one
    vocabulary-keyed shuffle over the training split.
    """
    counts = (
        doc_terms(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("c"))
    )
    tot = counts.agg(
        F.sum("c").alias("t_total"), F.count("*").alias("v_size")
    )
    return counts.crossJoin(F.broadcast(tot)).select(
        "term",
        F.log(
            (F.col("c") + F.lit(alpha))
            / (F.col("t_total") + F.lit(alpha) * (F.col("v_size") + 1))
        ).alias("logp"),
        "t_total",
        "v_size",
    )


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str,
    id_col: str,
    alpha: float = 1.0,
) -> DataFrame:
    """Score documents against a TRAINED unigram LM (the CCNet-style
    held-out quality gate: the model comes from a clean reference
    corpus, not from the data being scored). Emits ``(doc_id,
    avg_logp, perplexity, oov_rate, n_toks)``; low perplexity = looks
    like the training corpus, high OOV rate = off-vocabulary junk.

    Unseen terms get the reserved-OOV probability ``alpha / (T_train +
    alpha*(V+1))`` (see ``train_unigram_lm``) via a LEFT join +
    coalesce — no driver-side vocabulary, no UDF. The join is
    scored-corpus-tokens vs a vocabulary-sized LM table: AQE broadcasts
    the LM side when it fits, so scoring 100 TB is one shuffle for the
    per-doc term counts plus a broadcast probe.
    """
    tf = (
        doc_terms(docs, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    # agg + coalesce (not .limit(1)): an EMPTY trained LM must still
    # yield exactly one totals row, else the crossJoin below silently
    # annihilates every scored row instead of using the uniform floor.
    lm_tot = lm.agg(
        F.coalesce(F.max("t_total"), F.lit(0)).alias("t_total"),
        F.coalesce(F.max("v_size"), F.lit(0)).alias("v_size"),
    )
    oov_logp = F.log(
        F.lit(alpha)
        / (F.col("t_total") + F.lit(alpha) * (F.col("v_size") + 1))
    )
    scored = (
        tf.join(lm.select("term", "logp"), "term", "left")
        .crossJoin(F.broadcast(lm_tot))
        .select(
            id_col,
            "tf",
            F.coalesce(F.col("logp"), oov_logp).alias("logp_eff"),
            F.col("logp").isNull().cast("int").alias("is_oov"),
        )
    )
    avg_logp = F.sum(F.col("tf") * F.col("logp_eff")) / F.sum("tf")
    return scored.groupBy(id_col).agg(
        F.round(avg_logp, 6).alias("avg_logp"),
        F.round(F.exp(-avg_logp), 4).alias("perplexity"),
        F.round(
            F.sum(F.col("tf") * F.col("is_oov")) / F.sum("tf"), 6
        ).alias("oov_rate"),
        F.sum("tf").alias("n_toks"),
    )


def vocab_coverage(
    docs: DataFrame, text_col: str, id_col: str, k: int = 100
) -> DataFrame:
    """Top-``k`` corpus vocabulary with cumulative coverage share —
    "how many distinct terms cover 90% of all tokens", the
    tokenizer-sizing question.

    One corpus scan + one vocabulary-keyed aggregation; the top-``k``
    pre-reduce is ``orderBy().limit(k)`` which compiles to
    ``TakeOrderedAndProject`` (per-partition heaps + a k-row driver
    merge — no global sort, no single-partition window over the full
    vocabulary). The ranking + cumulative-share window then runs over
    only the ``k`` survivors, partitioned on the joined ``total``
    attribute — constant-valued (all k rows land in one k-row
    partition) but non-foldable, so Catalyst keeps the partition spec
    and the "No Partition Defined" WindowExec path is never planned.
    Total token count is computed over the FULL vocabulary before the
    limit and joins in as a 1-row broadcast.
    """
    counts = (
        doc_terms(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    topk = (
        counts.orderBy(F.desc("n"), F.asc("term"))
        .limit(k)
        .crossJoin(F.broadcast(total))
    )
    w = Window.partitionBy("total").orderBy(F.desc("n"), F.asc("term"))
    return (
        topk.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "cum_share",
            F.round(
                F.sum("n").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("total"),
                6,
            ),
        )
        .select("rk", "term", "n", "cum_share")
    )


def bigram_pmi(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 100,
    min_count: int = 5,
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information:
    ``pmi = ln(c_ab · N / (c_a · c_b))`` over word bigrams with
    ``c_ab >= min_count`` — the phrase-mining pass (tokenizer merge
    candidates, multi-word entities).

    Determinism: the score is a pure function of exact integer counts
    (both engines compute the identical double from the identical
    integers), rounded to 6 dp, ranked with the bigram string as
    tie-break.

    Plan shape: bigram and unigram counts partial-aggregate on their
    own keys (two vocabulary-keyed shuffles); the unigram table joins
    the bigram table TWICE on a word column (vocabulary-sized — AQE
    broadcasts); N arrives as a 1-row broadcast; the top-``k``
    pre-reduce is ``orderBy().limit(k)`` = TakeOrderedAndProject, so
    the ranking window sees ``k`` rows, never the bigram vocabulary.
    """
    toks = doc_terms(docs, text_col, id_col)
    # bigrams via per-doc array slicing (narrow, order-preserving) —
    # not via window-lead over the exploded rows, whose cross-partition
    # order is not guaranteed
    arr = docs.select(F.col(id_col), tokens(F.col(text_col)).alias("tk"))
    bi = arr.select(
        F.explode(
            F.when(
                F.size("tk") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - 1),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at("tk", i.cast("int")),
                        F.element_at("tk", (i + 1).cast("int")),
                    ),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    c_ab = bi.groupBy("bigram").agg(F.count("*").alias("n"))
    uni = toks.groupBy("term").agg(F.count("*").alias("c"))
    total = uni.agg(F.sum("c").alias("n_total"))
    scored = (
        c_ab.filter(F.col("n") >= min_count)
        .withColumn("w1", F.split("bigram", " ").getItem(0))
        .withColumn("w2", F.split("bigram", " ").getItem(1))
        .join(uni.withColumnRenamed("term", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("term", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(total))
        .select(
            "bigram",
            "n",
            F.round(
                F.log(
                    F.col("n")
                    * F.col("n_total").cast("double")
                    / (F.col("c1") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
            "n_total",
        )
    )
    topk = scored.orderBy(F.desc("pmi"), F.asc("bigram")).limit(k)
    # rank window partitioned on the constant-valued but NON-FOLDABLE
    # joined total attribute — same trick as vocab_coverage: keeps
    # Catalyst off the "No Partition Defined" WindowExec path
    rk = Window.partitionBy("n_total").orderBy(
        F.desc("pmi"), F.asc("bigram")
    )
    return (
        topk.withColumn("rk", F.row_number().over(rk))
        .select("rk", "bigram", "n", "pmi")
    )


def vocab_drift(
    old: DataFrame,
    new: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Per-term KL-divergence contribution between two corpus snapshots
    — the drift monitor a continuously-ingesting pipeline runs to catch
    distribution shift (a crawl source going spammy, a language mix
    change) before it reaches training.

    ``kl_term = p_new·ln(p_new/p_old)`` with add-one smoothing over the
    UNION vocabulary (``p_x = (c_x+1)/(N_x+V)``), so unseen terms are
    defined on both sides and the total KL is ``sum(kl_term)``. Every
    factor is an exact integer before one shared double formula —
    engine-identical, oracle-checkable.

    Plan shape: two vocabulary-keyed count shuffles, one full-outer
    vocabulary-sized join, and the (V, N_old, N_new) scalars as 1-row
    broadcasts. Everything after the scans is vocabulary-bounded.
    """
    c_old = (
        doc_terms(old, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("c_old"))
    )
    c_new = (
        doc_terms(new, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("c_new"))
    )
    merged = c_old.join(c_new, "term", "full_outer").select(
        "term",
        F.coalesce("c_old", F.lit(0)).alias("c_old"),
        F.coalesce("c_new", F.lit(0)).alias("c_new"),
    )
    scalars = merged.agg(
        F.count("*").alias("v"),
        F.sum("c_old").alias("n_old"),
        F.sum("c_new").alias("n_new"),
    )
    p_old = (F.col("c_old") + 1) / (F.col("n_old") + F.col("v")).cast(
        "double"
    )
    p_new = (F.col("c_new") + 1) / (F.col("n_new") + F.col("v")).cast(
        "double"
    )
    return merged.crossJoin(F.broadcast(scalars)).select(
        "term",
        "c_old",
        "c_new",
        F.round(p_new * F.log(p_new / p_old), 8).alias("kl_term"),
    )


def hashed_features(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    dim: int = 1024,
) -> DataFrame:
    """Fixed-dimension sparse bag-of-words features by the hashing trick
    (Weinberger et al. 2009): each term maps to bucket
    ``hash(term) mod dim`` with a ±1 sign from an independent hash (the
    unbiasing trick — colliding terms cancel in expectation instead of
    stacking), weight = signed term count. Emits ``(doc_id, feat, w)``
    for non-zero features.

    The 100 TB rationale: featurization with ZERO vocabulary
    coordination — no vocabulary table, no fit step, no driver state;
    any shard of the corpus features independently and identically.
    One narrow explode + one (doc, bucket)-keyed count shuffle.
    """
    from beavers_spark.functions.dedup import md5_hash64

    terms = doc_terms(docs, text_col, id_col)
    feat = F.pmod(md5_hash64(F.col("term"), 0), F.lit(dim))
    sign = F.when(
        F.pmod(md5_hash64(F.col("term"), 1), F.lit(2)) == 0, F.lit(1)
    ).otherwise(F.lit(-1))
    return (
        terms.select(id_col, feat.alias("feat"), sign.alias("s"))
        .groupBy(id_col, "feat")
        .agg(F.sum("s").alias("w"))
        .filter(F.col("w") != 0)
    )


def bm25_top_terms(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-``k`` BM25-weighted terms per document — TF-IDF's saturating,
    length-normalized successor (Robertson/Sparck Jones):

    ``score = idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
    with the Lucene-style non-negative
    ``idf = ln((N − df + 0.5)/(df + 0.5) + 1)``.

    Same plan shape as ``tfidf_top_terms``: one doc-keyed shuffle for
    term counts (doc length rides it as a second aggregate pass over
    the same exchange), one vocabulary-keyed shuffle for document
    frequency, the (N, avgdl) totals as a 1-row broadcast crossJoin,
    then a per-doc window for the top-k. Determinism: the score is
    rounded to 6 dp and the window orders by the ROUNDED value with
    ``term`` as tie-break; the float chain is written with explicit
    parentheses so DuckDB evaluates the identical IEEE operation order.
    """
    tf = (
        doc_terms(docs, text_col, id_col)
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    # N and avgdl over docs that HAVE terms, one bounded 1-row aggregate
    # (agg, never .limit(1) — an empty corpus still yields one row;
    # count(*) is never null, only avg needs the coalesce)
    totals = dl.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.avg("dl"), F.lit(0.0)).alias("avgdl"),
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    den = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + (F.lit(b) * F.col("dl")) / F.col("avgdl")
    )
    scored = (
        tf.join(dl, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "bm25",
            F.round((idf * (F.col("tf") * F.lit(k1 + 1.0))) / den, 6),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("bm25"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(id_col, "term", "bm25", "rk")
    )
