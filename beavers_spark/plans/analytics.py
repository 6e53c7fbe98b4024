"""Corpus/embedding analytics plans: Gopher-style quality gating, PII
scrubbing, TF-IDF keywords, vocabulary coverage, per-label embedding
centroids and outlier mining.

Reference: no analytics surface in the reference (README.md:43-50) —
beyond-reference tier, same conventions as plans/llmops.py and
plans/curation.py (identical aliases both sides, doubles rounded, the
window tie-breaks on the ROUNDED value so ranking can't diverge).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from beavers_spark.functions.embeddings import (
    embedding_outliers,
    label_centroids,
)
from beavers_spark.functions.terms import (
    bigram_pmi,
    hashed_features,
    lm_score,
    tfidf_top_terms,
    train_unigram_lm,
    unigram_logprob,
    vocab_coverage,
    vocab_drift,
)
from beavers_spark.functions.text import (
    PII_PATTERNS,
    STOPWORDS,
    gopher_quality_flags,
    redact_pii,
)
from beavers_spark.plans.common import t
from beavers_spark.plans.curation import _SQL_TOKS
from beavers_spark.plans.registry import query

_SQL_STOP = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"


@query(
    "gopher_quality",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
    feats AS (
        SELECT doc_id,
               len(tk) AS n_words,
               coalesce(list_sum(list_transform(tk, w -> len(w))), 0)
                   / greatest(len(tk), 1) AS mean_wl,
               len(list_filter(tk, w -> regexp_matches(w, '[a-z]')))
                   / greatest(len(tk), 1)::DOUBLE AS alpha_frac,
               len(list_filter(tk, w -> list_contains({_SQL_STOP}, w)))
                   AS n_stop
        FROM toks
    )
    SELECT doc_id,
           n_words BETWEEN 30 AND 100000 AS flag_n_words,
           mean_wl BETWEEN 3.0 AND 10.0 AS flag_mean_word_len,
           alpha_frac >= 0.8 AS flag_alpha,
           n_stop >= 2 AS flag_stop,
           (n_words BETWEEN 30 AND 100000)
               AND (mean_wl BETWEEN 3.0 AND 10.0)
               AND alpha_frac >= 0.8 AND n_stop >= 2 AS passes
    FROM feats
    """,
)
def gopher_quality(spark, sf_dir):
    """Gopher-rule quality gate (word-count bounds, mean word length,
    alpha-word fraction, stopword hits) as per-doc boolean flags — the
    crawl-filtering pass. Pure per-row array HOFs: one corpus scan,
    zero shuffle at any scale."""
    docs = t(spark, sf_dir, "documents")
    flags = gopher_quality_flags(F.col("text"))
    return docs.select(
        "doc_id", *(c.alias(n) for n, c in flags.items())
    )


@query(
    "pii_redact",
    oracle=f"""
    WITH r0 AS (SELECT doc_id, text AS t0 FROM documents),
    r1 AS (SELECT doc_id, t0,
                  regexp_replace(t0, '{PII_PATTERNS["email"][0]}',
                                 '<EMAIL>', 'g') AS t1 FROM r0),
    r2 AS (SELECT doc_id, t0, t1,
                  regexp_replace(t1, '{PII_PATTERNS["ssn"][0]}',
                                 '<SSN>', 'g') AS t2 FROM r1),
    r3 AS (SELECT doc_id, t0, t1, t2,
                  regexp_replace(t2, '{PII_PATTERNS["ipv4"][0]}',
                                 '<IP>', 'g') AS t3 FROM r2)
    SELECT doc_id,
           len(regexp_extract_all(t0, '{PII_PATTERNS["email"][0]}'))
               AS n_email,
           len(regexp_extract_all(t1, '{PII_PATTERNS["ssn"][0]}'))
               AS n_ssn,
           len(regexp_extract_all(t2, '{PII_PATTERNS["ipv4"][0]}'))
               AS n_ipv4,
           len(regexp_extract_all(t3, '{PII_PATTERNS["phone"][0]}'))
               AS n_phone,
           md5(regexp_replace(t3, '{PII_PATTERNS["phone"][0]}',
                              '<PHONE>', 'g')) AS redacted_fp
    FROM r3
    """,
)
def pii_redact_q(spark, sf_dir):
    """PII scrubbing pass: per-category match counts + fingerprint of
    the redacted text (hash-checkable without shipping the full text
    through the comparator). regexp chain inside codegen — one scan,
    no shuffle. This corpus is synthetic word-soup so counts are 0 and
    the fingerprint equals the original's — the behavioral coverage on
    PII-bearing text lives in tests/test_functions.py."""
    docs = t(spark, sf_dir, "documents")
    cols = redact_pii(F.col("text"))
    return docs.select(
        "doc_id",
        *(cols[f"n_{p}"].alias(f"n_{p}") for p in PII_PATTERNS),
        F.md5(cols["redacted"]).alias("redacted_fp"),
    )


@query(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term, tf,
               round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
        FROM tf JOIN dfreq USING (term), n
    )
    SELECT doc_id, term, tfidf, rk FROM (
        SELECT doc_id, term, tfidf,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY tfidf DESC, term
               ) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def tfidf_top_terms_q(spark, sf_dir):
    """Top-3 TF-IDF keywords per document. Two shuffles (doc-term
    counts; vocabulary document-frequency), a vocabulary-sized join
    (AQE broadcast), a 1-row broadcast for N, and a per-doc window.
    Ranking orders by the ROUNDED score with term tie-break, so it is
    engine- and partitioning-stable."""
    return tfidf_top_terms(
        t(spark, sf_dir, "documents"), "text", "doc_id", k=3
    )


@query(
    "vocab_coverage",
    oracle=f"""
    WITH toks AS (
        SELECT unnest({_SQL_TOKS}) AS term FROM documents
    ),
    counts AS (SELECT term, count(*) AS n FROM toks GROUP BY 1),
    ranked AS (
        SELECT term, n,
               row_number() OVER (ORDER BY n DESC, term) AS rk,
               sum(n) OVER (
                   ORDER BY n DESC, term ROWS UNBOUNDED PRECEDING
               ) AS cum
        FROM counts
    ),
    tot AS (SELECT sum(n) AS total FROM counts)
    SELECT rk, term, n::BIGINT AS n,
           round(cum::DOUBLE / total::DOUBLE, 6) AS cum_share
    FROM ranked, tot WHERE rk <= 100
    """,
)
def vocab_coverage_q(spark, sf_dir):
    """Top-100 vocabulary with cumulative coverage share (the
    tokenizer-sizing profile). The ranking window runs over the
    VOCABULARY (≪ corpus), never the corpus itself."""
    return vocab_coverage(
        t(spark, sf_dir, "documents"), "text", "doc_id", k=100
    )


@query(
    "unigram_logprob",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    cnt AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
    tot AS (SELECT sum(c) AS total FROM cnt)
    SELECT doc_id,
           round(sum(tf * ln(c / total::DOUBLE)) / sum(tf), 6) AS avg_logp,
           sum(tf)::BIGINT AS n_toks
    FROM tf JOIN cnt USING (term), tot
    GROUP BY doc_id
    """,
)
def unigram_logprob_q(spark, sf_dir):
    """CCNet-style perplexity-proxy quality score: per-doc average token
    log-probability under the corpus's own unigram LM. Two shuffles
    (doc-term counts; vocabulary counts) + a vocabulary-sized join —
    the model IS the aggregation, no driver-side fit at any scale."""
    return unigram_logprob(t(spark, sf_dir, "documents"), "text", "doc_id")


@query(
    "lm_perplexity_holdout",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    train_cnt AS (
        SELECT term, count(*) AS c FROM toks WHERE doc_id % 2 = 0 GROUP BY 1
    ),
    tot AS (
        SELECT sum(c) AS t_total, count(*) AS v_size FROM train_cnt
    ),
    lm AS (
        SELECT term, ln((c + 1.0) / (t_total + v_size + 1)) AS logp
        FROM train_cnt, tot
    ),
    tf AS (
        SELECT doc_id, term, count(*) AS tf FROM toks
        WHERE doc_id % 2 = 1 GROUP BY 1, 2
    ),
    scored AS (
        SELECT doc_id, tf,
               coalesce(logp, ln(1.0 / (t_total + v_size + 1))) AS logp_eff,
               CASE WHEN logp IS NULL THEN 1 ELSE 0 END AS is_oov
        FROM tf LEFT JOIN lm USING (term), tot
    )
    SELECT doc_id,
           round(sum(tf * logp_eff) / sum(tf), 6) AS avg_logp,
           round(exp(-(sum(tf * logp_eff) / sum(tf))), 4) AS perplexity,
           round(sum(tf * is_oov) / sum(tf), 6) AS oov_rate,
           sum(tf)::BIGINT AS n_toks
    FROM scored GROUP BY doc_id
    """,
)
def lm_perplexity_holdout(spark, sf_dir):
    """Held-out LM scoring — the actual CCNet workflow: train a smoothed
    unigram LM on the even-doc_id split, score the odd split against it
    with reserved-OOV smoothing. Training is one vocabulary-keyed
    shuffle; scoring is per-doc term counts + a broadcast-able
    vocabulary-sized LEFT join. At 100 TB the LM comes from a clean
    reference corpus and is just a table — train once, score forever."""
    docs = t(spark, sf_dir, "documents")
    lm = train_unigram_lm(
        docs.filter(F.col("doc_id") % 2 == 0), "text", "doc_id", alpha=1.0
    )
    return lm_score(
        docs.filter(F.col("doc_id") % 2 == 1), lm, "text", "doc_id", alpha=1.0
    )


@query(
    "bigram_pmi",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
    bi AS (
        SELECT unnest(CASE WHEN len(tk) >= 2
            THEN list_transform(generate_series(1, len(tk) - 1),
                 i -> tk[i] || ' ' || tk[i+1])
            ELSE [] END) AS bigram
        FROM toks
    ),
    c_ab AS (SELECT bigram, count(*) AS n FROM bi GROUP BY 1),
    uni AS (
        SELECT unnest(tk) AS term FROM toks
    ),
    cu AS (SELECT term, count(*) AS c FROM uni GROUP BY 1),
    tot AS (SELECT sum(c) AS n_total FROM cu),
    scored AS (
        SELECT bigram, c_ab.n AS n,
               round(ln(c_ab.n * n_total::DOUBLE / (u1.c * u2.c)), 6) AS pmi
        FROM c_ab
        JOIN cu u1 ON string_split(bigram, ' ')[1] = u1.term
        JOIN cu u2 ON string_split(bigram, ' ')[2] = u2.term
        CROSS JOIN tot
        WHERE c_ab.n >= 5
    )
    SELECT row_number() OVER (ORDER BY pmi DESC, bigram) AS rk,
           bigram, n::BIGINT AS n, pmi
    FROM scored
    ORDER BY pmi DESC, bigram LIMIT 100
    """,
)
def bigram_pmi_q(spark, sf_dir):
    """Top-100 collocations by PMI (phrase mining / tokenizer merge
    candidates). Counts partial-aggregate on their own keys; two
    vocabulary-sized joins; top-k via TakeOrderedAndProject so the rank
    window sees 100 rows, never the bigram vocabulary."""
    return bigram_pmi(
        t(spark, sf_dir, "documents"), "text", "doc_id", k=100, min_count=5
    )


# Zipped unnest: DuckDB zips multiple unnests in one SELECT, giving the
# (pos, value) pairs that Spark's posexplode produces.
_SQL_EMB_POS = """
    SELECT label, vec_id,
           unnest(generate_series(1, len(embedding))) - 1 AS pos,
           unnest(embedding)::DOUBLE AS v
    FROM embeddings
"""


@query(
    "label_centroids",
    oracle=f"""
    WITH pos AS ({_SQL_EMB_POS})
    SELECT label, pos,
           round(CAST(sum(CAST(v AS DECIMAL(27,12))) AS DOUBLE) / count(*), 4) + 0.0 AS m
    FROM pos GROUP BY label, pos
    """,
)
def label_centroids_q(spark, sf_dir):
    """Per-label mean embedding as (label, pos, m) rows. posexplode is
    narrow; the groupBy(label, pos) partial-aggregates map-side, so the
    shuffle carries n_labels × dim sums per task — not rows × dim."""
    return label_centroids(t(spark, sf_dir, "embeddings"))


@query(
    "embedding_outliers",
    oracle=f"""
    WITH pos AS ({_SQL_EMB_POS}),
    cent AS (
        SELECT label, pos,
           round(CAST(sum(CAST(v AS DECIMAL(27,12))) AS DOUBLE) / count(*), 4) + 0.0 AS m
        FROM pos GROUP BY label, pos
    ),
    dots AS (
        SELECT p.label, p.vec_id,
               sum(p.v * c.m) AS dot,
               sum(p.v * p.v) AS n1,
               sum(c.m * c.m) AS n2
        FROM pos p JOIN cent c USING (label, pos)
        GROUP BY p.label, p.vec_id
    ),
    scored AS (
        -- zero-norm guard mirrors the Spark side's ANSI-safe _cos:
        -- a zero vector scores 0.0 on BOTH engines (DuckDB's bare
        -- division would yield NULL and rank last instead of first)
        SELECT label, vec_id,
               round(CASE WHEN sqrt(n1) * sqrt(n2) > 0
                          THEN dot / (sqrt(n1) * sqrt(n2))
                          ELSE 0 END, 4) AS cos_sim
        FROM dots
    )
    SELECT label, vec_id, cos_sim, rk FROM (
        SELECT label, vec_id, cos_sim,
               row_number() OVER (
                   PARTITION BY label ORDER BY cos_sim, vec_id
               ) AS rk
        FROM scored
    ) WHERE rk <= 5
    """,
)
def embedding_outliers_q(spark, sf_dir):
    """Top-5 per-label outliers by cosine distance to the label
    centroid (mislabeled-example mining). The n_labels × dim centroid
    table broadcasts; similarity is a JVM HOF fold; one corpus window
    keyed on label. Ranks on the ROUNDED similarity, vec_id
    tie-break."""
    return embedding_outliers(t(spark, sf_dir, "embeddings"), k=5)


@query(
    "heavy_hitters",
    oracle="""
    SELECT epoch_us(bucket) AS bucket_us, event_type, item, cnt, rnk FROM (
        SELECT time_bucket(INTERVAL '7 days', ts, TIMESTAMP '1970-01-01') AS bucket,
               event_type, user_id AS item, count(*) AS cnt,
               row_number() OVER (
                   PARTITION BY time_bucket(INTERVAL '7 days', ts, TIMESTAMP '1970-01-01'), event_type
                   ORDER BY count(*) DESC, user_id
               ) AS rnk
        FROM events GROUP BY 1, 2, 3
    ) WHERE rnk <= 10
    """,
)
def heavy_hitters_q(spark, sf_dir):
    """Exact top-10 items per (7-day bucket, event_type) — the batch twin
    of ``streaming.topk_rollup.ContinuousTopK`` (whose Misra-Gries state
    approximates exactly this under bounded memory). One map-side-combined
    count shuffle keyed on (bucket, type, item), then a per-group window
    that only the grouped counts (not raw rows) pass through."""
    events = t(spark, sf_dir, "events")
    # epoch_us output convention (every timestamp-emitting plan): a raw
    # TimestampType would collect() in the DRIVER's local timezone and
    # hash-diverge from DuckDB's naive-UTC on any non-UTC host
    counts = (
        events.groupBy(
            F.unix_micros(F.window("ts", "7 days").start).alias(
                "bucket_us"
            ),
            "event_type",
            F.col("user_id").alias("item"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("bucket_us", "event_type").orderBy(
        F.col("cnt").desc(), F.col("item").asc()
    )
    return counts.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= 10
    )


@query(
    "bucketed_quantile",
    oracle="""
    WITH hist AS (
        SELECT time_bucket(INTERVAL '7 days', ts, TIMESTAMP '1970-01-01') AS bucket,
               event_type,
               CAST(least(greatest(floor(value / 5.0), 0), 199) AS INT) AS bin,
               count(*) AS cnt
        FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL
        GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT bucket, event_type, bin, cnt,
               sum(cnt) OVER (
                   PARTITION BY bucket, event_type ORDER BY bin
               ) AS cum,
               sum(cnt) OVER (PARTITION BY bucket, event_type) AS n
        FROM hist
    ),
    qs(q) AS (SELECT CAST(unnest([0.5, 0.95, 0.99]) AS DOUBLE)),
    hits AS (
        SELECT bucket, event_type, q, bin, cnt, cum, n,
               row_number() OVER (
                   PARTITION BY bucket, event_type, q ORDER BY bin
               ) AS r
        FROM cum CROSS JOIN qs
        WHERE cum >= ceil(q * n)
    )
    SELECT epoch_us(bucket) AS bucket_us, event_type, q,
           round((bin + (ceil(q * n) - (cum - cnt)) / cnt) * 5.0, 6) AS value
    FROM hits WHERE r = 1
    """,
)
def bucketed_quantile_q(spark, sf_dir):
    """p50/p95/p99 of event value per (7-day bucket, event_type) off a
    200-bin fixed-width histogram — the batch twin of
    ``streaming.quantile_rollup.ContinuousQuantile``, sharing its
    ``quantiles_from_histogram`` interpolation verbatim, so the
    mergeable histogram-state math is oracle-pinned against DuckDB
    computing the identical formula in SQL.

    Plan: one map-side-combined count shuffle keyed on (bucket, type,
    bin); the cumulative window sees histogram rows (groups × 200), not
    raw events, at any corpus size."""
    from beavers_spark.streaming.quantile_rollup import batch_quantile

    out = batch_quantile(
        t(spark, sf_dir, "events"),
        ts_col="ts",
        keys=["event_type"],
        value_col="value",
        lo=0.0,
        hi=1000.0,
        n_bins=200,
        bucket="7 days",
        qs=[0.5, 0.95, 0.99],
    )
    # epoch_us output convention — see heavy_hitters
    return out.select(
        F.unix_micros("bucket").alias("bucket_us"),
        "event_type",
        "q",
        "value",
    )


@query(
    "vocab_drift",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, source, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    c_old AS (
        SELECT term, count(*) AS c_old FROM toks
        WHERE source < 'src5' GROUP BY 1
    ),
    c_new AS (
        SELECT term, count(*) AS c_new FROM toks
        WHERE source >= 'src5' GROUP BY 1
    ),
    merged AS (
        SELECT coalesce(o.term, n.term) AS term,
               coalesce(c_old, 0) AS c_old,
               coalesce(c_new, 0) AS c_new
        FROM c_old o FULL OUTER JOIN c_new n ON o.term = n.term
    ),
    scalars AS (
        SELECT count(*) AS v, sum(c_old) AS n_old, sum(c_new) AS n_new
        FROM merged
    )
    SELECT term, c_old::BIGINT AS c_old, c_new::BIGINT AS c_new,
           round(((c_new + 1) / (n_new + v)::DOUBLE)
                 * ln(((c_new + 1) / (n_new + v)::DOUBLE)
                      / ((c_old + 1) / (n_old + v)::DOUBLE)), 8) AS kl_term
    FROM merged CROSS JOIN scalars
    """,
)
def vocab_drift_q(spark, sf_dir):
    """Corpus drift monitor: per-term KL contribution between the
    src0-src4 snapshot ("old crawl") and src5+ ("new crawl"), add-one
    smoothed over the union vocabulary. Vocabulary-bounded after the
    scans; scalars broadcast as 1-row joins."""
    docs = t(spark, sf_dir, "documents")
    return vocab_drift(
        docs.filter(F.col("source") < "src5"),
        docs.filter(F.col("source") >= "src5"),
        "text",
        "doc_id",
    )


@query(
    "hashed_features",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    mapped AS (
        SELECT doc_id,
               (('0x' || substr(md5(term || '#0'), 1, 15))::BIGINT) % 1024
                   AS feat,
               CASE WHEN (('0x' || substr(md5(term || '#0'), 16, 15))::BIGINT)
                         % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM toks
    )
    SELECT doc_id, feat, sum(s)::BIGINT AS w
    FROM mapped GROUP BY doc_id, feat
    HAVING sum(s) <> 0
    """,
)
def hashed_features_q(spark, sf_dir):
    """Hashing-trick featurization: 1024-dim signed sparse bag-of-words
    per doc, zero vocabulary coordination (no fit, no vocab table, no
    driver state — any corpus shard features independently). One narrow
    explode + one (doc, bucket)-keyed count shuffle."""
    return hashed_features(
        t(spark, sf_dir, "documents"), "text", "doc_id", dim=1024
    )


@query(
    "bm25_top_terms",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    tot AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round((ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
                      * (tf * 2.2::DOUBLE))
                     / (tf + 1.2 * (0.25 + (0.75 * dl) / avgdl)),
                     6) AS bm25
        FROM tf JOIN dl USING (doc_id) JOIN dfreq USING (term), tot
    )
    SELECT doc_id, term, bm25, rk FROM (
        SELECT doc_id, term, bm25,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY bm25 DESC, term
               ) AS rk
        FROM scored
    ) WHERE rk <= 3
    """,
)
def bm25_top_terms_q(spark, sf_dir):
    """Top-3 BM25 terms per document (k1=1.2, b=0.75, Lucene-style
    non-negative idf) — the saturating, length-normalized ranking
    weight retrieval stacks actually use; same two-shuffle plan as
    tfidf_top_terms with the (N, avgdl) totals as a 1-row broadcast
    (functions/terms.py bm25_top_terms)."""
    from beavers_spark.functions.terms import bm25_top_terms

    return bm25_top_terms(t(spark, sf_dir, "documents"), "text", "doc_id")
