"""Behavioral tests for the analytics tier (functions/text.py additions,
functions/terms.py, functions/embeddings.py) — crafted inputs that the
synthetic corpus cannot exercise (PII, failing quality flags), plus
determinism/sanity properties. Plan-vs-oracle hash checks live in the
driver gate; these pin the kernels."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from beavers_spark.functions.embeddings import (
    centroid_arrays,
    embedding_outliers,
    label_centroids,
)
from beavers_spark.functions.terms import tfidf_top_terms, vocab_coverage
from beavers_spark.functions.text import gopher_quality_flags, redact_pii


def _text_df(spark, rows):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(rows)], "doc_id long, text string"
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------


def test_redact_pii_all_categories(spark):
    df = _text_df(
        spark,
        [
            "mail bob.smith+x@example.co.uk or call +1 (555) 123-4567 now",
            "ssn 123-45-6789 from host 10.0.255.3 end",
            "clean text with no identifiers at all",
        ],
    )
    cols = redact_pii(F.col("text"))
    out = df.select(
        "doc_id", *(c.alias(n) for n, c in cols.items())
    ).orderBy("doc_id").collect()

    assert out[0].n_email == 1 and out[0].n_phone == 1
    assert "<EMAIL>" in out[0].redacted and "<PHONE>" in out[0].redacted
    assert "example.co.uk" not in out[0].redacted
    assert "555" not in out[0].redacted

    assert out[1].n_ssn == 1 and out[1].n_ipv4 == 1
    assert out[1].redacted == "ssn <SSN> from host <IP> end"

    assert out[2].n_email == out[2].n_ssn == out[2].n_ipv4 == 0
    assert out[2].redacted == "clean text with no identifiers at all"


def test_redact_pii_email_wins_over_phone(spark):
    # the digits inside an address must not be half-eaten as a phone
    df = _text_df(spark, ["contact 12345678901@digits.example.com ok"])
    cols = redact_pii(F.col("text"))
    row = df.select(*(c.alias(n) for n, c in cols.items())).first()
    assert row.redacted == "contact <EMAIL> ok"
    assert row.n_email == 1


# ---------------------------------------------------------------------------
# Gopher quality flags
# ---------------------------------------------------------------------------


def test_gopher_flags_each_rule(spark):
    long_doc = " ".join(["alpha beta gamma the and of"] * 10)  # 60 words
    df = _text_df(
        spark,
        [
            long_doc,                      # passes everything
            "too short the and",           # fails n_words
            " ".join(["ab"] * 40),         # mean word len 2 -> fails
            " ".join(["1234"] * 40),       # no alpha words, no stopwords
        ],
    )
    flags = gopher_quality_flags(F.col("text"))
    out = (
        df.select("doc_id", *(c.alias(n) for n, c in flags.items()))
        .orderBy("doc_id")
        .collect()
    )
    assert out[0].passes
    assert not out[1].flag_n_words and not out[1].passes
    assert not out[2].flag_mean_word_len and not out[2].passes
    assert not out[3].flag_alpha and not out[3].flag_stop


# ---------------------------------------------------------------------------
# TF-IDF / vocabulary
# ---------------------------------------------------------------------------


def test_tfidf_prefers_rare_terms(spark):
    df = _text_df(
        spark,
        [
            "common common zebra",
            "common common common",
            "common yak yak",
        ],
    )
    top = tfidf_top_terms(df, "text", "doc_id", k=1).collect()
    by_doc = {r.doc_id: r for r in top}
    # 'common' appears in every doc -> idf = ln(1) = 0; rare terms win
    assert by_doc[0].term == "zebra"
    assert by_doc[2].term == "yak"
    # doc 1 has only 'common': score 0, but still ranked (rk=1)
    assert by_doc[1].term == "common" and by_doc[1].tfidf == 0.0
    expected = round(2 * math.log(3 / 1), 6)
    assert by_doc[2].tfidf == expected


def test_vocab_coverage_shares(spark):
    df = _text_df(spark, ["a a a b b c"])
    out = vocab_coverage(df, "text", "doc_id", k=10).orderBy("rk").collect()
    assert [(r.term, r.n) for r in out] == [("a", 3), ("b", 2), ("c", 1)]
    assert [r.cum_share for r in out] == [0.5, round(5 / 6, 6), 1.0]


# ---------------------------------------------------------------------------
# Embedding centroids / outliers
# ---------------------------------------------------------------------------


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_label_centroids_elementwise_mean(spark):
    df = _emb_df(
        spark,
        [
            (1, 0, [1.0, 0.0]),
            (2, 0, [3.0, 2.0]),
            (3, 1, [0.0, 10.0]),
        ],
    )
    cents = {
        (r.label, r.pos): r.m for r in label_centroids(df).collect()
    }
    assert cents == {(0, 0): 2.0, (0, 1): 1.0, (1, 0): 0.0, (1, 1): 10.0}
    arrs = {r.label: r.centroid for r in centroid_arrays(
        label_centroids(df)).collect()}
    assert arrs[0] == [2.0, 1.0] and arrs[1] == [0.0, 10.0]


def test_embedding_outliers_flags_mislabeled(spark):
    # label 0 clusters near +x; vec 99 points at -x (mislabeled)
    rows = [(i, 0, [1.0, 0.1 * i]) for i in range(5)]
    rows.append((99, 0, [-1.0, 0.0]))
    out = embedding_outliers(_emb_df(spark, rows), k=1)
    top = out.collect()
    assert len(top) == 1 and top[0].vec_id == 99 and top[0].rk == 1
    assert top[0].cos_sim < 0


def test_unigram_logprob_orders_rare_docs_lower(spark):
    import math

    from beavers_spark.functions.terms import unigram_logprob

    # corpus: "the" dominates; doc 3 is all rare tokens -> lowest score
    df = spark.createDataFrame(
        [(1, "the the the the"), (2, "the the cat"), (3, "qq zz")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in unigram_logprob(df, "text", "doc_id").collect()}
    assert out[1].n_toks == 4 and out[3].n_toks == 2
    assert out[3].avg_logp < out[2].avg_logp < out[1].avg_logp
    # hand-check doc 1: p(the) = 6/9
    assert abs(out[1].avg_logp - round(math.log(6 / 9), 6)) < 1e-6
    # hand-check doc 3: both tokens unique -> ln(1/9)
    assert abs(out[3].avg_logp - round(math.log(1 / 9), 6)) < 1e-6


def test_rolling_avg_frame_semantics(spark):
    import datetime

    from beavers_spark.plans.registry import QUERIES

    # drive the registered plan's window shape on a planted frame
    rows = [
        (i, datetime.datetime(2024, 1, 1, 0, i), 7, float(i))
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    from pyspark.sql import Window, functions as F

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    out = {
        r.event_id: r.avg5
        for r in df.select(
            "event_id", F.round(F.avg("value").over(w), 4).alias("avg5")
        ).collect()
    }
    assert out[0] == 0.0 and out[2] == 1.0  # avg(0,1,2)
    assert out[5] == 3.0  # avg(1..5), frame drops row 0


def test_time_weighted_avg_weights_by_span(spark):
    import datetime

    from beavers_spark.plans.registry import QUERIES

    # value 10 held 3h, value 0 held 1h -> twa 7.5; the LAST observation
    # carries no span and is excluded
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 5, 10.0),
        (2, base + datetime.timedelta(hours=3), 5, 0.0),
        (3, base + datetime.timedelta(hours=4), 5, 999.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = df.select(
        "user_id", "value",
        ((F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")) / F.lit(3.6e9)).alias("dt_h"),
    ).filter(F.col("dt_h").isNotNull())
    out = spans.groupBy("user_id").agg(
        F.round(F.sum(F.col("value") * F.col("dt_h")) / F.sum("dt_h"), 4).alias("twa")
    ).collect()
    assert len(out) == 1 and out[0].twa == 7.5


def test_anomaly_zscore_flags_planted_outlier(spark, tmp_path):
    import datetime

    # 20 values at 10.0 plus one at 100.0, same type+day: the outlier's
    # z dominates and the inliers share one negative z
    base = datetime.datetime(2024, 3, 1)
    rows = [
        (i, base + datetime.timedelta(minutes=i), 1, "a", 10.0, "{}")
        for i in range(20)
    ] + [(99, base + datetime.timedelta(minutes=59), 1, "a", 100.0, "{}")]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    sf_dir = str(tmp_path)
    # plans/common.t() expects a single parquet FILE per table (the
    # testdata layout), not a Spark output directory
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(df.toPandas()), sf_dir + "/events.parquet"
    )
    from beavers_spark.plans.registry import QUERIES

    out = {r.event_id: r.z for r in QUERIES["anomaly_zscore"](spark, sf_dir).collect()}
    assert out[99] > 4.0
    inlier_zs = {v for k, v in out.items() if k != 99}
    assert len(inlier_zs) == 1 and next(iter(inlier_zs)) < 0


def test_bigram_pmi_finds_planted_collocation(spark):
    from beavers_spark.functions.terms import bigram_pmi

    # "zq xv" always co-occur (never apart); filler words are common
    rows = []
    for i in range(10):
        rows.append((i, "zq xv the the the the"))
    for i in range(10, 30):
        rows.append((i, "the a of the a of"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bigram_pmi(df, "text", "doc_id", k=5, min_count=5).collect()
    assert out and out[0].rk == 1
    assert out[0].bigram == "zq xv"  # perfect collocation ranks first
    ranked = sorted(out, key=lambda r: r.rk)
    pmis = [r.pmi for r in ranked]
    assert pmis == sorted(pmis, reverse=True)
    # determinism under repartitioning
    again = bigram_pmi(df.repartition(7), "text", "doc_id", k=5, min_count=5).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_vocab_drift_detects_planted_shift(spark):
    from pyspark.sql import functions as F

    from beavers_spark.functions.terms import vocab_drift

    old = spark.createDataFrame(
        [(i, "the cat sat") for i in range(10)], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(i, "the spam spam") for i in range(10)], "doc_id long, text string"
    )
    out = {r.term: r for r in vocab_drift(old, new, "text", "doc_id").collect()}
    assert set(out) == {"the", "cat", "sat", "spam"}
    # the term that surged dominates the positive drift; vanished terms
    # contribute negative mass; total KL is positive for a real shift
    assert out["spam"].kl_term == max(r.kl_term for r in out.values())
    assert out["cat"].kl_term < 0 and out["sat"].kl_term < 0
    assert sum(r.kl_term for r in out.values()) > 0
    assert out["spam"].c_old == 0 and out["spam"].c_new == 20


def test_hashed_features_signed_counts(spark):
    from beavers_spark.functions.terms import hashed_features

    df = spark.createDataFrame(
        [(1, "cat cat cat"), (2, "cat"), (3, "")],
        "doc_id long, text string",
    )
    out = [r for r in hashed_features(df, "text", "doc_id", dim=64).collect()]
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # same term -> same bucket and sign everywhere; magnitude = tf
    assert len(by_doc[1]) == 1 and len(by_doc[2]) == 1
    (f1,), (f2,) = by_doc[1], by_doc[2]
    assert f1.feat == f2.feat and abs(f1.w) == 3 and abs(f2.w) == 1
    assert (f1.w > 0) == (f2.w > 0)
    assert 3 not in by_doc  # empty doc -> no features
    # deterministic under repartitioning
    again = hashed_features(df.repartition(5), "text", "doc_id", dim=64).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_redact_pii_counts_follow_redaction_order(spark):
    """Review r5: counts are taken on the progressively-redacted text,
    so the broad phone pattern no longer double-counts SSNs/IPv4s —
    sum of category counts == number of replaced spans."""
    df = spark.createDataFrame(
        [(1, "ssn 123-45-6789 ip 192.168.100.200 call +1 (555) 123-4567 ok")],
        "doc_id long, text string",
    )
    cols = redact_pii(F.col("text"))
    row = df.select(
        *(cols[k].alias(k) for k in ("n_email", "n_ssn", "n_ipv4", "n_phone")),
        cols["redacted"].alias("red"),
    ).collect()[0]
    assert (row.n_email, row.n_ssn, row.n_ipv4, row.n_phone) == (0, 1, 1, 1)
    assert "<SSN>" in row.red and "<IP>" in row.red and "<PHONE>" in row.red


def test_lm_score_holdout_semantics(spark):
    from beavers_spark.functions.terms import lm_score, train_unigram_lm

    train = spark.createDataFrame(
        [(1, "alpha beta alpha gamma"), (2, "alpha beta beta")],
        "doc_id long, text string",
    )
    # train counts: alpha=3, beta=3, gamma=1 -> T=7, V=3
    lm = train_unigram_lm(train, "text", "doc_id", alpha=1.0)
    got = {r.term: r.logp for r in lm.collect()}
    denom = 7 + 1.0 * (3 + 1)
    assert got["alpha"] == pytest.approx(math.log(4 / denom))
    assert got["gamma"] == pytest.approx(math.log(2 / denom))

    score = spark.createDataFrame(
        [(10, "alpha alpha beta"), (11, "zzz qqq"), (12, "gamma zzz")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in lm_score(score, lm, "text", "doc_id").collect()}
    # all-in-vocab doc: exact expected average logp, zero OOV
    exp10 = (2 * math.log(4 / denom) + math.log(4 / denom)) / 3
    assert out[10].avg_logp == pytest.approx(exp10, abs=1e-6)
    assert out[10].oov_rate == 0.0
    # all-OOV doc: every token gets the reserved-OOV logp
    oov_logp = math.log(1.0 / denom)
    assert out[11].avg_logp == pytest.approx(oov_logp, abs=1e-6)
    assert out[11].oov_rate == 1.0
    assert out[11].perplexity == pytest.approx(round(math.exp(-oov_logp), 4))
    # mixed doc: rates and averages blend
    assert out[12].oov_rate == 0.5
    exp12 = (math.log(2 / denom) + oov_logp) / 2
    assert out[12].avg_logp == pytest.approx(exp12, abs=1e-6)
    # ranking: in-domain text scores better (lower ppl) than junk
    assert out[10].perplexity < out[11].perplexity


def test_lm_score_empty_lm_uses_uniform_floor(spark):
    # ADVICE r6: an EMPTY trained LM (empty/filtered-out training
    # corpus) used to produce a zero-row totals frame whose crossJoin
    # annihilated every scored row; the agg+coalesce totals keep
    # exactly one row, so every token scores at the uniform floor
    from beavers_spark.functions.terms import lm_score, train_unigram_lm

    empty = spark.createDataFrame([], "doc_id long, text string")
    lm = train_unigram_lm(empty, "text", "doc_id", alpha=1.0)
    assert lm.count() == 0
    score = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in lm_score(score, lm, "text", "doc_id").collect()}
    assert set(out) == {1, 2}
    # T=0, V=0 -> every term is OOV at logp = log(alpha / (0 + alpha*1))
    floor = math.log(1.0 / 1.0)
    assert out[1].avg_logp == pytest.approx(floor, abs=1e-6)
    assert out[1].oov_rate == 1.0 and out[2].oov_rate == 1.0


def test_bm25_top_terms_saturation_and_length_norm(spark):
    import math

    from beavers_spark.functions.terms import bm25_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple apple apple apple banana"),
            (2, "apple banana"),
            (3, "cherry date elderberry fig grape lemon mango"),
        ],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.rk): (r.term, r.bm25)
           for r in bm25_top_terms(df, "text", "doc_id", k=2).collect()}
    # doc 1's top term is the rare-ish repeated 'apple'; hand-compute:
    # N=3 docs, df(apple)=2, dl(1)=5, avgdl=(5+2+7)/3
    n, dfa, k1, b = 3, 2, 1.2, 0.75
    avgdl = (5 + 2 + 7) / 3
    idf = math.log((n - dfa + 0.5) / (dfa + 0.5) + 1.0)
    tf = 4
    want = round((idf * (tf * 2.2)) / (tf + k1 * (0.25 + (b * 5) / avgdl)), 6)
    assert out[(1, 1)] == ("apple", want)
    # saturation: 4x the tf must yield far less than 4x doc 2's score
    assert out[(1, 1)][1] < 4 * out[(2, 1)][1] * 0.75
    # every doc got exactly k (or fewer) ranked rows, rk dense from 1
    assert {rk for d, rk in out if d == 3} == {1, 2}
