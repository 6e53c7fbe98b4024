"""Beyond-reference plans: training-data pipeline operators over the
``documents`` and ``embeddings`` tables, each with a DuckDB oracle built
from the SAME md5-derived hashing so results are cross-engine checkable.

Oracle SQL for the hash-heavy operators (MinHash, SimHash) is generated
programmatically to keep the seed/band layout in one place
(beavers_spark.functions.dedup NUM_HASHES/BANDS).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.dedup import (
    BANDS,
    NUM_HASHES,
    ROWS_PER_BAND,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
    tfidf_cosine_pairs,
)
from beavers_spark.functions.similarity import (
    brute_force_topk,
    ivf_topk,
    ivfpq_topk,
    knn_join,
    lsh_bucketed_topk,
    pq_topk,
)
from beavers_spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    doc_fingerprint,
    lang_id,
    quality_score,
    tokens,
)
from beavers_spark.functions.text import token_count_bpe_ish
from beavers_spark.plans.common import t
from beavers_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Shared DuckDB SQL fragments (mirror the Spark-side token/shingle/hash defs)
# ---------------------------------------------------------------------------

_SQL_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), w -> w <> '')"
)


def _sql_hash64(expr: str, seed: int) -> str:
    """DuckDB twin of dedup.md5_hash64 (split-digest scheme: seed pair
    (2k, 2k+1) shares the md5 of salt k, reading hex halves 1-15/16-30)."""
    start = 1 + 15 * (seed % 2)
    return (
        f"(('0x' || substr(md5({expr} || '#{seed // 2}'), {start}, 15))"
        "::BIGINT)"
    )


_SQL_SHINGLES_CTE = f"""
toks AS (
    SELECT doc_id, {_SQL_TOKS} AS tk FROM documents
),
sh AS (
    SELECT doc_id,
           unnest(list_distinct(list_transform(
               generate_series(1, len(tk) - 2),
               i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]))) AS shingle
    FROM toks WHERE len(tk) >= 3
)
"""

_SQL_JACCARD_CTES = f"""
WITH {_SQL_SHINGLES_CTE},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
common AS (
    SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS n_common
    FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2
),
exact AS (
    SELECT doc1, doc2,
           round(n_common / (s1.n_sh + s2.n_sh - n_common), 6) AS jaccard
    FROM common
    JOIN sizes s1 ON common.doc1 = s1.doc_id
    JOIN sizes s2 ON common.doc2 = s2.doc_id
)
"""

# ---------------------------------------------------------------------------
# Exact dedup / fingerprinting
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents WHERE text IS NOT NULL GROUP BY md5(text)
    """,
)
def dedup_exact(spark, sf_dir):
    """Exact dedup by content hash — one shuffle keyed on the fingerprint,
    the canonical large-scale first pass."""
    return exact_dedup(t(spark, sf_dir, "documents"), "text", "doc_id", min_copies=1)


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
               AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint_q(spark, sf_dir):
    """Normalized content fingerprint (rolling-hash analog)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


# ---------------------------------------------------------------------------
# Near-dedup: n-gram Jaccard, MinHash-LSH, SimHash
# ---------------------------------------------------------------------------


@query(
    "dedup_ngram_jaccard",
    oracle=_SQL_JACCARD_CTES
    + """
    SELECT doc1, doc2, jaccard FROM exact WHERE jaccard >= 0.2
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-duplicate pairs by exact 3-gram Jaccard via inverted-index
    join — no cartesian product; shuffle keyed on shingle."""
    return ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.2
    )


_TFIDF_B = 4096
_TFIDF_MAXDF = 64

_SQL_TFIDF_CTES = f"""toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents),
tf AS (
    SELECT doc_id, {_sql_hash64('token', 0)} % {_TFIDF_B} AS bucket,
           count(*) AS tf
    FROM (SELECT doc_id, unnest(tk) AS token FROM toks)
    GROUP BY 1, 2
),
nn AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
dfc AS (SELECT bucket, count(*) AS df_b FROM tf GROUP BY 1),
wtd AS (
    SELECT tf.doc_id, tf.bucket, dfc.df_b,
           round(tf.tf * ln((nn.n + 1.0) / (dfc.df_b + 1.0)), 6) AS w
    FROM tf JOIN dfc USING (bucket), nn
),
nrm AS (
    SELECT doc_id,
           (sum(CAST(round(w * w, 9) AS DECIMAL(27,9))))::DOUBLE AS n2
    FROM wtd GROUP BY 1
),
post AS (
    SELECT doc_id, bucket, w FROM wtd WHERE df_b <= {_TFIDF_MAXDF}
),
dots AS (
    SELECT a.doc_id AS doc1, b.doc_id AS doc2,
           (sum(CAST(round(a.w * b.w, 9)
                     AS DECIMAL(27,9))))::DOUBLE AS dot
    FROM post a JOIN post b USING (bucket)
    WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
tpairs AS (
    SELECT doc1, doc2, round(dot / sqrt(x.n2 * y.n2), 6) AS cos
    FROM dots JOIN nrm x ON x.doc_id = dots.doc1
              JOIN nrm y ON y.doc_id = dots.doc2
)"""


@query(
    "dedup_tfidf_cosine",
    oracle=f"""
    WITH {_SQL_TFIDF_CTES}
    SELECT doc1, doc2, cos FROM tpairs WHERE cos >= 0.8
    """,
)
def dedup_tfidf_cosine_q(spark, sf_dir):
    """TF-IDF cosine near-dup pairs (cos ≥ 0.8) via an inverted-index
    join with the classic postings-length prune (df ≤ 64 buckets pair;
    stop-term buckets still weight, never fan out) — the
    lexical-weighting alternative to MinHash: boilerplate overlap
    contributes almost nothing, shared rare terms dominate."""
    return tfidf_cosine_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id",
        threshold=0.8, n_buckets=_TFIDF_B, max_df=_TFIDF_MAXDF,
    )


@query(
    "dedup_tfidf_clusters",
    oracle=f"""
    WITH RECURSIVE {_SQL_TFIDF_CTES},
    pairs AS (SELECT doc1, doc2 FROM tpairs WHERE cos >= 0.8),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM pairs
        UNION ALL SELECT doc2, doc1 FROM pairs
    ),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def dedup_tfidf_clusters_q(spark, sf_dir):
    """Connected components over the TF-IDF cosine pair graph — the
    lexical-weighting modality's full pair→cluster pipeline, same
    min-label fixpoint as dedup_clusters, hash-checked against the
    recursive-CTE closure."""
    from beavers_spark.functions.dedup import connected_components

    pairs = tfidf_cosine_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id",
        threshold=0.8, n_buckets=_TFIDF_B, max_df=_TFIDF_MAXDF,
    ).select("doc1", "doc2")
    return connected_components(pairs)


def _minhash_oracle(bucket_cap: int | None = None) -> str:
    sig_cols = ",\n           ".join(
        f"min({_sql_hash64('shingle', s)}) AS mh{s}" for s in range(NUM_HASHES)
    )
    band_selects = []
    for b in range(BANDS):
        hs = ", ".join(
            f"mh{b * ROWS_PER_BAND + r} AS h{r}" for r in range(ROWS_PER_BAND)
        )
        band_selects.append(f"SELECT doc_id, {b} AS band_id, {hs} FROM sig")
    bands_sql = "\nUNION ALL\n".join(band_selects)
    band_eq = " AND ".join(f"a.h{r} = b.h{r}" for r in range(ROWS_PER_BAND))
    est_sum = " + ".join(
        f"CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END" for i in range(NUM_HASHES)
    )
    if bucket_cap is None:
        cand_ctes = f"""
    cand AS (
        SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2
        FROM bands a JOIN bands b
          ON a.band_id = b.band_id AND {band_eq} AND a.doc_id < b.doc_id
    )"""
    else:
        h_list = ", ".join(f"h{r}" for r in range(ROWS_PER_BAND))
        part = f"PARTITION BY band_id, {h_list}"
        cand_ctes = f"""
    ranked AS (
        SELECT doc_id, band_id, {h_list},
               count(*) OVER ({part}) AS cnt,
               lead(doc_id) OVER ({part} ORDER BY doc_id) AS nxt
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT doc1, doc2 FROM (
            SELECT a.doc_id AS doc1, b.doc_id AS doc2
            FROM ranked a JOIN ranked b
              ON a.band_id = b.band_id AND {band_eq} AND a.doc_id < b.doc_id
            WHERE a.cnt <= {bucket_cap} AND b.cnt <= {bucket_cap}
            UNION ALL
            SELECT doc_id, nxt FROM ranked
            WHERE cnt > {bucket_cap} AND nxt IS NOT NULL
        )
    )"""
    return f"""
    WITH toks AS (
        SELECT doc_id, {_SQL_TOKS} AS tk FROM documents
    ),
    sets AS (
        SELECT doc_id, sh, len(sh) AS n_sh FROM (
            SELECT doc_id,
                   list_distinct(list_transform(
                       generate_series(1, len(tk) - 2),
                       i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS sh
            FROM toks WHERE len(tk) >= 3)
        WHERE len(sh) > 0
    ),
    sh AS (SELECT doc_id, unnest(sh) AS shingle FROM sets),
    sig AS (
        SELECT doc_id, {sig_cols}
        FROM sh GROUP BY doc_id
    ),
    bands AS ({bands_sql}),{cand_ctes},
    est AS (
        SELECT doc1, doc2, round(({est_sum}) / {float(NUM_HASHES)}, 6) AS est_jaccard
        FROM cand
        JOIN sig sa ON cand.doc1 = sa.doc_id
        JOIN sig sb ON cand.doc2 = sb.doc_id
    )
    SELECT est.doc1, est.doc2, est_jaccard,
           round(len(list_intersect(a.sh, b.sh))
                 / (a.n_sh + b.n_sh - len(list_intersect(a.sh, b.sh))), 6)
               AS jaccard
    FROM est
    JOIN sets a ON est.doc1 = a.doc_id
    JOIN sets b ON est.doc2 = b.doc_id
    WHERE round(len(list_intersect(a.sh, b.sh))
                / (a.n_sh + b.n_sh - len(list_intersect(a.sh, b.sh))), 6) >= 0.2
    """


@query("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash({n}) banding -> candidate pairs -> exact-Jaccard verify.
    The scale path for near-dedup: only band-colliding docs are compared."""
    return minhash_lsh_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.2
    )


@query("dedup_minhash_capped", oracle=_minhash_oracle(bucket_cap=2))
def dedup_minhash_capped(spark, sf_dir):
    """MinHash-LSH with the hot-bucket cap engaged (cap=2 so the chain
    path runs even at sf0.01, where the largest band bucket holds 3
    docs). At corpus scale the cap is what stops boilerplate mega-buckets
    from going quadratic in the band self-join; buckets within the cap
    keep exact all-pairs semantics, oversized ones chain-link in doc_id
    order."""
    return minhash_lsh_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.2,
        bucket_cap=2,
    )


_CLUSTERS_ORACLE = (
    _SQL_JACCARD_CTES.replace("WITH ", "WITH RECURSIVE ", 1)
    + """,
    pairs AS (SELECT doc1, doc2 FROM exact WHERE jaccard >= 0.2),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM pairs
        UNION ALL SELECT doc2, doc1 FROM pairs
    ),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    """
)


@query("dedup_clusters", oracle=_CLUSTERS_ORACLE)
def dedup_clusters(spark, sf_dir):
    """Near-duplicate clustering: connected components over the 3-gram
    Jaccard pair graph (cluster_id = min doc id in component). The Spark
    side is an iterative Pregel-style min-label loop; the oracle is a
    recursive-CTE reachability closure — same deterministic fixpoint, so
    even this iterative algorithm is hash-checked."""
    from beavers_spark.functions.dedup import connected_components

    pairs = ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.2
    ).select("doc1", "doc2")
    return connected_components(pairs)


def _simhash_sig_ctes(bits: int = 16) -> str:
    """The tokenize -> per-bit sign sums -> signature CTE chain, ending
    in ``sig(doc_id, simhash)`` — shared by the signature plan and the
    banded pairs plan."""
    s_cols = ",\n           ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    sig_sum = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits)
    )
    return f"""tok AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ),
    h AS (SELECT doc_id, {_sql_hash64('token', 0)} AS h FROM tok),
    sums AS (SELECT doc_id, {s_cols} FROM h GROUP BY doc_id),
    sig AS (
        SELECT doc_id, CAST({sig_sum} AS BIGINT) AS simhash FROM sums
    )"""


def _simhash_oracle(bits: int = 16) -> str:
    return f"""
    WITH {_simhash_sig_ctes(bits)}
    SELECT doc_id, simhash FROM sig
    """


@query("dedup_simhash", oracle=_simhash_oracle())
def dedup_simhash(spark, sf_dir):
    """16-bit SimHash signatures (single pass: explode + 16 agg exprs)."""
    return simhash(t(spark, sf_dir, "documents"), "text", "doc_id", bits=16)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


def _lang_oracle() -> str:
    hit_cols = []
    for lang, markers in LANG_MARKERS.items():
        lst = ", ".join(f"'{m}'" for m in markers)
        hit_cols.append(
            f"len(list_filter(tk, w -> w IN ({lst}))) AS {lang}_hits"
        )
    hits_sql = ",\n           ".join(hit_cols)
    langs = list(LANG_MARKERS)
    best = f"greatest({', '.join(f'{lang}_hits' for lang in langs)})"
    cases = "\n        ".join(
        f"WHEN {lang}_hits > 0 AND {lang}_hits = best THEN '{lang}'"
        for lang in langs
    )
    return f"""
    WITH toks AS (SELECT doc_id, lang, {_SQL_TOKS} AS tk FROM documents),
    hits AS (SELECT doc_id, lang, {hits_sql} FROM toks),
    scored AS (SELECT *, {best} AS best FROM hits)
    SELECT doc_id, lang,
        CASE {cases} ELSE 'und' END AS pred_lang
    FROM scored
    """


@query("lang_id", oracle=_lang_oracle())
def lang_id_q(spark, sf_dir):
    """Heuristic marker-word language ID (JVM-side, no UDF)."""
    docs = t(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id(F.col("text")).alias("pred_lang"))


def _quality_oracle() -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
    WITH toks AS (
        SELECT doc_id, text, {_SQL_TOKS} AS tk FROM documents
    )
    SELECT doc_id,
           length(text) AS n_chars,
           len(tk) AS n_tokens,
           round(length(regexp_replace(text, '[^!?.,;:]', '', 'g'))
                 / greatest(length(text), 1), 6) AS punct_ratio,
           round(len(list_filter(tk, w -> w IN ({stop_list})))
                 / greatest(len(tk), 1), 6) AS stopword_ratio
    FROM toks
    """


@query("quality_score", oracle=_quality_oracle())
def quality_score_q(spark, sf_dir):
    """Document quality signals: length, tokens, punctuation + stopword
    ratios — pure codegen'd expressions."""
    docs = t(spark, sf_dir, "documents")
    qs = quality_score(F.col("text"))
    return docs.select(
        "doc_id",
        qs["n_chars"].alias("n_chars"),
        qs["n_tokens"].alias("n_tokens"),
        F.round(qs["punct_ratio"], 6).alias("punct_ratio"),
        F.round(qs["stopword_ratio"], 6).alias("stopword_ratio"),
    )


@query(
    "token_count",
    oracle="""
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\\s+'),
                           w -> w <> '')) AS n_ws_tokens,
           len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_q(spark, sf_dir):
    """Whitespace + BPE-ish regex token counting."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).alias("n_ws_tokens"),
        token_count_bpe_ish(F.col("text")).cast("int").alias("n_bpe_tokens"),
    )


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------

_ANN_ORACLE = """
WITH q AS (
    SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
    FROM embeddings WHERE vec_id < 10
),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
scored AS (
    SELECT query_id, neighbor_id,
           round(list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv))
                    * sqrt(list_dot_product(cv, cv))), 6) AS sim
    FROM c CROSS JOIN q
    WHERE query_id <> neighbor_id
)
SELECT query_id, neighbor_id, sim, rnk FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
    FROM scored)
WHERE rnk <= 10
"""


@query("ann_cosine_topk", oracle=_ANN_ORACLE)
def ann_cosine_topk(spark, sf_dir):
    """Exact cosine top-10 for 10 query vectors: broadcast queries, scan
    the corpus once, per-query window top-k."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(
        queries, emb, "vec_id", "vec_id", "embedding", k=10
    ).select("query_id", "neighbor_id", "sim", "rnk")


_COS_DEDUP_ORACLE = """
WITH a AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE vec_id % 20 = 0
),
b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id1, b.vec_id AS id2,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v))
                * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
FROM a CROSS JOIN b
WHERE a.vec_id < b.vec_id
  AND round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v))
               * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.3
"""


@query("dedup_embedding_cosine")  # approximate (LSH-banded): rows-only;
# exactness is gated by dedup_embedding_recall and the exact oracle twin
def dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs over the FULL corpus — the
    registered 100 TB path: multi-table hyperplane-LSH banding generates
    candidates via an equi-join on (table, bucket); only candidates are
    verified with the exact cosine. Compare volume ~ colliding pairs, not
    O(n^2); never a cross join (pinned by tools/audit_plans.py).

    Recall >= 0.9 vs the exact all-pairs twin is enforced hash-visibly by
    ``dedup_embedding_recall``; the probe-block exact variant survives as
    ``dedup_embedding_cosine_exact`` (the small-scale oracle twin)."""
    from beavers_spark.functions.similarity import lsh_near_dup_pairs

    emb = t(spark, sf_dir, "embeddings")
    return lsh_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.3)


@query("dedup_embedding_cosine_exact", oracle=_COS_DEDUP_ORACLE)
def dedup_embedding_cosine_exact(spark, sf_dir):
    """Exact-oracle twin of ``dedup_embedding_cosine``: a probe block
    (every 20th vector, broadcast) against the full corpus, exact cosine,
    threshold. O(n*n/20) compare volume — small-scale verification only;
    the registered scale path is the LSH-banded variant above."""
    from beavers_spark.functions.similarity import _cos, _dot, _norm

    emb = t(spark, sf_dir, "embeddings")
    parallelism = spark.sparkContext.defaultParallelism
    a = emb.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("id1"), F.col("embedding").alias("v1")
    ).withColumn("n1", _norm(F.col("v1")))
    b = (
        emb.repartition(parallelism)
        .select(F.col("vec_id").alias("id2"), F.col("embedding").alias("v2"))
        .withColumn("n2", _norm(F.col("v2")))
    )
    return (
        b.crossJoin(F.broadcast(a))
        .filter(F.col("id1") < F.col("id2"))
        .withColumn(
            "sim",
            F.round(
                _cos(_dot(F.col("v1"), F.col("v2")),
                     F.col("n1"), F.col("n2")), 6),
        )
        .filter(F.col("sim") >= 0.3)
        .select("id1", "id2", "sim")
    )


@query(
    "dedup_embedding_recall",
    oracle="SELECT 'embedding_pair_recall_ge_0.9' AS metric, TRUE AS passed",
)
def dedup_embedding_recall(spark, sf_dir):
    """Quantitative gate for the approximate LSH pair-dedup: pair recall
    vs the exact all-pairs set, thresholded at 0.9 and emitted as a
    boolean so the driver's hash compare goes red the moment a parameter
    change drops recall. The exact side is all-pairs — affordable at
    gate scale only (the gate runs where CORRECTNESS runs)."""
    from beavers_spark.functions.similarity import (
        _cos,
        _dot,
        _norm,
        lsh_near_dup_pairs,
    )

    emb = t(spark, sf_dir, "embeddings")
    base = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("v")
    ).withColumn("n", _norm(F.col("v")))
    a, b = base.alias("a"), base.alias("b")
    exact = (
        a.crossJoin(b)
        .filter(F.col("a.id") < F.col("b.id"))
        .withColumn(
            "sim",
            F.round(
                _cos(_dot(F.col("a.v"), F.col("b.v")),
                     F.col("a.n"), F.col("b.n")), 6
            ),
        )
        .filter(F.col("sim") >= 0.3)
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
    )
    approx = lsh_near_dup_pairs(emb, "vec_id", "embedding", threshold=0.3).select(
        "id1", "id2"
    )
    hit = approx.join(exact, ["id1", "id2"], "inner")
    return exact.agg(F.count(F.lit(1)).alias("n_exact")).crossJoin(
        hit.agg(F.count(F.lit(1)).alias("n_hit"))
    ).select(
        F.lit("embedding_pair_recall_ge_0.9").alias("metric"),
        (F.col("n_hit") >= F.lit(0.9) * F.col("n_exact")).alias("passed"),
    )


@query("semantic_dedup")  # no SQL oracle: the k-means quantizer is not
# SQL-expressible; invariants are gated hash-visibly by semantic_dedup_check
def semantic_dedup_plan(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means cells -> within-cell cosine
    pairs -> one keeper per duplicate group (lowest centroid similarity).
    Pairwise compare volume is bounded per cell (equi-join on cell id,
    never a cross join — pinned by tools/audit_plans.py); the quantizer
    trains on a bounded driver-side sample. Deterministic for the fixed
    seed, but numpy k-means has no DuckDB twin — rows-only here, with the
    structural invariants enforced by ``semantic_dedup_check``."""
    from beavers_spark.functions.semdedup import semantic_dedup

    emb = t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, "vec_id", "embedding", n_cells=8, threshold=0.3
    )


@query(
    "semantic_dedup_check",
    oracle="SELECT 'semantic_dedup_invariants' AS metric, TRUE AS passed",
)
def semantic_dedup_check_plan(spark, sf_dir):
    """Hash-visible gate for ``semantic_dedup``: one keeper per duplicate
    group, groups >= 2 members, singletons kept, verdicts partition the
    corpus, and at least one duplicate actually dropped."""
    from beavers_spark.functions.semdedup import semantic_dedup_check

    emb = t(spark, sf_dir, "embeddings")
    # require_drop: this synthetic corpus is known-redundant at 0.3, so
    # zero drops would mean the pairwise stage silently broke
    return semantic_dedup_check(
        emb, "vec_id", "embedding", n_cells=8, threshold=0.3,
        require_drop=True,
    )


@query("ann_lsh_topk")  # no SQL oracle: approximate op, rows-only check
def ann_lsh_topk(spark, sf_dir):
    """Multi-table hyperplane-LSH ANN — the 100 TB scale path (equi-join
    on (table, bucket) instead of a cross join; 16 independent 3-plane
    tables give recall@10 >= 0.9 even on this weakly-clustered synthetic
    corpus, gated hash-visibly by ``ann_lsh_recall``). Approximate by
    construction, so no SQL oracle on the result rows themselves."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_bucketed_topk(
        queries, emb, "vec_id", "vec_id", "embedding",
        k=10, dim=64, n_planes=3, n_tables=16, multi_probe=False,
    ).select("query_id", "neighbor_id", "sim", "rnk")


@query("ann_ivf_topk")  # no SQL oracle: approximate op, rows-only check
def ann_ivf_topk(spark, sf_dir):
    """IVF ANN: KMeans-quantized corpus cells with 2-way multi-assignment
    (boundary vectors are indexed in both adjacent cells), queries probe
    the 5 best cells by centroid cosine, exact rerank inside — candidate
    generation is an equi-join on cell id, never a cross join. Recall@10
    >= 0.9 is gated hash-visibly by ``ann_ivf_recall`` (n_probe=4
    measured 0.88 at sf0.001 — just under the gate on a 500-vector
    near-uniform corpus; 5 measures 0.99 at every SF). On a real
    (clustered) corpus the same shape runs at n_cells=4096, n_probe~32
    for a ~1% scan fraction; this synthetic corpus is near-uniform, the
    adversarial case for any quantizer."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_topk(
        queries, emb, "vec_id", "vec_id", "embedding",
        k=10, n_cells=8, n_probe=5, n_assign=2,
    ).select("query_id", "neighbor_id", "sim", "rnk")


def _ann_recall_gate(spark, sf_dir, approx_fn, metric: str, gate: float):
    """Shared recall@10 gate: |approx ∩ exact| / |exact| over the 10 query
    vectors, emitted as (metric, passed) so hash-compare enforces it."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(
        queries, emb, "vec_id", "vec_id", "embedding", k=10
    ).select("query_id", "neighbor_id")
    approx = approx_fn(queries, emb).select("query_id", "neighbor_id")
    hit = approx.join(exact, ["query_id", "neighbor_id"], "inner")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            F.lit(metric).alias("metric"),
            (F.col("n_hit") >= F.lit(gate) * F.col("n_exact")).alias("passed"),
        )
    )


@query(
    "ann_lsh_recall",
    oracle="SELECT 'ann_lsh_recall_at_10_ge_0.9' AS metric, TRUE AS passed",
)
def ann_lsh_recall(spark, sf_dir):
    """Recall@10 gate for the hyperplane-LSH ANN path (>= 0.9 vs brute
    force), hash-visible to the driver so the approximate plan can never
    silently degrade."""
    return _ann_recall_gate(
        spark,
        sf_dir,
        lambda q, c: lsh_bucketed_topk(
            q, c, "vec_id", "vec_id", "embedding",
            k=10, dim=64, n_planes=3, n_tables=16, multi_probe=False,
        ),
        "ann_lsh_recall_at_10_ge_0.9",
        0.9,
    )


@query("ann_knn_join")  # no SQL oracle: approximate op, rows-only check
def ann_knn_join(spark, sf_dir):
    """Corpus-scale k-NN self-join: every document's top-5 cosine
    neighbors, queries = the whole corpus — the retrieval / near-dup
    graph shape. LSH banding with a SHUFFLE (table, bucket) equi-join
    (nothing broadcastable when both sides are corpus-sized); recall@5
    >= 0.9 gated hash-visibly by ``ann_knn_join_recall``."""
    emb = t(spark, sf_dir, "embeddings")
    return knn_join(
        emb, "vec_id", "embedding", k=5,
        dim=64, n_planes=3, n_tables=16,
    ).select("query_id", "neighbor_id", "sim", "rnk")


@query(
    "ann_knn_join_recall",
    oracle="SELECT 'ann_knn_join_recall_at_5_ge_0.9' AS metric, TRUE AS passed",
)
def ann_knn_join_recall(spark, sf_dir):
    """Recall@5 gate for the corpus-scale k-NN join (>= 0.9 vs the
    brute-force all-pairs top-5; measured 0.978 at sf0.01),
    hash-visible to the driver."""
    emb = t(spark, sf_dir, "embeddings")
    approx = knn_join(
        emb, "vec_id", "embedding", k=5, dim=64, n_planes=3, n_tables=16,
    ).select("query_id", "neighbor_id")
    exact = brute_force_topk(
        emb, emb, "vec_id", "vec_id", "embedding", k=5
    ).select("query_id", "neighbor_id")
    hit = approx.join(exact, ["query_id", "neighbor_id"], "inner")
    return (
        exact.agg(F.count(F.lit(1)).alias("n_exact"))
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            F.lit("ann_knn_join_recall_at_5_ge_0.9").alias("metric"),
            (F.col("n_hit") >= 0.9 * F.col("n_exact")).alias("passed"),
        )
    )


_KNN_JOIN_TWIN_ORACLE = """
WITH s AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    WHERE vec_id % 5 = 0
),
scored AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           round(list_dot_product(a.v, b.v)
                 / (sqrt(list_dot_product(a.v, a.v))
                    * sqrt(list_dot_product(b.v, b.v))), 6) AS sim
    FROM s a CROSS JOIN s b
    WHERE a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, sim, rnk FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rnk
    FROM scored)
WHERE rnk <= 5
"""


@query("ann_knn_join_exact_twin", oracle=_KNN_JOIN_TWIN_ORACLE)
def ann_knn_join_exact_twin(spark, sf_dir):
    """Exact-equivalence gate for the corpus-scale k-NN self-join: with
    EXHAUSTIVE banding parameters (1 hyperplane, multi-probe) every
    query probes both buckets, so the candidate universe is all pairs
    and ``knn_join``'s banded shuffle-join result must equal brute-force
    k-NN row-for-row — checked against a full-value DuckDB oracle on a
    corpus slice. Complements ``ann_knn_join_recall`` (which gates the
    production n_planes=3/n_tables=16 configuration)."""
    emb = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    return knn_join(
        emb, "vec_id", "embedding", k=5,
        dim=64, n_planes=1, n_tables=1, multi_probe=True,
    ).select("query_id", "neighbor_id", "sim", "rnk")


_AGREE_ORACLE = """
SELECT vec_id AS query_id, TRUE AS agree
FROM embeddings WHERE vec_id < 10
"""


@query("ann_lsh_exact_twin", oracle=_AGREE_ORACLE)
def ann_lsh_exact_twin(spark, sf_dir):
    """Exact-equivalence gate for the hyperplane-LSH path: per query,
    asserts ``lsh_bucketed_topk``'s full (neighbor, sim, rnk) result
    equals an independently-built exact top-k over the same candidate
    universe — pairs sharing a (table, bucket) key, rebuilt as combined
    key ARRAYS and one arrays_overlap broadcast pass (no posexplode, no
    equi-join, no dedup shared with the operator). Holds exactly at any
    scale: the operator's rerank is already exact over bucket-mates."""
    from beavers_spark.functions.similarity import lsh_exact_twin

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_exact_twin(
        queries, emb, "vec_id", "vec_id", "embedding",
        k=10, dim=64, n_planes=3, n_tables=16, multi_probe=False,
    )


@query("ann_ivf_exact_twin", oracle=_AGREE_ORACLE)
def ann_ivf_exact_twin(spark, sf_dir):
    """Exact-equivalence gate for the IVF path: per query, asserts
    ``ivf_topk``'s full (neighbor, sim, rnk) result equals an
    independently-built exact top-k over every corpus vector whose cell
    assignment intersects the query's probe set (arrays_overlap
    broadcast pass — no equi-join machinery shared with the operator).
    Holds exactly at any scale: the rerank is already exact cosine over
    all candidates."""
    from beavers_spark.functions.similarity import ivf_exact_twin

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_exact_twin(
        queries, emb, "vec_id", "vec_id", "embedding",
        k=10, n_cells=8, n_probe=5, n_assign=2,
    )


@query(
    "ann_ivf_recall",
    oracle="SELECT 'ann_ivf_recall_at_10_ge_0.9' AS metric, TRUE AS passed",
)
def ann_ivf_recall(spark, sf_dir):
    """Recall@10 gate for the IVF ANN path (>= 0.9 vs brute force at
    n_cells=8, n_probe=5, n_assign=2 — the registered configuration;
    measured 0.99 at sf0.001/0.01), hash-visible to the driver."""
    return _ann_recall_gate(
        spark,
        sf_dir,
        lambda q, c: ivf_topk(
            q, c, "vec_id", "vec_id", "embedding",
            k=10, n_cells=8, n_probe=5, n_assign=2,
        ),
        "ann_ivf_recall_at_10_ge_0.9",
        0.9,
    )


@query("ann_pq_topk", oracle=_ANN_ORACLE)
def ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN: the corpus scan reads m=16 6-bit codes
    per vector instead of the 64-float embedding (the compressed-scan
    scale path — at 1024-dim float32 a ~100× scan reduction), scored by
    ADC lookup tables inside one mapInPandas pass with per-partition
    top-r reduction, then exact-cosine refined for candidate ids only.

    Carries the FULL brute-force SQL oracle (VERDICT r4 item 3): with
    ``scan_partitions`` pinned to 32 the candidate keep is deterministic
    in any session, and exactness needs EVERY scan partition to hold
    <= refine*k rows so no ADC keep ever prunes — hash partitioning is
    only even on average, so ``strict_exact`` turns that bound into a
    loud per-partition assertion (review r6) rather than trusting the
    average case: a data/scale shift past the margin fails with an
    actionable message instead of silently breaking the oracle.
    Verified equal to brute force at sf0.001/0.01/0.1. Past that scale
    the op is approximate by design; ``ann_pq_recall`` gates that
    regime (without strict_exact)."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return pq_topk(
        queries, emb, "vec_id", "vec_id", "embedding",
        k=10, m=16, nbits=6, refine=16, scan_partitions=32,
        strict_exact=True,
    ).select("query_id", "neighbor_id", "sim", "rnk")


@query(
    "ann_pq_recall",
    oracle="SELECT 'ann_pq_recall_at_10_ge_0.9' AS metric, TRUE AS passed",
)
def ann_pq_recall(spark, sf_dir):
    """Recall@10 gate for the PQ ANN path (>= 0.9 vs brute force at
    m=16, nbits=6, refine=16 — the registered configuration; measured
    0.98 at sf0.1, 1.0 at sf0.01/sf0.001 on the near-uniform synthetic
    corpus, the adversarial case for any quantizer), hash-visible to
    the driver."""
    return _ann_recall_gate(
        spark,
        sf_dir,
        lambda q, c: pq_topk(
            q, c, "vec_id", "vec_id", "embedding",
            k=10, m=16, nbits=6, refine=16, scan_partitions=32,
        ),
        "ann_pq_recall_at_10_ge_0.9",
        0.9,
    )


@query("ann_ivfpq_topk")  # no SQL oracle: approximate op, rows-only check
def ann_ivfpq_topk(spark, sf_dir):
    """IVF-PQ ANN — both scale levers composed: queries probe 5 of 8
    cells (2-way multi-assignment covers boundary vectors) so the scan
    prunes WHICH vectors are scored, and PQ codes shrink WHAT it reads;
    ADC scoring masks each query to its probed cells inside one
    mapInPandas pass, exact-cosine refine on candidate ids only.
    Recall@10 >= 0.9 gated hash-visibly by ``ann_ivfpq_recall``."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_topk(
        queries, emb, "vec_id", "vec_id", "embedding",
        k=10, n_cells=8, n_probe=5, n_assign=2, m=16, nbits=6, refine=16,
        scan_partitions=32,
    ).select("query_id", "neighbor_id", "sim", "rnk")


@query(
    "ann_ivfpq_recall",
    oracle="SELECT 'ann_ivfpq_recall_at_10_ge_0.9' AS metric, TRUE AS passed",
)
def ann_ivfpq_recall(spark, sf_dir):
    """Recall@10 gate for the IVF-PQ path (>= 0.9 vs brute force at the
    registered configuration; measured 0.96 at sf0.1, 0.99 at sf0.01),
    hash-visible to the driver."""
    return _ann_recall_gate(
        spark,
        sf_dir,
        lambda q, c: ivfpq_topk(
            q, c, "vec_id", "vec_id", "embedding",
            k=10, n_cells=8, n_probe=5, n_assign=2, m=16, nbits=6,
            refine=16, scan_partitions=32,
        ),
        "ann_ivfpq_recall_at_10_ge_0.9",
        0.9,
    )


@query(
    "ann_ivfpq_exact_twin",
    oracle="""
    SELECT vec_id AS query_id, TRUE AS agree
    FROM embeddings WHERE vec_id < 10
    """,
)
def ann_ivfpq_exact_twin(spark, sf_dir):
    """Exact-equivalence gate for the IVF-PQ path (VERDICT r4 item 3):
    per query, asserts ``ivfpq_topk``'s full (neighbor, sim, rnk) result
    equals an independently-built exact brute-force top-k over the SAME
    probed cells — query vectors joined to every corpus vector whose
    cell assignment intersects the query's probe set, exact cosine,
    window top-k; no ADC, no shared refine path. Pins rank order and
    similarity values hash-visibly (stronger than the recall gate, which
    only checks set overlap vs the unrestricted brute force)."""
    from beavers_spark.functions.similarity import ivfpq_exact_twin

    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_exact_twin(
        queries, emb, "vec_id", "vec_id", "embedding",
        k=10, n_cells=8, n_probe=5, n_assign=2, m=16, nbits=6, refine=16,
        scan_partitions=32,
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (payload = utf-8 bytes of text as a stand-in blob)
# ---------------------------------------------------------------------------


@query(
    "binary_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha
    FROM documents
    """,
)
def binary_meta(spark, sf_dir):
    """Opaque-binary column handling: byte length + content digest computed
    JVM-side; the decode path (Pandas UDF plumbing) is exercised in tests
    with an injected fake decoder (no image libs in this container)."""
    docs = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )


@query(
    "wav_meta",
    oracle="""
    WITH params AS (
        SELECT doc_id,
               (1 + doc_id % 2)::INT AS channels,
               ([8000, 16000, 22050, 44100][(doc_id % 4)::INT + 1])::BIGINT
                   AS sample_rate,
               ([8, 16][((doc_id // 2) % 2)::INT + 1])::INT
                   AS bits_per_sample,
               octet_length(encode(substr(text, 1, 200)))::BIGINT AS dlen
        FROM documents
    )
    SELECT doc_id, 'wav' AS format, channels, sample_rate,
           bits_per_sample,
           floor(dlen * 1000.0
                 / (sample_rate * channels * (bits_per_sample // 8))
           )::BIGINT AS duration_ms,
           (44 + dlen)::BIGINT AS n_bytes
    FROM params
    """,
)
def wav_meta_q(spark, sf_dir):
    """REAL multimodal decode, hash-checked end to end: build a canonical
    44-byte-header PCM WAV blob per document (deterministic parameters
    from doc_id, utf-8 text bytes as the sample payload), then parse the
    binary back with pure Column byte math — fixed RIFF offsets,
    little-endian field reconstruction, no UDF anywhere. The DuckDB
    oracle recomputes the metadata by independent arithmetic, so a
    build/parse disagreement on any field fails the hash; the byte
    layout itself is pinned against Python's stdlib ``wave`` decoder in
    tests (functions/multimodal.py synth_wav/wav_meta)."""
    from beavers_spark.functions.multimodal import synth_wav, wav_meta

    docs = t(spark, sf_dir, "documents")
    wavs = docs.select(
        "doc_id",
        synth_wav(
            F.encode(F.substring("text", 1, 200), "UTF-8"),
            1 + F.pmod("doc_id", F.lit(2)),
            F.element_at(
                F.array(*[F.lit(x) for x in (8000, 16000, 22050, 44100)]),
                (F.pmod("doc_id", F.lit(4)) + 1).cast("int"),
            ),
            F.element_at(
                F.array(F.lit(8), F.lit(16)),
                (F.pmod(F.floor(F.col("doc_id") / 2), F.lit(2)) + 1).cast(
                    "int"
                ),
            ),
        ).alias("payload"),
    )
    return wav_meta(wavs, "payload").select(
        "doc_id", "format", "channels",
        F.col("sample_rate").cast("bigint").alias("sample_rate"),
        "bits_per_sample", "duration_ms", "n_bytes",
    )


def _le2_hex(v: int) -> str:
    """Little-endian int16 hex of a (two's-complement) sample value."""
    v &= 0xFFFF
    return f"{v & 0xFF:02X}{v >> 8:02X}"


#: The shared PCM16 corpus — sample i of doc d = (d*31 + i*7) % 2001
#: - 1000 — walks Z_2001 with stride 7, so the whole sample stream is
#: a contiguous run of the stride-7 ORBIT o(j) = (7j) % 2001 starting
#: at orbit index j0 = (d*31) * 7^-1 = d*862 (mod 2001; 7*286 = 1
#: mod 2001, 31*286 = 862 mod 2001). One substring over the doubled
#: orbit literal replaces the per-sample transform+_le_hex chain
#: (r13 — the _ppm_pixels cycle rewrite generalized to a strided
#: modulus; byte-identical, pinned by tests/test_synth_generators.py)
_PCM16_ORBIT_HEX = "".join(
    _le2_hex((7 * j) % 2001 - 1000) for j in range(2001)
) * 2


def _pcm16_payload_hex(n):
    """Hex string Column of doc_id's first ``n`` PCM16 corpus samples
    (callers unhex; n must stay <= 2001 — every plan uses n <= 99)."""
    j0 = F.pmod(F.col("doc_id") * 862, F.lit(2001))
    return F.substring(
        F.lit(_PCM16_ORBIT_HEX),
        (j0 * 4 + 1).cast("int"),
        (n * 4).cast("int"),
    )


#: The shared u-law byte corpus — byte j of doc d = (d*13 + j*17) %
#: 256 — same orbit construction with stride 17 on Z_256 (17*241 = 1
#: mod 256, 13*241 = 61 mod 256)
_ULAW_ORBIT_HEX = "".join(
    f"{(17 * j) % 256:02X}" for j in range(256)
) * 2


def _ulaw_payload_hex(n):
    """Hex string Column of doc_id's first ``n`` u-law corpus bytes
    (n <= 256; every plan uses n <= 99)."""
    j0 = F.pmod(F.col("doc_id") * 61, F.lit(256))
    return F.substring(
        F.lit(_ULAW_ORBIT_HEX),
        (j0 * 2 + 1).cast("int"),
        (n * 2).cast("int"),
    )


@query(
    "wav_stats",
    oracle="""
    WITH params AS (
        SELECT doc_id, (50 + doc_id % 50)::BIGINT AS n FROM documents
    ),
    samples AS (
        SELECT doc_id, i,
               ((doc_id * 31 + i * 7) % 2001 - 1000)::DOUBLE AS v
        FROM (SELECT doc_id,
                     unnest(generate_series(0, n - 1)) AS i
              FROM params)
    ),
    lagged AS (
        SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        FROM samples
    )
    SELECT doc_id, count(*)::BIGINT AS n_samples,
           max(abs(v))::BIGINT AS peak,
           round(sqrt(avg(v * v)), 6) AS rms,
           coalesce(
               sum(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END), 0
           )::BIGINT AS zcr
    FROM lagged GROUP BY doc_id
    """,
)
def wav_stats_q(spark, sf_dir):
    """The first PAYLOAD-level multimodal decode, hash-checked end to
    end (VERDICT r8 item 6): build a 16-bit mono PCM WAV per document
    whose samples are a deterministic function of doc_id (pure Column
    byte math — sequence -> int16 two's-complement LE hex -> unhex),
    then decode the samples BACK from the binary with the Arrow-batched
    ``wav_stats`` kernel (numpy frombuffer per blob) and aggregate
    count/peak/RMS/zero-crossings. The DuckDB oracle recomputes the
    statistics by
    independent arithmetic on the same sample VALUES — it never sees
    the bytes — so a build- or decode-side error on any sample fails
    the hash (functions/multimodal.py synth_wav/wav_stats)."""
    from beavers_spark.functions.multimodal import (
        _le_hex,
        synth_wav,
        wav_stats,
    )

    docs = t(spark, sf_dir, "documents")
    n = F.lit(50) + F.pmod("doc_id", F.lit(50))
    # one substring over the stride-7 orbit literal (see
    # _pcm16_payload_hex) instead of a per-sample transform chain
    wavs = docs.select(
        "doc_id",
        synth_wav(
            F.unhex(_pcm16_payload_hex(n)),
            F.lit(1), F.lit(16000), F.lit(16),
        ).alias("payload"),
    )
    return wav_stats(wavs, "payload").select(
        "doc_id", "n_samples", "peak", "rms", "zcr"
    )


@query(
    "wav_segment_stats",
    oracle="""
    WITH params AS (
        SELECT doc_id, (50 + doc_id % 50)::BIGINT AS n FROM documents
    ),
    samples AS (
        SELECT doc_id, i,
               ((doc_id * 31 + i * 7) % 2001 - 1000)::DOUBLE AS v
        FROM (SELECT doc_id,
                     unnest(generate_series(0, n - 1)) AS i
              FROM params)
    ),
    lagged AS (
        SELECT doc_id, i, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        FROM samples
    )
    SELECT doc_id, (i // 16)::INT AS seg_idx,
           count(*)::BIGINT AS n_samples,
           max(abs(v))::BIGINT AS peak,
           round(sqrt(avg(v * v)), 6) AS rms,
           coalesce(
               sum(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END), 0
           )::BIGINT AS zcr
    FROM lagged GROUP BY doc_id, i // 16
    """,
)
def wav_segment_stats_q(spark, sf_dir):
    """WINDOWED audio features, hash-checked end to end (VERDICT r9
    item 7): the wav_stats synth corpus decoded into fixed 16-sample
    segments — per (doc, segment) count/peak/RMS/zero-crossings, one
    row per segment (segments-as-rows, the avi_frames scale shape; the
    blob is read once and the fan-out is a map-side explode). The
    DuckDB oracle recomputes every segment by independent arithmetic on
    the sample VALUES — a lag window grouped by ``i // 16``, which is
    exactly the kernel's crossing-belongs-to-its-later-sample ZCR
    convention — and never sees bytes
    (functions/multimodal.py wav_segment_stats)."""
    from beavers_spark.functions.multimodal import (
        _le_hex,
        synth_wav,
        wav_segment_stats,
    )

    docs = t(spark, sf_dir, "documents")
    n = F.lit(50) + F.pmod("doc_id", F.lit(50))
    # one substring over the stride-7 orbit literal (see
    # _pcm16_payload_hex) instead of a per-sample transform chain
    wavs = docs.select(
        "doc_id",
        synth_wav(
            F.unhex(_pcm16_payload_hex(n)),
            F.lit(1), F.lit(16000), F.lit(16),
        ).alias("payload"),
    )
    return wav_segment_stats(wavs, "payload", seg_samples=16).select(
        "doc_id", "seg_idx", "n_samples", "peak", "rms", "zcr"
    )


@query(
    "wav_resample",
    oracle="""
    WITH params AS (
        SELECT doc_id, (50 + doc_id % 50)::BIGINT AS n,
               (2 + doc_id % 3)::BIGINT AS f
        FROM documents
    ),
    kept AS (
        SELECT doc_id, f, i,
               ((doc_id * 31 + i * f * 7) % 2001 - 1000)::DOUBLE AS v
        FROM (SELECT doc_id, f,
                     unnest(generate_series(0, (n + f - 1) // f - 1))
                         AS i
              FROM params)
    ),
    lagged AS (
        SELECT doc_id, f, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
        FROM kept
    )
    SELECT doc_id, (16000 // f)::INT AS out_rate,
           count(*)::BIGINT AS n_samples,
           max(abs(v))::BIGINT AS peak,
           round(sqrt(avg(v * v)), 6) AS rms,
           coalesce(
               sum(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END), 0
           )::BIGINT AS zcr
    FROM lagged GROUP BY doc_id, f
    """,
)
def wav_resample_q(spark, sf_dir):
    """A REAL audio resample, hash-checked through a CHAIN of payload
    kernels (the audio sibling of ``ppm_resize``'s decode ->
    transform -> feature-extract pipeline): build the deterministic
    16-bit PCM payloads, decimate each by a per-doc factor
    (``wav_resample`` — numpy strided slice, output is itself a
    canonical PCM WAV with the rate divided so duration is
    preserved), then run ``wav_stats`` on the RESAMPLED binary. The
    oracle recomputes which input samples survive (positions i*f) and
    their stats — including the zero-crossing count on the DECIMATED
    sequence, which differs from the input's — by independent
    arithmetic; it never sees bytes on either side of the chain
    (functions/multimodal.py wav_resample)."""
    from beavers_spark.functions.multimodal import (
        _le_hex,
        synth_wav,
        wav_resample,
        wav_stats,
    )

    docs = t(spark, sf_dir, "documents")
    n = F.lit(50) + F.pmod("doc_id", F.lit(50))
    # one substring over the stride-7 orbit literal (see
    # _pcm16_payload_hex) instead of a per-sample transform chain
    wavs = docs.select(
        "doc_id",
        synth_wav(
            F.unhex(_pcm16_payload_hex(n)),
            F.lit(1), F.lit(16000), F.lit(16),
        ).alias("payload"),
    )
    rs = wav_resample(
        wavs, "payload", F.lit(2) + F.pmod("doc_id", F.lit(3))
    ).select("doc_id", "out_rate", "resampled")
    return wav_stats(rs, "resampled").select(
        "doc_id", "out_rate", "n_samples", "peak", "rms", "zcr"
    )


@query(
    "wav_ulaw_decode",
    oracle="""
    WITH params AS (
        SELECT doc_id, (60 + doc_id % 40)::BIGINT AS n FROM documents
    ),
    enc AS (
        SELECT doc_id, j,
               ((doc_id * 13 + j * 17) % 256)::BIGINT AS eb
        FROM (SELECT doc_id,
                     unnest(generate_series(0, n - 1)) AS j
              FROM params)
    ),
    dec AS (
        SELECT doc_id, j,
               (CASE WHEN u >= 128 THEN 132 - t
                     ELSE t - 132 END)::DOUBLE AS v
        FROM (SELECT doc_id, j, u,
                     ((u % 16) * 8 + 132)
                     * (1::BIGINT << ((u // 16) % 8)::INT) AS t
              FROM (SELECT doc_id, j, 255 - eb AS u FROM enc))
    ),
    lagged AS (
        SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
        FROM dec
    )
    SELECT doc_id, 8000::INT AS out_rate,
           count(*)::BIGINT AS n_samples,
           max(abs(v))::BIGINT AS peak,
           round(sqrt(avg(v * v)), 6) AS rms,
           coalesce(
               sum(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END), 0
           )::BIGINT AS zcr
    FROM lagged GROUP BY doc_id
    """,
)
def wav_ulaw_decode_q(spark, sf_dir):
    """A REAL second audio codec, hash-checked end to end (VERDICT r10
    item 8): build fmt-code-7 G.711 u-law WAVs whose stored bytes are
    a deterministic function of doc_id, EXPAND them with the
    closed-form CCITT formula (``wav_ulaw_decode`` — three vectorized
    numpy ops per blob, output itself a canonical PCM16 WAV), then run
    ``wav_stats`` on the DECODED binary — decode -> feature-extract
    chaining, the same discipline as ``wav_resample``'s plan. The
    oracle recomputes every expanded sample value by independent
    integer arithmetic (complement, mantissa/exponent split, shift,
    bias — it never sees bytes on either side), so a header-, walk-,
    or expansion-side error on any sample fails the hash. This is the
    one compressed-audio decode that is exactly oracle-able in this
    container; JPEG/MP3/H.264 remain injection boundaries
    (functions/multimodal.py wav_ulaw_decode)."""
    from beavers_spark.functions.multimodal import (
        synth_wav,
        wav_stats,
        wav_ulaw_decode,
    )

    docs = t(spark, sf_dir, "documents")
    n = F.lit(60) + F.pmod("doc_id", F.lit(40))
    # one substring over the stride-17 orbit literal (see
    # _ulaw_payload_hex) instead of a per-byte transform chain
    wavs = docs.select(
        "doc_id",
        synth_wav(
            F.unhex(_ulaw_payload_hex(n)),
            F.lit(1), F.lit(8000), F.lit(8), F.lit(7),
        ).alias("payload"),
    )
    dec = wav_ulaw_decode(wavs, "payload").select(
        "doc_id", "out_rate", "decoded"
    )
    return wav_stats(dec, "decoded").select(
        "doc_id", "out_rate", "n_samples", "peak", "rms", "zcr"
    )


_IMA_STEPS_SQL = (
    "[7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,55,"
    "60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,"
    "307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,"
    "1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,"
    "4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,"
    "13899,15289,16818,18500,20350,22385,24623,27086,29794,32767]"
)
_IMA_ADJ_SQL = "[-1,-1,-1,-1,2,4,6,8,-1,-1,-1,-1,2,4,6,8]"


@query(
    "wav_adpcm_decode",
    oracle=f"""
    WITH RECURSIVE params AS (
        SELECT doc_id,
               (60 + (doc_id % 20) * 2)::BIGINT AS n,
               ((doc_id * 97) % 2048 - 1024)::BIGINT AS pred0,
               (doc_id % 89)::BIGINT AS idx0
        FROM documents
    ),
    rec AS (
        SELECT doc_id, n, -1::BIGINT AS j, pred0 AS pred, idx0 AS idx
        FROM params
        UNION ALL
        SELECT doc_id, n, j,
               GREATEST(-32768, LEAST(32767,
                   pred + CASE WHEN nb >= 8 THEN -diff ELSE diff END)),
               GREATEST(0, LEAST(88, idx + adj))
        FROM (
            SELECT *,
                   (step // 8)
                   + CASE WHEN nb % 2 = 1 THEN step // 4 ELSE 0 END
                   + CASE WHEN (nb // 2) % 2 = 1
                          THEN step // 2 ELSE 0 END
                   + CASE WHEN (nb // 4) % 2 = 1
                          THEN step ELSE 0 END AS diff,
                   ({_IMA_ADJ_SQL})[(nb + 1)::INT] AS adj
            FROM (
                SELECT doc_id, n, j + 1 AS j, pred, idx,
                       ({_IMA_STEPS_SQL})[(idx + 1)::INT] AS step,
                       ((doc_id * 11 + (j + 1) * (j + 1) * 3) % 16)
                       AS nb
                FROM rec WHERE j + 1 < n
            )
        )
    ),
    lagged AS (
        SELECT doc_id, pred,
               lag(pred) OVER (PARTITION BY doc_id ORDER BY j) AS pp
        FROM rec
    )
    SELECT doc_id, 8000::INT AS out_rate,
           count(*)::BIGINT AS n_samples,
           max(abs(pred))::BIGINT AS peak,
           round(sqrt(avg((pred * pred)::DOUBLE)), 6) AS rms,
           coalesce(
               sum(CASE WHEN pred * pp < 0 THEN 1 ELSE 0 END), 0
           )::BIGINT AS zcr
    FROM lagged GROUP BY doc_id
    """,
)
def wav_adpcm_decode_q(spark, sf_dir):
    """A THIRD audio codec, hash-checked end to end (VERDICT r11
    item 8): build fmt-code-17 IMA ADPCM WAVs — 4-byte state header
    (initial predictor + step index) + 4-bit nibbles that are a
    deterministic function of doc_id — EXPAND them with the stateful
    IMA recursion (``wav_adpcm_decode`` — the time axis walked once,
    vectorized across every block of the Arrow batch), then run
    ``wav_stats`` on the DECODED binary: decode -> feature-extract
    chaining, the u-law plan's discipline. The oracle replays the SAME
    predictor/step recursion in SQL (a recursive CTE over the sample
    index — DuckDB iterates all docs one time step per round) and
    never sees bytes on either side, so a header-, packing-, table-,
    clamp-, or state-ordering error on any sample fails the hash.
    Unlike u-law this pins STATEFUL decode: every sample depends on
    the entire nibble prefix (functions/multimodal.py
    wav_adpcm_decode)."""
    from beavers_spark.functions.multimodal import (
        _le_hex,
        synth_wav,
        wav_adpcm_decode,
        wav_stats,
    )

    docs = t(spark, sf_dir, "documents")
    n = F.lit(60) + F.pmod("doc_id", F.lit(20)) * 2  # even, 60..98
    pred0 = F.pmod(F.col("doc_id") * 97, F.lit(2048)) - F.lit(1024)
    idx0 = F.pmod("doc_id", F.lit(89))
    # block header: int16 LE predictor (two's complement), uint8 step
    # index, reserved 0
    hdr_hex = F.concat(
        _le_hex(pred0.bitwiseAND(F.lit(0xFFFF)), 2),
        _le_hex(idx0, 1),
        F.lit("00"),
    )

    def nb(j):
        return F.pmod(F.col("doc_id") * 11 + j * j * 3, F.lit(16))

    kidx = F.sequence(
        F.lit(0).cast("bigint"), (n / 2 - 1).cast("bigint")
    )
    body_hex = F.transform(
        kidx, lambda k: _le_hex(nb(2 * k) + nb(2 * k + 1) * 16, 1)
    )
    data = F.unhex(F.concat(hdr_hex, F.array_join(body_hex, "")))
    wavs = docs.select(
        "doc_id",
        synth_wav(
            data, F.lit(1), F.lit(8000), F.lit(4), F.lit(17),
            block_align_col=F.octet_length(data),
        ).alias("payload"),
    )
    dec = wav_adpcm_decode(wavs, "payload").select(
        "doc_id", "out_rate", "decoded"
    )
    return wav_stats(dec, "decoded").select(
        "doc_id", "out_rate", "n_samples", "peak", "rms", "zcr"
    )


@query(
    "wav_transcode_stats",
    oracle=f"""
    WITH RECURSIVE pcm AS (
        SELECT doc_id, j,
               ((doc_id * 31 + j * 7) % 2001 - 1000)::BIGINT AS v
        FROM (SELECT doc_id,
                     unnest(generate_series(
                         0, 49 + doc_id % 30)) AS j
              FROM documents WHERE doc_id % 3 = 0)
    ),
    ulaw AS (
        SELECT doc_id, j,
               (CASE WHEN u >= 128 THEN 132 - t
                     ELSE t - 132 END)::BIGINT AS v
        FROM (SELECT doc_id, j, u,
                     ((u % 16) * 8 + 132)
                     * (1::BIGINT << ((u // 16) % 8)::INT) AS t
              FROM (SELECT doc_id, j,
                           255 - (doc_id * 13 + j * 17) % 256 AS u
                    FROM (SELECT doc_id,
                                 unnest(generate_series(
                                     0, 59 + doc_id % 40)) AS j
                          FROM documents WHERE doc_id % 3 = 1)))
    ),
    aparams AS (
        SELECT doc_id,
               (60 + (doc_id % 20) * 2)::BIGINT AS n,
               ((doc_id * 97) % 2048 - 1024)::BIGINT AS pred0,
               (doc_id % 89)::BIGINT AS idx0
        FROM documents WHERE doc_id % 3 = 2
    ),
    arec AS (
        SELECT doc_id, n, -1::BIGINT AS j, pred0 AS pred, idx0 AS idx
        FROM aparams
        UNION ALL
        SELECT doc_id, n, j,
               GREATEST(-32768, LEAST(32767,
                   pred + CASE WHEN nb >= 8 THEN -diff ELSE diff END)),
               GREATEST(0, LEAST(88, idx + adj))
        FROM (
            SELECT *,
                   (step // 8)
                   + CASE WHEN nb % 2 = 1 THEN step // 4 ELSE 0 END
                   + CASE WHEN (nb // 2) % 2 = 1
                          THEN step // 2 ELSE 0 END
                   + CASE WHEN (nb // 4) % 2 = 1
                          THEN step ELSE 0 END AS diff,
                   ({_IMA_ADJ_SQL})[(nb + 1)::INT] AS adj
            FROM (
                SELECT doc_id, n, j + 1 AS j, pred, idx,
                       ({_IMA_STEPS_SQL})[(idx + 1)::INT] AS step,
                       ((doc_id * 11 + (j + 1) * (j + 1) * 3) % 16)
                       AS nb
                FROM arec WHERE j + 1 < n
            )
        )
    ),
    stream AS (
        SELECT doc_id, j, v FROM pcm
        UNION ALL SELECT doc_id, j, v FROM ulaw
        UNION ALL SELECT doc_id, j, pred AS v FROM arec
    ),
    lagged AS (
        SELECT doc_id, v,
               lag(v) OVER (PARTITION BY doc_id ORDER BY j) AS pv
        FROM stream
    )
    SELECT doc_id, 8000::INT AS out_rate,
           count(*)::BIGINT AS n_samples,
           max(abs(v))::BIGINT AS peak,
           round(sqrt(avg((v * v)::DOUBLE)), 6) AS rms,
           coalesce(
               sum(CASE WHEN v * pv < 0 THEN 1 ELSE 0 END), 0
           )::BIGINT AS zcr
    FROM lagged GROUP BY doc_id
    """,
)
def wav_transcode_stats_q(spark, sf_dir):
    """A MIXED-codec audio corpus normalized in one projection
    (``wav_transcode(codec="auto")``): a third of the docs carry plain
    PCM16 WAVs, a third G.711 u-law, a third IMA ADPCM — each payload
    a deterministic function of doc_id — and the plan chains
    transcode -> ``wav_stats`` over the normalized ``pcm`` column.
    The oracle recomputes all three sample streams independently (the
    PCM generator arithmetic, the CCITT expansion, the IMA recursion)
    and never sees bytes, so a mis-detected codec, a passthrough that
    decoded, or any decode error on any sample fails the hash. This is
    the plan-level pin for the kernel-level ``codec="auto"`` knob the
    audio near-dup twin uses (functions/multimodal.py wav_transcode)."""
    from beavers_spark.functions.multimodal import (
        _le_hex,
        synth_wav,
        wav_stats,
        wav_transcode,
    )

    docs = t(spark, sf_dir, "documents")
    m3 = F.pmod("doc_id", F.lit(3))

    # PCM16: the wav_resample plan's sample generator
    n_p = F.lit(50) + F.pmod("doc_id", F.lit(30))
    pcm_hex = _pcm16_payload_hex(n_p)
    pcm_wav = synth_wav(
        F.unhex(pcm_hex), F.lit(1), F.lit(8000), F.lit(16)
    )

    # u-law: the wav_ulaw_decode plan's byte generator
    n_u = F.lit(60) + F.pmod("doc_id", F.lit(40))
    ulaw_hex = _ulaw_payload_hex(n_u)
    ulaw_wav = synth_wav(
        F.unhex(ulaw_hex), F.lit(1), F.lit(8000), F.lit(8), F.lit(7)
    )

    # IMA ADPCM: the wav_adpcm_decode plan's block generator
    n_a = F.lit(60) + F.pmod("doc_id", F.lit(20)) * 2
    pred0 = F.pmod(F.col("doc_id") * 97, F.lit(2048)) - F.lit(1024)
    idx0 = F.pmod("doc_id", F.lit(89))

    def nb(j):
        return F.pmod(F.col("doc_id") * 11 + j * j * 3, F.lit(16))

    adpcm_data = F.unhex(
        F.concat(
            _le_hex(pred0.bitwiseAND(F.lit(0xFFFF)), 2),
            _le_hex(idx0, 1),
            F.lit("00"),
            F.array_join(
                F.transform(
                    F.sequence(
                        F.lit(0).cast("bigint"),
                        (n_a / 2 - 1).cast("bigint"),
                    ),
                    lambda k: _le_hex(nb(2 * k) + nb(2 * k + 1) * 16, 1),
                ),
                "",
            ),
        )
    )
    adpcm_wav = synth_wav(
        adpcm_data, F.lit(1), F.lit(8000), F.lit(4), F.lit(17),
        block_align_col=F.octet_length(adpcm_data),
    )

    wavs = docs.select(
        "doc_id",
        F.when(m3 == 0, pcm_wav)
        .when(m3 == 1, ulaw_wav)
        .otherwise(adpcm_wav)
        .alias("payload"),
    )
    norm = wav_transcode(wavs, "payload", codec="auto").select(
        "doc_id", "pcm"
    )
    return wav_stats(norm, "pcm").select(
        "doc_id",
        F.lit(8000).alias("out_rate"),
        "n_samples", "peak", "rms", "zcr",
    )


@query(
    "audio_activity",
    oracle="""
    WITH params AS (
        SELECT doc_id, (50 + doc_id % 50)::BIGINT AS n FROM documents
    ),
    samples AS (
        SELECT doc_id, i,
               ((doc_id * 31 + i * 7) % 2001 - 1000)::BIGINT AS v
        FROM (SELECT doc_id,
                     unnest(generate_series(0, n - 1)) AS i
              FROM params)
    ),
    segs AS (
        SELECT doc_id, (i // 16)::INT AS seg_idx,
               max(abs(v)) AS peak
        FROM samples GROUP BY doc_id, i // 16
    ),
    flagged AS (
        SELECT doc_id, seg_idx,
               CASE WHEN peak > 700 THEN 1 ELSE 0 END AS active
        FROM segs
    ),
    islands AS (
        SELECT doc_id, active,
               seg_idx - row_number() OVER (
                   PARTITION BY doc_id, active ORDER BY seg_idx
               ) AS grp
        FROM flagged
    ),
    runs AS (
        SELECT doc_id, count(*) AS run_len
        FROM islands WHERE active = 1 GROUP BY doc_id, grp
    )
    SELECT f.doc_id, count(*)::BIGINT AS n_segments,
           sum(f.active)::BIGINT AS active_segments,
           round(sum(f.active)::DOUBLE / count(*), 6)
               AS activity_ratio,
           coalesce(max(r.max_run), 0)::BIGINT AS longest_run
    FROM flagged f
    LEFT JOIN (SELECT doc_id, max(run_len) AS max_run
               FROM runs GROUP BY doc_id) r
      ON f.doc_id = r.doc_id
    GROUP BY f.doc_id
    """,
)
def audio_activity_q(spark, sf_dir):
    """Energy-gated ACTIVITY profile per track — the audio quality
    filter a speech/music ingest runs before keeping a clip (silence
    and hiss-only tracks waste tokens): decode the wav_stats corpus
    into 16-sample segments, flag each segment ACTIVE when its peak
    clears an integer threshold (peak > 700 — integer-exact, so the
    oracle reproduces the gate bit for bit; an RMS gate would compare
    rounded floats at the boundary), and emit per-doc segment count,
    active count, activity ratio, and the LONGEST consecutive active
    run — the gaps-and-islands window idiom (seg_idx - row_number
    within activity class), all JVM-side after the one decode pass
    and partitioned per doc. The oracle recomputes every segment peak
    from the sample generator and runs the identical island chain
    (functions/multimodal.py wav_segment_stats)."""
    from pyspark.sql import Window

    from beavers_spark.functions.multimodal import (
        _le_hex,
        synth_wav,
        wav_segment_stats,
    )

    docs = t(spark, sf_dir, "documents")
    n = F.lit(50) + F.pmod("doc_id", F.lit(50))
    # one substring over the stride-7 orbit literal (see
    # _pcm16_payload_hex) instead of a per-sample transform chain
    wavs = docs.select(
        "doc_id",
        synth_wav(
            F.unhex(_pcm16_payload_hex(n)),
            F.lit(1), F.lit(16000), F.lit(16),
        ).alias("payload"),
    )
    segs = wav_segment_stats(wavs, "payload", seg_samples=16).select(
        "doc_id", "seg_idx", "peak"
    )
    flagged = segs.withColumn(
        "active", (F.col("peak") > 700).cast("int")
    )
    wisl = Window.partitionBy("doc_id", "active").orderBy("seg_idx")
    islands = flagged.withColumn(
        "grp", F.col("seg_idx") - F.row_number().over(wisl)
    )
    # run length via a window count over the island key — keeps the
    # whole profile ONE doc-keyed aggregation (no join), and every
    # window here shares the doc_id hash partitioning: one exchange
    wrun = Window.partitionBy("doc_id", "active", "grp")
    runs = islands.withColumn("run_len", F.count("*").over(wrun))
    return runs.groupBy("doc_id").agg(
        F.count("*").alias("n_segments"),
        F.sum("active").alias("active_segments"),
        F.round(
            F.sum("active") / F.count("*"), 6
        ).alias("activity_ratio"),
        F.coalesce(
            F.max(F.when(F.col("active") == 1, F.col("run_len"))),
            F.lit(0),
        ).cast("bigint").alias("longest_run"),
    )


def _synth_neardup_wavs(spark, sf_dir):
    """The deterministic NEAR-DUP audio corpus shared by the audio
    fingerprint/near-dup plans — one generator so the plans and their
    oracles' arithmetic cannot silently diverge. Doc d belongs to
    group g = d // 12 and carries 1024 samples (64 segments of 16): a
    square-ish wave whose per-segment amplitude is the group's
    bimodal pattern ``a(g,k) = 100 + 900 * (((g*31 + k*17) % 97) % 2)``
    with exactly ONE segment p = d % 64 flipped to the opposite level
    (``1100 - a``). Same-group docs therefore share the whole energy
    envelope except their two flipped segments — Hamming exactly 2 on
    the envelope fingerprint (a 12-block's flip positions are 12
    CONSECUTIVE values mod 64, always distinct), the near-dup
    structure — while the mod-97 mix keeps distinct groups' envelopes
    ~32 bits apart. The 100/1000 level gap dwarfs the <= 900/64
    threshold shift a single flip causes, so no other bit wobbles.
    Groups are fixed-size id BLOCKS, not residue classes (d % G):
    group COUNT scales with the corpus while component size — and so
    the clusters plan's label-propagation diameter and the oracle's
    reachability closure — stays O(12) at every scale factor; a
    residue-class design grows O(corpus/G)-diameter chain components
    under the hot-bucket cap and both engines crawl. Block size 12 >
    bucket_cap 8 keeps the cap exercised (a group floods its 3
    shared band buckets past the cap, so chains appear)."""
    from beavers_spark.functions.multimodal import synth_wav

    docs = t(spark, sf_dir, "documents")
    g = F.floor(F.col("doc_id") / 12)
    p = F.pmod("doc_id", F.lit(64))

    # a segment's 16 samples are amp * (1 - 2*(i%2)) for i = 16k..16k+15
    # — 16k is even, so every segment is the SAME [+amp, -amp] x 8 run
    # and amp takes only two values (100 / 1000). The whole segment's
    # 32-byte little-endian hex is therefore one of TWO precomputed
    # constants, and the doc body is 64 per-segment whens instead of
    # 1024 per-sample hex expressions (~6s -> ~0.4s per corpus pass at
    # sf0.1; byte-identical, pinned by tests/test_synth_generators.py)
    def _le2(v: int) -> str:
        v &= 0xFFFF
        return f"{v & 0xFF:02X}{v >> 8:02X}"

    seg_hex = {
        amp: (_le2(amp) + _le2(-amp)) * 8 for amp in (100, 1000)
    }
    kseq = F.sequence(F.lit(0).cast("bigint"), F.lit(63).cast("bigint"))

    def seg(k):
        b = F.pmod(F.pmod(g * 31 + k * 17, F.lit(97)), F.lit(2))
        eff = F.when(k == p, F.lit(1) - b).otherwise(b)
        return F.when(
            eff == 1, F.lit(seg_hex[1000])
        ).otherwise(F.lit(seg_hex[100]))

    return docs.select(
        "doc_id",
        synth_wav(
            F.unhex(F.array_join(F.transform(kseq, seg), "")),
            F.lit(1), F.lit(16000), F.lit(16),
        ).alias("payload"),
    )


#: per-doc envelope-amplitude arithmetic ending in ``sig(doc_id, afp)``
#: — the oracle twin of synth corpus + segment decode + fingerprint,
#: shared by the audio fingerprint / near-dup pairs / clusters plans
_AUDIO_SIG_CTES = """params AS (
        SELECT doc_id, doc_id // 12 AS g, doc_id % 64 AS p
        FROM documents
    ),
    amps AS (
        SELECT doc_id, k,
               CASE WHEN k = p THEN 1100 - a ELSE a END AS amp
        FROM (SELECT doc_id, p, k.i AS k,
                     100 + 900 * (((g * 31 + k.i * 17) % 97) % 2) AS a
              FROM params, (SELECT unnest(range(64)) AS i) k)
    ),
    sig AS (
        SELECT doc_id,
               sum(CASE WHEN amp * 64 > tot THEN
                        (CASE WHEN k = 63 THEN -9223372036854775808
                              ELSE (1::BIGINT << k::INT) END)
                   ELSE 0 END)::BIGINT AS afp,
               least(count(*), 64) AS cls
        FROM (SELECT *, sum(amp) OVER (PARTITION BY doc_id) AS tot
              FROM amps)
        GROUP BY doc_id
    )
"""

#: the envelope-fingerprint band/rank/chain candidate chain ending in
#: ``cand(doc1, doc2, hamming)`` — shared by the audio near-dup pairs
#: plan and its connected-components clusters plan
_AUDIO_NEARDUP_CTES = f"""{_AUDIO_SIG_CTES},
    bands AS (
        SELECT doc_id, afp, cls, b.i AS band_id,
               (afp >> (b.i * 16)) & 65535 AS bv
        FROM sig, (SELECT unnest(range(4)) AS i) b
    ),
    ranked AS (
        SELECT doc_id, afp, cls, band_id, bv,
               count(*) OVER (PARTITION BY band_id, bv, cls) AS cnt,
               lead(doc_id) OVER (
                   PARTITION BY band_id, bv, cls ORDER BY doc_id
               ) AS nxt,
               lead(afp) OVER (
                   PARTITION BY band_id, bv, cls ORDER BY doc_id
               ) AS nxt_sig
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT doc1, doc2, bit_count(xor(s1, s2)) AS hamming
        FROM (
            SELECT a.doc_id AS doc1, b2.doc_id AS doc2,
                   a.afp AS s1, b2.afp AS s2
            FROM ranked a JOIN ranked b2
              ON a.band_id = b2.band_id AND a.bv = b2.bv
             AND a.cls = b2.cls AND a.doc_id < b2.doc_id
            WHERE a.cnt <= 8 AND b2.cnt <= 8
            UNION ALL
            SELECT doc_id, nxt, afp, nxt_sig FROM ranked
            WHERE cnt > 8 AND nxt IS NOT NULL
        )
    )
"""


@query(
    "audio_fingerprint",
    oracle=f"""
    WITH {_AUDIO_SIG_CTES}
    SELECT doc_id, afp FROM sig
    """,
)
def audio_fingerprint_q(spark, sf_dir):
    """PERCEPTUAL audio fingerprint, hash-checked end to end: build
    the near-dup WAV corpus, decode it back into 16-sample segment
    rows with the Arrow-batched ``wav_segment_stats`` kernel, then
    fold the segment PEAKS into a 64-bit energy-envelope bitmap with
    pure Column math (``wav_envelope_fingerprint``: bit k = segment
    k's peak above the file's mean segment peak, integer-exact — the
    audio sibling of ``ppm_ahash``). The oracle recomputes every
    amplitude by independent arithmetic on the generator — it never
    sees bytes, segments, or the kernel — so a build-, decode-, or
    fold-side error on any segment fails the hash
    (functions/multimodal.py wav_envelope_fingerprint)."""
    from beavers_spark.functions.multimodal import (
        wav_envelope_fingerprint,
        wav_segment_stats,
    )

    wavs = _synth_neardup_wavs(spark, sf_dir)
    segs = wav_segment_stats(wavs, "payload", seg_samples=16)
    return wav_envelope_fingerprint(segs).select("doc_id", "afp")


@query(
    "audio_neardup",
    oracle=f"""
    WITH {_AUDIO_NEARDUP_CTES}
    SELECT doc1, doc2, hamming::INT AS hamming
    FROM cand WHERE hamming <= 3
    """,
)
def audio_neardup_q(spark, sf_dir):
    """Perceptual AUDIO near-dup — the third instantiation of the
    banded-aHash tier (image_neardup / video_frame_neardup siblings),
    completing the modality set: re-encoded or lightly-noised repeats
    of a track keep the same coarse energy envelope, so their
    ``wav_envelope_fingerprint`` bitmaps sit within a few Hamming
    bits. Candidates come from the shared SimHash band/verify engine
    (``hamming_pairs``: 4x16-bit pigeonhole bands, hot-bucket chain
    cap=8 on from day one — same-group docs flood 3 of 4 band buckets
    by construction, so the cap is EXERCISED here, not decorative —
    popcount verify at hamming <= 3). Banding is grouped by the
    duration class ``least(nseg, 64)`` (ADVICE r10: short tracks of
    different durations share zero upper fingerprint bits and would
    spuriously band-match; this corpus is all full-width 64-segment
    tracks, so the class is exercised structurally and pinned
    semantically). The oracle recomputes the envelope by generator
    arithmetic and runs the identical band/rank/chain candidate
    generation, so the cap semantics are hash-checked end to end. At
    100 TB the shuffle carries (doc_id, 8-byte fingerprint) band rows
    — audio bytes never ride an exchange after the one segment-decode
    pass."""
    from beavers_spark.functions.dedup import hamming_pairs
    from beavers_spark.functions.multimodal import (
        wav_envelope_fingerprint,
        wav_segment_stats,
    )

    wavs = _synth_neardup_wavs(spark, sf_dir)
    segs = wav_segment_stats(wavs, "payload", seg_samples=16)
    sig = wav_envelope_fingerprint(segs).withColumn(
        "cls", F.least(F.col("nseg"), F.lit(64))
    )
    pairs = hamming_pairs(
        sig, "doc_id", "afp", bits=64, max_hamming=3, bucket_cap=8,
        group_cols=("cls",),
    )
    return pairs.withColumnsRenamed(
        {"doc_id1": "doc1", "doc_id2": "doc2"}
    )


@query(
    "audio_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_AUDIO_NEARDUP_CTES},
    pairs AS (SELECT doc1, doc2 FROM cand WHERE hamming <= 3),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM pairs
        UNION ALL SELECT doc2, doc1 FROM pairs
    ),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def audio_neardup_clusters_q(spark, sf_dir):
    """Connected components over the perceptual audio pair graph
    (cluster_id = min doc id in component) — keep-one-canonical-track
    per near-dup group, the discipline an audio corpus dedup applies
    after the pair pass. The chain pairs the hot-bucket cap emits keep
    every flooded bucket member reachable, so capped groups still
    collapse to one component. Spark side: the shared Pregel-style
    min-label loop; oracle: the identical banded candidate generation
    (shared CTE constant) + a recursive-CTE reachability closure."""
    from beavers_spark.functions.dedup import (
        connected_components,
        hamming_pairs,
    )
    from beavers_spark.functions.multimodal import (
        wav_envelope_fingerprint,
        wav_segment_stats,
    )

    wavs = _synth_neardup_wavs(spark, sf_dir)
    segs = wav_segment_stats(wavs, "payload", seg_samples=16)
    sig = wav_envelope_fingerprint(segs).withColumn(
        "cls", F.least(F.col("nseg"), F.lit(64))
    )
    pairs = hamming_pairs(
        sig, "doc_id", "afp", bits=64, max_hamming=3, bucket_cap=8,
        group_cols=("cls",),
    ).select(
        F.col("doc_id1").alias("doc1"), F.col("doc_id2").alias("doc2")
    )
    return connected_components(pairs)


@query(
    "audio_neardup_apply",
    oracle=f"""
    WITH RECURSIVE {_AUDIO_NEARDUP_CTES},
    pairs AS (SELECT doc1, doc2 FROM cand WHERE hamming <= 3),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM pairs
        UNION ALL SELECT doc2, doc1 FROM pairs
    ),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM labels l
        WHERE l.doc_id = d.doc_id AND l.cluster_id <> l.doc_id
    )
    """,
)
def audio_neardup_apply_q(spark, sf_dir):
    """The audio corpus AFTER perceptual near-dup removal — each
    envelope-fingerprint cluster keeps only its canonical (min-id)
    track: ``dedup_apply``'s keep-one discipline completing the audio
    tier (detect -> cluster -> APPLY). Audio is doc-level by
    construction (one fingerprint per track), so this IS the doc-level
    curation step — no rollup needed. Broadcast drop list; the scan
    never shuffles."""
    from beavers_spark.functions.dedup import (
        apply_dedup,
        connected_components,
        hamming_pairs,
    )
    from beavers_spark.functions.multimodal import (
        wav_envelope_fingerprint,
        wav_segment_stats,
    )

    wavs = _synth_neardup_wavs(spark, sf_dir)
    segs = wav_segment_stats(wavs, "payload", seg_samples=16)
    sig = wav_envelope_fingerprint(segs).withColumn(
        "cls", F.least(F.col("nseg"), F.lit(64))
    )
    pairs = hamming_pairs(
        sig, "doc_id", "afp", bits=64, max_hamming=3, bucket_cap=8,
        group_cols=("cls",),
    ).select(
        F.col("doc_id1").alias("doc1"), F.col("doc_id2").alias("doc2")
    )
    clusters = connected_components(pairs)
    return apply_dedup(
        wavs.select("doc_id"), clusters, "doc_id"
    ).select("doc_id")


@query(
    "ppm_meta",
    oracle="""
    WITH params AS (
        SELECT doc_id,
               (16 + doc_id % 64)::INT AS width,
               (16 + (doc_id // 64) % 64)::INT AS height,
               octet_length(encode(substr(text, 1, 100)))::BIGINT AS dlen
        FROM documents
    )
    SELECT doc_id, 'ppm' AS format, width, height, 255 AS maxval,
           (length('P6' || chr(10) || width || ' ' || height
                   || chr(10) || '255' || chr(10)) + dlen)::BIGINT
               AS n_bytes
    FROM params
    """,
)
def ppm_meta_q(spark, sf_dir):
    """Binary P6 PPM header decode, hash-checked: build 'P6\\n<w> <h>\\n
    255\\n' + pixel bytes per document, parse the dimensions back from
    the binary with one substring + decode + regexp projection (no
    UDF). Oracle recomputes by independent arithmetic
    (functions/multimodal.py ppm_meta)."""
    from beavers_spark.functions.multimodal import ppm_meta

    docs = t(spark, sf_dir, "documents")
    w = (16 + F.pmod("doc_id", F.lit(64))).cast("int")
    h = (16 + F.pmod(F.floor(F.col("doc_id") / 64), F.lit(64))).cast("int")
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    ppms = docs.select(
        "doc_id",
        F.concat(
            F.encode(header, "UTF-8"),
            F.encode(F.substring("text", 1, 100), "UTF-8"),
        ).alias("payload"),
    )
    return ppm_meta(ppms, "payload").select(
        "doc_id", "format", "width", "height",
        F.col("maxval").cast("int").alias("maxval"), "n_bytes",
    )


#: hex of the 256-byte cycle 00 01 .. FF — the pixel generator's whole
#: value space: byte j of doc d is (d*7 + j) % 256, i.e. the cycle
#: read from offset (d*7) % 256, so a payload is ONE substring of this
#: literal repeated, not w*h*3 per-byte expressions (r13: the per-byte
#: transform cost ~1.6s/corpus-pass at sf0.1 vs ~0.2s for the
#: substring — same bytes, pinned by tests/test_synth_generators.py)
_BYTE_CYCLE_HEX = "".join(f"{b:02X}" for b in range(256))

#: cycle copies the substring draws from: start offset <= 255 plus the
#: largest _ppm_dims payload (31*31*3 = 2883 bytes) needs 3139 bytes;
#: 13 copies = 3328. _ppm_dims is the ONLY dims source (w,h <= 31).
_PPM_CYCLE_REPS = 13


def _ppm_pixels(w, h):
    """Deterministic P6 payload Column: header + pixel byte j =
    (doc_id*7 + j) % 256 over w*h RGB triples — the generator the
    ppm_stats/ppm_resize oracles recompute by independent arithmetic
    (they never see the bytes). The mod-256 byte stream is periodic,
    so the body is one substring over the repeated cycle literal
    (start = (doc_id*7) % 256) instead of a per-byte transform —
    byte-identical, ~10x cheaper per corpus pass, and the expression
    stays whole-stage-codegen-compilable."""
    npx = (w * h * F.lit(3)).cast("bigint")
    start = F.pmod(F.col("doc_id") * 7, F.lit(256)).cast("int")
    body = F.substring(
        F.repeat(F.lit(_BYTE_CYCLE_HEX), _PPM_CYCLE_REPS),
        start * 2 + 1,
        (npx * 2).cast("int"),
    )
    header = F.concat(
        F.lit("P6\n"), w.cast("string"), F.lit(" "), h.cast("string"),
        F.lit("\n255\n"),
    )
    return F.concat(F.encode(header, "UTF-8"), F.unhex(body))


_PPM_DIMS_SQL = """
        SELECT doc_id, (8 + doc_id % 24)::BIGINT AS w,
               (8 + (doc_id // 24) % 24)::BIGINT AS h
        FROM documents"""


#: the sampled-aHash -> bands -> rank/chain candidate CTE chain ending
#: in ``cand(doc1, doc2, hamming)`` — shared by the image near-dup
#: pairs plan and its connected-components clusters plan
_IMG_NEARDUP_CTES = f"""params AS ({_PPM_DIMS_SQL}
    ),
    samp AS (
        SELECT doc_id, k.i AS k,
               ((k.i * (w * h)) // 64)::BIGINT AS p
        FROM params, (SELECT unnest(range(64)) AS i) k
    ),
    vals AS (
        SELECT doc_id, k,
               ((doc_id * 7 + 3 * p) % 256)
               + ((doc_id * 7 + 3 * p + 1) % 256)
               + ((doc_id * 7 + 3 * p + 2) % 256) AS v
        FROM samp
    ),
    sig AS (
        SELECT doc_id,
               sum(CASE WHEN v * 64 > tot THEN
                        (CASE WHEN k = 63 THEN -9223372036854775808
                              ELSE (1::BIGINT << k::INT) END)
                   ELSE 0 END)::BIGINT AS ahash
        FROM (SELECT *, sum(v) OVER (PARTITION BY doc_id) AS tot
              FROM vals)
        GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, ahash, b.i AS band_id,
               (ahash >> (b.i * 16)) & 65535 AS bv
        FROM sig, (SELECT unnest(range(4)) AS i) b
    ),
    ranked AS (
        SELECT doc_id, ahash, band_id, bv,
               count(*) OVER (PARTITION BY band_id, bv) AS cnt,
               lead(doc_id) OVER (
                   PARTITION BY band_id, bv ORDER BY doc_id
               ) AS nxt,
               lead(ahash) OVER (
                   PARTITION BY band_id, bv ORDER BY doc_id
               ) AS nxt_sig
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT doc1, doc2, bit_count(xor(s1, s2)) AS hamming
        FROM (
            SELECT a.doc_id AS doc1, b2.doc_id AS doc2,
                   a.ahash AS s1, b2.ahash AS s2
            FROM ranked a JOIN ranked b2
              ON a.band_id = b2.band_id AND a.bv = b2.bv
             AND a.doc_id < b2.doc_id
            WHERE a.cnt <= 8 AND b2.cnt <= 8
            UNION ALL
            SELECT doc_id, nxt, ahash, nxt_sig FROM ranked
            WHERE cnt > 8 AND nxt IS NOT NULL
        )
    )
"""


@query(
    "image_neardup",
    oracle=f"""
    WITH {_IMG_NEARDUP_CTES}
    SELECT doc1, doc2, hamming::INT AS hamming
    FROM cand WHERE hamming <= 3
    """,
)
def image_neardup_q(spark, sf_dir):
    """Perceptual IMAGE near-dup over the P6 corpus — the image
    instantiation of the banded-aHash tier (`video_frame_neardup`'s
    sibling): each image's ``ppm_ahash`` samples 64 evenly-strided
    pixels, thresholds their channel sums against the sampled mean
    (integer-exact), and the SimHash band/verify engine
    (``hamming_pairs``: 4x16-bit pigeonhole bands, hot-bucket chain
    cap=8, popcount verify at hamming <= 3) emits exact pairs. All 64
    hash bits are live (every image has >= 64 pixels), so no length
    grouping is needed and cross-size comparisons work — the classic
    aHash property the strided sampling buys. The oracle recomputes
    the sampled pixel sums from the generator arithmetic (only the 64
    sampled positions — never the full pixel grid, never bytes) and
    runs the identical band/rank/chain candidate generation; bit 63
    is the two's-complement special case (DuckDB's shift overflows
    where numpy wraps). The generator guarantees exact-duplicate image
    pairs at id delta 2304 = lcm(pixel period 256, dims period 576),
    so the plan returns rows from sf0.01 up."""
    from beavers_spark.functions.dedup import hamming_pairs
    from beavers_spark.functions.multimodal import ppm_ahash

    docs = t(spark, sf_dir, "documents")
    w, h = _ppm_dims()
    ppms = docs.select("doc_id", _ppm_pixels(w, h).alias("payload"))
    sig = ppm_ahash(ppms, "payload").select("doc_id", "ahash")
    pairs = hamming_pairs(
        sig, "doc_id", "ahash", bits=64, max_hamming=3, bucket_cap=8
    )
    return pairs.withColumnsRenamed(
        {"doc_id1": "doc1", "doc_id2": "doc2"}
    )


@query(
    "image_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_IMG_NEARDUP_CTES},
    pairs AS (SELECT doc1, doc2 FROM cand WHERE hamming <= 3),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM pairs
        UNION ALL SELECT doc2, doc1 FROM pairs
    ),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    )
    SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def image_neardup_clusters_q(spark, sf_dir):
    """Connected components over the perceptual image pair graph
    (cluster_id = min doc id in component) — so each near-dup group
    keeps exactly one canonical image, the same keep-one-per-cluster
    discipline as ``dedup_clusters``. Spark side: the shared
    Pregel-style min-label loop (``functions.dedup
    .connected_components``); oracle: the identical banded candidate
    generation + a recursive-CTE reachability closure — the iterative
    algorithm is hash-checked end to end."""
    from beavers_spark.functions.dedup import (
        connected_components,
        hamming_pairs,
    )
    from beavers_spark.functions.multimodal import ppm_ahash

    docs = t(spark, sf_dir, "documents")
    w, h = _ppm_dims()
    ppms = docs.select("doc_id", _ppm_pixels(w, h).alias("payload"))
    sig = ppm_ahash(ppms, "payload").select("doc_id", "ahash")
    pairs = hamming_pairs(
        sig, "doc_id", "ahash", bits=64, max_hamming=3, bucket_cap=8
    ).select(
        F.col("doc_id1").alias("doc1"), F.col("doc_id2").alias("doc2")
    )
    return connected_components(pairs)


@query(
    "image_neardup_apply",
    oracle=f"""
    WITH RECURSIVE {_IMG_NEARDUP_CTES},
    pairs AS (SELECT doc1, doc2 FROM cand WHERE hamming <= 3),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM pairs
        UNION ALL SELECT doc2, doc1 FROM pairs
    ),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM labels l
        WHERE l.doc_id = d.doc_id AND l.cluster_id <> l.doc_id
    )
    """,
)
def image_neardup_apply_q(spark, sf_dir):
    """The image corpus AFTER perceptual near-dup removal — each aHash
    cluster keeps only its canonical (min-id) image, plus every
    unclustered one: ``dedup_apply``'s keep-one discipline completing
    the image tier (detect -> cluster -> APPLY, the step a curation
    pipeline actually ships). The drop list (non-canonical members) is
    tiny vs the corpus, so it broadcasts and the scan never
    shuffles."""
    from beavers_spark.functions.dedup import (
        apply_dedup,
        connected_components,
        hamming_pairs,
    )
    from beavers_spark.functions.multimodal import ppm_ahash

    docs = t(spark, sf_dir, "documents")
    w, h = _ppm_dims()
    ppms = docs.select("doc_id", _ppm_pixels(w, h).alias("payload"))
    sig = ppm_ahash(ppms, "payload").select("doc_id", "ahash")
    pairs = hamming_pairs(
        sig, "doc_id", "ahash", bits=64, max_hamming=3, bucket_cap=8
    ).select(
        F.col("doc_id1").alias("doc1"), F.col("doc_id2").alias("doc2")
    )
    clusters = connected_components(pairs)
    return apply_dedup(
        ppms.select("doc_id"), clusters, "doc_id"
    ).select("doc_id")


def _ppm_dims():
    w = (8 + F.pmod("doc_id", F.lit(24))).cast("bigint")
    h = (
        8 + F.pmod(F.floor(F.col("doc_id") / 24), F.lit(24))
    ).cast("bigint")
    return w, h


@query(
    "ppm_stats",
    oracle=f"""
    WITH params AS ({_PPM_DIMS_SQL}
    ),
    px AS (
        SELECT doc_id,
               unnest(generate_series(0, w * h * 3 - 1)) AS j
        FROM params
    )
    SELECT doc_id, (j % 3)::INT AS channel,
           (count(*))::BIGINT AS n,
           round(avg((doc_id * 7 + j) % 256), 6) AS mean_v,
           (min((doc_id * 7 + j) % 256))::INT AS min_v,
           (max((doc_id * 7 + j) % 256))::INT AS max_v
    FROM px GROUP BY doc_id, channel
    """,
)
def ppm_stats_q(spark, sf_dir):
    """Payload-level IMAGE decode, hash-checked: build a P6 PPM per
    document whose pixel bytes are a deterministic function of doc_id
    (pure Column byte math), decode the pixels BACK with the
    Arrow-batched ``ppm_stats`` kernel (numpy reshape + axis
    reductions per blob) and emit per-channel count/mean/min/max. The
    DuckDB oracle recomputes the statistics from the same pixel VALUES
    without ever seeing the bytes (functions/multimodal.py
    ppm_stats)."""
    from beavers_spark.functions.multimodal import ppm_stats

    docs = t(spark, sf_dir, "documents")
    w, h = _ppm_dims()
    ppms = docs.select(
        "doc_id", _ppm_pixels(w, h).alias("payload")
    )
    stats = ppm_stats(ppms, "payload")
    z = F.arrays_zip("chan_mean", "chan_min", "chan_max")
    return stats.select(
        "doc_id", "n_pixels", F.posexplode(z).alias("channel", "z")
    ).select(
        "doc_id",
        F.col("channel").cast("int").alias("channel"),
        F.col("n_pixels").alias("n"),
        F.col("z.chan_mean").alias("mean_v"),
        F.col("z.chan_min").alias("min_v"),
        F.col("z.chan_max").alias("max_v"),
    )


@query(
    "avi_frames",
    oracle="""
    WITH params AS (
        SELECT doc_id, (3 + doc_id % 6)::BIGINT AS nf FROM documents
    ),
    fr AS (
        SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f
        FROM params
    ),
    sz AS (
        SELECT doc_id, f, (20 + (f % 5) * 4)::BIGINT AS n FROM fr
    ),
    byt AS (
        SELECT doc_id, f, n, unnest(generate_series(0, n - 1)) AS j
        FROM sz
    )
    SELECT doc_id, f::INT AS frame_idx, n AS n_bytes,
           (sum((doc_id * 11 + f * 13 + j) % 256))::BIGINT AS byte_sum
    FROM byt GROUP BY doc_id, f, n
    """,
)
def avi_frames_q(spark, sf_dir):
    """Payload-level VIDEO frame extraction, hash-checked: build an AVI
    per document whose ``LIST movi`` holds one ``00dc`` chunk per frame
    with deterministic bytes (frame f byte j = (doc_id*11 + f*13 + j)
    % 256, sizes varying per frame), then walk the RIFF tree BACK with
    the Arrow-batched ``avi_frames`` kernel and emit per-frame
    size + byte checksum. The oracle recomputes both from the
    generator without seeing the container — a mis-walked chunk
    boundary, a swallowed pad byte, or an off-by-one frame slice all
    fail the hash (functions/multimodal.py synth_movi/avi_frames)."""
    from beavers_spark.functions.multimodal import avi_frames

    return avi_frames(_synth_frame_avis(spark, sf_dir), "payload").select(
        "doc_id", "frame_idx", "n_bytes", "byte_sum"
    )


def _synth_frame_avis(spark, sf_dir):
    """The deterministic frame-AVI corpus shared by avi_frames and
    video_frame_dedup — ONE generator so the two plans (and their
    oracles' arithmetic) cannot silently diverge. Frame f of doc d has
    20 + (f%5)*4 bytes, byte j = (d*11 + f*13 + j) % 256 — so frame
    CONTENT is fully determined by ((d*11 + f*13) % 256, length),
    which is what the dedup oracle groups on."""
    from beavers_spark.functions.multimodal import synth_avi, synth_movi

    docs = t(spark, sf_dir, "documents")
    nf = 3 + F.pmod("doc_id", F.lit(6))

    # frame bytes are the mod-256 cycle read from offset
    # (d*11 + f*13) % 256 for `size` bytes (max 36), so one substring
    # over the doubled cycle literal (512 bytes covers 255 + 36)
    # replaces the per-byte transform — byte-identical (pinned by
    # tests/test_synth_generators.py), and the movi expression tree
    # stops blowing the janino method limit (the r13 oracle run logged
    # a whole-stage-codegen compile FAILURE on exactly this plan — the
    # old tree silently ran interpreted)
    two_cycles = _BYTE_CYCLE_HEX * 2

    def frame_bytes(f):
        size = F.lit(20) + F.pmod(f, F.lit(5)) * 4
        start = F.pmod(F.col("doc_id") * 11 + f * 13, F.lit(256))
        return F.substring(
            F.lit(two_cycles),
            (start * 2 + 1).cast("int"),
            (size * 2).cast("int"),
        )

    return docs.select(
        "doc_id",
        synth_avi(
            synth_movi(nf, frame_bytes),
            F.lit(33333), nf, F.lit(64), F.lit(48),
        ).alias("payload"),
    )


@query(
    "video_frame_dedup",
    oracle="""
    WITH params AS (
        SELECT doc_id, (3 + doc_id % 6)::BIGINT AS nf FROM documents
    ),
    fr AS (
        SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f
        FROM params
    ),
    frames AS (
        SELECT doc_id, f, (20 + (f % 5) * 4)::BIGINT AS n,
               ((doc_id * 11 + f * 13) % 256)::BIGINT AS strt
        FROM fr
    )
    SELECT doc_id, f::INT AS frame_idx,
           first_value(doc_id) OVER w AS owner_doc,
           (first_value(f) OVER w)::INT AS owner_frame,
           (count(*) OVER w)::BIGINT AS n_copies
    FROM frames
    WINDOW w AS (PARTITION BY strt, n ORDER BY doc_id, f
                 ROWS BETWEEN UNBOUNDED PRECEDING
                 AND UNBOUNDED FOLLOWING)
    """,
)
def video_frame_dedup_q(spark, sf_dir):
    """FRAME-LEVEL video dedup, hash-checked — the repeated
    intro/outro/slate problem of a video training corpus: extract every
    frame's bytes (``avi_frames``), group by the frame's CONTENT hash,
    and assign each content group its first (doc, frame) owner — the
    chunk-dedup ownership discipline applied to video payloads. The
    oracle never sees bytes OR hashes: the generator makes frame
    content a pure function of ((doc_id*11 + f*13) % 256, length), so
    it groups on that pair by independent arithmetic — a kernel that
    hashed the wrong byte slice, or grouped on a non-content key,
    diverges immediately. Plan shape: one Arrow-batched decode, a
    map-side explode, ONE hash-partitioned window over frame_md5 — at
    100 TB the shuffle carries (doc_id, frame_idx, md5) rows, never
    frame bytes."""
    from pyspark.sql import Window

    from beavers_spark.functions.multimodal import avi_frames

    frames = avi_frames(_synth_frame_avis(spark, sf_dir), "payload")
    wv = (
        Window.partitionBy("frame_md5")
        .orderBy("doc_id", "frame_idx")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return frames.select(
        "doc_id",
        "frame_idx",
        F.first("doc_id").over(wv).alias("owner_doc"),
        F.first("frame_idx").over(wv).alias("owner_frame"),
        F.count("*").over(wv).alias("n_copies"),
    )


#: the frame-aHash -> bands -> rank/chain candidate CTE chain ending in
#: ``cand(fid1, fid2, hamming)`` (fid = doc_id*256 + frame_idx) —
#: shared by the frame near-dup pairs plan and its clusters plan
#: doc-id bound for the frame-clusters CLOSURE verification: the
#: natural frame corpus's duplicate classes grow with the corpus
#: (~21 members each at sf0.1) and chain-link into components of
#: thousands of frames, so a transitive-closure oracle is O(sum
#: |C|^2) — 134M closure rows at sf0.1. The Spark operator handles
#: such graphs fine (local union-find under the edge cap, the
#: distributed min-label loop above it); it's the SQL closure that
#: can't. So the clusters plan verifies on the first
#: ``_VFN_CLUSTER_DOCS`` docs — a no-op at the driver's sf0.01 (500
#: docs) and a bounded, still-nontrivial gate at larger SFs — while
#: the PAIRS plan (linear oracle) keeps verifying full-corpus
#: candidate generation at every scale.
_VFN_CLUSTER_DOCS = 1000

_VFN_CTES = """params AS (
        SELECT doc_id, (3 + doc_id % 6)::BIGINT AS nf FROM documents
        {docs_where}
    ),
    fr AS (
        SELECT doc_id, unnest(generate_series(0, nf - 1)) AS f
        FROM params
    ),
    fmeta AS (
        SELECT doc_id, f, (20 + (f % 5) * 4)::BIGINT AS n FROM fr
    ),
    bytes AS (
        SELECT doc_id, f, n, j,
               ((doc_id * 11 + f * 13 + j) % 256)::BIGINT AS b
        FROM (SELECT doc_id, f, n,
                     unnest(generate_series(0, n - 1)) AS j
              FROM fmeta)
    ),
    sig AS (
        SELECT (doc_id * 256 + f)::BIGINT AS fid, n,
               sum(CASE WHEN b * n > tot
                        THEN (1::BIGINT << j::INT) ELSE 0 END
               )::BIGINT AS ahash
        FROM (SELECT *, sum(b) OVER (PARTITION BY doc_id, f) AS tot
              FROM bytes)
        GROUP BY doc_id, f, n
    ),
    bands AS (
        SELECT fid, ahash, n, k.i AS band_id,
               (ahash >> (k.i * 16)) & 65535 AS bv
        FROM sig, (SELECT unnest(range(4)) AS i) k
    ),
    ranked AS (
        SELECT fid, ahash, n, band_id, bv,
               count(*) OVER (PARTITION BY band_id, bv, n) AS cnt,
               lead(fid) OVER (
                   PARTITION BY band_id, bv, n ORDER BY fid
               ) AS nxt,
               lead(ahash) OVER (
                   PARTITION BY band_id, bv, n ORDER BY fid
               ) AS nxt_sig
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT fid1, fid2, bit_count(xor(s1, s2)) AS hamming
        FROM (
            SELECT a.fid AS fid1, b2.fid AS fid2,
                   a.ahash AS s1, b2.ahash AS s2
            FROM ranked a JOIN ranked b2
              ON a.band_id = b2.band_id AND a.bv = b2.bv
             AND a.n = b2.n AND a.fid < b2.fid
            WHERE a.cnt <= 8 AND b2.cnt <= 8
            UNION ALL
            SELECT fid, nxt, ahash, nxt_sig FROM ranked
            WHERE cnt > 8 AND nxt IS NOT NULL
        )
    )
"""


@query(
    "video_frame_neardup",
    oracle=f"""
    WITH {_VFN_CTES.format(docs_where="")}
    SELECT (fid1 >> 8)::BIGINT AS doc1, (fid1 & 255)::INT AS frame1,
           (fid2 >> 8)::BIGINT AS doc2, (fid2 & 255)::INT AS frame2,
           hamming::INT AS hamming
    FROM cand WHERE hamming <= 3
    """,
)
def video_frame_neardup_q(spark, sf_dir):
    """PERCEPTUAL frame-level near-dup (VERDICT r9 item 6) — the tier
    above exact ``video_frame_dedup``: re-encoded or slightly-corrupted
    repeats share no md5, but their mean-threshold aHash bitmaps
    (``avi_frames``' ``ahash`` column: bit k = sampled byte k above the
    frame's own mean, integer-exact) sit within a few Hamming bits.
    Candidates come from the SimHash machinery reused wholesale
    (``hamming_pairs``): 4 pigeonhole bands of 16 bits over the 64-bit
    hash, frames only pair within their byte-length class
    (group_cols=n_bytes — equal-width hashes), and the hot-bucket cap
    is on from day one (cap=8: band buckets over it chain in fid
    order — mandatory here because short hashes make the upper bands
    near-constant inside a length class). The popcount-XOR verify
    keeps every emitted pair exact (hamming <= 3). The oracle
    recomputes the aHash bits from the frame generator's byte
    arithmetic — it never sees bytes or hashes — and runs the
    IDENTICAL band/rank/chain candidate generation, so the cap
    semantics are hash-checked end to end. At 100 TB the shuffle
    carries (fid, 8-byte hash) band rows, never frame bytes."""
    from beavers_spark.functions.dedup import hamming_pairs
    from beavers_spark.functions.multimodal import avi_frames

    frames = avi_frames(
        _synth_frame_avis(spark, sf_dir), "payload"
    ).select(
        (F.col("doc_id") * 256 + F.col("frame_idx")).alias("fid"),
        "ahash",
        "n_bytes",
    )
    pairs = hamming_pairs(
        frames, "fid", "ahash", bits=64, max_hamming=3,
        bucket_cap=8, group_cols=("n_bytes",),
    )
    return pairs.select(
        F.shiftright("fid1", 8).alias("doc1"),
        F.col("fid1").bitwiseAND(F.lit(255)).cast("int").alias("frame1"),
        F.shiftright("fid2", 8).alias("doc2"),
        F.col("fid2").bitwiseAND(F.lit(255)).cast("int").alias("frame2"),
        "hamming",
    )


@query(
    "video_frame_neardup_clusters",
    oracle=f"""
    WITH RECURSIVE {_VFN_CTES.format(
        docs_where=f"WHERE doc_id < {_VFN_CLUSTER_DOCS}"
    )},
    pairs AS (SELECT fid1, fid2 FROM cand WHERE hamming <= 3),
    edges AS (
        SELECT fid1 AS src, fid2 AS dst FROM pairs
        UNION ALL SELECT fid2, fid1 FROM pairs
    ),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    comp AS (SELECT a AS fid, min(b) AS cid FROM reach GROUP BY a)
    SELECT (fid >> 8)::BIGINT AS doc_id, (fid & 255)::INT AS frame_idx,
           (cid >> 8)::BIGINT AS cluster_doc,
           (cid & 255)::INT AS cluster_frame
    FROM comp
    """,
)
def video_frame_neardup_clusters_q(spark, sf_dir):
    """Connected components over the perceptual FRAME pair graph —
    each near-dup frame group keeps one canonical (doc, frame)
    representative (the min fid in the component), the
    keep-one-per-cluster discipline a video corpus dedup applies after
    the pair pass. Spark side: the shared Pregel-style min-label loop
    over fid keys; oracle: the identical banded candidate generation
    (shared CTE constant, so the two plans cannot diverge) + a
    recursive-CTE reachability closure. Closure verification is
    GATE-BOUNDED to the first ``_VFN_CLUSTER_DOCS`` docs (see that
    constant: the natural corpus's duplicate classes chain into
    thousands-of-frames components at larger SFs and a SQL transitive
    closure is O(sum |C|^2); the operator itself is unbounded — the
    union-find/min-label path handles the full graph — and the pairs
    plan verifies full-corpus candidates at every scale)."""
    from beavers_spark.functions.dedup import (
        connected_components,
        hamming_pairs,
    )
    from beavers_spark.functions.multimodal import avi_frames

    frames = avi_frames(
        _synth_frame_avis(spark, sf_dir).filter(
            F.col("doc_id") < _VFN_CLUSTER_DOCS
        ),
        "payload",
    ).select(
        (F.col("doc_id") * 256 + F.col("frame_idx")).alias("fid"),
        "ahash",
        "n_bytes",
    )
    pairs = hamming_pairs(
        frames, "fid", "ahash", bits=64, max_hamming=3,
        bucket_cap=8, group_cols=("n_bytes",),
    ).select(
        F.col("fid1").alias("doc1"), F.col("fid2").alias("doc2")
    )
    comp = connected_components(pairs)
    return comp.select(
        F.shiftright("doc_id", 8).alias("doc_id"),
        F.col("doc_id").bitwiseAND(F.lit(255)).cast("int").alias(
            "frame_idx"
        ),
        F.shiftright("cluster_id", 8).alias("cluster_doc"),
        F.col("cluster_id").bitwiseAND(F.lit(255)).cast("int").alias(
            "cluster_frame"
        ),
    )


@query(
    "video_neardup_docs",
    oracle=f"""
    WITH {_VFN_CTES.format(docs_where="")},
    xp AS (
        SELECT (fid1 >> 8)::BIGINT AS doc1, (fid1 & 255) AS f1,
               (fid2 >> 8)::BIGINT AS doc2, (fid2 & 255) AS f2
        FROM cand
        WHERE hamming <= 3 AND (fid1 >> 8) <> (fid2 >> 8)
    ),
    roll AS (
        SELECT doc1, doc2,
               count(DISTINCT f1) AS shared1,
               count(DISTINCT f2) AS shared2
        FROM xp GROUP BY doc1, doc2
    )
    SELECT doc1, doc2,
           shared1::BIGINT AS shared1, shared2::BIGINT AS shared2,
           round(greatest(shared1 / (3.0 + doc1 % 6),
                          shared2 / (3.0 + doc2 % 6)), 6) AS shared_frac
    FROM roll
    WHERE greatest(shared1 / (3.0 + doc1 % 6),
                   shared2 / (3.0 + doc2 % 6)) >= 0.5
    """,
)
def video_neardup_docs_q(spark, sf_dir):
    """DOC-level video near-dup verdicts (VERDICT r10 item 5) — a
    training pipeline dedups DOCUMENTS, not frames: the perceptual
    frame pairs (``video_frame_neardup``'s exact code path: banded
    aHash, hot-bucket chain cap, popcount verify) roll up per
    cross-video pair to the DISTINCT matched frames on each side, and
    a video pair is a near-dup when either side's matched-frame
    coverage reaches 1/2 (``shared_frac = max(shared1/nf1,
    shared2/nf2)`` — the max makes a short clip fully contained in a
    longer video a near-dup of it, the containment case re-encoded
    excerpts actually present). ``nf`` comes from the REAL payloads
    (``avi_meta``'s header ``total_frames`` — a pure-Column header
    decode, no second frame walk), while the oracle recomputes it by
    generator arithmetic (3 + doc % 6), so a decode- or rollup-side
    error diverges. The audio twin needs no rollup: its fingerprint is
    already one-per-track (``audio_neardup`` is doc-level by
    construction). Plan shape at 100 TB: the rollup is a groupBy over
    the (already cap-bounded) pair stream — O(pairs) shuffle of
    4-column rows; the tiny rolled set is broadcast into the
    frame-count joins, so the meta scan never shuffles
    (streaming/frame_neardup.py holds the incremental twin of the
    underlying pair kernel)."""
    from beavers_spark.functions.dedup import hamming_pairs
    from beavers_spark.functions.multimodal import (
        avi_frames,
        avi_meta,
        frame_doc_rollup,
    )

    avis = _synth_frame_avis(spark, sf_dir)
    frames = avi_frames(avis, "payload").select(
        (F.col("doc_id") * 256 + F.col("frame_idx")).alias("fid"),
        "ahash",
        "n_bytes",
    )
    pairs = hamming_pairs(
        frames, "fid", "ahash", bits=64, max_hamming=3,
        bucket_cap=8, group_cols=("n_bytes",),
    ).select(
        F.shiftright("fid1", 8).alias("doc1"),
        F.col("fid1").bitwiseAND(F.lit(255)).alias("f1"),
        F.shiftright("fid2", 8).alias("doc2"),
        F.col("fid2").bitwiseAND(F.lit(255)).alias("f2"),
    )
    nf = avi_meta(avis, "payload").select(
        "doc_id", F.col("total_frames").alias("nf")
    )
    return frame_doc_rollup(pairs, nf, min_shared_frac=0.5)


@query(
    "video_neardup_apply",
    oracle=f"""
    WITH RECURSIVE {_VFN_CTES.format(
        docs_where=f"WHERE doc_id < {_VFN_CLUSTER_DOCS}"
    )},
    xp AS (
        SELECT (fid1 >> 8)::BIGINT AS doc1, (fid1 & 255) AS f1,
               (fid2 >> 8)::BIGINT AS doc2, (fid2 & 255) AS f2
        FROM cand
        WHERE hamming <= 3 AND (fid1 >> 8) <> (fid2 >> 8)
    ),
    roll AS (
        SELECT doc1, doc2,
               count(DISTINCT f1) AS shared1,
               count(DISTINCT f2) AS shared2
        FROM xp GROUP BY doc1, doc2
    ),
    nd AS (
        SELECT doc1, doc2 FROM roll
        WHERE greatest(shared1 / (3.0 + doc1 % 6),
                       shared2 / (3.0 + doc2 % 6)) >= 0.5
    ),
    edges AS (
        SELECT doc1 AS src, doc2 AS dst FROM nd
        UNION ALL SELECT doc2, doc1 FROM nd
    ),
    reach(a, b) AS (
        SELECT src, src FROM edges
        UNION
        SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src
    ),
    labels AS (SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a)
    SELECT d.doc_id FROM documents d
    WHERE d.doc_id < {_VFN_CLUSTER_DOCS}
      AND NOT EXISTS (
        SELECT 1 FROM labels l
        WHERE l.doc_id = d.doc_id AND l.cluster_id <> l.doc_id
    )
    """,
)
def video_neardup_apply_q(spark, sf_dir):
    """Keep-one-canonical-video curation over the doc-level near-dup
    graph — ``dedup_apply``'s discipline on the video corpus: connected
    components over the ``video_neardup_docs`` verdict pairs, keep each
    component's min-id video plus every unpaired one. Closure
    verification is GATE-BOUNDED to the first ``_VFN_CLUSTER_DOCS``
    docs on BOTH engines (the clusters plan's documented rule: the
    doc graph chains through the generator's shared frame classes and
    a SQL transitive closure is O(sum |C|^2); the operator itself —
    min-label loop + broadcast anti-join — is unbounded, and the
    full-corpus rollup is verified by ``video_neardup_docs`` at every
    scale)."""
    from beavers_spark.functions.dedup import (
        apply_dedup,
        connected_components,
        hamming_pairs,
    )
    from beavers_spark.functions.multimodal import (
        avi_frames,
        avi_meta,
        frame_doc_rollup,
    )

    avis = _synth_frame_avis(spark, sf_dir).filter(
        F.col("doc_id") < _VFN_CLUSTER_DOCS
    )
    frames = avi_frames(avis, "payload").select(
        (F.col("doc_id") * 256 + F.col("frame_idx")).alias("fid"),
        "ahash",
        "n_bytes",
    )
    fp = hamming_pairs(
        frames, "fid", "ahash", bits=64, max_hamming=3,
        bucket_cap=8, group_cols=("n_bytes",),
    ).select(
        F.shiftright("fid1", 8).alias("doc1"),
        F.col("fid1").bitwiseAND(F.lit(255)).alias("f1"),
        F.shiftright("fid2", 8).alias("doc2"),
        F.col("fid2").bitwiseAND(F.lit(255)).alias("f2"),
    )
    nf = avi_meta(avis, "payload").select(
        "doc_id", F.col("total_frames").alias("nf")
    )
    nd = frame_doc_rollup(fp, nf, min_shared_frac=0.5).select(
        "doc1", "doc2"
    )
    clusters = connected_components(nd)
    vids = avis.select("doc_id")
    return apply_dedup(vids, clusters, "doc_id").select("doc_id")


def _synth_scene_avis(spark, sf_dir):
    """The deterministic SCENE-structured AVI corpus for the scene-cut
    plan: doc d has 12 + d % 8 frames in 3-frame scenes — frame f's
    bytes depend on its scene s = f // 3 through a QUADRATIC prime mix
    (byte j = (k*k % 257) % 256 with k = (d*11 + s*29 + j*31) % 257;
    squaring mod the prime scrambles the arithmetic progression, so
    consecutive scenes' mean-threshold aHashes sit ~n/2 Hamming bits
    apart — a plain linear mix leaves them a few bits apart and the
    detector blind). Each scene's MIDDLE frame (f % 3 == 1) carries a
    one-byte jitter (+3 on byte 5) — compression-noise-sized, <= 4
    hash bits — so the detector's tolerance band is exercised, not
    just its trigger. Frame size 24 + (d % 3) * 8 bytes — constant
    per doc, so adjacent-frame hashes are always comparable."""
    from beavers_spark.functions.multimodal import synth_avi, synth_movi

    docs = t(spark, sf_dir, "documents")
    nf = F.lit(12) + F.pmod("doc_id", F.lit(8))

    # byte j walks k = (start + 31j) % 257 with start = (d*11 + s*29)
    # % 257 through the quadratic map Q(k) = (k*k % 257) % 256 — i.e.
    # the frame is one contiguous run of the stride-31 ORBIT
    # o(m) = Q((31m) % 257), from index j0 = start * 31^-1 = start*199
    # (mod 257; 31*199 = 1 mod 257). One substring over the doubled
    # orbit literal + a 2-hex-char splice for the middle-frame jitter
    # replaces the per-byte transform (r13 cycle rewrite; byte-
    # identical, pinned by tests/test_synth_generators.py)
    orbit2 = (
        "".join(
            f"{((31 * m) % 257) ** 2 % 257 % 256:02X}"
            for m in range(257)
        )
        * 2
    )

    def frame_bytes(f):
        size = F.lit(24) + F.pmod("doc_id", F.lit(3)) * 8
        start = F.pmod(
            F.col("doc_id") * 11 + F.floor(f / 3) * 29, F.lit(257)
        )
        j0 = F.pmod(start * 199, F.lit(257))
        hexs = F.substring(
            F.lit(orbit2),
            (j0 * 2 + 1).cast("int"),
            (size * 2).cast("int"),
        )
        # middle frame of each scene: byte 5 jitters by +3 (mod 256)
        b5 = F.conv(F.substring(hexs, 11, 2), 16, 10).cast("bigint")
        jit = F.lpad(F.hex(F.pmod(b5 + 3, F.lit(256))), 2, "0")
        return F.when(
            F.pmod(f, F.lit(3)) == 1,
            F.concat(
                F.substring(hexs, 1, 10),
                jit,
                F.substring(
                    hexs, 13, (size * 2 - 12).cast("int")
                ),
            ),
        ).otherwise(hexs)

    return docs.select(
        "doc_id",
        synth_avi(
            synth_movi(nf, frame_bytes),
            F.lit(33333), nf, F.lit(64), F.lit(48),
        ).alias("payload"),
    )


@query(
    "video_scene_cuts",
    oracle="""
    WITH params AS (
        SELECT doc_id, (12 + doc_id % 8)::BIGINT AS nf,
               (24 + (doc_id % 3) * 8)::BIGINT AS n
        FROM documents
    ),
    fr AS (
        SELECT doc_id, n, unnest(generate_series(0, nf - 1)) AS f
        FROM params
    ),
    ks AS (
        SELECT doc_id, f, n, j,
               (doc_id * 11 + (f // 3) * 29 + j * 31) % 257 AS k
        FROM (SELECT doc_id, f, n,
                     unnest(generate_series(0, n - 1)) AS j
              FROM fr)
    ),
    bytes AS (
        SELECT doc_id, f, n, j,
               (CASE WHEN f % 3 = 1 AND j = 5
                     THEN (k * k % 257 % 256 + 3) % 256
                     ELSE k * k % 257 % 256 END)::BIGINT AS b
        FROM ks
    ),
    sig AS (
        SELECT doc_id, f,
               sum(CASE WHEN b * n > tot
                        THEN (1::BIGINT << j::INT) ELSE 0 END
               )::BIGINT AS ahash
        FROM (SELECT *, sum(b) OVER (PARTITION BY doc_id, f) AS tot
              FROM bytes)
        GROUP BY doc_id, f
    ),
    cuts AS (
        SELECT doc_id, f,
               CASE WHEN pv IS NULL THEN 0
                    WHEN bit_count(xor(ahash, pv)) > 4 THEN 1
                    ELSE 0 END AS cut
        FROM (SELECT doc_id, f, ahash,
                     lag(ahash) OVER (
                         PARTITION BY doc_id ORDER BY f
                     ) AS pv
              FROM sig)
    ),
    scenes AS (
        SELECT doc_id, f,
               sum(cut) OVER (
                   PARTITION BY doc_id ORDER BY f
                   ROWS UNBOUNDED PRECEDING
               ) AS scene_id
        FROM cuts
    )
    SELECT doc_id, scene_id::BIGINT AS scene_id,
           min(f)::INT AS start_frame, count(*)::BIGINT AS n_frames
    FROM scenes GROUP BY doc_id, scene_id
    """,
)
def video_scene_cuts_q(spark, sf_dir):
    """SHOT/SCENE boundary detection — the segmentation pass a video
    training pipeline runs before per-scene frame sampling (the scene
    table IS the sample: ``start_frame`` is each scene's
    representative frame). A cut is declared between adjacent frames
    whose perceptual aHashes (``avi_frames``' mean-threshold bitmap,
    decoded once from the payload) differ by more than 4 Hamming bits;
    ``scene_id`` is the running cut count (a lag + bit_count(xor) +
    cumulative-sum window chain, JVM-side end to end after the one
    decode pass), and scenes aggregate to (start_frame, n_frames)
    rows. The window partitions by doc_id — per-video state never
    crosses documents, so the plan scales with the corpus, not the
    longest video. The corpus makes BOTH sides of the threshold real:
    scene boundaries sit ~n/2 bits apart (detected), the middle frame
    of every scene carries a compression-noise-sized jitter of <= 4
    bits (tolerated — never a false cut). The oracle recomputes every
    frame hash from the scene generator's byte arithmetic and runs
    the identical lag/threshold/cumsum chain — it never sees bytes or
    the kernel (functions/multimodal.py avi_frames)."""
    from pyspark.sql import Window

    from beavers_spark.functions.multimodal import avi_frames

    frames = avi_frames(
        _synth_scene_avis(spark, sf_dir), "payload"
    ).select("doc_id", "frame_idx", "ahash")
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    prev = F.lag("ahash").over(w)
    cut = (
        F.when(prev.isNull(), F.lit(0))
        .otherwise(
            (
                F.bit_count(F.col("ahash").bitwiseXOR(prev)) > 4
            ).cast("int")
        )
    )
    scenes = frames.withColumn("cut", cut).withColumn(
        "scene_id",
        F.sum("cut").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return scenes.groupBy("doc_id", "scene_id").agg(
        F.min("frame_idx").cast("int").alias("start_frame"),
        F.count("*").alias("n_frames"),
    )


@query(
    "ppm_resize",
    oracle=f"""
    WITH params AS (
        SELECT doc_id, w, h, (2 + doc_id % 3)::BIGINT AS f
        FROM ({_PPM_DIMS_SQL})
    ),
    ys AS (SELECT *, unnest(generate_series(0, (h + f - 1) // f - 1))
               AS y FROM params),
    xs AS (SELECT *, unnest(generate_series(0, (w + f - 1) // f - 1))
               AS x FROM ys),
    cs AS (SELECT *, unnest([0, 1, 2]) AS c FROM xs)
    SELECT doc_id,
           ((w + f - 1) // f)::INT AS out_w,
           ((h + f - 1) // f)::INT AS out_h,
           (count(*) // 3)::BIGINT AS n_pixels,
           (sum((doc_id * 7 + ((y * f * w + x * f) * 3 + c)) % 256)
           )::BIGINT AS pix_sum
    FROM cs GROUP BY doc_id, out_w, out_h
    """,
)
def ppm_resize_q(spark, sf_dir):
    """A REAL resize, hash-checked through a CHAIN of payload kernels
    (the decode -> transform -> feature-extract pipeline shape): build
    the deterministic P6 payloads, nearest-neighbor-downsample each by
    a per-doc factor (``ppm_resize`` — numpy strided slice, output is
    itself canonical P6), then run ``ppm_stats`` on the RESIZED binary
    and emit dims + pixel checksum. The oracle recomputes which input
    pixels survive the stride and sums their generator values by
    independent arithmetic — a wrong sample grid, a corrupted output
    header, or a dropped channel all fail the hash."""
    from beavers_spark.functions.multimodal import ppm_resize, ppm_stats

    docs = t(spark, sf_dir, "documents")
    w, h = _ppm_dims()
    ppms = docs.select(
        "doc_id", _ppm_pixels(w, h).alias("payload")
    )
    rs = ppm_resize(ppms, "payload", 2 + F.pmod("doc_id", F.lit(3)))
    return ppm_stats(rs, "resized").select(
        "doc_id", "out_w", "out_h", "n_pixels", "pix_sum"
    )


#: the deterministic AVI synth schedule shared by avi_meta and
#: video_frame_plan — ONE definition in each engine so the two plans
#: cannot silently diverge
_AVI_UPFS = (100000, 41666, 40000, 33333)
_AVI_PARAMS_SQL = """
               ([100000, 41666, 40000, 33333][(doc_id % 4)::INT + 1])::BIGINT
                   AS usec_per_frame,
               (1 + doc_id % 240)::BIGINT AS total_frames"""


def _avi_upf_frames():
    """(usec_per_frame, total_frames) Columns of the synth schedule."""
    upf = F.element_at(
        F.array(*[F.lit(x) for x in _AVI_UPFS]),
        (F.pmod("doc_id", F.lit(4)) + 1).cast("int"),
    )
    return upf, 1 + F.pmod("doc_id", F.lit(240))


@query(
    "avi_meta",
    oracle=f"""
    WITH params AS (
        SELECT doc_id,{_AVI_PARAMS_SQL},
               (16 + doc_id % 64)::INT AS width,
               (16 + (doc_id // 64) % 64)::INT AS height,
               octet_length(encode(substr(text, 1, 100)))::BIGINT AS dlen
        FROM documents
    )
    SELECT doc_id, 'avi' AS format, usec_per_frame, total_frames,
           1 AS n_streams, width, height,
           floor(usec_per_frame * total_frames / 1000.0)::BIGINT
               AS duration_ms,
           (88 + dlen)::BIGINT AS n_bytes
    FROM params
    """,
)
def avi_meta_q(spark, sf_dir):
    """Video-header decode, hash-checked: build a canonical RIFF AVI
    main header ('avih', deterministic frame period / count / geometry
    from doc_id, text bytes as the movi stand-in) per document, then
    parse the binary back with fixed-offset little-endian Column math —
    no UDF. The DuckDB oracle recomputes every field by independent
    arithmetic; the byte layout is pinned against struct.pack in tests
    (functions/multimodal.py synth_avi/avi_meta). Completes the
    image (ppm) / audio (wav) / video (avi) decode triple."""
    from beavers_spark.functions.multimodal import avi_meta, synth_avi

    docs = t(spark, sf_dir, "documents")
    upf, frames = _avi_upf_frames()
    avis = docs.select(
        "doc_id",
        synth_avi(
            F.encode(F.substring("text", 1, 100), "UTF-8"),
            upf,
            frames,
            (16 + F.pmod("doc_id", F.lit(64))).cast("int"),
            (16 + F.pmod(F.floor(F.col("doc_id") / 64), F.lit(64))).cast(
                "int"
            ),
        ).alias("payload"),
    )
    return avi_meta(avis, "payload").select(
        "doc_id", "format", "usec_per_frame", "total_frames",
        "n_streams", "width", "height", "duration_ms", "n_bytes",
    )


@query(
    "video_frame_plan",
    oracle=f"""
    WITH params AS (
        SELECT doc_id,{_AVI_PARAMS_SQL}
        FROM documents
    ),
    durs AS (
        SELECT doc_id,
               floor(usec_per_frame * total_frames / 1000.0)::BIGINT
                   AS duration_ms
        FROM params
    )
    SELECT doc_id,
           unnest(range(CAST(ceil(duration_ms / 1000.0) AS BIGINT)))
               AS frame_idx,
           unnest(range(CAST(ceil(duration_ms / 1000.0) AS BIGINT)))
               * 1000 AS frame_ts_ms
    FROM durs WHERE duration_ms > 0
    """,
)
def video_frame_plan_q(spark, sf_dir):
    """End-to-end video pipeline head: decode the AVI header (avi_meta,
    Column byte math) and expand each video into 1-per-second frame-
    sampling rows (frame_sample_plan — JVM sequence+explode BEFORE any
    shuffle, so the downstream decode kernel distributes evenly even
    when a few videos are huge; the heavy payload column does NOT ride
    the fan-out). The oracle recomputes durations arithmetically and
    unnests the same ranges."""
    from beavers_spark.functions.multimodal import (
        avi_meta,
        frame_sample_plan,
        synth_avi,
    )

    docs = t(spark, sf_dir, "documents")
    upf, frames = _avi_upf_frames()
    avis = docs.select(
        "doc_id",
        synth_avi(
            F.encode(F.substring("text", 1, 100), "UTF-8"),
            upf,
            frames,
            F.lit(640),
            F.lit(480),
        ).alias("payload"),
    )
    parsed = avi_meta(avis, "payload").select(
        "doc_id", F.struct(F.col("duration_ms")).alias("media_meta")
    )
    return frame_sample_plan(parsed, "doc_id", every_ms=1000).select(
        "doc_id",
        "frame_idx",
        F.col("frame_ts_ms").cast("bigint").alias("frame_ts_ms"),
    )


_WINNOW_ORACLE = f"""
    WITH base AS (
        SELECT doc_id, lower(text) AS t FROM documents
        WHERE doc_id % 10 = 0  -- deterministic sample: md5-per-gram oracle is costly
          AND length(lower(text)) >= 11  -- k + window - 1
    ),
    grams AS (
        SELECT doc_id,
               [{_sql_hash64("substr(t, i, 8)", 0)}
                FOR i IN range(1, length(t) - 8 + 2)] AS hs
        FROM base
    ),
    wins AS (
        SELECT doc_id,
               list_distinct([list_min(hs[j:j+3])
                              FOR j IN range(1, len(hs) - 4 + 2)]) AS fps
        FROM grams
    )
    SELECT doc_id, unnest(fps) AS fp FROM wins
"""


@query("winnow_fingerprint", oracle=_WINNOW_ORACLE)
def winnow_fingerprint(spark, sf_dir):
    """Rolling-hash document fingerprints via winnowing (k=8 char grams,
    window=4): position-local near-copy detection, complementary to the
    order-blind MinHash family. Hash-checked against a DuckDB
    list-comprehension twin of the same k-gram/window-min pipeline."""
    from beavers_spark.functions.dedup import winnowing_fingerprints

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    return winnowing_fingerprints(docs, "text", "doc_id", k=8, window=4)


@query(
    "winnow_near_dup",
    oracle=_WINNOW_ORACLE.replace(
        "SELECT doc_id, unnest(fps) AS fp FROM wins",
        """, fp AS (SELECT doc_id, unnest(fps) AS fp FROM wins)
    SELECT a.doc_id AS doc1, b.doc_id AS doc2, count(*) AS shared
    FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2 HAVING count(*) >= 2""",
    ),
)
def winnow_near_dup(spark, sf_dir):
    """Near-copy candidate pairs: docs sharing >= 2 winnowing
    fingerprints — an inverted-index equi-join on fp (the same
    no-cartesian discipline as MinHash banding), position-local so it
    catches copied PASSAGES that token-shingle Jaccard dilutes away."""
    from beavers_spark.functions.dedup import winnowing_fingerprints

    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    fp = winnowing_fingerprints(docs, "text", "doc_id", k=8, window=4)
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
    )


@query(
    "dedup_apply",
    oracle=_CLUSTERS_ORACLE.replace(
        "SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a",
        """, labels AS (
        SELECT a AS doc_id, min(b) AS cluster_id FROM reach GROUP BY a
    )
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (
        SELECT 1 FROM labels l
        WHERE l.doc_id = d.doc_id AND l.cluster_id <> l.doc_id
    )""",
    ),
)
def dedup_apply(spark, sf_dir):
    """End-to-end curation: the corpus AFTER near-dup removal — every
    cluster keeps only its canonical (min-id) member. The drop list is
    tiny vs the corpus, so it broadcasts and the scan never shuffles."""
    from beavers_spark.functions.dedup import apply_dedup, connected_components

    docs = t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.2).select(
        "doc1", "doc2"
    )
    clusters = connected_components(pairs)
    return apply_dedup(docs, clusters, "doc_id").select("doc_id")


_SQL_BUCKET = (
    "((('0x' || substr(md5(doc_id::VARCHAR || '#0'), 1, 15))::BIGINT)"
    " % 10000)"
)


@query(
    "deterministic_sample",
    oracle=f"""
    SELECT doc_id, {_SQL_BUCKET} AS bucket
    FROM documents
    WHERE {_SQL_BUCKET} < 2000
    """,
)
def deterministic_sample_q(spark, sf_dir):
    """20% corpus sample by id-hash bucket: reproducible on any engine or
    partitioning (the oracle computes the identical md5 buckets), stable
    under corpus growth, and a pure scan-level filter — no shuffle, no
    rand(). The standard way training pipelines subset a corpus."""
    from beavers_spark.functions.sampling import deterministic_sample, hash_bucket

    docs = t(spark, sf_dir, "documents")
    return deterministic_sample(docs, "doc_id", 0.2).select(
        "doc_id", hash_bucket(F.col("doc_id")).alias("bucket")
    )


@query(
    "train_val_test_split",
    oracle=f"""
    SELECT CASE WHEN {_SQL_BUCKET} < 9000 THEN 'train'
                WHEN {_SQL_BUCKET} < 9500 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n,
           count(DISTINCT doc_id) AS n_docs
    FROM documents
    GROUP BY 1
    """,
)
def train_val_test_split_q(spark, sf_dir):
    """90/5/5 split assignment by contiguous hash-bucket ranges — every
    document lands in exactly one split, forever (membership never moves
    when new documents arrive). A projection + one tiny count shuffle."""
    from beavers_spark.functions.sampling import split_assign

    docs = t(spark, sf_dir, "documents")
    return (
        split_assign(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "daily_uniques",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           count(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
)
def daily_uniques(spark, sf_dir):
    """Exact distinct users per (day, event_type) — the batch twin of
    streaming/distinct_rollup.ContinuousDistinct (which trades exactness
    for mergeable HLL state). One expand-free path: Spark plans
    count_distinct as a two-stage aggregate (partial distinct on
    (day, type, user), then count), both stages on the same keys."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


#: hamming <= 1 over the 16-bit signature: two 8-bit bands (256 bucket
#: values per band — at 100x corpus the band join fans out n^2/256 per
#: band, vs n^2/16 for the 4-band/hamming-3 layout, and a 1-bit budget
#: is the meaningful near-dup bar for a 16-bit sketch)
_SH_BITS, _SH_MAXH = 16, 1
_SH_W = _SH_BITS // (_SH_MAXH + 1)
_SH_MASK = (1 << _SH_W) - 1


@query(
    "simhash_pairs",
    oracle=f"""
    WITH {_simhash_sig_ctes(_SH_BITS)},
    bands AS (
        SELECT doc_id, simhash, b.i AS band_id,
               (simhash >> (b.i * {_SH_W})) & {_SH_MASK} AS bv
        FROM sig, (SELECT unnest(range({_SH_MAXH + 1})) AS i) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc1, b2.doc_id AS doc2,
               CAST(bit_count(xor(a.simhash, b2.simhash)) AS BIGINT)
                   AS hamming
        FROM bands a JOIN bands b2
          ON a.band_id = b2.band_id AND a.bv = b2.bv
         AND a.doc_id < b2.doc_id
    )
    SELECT doc1, doc2, hamming FROM cand WHERE hamming <= {_SH_MAXH}
    """,
)
def simhash_pairs_q(spark, sf_dir):
    """EXACT SimHash near-dup pairs (hamming <= {maxh} over the
    {bits}-bit signature): candidates from the pigeonhole band
    equi-join ({nbands} bands of {w} bits — a within-budget pair must
    agree on a whole band), then the popcount-XOR verify makes the
    result exact. The banded shape is what survives at corpus scale;
    the oracle runs the identical banding, so even candidate
    generation is hash-checked (functions/dedup.py simhash_pairs)."""
    from beavers_spark.functions.dedup import simhash_pairs

    return simhash_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id",
        bits=_SH_BITS, max_hamming=_SH_MAXH,
    )


simhash_pairs_q.__doc__ = simhash_pairs_q.__doc__.format(
    maxh=_SH_MAXH, bits=_SH_BITS, nbands=_SH_MAXH + 1, w=_SH_W
)


#: hot-bucket cap for the capped simhash plan — small enough that this
#: corpus's signature concentration actually chains buckets (the plan is
#: the degenerate-fan-out mitigation, so the bench/oracle must exercise
#: BOTH the exact-small-bucket and the chained-mega-bucket paths)
_SH_CAP = 8


@query(
    "simhash_pairs_capped",
    oracle=f"""
    WITH {_simhash_sig_ctes(_SH_BITS)},
    bands AS (
        SELECT doc_id, simhash, b.i AS band_id,
               (simhash >> (b.i * {_SH_W})) & {_SH_MASK} AS bv
        FROM sig, (SELECT unnest(range({_SH_MAXH + 1})) AS i) b
    ),
    ranked AS (
        SELECT doc_id, simhash, band_id, bv,
               count(*) OVER (PARTITION BY band_id, bv) AS cnt,
               lead(doc_id) OVER (
                   PARTITION BY band_id, bv ORDER BY doc_id
               ) AS nxt,
               lead(simhash) OVER (
                   PARTITION BY band_id, bv ORDER BY doc_id
               ) AS nxt_sig
        FROM bands
    ),
    cand AS (
        SELECT DISTINCT doc1, doc2,
               CAST(bit_count(xor(s1, s2)) AS BIGINT) AS hamming
        FROM (
            SELECT a.doc_id AS doc1, b2.doc_id AS doc2,
                   a.simhash AS s1, b2.simhash AS s2
            FROM ranked a JOIN ranked b2
              ON a.band_id = b2.band_id AND a.bv = b2.bv
             AND a.doc_id < b2.doc_id
            WHERE a.cnt <= {_SH_CAP} AND b2.cnt <= {_SH_CAP}
            UNION ALL
            SELECT doc_id, nxt, simhash, nxt_sig FROM ranked
            WHERE cnt > {_SH_CAP} AND nxt IS NOT NULL
        )
    )
    SELECT doc1, doc2, hamming FROM cand WHERE hamming <= {_SH_MAXH}
    """,
)
def simhash_pairs_capped_q(spark, sf_dir):
    """simhash_pairs under a hot-bucket cap: band buckets of size
    <= {cap} keep exact all-pairs; oversized buckets chain (doc_id
    order, row i with row i+1) — the degenerate-fan-out mitigation the
    uncapped plan's docstring names, same contract as
    dedup_minhash_capped. The oracle runs the identical rank/chain
    banding, so the cap semantics are hash-checked, not just the
    surviving pairs (functions/dedup.py simhash_pairs bucket_cap)."""
    from beavers_spark.functions.dedup import simhash_pairs

    return simhash_pairs(
        t(spark, sf_dir, "documents"), "text", "doc_id",
        bits=_SH_BITS, max_hamming=_SH_MAXH, bucket_cap=_SH_CAP,
    )


simhash_pairs_capped_q.__doc__ = simhash_pairs_capped_q.__doc__.format(
    cap=_SH_CAP
)
