"""Embedding similarity search: brute-force cosine top-k, an
LSH-bucketed approximate variant, and an IVF (inverted-file) variant
with a KMeans-trained quantizer (the 100 TB scale paths).

Vector math is expressed with ``F.zip_with`` / ``F.aggregate`` over
``array<float>`` columns — JVM-side higher-order functions, no Python in
the loop. Accumulation is in double precision in strict index order, which
makes results bit-reproducible (and oracle-comparable).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _cos(dot: Column, na: Column, nb: Column) -> Column:
    """ANSI-safe cosine from precomputed dot + norms: 0.0 when either
    norm is 0 — a zero vector is similar to nothing, matching the
    behavior of every ``>= threshold`` consumer (Spark 4's default ANSI
    mode would otherwise abort the job with DIVIDE_BY_ZERO; DuckDB's
    inf/NaN rows fall out of the same filters)."""
    denom = na * nb
    return F.when(denom > 0, dot / denom).otherwise(F.lit(0.0))


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<numeric> columns (ANSI-safe:
    0.0 when either vector has zero norm)."""
    return _cos(_dot(a, b), _norm(a), _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query vector.

    Plan shape: broadcast the (small) query set against the corpus — a
    broadcast nested-loop that scans the corpus ONCE for all queries —
    then per-query top-k via window row_number. Ranking is on the rounded
    similarity with corpus-id tiebreak so results are deterministic.

    At 100 TB: corpus scan parallelizes perfectly; the window shuffle is
    keyed on query_id (cardinality = |queries|), so for large query sets
    switch to ``lsh_bucketed_topk``.
    """
    # Precompute each side's norm ONCE behind a projection boundary —
    # inlining cosine_sim would re-fold both norms per pair. Repartition
    # the corpus: a single parquet file scans as one partition, which
    # would serialize the (CPU-heavy) higher-order dot products.
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c = (
        corpus.repartition(parallelism)
        .select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("cn", _norm(F.col("cv")))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cos(_dot(F.col("qv"), F.col("cv")),
                     F.col("qn"), F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    return scored.withColumn("rnk", w).filter(F.col("rnk") <= k)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    train_fraction: float = 1.0,
    n_assign: int = 1,
) -> DataFrame:
    """IVF ANN: KMeans-partitioned corpus, queries probe the ``n_probe``
    nearest cells, exact cosine rerank within probed cells only.

    The classic inverted-file index, Spark-first:

    1. *Train*: fit a ``n_cells``-way k-means quantizer (seeded
       driver-side Lloyd's over a bounded sample —
       ``vectorized.train_quantizer``) — sampling is the standard IVF
       practice since the quantizer only needs the coarse density shape.
    2. *Assign*: one narrow Arrow-vectorized pass (``vectorized.best_cells``,
       a numpy matmul per batch) labels each corpus vector
       with its ``n_assign`` best cells by centroid cosine — no shuffle,
       and at 100 TB the assignment can be written back as a partition
       column so later queries prune cells at the parquet-scan level
       (``n_assign > 1`` replicates each vector into that many partitions,
       the standard IVF boundary-miss mitigation: a true neighbor near a
       cell boundary is indexed in BOTH adjacent cells, so missing it
       requires the query to miss both).
    3. *Probe*: each query computes its affinity to all ``n_cells``
       centroids (a tiny literal array), keeps the ``n_probe`` best via
       ``array_sort`` + ``slice``, and equi-joins the corpus on cell id —
       candidate volume ~ ``n_assign * n_probe / n_cells`` of the data,
       never a cross join.

    Affinity is COSINE to the centroid (not L2 — KMeans centroids are
    interior points with varying norms, and on unit-norm corpora
    L2-to-centroid systematically favors large-norm centroids over
    well-aligned ones). Recall/cost dial: ``n_probe = n_cells``
    degenerates to exact brute force; ``n_probe = 1`` is the
    fastest/lowest-recall point.
    """
    from beavers_spark.functions.vectorized import best_cells, train_quantizer

    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    train = corpus if train_fraction >= 1.0 else corpus.sample(
        fraction=train_fraction, seed=seed
    )
    centroids = train_quantizer(train, vec_col, n_cells, seed=seed)

    c = (
        corpus.repartition(parallelism)
        .select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("cn", _norm(F.col("cv")))
        .withColumn("cell", F.explode(best_cells(F.col("cv"), centroids, n_assign)))
    )

    q = (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .withColumn("qn", _norm(F.col("qv")))
        .withColumn("cell", F.explode(best_cells(F.col("qv"), centroids, n_probe)))
    )

    scored = (
        c.join(F.broadcast(q), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cos(_dot(F.col("qv"), F.col("cv")),
                     F.col("qn"), F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    return scored.withColumn("rnk", w).filter(F.col("rnk") <= k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from a hash counter (no RNG
    state, reproducible across runs/machines)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{d}".encode()).hexdigest()
            v = (int(h[:15], 16) / float(1 << 60)) * 2.0 - 1.0
            row.append(v)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return bucket


def lsh_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.3,
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 12,
    seed: int = 7,
) -> DataFrame:
    """Approximate all-pairs embedding near-duplicates: multi-table
    hyperplane LSH banding -> candidate pairs -> exact-cosine verify.

    The pair analog of MinHash banding (functions/dedup.minhash_lsh_pairs)
    for dense vectors: each of ``n_tables`` tables hashes every vector with
    its own ``n_planes`` hyperplanes; a pair is a candidate iff it
    collides in at least one table. Candidates are verified with the exact
    cosine and thresholded, so false positives cost compute but never
    wrong output; false negatives are pairs colliding in NO table —
    P[miss] = (1 - p^b)^T with p = 1 - angle/pi, so recall is dialed by
    (n_planes, n_tables). The defaults hold pair-recall >= 0.9 at
    threshold 0.3 (gated by the ``dedup_embedding_recall`` plan).

    Scale shape (the reason this is the registered 100 TB path, vs the
    probe-block cross join it replaced): hashing is one narrow map over
    the corpus; candidate generation is an equi-join on (table, bucket);
    the pair-dedup shuffle carries only (id1, id2); vectors are joined
    back just for the verify — the same candidates-only discipline as
    MinHash. Never a cross join.
    """
    from beavers_spark.functions.vectorized import lsh_bucket_ids

    tables = [
        _hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)
    ]
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    base = (
        df.repartition(parallelism)
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("n", _norm(F.col("v")))
    )
    hashed = base.select(
        "id", F.posexplode(lsh_bucket_ids(F.col("v"), tables)).alias("tbl", "bkt")
    )
    a, b = hashed.alias("a"), hashed.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id1"), F.col("b.id").alias("id2"))
        .distinct()
    )
    x, y = base.alias("x"), base.alias("y")
    return (
        cand.join(x, F.col("id1") == F.col("x.id"))
        .join(y, F.col("id2") == F.col("y.id"))
        .withColumn(
            "sim",
            F.round(
                _cos(_dot(F.col("x.v"), F.col("y.v")),
                     F.col("x.n"), F.col("y.n")), 6
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select("id1", "id2", "sim")
    )


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    multi_probe: bool = True,
    n_tables: int = 1,
    seed: int = 7,
    broadcast_queries: bool = True,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucketing, candidates restricted
    to colliding buckets, exact cosine rerank on DEDUPLICATED candidates.

    ``broadcast_queries`` picks the join strategy for the (table,
    bucket) equi-join: True (default) broadcasts the bucket-exploded
    query side — right when queries are a bounded operand; False leaves
    it a shuffle hash join — REQUIRED when the query side is
    corpus-scale (see :func:`knn_join`), where broadcasting would ship
    the whole corpus to every task.

    The scale path: the corpus is hashed once per table (narrow map), the
    join is an equi-join on (table, bucket) — a hash shuffle on a
    ``n_tables * 2^n_planes``-ary key — and the rerank only touches
    bucket-mates, never a cross join.

    Two recall dials, composable:
    - ``multi_probe``: each query additionally probes every bucket at
      Hamming distance 1 from its own (a near neighbor falling on the
      wrong side of ONE hyperplane is the dominant miss mode).
    - ``n_tables``: independent hash tables (fresh hyperplanes per
      table), the banding trick from MinHash-LSH — a pair is a candidate
      iff it collides in >= 1 table, so P[miss] = (1 - p^b)^T. On
      weakly-clustered embeddings (true neighbors near cosine 0.25, as in
      the synthetic test corpus) multi-table is what reaches recall 0.9+:
      b=3/T=16 holds recall@10 >= 0.9 (gated by the ``ann_lsh_recall``
      plan) at ~2x-corpus candidate volume per query.

    Candidates are deduplicated on (query, neighbor) BEFORE the rerank:
    without this, a pair colliding in several probes/tables occupies
    several top-k slots (duplicate output rows + depressed recall).
    """
    from beavers_spark.functions.vectorized import lsh_bucket_ids

    tables = [
        _hyperplanes(dim, n_planes, seed=seed + 1000 * t) for t in range(n_tables)
    ]
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    offsets = (
        F.array(F.lit(0), *[F.lit(1 << i) for i in range(n_planes)])
        if multi_probe
        else F.array(F.lit(0))
    )
    q = (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .withColumn("qn", _norm(F.col("qv")))
        .select(
            "query_id",
            "qv",
            "qn",
            F.posexplode(lsh_bucket_ids(F.col("qv"), tables)).alias(
                "tbl", "bkt0"
            ),
        )
        .withColumn(
            "bkt",
            F.explode(F.transform(offsets, lambda m: F.col("bkt0").bitwiseXOR(m))),
        )
        .drop("bkt0")
        .dropDuplicates(["query_id", "tbl", "bkt"])
    )
    c = (
        corpus.repartition(parallelism)
        .select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .withColumn("cn", _norm(F.col("cv")))
        .select(
            "neighbor_id",
            "cv",
            "cn",
            F.posexplode(lsh_bucket_ids(F.col("cv"), tables)).alias("tbl", "bkt"),
        )
    )
    q_side = F.broadcast(q) if broadcast_queries else q
    scored = (
        c.join(q_side, ["tbl", "bkt"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cos(_dot(F.col("qv"), F.col("cv")),
                     F.col("qn"), F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    return scored.withColumn("rnk", w).filter(F.col("rnk") <= k)


def knn_join(
    corpus: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 3,
    n_tables: int = 16,
    multi_probe: bool = False,
    seed: int = 7,
) -> DataFrame:
    """Corpus-scale k-NN self-join: for EVERY document, its ``k``
    nearest neighbors by cosine — the retrieval/near-dup-graph shape
    where the query set IS the corpus, so nothing is broadcastable.

    Same multi-table hyperplane-LSH banding as ``lsh_bucketed_topk``
    (candidates from a (table, bucket) SHUFFLE equi-join, exact rerank
    of deduplicated bucket-mates, per-query top-k window keyed on the
    query id) with ``broadcast_queries=False`` — at 100 TB both sides
    are corpus-sized and the equi-join shuffles on the
    ``n_tables * 2^n_planes``-ary bucket key. Recall is gated by
    ``ann_knn_join_recall``.
    """
    return lsh_bucketed_topk(
        corpus, corpus, id_col, id_col, vec_col,
        k=k, dim=dim, n_planes=n_planes, multi_probe=multi_probe,
        n_tables=n_tables, seed=seed, broadcast_queries=False,
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    m: int = 8,
    nbits: int = 4,
    refine: int = 8,
    seed: int = 7,
    max_queries: int = 1024,
    scan_partitions: int | None = None,
    strict_exact: bool = False,
) -> DataFrame:
    """Product-quantization ANN with asymmetric-distance scoring and an
    exact refine — the compressed-scan scale path (IVF's complement: IVF
    prunes WHICH vectors are scored, PQ shrinks WHAT a scoring scan
    reads).

    1. *Train*: ``m`` sub-quantizers of ``2^nbits`` centroids each on the
       bounded deterministic sample (``vectorized.train_pq``).
    2. *Encode*: one Arrow-vectorized pass maps each corpus vector to
       ``m`` small ints — at 1024-dim float32 that is 4 KiB → ``m``
       bytes per vector, so the ANN scan reads ~3 orders of magnitude
       less than the raw embedding column.
    3. *ADC scan*: query sub-vector × sub-centroid lookup tables are
       built driver-side (queries are a bounded operand of the search,
       capped at ``max_queries``; for corpus-scale query sets use
       ``lsh_bucketed_topk``/``ivf_topk``) and closed over a
       ``mapInPandas`` pass: per Arrow batch one LUT gather scores ALL
       queries, and each PARTITION emits only its local top
       ``refine·k`` per query — rows leaving the scan are
       O(partitions · |Q| · refine·k), never O(corpus).
    4. *Refine*: the candidate union is exact-cosine reranked against
       the ORIGINAL vectors, fetched for candidate ids only via a
       broadcast join; top-``k`` per query by (rounded sim, id).

    Approx cosine uses the reconstruction q·x̂ / (|q|·|x̂|) with |x̂|
    from the per-subspace centroid norms (subspaces are an orthogonal
    decomposition, so |x̂|² = Σ_j |c_j|²). The exact refine makes the
    emitted similarities exact; PQ resolution only decides which
    candidates reach the rerank — recall is gated by ``ann_pq_recall``.
    """
    from beavers_spark.functions.vectorized import pq_encode, train_pq

    got = _collect_queries(queries, query_id, vec_col, max_queries, "pq_topk")
    if got is None:
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rnk int"
        )
    qid_arr, qmat = got
    codebooks = train_pq(corpus, vec_col, m=m, nbits=nbits, seed=seed)
    # repartition: a single parquet file scans as ONE partition, which
    # would serialize the ADC pass (same rationale as brute_force_topk).
    # ``scan_partitions`` (hash on the id) pins the partitioning — and
    # with it the per-partition top-r candidate set — independent of the
    # session's parallelism: registered plans pass a fixed value so the
    # result is deterministic in ANY session. Exactness holds while
    # EVERY partition holds <= refine*k rows (then no partition ever
    # prunes and the refine sees the whole corpus); note hash
    # partitioning is only even ON AVERAGE — ``strict_exact`` turns the
    # bound into a loud per-partition assertion instead of trusting the
    # average case (review r6). Default None = session parallelism.
    parallelism = scan_partitions or (
        corpus.sparkSession.sparkContext.defaultParallelism
    )
    part_key = [F.col(corpus_id)] if scan_partitions else []
    codes_df = corpus.repartition(parallelism, *part_key).select(
        F.col(corpus_id).alias("neighbor_id"),
        pq_encode(F.col(vec_col), codebooks).alias("code"),
    )
    cand = _adc_candidates(
        codes_df, qid_arr, qmat, codebooks, refine * k,
        strict_exact=strict_exact,
    )
    return _exact_refine(queries, corpus, query_id, corpus_id, vec_col, cand, k)


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    nbits: int = 4,
    refine: int = 8,
    seed: int = 7,
    max_queries: int = 1024,
    n_assign: int = 1,
    scan_partitions: int | None = None,
    strict_exact: bool = False,
) -> DataFrame:
    """IVF-PQ ANN — the two scale levers composed: the coarse quantizer
    prunes WHICH vectors are scored (queries probe ``n_probe`` of
    ``n_cells`` cells) and PQ shrinks WHAT the scoring scan reads
    (``m`` codes per vector instead of the embedding). faiss's
    ``IVFx,PQy`` layout, Spark-first; codes encode raw vectors (IVF-Flat
    + PQ codes) rather than residuals, since the exact refine — not code
    resolution — sets the emitted similarities.

    Plan shape: the encoded corpus carries a ``cell`` column, so at rest
    it partitions by cell and a query batch's probed-cell union prunes
    the scan at the file level (``cell IN (...)`` reaches the parquet
    scan; the registered plan asserts the pushed filter). Inside the one
    ``mapInPandas`` pass each query scores only rows whose cell it
    probed (per-query masks over the same LUT gather), each partition
    emits its top ``refine·k`` per query, and the candidate union gets
    the exact-cosine rerank. Recall is gated by ``ann_ivfpq_recall``.
    """
    import numpy as np

    from beavers_spark.functions.vectorized import (
        best_cells,
        pq_encode,
        train_pq,
        train_quantizer,
    )

    got = _collect_queries(
        queries, query_id, vec_col, max_queries, "ivfpq_topk"
    )
    if got is None:
        return queries.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, sim double, rnk int"
        )
    qid_arr, qmat = got
    # ONE full-corpus sample scan feeds both trainers (VERDICT r4 item
    # 2): the sample is a pure function of (corpus, vec_col, seed), so
    # sharing it is a no-op on results but removes a corpus pass
    from beavers_spark.functions.vectorized import _train_sample, MAX_TRAIN_ROWS

    x = _train_sample(corpus, vec_col, seed, MAX_TRAIN_ROWS)
    centroids = train_quantizer(corpus, vec_col, n_cells, seed=seed, sample=x)
    codebooks = train_pq(corpus, vec_col, m=m, nbits=nbits, seed=seed, sample=x)

    # per-query probed cells: same cosine affinity + stable argsort as
    # vectorized.best_cells, computed driver-side on the collected
    # query matrix (bounded)
    order = _probe_order(qmat, centroids, n_probe)
    probed = np.zeros((len(qid_arr), len(centroids)), dtype=bool)
    for qi, cells in enumerate(order):
        probed[qi, cells] = True
    union_cells = sorted({int(c) for row in order for c in row})

    # n_assign > 1 indexes each vector in its n best cells (the IVF
    # boundary-miss mitigation, same dial as ivf_topk); duplicate
    # (query, neighbor) candidates collapse in the distinct
    # scan_partitions: same deterministic-partitioning dial as pq_topk
    parallelism = scan_partitions or (
        corpus.sparkSession.sparkContext.defaultParallelism
    )
    part_key = [F.col(corpus_id)] if scan_partitions else []
    # both UDFs are projected BELOW the explode: with the generator in
    # the same select, Catalyst extracts it above the Python node and
    # pq_encode would re-run once per exploded row (n_assign x per
    # vector) in a SECOND Arrow pass; projecting cells+code first fuses
    # them into ONE ArrowEvalPython pass, one evaluation per vector
    codes_df = (
        corpus.repartition(parallelism, *part_key)
        .select(
            F.col(corpus_id).alias("neighbor_id"),
            best_cells(F.col(vec_col), centroids, n_assign).alias("cells"),
            pq_encode(F.col(vec_col), codebooks).alias("code"),
        )
        .withColumn("cell", F.explode("cells"))
        .drop("cells")
        .filter(F.col("cell").isin(union_cells))
    )
    cand = _adc_candidates(
        codes_df, qid_arr, qmat, codebooks, refine * k, probed=probed,
        strict_exact=strict_exact,
    )
    return _exact_refine(queries, corpus, query_id, corpus_id, vec_col, cand, k)


def _probe_order(qmat, centroids, n_probe: int):
    """Per-query probed-cell ids, (|Q|, n_probe): cosine affinity to the
    centroid matrix, stable argsort — the single definition shared by
    ``ivfpq_topk`` and its exact-equivalence twin so both sides of the
    gate probe identical cells by construction."""
    import numpy as np

    cents = np.asarray(centroids, dtype=np.float64)
    sims = (qmat @ cents.T) / (
        np.linalg.norm(qmat, axis=1, keepdims=True)
        * np.linalg.norm(cents, axis=1)
    )
    return np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]


def ivfpq_exact_twin(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 8,
    nbits: int = 4,
    refine: int = 8,
    seed: int = 7,
    max_queries: int = 1024,
    n_assign: int = 1,
    scan_partitions: int | None = None,
) -> DataFrame:
    """Deterministic exact-equivalence gate for :func:`ivfpq_topk`: one
    ``agree`` boolean per query asserting the IVF-PQ result equals an
    INDEPENDENTLY-built exact brute-force top-k restricted to the same
    probed cells (query vectors joined to every corpus vector whose
    ``best_cells`` assignment intersects the query's probe set, exact
    cosine, window top-k — no ADC, no mapInPandas, no shared refine
    path).

    This is a stronger check than the recall gate: it pins rank order
    and similarity values, not just set overlap, and it holds EXACTLY —
    not statistically — whenever the ADC candidate keep covers the
    probed cells (EVERY scan partition <= refine*k rows; the actual-side
    call runs ``strict_exact`` so a skewed partition past the bound
    fails loudly instead of flaking the gate — review r6). Register
    alongside ``ann_ivfpq_recall``, which gates the approximate regime.
    """
    import numpy as np

    from beavers_spark.functions.vectorized import best_cells, train_quantizer

    actual = ivfpq_topk(
        queries, corpus, query_id, corpus_id, vec_col,
        k=k, n_cells=n_cells, n_probe=n_probe, m=m, nbits=nbits,
        refine=refine, seed=seed, max_queries=max_queries,
        n_assign=n_assign, scan_partitions=scan_partitions,
        strict_exact=True,
    )
    got = _collect_queries(queries, query_id, vec_col, max_queries, "ivfpq_exact_twin")
    if got is None:
        return queries.sparkSession.createDataFrame(
            [], "query_id long, agree boolean"
        )
    qid_arr, qmat = got
    centroids = train_quantizer(corpus, vec_col, n_cells, seed=seed)
    order = _probe_order(qmat, centroids, n_probe)
    spark = corpus.sparkSession
    probe_df = spark.createDataFrame(
        [
            (int(qid_arr[qi]), int(c))
            for qi in range(len(qid_arr))
            for c in order[qi]
        ],
        "query_id long, cell int",
    )
    cells_df = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.explode(best_cells(F.col(vec_col), centroids, n_assign)).alias(
            "cell"
        ),
    )
    qv = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # probe_df and qv are |Q|-sized: broadcast both, so the only scan is
    # the corpus assignment pass and the one shuffle is the top-k window
    pairs = (
        cells_df.join(F.broadcast(probe_df), "cell")
        .join(F.broadcast(qv), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
        .distinct()
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    expected = pairs.withColumn("rnk", w).filter(F.col("rnk") <= k)
    return _topk_agreement(actual, expected)


def _topk_agreement(actual: DataFrame, expected: DataFrame) -> DataFrame:
    """Per-query exact-agreement table for two (query_id, neighbor_id,
    sim, rnk) top-k frames: ``agree`` is true iff the query's rows match
    on ALL FOUR columns — rank order and similarity values included."""
    a = actual.select("query_id", "neighbor_id", "sim", "rnk").withColumn(
        "__a", F.lit(1)
    )
    b = expected.select("query_id", "neighbor_id", "sim", "rnk").withColumn(
        "__b", F.lit(1)
    )
    joined = a.join(b, ["query_id", "neighbor_id", "sim", "rnk"], "full_outer")
    return joined.groupBy("query_id").agg(
        F.every(
            F.col("__a").isNotNull() & F.col("__b").isNotNull()
        ).alias("agree")
    )


def ivf_exact_twin(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    train_fraction: float = 1.0,
    n_assign: int = 1,
) -> DataFrame:
    """Deterministic exact-equivalence gate for :func:`ivf_topk`: one
    ``agree`` boolean per query asserting the IVF result equals an
    independently-built exact top-k over the same candidate universe —
    every corpus vector whose ``n_assign`` cell assignment intersects
    the query's ``n_probe`` probe set, scored by a single
    ``arrays_overlap`` broadcast pass (no equi-join machinery, no
    dedup step shared with the operator under test).

    Unlike the PQ twins this holds EXACTLY at any scale: ivf_topk's
    rerank is already exact cosine over all candidates (nothing is
    pruned between candidate generation and ranking).
    """
    from beavers_spark.functions.vectorized import best_cells, train_quantizer

    actual = ivf_topk(
        queries, corpus, query_id, corpus_id, vec_col,
        k=k, n_cells=n_cells, n_probe=n_probe, seed=seed,
        train_fraction=train_fraction, n_assign=n_assign,
    )
    train = corpus if train_fraction >= 1.0 else corpus.sample(
        fraction=train_fraction, seed=seed
    )
    centroids = train_quantizer(train, vec_col, n_cells, seed=seed)
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).alias("qv"),
        best_cells(F.col(vec_col), centroids, n_probe).alias("probes"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        best_cells(F.col(vec_col), centroids, n_assign).alias("cells"),
    )
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(
            F.arrays_overlap(F.col("probes"), F.col("cells"))
            & (F.col("query_id") != F.col("neighbor_id"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    expected = pairs.withColumn("rnk", w).filter(F.col("rnk") <= k)
    return _topk_agreement(actual, expected)


def lsh_exact_twin(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    multi_probe: bool = True,
    n_tables: int = 1,
    seed: int = 7,
) -> DataFrame:
    """Deterministic exact-equivalence gate for
    :func:`lsh_bucketed_topk`: the candidate universe — pairs sharing a
    (table, bucket) key under the query's multi-probe set — is rebuilt
    as per-row combined-key ARRAYS compared with one ``arrays_overlap``
    broadcast pass (no posexplode, no equi-join, no dedup shared with
    the operator under test), then exact-cosine top-k'd and compared
    row-for-row. Exact at any scale: the operator's rerank is already
    exact cosine over all bucket-mates.
    """
    from beavers_spark.functions.vectorized import lsh_bucket_ids

    actual = lsh_bucketed_topk(
        queries, corpus, query_id, corpus_id, vec_col,
        k=k, dim=dim, n_planes=n_planes, multi_probe=multi_probe,
        n_tables=n_tables, seed=seed,
    )
    tables = [
        _hyperplanes(dim, n_planes, seed=seed + 1000 * t)
        for t in range(n_tables)
    ]
    width = F.lit(1 << n_planes)
    offsets = (
        F.array(F.lit(0), *[F.lit(1 << i) for i in range(n_planes)])
        if multi_probe
        else F.array(F.lit(0))
    )
    # combined (table, bucket) keys as one flat array per row
    qkeys = F.flatten(
        F.transform(
            lsh_bucket_ids(F.col("qv"), tables),
            lambda b0, tbl: F.transform(
                offsets, lambda m: tbl * width + b0.bitwiseXOR(m)
            ),
        )
    )
    ckeys = F.transform(
        lsh_bucket_ids(F.col("cv"), tables),
        lambda b, tbl: tbl * width + b,
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qkeys", qkeys)
    c = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("ckeys", ckeys)
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(
            F.arrays_overlap(F.col("qkeys"), F.col("ckeys"))
            & (F.col("query_id") != F.col("neighbor_id"))
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_sim(F.col("qv"), F.col("cv")), 6).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    expected = pairs.withColumn("rnk", w).filter(F.col("rnk") <= k)
    return _topk_agreement(actual, expected)


def _collect_queries(
    queries: DataFrame,
    query_id: str,
    vec_col: str,
    max_queries: int,
    caller: str,
):
    """Bounded driver-side collect of the query set (an operand of the
    search, small by contract). Returns ``(qid_arr, qmat)`` or ``None``
    for an empty set; raises past the cap."""
    import numpy as np

    q_rows = (
        queries.select(
            F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
        )
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"{caller} query set exceeds max_queries={max_queries}; "
            "use lsh_bucketed_topk/ivf_topk for corpus-scale query sets"
        )
    if not q_rows:
        return None
    qid_arr = np.asarray([r["query_id"] for r in q_rows], dtype=np.int64)
    qmat = np.asarray([r["qv"] for r in q_rows], dtype=np.float64)
    return qid_arr, qmat


def _adc_candidates(
    codes_df: DataFrame,
    qid_arr,
    qmat,
    codebooks: list[list[list[float]]],
    r_keep: int,
    probed=None,
    strict_exact: bool = False,
) -> DataFrame:
    """Candidate pairs ``(query_id, neighbor_id)`` from one ADC scan of
    the encoded corpus: per Arrow batch one LUT gather scores ALL
    queries, each partition emits only its local top ``r_keep`` per
    query — rows leaving the scan are O(partitions · |Q| · r_keep),
    never O(corpus). With ``probed`` (a |Q| × n_cells bool mask,
    ``codes_df`` carrying a ``cell`` column), each query scores only the
    rows in cells it probed.

    ``strict_exact`` asserts the exactness precondition AT THE DATA: a
    result is provably exact only when no partition ever applies the
    top-``r_keep`` keep, and hash partitioning is even only on average
    — a skewed partition exceeding ``r_keep`` candidate rows for some
    query silently drops potential true top-k members. Under
    ``strict_exact`` that partition raises with an actionable message
    (raise ``scan_partitions``/``refine``) instead of returning a
    nondeterministically-approximate result; plans registered against
    an exact brute-force oracle set it (review r6).
    """
    import numpy as np
    import pandas as pd

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    n_codes = max(b.shape[0] for b in books)
    # luts[qi, j, c] = q_sub_j . cb_j[c]; nlut[j, c] = |cb_j[c]|^2
    luts = np.zeros((len(qid_arr), m, n_codes))
    nlut = np.zeros((m, n_codes))
    for j, cb in enumerate(books):
        luts[:, j, : cb.shape[0]] = qmat[:, j * sub : (j + 1) * sub] @ cb.T
        nlut[j, : cb.shape[0]] = (cb * cb).sum(1)
    qn = np.linalg.norm(qmat, axis=1)
    jj = np.arange(m)

    def _reduce_topr(frames: list[pd.DataFrame]) -> pd.DataFrame:
        allf = pd.concat(frames, ignore_index=True)
        allf = allf.sort_values(
            ["query_id", "approx_sim", "neighbor_id"],
            ascending=[True, False, True],
        )
        return allf.groupby("query_id", sort=False).head(r_keep)

    def _partition_topr(it):
        best: list[pd.DataFrame] = []
        for pdf in it:
            if pdf.empty:
                continue
            codes = np.vstack(pdf["code"].to_numpy()).astype(np.int64)  # (n, m)
            ids = pdf["neighbor_id"].to_numpy()
            cells = (
                pdf["cell"].to_numpy() if probed is not None else None
            )
            dots = luts[:, jj[None, :], codes].sum(2)  # (Q, n)
            recon = np.sqrt(np.maximum(nlut[jj[None, :], codes].sum(1), 1e-30))
            sims = dots / (qn[:, None] * recon[None, :])  # (Q, n)
            # accumulate raw arrays; ONE DataFrame per Arrow batch (a
            # per-query frame + concat measurably dominates at small
            # batch sizes)
            q_out, id_out, s_out = [], [], []
            for qi in range(len(qid_arr)):
                s = sims[qi]
                loc_ids = ids
                if cells is not None:
                    mask = probed[qi, cells]
                    if not mask.any():
                        continue
                    s = s[mask]
                    loc_ids = ids[mask]
                if len(loc_ids) > r_keep:
                    if strict_exact:
                        raise ValueError(
                            "strict_exact: a scan partition holds "
                            f"{len(loc_ids)} candidate rows for one "
                            f"query, over the no-prune bound r_keep="
                            f"{r_keep}; the ADC top-r keep would make "
                            "the result approximate. Raise "
                            "scan_partitions or refine (or drop "
                            "strict_exact for recall-gated use)."
                        )
                    part = np.argpartition(-s, r_keep)[:r_keep]
                else:
                    part = np.arange(len(loc_ids))
                q_out.append(np.full(len(part), qid_arr[qi], dtype=np.int64))
                id_out.append(loc_ids[part])
                s_out.append(s[part])
            if q_out:
                best.append(
                    pd.DataFrame(
                        {
                            "query_id": np.concatenate(q_out),
                            "neighbor_id": np.concatenate(id_out),
                            "approx_sim": np.concatenate(s_out),
                        }
                    )
                )
            # per-partition reduction: keep only the running top-r per
            # query so the worker holds O(|Q|·r), not the partition
            if len(best) >= 8:
                best = [_reduce_topr(best)]
        if best:
            yield _reduce_topr(best)

    return (
        codes_df.mapInPandas(
            _partition_topr,
            "query_id long, neighbor_id long, approx_sim double",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )


def _exact_refine(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str,
    cand: DataFrame,
    k: int,
) -> DataFrame:
    """Exact-cosine rerank of a small candidate pair set: candidates are
    O(partitions · |Q| · r), broadcast into the corpus scan so the
    vector fetch prunes to candidate ids only; top-``k`` per query by
    (rounded sim, id)."""
    q_df = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("qn", _norm(F.col("qv")))
    c_df = corpus.select(
        F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).withColumn("cn", _norm(F.col("cv")))
    scored = (
        c_df.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q_df), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _cos(_dot(F.col("qv"), F.col("cv")),
                     F.col("qn"), F.col("cn")), 6
            ).alias("sim"),
        )
    )
    w = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("sim").desc(), F.col("neighbor_id").asc()
        )
    )
    return scored.withColumn("rnk", w).filter(F.col("rnk") <= k)
