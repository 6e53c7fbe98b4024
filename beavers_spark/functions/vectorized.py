"""Arrow-vectorized kernels for the similarity family.

Hyperplane-LSH bucketing and IVF cell assignment are both a dense
``(n × dim) @ (dim × m)`` matmul followed by a tiny reduction. Expressed
as Catalyst higher-order functions they become literal expression trees
with ``dim × m`` leaf literals — 3,072 for the registered 16-table LSH
configuration — and building that tree costs several SECONDS of
driver-side py4j round-trips per query call, repaid on every invocation
(measured: 8s plan build vs 1.6s execution for ``ann_lsh_topk`` at
sf0.1). The literals also blow past Catalyst's codegen thresholds, so
the "JVM-side" path isn't even codegen'd.

A pandas UDF is the right boundary here: O(1) plan size, one numpy
matmul per Arrow batch (SIMD, ~100× the scalar fold's throughput), and
the same semantics — the bucket is the sign pattern of float64 dot
products. numpy accumulates pairwise while Catalyst's ``aggregate`` folds
sequentially, so a vector lying EXACTLY on a hyperplane could land in a
different bucket; that is measure-zero, affects only approximate
operators, and the recall gates (``ann_lsh_recall``, ``ann_ivf_recall``,
``dedup_embedding_recall``) pin the quality floor either way.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def _stack(v: pd.Series) -> np.ndarray:
    """(n, dim) float64 matrix from an Arrow array<float> column batch."""
    return np.vstack(v.to_numpy()).astype(np.float64)


#: quantizer training reads at most this many vectors to the driver —
#: a coarse quantizer only needs the density SHAPE, so a bounded sample
#: is the standard IVF practice (faiss trains in-memory on a sample
#: too); the cap keeps the collect O(sample), never O(corpus)
MAX_TRAIN_ROWS = 16384


def _kmeans(x: np.ndarray, k: int, seed: int) -> np.ndarray:
    """Seeded Lloyd's with k-means++ init over an in-memory sample —
    fully vectorized (the seeding keeps a running nearest-distance and
    only measures against the NEWEST centroid — O(n·k·dim) total — and
    the update scatters per-cluster sums with bincount math instead of a
    Python per-cluster loop). Deterministic for a given seed."""
    rng = np.random.default_rng(seed)
    n, dim = x.shape
    k = min(k, n)
    x_sq = (x * x).sum(1)

    def dist_one(c):  # (n,) squared L2 to a single centroid
        return np.maximum(x_sq - 2.0 * (x @ c) + (c * c).sum(), 0.0)

    first = x[rng.integers(n)]
    picks = [first]
    d2 = dist_one(first)
    for _ in range(1, k):  # k-means++ seeding on the running min
        p = d2 / d2.sum() if d2.sum() > 0 else None
        nxt = x[rng.choice(n, p=p)]
        picks.append(nxt)
        d2 = np.minimum(d2, dist_one(nxt))
    cents = np.vstack(picks)
    prev_lab = None
    for _ in range(20):  # Lloyd's iterations
        # labels need only the affinity -2·x·c + |c|² — the |x|² term
        # shifts every column of a row equally, so skipping it leaves
        # argmin (and tie order) unchanged and saves the (n, k) temps
        # that dominated this fit's runtime
        aff = x @ (-2.0 * cents).T
        aff += (cents * cents).sum(1)[None, :]
        lab = aff.argmin(1)
        if prev_lab is not None and np.array_equal(lab, prev_lab):
            break  # assignment fixed point: the update is a no-op
        prev_lab = lab
        counts = np.bincount(lab, minlength=k)
        # per-dim bincount: C-speed scatter-add (np.add.at is ~1µs per
        # ELEMENT)
        sums = np.stack(
            [
                np.bincount(lab, weights=x[:, d], minlength=k)
                for d in range(dim)
            ],
            axis=1,
        )
        cents = np.where(
            counts[:, None] > 0,
            sums / np.maximum(counts, 1)[:, None],
            cents,
        )
    return cents


def _train_sample(df, vec_col: str, seed: int, max_rows: int) -> np.ndarray:
    """Bounded deterministic sample of ``df[vec_col]`` as a (n, dim)
    float64 matrix.

    Hash-ordered limit = a deterministic pseudo-random sample, not a
    corpus PREFIX: a bare limit() takes the first files' rows, and on
    data clustered by label/ingest-time the centroids would cover one
    region of the space. orderBy+limit compiles to TakeOrderedAndProject
    (per-partition heaps, no global sort shuffle).
    """
    rows = (
        df.select(F.col(vec_col).alias("v"))
        .orderBy(F.xxhash64(F.col("v"), F.lit(seed)))
        .limit(max_rows)
        .collect()
    )
    if not rows:
        raise ValueError("cannot train a quantizer on an empty input")
    return np.asarray([r["v"] for r in rows], dtype=np.float64)


def train_quantizer(
    df,
    vec_col: str,
    n_cells: int,
    seed: int = 7,
    max_rows: int = MAX_TRAIN_ROWS,
    sample: "np.ndarray | None" = None,
) -> list[list[float]]:
    """Coarse k-means centroids from a bounded sample of ``df[vec_col]``.

    Seeded driver-side Lloyd's with k-means++ init: one bounded collect
    plus microseconds of numpy per iteration, where an MLlib fit costs
    ~2s of per-iteration job scheduling for a 16-cell quantizer.
    Deterministic for a given seed, so assignments are reproducible.

    ``sample`` short-circuits the collect: callers that train several
    quantizers over the same corpus (e.g. ``ivfpq_topk``'s coarse
    quantizer + PQ codebooks) run ``_train_sample`` once and feed both
    trainers — identical output (the sample is a pure function of
    (df, vec_col, seed, max_rows)), one fewer full-corpus sample scan.
    """
    if sample is None:
        sample = _train_sample(df, vec_col, seed, max_rows)
    return _kmeans(sample, n_cells, seed).tolist()


def train_pq(
    df,
    vec_col: str,
    m: int = 8,
    nbits: int = 4,
    seed: int = 7,
    max_rows: int = MAX_TRAIN_ROWS,
    sample: "np.ndarray | None" = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks: ``m`` sub-quantizers of ``2^nbits``
    centroids each, trained on the same bounded deterministic sample as
    :func:`train_quantizer` (faiss trains PQ on a sample too). The vector
    dimension must divide evenly into ``m`` subspaces.

    ``sample`` reuses an already-collected sample matrix (see
    :func:`train_quantizer`).

    Returns ``codebooks[sub][code] -> sub-centroid`` (length dim/m).
    """
    x = _train_sample(df, vec_col, seed, max_rows) if sample is None else sample
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible into {m} subspaces")
    sub = dim // m
    return [
        _kmeans(
            np.ascontiguousarray(x[:, j * sub : (j + 1) * sub]),
            1 << nbits,
            seed + j,
        ).tolist()
        for j in range(m)
    ]


def pq_encode(vec: Column, codebooks: list[list[list[float]]]) -> Column:
    """``array<int>`` of ``m`` PQ codes: per subspace, the L2-nearest
    sub-centroid's index (ties to the lower code — stable argmin). One
    numpy pass per Arrow batch; the encoded row is ``m`` small ints
    (codes) instead of ``dim`` floats — the 100 TB rationale: a 1024-dim
    float32 corpus (4 KiB/vector) compresses to ``m`` bytes/vector, so
    the scan feeding ANN scoring shrinks by ~2-3 orders of magnitude.
    """
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    sub = books[0].shape[1]

    def _build():
        @F.pandas_udf("array<int>")
        def _codes(v: pd.Series) -> pd.Series:
            if v.empty:
                return pd.Series([], dtype=object)
            mat = _stack(v)  # (n, dim)
            out = np.empty((len(mat), len(books)), dtype=np.int32)
            for j, cb in enumerate(books):
                blk = mat[:, j * sub : (j + 1) * sub]  # (n, sub)
                d = (
                    (blk * blk).sum(1)[:, None]
                    - 2.0 * (blk @ cb.T)
                    + (cb * cb).sum(1)[None, :]
                )
                out[:, j] = d.argmin(1)  # np.argmin: first (lowest) index wins ties
            return pd.Series(list(out))

        return _codes

    key = ("pq_enc", tuple(_freeze(b) for b in codebooks))
    return _cached_udf(key, _build)(vec)


#: pandas-UDF cache: registering a pandas_udf costs py4j round-trips and
#: a cloudpickle of the closure on EVERY call, yet the closures here are
#: pure functions of their parameters — e.g. the incremental IVF ingest
#: builds the same assignment UDF per micro-batch. Keys are digests (a
#: full 50k x dim centroid matrix as a tuple key would itself be MBs)
#: and the cache is LRU-capped: each entry's closure pins its numpy
#: arrays for process lifetime, so unbounded growth across retrains /
#: different corpora would leak.
_UDF_CACHE: dict = {}
_UDF_CACHE_CAP = 32
_UDF_CACHE_CTX: list = [None]


def _cached_udf(key, builder):
    # invalidate on SparkContext change (mirrors dedup._cached_cols): a
    # cached pandas UDF's materialized _judf wraps handles of a SPECIFIC
    # gateway — after a session restart (bench.py restarts mid-run) the
    # stale UDF spams accumulator-update errors locally and can fail
    # jobs outright on a real cluster
    from pyspark import SparkContext

    # object-identity check (strong ref in the cell) — see
    # dedup._cached_cols for why id()-only comparison is unsafe
    ctx = SparkContext._active_spark_context
    if ctx is not _UDF_CACHE_CTX[0]:
        _UDF_CACHE.clear()
        _UDF_CACHE_CTX[0] = ctx
    if key in _UDF_CACHE:
        _UDF_CACHE[key] = _UDF_CACHE.pop(key)  # refresh LRU position
    else:
        while len(_UDF_CACHE) >= _UDF_CACHE_CAP:
            _UDF_CACHE.pop(next(iter(_UDF_CACHE)))
        _UDF_CACHE[key] = builder()
    return _UDF_CACHE[key]


def _freeze(nested) -> str:
    """Stable content digest of a nested float list, for cache keys:
    md5 over the contiguous float64 bytes + shape — unambiguous (no
    repr-concatenation collisions) and one C-level pass instead of a
    per-element Python loop."""
    import hashlib

    arr = np.ascontiguousarray(nested, dtype=np.float64)
    h = hashlib.md5(str(arr.shape).encode())
    h.update(arr.tobytes())
    return h.hexdigest()


def lsh_bucket_ids(
    vec: Column, tables: list[list[list[float]]]
) -> Column:
    """``array<bigint>`` of hyperplane-LSH bucket ids, one per table.

    Bucket = the sign bits of the vector's dot products with the table's
    ``n_planes`` hyperplanes, packed little-endian (bit i = plane i > 0),
    identical to the per-plane Catalyst fold it replaces.
    """
    planes = np.asarray(
        [p for tbl in tables for p in tbl], dtype=np.float64
    )  # (T*b, dim)
    n_tables, n_planes = len(tables), len(tables[0])
    weights = (1 << np.arange(n_planes)).astype(np.int64)  # (b,)

    def _build():
        @F.pandas_udf("array<long>")
        def _buckets(v: pd.Series) -> pd.Series:
            if v.empty:
                return pd.Series([], dtype=object)
            signs = (_stack(v) @ planes.T) > 0  # (n, T*b)
            ids = signs.reshape(-1, n_tables, n_planes).astype(np.int64) @ weights
            return pd.Series(list(ids))  # (n, T)

        return _buckets

    key = ("lsh", tuple(_freeze(t) for t in tables))
    return _cached_udf(key, _build)(vec)


def best_cells(
    vec: Column, centroids: list[list[float]], n_best: int
) -> Column:
    """``array<int>`` of the ``n_best`` cell ids by descending cosine to
    the centroids, ties broken by lower cell id (stable argsort — the
    same order as ``array_sort`` over (-cosine, cell) structs).
    """
    cents = np.asarray(centroids, dtype=np.float64)  # (m, dim)
    cnorms = np.linalg.norm(cents, axis=1)  # (m,)

    def _build():
        @F.pandas_udf("array<int>")
        def _cells(v: pd.Series) -> pd.Series:
            if v.empty:
                return pd.Series([], dtype=object)
            mat = _stack(v)
            sims = (mat @ cents.T) / (
                np.linalg.norm(mat, axis=1, keepdims=True) * cnorms
            )
            order = np.argsort(-sims, axis=1, kind="stable")[:, :n_best]
            return pd.Series(list(order.astype(np.int32)))

        return _cells

    key = ("cos_cells", _freeze(centroids), n_best)
    return _cached_udf(key, _build)(vec)


def nearest_cells_l2(
    vec: Column, centroids: list[list[float]], n_best: int
) -> Column:
    """``array<int>`` of the ``n_best`` cell ids by ascending squared-L2
    distance to the centroids, ties to the lower cell id. The assignment
    metric of :class:`~beavers_spark.streaming.ann_index.IncrementalIVFIndex`
    — kept separate from the cosine ranking of ``best_cells`` because a
    DURABLE index's partition layout must match the metric its rows were
    written under (||v - c||² = ||v||² - 2·v·c + ||c||²; ||v||² is
    rank-constant, so only the cross term and ||c||² are computed).
    """
    cents = np.asarray(centroids, dtype=np.float64)  # (m, dim)
    c_sq = (cents * cents).sum(axis=1)  # (m,)

    def _build():
        @F.pandas_udf("array<int>")
        def _cells(v: pd.Series) -> pd.Series:
            if v.empty:
                return pd.Series([], dtype=object)
            scores = c_sq - 2.0 * (_stack(v) @ cents.T)  # (n, m), L2² − ||v||²
            order = np.argsort(scores, axis=1, kind="stable")[:, :n_best]
            return pd.Series(list(order.astype(np.int32)))

        return _cells

    key = ("l2_cells", _freeze(centroids), n_best)
    return _cached_udf(key, _build)(vec)
