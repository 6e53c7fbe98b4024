"""Corpus-curation operators for training-data pipelines: benchmark
decontamination, per-domain caps, deterministic global shuffle,
within-document repetition scoring, stratified sampling, and sequence
packing.

All deterministic and engine-reproducible (hashing is the md5-derived
family of ``functions.dedup``/``functions.sampling``, identical in
DuckDB, so every operator here is oracle-checkable), and all expressed
as shuffles keyed on bounded-cardinality columns — nothing global, no
``rand()``, no driver-side state.

Reference: the reference has no curation surface (README.md:43-50);
this is part of the beyond-reference training-data tier alongside
``functions.dedup`` and ``functions.sampling``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from beavers_spark.functions.dedup import md5_hash64, word_shingles
from beavers_spark.functions.text import tokens
from beavers_spark.functions.sampling import BUCKETS, hash_bucket


def decontaminate(
    train: DataFrame,
    evals: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per training doc, how many distinct word
    ``n``-grams it shares with the eval corpus.

    Returns ``(doc_id, n_overlap)`` for CONTAMINATED docs only (n_overlap
    >= 1); anti-join the result against the corpus to drop them. The
    standard pre-training hygiene step — eval questions that leak into
    training data inflate benchmark scores.

    Scale shape: both sides explode to distinct (doc, ngram) rows; the
    eval side collapses to DISTINCT ngrams (a small set — eval suites are
    tiny next to a corpus) and the contamination check is an equi-join on
    the ngram string — an inverted-index probe, never a scan of train ×
    eval. The join key is content-hashed by the shuffle; hot ngrams are
    impossible because the eval side is distinct.
    """
    grams = word_shingles(F.col(text_col), n)
    t = train.select(
        F.col(id_col).alias("doc_id"), F.explode(grams).alias("ngram")
    )
    e = evals.select(F.explode(grams).alias("ngram")).distinct()
    return (
        t.join(e, "ngram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )


def domain_cap(
    df: DataFrame, domain_col: str, id_col: str, cap: int, salt: str = ""
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, chosen deterministically by
    id-hash order (ties by id) — the mixture-balancing step that stops a
    single crawl domain from dominating the corpus.

    Hash order (not arrival order) makes the survivor set reproducible on
    any engine/partitioning and stable-ish under growth: a new doc evicts
    at most one old one, it never reshuffles the whole domain. One
    shuffle keyed on the domain; a domain whose row count explodes is the
    classic skew key, which is exactly what AQE skew-join/window splitting
    handles (session.py enables it) — and the window itself never
    materializes more than ``cap`` survivors per domain downstream.
    """
    rank = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            md5_hash64(F.concat(F.col(id_col).cast("string"), F.lit(salt))),
            F.col(id_col),
        )
    )
    return (
        df.withColumn("__r", rank).filter(F.col("__r") <= cap).drop("__r")
    )


def corpus_shuffle_key(id_col: Column, seed: str = "shuffle") -> Column:
    """Deterministic global-shuffle sort key for training-order
    randomization: the md5-derived hash of (id, seed).

    The SHUFFLED ORDER of the corpus is "sort by this key" — realized at
    scale as ``repartitionByRange(key).sortWithinPartitions(key)`` (range
    exchange + local sort, never a single-partition global sort), which is
    how :func:`corpus_shuffle` writes shuffled epochs. A different seed is
    a fresh epoch permutation.
    """
    return md5_hash64(F.concat(id_col.cast("string"), F.lit("@"), F.lit(seed)))


def corpus_shuffle(
    df: DataFrame, id_col: str, seed: str = "shuffle", n_partitions: int | None = None
) -> DataFrame:
    """The corpus in deterministic shuffled training order: range-
    partitioned and locally sorted by :func:`corpus_shuffle_key`.

    Writing this frame to parquet yields files whose concatenation is the
    shuffled epoch — no global sort bottleneck (the range exchange samples
    key quantiles, then each partition sorts locally).
    """
    key = corpus_shuffle_key(F.col(id_col), seed)
    out = df.withColumn("shuffle_key", key)
    parts = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return out.repartitionByRange(parts, "shuffle_key").sortWithinPartitions(
        "shuffle_key"
    )


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Within-document repetition: ``1 - distinct_ngrams / total_ngrams``
    of the word ``n``-grams (0 = no repetition, → 1 = the same phrase
    looping). The standard quality signal for filtering boilerplate and
    generation loops. Pure projection — no explode, no shuffle.
    """
    toks = tokens(text)
    grams = F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    total = F.size(grams)
    return F.when(
        total > 0,
        F.round(
            1.0 - F.size(F.array_distinct(grams)) / total.cast("double"), 6
        ),
    ).otherwise(F.lit(0.0))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its id-hash
    bucket falls under its stratum's rate — the mixture-reweighting step
    (e.g. downsample boilerplate-heavy domains, keep all rare-language
    docs). Same reproducibility/growth-stability as
    ``sampling.deterministic_sample``; still a scan-level filter, no
    shuffle, no per-stratum pass.
    """
    thresh = None
    for name, rate in rates.items():
        cond = F.col(strata_col) == name
        bound = F.lit(int(round(rate * BUCKETS)))
        thresh = F.when(cond, bound) if thresh is None else thresh.when(cond, bound)
    thresh = (
        F.lit(int(round(default_rate * BUCKETS)))
        if thresh is None
        else thresh.otherwise(int(round(default_rate * BUCKETS)))
    )
    return df.filter(hash_bucket(F.col(id_col), salt) < thresh)


def word_chunks(text: Column, k: int = 10) -> Column:
    """Fixed-``k``-word segments of ``text`` (last partial segment kept):
    the segmentation unit for substring-granularity dedup on corpora
    without paragraph structure. Pure projection — the fan-out to
    segments stays inside the scan stage."""
    toks = tokens(text)
    n_chunks = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    # guard: sequence(0, -1) would COUNT DOWN for an empty token list
    return F.when(
        n_chunks > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i * k + 1).cast("int"), F.lit(k))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def sliding_spans(text: Column, k: int) -> Column:
    """All stride-1 ``k``-word spans of ``text`` (the sliding-window
    generalization of :func:`word_chunks`): ``n_tokens - k + 1`` spans
    per document, the candidate unit for substring-level exact dedup.
    Pure projection — the fan-out stays inside the scan stage."""
    toks = tokens(text)
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(
                " ", F.slice(toks, (i + 1).cast("int"), F.lit(k))
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def substring_dedup(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """Cross-document exact substring dedup at token granularity — the
    Spark-shaped form of the suffix-array duplicate-span pass in the
    public "Deduplicating Training Data Makes Language Models Better"
    (Lee et al., 2022): instead of a corpus suffix array, every stride-1
    ``k``-token span is hashed, spans whose content occurs anywhere else
    in the corpus BEFORE them (first occurrence in (doc, pos) order
    wins, all later copies are duplicates — Lee et al.'s keep-one
    policy) are marked, and each document's marked spans are merged into
    maximal token ranges.

    Emits ``(doc_id, span_start, span_end, n_dup_tokens)`` — one row per
    maximal duplicated token range ``[span_start, span_end)``; a
    downstream pass can cut exactly those ranges out of the text. Any
    duplicated substring of >= k tokens is covered in full (its stride-1
    k-spans all collide and merge); shorter duplicates are below the
    match threshold, mirroring the suffix-array pass's minimum match
    length.

    Scale shape: spans fan out inside the scan stage and leave it as
    (doc_id, idx, 60-bit hash) — the corpus-wide ownership groupBy and
    the join back shuffle ~16 bytes per token of corpus, never span
    text. Hot spans (boilerplate repeated millions of times) are single
    aggregation keys that reduce map-side. The interval merge is one
    doc-keyed window pass (gaps-and-islands: a span opens a new island
    iff it starts past the running max end), so the whole operator is
    two shuffles — hash-keyed then doc-keyed — with no driver state.
    """
    # repartition BEFORE the fan-out: a single parquet file scans as one
    # partition, which would serialize the (CPU-heavy) span construction
    # + hashing; at scale the scan is already multi-split and this is a
    # cheap doc-level round-robin
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    spans = df.repartition(parallelism).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(sliding_spans(F.col(text_col), k)).alias("idx", "span"),
    ).withColumn("h", md5_hash64(F.col("span"))).drop("span")
    # materialize the hashed spans ONCE: the ownership groupBy and the
    # join probe are separate exchanges whose subtrees Catalyst cannot
    # reuse, so without this the corpus is re-scanned and re-hashed per
    # consumer (verified: 2x Generate posexplode in the executed plan).
    # The checkpointed frame is (doc_id, idx, h) — ~20 bytes/token,
    # smaller than re-reading + re-hashing the text, and it spills
    spans = spans.localCheckpoint()
    occ = F.struct(F.col("doc_id"), F.col("idx"))
    owners = (
        spans.groupBy("h")
        .agg(F.min(occ).alias("owner"), F.count("*").alias("cnt"))
        # cnt > 1 prunes unique spans (the vast majority) before the
        # join back, so the non-owner filter touches only real collisions
        .filter(F.col("cnt") > 1)
        .withColumnRenamed("h", "oh")
    )
    dups = (
        spans.join(owners, F.col("h") == F.col("oh"))
        .filter(occ != F.col("owner"))
        .select(
            "doc_id",
            F.col("idx").cast("bigint").alias("s0"),
            (F.col("idx") + k).cast("bigint").alias("e0"),
        )
    )
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s0")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("s0")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = dups.withColumn(
        "brk",
        F.when(
            F.col("s0") <= F.coalesce(F.max("e0").over(w_prev), F.lit(-1)),
            F.lit(0),
        ).otherwise(F.lit(1)),
    )
    return (
        flagged.withColumn("g", F.sum("brk").over(w_run))
        .groupBy("doc_id", "g")
        .agg(
            F.min("s0").alias("span_start"),
            F.max("e0").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("n_dup_tokens"),
        )
    )


def substring_dedup_apply(
    df: DataFrame, text_col: str, id_col: str, k: int = 8
) -> DataFrame:
    """Apply :func:`substring_dedup`'s ranges: emit each document with
    its duplicated token ranges cut out (Lee et al.'s actual training
    corpus edit, where :func:`substring_dedup` is the detection pass).

    Emits ``(doc_id, clean_text, n_tokens, n_dup_tokens)`` for EVERY
    input document — ``clean_text`` is the whitespace-normalized,
    lowercased reconstruction from surviving tokens ('' when the whole
    doc was duplicate material), ``n_tokens`` the original token count.

    Scale shape: the detection pass's two shuffles, plus one doc-keyed
    collect_list of [start, end) ranges (bounded: ranges per doc <=
    tokens/k after merging) and a broadcast-eligible equi-join back to
    the corpus; the token cut itself is a JVM higher-order filter over
    (token, index) — no Python, no extra shuffle.
    """
    ranges = (
        substring_dedup(df, text_col, id_col, k)
        .groupBy("doc_id")
        .agg(
            F.collect_list(F.struct("span_start", "span_end")).alias("rng"),
            F.sum("n_dup_tokens").alias("n_dup_tokens"),
        )
    )
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("tk"))
    rng = F.coalesce(
        F.col("rng"),
        F.array().cast("array<struct<span_start:bigint,span_end:bigint>>"),
    )
    kept = F.filter(
        F.col("tk"),
        lambda tok, i: ~F.exists(
            rng,
            lambda r: (i >= r["span_start"]) & (i < r["span_end"]),
        ),
    )
    return base.join(ranges, "doc_id", "left").select(
        "doc_id",
        F.concat_ws(" ", kept).alias("clean_text"),
        F.size("tk").cast("bigint").alias("n_tokens"),
        F.coalesce(F.col("n_dup_tokens"), F.lit(0)).alias("n_dup_tokens"),
    )


def chunk_dedup(
    df: DataFrame, text_col: str, id_col: str, k: int = 10
) -> DataFrame:
    """Substring-granularity exact dedup (the Lee et al. "Deduplicating
    Training Data Makes Language Models Better" step, at chunk rather
    than suffix-array granularity): every ``k``-word segment of the
    corpus is kept exactly once — at its first occurrence in (doc, pos)
    order — and each document is reassembled from its surviving
    segments.

    Emits ``(doc_id, clean_text, n_kept, n_chunks)`` for docs with at
    least one surviving segment; a doc whose every segment already
    appeared elsewhere disappears entirely (it contributes no novel
    text).

    Scale shape: segments explode inside the scan stage; ownership is
    one groupBy on the segment's 60-bit content hash (never the segment
    string — the shuffle moves 16 bytes per occurrence, not the text),
    an equi-join back on that hash, and one doc-keyed shuffle to
    reassemble. No windows, no driver state; hot segments (boilerplate
    repeated millions of times) are single aggregation keys whose
    groups reduce map-side.
    """
    # lexicographic struct min picks the first occurrence in (doc, pos)
    # order with no range limit on either component (negative or huge
    # doc ids / chunk indexes are all fine — no packing arithmetic)
    # repartition before the fan-out (same rationale as substring_dedup:
    # a single-file scan would serialize segment construction + hashing)
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    segs = df.repartition(parallelism).select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(word_chunks(F.col(text_col), k)).alias("idx", "chunk"),
    ).withColumn("h", md5_hash64(F.col("chunk")))
    # materialize once: the kept aggregation AND totals each re-ran
    # the segment explode+hash otherwise (2x Generate in the plan)
    segs = segs.localCheckpoint()
    # ONE partial-combined min aggregation yields the kept owner ROW
    # directly: (doc_id, idx) is unique within a hash group and leads
    # the struct, so the lexicographic min picks exactly the row the
    # old owners-join-back selected — same rows, one exchange of segs
    # instead of an aggregate plus a join (r13)
    kept = (
        segs.groupBy("h")
        .agg(F.min(F.struct("doc_id", "idx", "chunk")).alias("o"))
        .select("h", "o.doc_id", "o.idx", "o.chunk")
    )
    totals = segs.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
        )
        .join(totals, "doc_id")
        .select("doc_id", "clean_text", "n_kept", "n_chunks")
    )


def token_budget_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    length_col: str,
    weights: dict[str, float],
    budget: int,
    default_weight: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Sample the corpus down to a token ``budget`` split across sources
    by ``weights``: source ``s`` keeps rate ``min(1, budget*w_s /
    tokens_s)`` of its documents, selected by the deterministic id-hash
    buckets of ``sampling.deterministic_sample`` — the mixture step that
    turns "2T tokens, 30% web / 30% code / 40% books" into a concrete
    reproducible document set.

    Scale shape: per-source token totals are one partially-aggregated
    groupBy collapsing to rows = |sources| (a dimension, not data);
    they join back as a broadcast and the keep decision is a scan-level
    filter. No corpus-keyed shuffle at all.
    """
    totals = df.groupBy(source_col).agg(
        F.sum(length_col).alias("__tot")
    )
    w = None
    for name, weight in weights.items():
        cond = F.col(source_col) == name
        w = F.when(cond, weight) if w is None else w.when(cond, weight)
    w = (
        F.lit(default_weight)
        if w is None
        else w.otherwise(F.lit(default_weight))
    )
    # zero-total guard: a source whose rows all have length 0 would be
    # a DIVIDE_BY_ZERO under Spark 4's default ANSI mode; rate 1.0
    # (keep everything) matches the oracle's least(1.0, inf) behavior
    rates = totals.withColumn(
        "__rate",
        F.when(
            F.col("__tot") > 0,
            F.least(F.lit(1.0), F.lit(budget) * w / F.col("__tot")),
        ).otherwise(F.lit(1.0)),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(
            hash_bucket(F.col(id_col), salt)
            < F.floor(F.col("__rate") * BUCKETS)
        )
        .drop("__tot", "__rate")
    )


def temperature_mix(
    df: DataFrame,
    source_col: str,
    id_col: str,
    length_col: str,
    alpha: float,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Temperature-scaled mixture sampling (the multilingual/LLaMA
    ``p^α`` scheme): source shares ``p_s = T_s / T`` are flattened to
    ``q_s ∝ p_s^α`` (α < 1 upsamples the tail), then each source keeps
    rate ``min(1, budget·q_s / T_s)`` by the deterministic id-hash
    buckets — ``token_budget_mix`` with weights derived from the data
    instead of hand-picked.

    Same scale shape as token_budget_mix: totals collapse to
    |sources| rows, two 1-row scalar broadcasts (corpus total, weight
    normalizer), keep decision is a scan-level filter — zero
    corpus-keyed shuffle.

    Engine-exactness: α = 0.5 / 0.25 run as IEEE-correctly-rounded
    ``sqrt`` chains (bit-identical in any engine); other α fall back to
    ``pow`` (libm 1-ulp class). The scaled weights round to 9 dp BEFORE
    the Decimal-exact normalizer sum, so rates never depend on
    aggregation order. The per-source rate table is computed on the
    DRIVER from the collected totals (|sources| rows — a dimension, not
    data) with the exact same double ops the SQL twin performs, and
    re-enters as a literal broadcast — no scalar cross joins anywhere.
    """
    import math
    from decimal import Decimal

    from beavers_spark.functions.pca import _round_half_up

    if alpha == 0.5:
        def _pw(x):  # noqa: E306
            return math.sqrt(x)
    elif alpha == 0.25:
        def _pw(x):  # noqa: E306
            return math.sqrt(math.sqrt(x))
    else:
        def _pw(x):  # noqa: E306
            return math.pow(x, alpha)

    totals = {
        r[source_col]: r["__tot"]
        for r in df.groupBy(source_col)
        .agg(F.sum(length_col).alias("__tot"))
        .collect()
    }
    if not totals:
        return df.limit(0)
    t_all = sum(v or 0 for v in totals.values())
    q = {
        s: _round_half_up(_pw((v or 0) / t_all), 9) if t_all > 0 else 0.0
        for s, v in totals.items()
    }
    q_norm = float(sum((Decimal(repr(x)) for x in q.values()), Decimal(0)))
    rates = [
        (
            s,
            min(1.0, budget * (q[s] / q_norm) / totals[s])
            if (totals[s] or 0) > 0 and q_norm > 0
            else 1.0,
        )
        for s in totals
    ]
    spark = df.sparkSession
    from pyspark.sql.types import DoubleType, StructField, StructType

    # the rate table inherits the source column's ACTUAL type (int
    # domain codes are as legal as strings)
    rate_df = spark.createDataFrame(
        rates,
        StructType([
            StructField("__src", df.schema[source_col].dataType, True),
            StructField("__rate", DoubleType(), False),
        ]),
    )
    # null-safe equality: a NULL source group got its own rate entry
    # above, and <=> keeps those rows (a plain equi-join would silently
    # drop every NULL-source document)
    return (
        df.join(
            F.broadcast(rate_df),
            F.col(source_col).eqNullSafe(F.col("__src")),
        )
        .filter(
            hash_bucket(F.col(id_col), salt)
            < F.floor(F.col("__rate") * BUCKETS)
        )
        .drop("__src", "__rate")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    length_col: str,
    capacity: int,
    n_streams: int = 16,
    seed: str = "pack",
) -> DataFrame:
    """Assign documents to fixed-capacity training sequences (context
    windows) by concat-and-chunk packing: docs are concatenated in
    deterministic hash order within ``n_streams`` independent streams,
    and the resulting token stream is sliced at ``capacity`` boundaries —
    the standard GPT-style packed-dataset layout (a doc whose span
    crosses a boundary continues in the next pack; downstream tokenizers
    split it there).

    Emits ``(doc_id, stream, pack_id, offset)`` — ``pack_id`` is the
    chunk in which the doc STARTS and ``offset`` its start position
    inside that chunk.

    Why not bin-closing FIFO/best-fit: closing a bin early depends on the
    running assignment (a sequentially-dependent recurrence, not a window
    aggregate), so it can't shuffle-parallelize; concat-and-chunk wastes
    zero capacity instead of closing bins, and is what large pretraining
    pipelines actually run. Sharding into ``n_streams`` keys every window
    on the stream id, so per-stream data volume — not the corpus — bounds
    each sort partition. Deterministic: stream and order both derive
    from the id hash.
    """
    key = md5_hash64(F.concat(F.col(id_col).cast("string"), F.lit("@"), F.lit(seed)))
    w = Window.partitionBy("stream").orderBy("key", id_col)
    staged = df.select(
        F.col(id_col),
        F.col(length_col).alias("__len"),
        F.pmod(key, F.lit(n_streams)).alias("stream"),
        key.alias("key"),
    )
    # FIFO chunking: pack boundary whenever the cumulative length crosses
    # a capacity multiple. pack_id = floor((cumsum - len) / capacity) puts
    # a doc in the pack where it STARTS; an oversized doc occupies its
    # own pack span.
    cum = F.sum("__len").over(w.rowsBetween(Window.unboundedPreceding, 0))
    packed = staged.withColumn(
        "pack_id",
        F.floor((cum - F.col("__len")) / F.lit(capacity)).cast("bigint"),
    ).withColumn(
        "offset",
        ((cum - F.col("__len")) % F.lit(capacity)).cast("bigint"),
    )
    return packed.select(id_col, "stream", "pack_id", "offset")


def chunk_documents(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_size: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    the standard unit-of-work prep for context-bounded training and
    retrieval indexing. Emits ``(id_col, chunk_id, n_tokens,
    chunk_text)``: window ``i`` starts at ``i*step`` with ``step =
    chunk_size - overlap``; the final window may be short; zero-token
    documents emit no chunks. A window is emitted only while it adds
    NEW tokens (start 0, or start <= n-1-overlap): a tail start whose
    entire window is already covered by the previous chunk would be a
    pure duplicate — exactly what chunking for training must not
    inflate the corpus with. ``chunk_text`` is the window re-joined on
    single spaces (token boundaries, not original whitespace — the same
    normalization every token-level operator here applies).

    Scale shape: one round-robin exchange to spread the scan (a
    single-file corpus would otherwise be a single-task stage — the
    dsir lesson), then map-side only: tokenize, one
    ``sequence``+``explode`` fan-out of ~n/step rows per doc, a 1-based
    ``slice`` per row. No aggregation shuffle, no state, no driver
    traffic; Catalyst pushes any chunk_id or doc filter into the scan.

    Reference: no chunking surface in the reference (README.md:43-50) —
    beyond-reference training-data tier.
    """
    if overlap < 0 or overlap >= chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    step = chunk_size - overlap
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    tok = (
        df.repartition(parallelism)
        .select(F.col(id_col), tokens(F.col(text_col)).alias("tk"))
        .withColumn("n", F.size("tk"))
        .filter(F.col("n") > 0)
    )
    starts = tok.select(
        id_col,
        "tk",
        "n",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("n") - 1 - overlap, F.lit(0)),
                F.lit(step),
            )
        ).alias("s"),
    )
    return starts.select(
        id_col,
        (F.col("s") / step).cast("bigint").alias("chunk_id"),
        F.least(F.lit(chunk_size), F.col("n") - F.col("s"))
        .cast("bigint")
        .alias("n_tokens"),
        F.array_join(
            F.slice("tk", F.col("s") + 1, chunk_size), " "
        ).alias("chunk_text"),
    )
