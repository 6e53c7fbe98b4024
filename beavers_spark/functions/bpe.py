"""BPE tokenizer training (byte-pair-encoding merges) over the corpus —
the "train the tokenizer on your own data" step of an LLM pipeline,
expressed as exactly-replayable fixed-point iterations like k-means,
the GD classifier and the power iteration.

Spark-first shape (the bounded-driver-model contract):

- the corpus collapses ONCE to the distinct-word/frequency VOCAB table
  (one shuffle; bounded by the language, not the corpus — the classic
  word-level BPE factorization: pair statistics over a 100 TB corpus
  are pair statistics over its weighted vocabulary);
- each merge step is one vocabulary-sized pair-count aggregation
  (map-side combinable) plus a 1-ROW argmax collect (the merged pair)
  — only k pairs ever visit the driver;
- applying a merge is a per-word JVM fold — no Python, no shuffle.

Exactness contract (NO floats anywhere): pair counts are integer sums
of integer word frequencies; the winning pair maximizes (count, pair
string ASC) — a total order; the merge application is a deterministic
left-to-right greedy fold (symbols stream through a string accumulator:
when the accumulated word ends with symbol ``a`` and the next symbol is
``b``, they fuse). The SAME fold runs as a DuckDB ``list_reduce``, so a
SQL replay of the k merge steps reproduces merges, vocabulary and token
counts hash-exactly — an ITERATIVE TOKENIZER TRAINER with an exact
oracle.

Symbols are joined by the unit separator (chr 31) — absent from
whitespace-tokenized text by construction.

Reference: no tokenizer surface in the reference (README.md:43-50) —
beyond-reference training-data tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from beavers_spark.functions.text import tokens

#: symbol separator inside the packed word representation
SEP = "\x1f"


def _initial_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """Distinct words with corpus frequency and their initial
    (character-level) symbol string: ``(word, freq, sym)``."""
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    words = (
        docs.repartition(parallelism)
        .select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    # 'abc' -> 'a<US>b<US>c': append SEP to every char, strip the tail
    seeded = F.regexp_replace(F.col("word"), "(.)", "$1" + SEP)
    return words.select(
        "word",
        "freq",
        F.substring(seeded, F.lit(1), F.length(seeded) - 1).alias("sym"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency:
    ``(pair, c)`` with ``pair = a<US>b``."""
    ss = F.split(F.col("sym"), SEP)
    pairs = F.when(
        F.size(ss) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(ss) - 2),
            lambda i: F.concat(
                F.element_at(ss, i + 1), F.lit(SEP), F.element_at(ss, i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        vocab.select("freq", F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.sum("freq").alias("c"))
    )


def _apply_merge(sym: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) symbol pairs via a
    string-accumulator fold — byte-for-byte the DuckDB ``list_reduce``
    twin. The accumulator carries a LEADING separator per symbol; the
    final ``substring(2)`` strips it."""
    tail = SEP + a
    merged = a + b
    folded = F.aggregate(
        F.split(sym, SEP),
        F.lit(""),
        lambda acc, x: F.when(
            (x == F.lit(b)) & acc.endswith(F.lit(tail)),
            F.concat(
                F.substring(
                    acc, F.lit(1), F.length(acc) - F.lit(len(tail))
                ),
                F.lit(SEP + merged),
            ),
        ).otherwise(F.concat(acc, F.lit(SEP), x)),
    )
    return F.substring(folded, F.lit(2), F.length(folded) - 1)


def bpe_fit(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges; returns ``(merges, vocab)`` where
    ``merges`` is the ordered driver list of (left, right) pairs and
    ``vocab`` the post-merge symbol table ``(word, freq, sym)``.

    Ties on the pair count break on the pair STRING ascending — a total
    order, so the learned tokenizer is a pure function of the corpus
    (any partitioning, any engine). Merge steps stop early if no pair
    remains (every word fused to one symbol).
    """
    vocab = _initial_vocab(docs, text_col).localCheckpoint(eager=False)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(SEP)
        merges.append((a, b))
        vocab = vocab.select(
            "word", "freq", _apply_merge(F.col("sym"), a, b).alias("sym")
        ).localCheckpoint(eager=False)
    return merges, vocab


def bpe_merge_table(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    fitted: tuple[list[tuple[str, str]], DataFrame] | None = None,
) -> DataFrame:
    """The learned merges as ordered rows ``(step, left, right)`` — a
    literal scan of the driver-held result (k rows by contract).
    ``fitted`` injects an already-trained ``(merges, vocab)`` (e.g. the
    plan layer's per-corpus cache) so sibling plans don't re-run the k
    merge jobs per call."""
    merges = (
        fitted[0]
        if fitted is not None
        else bpe_fit(spark, docs, n_merges, text_col)[0]
    )
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "step int, left string, right string",
    )


def bpe_token_counts(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    fitted: tuple[list[tuple[str, str]], DataFrame] | None = None,
) -> DataFrame:
    """Per-document token count under the LEARNED tokenizer:
    ``(id_col, n_bpe_tokens)`` — the real "how many tokens is my corpus"
    number, which whitespace or BPE-ish regex counts only approximate.

    OOV-safe: the corpus being counted need not be the training corpus
    (``fitted`` injects a tokenizer trained elsewhere — the held-out
    scoring split). Words absent from the fitted vocabulary fall back
    to their CHARACTER count (the un-merged, character-level
    segmentation every BPE tokenizer bottoms out at; a production
    tokenizer would additionally replay the merges over the unseen
    word, so this fallback is that count's upper bound) via a LEFT join
    + coalesce — no inner join silently DROPPING unseen words from a
    document's total.

    One corpus word pass joined (word-keyed) against the fitted
    vocabulary's symbol counts — the vocabulary is a dimension (AQE
    broadcasts it when it fits), the aggregation shuffles O(corpus
    words) with map-side combine on the doc key.
    """
    vocab = (
        fitted[1]
        if fitted is not None
        else bpe_fit(spark, docs, n_merges, text_col)[1]
    )
    n_syms = vocab.select(
        "word", F.size(F.split("sym", SEP)).alias("n_syms")
    )
    doc_words = docs.select(
        id_col, F.explode(tokens(F.col(text_col))).alias("word")
    )
    return (
        doc_words.join(n_syms, "word", "left")
        .groupBy(id_col)
        .agg(
            F.sum(
                F.coalesce(F.col("n_syms"), F.length("word"))
            ).alias("n_bpe_tokens")
        )
    )
