"""BPE tokenizer-training plans with a DuckDB oracle that replays the
same fixed merge steps — an ITERATIVE TOKENIZER TRAINER with an exact
oracle, and the only fit in the family with NO floats anywhere:
integer pair counts, total-order argmax (count DESC, pair ASC), and a
string-accumulator greedy fold that DuckDB reproduces byte-for-byte
via ``list_reduce`` (see functions/bpe.py).

The fit is CACHED per (sf_dir, training subset): the three full-corpus
plans and the holdout plan each need the same trained tokenizer, and
before the cache each registered plan re-ran the k collect-driven merge
jobs independently (ADVICE r6). The cache persists the fitted
vocabulary to a session-independent temp parquet (the
plans/storage.py ``_Z_CACHE`` pattern), so bench tiers with fresh
sessions still reuse the fit.

Reference: no tokenizer surface in the reference (README.md:43-50) —
beyond-reference tier, conventions of plans/selection.py.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import functions as F

from beavers_spark.functions.bpe import (
    SEP,
    bpe_fit,
    bpe_merge_table,
    bpe_token_counts,
)
from beavers_spark.plans.common import t
from beavers_spark.plans.llmops import _SQL_TOKS
from beavers_spark.plans.registry import query

_N_MERGES = 4

#: holdout split: train the tokenizer here, score everywhere else
_HOLDOUT_TRAIN = ("src0", "src1", "src2")

_S = "chr(31)"  # the unit-separator literal, DuckDB side


def _sql_bpe_base(where: str = "") -> str:
    """The word-frequency + character-seeding CTEs over ``documents``,
    optionally restricted by a WHERE clause (the holdout training
    split)."""
    return f"""
wrd AS (SELECT unnest({_SQL_TOKS}) AS word FROM documents {where}),
wf AS (SELECT word, count(*) AS freq FROM wrd GROUP BY 1),
v0 AS (
    SELECT word, freq,
           substr(regexp_replace(word, '(.)', '\\1' || {_S}, 'g'), 1,
                  length(word) * 2 - 1) AS sym
    FROM wf
)
"""


def _sql_merge_step(step: int) -> str:
    """One BPE step off ``v{step}``: weighted pair counts, total-order
    argmax, greedy-fold application — the documented driver math."""
    n = step + 1
    return f"""
pc{step} AS (
    SELECT pair, sum(freq) AS c FROM (
        SELECT freq,
               unnest(list_transform(generate_series(1, len(ss) - 1),
                   i -> ss[i] || {_S} || ss[i+1])) AS pair
        FROM (SELECT freq, string_split(sym, {_S}) AS ss FROM v{step})
    ) GROUP BY 1
),
mg{step} AS (
    SELECT string_split(pair, {_S})[1] AS a,
           string_split(pair, {_S})[2] AS b,
           pair, c
    FROM pc{step} ORDER BY c DESC, pair LIMIT 1
),
v{n} AS (
    SELECT word, freq,
           substr(list_reduce(
               list_prepend('', string_split(v{step}.sym, {_S})),
               (acc, x) -> CASE
                   WHEN x = mg{step}.b
                        AND ends_with(acc, {_S} || mg{step}.a)
                   THEN substr(acc, 1,
                               length(acc) - length({_S} || mg{step}.a))
                        || {_S} || mg{step}.a || mg{step}.b
                   ELSE acc || {_S} || x END), 2) AS sym
    FROM v{step}, mg{step}
)
"""


def _sql_bpe_chain(where: str = "") -> str:
    return (
        "WITH "
        + _sql_bpe_base(where)
        + ","
        + ",".join(_sql_merge_step(i) for i in range(_N_MERGES)).replace(
            "\n,\n", ",\n"
        )
    )


_SQL_BPE_CHAIN = _sql_bpe_chain()

#: (sf_dir, subset) -> (merges, fitted-vocab parquet path). The vocab
#: rides a temp parquet rather than a cached DataFrame so the cache
#: survives across SparkSessions (bench tiers use fresh sessions).
_BPE_CACHE: dict[tuple[str, str], tuple[list[tuple[str, str]], str]] = {}


def _fit_cached(spark, sf_dir: str, subset: str = "all"):
    """Train-once-per-corpus BPE fit: returns ``(merges, vocab_df)``.
    ``subset`` is ``"all"`` (full documents table) or ``"holdout"``
    (sources in ``_HOLDOUT_TRAIN`` only)."""
    key = (sf_dir, subset)
    hit = _BPE_CACHE.get(key)
    if hit is None:
        docs = t(spark, sf_dir, "documents")
        if subset == "holdout":
            docs = docs.filter(F.col("source").isin(*_HOLDOUT_TRAIN))
        merges, vocab = bpe_fit(spark, docs, n_merges=_N_MERGES)
        root = tempfile.mkdtemp(prefix="beavers_bpe_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        path = root + "/vocab"
        vocab.write.parquet(path)
        hit = (merges, path)
        _BPE_CACHE[key] = hit
    merges, path = hit
    return merges, spark.read.parquet(path)


@query(
    "bpe_merges",
    oracle=_SQL_BPE_CHAIN + "\n"
    + "\nUNION ALL\n".join(
        f'SELECT {i} AS step, a AS "left", b AS "right" FROM mg{i}'
        for i in range(_N_MERGES)
    ),
)
def bpe_merges_q(spark, sf_dir):
    """The 4 learned BPE merges as ordered (step, left, right) rows —
    the tokenizer model itself, a literal scan of the driver-held
    result (k rows by contract)."""
    return bpe_merge_table(
        spark,
        t(spark, sf_dir, "documents"),
        n_merges=_N_MERGES,
        fitted=_fit_cached(spark, sf_dir),
    )


@query(
    "bpe_vocab",
    oracle=_SQL_BPE_CHAIN + f"""
    SELECT word, freq,
           replace(sym, {_S}, '|') AS sym
    FROM v{_N_MERGES}
    """,
)
def bpe_vocab_q(spark, sf_dir):
    """The post-merge vocabulary ``(word, freq, sym)`` — every distinct
    corpus word's segmentation under the learned tokenizer (separator
    rendered as '|' for a printable hash surface)."""
    _, vocab = _fit_cached(spark, sf_dir)
    return vocab.select(
        "word", "freq", F.replace(F.col("sym"), F.lit(SEP), F.lit("|")).alias("sym")
    )


@query(
    "bpe_token_count",
    oracle=_SQL_BPE_CHAIN + f"""
    , ns AS (
        SELECT word, len(string_split(sym, {_S})) AS n_syms
        FROM v{_N_MERGES}
    ),
    dw AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS word FROM documents
    )
    SELECT dw.doc_id,
           sum(coalesce(ns.n_syms, length(dw.word)))::BIGINT
               AS n_bpe_tokens
    FROM dw LEFT JOIN ns USING (word) GROUP BY 1
    """,
)
def bpe_token_count_q(spark, sf_dir):
    """Per-document token count under the LEARNED tokenizer — the real
    'how many tokens is my corpus' number that whitespace or BPE-ish
    regex counts only approximate. One corpus word pass, word-keyed
    LEFT join against the dimension-sized fitted vocabulary (OOV-safe
    even though train == score here: semantics match the holdout
    twin)."""
    return bpe_token_counts(
        spark,
        t(spark, sf_dir, "documents"),
        n_merges=_N_MERGES,
        fitted=_fit_cached(spark, sf_dir),
    )


_SQL_TRAIN_WHERE = "WHERE source IN ('src0', 'src1', 'src2')"


@query(
    "bpe_token_count_holdout",
    oracle=_sql_bpe_chain(_SQL_TRAIN_WHERE) + f"""
    , ns AS (
        SELECT word, len(string_split(sym, {_S})) AS n_syms
        FROM v{_N_MERGES}
    ),
    dw AS (
        SELECT doc_id, unnest({_SQL_TOKS}) AS word FROM documents
        WHERE source NOT IN ('src0', 'src1', 'src2')
    )
    SELECT dw.doc_id,
           sum(coalesce(ns.n_syms, length(dw.word)))::BIGINT
               AS n_bpe_tokens
    FROM dw LEFT JOIN ns USING (word) GROUP BY 1
    """,
)
def bpe_token_count_holdout_q(spark, sf_dir):
    """HELD-OUT token counting: tokenizer trained on sources
    src0/src1/src2 only, token counts over every OTHER source — the
    scored corpus is disjoint from the training corpus, so unseen
    words genuinely exercise the character-level OOV fallback
    (``coalesce(n_syms, length(word))``). Mirrors
    ``lm_perplexity_holdout``'s train/score split."""
    fitted = _fit_cached(spark, sf_dir, subset="holdout")
    score = t(spark, sf_dir, "documents").filter(
        ~F.col("source").isin(*_HOLDOUT_TRAIN)
    )
    return bpe_token_counts(
        spark, score, n_merges=_N_MERGES, fitted=fitted
    )
