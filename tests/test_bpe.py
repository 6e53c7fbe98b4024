"""BPE trainer (functions/bpe.py): textbook merge behavior, greedy
non-overlap fold, tie-breaks, determinism, degenerate corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.bpe import (
    SEP,
    bpe_fit,
    bpe_token_counts,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(rows)], "doc_id long, text string"
    )


def test_textbook_merges(spark):
    docs = _docs(
        spark, ["low low low lower lowest", "new newer newest low"]
    )
    merges, vocab = bpe_fit(spark, docs, n_merges=4)
    # 'low' appears 4x -> (l,o) then (lo,w) fuse it to one symbol
    assert merges[:2] == [("l", "o"), ("lo", "w")]
    syms = {r.word: r.sym.split(SEP) for r in vocab.collect()}
    assert syms["low"] == ["low"]
    assert syms["lower"][0] == "low"


def test_greedy_nonoverlap_within_word(spark):
    # 'aaaa' with merge (a,a): greedy left-to-right -> aa|aa, and the
    # second step merges (aa,aa) -> one symbol
    docs = _docs(spark, ["aaaa aaaa aaaa"])
    merges, vocab = bpe_fit(spark, docs, n_merges=2)
    assert merges == [("a", "a"), ("aa", "aa")]
    assert [r.sym for r in vocab.collect()] == ["aaaa"]


def test_tiebreak_is_pair_string_ascending(spark):
    # 'ab' and 'cd' both occur twice: the (a,b) pair sorts before (c,d)
    docs = _docs(spark, ["ab ab cd cd"])
    merges, _ = bpe_fit(spark, docs, n_merges=1)
    assert merges == [("a", "b")]


def test_early_stop_when_fully_fused(spark):
    docs = _docs(spark, ["ab ab"])
    merges, vocab = bpe_fit(spark, docs, n_merges=5)
    assert merges == [("a", "b")]  # nothing left to merge after step 1
    assert [r.sym for r in vocab.collect()] == ["ab"]


def test_token_counts_under_learned_tokenizer(spark):
    docs = _docs(spark, ["low low lower", "lowest"])
    out = {
        r.doc_id: r.n_bpe_tokens
        for r in bpe_token_counts(spark, docs, n_merges=2).collect()
    }
    # merges: (l,o), (lo,w) -> low=1 symbol, lower=3, lowest=4
    assert out == {0: 1 + 1 + 3, 1: 4}


def test_deterministic_under_repartitioning(spark):
    docs = _docs(
        spark, [f"tok{i % 7} tok{(i * 3) % 5} filler" for i in range(40)]
    )
    m1, v1 = bpe_fit(spark, docs, n_merges=3)
    m2, v2 = bpe_fit(spark, docs.repartition(11), n_merges=3)
    assert m1 == m2
    assert sorted(map(tuple, v1.collect())) == sorted(
        map(tuple, v2.collect())
    )


def test_empty_corpus(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    merges, vocab = bpe_fit(spark, docs, n_merges=3)
    assert merges == []
    assert vocab.count() == 0
