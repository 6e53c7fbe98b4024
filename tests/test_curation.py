"""Corpus-curation operators: decontamination, domain caps, shuffle,
repetition, stratified sampling, sequence packing (functions/curation.py).

Oracle parity is covered by tools/check_oracle.py; these tests pin the
SEMANTICS (planted cases, determinism under repartitioning, layout
invariants) that a hash-match alone wouldn't explain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.curation import (
    corpus_shuffle,
    decontaminate,
    domain_cap,
    pack_sequences,
    repetition_ratio,
    stratified_sample,
)


def test_decontaminate_finds_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # contains eval 5-gram
            (2, "totally unrelated training content here now"),
        ],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    out = {r.doc_id: r.n_overlap for r in decontaminate(train, evals, "text", "doc_id", n=5).collect()}
    assert out == {1: 1}  # doc 2 is clean, doc 1 shares exactly one 5-gram


def test_domain_cap_caps_and_is_partitioning_invariant(spark):
    rows = [(i, f"src{i % 3}") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = domain_cap(df, "source", "doc_id", cap=5)
    counts = {r.source: r.n for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts == {"src0": 5, "src1": 5, "src2": 5}
    # survivor set is a pure function of (id, domain) — repartitioning
    # the input cannot change it
    again = domain_cap(df.repartition(7), "source", "doc_id", cap=5)
    assert sorted(r.doc_id for r in kept.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_corpus_shuffle_is_seeded_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    a = [r.doc_id for r in corpus_shuffle(df, "doc_id", seed="s1", n_partitions=4).collect()]
    b = [r.doc_id for r in corpus_shuffle(df, "doc_id", seed="s1", n_partitions=4).collect()]
    c = [r.doc_id for r in corpus_shuffle(df, "doc_id", seed="s2", n_partitions=4).collect()]
    assert a == b  # deterministic
    assert a != c  # a new seed is a fresh epoch permutation
    assert sorted(a) == list(range(100)) == sorted(c)  # still a permutation
    # collected order IS the key order (range partition + local sort)
    keys = [r.shuffle_key for r in corpus_shuffle(df, "doc_id", seed="s1", n_partitions=4).collect()]
    assert keys == sorted(keys)


def test_repetition_ratio_orders_looping_above_diverse(spark):
    df = spark.createDataFrame(
        [
            (1, "spam ham eggs " * 20),  # one 3-gram looping
            (2, "the quick brown fox jumps over a lazy dog today"),
            (3, "too short"),  # < 3 tokens -> 0.0
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.r for r in df.select("doc_id", repetition_ratio(F.col("text")).alias("r")).collect()}
    assert out[1] > 0.9 and out[2] == 0.0 and out[3] == 0.0


def test_stratified_sample_rates(spark):
    rows = [(i, "en" if i % 2 else "fr") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, "lang", "doc_id", {"en": 0.25, "fr": 1.0})
    counts = {r.lang: r.n for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["fr"] == 1000  # rate 1.0 keeps everything
    assert 150 < counts["en"] < 350  # ~25% of 1000
    # unlisted strata default to dropped
    assert stratified_sample(df, "lang", "doc_id", {"de": 1.0}).count() == 0


def test_pack_sequences_layout_invariants(spark):
    df = spark.createDataFrame(
        [(i, 100 + (i * 37) % 500) for i in range(200)],
        "doc_id long, length long",
    )
    capacity, n_streams = 1000, 4
    out = pack_sequences(df, "doc_id", "length", capacity, n_streams, seed="t")
    rows = out.collect()
    assert len(rows) == 200
    assert {r.stream for r in rows} <= set(range(n_streams))
    assert all(0 <= r.offset < capacity for r in rows)
    # within a stream, docs tile the concatenated token stream exactly:
    # doc k starts where doc k-1 ended (mod capacity), packs ascend
    lengths = {r.doc_id: r.length for r in df.collect()}
    by_stream: dict[int, list] = {}
    for r in rows:
        by_stream.setdefault(r.stream, []).append(r)
    for stream_rows in by_stream.values():
        stream_rows.sort(key=lambda r: (r.pack_id, r.offset, r.doc_id))
        cum = 0
        for r in stream_rows:
            assert r.pack_id == cum // capacity
            assert r.offset == cum % capacity
            cum += lengths[r.doc_id]
    # deterministic under repartitioning
    again = pack_sequences(df.repartition(13), "doc_id", "length", capacity, n_streams, seed="t")
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_word_chunks_segments_and_edges(spark):
    from beavers_spark.functions.curation import word_chunks

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x"), (3, "")], "doc_id long, text string"
    )
    out = {
        r.doc_id: r.ch
        for r in df.select(
            "doc_id", word_chunks(F.col("text"), k=2).alias("ch")
        ).collect()
    }
    assert out[1] == ["a b", "c d", "e"]  # last partial chunk kept
    assert out[2] == ["x"]
    assert out[3] == []  # empty text -> no chunks, not a descending sequence


def test_chunk_dedup_keeps_first_occurrence_only(spark):
    from beavers_spark.functions.curation import chunk_dedup

    # doc 1 owns "a b"; doc 2 repeats it (dropped) but contributes "c d";
    # doc 3 is entirely duplicate material -> disappears
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d"), (3, "a b")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in chunk_dedup(df, "text", "doc_id", k=2).collect()}
    assert set(out) == {1, 2}
    assert out[1].clean_text == "a b" and out[1].n_kept == 1 and out[1].n_chunks == 1
    assert out[2].clean_text == "c d" and out[2].n_kept == 1 and out[2].n_chunks == 2


def test_chunk_dedup_within_doc_repeat_and_determinism(spark):
    from beavers_spark.functions.curation import chunk_dedup

    # the same chunk repeated INSIDE one doc dedups to its first position
    df = spark.createDataFrame(
        [(7, "a b a b c d"), (9, "c d")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in chunk_dedup(df, "text", "doc_id", k=2).collect()}
    assert out[7].clean_text == "a b c d" and out[7].n_kept == 2 and out[7].n_chunks == 3
    assert 9 not in out  # doc 7 (earlier occurrence key) owns "c d"
    again = {
        r.doc_id: r.clean_text
        for r in chunk_dedup(
            df.repartition(5), "text", "doc_id", k=2
        ).collect()
    }
    assert again == {k: v.clean_text for k, v in out.items()}


def test_token_budget_mix_rates_and_cap(spark):
    from beavers_spark.functions.curation import token_budget_mix

    rows = [(i, "big" if i < 400 else "small", 100) for i in range(420)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # budget 4000: "big" has 40k tokens -> rate 0.1; "small" 2k -> capped at 1.0
    out = token_budget_mix(
        df, "source", "doc_id", "n_chars", weights={}, budget=4000,
        default_weight=1.0,
    )
    counts = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["small"] == 20  # rate 1.0 keeps everything
    assert 20 <= counts["big"] <= 60  # ~10% of 400, hash-bucket variance
    # weight 0 (default for unlisted sources) drops a source entirely
    none = token_budget_mix(
        df, "source", "doc_id", "n_chars", weights={"small": 1.0}, budget=4000
    )
    assert {r.source for r in none.select("source").distinct().collect()} == {"small"}
    # deterministic under repartitioning
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in token_budget_mix(
            df.repartition(11), "source", "doc_id", "n_chars",
            weights={}, budget=4000, default_weight=1.0,
        ).collect()
    )
    assert a == b


def test_temperature_mix_flattens_shares(spark):
    from beavers_spark.functions.curation import temperature_mix

    rows = [(i, "big" if i < 900 else "small", 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    # alpha=0.5 flattens 0.9/0.1 shares to ~0.75/0.25 of the budget:
    # the small source gets a ~2.5x higher keep RATE than its raw share
    out = temperature_mix(
        df, "source", "doc_id", "n_chars", alpha=0.5, budget=40000
    )
    counts = {
        r.source: r.n
        for r in out.groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    # big: rate = 0.4*0.75/0.9 = 1/3 of 900; small: 0.4*0.25/0.1 = 1.0 cap
    assert counts["small"] == 100
    assert 240 <= counts["big"] <= 360
    # alpha=1.0 degenerates to proportional sampling: equal keep rates
    prop = temperature_mix(
        df, "source", "doc_id", "n_chars", alpha=1.0, budget=40000
    )
    pc = {
        r.source: r.n
        for r in prop.groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert 320 <= pc["big"] <= 400  # ~40% of 900
    assert 25 <= pc["small"] <= 55  # ~40% of 100
    # deterministic under repartitioning
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in temperature_mix(
            df.repartition(7), "source", "doc_id", "n_chars",
            alpha=0.5, budget=40000,
        ).collect()
    )
    assert a == b


def test_temperature_mix_empty_and_zero_lengths(spark):
    from beavers_spark.functions.curation import temperature_mix

    empty = spark.createDataFrame(
        [], "doc_id long, source string, n_chars long"
    )
    assert temperature_mix(
        empty, "source", "doc_id", "n_chars", alpha=0.5, budget=100
    ).count() == 0
    # all-zero lengths: every source keeps everything (rate 1.0 guard)
    zeros = spark.createDataFrame(
        [(i, "s", 0) for i in range(5)],
        "doc_id long, source string, n_chars long",
    )
    out = temperature_mix(
        zeros, "source", "doc_id", "n_chars", alpha=0.5, budget=100
    )
    assert out.count() == 5


def test_sliding_spans_shapes(spark):
    from beavers_spark.functions.curation import sliding_spans

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "a"), (4, "")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.sp
        for r in df.select(
            "doc_id", sliding_spans(F.col("text"), k=2).alias("sp")
        ).collect()
    }
    assert out[1] == ["a b", "b c", "c d"]  # stride-1, n-k+1 spans
    assert out[2] == ["a b"]
    assert out[3] == []  # below k -> no spans
    assert out[4] == []


def test_substring_dedup_planted_cross_doc_spans(spark):
    from beavers_spark.functions.curation import substring_dedup

    # doc 1 is the original; doc 2 embeds doc 1's tokens 2..7 ("c d e f
    # g h", a 6-token run) at positions 1..6; doc 3 is an exact full
    # copy of doc 1; doc 4 shares nothing long enough
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "z c d e f g h z2 z3 z4"),
            (3, "a b c d e f g h i j"),
            (4, "p q r s t u v w x y"),
        ],
        "doc_id long, text string",
    )
    rows = substring_dedup(df, "text", "doc_id", k=3).collect()
    got = {(r.doc_id, r.span_start, r.span_end, r.n_dup_tokens) for r in rows}
    # doc 1 owns everything (first occurrence); doc 4 unique; doc 3's
    # stride-1 3-spans are all duplicates of doc 1's -> one maximal
    # range covering the whole 10-token doc; doc 2's copied run spans
    # tokens [1, 7) (the 3-spans of "c d e f g h" merged)
    assert got == {(2, 1, 7, 6), (3, 0, 10, 10)}


def test_substring_dedup_within_doc_and_partition_invariance(spark):
    from beavers_spark.functions.curation import substring_dedup

    # "a b c" repeats INSIDE doc 5 at positions 0 and 4 -> the second
    # occurrence [4, 7) is a duplicate of the first; disjoint ranges in
    # the same doc stay separate rows
    df = spark.createDataFrame(
        [(5, "a b c q a b c q2 q3 x y z x y z")],
        "doc_id long, text string",
    )
    rows = substring_dedup(df, "text", "doc_id", k=3).collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in rows}
    assert got == {(5, 4, 7), (5, 12, 15)}
    again = {
        (r.doc_id, r.span_start, r.span_end)
        for r in substring_dedup(
            df.repartition(4), "text", "doc_id", k=3
        ).collect()
    }
    assert again == got


def test_substring_dedup_apply_cuts_ranges(spark):
    from beavers_spark.functions.curation import substring_dedup_apply

    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),
            (2, "z c d e f g h z2 z3 z4"),   # tokens 1..6 duplicate doc 1
            (3, "a b c d e f g h i j"),      # full copy -> emptied
            (4, "p q r s t u v w x y"),      # untouched
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in substring_dedup_apply(df, "text", "doc_id", k=3).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # every doc present, owner intact
    assert out[1].clean_text == "a b c d e f g h i j"
    assert out[1].n_dup_tokens == 0
    assert out[2].clean_text == "z z2 z3 z4" and out[2].n_dup_tokens == 6
    assert out[3].clean_text == "" and out[3].n_dup_tokens == 10
    assert out[4].clean_text == "p q r s t u v w x y"
    assert all(r.n_tokens == 10 for r in out.values())


def test_temperature_mix_int_source_and_nulls(spark):
    # review r6: the rate table hardcoded a string source schema, and
    # the inner equi-join silently dropped NULL-source rows
    from beavers_spark.functions.curation import temperature_mix

    rows = [(i, i % 3 if i % 5 else None, 10) for i in range(60)]
    df = spark.createDataFrame(
        rows, "doc_id long, domain int, n_chars long"
    )
    out = temperature_mix(
        df, "domain", "doc_id", "n_chars", alpha=0.5, budget=6000
    )
    # a 10x budget caps every rate at 1.0: every row survives,
    # including the NULL-domain group (null-safe rate join)
    assert out.count() == 60
    assert out.filter(F.col("domain").isNull()).count() == 12


def test_chunk_documents_windows_and_edges(spark):
    from beavers_spark.functions.curation import chunk_documents

    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),   # 10 tokens
            (2, "x y"),                    # shorter than one chunk
            (3, "   "),                    # zero tokens: no chunks
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(
            docs, "text", "doc_id", chunk_size=4, overlap=2
        ).collect()
    }
    # step 2: windows at 0,2,4,6 — a start at 8 would re-emit 'i j',
    # a strict subset of chunk 3 (pure training-set duplication), so
    # starts stop once the previous window reached the document end
    assert out[(1, 0)] == (4, "a b c d")
    assert out[(1, 1)] == (4, "c d e f")
    assert out[(1, 3)] == (4, "g h i j")
    assert (1, 4) not in out
    assert out[(2, 0)] == (2, "x y")
    assert not any(d == 3 for d, _ in out)
    assert len(out) == 5
    # an uneven tail that DOES add new tokens is still emitted (short)
    out2 = {
        (r.doc_id, r.chunk_id): (r.n_tokens, r.chunk_text)
        for r in chunk_documents(
            spark.createDataFrame(
                [(9, "a b c d e")], "doc_id long, text string"
            ),
            "text", "doc_id", chunk_size=4, overlap=2,
        ).collect()
    }
    assert out2 == {(9, 0): (4, "a b c d"), (9, 1): (3, "c d e")}
    with _pytest.raises(ValueError, match="overlap"):
        chunk_documents(docs, "text", "doc_id", chunk_size=4, overlap=4)
