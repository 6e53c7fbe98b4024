"""Executor-side Bloom build + probe (the over-``probe_cap`` path).

VERDICT r8 item 1: the wave-prune machinery must survive past
``BLOOM_PROBE_CAP`` instead of silently disabling — the bitmap build
moves JVM-side (``bloom_build_distributed``: k (word, mask) pairs per
key, one ``bit_or`` per word, driver collects at most m/64 rows) and
the probe decision moves executor-side (``live_waves_df``: broadcast
bitmaps, per-partition vectorized tests, O(#waves) driver traffic).
Correctness hinges on one invariant, pinned here first: the numpy and
Spark position functions are BIT-IDENTICAL (a mismatch would be Bloom
false negatives = silently missed duplicates).
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from beavers_spark.plans.common import t
from beavers_spark.streaming import (
    IncrementalChunkDedup,
    IncrementalNearDedup,
    IncrementalSubstringDedup,
)
from beavers_spark.streaming.maintenance import (
    BLOOM_K,
    WaveBloomIndex,
    _bloom_positions,
    bloom_build,
    bloom_build_distributed,
    bloom_position_cols,
    bloom_save,
)

SF_DIR = "/root/testdata/sf0.001"

# extremes + a deterministic spread, signed like xxhash64 output
_KEYS = np.concatenate(
    [
        np.array(
            [0, 1, -1, 2**63 - 1, -(2**63), 42, -(2**40), 2**40 + 7],
            dtype=np.int64,
        ),
        (np.arange(500, dtype=np.int64) * np.int64(-7_919_777_333))
        + np.int64(1_234_567),
    ]
)


def test_position_parity_numpy_vs_spark(spark):
    """The JVM twin must produce the exact numpy positions for every
    key and every supported bitmap size — this parity IS the
    correctness of mixing driver-built and executor-built bitmaps in
    one table."""
    df = spark.createDataFrame(
        [(int(k),) for k in _KEYS], "bh long"
    )
    for m_bits in (64, 1 << 14, 1 << 23):
        want = _bloom_positions(_KEYS, m_bits, BLOOM_K).astype(np.int64)
        got_rows = (
            df.select(
                "bh", *bloom_position_cols(F.col("bh"), m_bits, BLOOM_K)
            )
            .collect()
        )
        got = {
            r["bh"]: [r[f"p{i}"] for i in range(BLOOM_K)]
            for r in got_rows
        }
        for j, k in enumerate(_KEYS):
            assert got[int(k)] == list(want[j]), (m_bits, int(k))


def test_distributed_build_bit_identical(spark):
    """Same key set -> same packed bitmap, whichever side builds it."""
    df = spark.createDataFrame([(int(k),) for k in _KEYS], "h long")
    for m_bits in (64, 1 << 14):
        want = bloom_build(_KEYS, m_bits)
        got = bloom_build_distributed(df, "h", m_bits)
        assert np.array_equal(want, got), m_bits
    # empty input -> zero bitmap
    empty = bloom_build_distributed(df.limit(0), "h", 1 << 14)
    assert not empty.any()


def test_live_waves_df_matches_driver_probe(spark, tmp_path):
    """The executor-side probe decision equals the driver-side one on
    the same bitmaps: hit waves kept, disjoint waves pruned,
    sidecar-less waves conservatively kept."""
    state = tmp_path / "state"
    w0 = np.arange(100, dtype=np.int64)
    w1 = np.arange(10_000, 10_100, dtype=np.int64)
    idx = WaveBloomIndex(str(state), m_bits=1 << 14)
    for w, keys in ((0, w0), (1, w1)):
        d = state / f"w={w}"
        os.makedirs(d)
        bloom_save(str(d), bloom_build(keys, idx.m_bits))
    os.makedirs(state / "w=2")  # no sidecar: always kept

    probes = np.concatenate(
        [w0[:3], np.arange(77_000, 77_050, dtype=np.int64)]
    )
    want = idx.live_waves(probes, exclude=None)
    keys_df = spark.createDataFrame([(int(k),) for k in probes], "k long")
    got = idx.live_waves_df(spark, keys_df, "k")
    assert got == want
    assert 0 in got and 2 in got and 1 not in got
    # chunked probing (the bounded-broadcast path, ADVICE r9): forcing
    # one wave per chunk must give the identical decision — the chunk
    # size only bounds peak broadcast memory, never the answer
    chunked = idx.live_waves_df(
        spark, keys_df, "k", max_broadcast_bytes=1
    )
    assert chunked == got


def test_backfill_over_cap_builds_distributed(spark, tmp_path):
    """A sidecar-less wave whose key count exceeds probe_cap used to
    cache None (permanently unprunable); now it backfills through the
    executor-side build and prunes like any other wave."""
    state = tmp_path / "state"
    d = state / "w=0"
    # hash-like keys (the scheme's quality contract: inputs are
    # already 64-bit hash outputs, not structured raw integers)
    wave_keys = np.unique(
        np.arange(1, 51, dtype=np.int64)
        * np.int64(-0x61C8864680B583EB)  # golden-ratio odd multiplier
    )
    spark.createDataFrame(
        [(int(x),) for x in wave_keys], "h long"
    ).write.parquet(str(d))

    def keys_of(s, wave_dir):
        return s.read.parquet(wave_dir).select("h")

    idx = WaveBloomIndex(
        str(state), m_bits=1 << 14, keys_of=keys_of, probe_cap=10
    )
    bits = idx.bloom_for(0, spark)
    assert bits is not None
    assert idx.overcap_fallbacks == 1
    want = bloom_build(wave_keys, idx.m_bits)
    assert np.array_equal(bits, want)
    # probe decisions now work: member key hits, disjoint key misses
    assert idx.live_waves(wave_keys[:1], None) == [0]
    probe = np.arange(1000, 1003, dtype=np.int64) * np.int64(
        0x2545F4914F6CDD1D
    )
    assert idx.live_waves(probe, None) == []


def _docs(spark, lo, hi):
    return t(spark, SF_DIR, "documents").select("doc_id", "text").filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def test_near_dedup_overcap_prunes_and_matches(spark, tmp_path):
    """End-to-end over-cap near-dedup: with probe_cap tiny every wave
    exceeds it, yet the executor-side path still BUILDS sidecars,
    still PRUNES disjoint waves, and emits the identical pairs as the
    driver-path twin (the 'still prunes past the cap' pytest VERDICT
    r8 item 1 names as done-criterion)."""
    mk = lambda sub: IncrementalNearDedup(  # noqa: E731
        state_path=str(tmp_path / sub / "state"),
        pairs_path=str(tmp_path / sub / "pairs"),
        text_col="text", id_col="doc_id", n=3, threshold=0.2,
        bloom_min_waves=2,
    )
    fast, slow = mk("fast"), mk("slow")
    slow._bloom.probe_cap = 3  # every wave's band keys exceed this

    # token-disjoint waves (the disjoint-bench shape): wave 2 repeats
    # wave 0's texts, shares nothing with wave 1
    waves = [
        [(i, f"w0tok{i} " + " ".join(f"a{i}x{j}" for j in range(12)))
         for i in range(4)],
        [(10 + i, " ".join(f"b{i}y{j}" for j in range(12)))
         for i in range(4)],
        [(20 + i, f"w0tok{i} " + " ".join(f"a{i}x{j}" for j in range(12)))
         for i in range(4)],
    ]
    for d in (fast, slow):
        for w, rows in enumerate(waves):
            d(spark.createDataFrame(rows, "doc_id long, text string"), w)

    assert slow._bloom.overcap_fallbacks > 0
    assert fast._bloom.overcap_fallbacks == 0
    # both probed at wave 2 (2 live waves) and pruned the disjoint one
    assert [(m.batch_id, m.waves_total, m.waves_scanned)
            for m in slow.probe_metrics] == \
           [(m.batch_id, m.waves_total, m.waves_scanned)
            for m in fast.probe_metrics]
    assert slow.probe_metrics[-1].waves_scanned < \
        slow.probe_metrics[-1].waves_total

    def pairs(d):
        return {
            (r.doc1, r.doc2, r.est_jaccard, r.jaccard)
            for r in d.read_pairs(spark).collect()
        }

    got = pairs(slow)
    assert got == pairs(fast)
    assert {(p[0], p[1]) for p in got} >= {(0, 20), (1, 21)}


def test_substring_overcap_matches_driver_path(spark, tmp_path):
    """Over-cap substring dedup equals the driver-path twin on a real
    corpus slice — ownership, spans, and probe decisions all line up."""
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    mk = lambda sub: IncrementalSubstringDedup(  # noqa: E731
        str(tmp_path / sub / "state"), str(tmp_path / sub / "out"),
        text_col="text", id_col="doc_id", k=5, bloom_min_waves=1,
    )
    fast, slow = mk("fast"), mk("slow")
    slow._bloom.probe_cap = 10
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    for d in (fast, slow):
        d(docs.filter(F.col("doc_id") < mid), 0)
        d(docs.filter(F.col("doc_id") >= mid), 1)
    assert slow._bloom.overcap_fallbacks > 0

    def ranges(d):
        return {
            (r.doc_id, r.span_start, r.span_end, r.n_dup_tokens)
            for r in d.read_dup_ranges(spark).collect()
        }

    assert ranges(slow) == ranges(fast)
    assert [(m.waves_total, m.waves_scanned) for m in slow.probe_metrics] \
        == [(m.waves_total, m.waves_scanned) for m in fast.probe_metrics]


def test_chunk_overcap_matches_driver_path(spark, tmp_path):
    """Over-cap chunk dedup equals the driver-path twin."""
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    mk = lambda sub: IncrementalChunkDedup(  # noqa: E731
        str(tmp_path / sub / "state"), str(tmp_path / sub / "out"),
        text_col="text", id_col="doc_id", k=5, bloom_min_waves=1,
    )
    fast, slow = mk("fast"), mk("slow")
    slow._bloom.probe_cap = 10
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    mid = ids[len(ids) // 2]
    for d in (fast, slow):
        d(docs.filter(F.col("doc_id") < mid), 0)
        d(docs.filter(F.col("doc_id") >= mid), 1)
    assert slow._bloom.overcap_fallbacks > 0

    def kept(d):
        return {
            (r.doc_id, r.clean_text, r.n_kept, r.n_chunks)
            for r in d.read_kept(spark).collect()
        }

    assert kept(slow) == kept(fast)
