"""Adaptive band-probe gate (VERDICT r11 item 1): the band-key Bloom
machinery backs off exponentially after probes that scan (almost) every
wave — the band-shared-corpus regime where the probe prunes nothing and
is pure per-wave overhead — while pruning probes keep it engaged, and
the doc-seen guard (non-adaptive) stays always-on."""

from __future__ import annotations

import pyspark.sql.functions as F

from beavers_spark.streaming import IncrementalNearDedup
from beavers_spark.streaming.maintenance import (
    ADAPTIVE_BACKOFF_MAX,
    ADAPTIVE_BACKOFF_START,
    ADAPTIVE_MIN_WAVES,
    WaveBloomIndex,
)


def _idx(tmp_path, adaptive=True):
    idx = WaveBloomIndex(
        str(tmp_path / "state"), 1 << 10, adaptive=adaptive
    )
    # wave_ids comes from the directory; fake enough live waves that
    # min_waves/ADAPTIVE_MIN_WAVES never gate
    for w in range(4):
        (tmp_path / "state" / f"w={w}").mkdir(parents=True)
    return idx


def test_non_pruning_probe_backs_off_and_doubles(tmp_path):
    idx = _idx(tmp_path)
    assert idx.probe_active()
    idx.note_probe(4, 4)  # scanned everything: sleep
    for _ in range(ADAPTIVE_BACKOFF_START):
        assert not idx.probe_active()
    assert idx.probe_active()  # backoff spent: re-probe
    idx.note_probe(4, 4)  # still non-pruning: doubled sleep
    for _ in range(ADAPTIVE_BACKOFF_START * 2):
        assert not idx.probe_active()
    assert idx.probe_active()
    assert idx.adaptive_skips == ADAPTIVE_BACKOFF_START * 3


def test_pruning_probe_keeps_gate_open_and_resets_backoff(tmp_path):
    idx = _idx(tmp_path)
    idx.note_probe(4, 1)  # pruned 3/4: stay engaged
    assert idx.probe_active()
    # escalate, then a pruning probe resets the NEXT backoff to start
    idx.note_probe(4, 4)
    for _ in range(ADAPTIVE_BACKOFF_START):
        assert not idx.probe_active()
    idx.note_probe(4, 0)
    assert idx.probe_active()
    idx.note_probe(4, 4)
    n = 0
    while not idx.probe_active():
        n += 1
    assert n == ADAPTIVE_BACKOFF_START  # reset, not doubled


def test_backoff_caps_and_small_tables_never_back_off(tmp_path):
    idx = _idx(tmp_path)
    for _ in range(10):
        idx.note_probe(4, 4)
        while not idx.probe_active():
            pass
    idx.note_probe(4, 4)
    n = 0
    while not idx.probe_active():
        n += 1
    assert n == ADAPTIVE_BACKOFF_MAX
    # below ADAPTIVE_MIN_WAVES a full scan is not evidence
    idx2 = _idx(tmp_path / "b")
    idx2.note_probe(ADAPTIVE_MIN_WAVES - 1, ADAPTIVE_MIN_WAVES - 1)
    assert idx2.probe_active()


def test_non_adaptive_index_ignores_probe_outcomes(tmp_path):
    idx = _idx(tmp_path, adaptive=False)
    idx.note_probe(4, 4)
    assert idx.probe_active()
    assert idx.adaptive_skips == 0


def test_kernel_parity_with_band_shared_corpus(spark, tmp_path):
    """Incremental == batch pairs on a corpus whose waves SHARE band
    keys (every wave re-sends near-identical texts): the adaptive gate
    sleeps mid-run (skips observed), waves written while asleep get
    lazily backfilled sidecars, and no duplicate pair is missed."""
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta eta theta doc{i % 3}")
        for i in range(24)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    dedup = IncrementalNearDedup(
        str(tmp_path / "st"), str(tmp_path / "pairs"),
        text_col="text", id_col="doc_id", threshold=0.5,
        compact_every_waves=None,
    )
    n_waves = 8
    for i in range(n_waves):
        dedup(docs.filter(F.pmod("doc_id", F.lit(n_waves)) == i), i)
    got = {
        (r.doc1, r.doc2)
        for r in dedup.read_pairs(spark).collect()
    }
    from beavers_spark.functions.dedup import minhash_lsh_pairs

    want = {
        (r.doc1, r.doc2)
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert got == want
    assert dedup._bloom.adaptive_skips > 0  # the gate actually slept


def test_tick_is_idempotent_per_batch(tmp_path):
    """ADVICE r12: the backoff tick used to be a hidden side effect of
    probe_active, so a second call in one batch silently shortened the
    sleep. With a batch id (``exclude``), repeated calls replay the
    first verdict and consume exactly one skip."""
    idx = _idx(tmp_path)
    idx.note_probe(4, 4)  # sleep for ADAPTIVE_BACKOFF_START batches
    before = idx._skip_remaining
    assert not idx.probe_active(exclude=7)
    assert not idx.probe_active(exclude=7)  # same batch: no 2nd tick
    assert not idx.probe_active(exclude=7)
    assert idx._skip_remaining == before - 1
    assert idx.adaptive_skips == 1
    # a NEW batch id ticks again
    for b in range(8, 8 + ADAPTIVE_BACKOFF_START - 1):
        assert not idx.probe_active(exclude=b)
    assert idx.probe_active(exclude=99)  # backoff spent: re-engaged


def test_invalidate_wakes_the_adaptive_gate(tmp_path):
    """ADVICE r12: forget/compaction call invalidate() because waves
    were rewritten — a sleep earned on the OLD contents must not keep
    the probe blind to the new state."""
    idx = _idx(tmp_path)
    idx.note_probe(4, 4)
    idx.note_probe(4, 4)  # escalate the next backoff
    assert idx._skip_remaining > 0
    idx.invalidate()
    assert idx._skip_remaining == 0
    assert idx._next_backoff == ADAPTIVE_BACKOFF_START
    assert idx.probe_active(exclude=1)
