"""Kernel-triggered auto-compaction (``compact_every_waves``, VERDICT
r9 item 3): when the live wave count reaches the knob, the kernel runs
its own ``compact()`` right after the wave commits — and the results
are IDENTICAL to the never-compacted twin, across every boundary.

The cadence re-derives its trigger from the state directory (not an
in-memory counter), so it is restart-safe, and it runs after the
watermark mark, so the kernels' existing crash-window recovery contract
covers it unchanged (pinned separately in test_dedup_incremental's
crash tests)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from beavers_spark.plans.common import t
from beavers_spark.streaming import (
    IncrementalChunkDedup,
    IncrementalNearDedup,
    IncrementalTfidfDedup,
)
from beavers_spark.streaming.maintenance import live_wave_count

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, lo, hi):
    return t(spark, SF_DIR, "documents").select("doc_id", "text").filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def _waves(d, spark, n_waves=4, per=20):
    for w in range(n_waves):
        d(_docs(spark, w * per, (w + 1) * per), w)


def _state_waves(path):
    return sorted(
        n for n in os.listdir(path) if n.startswith("w=")
    )


def test_chunk_auto_compaction_matches_manual_never(spark, tmp_path):
    auto = IncrementalChunkDedup(
        str(tmp_path / "a" / "state"), str(tmp_path / "a" / "out"),
        text_col="text", id_col="doc_id", k=5,
        compact_every_waves=2, bloom_min_waves=1,
    )
    plain = IncrementalChunkDedup(
        str(tmp_path / "p" / "state"), str(tmp_path / "p" / "out"),
        text_col="text", id_col="doc_id", k=5, bloom_min_waves=1,
    )
    for d in (auto, plain):
        _waves(d, spark)
    assert auto.auto_compactions >= 2
    assert plain.auto_compactions == 0
    # the cadence actually bounds the wave count: compaction coalesced
    # everything into w=-1, at most `every` live waves ever accumulate
    assert live_wave_count(auto.state_path) <= 2
    assert "w=-1" in _state_waves(auto.state_path)
    assert "auto_compact" in auto.phase_seconds

    def kept(d):
        return {
            (r.doc_id, r.clean_text, r.n_kept, r.n_chunks)
            for r in d.read_kept(spark).collect()
        }

    assert kept(auto) == kept(plain)
    # state registries agree on ownership too
    def owned(d):
        return {
            (r.h, r.doc_id, r.idx) for r in d.read_state(spark).collect()
        }

    assert owned(auto) == owned(plain)


def test_chunk_auto_compaction_is_restart_and_replay_safe(spark, tmp_path):
    mk = lambda: IncrementalChunkDedup(  # noqa: E731
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5,
        compact_every_waves=2, bloom_min_waves=1,
    )
    first = mk()
    _waves(first, spark, n_waves=2)
    assert first.auto_compactions == 1
    before = {
        (r.doc_id, r.n_kept) for r in first.read_kept(spark).collect()
    }
    # a FRESH instance (restart) derives the cadence from the directory
    # and keeps going; replaying an already-committed batch id is a
    # no-op even though the waves were coalesced to w=-1
    second = mk()
    second(_docs(spark, 0, 20), 0)  # replay: watermark survives compaction
    assert {
        (r.doc_id, r.n_kept) for r in second.read_kept(spark).collect()
    } == before
    second(_docs(spark, 40, 60), 2)
    assert second.auto_compactions == 1  # w=-1 + w=2 reached the knob
    third = {
        r.doc_id for r in second.read_kept(spark).collect()
    }
    assert third >= {r.doc_id for r in _docs(spark, 40, 60).collect()}


def test_near_dedup_auto_compaction_matches(spark, tmp_path):
    mk = lambda sub, **kw: IncrementalNearDedup(  # noqa: E731
        str(tmp_path / sub / "state"), str(tmp_path / sub / "pairs"),
        text_col="text", id_col="doc_id", n=3, threshold=0.2,
        bloom_min_waves=1, **kw,
    )
    auto, plain = mk("a", compact_every_waves=2), mk("p")
    # seeded duplicate pair straddling a compaction boundary: doc 20 in
    # wave 2 repeats doc 0's text from wave 0 (compacted away by then)
    rows = [
        [(i, " ".join(f"w0tok{i}x{j}" for j in range(12)))
         for i in range(4)],
        [(10 + i, " ".join(f"w1tok{i}x{j}" for j in range(12)))
         for i in range(4)],
        [(20 + i, " ".join(f"w0tok{i}x{j}" for j in range(12)))
         for i in range(4)],
    ]
    for d in (auto, plain):
        for w, batch in enumerate(rows):
            d(spark.createDataFrame(batch, "doc_id long, text string"), w)
    assert auto.auto_compactions >= 1

    def pairs(d):
        return {
            (r.doc1, r.doc2, r.est_jaccard, r.jaccard)
            for r in d.read_pairs(spark).collect()
        }

    got = pairs(auto)
    assert got == pairs(plain)
    # the cross-boundary duplicates were found against compacted state
    assert {(p[0], p[1]) for p in got} >= {(0, 20), (1, 21), (2, 22)}


def test_tfidf_auto_compaction_matches(spark, tmp_path):
    mk = lambda sub, **kw: IncrementalTfidfDedup(  # noqa: E731
        str(tmp_path / sub / "state"), str(tmp_path / sub / "cand"),
        text_col="text", id_col="doc_id", threshold=0.8, **kw,
    )
    auto, plain = mk("a", compact_every_waves=2), mk("p")
    for d in (auto, plain):
        _waves(d, spark, n_waves=3)
    assert auto.auto_compactions >= 1

    def pairs(d):
        return {
            (r.doc1, r.doc2, r.cos)
            for r in d.read_pairs(spark).collect()
        }

    assert pairs(auto) == pairs(plain)
