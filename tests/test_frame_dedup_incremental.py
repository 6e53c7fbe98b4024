"""IncrementalFrameDedup: streaming frame-content ownership must equal
the batch ``video_frame_dedup`` owners under in-order arrival, with
redelivery and crash replays no-ops."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from beavers_spark.plans.llmops import _synth_frame_avis
from beavers_spark.streaming import IncrementalFrameDedup

SF_DIR = "/root/testdata/sf0.001"


def _avis(spark, lo, hi):
    """Deterministic frame-AVI slice (the video_frame_dedup plan's own
    generator, so the batch-equivalence pin shares one corpus)."""
    return _synth_frame_avis(spark, SF_DIR).filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def _kept(dedup, spark):
    return {
        (r.doc_id, r.frame_idx)
        for r in dedup.read_kept(spark)
        .filter(F.col("frame_idx").isNotNull())
        .collect()
    }


def _batch_owners(spark, hi):
    from beavers_spark.plans import QUERIES

    plan = QUERIES["video_frame_dedup"](spark, SF_DIR).filter(
        F.col("doc_id") < hi
    )
    return {
        (r.doc_id, r.frame_idx)
        for r in plan.filter(
            (F.col("owner_doc") == F.col("doc_id"))
            & (F.col("owner_frame") == F.col("frame_idx"))
        ).collect()
    }


def test_incremental_equals_batch_owners(spark, tmp_path):
    """Three ascending waves over the generator corpus (200 ids: the
    duplicate classes need doc pairs with id delta 99, see the plan)
    must own exactly the frames the batch video_frame_dedup plan's
    lexicographic-min owners own."""
    dedup = IncrementalFrameDedup(
        str(tmp_path / "state"), str(tmp_path / "out")
    )
    for lo, hi in ((0, 70), (70, 140), (140, 200)):
        dedup(_avis(spark, lo, hi), lo // 70)
    assert _kept(dedup, spark) == _batch_owners(spark, 200)
    # registry and output agree row-for-row on ownership
    state = {
        (r.doc_id, r.frame_idx)
        for r in dedup.read_state(spark).collect()
    }
    assert state == _kept(dedup, spark)


def test_replay_and_redelivery_are_noops(spark, tmp_path):
    dedup = IncrementalFrameDedup(
        str(tmp_path / "state"), str(tmp_path / "out")
    )
    dedup(_avis(spark, 0, 70), 0)
    before = _kept(dedup, spark)
    n_state = dedup.read_state(spark).count()
    # same batch id: watermark skips entirely
    dedup(_avis(spark, 0, 70), 0)
    assert dedup.read_state(spark).count() == n_state
    # redelivered docs in a LATER batch: the seen guard drops them, no
    # frame flips owner and no output row duplicates
    dedup(_avis(spark, 0, 30), 1)
    assert _kept(dedup, spark) == before
    assert dedup.read_state(spark).count() == n_state


def test_mid_batch_crash_replay_idempotent(spark, tmp_path):
    dedup = IncrementalFrameDedup(
        str(tmp_path / "state"), str(tmp_path / "out")
    )
    dedup(_avis(spark, 0, 70), 0)
    dedup(_avis(spark, 70, 140), 1)
    done = _kept(dedup, spark)
    # crash AFTER batch 1's writes, BEFORE the mark: a fresh kernel
    # whose watermark believes only batch 0 landed re-runs batch 1 —
    # the per-wave overwrites must reproduce identical state/output
    crashed = IncrementalFrameDedup(
        str(tmp_path / "state"), str(tmp_path / "out")
    )
    crashed._watermark.mark(0)
    crashed(_avis(spark, 70, 140), 1)
    assert _kept(crashed, spark) == done
    ids = crashed.read_state(spark)
    assert ids.count() == ids.distinct().count()


def test_compaction_and_bloom_path_equal(spark, tmp_path):
    """Mid-stream compact() coarsens waves without changing results,
    and the Bloom-probed twin (min_waves=1) owns the identical frame
    set as the gated default."""
    plain = IncrementalFrameDedup(
        str(tmp_path / "p" / "state"), str(tmp_path / "p" / "out")
    )
    probed = IncrementalFrameDedup(
        str(tmp_path / "b" / "state"), str(tmp_path / "b" / "out"),
        bloom_min_waves=1,
    )
    for d in (plain, probed):
        d(_avis(spark, 0, 70), 0)
        d(_avis(spark, 70, 140), 1)
        if d is plain:
            files_after = d.compact(spark)
            assert files_after >= 1
            waves = {
                n
                for n in os.listdir(d.state_path)
                if n.startswith("w=")
            }
            assert waves == {"w=-1"}
        d(_avis(spark, 140, 200), 2)
    assert _kept(plain, spark) == _kept(probed, spark) == _batch_owners(
        spark, 200
    )
    assert probed.probe_metrics, "min_waves=1 must probe"


def test_non_avi_payloads_and_empty_batches(spark, tmp_path):
    dedup = IncrementalFrameDedup(
        str(tmp_path / "state"), str(tmp_path / "out")
    )
    junk = spark.createDataFrame(
        [(1, bytearray(b"not a riff container"))],
        "doc_id long, payload binary",
    )
    dedup(junk, 0)  # zero decodable frames: valid empty output wave
    assert dedup.read_kept(spark).count() == 0
    dedup(_avis(spark, 0, 40), 1)
    assert len(_kept(dedup, spark)) > 0


def test_frame_overcap_matches_driver_path(spark, tmp_path):
    """Over-``probe_cap`` frame dedup equals the driver-path twin (the
    frame kernel's mirror of tests/test_bloom_distributed.py, VERDICT
    r9 item 1): with the cap forced below every wave's key count the
    bitmap build + probe decision move executor-side, sidecars still
    appear, pruning still fires, and the owned frame set is identical."""
    mk = lambda sub, **kw: IncrementalFrameDedup(  # noqa: E731
        str(tmp_path / sub / "state"), str(tmp_path / sub / "out"),
        bloom_min_waves=1, **kw,
    )
    fast, slow = mk("fast"), mk("slow", probe_cap=10)
    assert slow._bloom.probe_cap == 10
    for d in (fast, slow):
        d(_avis(spark, 0, 70), 0)
        d(_avis(spark, 70, 140), 1)
        d(_avis(spark, 140, 200), 2)
    assert slow._bloom.overcap_fallbacks > 0
    assert fast._bloom.overcap_fallbacks == 0
    assert _kept(slow, spark) == _kept(fast, spark) == _batch_owners(
        spark, 200
    )
    # probe decisions line up wave for wave
    assert [(m.batch_id, m.waves_total, m.waves_scanned)
            for m in slow.probe_metrics] == \
           [(m.batch_id, m.waves_total, m.waves_scanned)
            for m in fast.probe_metrics]
    assert slow.probe_metrics, "min_waves=1 must probe"
