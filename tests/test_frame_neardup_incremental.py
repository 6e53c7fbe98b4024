"""IncrementalFrameNearDedup: the union of per-wave perceptual pairs
must equal the batch banded-Hamming pairs on the accumulated corpus
under in-order arrival, with redelivery/replay no-ops, Bloom-probed /
over-cap / compacted twins all emitting the identical pair set."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.plans.llmops import _synth_frame_avis
from beavers_spark.streaming import IncrementalFrameNearDedup

SF_DIR = "/root/testdata/sf0.001"


def _avis(spark, lo, hi):
    return _synth_frame_avis(spark, SF_DIR).filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def _batch_pairs(spark, hi, bucket_cap=None):
    """The batch-side truth: hamming_pairs over the full corpus's
    frame aHashes (same knobs as the kernel defaults)."""
    from beavers_spark.functions.dedup import hamming_pairs
    from beavers_spark.functions.multimodal import avi_frames

    sig = avi_frames(_avis(spark, 0, hi), "payload").select(
        F.struct("doc_id", "frame_idx").alias("fk"), "ahash", "n_bytes"
    )
    return {
        (r.doc1, r.frame1, r.doc2, r.frame2, r.hamming)
        for r in hamming_pairs(
            sig, "fk", "ahash", 64, 3,
            bucket_cap=bucket_cap, group_cols=("n_bytes",),
        )
        .select(
            F.col("fk1.doc_id").alias("doc1"),
            F.col("fk1.frame_idx").alias("frame1"),
            F.col("fk2.doc_id").alias("doc2"),
            F.col("fk2.frame_idx").alias("frame2"),
            "hamming",
        )
        .collect()
    }


def _pairs(nd, spark):
    return {
        (r.doc1, r.frame1, r.doc2, r.frame2, r.hamming)
        for r in nd.read_pairs(spark)
        .filter(F.col("hamming").isNotNull())
        .collect()
    }


def _feed(nd, spark, waves=((0, 70), (70, 140), (140, 200))):
    for i, (lo, hi) in enumerate(waves):
        nd(_avis(spark, lo, hi), i)


def test_incremental_equals_batch_pairs(spark, tmp_path):
    nd = IncrementalFrameNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs")
    )
    _feed(nd, spark)
    got = _pairs(nd, spark)
    want = _batch_pairs(spark, 200)
    assert got == want
    assert want, "generator corpus must contain near-dup frames"
    # the perceptual tier strictly contains the exact tier: every
    # duplicate content class contributes hamming-0 pairs
    assert any(h == 0 for *_ignore, h in got)


def test_replay_and_redelivery_are_noops(spark, tmp_path):
    nd = IncrementalFrameNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs")
    )
    _feed(nd, spark)
    before = _pairs(nd, spark)
    nd(_avis(spark, 0, 70), 0)  # replay: watermark skip
    # redelivery under a NEW batch id: anti-joined, no duplicate pairs
    nd(_avis(spark, 0, 70), 9)
    assert _pairs(nd, spark) == before


def test_probed_and_compacted_twins_match(spark, tmp_path):
    plain = IncrementalFrameNearDedup(
        str(tmp_path / "p" / "state"), str(tmp_path / "p" / "pairs")
    )
    probed = IncrementalFrameNearDedup(
        str(tmp_path / "b" / "state"), str(tmp_path / "b" / "pairs"),
        bloom_min_waves=1,
    )
    for nd in (plain, probed):
        nd(_avis(spark, 0, 70), 0)
        nd(_avis(spark, 70, 140), 1)
        if nd is plain:
            assert plain.compact(spark) >= 1
        nd(_avis(spark, 140, 200), 2)
    assert _pairs(plain, spark) == _pairs(probed, spark) == _batch_pairs(
        spark, 200
    )
    assert probed.probe_metrics, "min_waves=1 must probe"


def test_overcap_matches_driver_path(spark, tmp_path):
    fast = IncrementalFrameNearDedup(
        str(tmp_path / "f" / "state"), str(tmp_path / "f" / "pairs"),
        bloom_min_waves=1,
    )
    slow = IncrementalFrameNearDedup(
        str(tmp_path / "s" / "state"), str(tmp_path / "s" / "pairs"),
        bloom_min_waves=1, probe_cap=10,
    )
    for nd in (fast, slow):
        _feed(nd, spark, waves=((0, 70), (70, 140)))
    assert slow._bloom.overcap_fallbacks > 0
    assert fast._bloom.overcap_fallbacks == 0
    assert _pairs(slow, spark) == _pairs(fast, spark)
    assert [(m.batch_id, m.waves_total, m.waves_scanned)
            for m in slow.probe_metrics] == \
           [(m.batch_id, m.waves_total, m.waves_scanned)
            for m in fast.probe_metrics]


def test_capped_is_verified_subset(spark, tmp_path):
    capped = IncrementalFrameNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"), bucket_cap=4
    )
    _feed(capped, spark)
    got = _pairs(capped, spark)
    assert got, "the cap must not empty the pair set"
    # every emitted pair is a true near-dup (the verify survives the
    # cap) even where candidate recall is reduced
    want = _batch_pairs(spark, 200)
    assert got <= want


def test_junk_and_empty_batches(spark, tmp_path):
    nd = IncrementalFrameNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs")
    )
    junk = spark.createDataFrame(
        [(1, bytearray(b"not a riff container"))],
        "doc_id long, payload binary",
    )
    nd(junk, 0)  # no decodable frames -> empty pairs wave, no crash
    assert nd.read_pairs(spark).count() == 0
    nd(_avis(spark, 0, 70), 1)
    assert _pairs(nd, spark) == _batch_pairs(spark, 70)


def test_capped_redelivery_of_fully_evicted_doc_is_noop(spark, tmp_path):
    """The redelivery guard reads the FULL sig table, not the capped
    band registry: with a tiny cap most docs lose every band row to
    anchor eviction (the natural corpus has only 256*5 frame content
    classes), and a registry-based guard would re-admit them on
    redelivery and emit duplicate pairs."""
    nd = IncrementalFrameNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"), bucket_cap=2
    )
    nd(_avis(spark, 0, 70), 0)
    before = _pairs(nd, spark)
    # sanity: the cap really evicted docs from the band registry
    reg_docs = {
        r.doc_id
        for r in spark.read.parquet(nd.bands_path)
        .select("doc_id").distinct().collect()
    }
    sig_docs = {
        r.doc_id for r in nd.read_state(spark)
        .select("doc_id").distinct().collect()
    }
    assert reg_docs < sig_docs, "cap=2 must evict some docs' band rows"
    nd(_avis(spark, 0, 70), 1)  # full redelivery under a NEW batch id
    assert _pairs(nd, spark) == before


def test_read_doc_pairs_matches_batch_rollup(spark, tmp_path):
    """read_doc_pairs: the video_neardup_docs rollup semantics over
    the incremental state — distinct matched frames per side, verdict
    at max-coverage >= 1/2 — must equal the same rollup computed from
    the batch pair set + true per-doc frame counts."""
    from collections import defaultdict

    from beavers_spark.functions.multimodal import avi_frames

    nd = IncrementalFrameNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs")
    )
    _feed(nd, spark)

    # independent model: batch pairs (uncapped, same knobs) + real
    # frame counts, rolled up in plain Python
    nf = {
        r.doc_id: r.n
        for r in avi_frames(_avis(spark, 0, 200), "payload")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    shared1 = defaultdict(set)
    shared2 = defaultdict(set)
    for d1, f1, d2, f2, _h in _batch_pairs(spark, 200):
        if d1 == d2:
            continue
        shared1[(d1, d2)].add(f1)
        shared2[(d1, d2)].add(f2)
    want = {}
    for key in shared1:
        d1, d2 = key
        s1, s2 = len(shared1[key]), len(shared2[key])
        frac = max(s1 / nf[d1], s2 / nf[d2])
        if frac >= 0.5:
            want[key] = (s1, s2, round(frac, 6))
    got = {
        (r.doc1, r.doc2): (r.shared1, r.shared2, r.shared_frac)
        for r in nd.read_doc_pairs(spark).collect()
    }
    assert want and got == want
