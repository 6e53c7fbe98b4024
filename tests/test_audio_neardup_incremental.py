"""IncrementalAudioNearDedup: the audio instantiation of the frame
near-dup kernel — whole-track energy-envelope fingerprints through the
inherited wave/band/Bloom machinery. The union of per-wave pairs must
equal the batch banded-Hamming pairs over the accumulated corpus under
in-order arrival, with redelivery no-ops and capped twins verified."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.plans.llmops import _synth_neardup_wavs
from beavers_spark.streaming import IncrementalAudioNearDedup

SF_DIR = "/root/testdata/sf0.001"
SEG = 16  # 64 segments of 16 samples — the batch plans' resolution


def _wavs(spark, lo, hi):
    return _synth_neardup_wavs(spark, SF_DIR).filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def _batch_pairs(spark, hi, bucket_cap=None):
    """Batch-side truth: hamming_pairs over the full corpus's envelope
    fingerprints (the audio_neardup plan's code path, kernel knobs)."""
    from beavers_spark.functions.dedup import hamming_pairs
    from beavers_spark.functions.multimodal import (
        wav_envelope_fingerprint,
        wav_segment_stats,
    )

    segs = wav_segment_stats(_wavs(spark, 0, hi), "payload", seg_samples=SEG)
    sig = wav_envelope_fingerprint(segs)
    return {
        (r.doc_id1, r.doc_id2, r.hamming)
        for r in hamming_pairs(
            sig, "doc_id", "afp", 64, 3, bucket_cap=bucket_cap
        ).collect()
    }


def _pairs(nd, spark):
    got = set()
    for r in (
        nd.read_pairs(spark).filter(F.col("hamming").isNotNull()).collect()
    ):
        # whole-track signatures: frame slots pinned to 0
        assert r.frame1 == 0 and r.frame2 == 0
        got.add((r.doc1, r.doc2, r.hamming))
    return got


def _feed(nd, spark, waves=((0, 70), (70, 140), (140, 200))):
    for i, (lo, hi) in enumerate(waves):
        nd(_wavs(spark, lo, hi), i)


def test_incremental_equals_batch_pairs(spark, tmp_path):
    nd = IncrementalAudioNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"), seg_samples=SEG
    )
    _feed(nd, spark)
    got = _pairs(nd, spark)
    want = _batch_pairs(spark, 200)
    assert got == want
    assert want, "generator corpus must contain near-dup tracks"
    # same-group docs with distinct flipped segments sit at hamming 2
    assert any(h == 2 for *_ignore, h in got)


def test_redelivery_is_noop(spark, tmp_path):
    nd = IncrementalAudioNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"), seg_samples=SEG
    )
    _feed(nd, spark)
    before = _pairs(nd, spark)
    # replay wave 1's batch under a NEW batch id: every doc already in
    # state, so the anti-join drains it to an empty (pairs-only) wave
    nd(_wavs(spark, 70, 140), 3)
    assert _pairs(nd, spark) == before


def test_capped_twin_equals_capped_batch(spark, tmp_path):
    # the audio corpus floods band buckets by construction (same-group
    # docs share 3 of 4 bands), so cap semantics are exercised
    nd = IncrementalAudioNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"),
        seg_samples=SEG, bucket_cap=8,
    )
    # single wave: capped within-batch pairs == capped batch plan
    nd(_wavs(spark, 0, 200), 0)
    got = _pairs(nd, spark)
    want = _batch_pairs(spark, 200, bucket_cap=8)
    assert got == want
    # every capped pair is verified: true hamming within budget
    assert all(h <= 3 for *_ignore, h in got)


def test_short_tracks_of_different_durations_do_not_pair(spark, tmp_path):
    """ADVICE r10: a track with fewer than 64 segments leaves its upper
    fingerprint bits structurally zero, so two FLAT short tracks of
    different durations both fingerprint to afp=0 and would spuriously
    band-match on the shared zeros. The duration class least(nseg, 64)
    carried in the kernel's n_bytes slot must separate them, while
    same-duration short tracks still pair."""
    import struct

    from beavers_spark.functions.multimodal import synth_wav

    def flat(doc_id, nseg):
        # constant amplitude: no segment peak beats the mean -> afp 0
        data = struct.pack("<h", 500) * (SEG * nseg)
        return spark.range(1).select(
            F.lit(doc_id).cast("long").alias("doc_id"),
            synth_wav(
                F.lit(data), F.lit(1), F.lit(16000), F.lit(16)
            ).alias("payload"),
        )

    batch = flat(0, 10).unionByName(flat(1, 20)).unionByName(flat(2, 10))
    nd = IncrementalAudioNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"), seg_samples=SEG
    )
    nd(batch, 0)
    got = {(d1, d2) for d1, _f1, d2, _f2, _h in (
        tuple(r) for r in nd.read_pairs(spark).collect()
    )}
    assert got == {(0, 2)}  # same 10-segment class pairs at hamming 0


def test_codec_auto_pairs_compressed_with_pcm_twin(spark, tmp_path):
    """codec='auto': an IMA ADPCM track and a PCM16 track holding the
    SAME samples must fingerprint identically through the transcode
    path and pair at hamming 0 — and the transcode posture must be
    recorded in the layout (a later plain-PCM restart on the same
    state fails loudly)."""
    import struct

    import numpy as np
    import pytest

    from beavers_spark.functions.multimodal import (
        _IMA_INDEX_ADJ,
        _IMA_STEPS,
        _pcm16_mono_wav,
    )

    rng = np.random.default_rng(11)
    rows = []
    for doc in range(4):
        pred = int(rng.integers(-2000, 2000))
        idx = int(rng.integers(0, 60))
        nibs = [int(x) for x in rng.integers(0, 16, 256)]
        packed = bytes(
            nibs[2 * i] | (nibs[2 * i + 1] << 4) for i in range(128)
        )
        data = struct.pack("<hBB", pred, idx, 0) + packed
        hdr = (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
            + struct.pack(
                "<IHHIIHH", 16, 17, 1, 8000, 8000, len(data), 4
            )
            + b"data" + struct.pack("<I", len(data))
        )
        rows.append((doc * 2, bytearray(hdr + data)))  # compressed
        # the PCM16 twin: the decoded sample stream, independently
        # recomputed by the reference recursion
        samples, p, ix = [pred], pred, idx
        for nib in nibs:
            step = _IMA_STEPS[ix]
            diff = step >> 3
            if nib & 1:
                diff += step >> 2
            if nib & 2:
                diff += step >> 1
            if nib & 4:
                diff += step
            p = max(-32768, min(32767, p - diff if nib & 8 else p + diff))
            samples.append(p)
            ix = max(0, min(88, ix + _IMA_INDEX_ADJ[nib]))
        rows.append(
            (
                doc * 2 + 1,
                bytearray(
                    _pcm16_mono_wav(
                        np.array(samples, "<i2").tobytes(), 8000
                    )
                ),
            )
        )
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    nd = IncrementalAudioNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"),
        seg_samples=4, codec="auto",
    )
    nd(df.filter(F.col("doc_id") % 2 == 0), 0)  # compressed wave
    nd(df.filter(F.col("doc_id") % 2 == 1), 1)  # PCM twins
    got = {
        (r.doc1, r.doc2, r.hamming)
        for r in nd.read_pairs(spark).collect()
    }
    want = {(2 * d, 2 * d + 1, 0) for d in range(4)}
    assert want <= got  # every cross-codec twin pairs at hamming 0
    # posture is layout-pinned: plain-PCM kernel refuses this state
    plain = IncrementalAudioNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"), seg_samples=4
    )
    with pytest.raises(ValueError, match="layout mismatch"):
        plain(df.limit(1), 2)
