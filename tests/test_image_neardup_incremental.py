"""IncrementalImageNearDedup: the image instantiation of the frame
near-dup kernel — per-image sampled aHashes through the inherited
wave/band/Bloom machinery. The union of per-wave pairs must equal the
batch banded-Hamming pairs over the accumulated corpus under in-order
arrival, with hostile payloads dropped and redelivery a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.plans.llmops import _ppm_dims, _ppm_pixels
from beavers_spark.streaming import IncrementalImageNearDedup

SF_DIR = "/root/testdata/sf0.001"


def _ppms(spark, sf_dir, lo, hi):
    from beavers_spark.plans.common import t

    docs = t(spark, sf_dir, "documents").filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )
    w, h = _ppm_dims()
    return docs.select("doc_id", _ppm_pixels(w, h).alias("payload"))


def _batch_pairs(spark, hi):
    """Batch-side truth: the image_neardup plan's code path over the
    accumulated corpus. UNCAPPED — exact pair-set equality with the
    incremental union only holds without a bucket cap (a capped
    registry keeps per-WAVE anchors, so cross-batch probes can emit
    pairs a single-batch chain misses; capped runs are
    verified-subset, pinned by the frame twin's capped test)."""
    from beavers_spark.functions.dedup import hamming_pairs
    from beavers_spark.functions.multimodal import ppm_ahash

    sig = ppm_ahash(_ppms(spark, SF_DIR, 0, hi), "payload").select(
        "doc_id", "ahash"
    )
    return {
        (r.doc_id1, r.doc_id2, r.hamming)
        for r in hamming_pairs(
            sig, "doc_id", "ahash", 64, 3
        ).collect()
    }


def _pairs(nd, spark):
    got = set()
    for r in (
        nd.read_pairs(spark).filter(F.col("hamming").isNotNull()).collect()
    ):
        assert r.frame1 == 0 and r.frame2 == 0
        got.add((r.doc1, r.doc2, r.hamming))
    return got


def test_incremental_equals_batch_pairs(spark, tmp_path):
    # the generator guarantees exact-duplicate images at id delta 2304
    # = lcm(pixel period 256, dims period 576) — sf0.001 has 500 docs,
    # under one period, so near-dups here come from hash coincidences
    # plus the duplicate classes the strided sampling creates at
    # smaller deltas; assert parity, not a specific count
    nd = IncrementalImageNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs")
    )
    for i, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 500))):
        nd(_ppms(spark, SF_DIR, lo, hi), i)
    got = _pairs(nd, spark)
    want = _batch_pairs(spark, 500)
    assert got == want


def test_hostile_payloads_dropped_and_redelivery_noop(spark, tmp_path):
    nd = IncrementalImageNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"), bucket_cap=8
    )
    nd(_ppms(spark, SF_DIR, 0, 300), 0)
    before = _pairs(nd, spark)
    # a wave of pure junk: every payload hashes NULL -> empty sig wave,
    # valid empty pairs wave, no state corruption
    junk = spark.createDataFrame(
        [(10_000, bytearray(b"not a ppm")), (10_001, None)],
        "doc_id long, payload binary",
    )
    nd(junk, 1)
    assert _pairs(nd, spark) == before
    # full redelivery of wave 0 under a new id: anti-joined to nothing
    nd(_ppms(spark, SF_DIR, 0, 300), 2)
    assert _pairs(nd, spark) == before


def test_read_doc_pairs_is_full_coverage_doc_verdict(spark, tmp_path):
    """One image = one document in the corpus model (VERDICT r11
    item 7): the inherited read_doc_pairs must pass every image pair
    through as a doc verdict with shared1 = shared2 = 1 at coverage
    1.0, for ANY min_shared_frac — no pair may be dropped or
    double-counted by the rollup."""
    nd = IncrementalImageNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs")
    )
    for i, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 500))):
        nd(_ppms(spark, SF_DIR, lo, hi), i)
    pairs = {
        (r.doc1, r.doc2)
        for r in nd.read_pairs(spark)
        .filter(F.col("hamming").isNotNull())
        .collect()
    }
    assert pairs
    docs = {
        (r.doc1, r.doc2): (r.shared1, r.shared2, r.shared_frac)
        for r in nd.read_doc_pairs(spark, min_shared_frac=1.0).collect()
    }
    assert set(docs) == pairs
    assert all(v == (1, 1, 1.0) for v in docs.values())
