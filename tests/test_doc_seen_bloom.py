"""DocSeenGuard: per-wave doc-id Bloom sidecars behind the dedup
twins' redelivery guard (VERDICT r10 item 2). Pins the contract that
makes the pruning safe — NO FALSE NEGATIVES (a seen doc can never slip
past the guard, so redelivery stays a no-op with pruning active) — and
the contract that makes it worth having: a disjoint batch prunes EVERY
prior wave (the seen scan reads nothing), including across a
compaction's bitmap OR-merge."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.plans.common import t
from beavers_spark.streaming import IncrementalChunkDedup
from beavers_spark.streaming.maintenance import (
    DOC_BLOOM_SIDECAR,
    DocSeenGuard,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, lo, hi):
    return (
        t(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )


def _guard_unit(spark, tmp_path):
    """A DocSeenGuard over a hand-written wave-partitioned table."""
    state = str(tmp_path / "state")
    g = DocSeenGuard(state, m_bits=1 << 16, min_waves=0)
    for w, ids in ((0, [1, 2, 3]), (1, [10, 11])):
        spark.createDataFrame(
            [(i,) for i in ids], "doc_id long"
        ).write.mode("overwrite").parquet(f"{state}/w={w}")
        g.save_wave(spark, f"{state}/w={w}")
    return state, g


def test_guard_prunes_disjoint_and_never_misses_seen(spark, tmp_path):
    state, g = _guard_unit(spark, tmp_path)
    import os

    assert os.path.exists(f"{state}/w=0/{DOC_BLOOM_SIDECAR}")

    # disjoint batch: every wave pruned, seen is None (skip anti-join)
    batch = spark.createDataFrame([(100,), (200,)], "doc_id long")
    assert g.pruned_seen(spark, batch, 2, "doc_id") is None
    assert g.probe_metrics[-1].waves_scanned == 0
    assert g.probe_metrics[-1].waves_total == 2

    # NO FALSE NEGATIVES: every seen id must reach the returned frame,
    # whichever single wave holds it
    for doc in (1, 2, 3, 10, 11):
        b = spark.createDataFrame([(doc,)], "doc_id long")
        seen = g.pruned_seen(spark, b, 2, "doc_id")
        assert seen is not None
        got = {r.doc_id for r in seen.collect()}
        assert doc in got, f"seen doc {doc} slipped past the guard"

    # a redelivery of wave 1 only must not scan wave 0 (Bloom-exact on
    # this tiny corpus: 5 keys in a 2^16 bitmap)
    b1 = spark.createDataFrame([(10,), (11,)], "doc_id long")
    seen = g.pruned_seen(spark, b1, 2, "doc_id")
    assert g.probe_metrics[-1].waves_scanned == 1
    assert {r.doc_id for r in seen.collect()} == {10, 11}


def test_guard_excludes_own_half_committed_wave(spark, tmp_path):
    state, g = _guard_unit(spark, tmp_path)
    # replaying batch 1: its own wave must not count as "seen"
    b1 = spark.createDataFrame([(10,), (11,)], "doc_id long")
    seen = g.pruned_seen(spark, b1, 1, "doc_id")
    assert seen is None or not seen.collect()


def test_kernel_redelivery_noop_with_pruning_active(spark, tmp_path):
    """End to end on a real kernel with the probe FORCED on
    (bloom_min_waves=0): output equals the no-pruning baseline, a
    redelivered wave is a no-op, and the disjoint waves were pruned."""
    kern = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5, bloom_min_waves=0,
    )
    waves = ((0, 70), (70, 140), (140, 200))
    for i, (lo, hi) in enumerate(waves):
        kern(_docs(spark, lo, hi), i)
    before = {
        (r.doc_id, r.clean_text)
        for r in kern.read_kept(spark).collect()
    }
    # ascending disjoint ingest: every guard probe after wave 0 should
    # have pruned ALL prior waves
    assert kern._doc_seen.probe_metrics, "doc-seen probe never ran"
    assert all(
        m.waves_scanned == 0 for m in kern._doc_seen.probe_metrics
    )
    # redeliver wave 1 under a new batch id: pruned to exactly the
    # wave(s) holding those docs, and the output is unchanged
    kern(_docs(spark, 70, 140), 3)
    assert {
        (r.doc_id, r.clean_text)
        for r in kern.read_kept(spark).collect()
    } == before
    m = kern._doc_seen.probe_metrics[-1]
    assert 1 <= m.waves_scanned <= m.waves_total


def test_guard_survives_compaction(spark, tmp_path):
    """compact() OR-merges the per-wave doc bitmaps into w=-1: the
    redelivery guard still drops every previously-seen doc, and a
    disjoint batch still prunes the compacted wave."""
    kern = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5, bloom_min_waves=0,
    )
    kern(_docs(spark, 0, 70), 0)
    kern(_docs(spark, 70, 140), 1)
    before = {
        (r.doc_id, r.clean_text)
        for r in kern.read_kept(spark).collect()
    }
    kern.compact(spark)
    import os

    assert os.path.exists(
        os.path.join(str(tmp_path / "state"), "w=-1", DOC_BLOOM_SIDECAR)
    )
    # redelivery across the compaction boundary: still a no-op
    kern(_docs(spark, 0, 140), 2)
    assert {
        (r.doc_id, r.clean_text)
        for r in kern.read_kept(spark).collect()
    } == before
    # disjoint continuation: the merged bitmap still prunes
    kern(_docs(spark, 140, 200), 3)
    assert kern._doc_seen.probe_metrics[-1].waves_scanned == 0
