"""IncrementalSubstringDedup: streaming span-level dedup against a
growing hash registry must equal the one-shot batch ``substring_dedup``
when waves arrive in ascending id order."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.curation import substring_dedup
from beavers_spark.plans.common import t
from beavers_spark.streaming import IncrementalSubstringDedup

SF_DIR = "/root/testdata/sf0.001"


def _range_set(df):
    return {
        (r.doc_id, r.span_start, r.span_end, r.n_dup_tokens)
        for r in df.collect()
    }


def _feed(spark, dedup, docs, waves):
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    bounds = [ids[int(len(ids) * i / waves)] for i in range(1, waves)]
    lo = None
    for i in range(waves):
        hi = bounds[i] if i < waves - 1 else None
        part = docs
        if lo is not None:
            part = part.filter(F.col("doc_id") >= lo)
        if hi is not None:
            part = part.filter(F.col("doc_id") < hi)
        dedup(part, i)
        lo = hi


def test_incremental_equals_batch_substring_dedup(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    dedup = IncrementalSubstringDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5,
    )
    _feed(spark, dedup, docs, waves=3)
    got = _range_set(dedup.read_dup_ranges(spark))
    expected = _range_set(substring_dedup(docs, "text", "doc_id", k=5))
    assert expected and got == expected
    # the registry owns each span hash exactly once
    state = dedup.read_state(spark)
    assert state.select("h").distinct().count() == state.count()
    # wave metrics recorded per applied batch
    assert [m.batch_id for m in dedup.metrics] == [0, 1, 2]
    assert all(m.bytes > 0 for m in dedup.metrics)


def test_cross_batch_spans_and_replay_idempotence(spark, tmp_path):
    dedup = IncrementalSubstringDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=3,
    )
    wave0 = spark.createDataFrame(
        [(1, "a b c d e f g h i j")], "doc_id long, text string"
    )
    # doc 2 copies doc 1's tokens 2..7 across the BATCH boundary; doc 3
    # is a full cross-batch copy
    wave1 = spark.createDataFrame(
        [(2, "z c d e f g h z2 z3 z4"), (3, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    dedup(wave0, 0)
    dedup(wave1, 1)
    got = _range_set(dedup.read_dup_ranges(spark))
    assert got == {(2, 1, 7, 6), (3, 0, 10, 10)}

    # replayed batch id: watermark skips, output unchanged
    dedup(wave1, 1)
    assert _range_set(dedup.read_dup_ranges(spark)) == got

    # redelivery of an already-seen doc in a LATER batch: anti-joined
    # away, no duplicate ranges, no re-owned spans
    dedup(wave1, 2)
    assert _range_set(dedup.read_dup_ranges(spark)) == got
    state = dedup.read_state(spark)
    assert state.select("h").distinct().count() == state.count()


def test_compact_preserves_results(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    dedup = IncrementalSubstringDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5,
    )
    _feed(spark, dedup, docs, waves=2)
    before = _range_set(dedup.read_dup_ranges(spark))
    state_before = dedup.read_state(spark).count()
    dedup.compact(spark)
    assert _range_set(dedup.read_dup_ranges(spark)) == before
    assert dedup.read_state(spark).count() == state_before
    # new waves keep composing after compaction
    extra = spark.createDataFrame(
        [(99991, "entirely novel tokens qq ww ee rr tt yy uu")],
        "doc_id long, text string",
    )
    dedup(extra, 5)
    assert _range_set(dedup.read_dup_ranges(spark)) == before


def test_streaming_foreachbatch_end_to_end(spark, tmp_path):
    """Drive the kernel through a real Structured Streaming file source
    (availableNow, one file per trigger), mirroring the chunk twin's
    e2e test: streamed == one-shot batch for in-order waves."""
    import os

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(120)
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    bounds = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    in_dir = str(tmp_path / "in")
    parts = [
        docs.filter(F.col("doc_id") < bounds[0]),
        docs.filter(
            (F.col("doc_id") >= bounds[0]) & (F.col("doc_id") < bounds[1])
        ),
        docs.filter(F.col("doc_id") >= bounds[1]),
    ]
    for i, part in enumerate(parts):
        p = os.path.join(in_dir, f"wave{i}")
        part.coalesce(1).write.parquet(p)
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(
                    os.path.join(root, f),
                    (1_700_000_000 + i, 1_700_000_000 + i),
                )
    dedup = IncrementalSubstringDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5,
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(dedup)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = _range_set(dedup.read_dup_ranges(spark))
    expected = _range_set(substring_dedup(docs, "text", "doc_id", k=5))
    assert expected and got == expected


def test_wave_bloom_sidecars_prune_disjoint_waves(spark, tmp_path):
    import os

    import numpy as np

    from beavers_spark.streaming.maintenance import (
        BLOOM_SIDECAR,
        bloom_may_contain_any,
    )

    dedup = IncrementalSubstringDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=3,
        bloom_min_waves=0,  # exercise the sidecar path from wave 0
    )
    # wave vocabularies are disjoint: wave 0's bitmap must reject every
    # wave-1 hash, so wave 1's registry probe scans zero prior waves
    dedup(spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"), 0)
    dedup(spark.createDataFrame(
        [(2, "q r s t u v")], "doc_id long, text string"), 1)

    assert os.path.exists(tmp_path / "state" / "w=0" / BLOOM_SIDECAR)
    assert os.path.exists(tmp_path / "state" / "w=1" / BLOOM_SIDECAR)
    w1_hashes = np.asarray(
        [r.h for r in spark.read.parquet(
            str(tmp_path / "state" / "w=1")).select("h").collect()],
        dtype=np.int64,
    )
    b0 = dedup._bloom.bloom_for(0)
    assert b0 is not None and not bloom_may_contain_any(b0, w1_hashes)
    assert dedup._bloom.live_waves(w1_hashes, exclude=1) == []
    # probe accounting: wave 1 saw 1 prior wave and scanned 0 of it
    assert [(m.batch_id, m.waves_total, m.waves_scanned)
            for m in dedup.probe_metrics][0] == (1, 1, 0)

    # overlapping wave: wave 0 stays live and the cross-batch dup is
    # still caught through the pruned probe path
    dedup(spark.createDataFrame(
        [(3, "a b c d e f")], "doc_id long, text string"), 2)
    got = _range_set(dedup.read_dup_ranges(spark))
    assert (3, 0, 6, 6) in got

    # compaction ORs the wave bitmaps into the coalesced wave
    dedup.compact(spark)
    assert os.path.exists(tmp_path / "state" / "w=-1" / BLOOM_SIDECAR)
    assert dedup._bloom.live_waves(w1_hashes, exclude=None) == [-1]


def test_bloom_disabled_path_equal(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(100)
    on = IncrementalSubstringDedup(
        str(tmp_path / "s1"), str(tmp_path / "o1"),
        text_col="text", id_col="doc_id", k=5,
    )
    off = IncrementalSubstringDedup(
        str(tmp_path / "s2"), str(tmp_path / "o2"),
        text_col="text", id_col="doc_id", k=5, bloom_bits=None,
    )
    for d in (on, off):
        _feed(spark, d, docs, waves=2)
    assert _range_set(on.read_dup_ranges(spark)) == _range_set(
        off.read_dup_ranges(spark)
    )


def test_bloom_gating_and_lazy_backfill(spark, tmp_path):
    """Below ``bloom_min_waves`` no sidecar work runs (the per-batch
    collect is overhead when scanning a handful of waves is cheap);
    once the table crosses the threshold, sidecars for the gated-era
    waves are backfilled lazily and pruning turns on — with identical
    results throughout."""
    import os

    from beavers_spark.streaming.maintenance import BLOOM_SIDECAR

    dedup = IncrementalSubstringDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=3, bloom_min_waves=2,
    )
    dedup(spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"), 0)
    dedup(spark.createDataFrame(
        [(2, "q r s t u v")], "doc_id long, text string"), 1)
    # gated: no sidecars, no probe accounting
    assert not os.path.exists(tmp_path / "state" / "w=0" / BLOOM_SIDECAR)
    assert not os.path.exists(tmp_path / "state" / "w=1" / BLOOM_SIDECAR)
    assert dedup.probe_metrics == []

    # wave 2 sees 2 live waves -> probe activates, backfills w=0/w=1
    # sidecars from the registry's h column, and still catches the
    # cross-batch duplicate of wave 0's text
    dedup(spark.createDataFrame(
        [(3, "a b c d e f")], "doc_id long, text string"), 2)
    assert os.path.exists(tmp_path / "state" / "w=0" / BLOOM_SIDECAR)
    assert os.path.exists(tmp_path / "state" / "w=1" / BLOOM_SIDECAR)
    assert [(m.batch_id, m.waves_total) for m in dedup.probe_metrics] == [
        (2, 2)
    ]
    # disjoint wave 1 was pruned; only wave 0 scanned
    assert dedup.probe_metrics[0].waves_scanned == 1
    got = _range_set(dedup.read_dup_ranges(spark))
    assert (3, 0, 6, 6) in got


def test_default_posture_matches_batch(spark, tmp_path):
    """The r11 PRODUCTION defaults (``bloom_min_waves=0``,
    ``compact_every_waves=16``): sidecars are written as waves commit,
    the probe prunes from wave 1, and the result still equals the
    batch operator — the posture an operator gets without reading
    docs/concepts/state_kernels.md's defaults section."""
    import os

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(120)
    dedup = IncrementalSubstringDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5,
    )
    assert dedup.compact_every_waves == 16
    _feed(spark, dedup, docs, waves=3)
    from beavers_spark.streaming.maintenance import BLOOM_SIDECAR

    # default-on machinery: every committed wave carries its sidecar
    # and every post-wave-0 batch recorded a probe decision
    for w in (0, 1, 2):
        assert os.path.exists(
            tmp_path / "state" / f"w={w}" / BLOOM_SIDECAR
        )
    assert [m.batch_id for m in dedup.probe_metrics] == [1, 2]
    # r13 layout: b rides as a clustered data column — no bucket
    # directories under the waves
    assert not any(
        name.startswith("b=")
        for name in os.listdir(tmp_path / "state" / "w=0")
    )
    got = _range_set(dedup.read_dup_ranges(spark))
    expected = _range_set(substring_dedup(docs, "text", "doc_id", k=5))
    assert expected and got == expected
