"""IncrementalNearDedup: streaming near-dup detection against growing
corpus state must equal a one-shot batch MinHash-LSH over all input."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from beavers_spark.functions.dedup import minhash_lsh_pairs
from beavers_spark.plans.common import t
from beavers_spark.streaming import IncrementalNearDedup

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.2


def _pair_set(df):
    return {
        (r.doc1, r.doc2, r.est_jaccard, r.jaccard)
        for r in df.select("doc1", "doc2", "est_jaccard", "jaccard").collect()
    }


def test_incremental_equals_batch_minhash(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")

    # three arrival waves written as separate parquet files; mtimes pinned
    # so the file source replays them in a deterministic order
    in_dir = str(tmp_path / "in")
    for i in range(3):
        p = os.path.join(in_dir, f"wave{i}")
        docs.filter(F.col("doc_id") % 3 == i).coalesce(1).write.parquet(p)
        for root, _, files in os.walk(p):
            for f in files:
                os.utime(
                    os.path.join(root, f),
                    (1_700_000_000 + i, 1_700_000_000 + i),
                )

    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
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

    got = _pair_set(dedup.read_pairs(spark))
    expected = _pair_set(
        minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=THRESHOLD)
    )
    assert expected, "test corpus must contain near-duplicates"
    assert got == expected

    # every document with >=3 tokens is in state exactly once
    from beavers_spark.functions.text import tokens

    n_docs = docs.filter(F.size(tokens(F.col("text"))) >= 3).count()
    state = dedup.read_state(spark)
    assert state.select("doc_id").distinct().count() == state.count()
    assert state.count() == n_docs


def test_no_pair_emitted_twice_across_batches(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(200)
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    # drive the foreachBatch kernel directly: same docs split two ways
    dedup(docs.filter(F.col("doc_id") % 2 == 0), 0)
    dedup(docs.filter(F.col("doc_id") % 2 == 1), 1)
    pairs = dedup.read_pairs(spark)
    assert pairs.count() == pairs.select("doc1", "doc2").distinct().count()


def test_cross_batch_redelivery_is_ignored(spark, tmp_path):
    """A doc_id redelivered in a LATER batch (producer retry, re-ingest)
    must not create a (doc, doc) self-pair, a duplicate state row, or
    duplicated future pairs."""
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(120)
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)
    dedup(first, 0)
    baseline_state = dedup.read_state(spark).count()
    # batch 1 redelivers ALL of batch 0 alongside the genuinely new half
    dedup(first.unionByName(second), 1)
    # batch 2 is a full redelivery: nothing new at all
    dedup(docs, 2)

    pairs = dedup.read_pairs(spark)
    assert pairs.filter(F.col("doc1") == F.col("doc2")).count() == 0
    assert pairs.count() == pairs.select("doc1", "doc2").distinct().count()
    state = dedup.read_state(spark)
    assert state.select("doc_id").distinct().count() == state.count()
    assert state.count() >= baseline_state

    # and the result still equals the one-shot batch computation
    got = _pair_set(pairs)
    expected = _pair_set(
        minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=THRESHOLD)
    )
    assert got == expected


def test_replay_after_wave_written_before_mark(spark, tmp_path):
    """The crash window BatchWatermark documents: wave directory written,
    watermark NOT marked, batch replayed. The replayed batch must not
    anti-join against its own half-committed wave (which would empty it
    and overwrite the wave with nothing) — final state and pairs equal
    the crash-free run."""
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    first = docs.filter(F.col("doc_id") % 2 == 0)
    second = docs.filter(F.col("doc_id") % 2 == 1)

    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs"),
        text_col="text",
        id_col="doc_id",
        threshold=THRESHOLD,
    )
    dedup(first, 0)
    # simulate the crash: batch 1's wave is on disk but unmarked
    dedup(second, 1)
    os.remove(os.path.join(str(tmp_path / "state"), "_last_batch.json"))
    dedup._watermark.mark(0)
    # also forget the driver-side replay-pair guard the real restart has
    replay = IncrementalNearDedup(
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs2"),
        text_col="text",
        id_col="doc_id",
        threshold=THRESHOLD,
    )
    replay._watermark = dedup._watermark
    replay.pairs_path = str(tmp_path / "pairs")
    replay(second, 1)  # the replay

    state = replay.read_state(spark)
    # every second-half doc still has its state row (not emptied)
    assert state.count() == docs.count()
    assert state.select("doc_id").distinct().count() == state.count()
    got = _pair_set(replay.read_pairs(spark))
    expected = _pair_set(
        minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=THRESHOLD)
    )
    assert got == expected


def test_band_bloom_prunes_disjoint_waves(spark, tmp_path):
    import os

    import numpy as np

    from beavers_spark.functions.dedup import minhash_lsh_pairs
    from beavers_spark.streaming.dedup_incremental import _BAND_KEYS
    from beavers_spark.streaming.maintenance import BLOOM_SIDECAR

    dedup = IncrementalNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"),
        text_col="text", id_col="doc_id",
        bloom_min_waves=0,  # exercise the sidecar path from wave 0
    )
    # wave vocabularies are disjoint: wave 0's band bitmap must reject
    # every wave-1 band key, so wave 1 scans zero prior waves
    dedup(spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string"), 0)
    dedup(spark.createDataFrame(
        [(2, "one two three four five six seven")],
        "doc_id long, text string"), 1)
    assert os.path.exists(tmp_path / "state" / "w=0" / BLOOM_SIDECAR)
    from pyspark.sql import functions as F2
    from beavers_spark.functions.dedup import band_rows

    w1_bands = band_rows(
        spark.read.parquet(str(tmp_path / "state" / "w=1"))
    ).select(F2.xxhash64(*_BAND_KEYS).alias("bh"))
    w1_h = np.asarray([r.bh for r in w1_bands.collect()], dtype=np.int64)
    assert dedup._bloom.live_waves(w1_h, exclude=1) == []
    assert [(m.batch_id, m.waves_total, m.waves_scanned)
            for m in dedup.probe_metrics][0] == (1, 1, 0)

    # near-identical doc arriving later still pairs with wave 0 through
    # the pruned probe path
    dedup(spark.createDataFrame(
        [(3, "alpha beta gamma delta epsilon zeta eta")],
        "doc_id long, text string"), 2)
    pairs = {(r.doc1, r.doc2) for r in dedup.read_pairs(spark).collect()}
    assert (1, 3) in pairs

    # incremental result still equals the batch operator on the union
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta"),
            (2, "one two three four five six seven"),
            (3, "alpha beta gamma delta epsilon zeta eta"),
        ],
        "doc_id long, text string",
    )
    expected = {
        (r.doc1, r.doc2)
        for r in minhash_lsh_pairs(docs, "text", "doc_id", n=3).collect()
    }
    assert pairs == expected


def test_mid_batch_crash_replay_is_idempotent(spark, tmp_path):
    """A crash AFTER the wave's state + pairs writes but BEFORE the
    watermark mark replays the whole batch (foreachBatch redelivers the
    same batch_id). Both writes are per-wave overwrites, so the replay
    must change nothing — the old append-mode pairs table duplicated
    the batch's pairs on exactly this path."""
    import os

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(120)
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    dedup(docs.filter(F.col("doc_id") % 2 == 0), 0)
    dedup(docs.filter(F.col("doc_id") % 2 == 1), 1)
    before_pairs = sorted(
        (r.doc1, r.doc2) for r in dedup.read_pairs(spark).collect()
    )
    before_state = dedup.read_state(spark).count()

    # simulate the crash: the outputs of batch 1 are on disk but the
    # watermark was never advanced past batch 0
    os.remove(os.path.join(str(tmp_path / "state"), "_last_batch.json"))
    dedup._watermark.mark(0)
    dedup(docs.filter(F.col("doc_id") % 2 == 1), 1)

    assert sorted(
        (r.doc1, r.doc2) for r in dedup.read_pairs(spark).collect()
    ) == before_pairs
    assert dedup.read_state(spark).count() == before_state


def _mk_capped(tmp_path, cap, name="c"):
    return IncrementalNearDedup(
        state_path=str(tmp_path / f"state_{name}"),
        pairs_path=str(tmp_path / f"pairs_{name}"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
        bucket_cap=cap,
    )


def test_bucket_cap_bounds_cross_join_and_keeps_connectivity(spark, tmp_path):
    """A boilerplate mega-bucket arriving over several waves: capped mode
    joins new docs against at most bucket_cap anchors per wave instead
    of the whole historical bucket, and every member stays reachable."""
    boiler = "terms of service copyright all rights reserved contact us now"
    wave0 = spark.createDataFrame(
        [(i, boiler) for i in range(1, 5)], "doc_id long, text string"
    )
    wave1 = spark.createDataFrame(
        [(i, boiler) for i in range(5, 7)], "doc_id long, text string"
    )
    dedup = _mk_capped(tmp_path, cap=2)
    dedup(wave0, 0)
    dedup(wave1, 1)

    pairs = {(r.doc1, r.doc2) for r in dedup.read_pairs(spark).collect()}
    # wave 0: within-batch all-pairs (batch-bounded)
    wave0_pairs = {(a, b) for a in range(1, 5) for b in range(a + 1, 5)}
    # wave 1: 5,6 join wave 0's anchors {1, 2} ONLY, plus each other
    cross = {(1, 5), (2, 5), (1, 6), (2, 6), (5, 6)}
    assert pairs == wave0_pairs | cross
    # notably absent: (3,5), (4,5), (3,6), (4,6) — the capped fan-out

    # identical docs verify at 1.0, so no edge was dropped by verify
    assert all(
        r.jaccard == 1.0 for r in dedup.read_pairs(spark).collect()
    )
    # connectivity: one cluster spanning all six docs
    parent = {i: i for i in range(1, 7)}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent[find(a)] = find(b)
    assert len({find(i) for i in range(1, 7)}) == 1

    # anchors table: per wave, at most cap rows per band key
    anchors = spark.read.parquet(dedup.anchors_path)
    per_key = (
        anchors.groupBy("w", "band_id", "h0", "h1", "h2", "h3")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert per_key <= 2


def test_bucket_cap_parity_guard_refuses_uncapped_state(spark, tmp_path):
    """Enabling the cap against a pre-existing uncapped state table must
    fail loudly — mixed anchor semantics across waves would silently
    change which collisions are reachable — and rebuild_anchors must
    cure it by re-deriving the band registry under the new knobs. The
    band registry's _layout.json sidecar carries the refusal."""
    import pytest

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(40)
    plain = IncrementalNearDedup(
        state_path=str(tmp_path / "state_c"),
        pairs_path=str(tmp_path / "pairs_c"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    plain(docs, 0)

    capped = _mk_capped(tmp_path, cap=2)
    with pytest.raises(ValueError, match="layout mismatch"):
        capped(docs.limit(5), 1)
    capped.rebuild_anchors(spark)
    capped(docs.limit(5), 1)  # now runs


def test_missing_band_registry_auto_rebuilds(spark, tmp_path):
    """A state table whose band registry is lost (pre-band-table state,
    anchors deleted, or a crash mid-``rebuild_anchors`` — its
    rmtree-then-rewrite has no swap protection) SELF-HEALS: the anchors
    are a pure function of the stored signatures, so the next batch
    rebuilds them at entry instead of wedging the stream on an error
    until a manual call (ADVICE r8). The rebuilt registry must be
    load-bearing, not just present: a wave-1 near-dup of a wave-0
    document is only found through wave 0's rebuilt band rows."""
    import os
    import shutil

    text = " ".join(f"tok{j}" for j in range(12))
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state_m"),
        pairs_path=str(tmp_path / "pairs_m"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    dedup(
        spark.createDataFrame([(1, text)], "doc_id long, text string"), 0
    )
    shutil.rmtree(dedup.anchors_path)
    fresh = IncrementalNearDedup(
        state_path=str(tmp_path / "state_m"),
        pairs_path=str(tmp_path / "pairs_m"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    fresh(
        spark.createDataFrame([(2, text)], "doc_id long, text string"), 1
    )
    assert os.path.isdir(os.path.join(fresh.anchors_path, "w=0"))
    assert os.path.isdir(os.path.join(fresh.anchors_path, "w=1"))
    got = _pair_set(fresh.read_pairs(spark))
    assert (1, 2, 1.0, 1.0) in got


def test_band_registry_is_hash_bucket_partitioned(spark, tmp_path):
    """The band registry's waves carry b = pmod(bh, n_hash_buckets)
    bucket directories (the substring/chunk registries' layout), so the
    cross-batch probe partition-prunes untouched buckets, and the
    layout sidecar locks the modulus."""
    import json
    import os

    import pytest

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state_b"),
        pairs_path=str(tmp_path / "pairs_b"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
        n_hash_buckets=8,
    )
    dedup(docs, 0)
    assert any(
        name.startswith("b=")
        for name in os.listdir(os.path.join(dedup.anchors_path, "w=0"))
    )
    with open(os.path.join(dedup.anchors_path, "_layout.json")) as fh:
        assert json.load(fh)["n_hash_buckets"] == 8
    # a restart with a different modulus would prune with the wrong
    # b values — refused before any write
    other = IncrementalNearDedup(
        state_path=str(tmp_path / "state_b"),
        pairs_path=str(tmp_path / "pairs_b"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
        n_hash_buckets=32,
    )
    with pytest.raises(ValueError, match="n_hash_buckets"):
        other(docs.limit(5), 1)


def test_bucket_cap_compaction_reanchors(spark, tmp_path):
    """compact() coalesces state to w=-1 and must re-derive anchors for
    the merged wave; a post-compaction wave still links to the cluster."""
    boiler = "terms of service copyright all rights reserved contact us now"
    dedup = _mk_capped(tmp_path, cap=2)
    dedup(
        spark.createDataFrame(
            [(i, boiler) for i in (1, 2)], "doc_id long, text string"
        ),
        0,
    )
    dedup(
        spark.createDataFrame(
            [(i, boiler) for i in (3, 4)], "doc_id long, text string"
        ),
        1,
    )
    dedup.compact(spark)
    anchor_waves = {
        r.w
        for r in spark.read.parquet(dedup.anchors_path)
        .select("w")
        .distinct()
        .collect()
    }
    assert anchor_waves == {-1}
    # merged anchors = first-cap docs across the compacted corpus: {1, 2}
    dedup(
        spark.createDataFrame(
            [(9, boiler)], "doc_id long, text string"
        ),
        2,
    )
    pairs = {(r.doc1, r.doc2) for r in dedup.read_pairs(spark).collect()}
    assert {(1, 9), (2, 9)} <= pairs
    assert (3, 9) not in pairs and (4, 9) not in pairs


def test_bucket_cap_none_unchanged_vs_batch(spark, tmp_path):
    """Default (uncapped) kernel still equals the one-shot batch result
    after the capped-mode refactor of the prune/join block."""
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(90)
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state_u"),
        pairs_path=str(tmp_path / "pairs_u"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    dedup(docs.filter(F.col("doc_id") % 2 == 0), 0)
    dedup(docs.filter(F.col("doc_id") % 2 == 1), 1)
    got = _pair_set(dedup.read_pairs(spark))
    expected = _pair_set(
        minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=THRESHOLD)
    )
    assert got == expected


def test_pre_band_registry_anchors_point_to_rebuild(spark, tmp_path):
    """A round-5-style anchors table (wave data, no sidecar, no bh/b
    layout) must refuse with rebuild_anchors guidance — the generic
    'write the sidecar by hand' advice would pass validation and then
    crash the probe on the missing b column."""
    import os

    import pytest

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(30)
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state_p"),
        pairs_path=str(tmp_path / "pairs_p"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    # fabricate the legacy layout: wave data, no _layout.json
    os.makedirs(os.path.join(dedup.anchors_path, "w=0"))
    with open(
        os.path.join(dedup.anchors_path, "w=0", "part-0.parquet"), "wb"
    ) as fh:
        fh.write(b"\x00")
    with pytest.raises(ValueError, match="rebuild_anchors"):
        dedup(docs, 0)


def test_band_empty_prior_waves_skip_cross_probe(spark, tmp_path):
    """Leading batches whose every document is below the n-token
    shingle floor leave state waves (schema-bearing empty files) but
    band waves with NO data files (empty partitionBy write). A later
    real batch's cross probe must neither wedge on schema inference
    over the band registry nor miss pairs (ADVICE r7)."""
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(200)
    shorts = spark.createDataFrame(
        [(9_000_001, "one two"), (9_000_002, "x")], ["doc_id", "text"]
    )
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state_e"),
        pairs_path=str(tmp_path / "pairs_e"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    dedup(shorts, 0)  # zero-shingle wave: empty state + band-less band wave
    dedup(shorts.withColumn("doc_id", F.col("doc_id") + 10), 1)
    # prior waves 0,1 hold no b= bucket dirs — the probe guard must say so
    assert dedup._prior_band_waves_empty(batch_id=2, kept=None)
    dedup(docs.filter(F.col("doc_id") % 2 == 0), 2)
    assert not dedup._prior_band_waves_empty(batch_id=3, kept=None)
    # a kept-list excluding the only non-empty wave flips it back
    assert dedup._prior_band_waves_empty(batch_id=3, kept=[0, 1])
    dedup(docs.filter(F.col("doc_id") % 2 == 1), 3)
    got = _pair_set(dedup.read_pairs(spark))
    expected = _pair_set(
        minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=THRESHOLD)
    )
    assert expected and got == expected


def test_compaction_crash_between_renames_recovers_at_next_batch(
    spark, tmp_path
):
    """A compaction crash between compact_parquet's two renames leaves
    the table (waves + watermark + sidecars) in .__compact_old with the
    live path MISSING. The next batch must restore it BEFORE writing —
    a wave written into the recreated empty path would permanently
    orphan the pre-compaction corpus (review r8)."""
    import shutil

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(200)
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "state_r"),
        pairs_path=str(tmp_path / "pairs_r"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    dedup(docs.filter(F.col("doc_id") % 2 == 0), 0)
    # simulate the crash window: live path renamed away, tmp lost
    shutil.move(dedup.state_path, dedup.state_path + ".__compact_old")
    fresh = IncrementalNearDedup(
        state_path=str(tmp_path / "state_r"),
        pairs_path=str(tmp_path / "pairs_r"),
        text_col="text",
        id_col="doc_id",
        n=3,
        threshold=THRESHOLD,
    )
    fresh(docs.filter(F.col("doc_id") % 2 == 1), 1)
    got = _pair_set(fresh.read_pairs(spark))
    expected = _pair_set(
        minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=THRESHOLD)
    )
    assert expected and got == expected
    assert not os.path.exists(dedup.state_path + ".__compact_old")
