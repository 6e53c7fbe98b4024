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
