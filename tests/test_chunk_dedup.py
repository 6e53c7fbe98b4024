"""IncrementalChunkDedup: streaming chunk-level exact dedup against a
growing ownership registry must equal the one-shot batch ``chunk_dedup``
when waves arrive in ascending id order."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.functions.curation import chunk_dedup
from beavers_spark.plans.common import t
from beavers_spark.streaming import IncrementalChunkDedup

SF_DIR = "/root/testdata/sf0.001"


def _kept_set(df):
    return {
        (r.doc_id, r.clean_text, r.n_kept, r.n_chunks)
        for r in df.select(
            "doc_id", "clean_text", "n_kept", "n_chunks"
        ).collect()
    }


def _feed(spark, dedup, docs, waves):
    """Drive the kernel directly with ascending-id-range waves (the
    foreachBatch plumbing itself is covered by the near-dedup twin's
    streaming test — this pins the kernel math)."""
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


def test_incremental_equals_batch_chunk_dedup(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    dedup = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5,
    )
    _feed(spark, dedup, docs, waves=3)
    got = _kept_set(dedup.read_kept(spark))
    expected = _kept_set(chunk_dedup(docs, "text", "doc_id", k=5))
    assert expected and got == expected
    # the registry owns each segment hash exactly once
    state = dedup.read_state(spark)
    assert state.select("h").distinct().count() == state.count()


def test_cross_batch_ownership_and_doc_disappearance(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a b"), (2, "a b c d"), (3, "a b")],
        "doc_id long, text string",
    )
    dedup = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=2,
    )
    dedup(df.filter(F.col("doc_id") == 1), 0)
    dedup(df.filter(F.col("doc_id") > 1), 1)
    out = {r.doc_id: r for r in dedup.read_kept(spark).collect()}
    # doc 2 keeps only its novel segment; doc 3 is entirely known -> gone
    assert set(out) == {1, 2}
    assert out[2].clean_text == "c d" and out[2].n_kept == 1 and out[2].n_chunks == 2


def test_redelivered_docs_and_replayed_batches_are_noops(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "p q")], "doc_id long, text string"
    )
    dedup = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=2,
    )
    dedup(df, 0)
    base = _kept_set(dedup.read_kept(spark))
    dedup(df, 0)  # replayed batch id: watermark skip
    assert _kept_set(dedup.read_kept(spark)) == base
    dedup(df.filter(F.col("doc_id") == 1), 1)  # doc 1 redelivered later
    assert _kept_set(dedup.read_kept(spark)) == base
    assert dedup.read_state(spark).count() == 2


def test_compact_preserves_state_and_output(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    dedup = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5,
    )
    _feed(spark, dedup, docs, waves=2)
    before_state = dedup.read_state(spark).count()
    before_kept = _kept_set(dedup.read_kept(spark))
    dedup.compact(spark)
    assert dedup.read_state(spark).count() == before_state
    assert _kept_set(dedup.read_kept(spark)) == before_kept
    # and the kernel keeps working after compaction
    extra = spark.createDataFrame(
        [(999_999, "zz qq zz qq yy")], "doc_id long, text string"
    )
    dedup(extra, 5)
    assert 999_999 in {r.doc_id for r in dedup.read_kept(spark).collect()}


def test_streaming_foreachbatch_end_to_end(spark, tmp_path):
    """Drive the kernel through a real Structured Streaming file source
    (availableNow, one file per trigger), mirroring the near-dedup
    twin's e2e test: streamed == one-shot batch for in-order waves."""
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
    dedup = IncrementalChunkDedup(
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
    got = _kept_set(dedup.read_kept(spark))
    expected = _kept_set(chunk_dedup(docs, "text", "doc_id", k=5))
    assert expected and got == expected


def test_mid_batch_crash_replay_is_idempotent(spark, tmp_path):
    """Crash after the wave's state + output writes, before the
    watermark mark: the replayed batch must not duplicate kept rows
    (the old append-mode output did exactly that)."""
    import os

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(80)
    dedup = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=10,
    )
    dedup(docs.filter(F.col("doc_id") % 2 == 0), 0)
    dedup(docs.filter(F.col("doc_id") % 2 == 1), 1)
    before = sorted(
        (r.doc_id, r.n_kept) for r in dedup.read_kept(spark).collect()
    )
    os.remove(os.path.join(str(tmp_path / "state"), "_last_batch.json"))
    dedup._watermark.mark(0)
    dedup(docs.filter(F.col("doc_id") % 2 == 1), 1)
    assert sorted(
        (r.doc_id, r.n_kept) for r in dedup.read_kept(spark).collect()
    ) == before
