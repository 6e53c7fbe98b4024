"""IncrementalTfidfDedup: read_pairs after any in-order wave sequence
must EQUAL the batch ``tfidf_cosine_pairs`` on the union of the waves —
scores included — with redelivery and crash replays no-ops. The
moving-idf hazard (weights depend on global corpus statistics) is the
thing under test: candidates accumulate incrementally, scoring is
read-time under current statistics (see streaming/tfidf_dedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beavers_spark.functions.dedup import tfidf_cosine_pairs
from beavers_spark.plans.common import t
from beavers_spark.streaming import IncrementalTfidfDedup

SF_DIR = "/root/testdata/sf0.001"
THRESHOLD = 0.5


def _mk(tmp_path, name="a", **kw):
    return IncrementalTfidfDedup(
        state_path=str(tmp_path / f"state_{name}"),
        cand_path=str(tmp_path / f"cand_{name}"),
        text_col="text",
        id_col="doc_id",
        threshold=THRESHOLD,
        **kw,
    )


def _pair_set(df):
    return {(r.doc1, r.doc2, r.cos) for r in df.collect()}


def test_incremental_equals_batch_tfidf(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    dedup = _mk(tmp_path)
    for i in range(3):
        dedup(docs.filter(F.pmod("doc_id", F.lit(3)) == i), i)
    got = _pair_set(dedup.read_pairs(spark))
    expected = _pair_set(
        tfidf_cosine_pairs(docs, "text", "doc_id", threshold=THRESHOLD)
    )
    assert expected and got == expected


def test_moving_idf_old_pair_rescored_under_current_corpus(spark, tmp_path):
    """A pair whose members BOTH arrived in wave 0 must be reported with
    the cosine the FINAL corpus statistics give it, not the score in
    force when it was found — the defining difference from an
    eager-scoring design."""
    w0 = spark.createDataFrame(
        [
            (1, "rare quantum flux capacitor evaluation"),
            (2, "rare quantum flux capacitor evaluation"),
            # distinct fillers keep wave-0 idf nonzero (an all-identical
            # corpus has every weight at 0 and no defined cosine)
            (3, "unrelated gardening almanac entry"),
            (4, "another unrelated cooking recipe text"),
        ],
        "doc_id long, text string",
    )
    # wave 1 floods the corpus with docs sharing SOME of those terms,
    # shifting every df and the corpus size
    w1 = spark.createDataFrame(
        [(10 + i, f"quantum flux study v{i}") for i in range(6)]
        + [(20, "replicated flux capacitor summary"),
           (21, "replicated flux capacitor summary")],
        "doc_id long, text string",
    )
    dedup = _mk(tmp_path, name="m")
    dedup(w0, 0)
    early = _pair_set(dedup.read_pairs(spark))
    dedup(w1, 1)
    got = _pair_set(dedup.read_pairs(spark))
    union = w0.unionByName(w1)
    expected = _pair_set(
        tfidf_cosine_pairs(union, "text", "doc_id", threshold=THRESHOLD)
    )
    assert got == expected
    # (1, 2) is identical text: cos 1.0 both times; the wave-1 pair
    # (20, 21) scores under the grown corpus in the same read
    assert (1, 2, 1.0) in got and (1, 2, 1.0) in early
    assert (20, 21, 1.0) in got and len(got) > len(early)


def test_redelivered_docs_and_replayed_batches_are_noops(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    dedup = _mk(tmp_path, name="r")
    w0 = docs.filter(F.col("doc_id") % 2 == 0)
    w1 = docs.filter(F.col("doc_id") % 2 == 1)
    dedup(w0, 0)
    dedup(w1, 1)
    before = _pair_set(dedup.read_pairs(spark))
    n_state = dedup.read_state(spark).count()
    dedup(w0, 0)  # replayed batch: watermark no-op
    replay = _mk(tmp_path, name="r")  # fresh instance, same state
    replay(w0.unionByName(w1.limit(5)), 2)  # all docs redelivered
    assert dedup.read_state(spark).count() == n_state
    assert _pair_set(replay.read_pairs(spark)) == before


def test_mid_batch_crash_replay_is_idempotent(spark, tmp_path):
    """A crash AFTER the wave's registry + candidate writes but BEFORE
    the watermark mark replays the whole batch; both writes are
    per-wave overwrites, so nothing changes."""
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(60)
    dedup = _mk(tmp_path, name="c")
    w0 = docs.filter(F.col("doc_id") % 2 == 0)
    w1 = docs.filter(F.col("doc_id") % 2 == 1)
    dedup(w0, 0)
    dedup(w1, 1)
    before = _pair_set(dedup.read_pairs(spark))
    n_state = dedup.read_state(spark).count()
    # simulate the crash: the outputs of batch 1 are on disk but the
    # watermark was never advanced past batch 0
    import os

    os.remove(os.path.join(dedup.state_path, "_last_batch.json"))
    dedup._watermark.mark(0)
    dedup(w1, 1)
    assert _pair_set(dedup.read_pairs(spark)) == before
    assert dedup.read_state(spark).count() == n_state


def test_compaction_preserves_pairs_and_drops_files(spark, tmp_path):
    from beavers_spark.streaming.maintenance import partition_stats

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(90)
    dedup = _mk(tmp_path, name="k")
    for i in range(3):
        dedup(docs.filter(F.pmod("doc_id", F.lit(3)) == i), i)
    before_pairs = _pair_set(dedup.read_pairs(spark))
    files_before, _, _ = partition_stats(spark, [dedup.state_path])
    files_after = dedup.compact(spark)
    assert files_after <= files_before
    assert _pair_set(dedup.read_pairs(spark)) == before_pairs
    # post-compaction ingest still works and still equals batch
    extra = spark.createDataFrame(
        [(100001, "zzz entirely novel text qqq")],
        "doc_id long, text string",
    )
    dedup(extra, 3)
    got = _pair_set(dedup.read_pairs(spark))
    expected = _pair_set(
        tfidf_cosine_pairs(
            docs.unionByName(extra), "text", "doc_id", threshold=THRESHOLD
        )
    )
    assert got == expected


def test_layout_sidecar_locks_storage_knobs(spark, tmp_path):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(30)
    dedup = _mk(tmp_path, name="l", n_hash_buckets=8)
    dedup(docs, 0)
    import json
    import os

    # r13 layout: b rides as a clustered DATA column (no b= dirs), and
    # the sidecar records the layout version so pre-r13 b=-partitioned
    # tables fail loudly at open instead of breaking discovery
    assert not any(
        name.startswith("b=")
        for name in os.listdir(os.path.join(dedup.state_path, "w=0"))
    )
    with open(os.path.join(dedup.state_path, "_layout.json")) as fh:
        assert json.load(fh)["reg_layout"] == "b-clustered-v2"
    other = _mk(tmp_path, name="l", n_hash_buckets=32)
    with pytest.raises(ValueError, match="n_hash_buckets"):
        other(docs, 1)
    lower_df = _mk(tmp_path, name="l", n_hash_buckets=8, max_df=8)
    with pytest.raises(ValueError, match="max_df"):
        lower_df(docs, 1)
    # threshold is read-time only: mutable
    reread = _mk(tmp_path, name="l", n_hash_buckets=8)
    reread.threshold = 0.9
    assert all(r.cos >= 0.9 for r in reread.read_pairs(spark).collect())


def test_leading_empty_batch_does_not_wedge_kernel(spark, tmp_path):
    """A stream's first trigger is often empty: the empty wave's
    partitionBy write leaves no schema-bearing file, and keeping the
    directory used to crash EVERY later read of the registry with
    UNABLE_TO_INFER_SCHEMA — the kernel never recovered. The empty wave
    is removed instead; later batches proceed and still equal batch."""
    import os

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(40)
    dedup = _mk(tmp_path, name="e")
    dedup(docs.limit(0), 0)
    assert not os.path.isdir(os.path.join(dedup.state_path, "w=0"))
    assert dedup.read_candidates(spark).count() == 0
    dedup(docs, 1)
    dedup(docs.limit(7), 2)  # fully redelivered mid-stream: also empty
    got = _pair_set(dedup.read_pairs(spark))
    expected = _pair_set(
        tfidf_cosine_pairs(docs, "text", "doc_id", threshold=THRESHOLD)
    )
    assert got == expected


def test_read_clusters_equals_batch_components(spark, tmp_path):
    from beavers_spark.functions.dedup import connected_components

    docs = t(spark, SF_DIR, "documents").select("doc_id", "text")
    dedup = _mk(tmp_path, name="g")
    for i in range(2):
        dedup(docs.filter(F.pmod("doc_id", F.lit(2)) == i), i)
    got = {
        (r.doc_id, r.cluster_id)
        for r in dedup.read_clusters(spark).collect()
    }
    expected = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(
            tfidf_cosine_pairs(
                docs, "text", "doc_id", threshold=THRESHOLD
            ).select("doc1", "doc2")
        ).collect()
    }
    assert expected and got == expected


def test_compaction_prunes_dead_candidates(spark, tmp_path):
    """Candidates whose every shared bucket has gone over max_df under
    current statistics can never score again (df only grows) — compact
    must drop them while leaving read_pairs and read_clusters
    byte-identical (VERDICT r7 item 6)."""
    # wave 0: two docs sharing a distinctive phrase -> candidates while
    # the phrase's buckets are still rare
    w0 = spark.createDataFrame(
        [
            (1, "crimson basilisk theorem"),
            (2, "crimson basilisk theorem"),
            (3, "unrelated gardening almanac entry"),
            (4, "another cooking recipe text"),
        ],
        "doc_id long, text string",
    )
    # later waves flood the same phrase past max_df: the (1,2) candidate
    # goes dead (its every shared bucket is now over the cap)
    flood = spark.createDataFrame(
        [(100 + i, "crimson basilisk theorem") for i in range(8)],
        "doc_id long, text string",
    )
    dedup = _mk(tmp_path, name="p", max_df=4)
    dedup(w0, 0)
    assert (1, 2) in {
        (r.doc1, r.doc2) for r in dedup.read_candidates(spark).collect()
    }
    dedup(flood, 1)
    pairs_before = _pair_set(dedup.read_pairs(spark))
    clusters_before = {
        (r.doc_id, r.cluster_id)
        for r in dedup.read_clusters(spark).collect()
    }
    cand_before = dedup.read_candidates(spark).count()
    dedup.compact(spark)
    assert dedup.candidates_pruned > 0
    assert dedup.read_candidates(spark).count() == cand_before - (
        dedup.candidates_pruned
    )
    # the dead (1,2) candidate is gone; live candidates survive
    kept = {(r.doc1, r.doc2) for r in dedup.read_candidates(spark).collect()}
    assert (1, 2) not in kept
    # every read result is unchanged by the prune
    assert _pair_set(dedup.read_pairs(spark)) == pairs_before
    assert {
        (r.doc_id, r.cluster_id)
        for r in dedup.read_clusters(spark).collect()
    } == clusters_before
    # and the kernel still equals batch after more ingest
    extra = spark.createDataFrame(
        [(500, "novel closing document wholly distinct")],
        "doc_id long, text string",
    )
    dedup(extra, 2)
    got = _pair_set(dedup.read_pairs(spark))
    expected = _pair_set(
        tfidf_cosine_pairs(
            w0.unionByName(flood).unionByName(extra),
            "text", "doc_id", threshold=THRESHOLD, max_df=4,
        )
    )
    assert got == expected
