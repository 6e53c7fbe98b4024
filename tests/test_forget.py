"""Right-to-be-forgotten on the incremental dedup registries
(maintenance.forget_doc_rows + the kernels' forget methods): forgotten
docs vanish from state AND outputs, the rewrite is Bloom-targeted to
the waves that hold them, ownership re-opens ("first arrival after
forgetting"), redelivery of a forgotten id is admitted as brand-new,
and the operation is idempotent."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.plans.common import t
from beavers_spark.streaming import IncrementalChunkDedup, IncrementalNearDedup

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, lo, hi):
    return (
        t(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
    )


def test_chunk_forget_reopens_ownership(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "z y x w v")],
        "doc_id long, text string",
    )
    kern = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5, bloom_min_waves=0,
    )
    kern(df, 0)
    assert {r.doc_id for r in kern.read_kept(spark).collect()} == {1, 2}

    n = kern.forget(spark, [1])
    assert n >= 1
    # state + output cleansed
    assert {r.doc_id for r in kern.read_state(spark).collect()} == {2}
    assert {r.doc_id for r in kern.read_kept(spark).collect()} == {2}
    # idempotent: nothing left to drop
    assert kern.forget(spark, [1]) == 0

    # ownership RE-OPENED: a new doc with doc 1's exact segment now
    # becomes its owner (pre-forget it would have been a duplicate)
    kern(
        spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string"),
        1,
    )
    kept = {r.doc_id: r.n_kept for r in kern.read_kept(spark).collect()}
    assert kept.get(9) == 1, "forgotten segment must be re-ownable"

    # redelivery of a forgotten id: admitted as brand-new. Forget doc
    # 2 (whose segment nobody else owns) and redeliver it — it re-owns
    # its segment and re-enters state + output; had the seen guard
    # still remembered it, the batch would drain to nothing.
    kern.forget(spark, [2])
    assert kern.read_state(spark).filter(F.col("doc_id") == 2).count() == 0
    kern(df.filter(F.col("doc_id") == 2), 2)
    kept = {r.doc_id: r.n_kept for r in kern.read_kept(spark).collect()}
    assert kept.get(2) == 1, "forgotten id must be admitted as new"
    assert kern.read_state(spark).filter(F.col("doc_id") == 2).count() == 1


def test_chunk_forget_is_bloom_targeted(spark, tmp_path):
    """Only the wave(s) that may hold the ids are rewritten: with the
    doc-id sidecars present, forgetting a wave-1 doc must not rewrite
    the disjoint waves 0 and 2."""
    kern = IncrementalChunkDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        text_col="text", id_col="doc_id", k=5, bloom_min_waves=0,
    )
    for i, (lo, hi) in enumerate(((0, 70), (70, 140), (140, 200))):
        kern(_docs(spark, lo, hi), i)
    victim = [
        r.doc_id
        for r in _docs(spark, 70, 140).limit(1).collect()
    ]
    # state: exactly wave 1 rewritten; out: exactly wave 1 rewritten
    assert kern.forget(spark, victim) == 2
    assert not kern.read_state(spark).filter(
        F.col("doc_id").isin(victim)
    ).count()


def test_near_forget_drops_pairs_and_rebuilds_anchors(spark, tmp_path):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, "completely different text here ok")],
        "doc_id long, text string",
    )
    kern = IncrementalNearDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"),
        text_col="text", id_col="doc_id", threshold=0.5,
        bloom_min_waves=0,
    )
    kern(df, 0)
    assert {
        (r.doc1, r.doc2) for r in kern.read_pairs(spark).collect()
    } == {(1, 2)}

    kern.forget(spark, [2])
    assert {r.doc_id for r in kern.read_state(spark).collect()} == {1, 3}
    # every pair involving the forgotten doc is gone
    assert kern.read_pairs(spark).count() == 0

    # redelivery of the forgotten id: admitted as brand-new, and its
    # duplicate relation to the SURVIVING doc 1 is re-emitted
    kern(df.filter(F.col("doc_id") == 2), 1)
    assert {
        (r.doc1, r.doc2) for r in kern.read_pairs(spark).collect()
    } == {(1, 2)}
    # state/anchors wave parity held through the rebuild: a further
    # disjoint wave runs clean end to end
    kern(
        spark.createDataFrame(
            [(7, "yet another unrelated document body")],
            "doc_id long, text string",
        ),
        2,
    )
    assert kern.read_state(spark).filter(F.col("doc_id") == 7).count() == 1


def test_frame_dedup_forget_reopens_frame_ownership(spark, tmp_path):
    """Video twin: forgetting a video frees its frame contents for
    re-ownership, and the video itself is re-admitted on redelivery."""
    from beavers_spark.plans.llmops import _synth_frame_avis
    from beavers_spark.streaming import IncrementalFrameDedup

    avis = _synth_frame_avis(spark, SF_DIR).filter(F.col("doc_id") < 40)
    kern = IncrementalFrameDedup(
        str(tmp_path / "state"), str(tmp_path / "out"),
        bloom_min_waves=0,
    )
    kern(avis.filter(F.col("doc_id") < 20), 0)
    kern(avis.filter(F.col("doc_id") >= 20), 1)
    victim = 0
    owned_before = (
        kern.read_kept(spark).filter(F.col("doc_id") == victim).count()
    )
    assert owned_before > 0
    n = kern.forget(spark, [victim])
    assert n >= 1
    assert kern.read_state(spark).filter(
        F.col("doc_id") == victim
    ).count() == 0
    assert kern.read_kept(spark).filter(
        F.col("doc_id") == victim
    ).count() == 0
    # redelivery: admitted as new; its frames re-enter ownership for
    # every content class nobody else holds
    kern(avis.filter(F.col("doc_id") == victim), 2)
    assert kern.read_state(spark).filter(
        F.col("doc_id") == victim
    ).count() > 0
    assert kern.forget(spark, [999999]) == 0  # unknown id: no-op
