"""Algebraic invariants of the right-to-be-forgotten surface, pinned
over IncrementalChunkDedup (the template kernel): batching, ordering,
and idempotence of forget requests must not change the final state —
a GDPR sweep that arrives as one bulk request, as per-user trickle, or
replayed after a crash must land on the SAME registry."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.streaming import IncrementalChunkDedup

DOCS = [
    (1, "alpha beta gamma delta epsilon"),
    (2, "one two three four five"),
    (3, "alpha beta gamma delta epsilon"),  # dup of 1
    (4, "six seven eight nine ten"),
    (5, "one two three four five"),  # dup of 2
    (6, "lonely words that match nobody"),
]


def _ingest(spark, tmp_path, tag):
    kern = IncrementalChunkDedup(
        str(tmp_path / f"st_{tag}"), str(tmp_path / f"out_{tag}"),
        text_col="text", id_col="doc_id", k=5,
    )
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for i in range(2):
        kern(df.filter(F.pmod("doc_id", F.lit(2)) == i), i)
    return kern


def _state(kern, spark):
    return (
        frozenset(map(tuple, kern.read_state(spark).collect())),
        frozenset(map(tuple, kern.read_kept(spark).collect())),
    )


def test_forget_batched_equals_sequential_any_order(spark, tmp_path):
    """forget({a,b,c}) == forget(a);forget(b);forget(c) in EVERY
    order — per-user trickle and bulk sweeps land identically."""
    bulk = _ingest(spark, tmp_path, "bulk")
    bulk.forget(spark, [1, 2, 6])
    want = _state(bulk, spark)
    for tag, order in (("fwd", [1, 2, 6]), ("rev", [6, 2, 1])):
        seq = _ingest(spark, tmp_path, tag)
        for i in order:
            seq.forget(spark, [i])
        assert _state(seq, spark) == want, f"order {order} diverged"


def test_forget_is_idempotent_under_replay(spark, tmp_path):
    """Re-running a forget (crash replay of a GDPR job) changes
    nothing: same state, zero additional rewrites."""
    kern = _ingest(spark, tmp_path, "idem")
    kern.forget(spark, [3, 4])
    want = _state(kern, spark)
    assert kern.forget(spark, [3, 4]) == 0
    assert _state(kern, spark) == want


def test_forget_unknown_ids_is_noop(spark, tmp_path):
    kern = _ingest(spark, tmp_path, "noop")
    want = _state(kern, spark)
    assert kern.forget(spark, [777, 888]) == 0
    assert _state(kern, spark) == want
