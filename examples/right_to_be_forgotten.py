"""Right to be forgotten across the incremental registries.

Every doc-holding state kernel carries ``forget(spark, ids)`` — a
HARD delete, not a tombstone: the ids vanish from the wave-partitioned
registries and every derived output, their content keys re-open, and a
later redelivery of the same id is admitted as a brand-new document.
The deletion is Bloom-TARGETED (the per-wave doc-id sidecars name the
only waves that may hold the ids), so at 100 TB a forget request
rewrites a handful of wave directories, never the corpus — and each
rewrite uses the stage→aside→swap order, so no crash window can lose a
surviving row.

The flow below walks three kernels whose post-forget obligations
differ:

1. ``IncrementalChunkDedup`` — pure set state: delete + re-open;
2. ``IncrementalNearDedup`` — derived pairs: every pair touching the
   victim goes too, and the band registry is rebuilt from the
   cleansed state;
3. ``IncrementalQualityClassifier`` — a fitted MODEL memorized the
   victim's features, so forget REFITS (deleting rows alone would
   leave the victim's influence in every future ``score()``).

Run: ``python examples/right_to_be_forgotten.py`` (or via
tests/test_examples.py).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.session import get_spark  # noqa: E402
from beavers_spark.streaming import (  # noqa: E402
    IncrementalChunkDedup,
    IncrementalNearDedup,
    IncrementalQualityClassifier,
)

spark = get_spark("example_forget")

# -- 1. chunk dedup: delete, re-open, re-admit --------------------------
with tempfile.TemporaryDirectory() as d:
    kern = IncrementalChunkDedup(
        f"{d}/state", f"{d}/out", text_col="text", id_col="doc_id", k=5
    )
    wave0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),
         (2, "one two three four five")],
        "doc_id long, text string",
    )
    kern(wave0, 0)

    n = kern.forget(spark, [1])
    assert n >= 1  # registry + output waves rewritten
    assert kern.forget(spark, [1]) == 0  # idempotent: nothing left
    assert {r.doc_id for r in kern.read_kept(spark).collect()} == {2}

    # the forgotten segment RE-OPENS: the next doc presenting it
    # becomes its owner ("first arrival after forgetting")
    kern(
        spark.createDataFrame(
            [(9, "alpha beta gamma delta epsilon")],
            "doc_id long, text string",
        ),
        1,
    )
    kept = {r.doc_id: r.n_kept for r in kern.read_kept(spark).collect()}
    assert kept[9] == 1
    print("chunk: forgotten, re-opened, idempotent — ok")

# -- 2. near dedup: derived pairs go with the doc -----------------------
with tempfile.TemporaryDirectory() as d:
    base = "the quick brown fox jumps over the lazy dog again and again"
    nd = IncrementalNearDedup(
        f"{d}/state", f"{d}/pairs",
        text_col="text", id_col="doc_id", threshold=0.5,
    )
    nd(
        spark.createDataFrame(
            [(1, base), (2, base), (3, "entirely different words here")],
            "doc_id long, text string",
        ),
        0,
    )
    assert {(r.doc1, r.doc2) for r in nd.read_pairs(spark).collect()} == {
        (1, 2)
    }
    nd.forget(spark, [2])
    assert nd.read_pairs(spark).count() == 0  # the (1,2) pair went too
    # redelivery = brand-new doc: the duplicate relation re-emits
    nd(
        spark.createDataFrame([(2, base)], "doc_id long, text string"), 1
    )
    assert {(r.doc1, r.doc2) for r in nd.read_pairs(spark).collect()} == {
        (1, 2)
    }
    print("near: pairs cleansed, redelivery re-admitted — ok")

# -- 3. classifier: the model must UNLEARN ------------------------------
with tempfile.TemporaryDirectory() as d:
    clf = IncrementalQualityClassifier(
        f"{d}/clf", label_col="y", n_buckets=64
    )
    rows = [(i, f"quality prose citation facts v{i}", 1) for i in range(3)]
    rows += [(10 + i, f"spamword{i} lottery buy clicks", 0) for i in range(3)]
    clf(
        spark.createDataFrame(rows, "doc_id long, text string, y int"), 0
    )
    before = {r.bucket: r.w for r in clf.model(spark).collect()}
    refits = clf.refit_count
    clf.forget(spark, [0, 1, 2])  # all positives
    assert clf.refit_count == refits + 1  # refit, not just row deletes
    after = {r.bucket: r.w for r in clf.model(spark).collect()}
    assert after != before  # the victims' influence is gone
    print("classifier: rows deleted AND model refit — ok")

print("right-to-be-forgotten example: all assertions passed")
