"""Incremental near-duplicate detection: new documents are deduplicated
against the ENTIRE corpus seen so far, without ever re-shingling history.

This is the streaming twin of ``functions.dedup.minhash_lsh_pairs`` (same
signature scheme, same banding, same exact-Jaccard verification, same
output schema) and the pattern a continuous training-data ingest pipeline
needs: each micro-batch pays O(batch + candidates), not O(corpus).

Per batch:

1. shingle + MinHash ONLY the new documents;
2. candidate pairs = new-vs-new band collisions (within the batch) plus
   new-vs-state band collisions (against the persistent band table);
3. verify candidates with exact Jaccard over stored shingle sets, emit
   pairs with ``jaccard >= threshold``;
4. append the new documents' state rows (shingle set + signature) to the
   state table.

A pair is emitted exactly once, in the batch its later member arrives —
old-old pairs were emitted in earlier batches, and state rows are
append-only, so no pair can repeat.

State is one parquet table ``(doc_id, sh, n_sh, mh0..mhN)``. The band
join reads only the ``doc_id`` + signature columns (parquet column
pruning skips the heavy shingle arrays); the verify join touches shingle
arrays only for candidate doc ids, fetched via a broadcast semi-join. At
100 TB: partition the state table on a band-hash prefix so the band join
prunes partitions, and compact it periodically; the per-batch cost is
unchanged because history is never re-hashed.

Reference parity: this composes the reference's state-node semantics
(beavers dag.py:501-518 — durable value folded per cycle) with its
replay/live driver loop (kafka.py:534-544); the reference has no
near-dedup surface itself (README.md:43-50 scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beavers_spark.functions.dedup import (
    NUM_HASHES,
    ROWS_PER_BAND,
    _signatures_from_sets,
    band_rows,
    shingle_sets,
)
from beavers_spark.streaming.maintenance import BatchWatermark


class IncrementalNearDedup:
    """``foreachBatch`` callable maintaining corpus-wide near-dup pairs.

    ::

        dedup = IncrementalNearDedup(state_path, pairs_path,
                                     text_col="text", id_col="doc_id")
        stream.writeStream.foreachBatch(dedup).start()

    ``read_pairs(spark)`` returns every pair emitted so far;
    ``read_state(spark)`` the per-document signature/shingle state.
    """

    def __init__(
        self,
        state_path: str,
        pairs_path: str,
        text_col: str,
        id_col: str,
        n: int = 3,
        threshold: float = 0.5,
    ) -> None:
        self.state_path = state_path
        self.pairs_path = pairs_path
        self.text_col = text_col
        self.id_col = id_col
        self.n = n
        self.threshold = threshold
        self._has_state = False
        self._watermark = BatchWatermark(state_path)

    # -- state access -----------------------------------------------------
    def _state_exists(self, spark: SparkSession) -> bool:
        if self._has_state:
            return True
        try:
            spark.read.parquet(self.state_path).schema
            self._has_state = True
        except Exception:  # noqa: BLE001 — path-not-found from the JVM
            return False
        return True

    def read_state(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.state_path)

    def read_pairs(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.pairs_path)

    # -- the kernel -------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        # append-mode state is not idempotent: skip replayed batches
        if self._watermark.is_applied(batch_id) or batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        batch = batch_df
        if self._state_exists(spark):
            # BatchWatermark only guards same-batch replays: a doc_id
            # redelivered in a LATER batch (producer retry, re-ingest)
            # would duplicate its state row and from then on duplicate
            # every pair it participates in. Anti-join the batch against
            # the indexed ids — the state scan is doc_id-only (pruned).
            seen = self.read_state(spark).select(
                F.col("doc_id").alias(self.id_col)
            )
            batch = batch.join(seen, self.id_col, "left_anti")
            if batch.isEmpty():
                self._watermark.mark(batch_id)
                return
        sets = shingle_sets(batch, self.text_col, self.id_col, self.n)
        new_state = (
            sets.join(_signatures_from_sets(sets), "doc_id")
            .persist()
        )
        new_state.count()  # one shingle+hash pass feeds bands AND verify

        sig_cols = ["doc_id"] + [f"mh{i}" for i in range(NUM_HASHES)]
        new_bands = band_rows(new_state.select(*sig_cols))
        band_keys = ["band_id"] + [f"h{r}" for r in range(ROWS_PER_BAND)]

        # within-batch collisions, canonical doc1 < doc2
        a, b = new_bands.alias("a"), new_bands.alias("b")
        within_cond = F.col("a.doc_id") < F.col("b.doc_id")
        for k in band_keys:
            within_cond = within_cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
        cand = a.join(b, within_cond).select(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )

        if self._state_exists(spark):
            # column pruning: this scan reads doc_id + mh* only, never the
            # shingle arrays
            old_bands = band_rows(
                self.read_state(spark).select(*sig_cols)
            ).alias("o")
            nb = new_bands.alias("n")
            # != guard: belt-and-braces with the anti-join above — a
            # self-collision would emit a (doc, doc, 1.0) pair
            cross_cond = F.col("o.doc_id") != F.col("n.doc_id")
            for k in band_keys:
                cross_cond = cross_cond & (F.col(f"o.{k}") == F.col(f"n.{k}"))
            cross = old_bands.join(nb, cross_cond).select(
                F.least(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc1"),
                F.greatest(F.col("o.doc_id"), F.col("n.doc_id")).alias("doc2"),
            )
            cand = cand.unionByName(cross)

        cand = cand.distinct().persist()
        cand.count()  # materialize before the two id/verify consumers

        # every candidate involves >=1 new doc; the old side's shingle
        # sets + signatures come from state, fetched for JUST the
        # candidate ids (broadcast semi-join keeps the scan narrow)
        lookup = new_state
        if self._has_state:
            ids = (
                cand.select(F.col("doc1").alias("doc_id"))
                .unionByName(cand.select(F.col("doc2").alias("doc_id")))
                .distinct()
            )
            lookup = lookup.unionByName(
                self.read_state(spark).join(
                    F.broadcast(ids), "doc_id", "left_semi"
                )
            )
        agree = sum(
            F.when(F.col(f"sa.mh{i}") == F.col(f"sb.mh{i}"), 1).otherwise(0)
            for i in range(NUM_HASHES)
        )
        sa = lookup.alias("sa")
        sb = lookup.alias("sb")
        n_common = F.size(F.array_intersect(F.col("sa.sh"), F.col("sb.sh")))
        pairs = (
            cand.join(sa, F.col("doc1") == F.col("sa.doc_id"))
            .join(sb, F.col("doc2") == F.col("sb.doc_id"))
            .select(
                "doc1",
                "doc2",
                F.round(agree / F.lit(float(NUM_HASHES)), 6).alias(
                    "est_jaccard"
                ),
                F.round(
                    n_common
                    / (F.col("sa.n_sh") + F.col("sb.n_sh") - n_common),
                    6,
                ).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= self.threshold)
        )
        # written even when empty so read_pairs() is valid from batch 0
        pairs.write.mode("append").parquet(self.pairs_path)

        new_state.write.mode("append").parquet(self.state_path)
        self._has_state = True
        self._watermark.mark(batch_id)
        cand.unpersist()
        new_state.unpersist()
