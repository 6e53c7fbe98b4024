"""Incremental chunk-level exact dedup: every k-word segment of the
corpus is kept exactly once ACROSS BATCHES, and each arriving document
is reassembled from the segments it is first to contribute.

This is the streaming twin of ``functions.curation.chunk_dedup`` (same
segmentation, same hash scheme, same output schema) — the Lee et al.
substring-dedup step running at ingest: each micro-batch pays
O(batch + state-hash probe), and history is never re-segmented.

Per batch:

1. segment + hash ONLY the new documents (``word_chunks`` +
   ``md5_hash64`` — one narrow pass, the fan-out stays in the scan);
2. within-batch ownership: min (doc, pos) occurrence per segment hash —
   one groupBy on the 60-bit hash, never the segment text;
3. cross-batch ownership: anti-join the batch winners against the
   persistent hash registry (a column-pruned scan of the ``h`` column
   only — the chunk strings in old waves are never read);
4. the surviving segments land in the state table as their own wave
   partition (``w=<batch_id>/``) — written FIRST, the batch's one
   materialization barrier, mirroring ``IncrementalNearDedup``;
5. the kept-document view (``doc_id, clean_text, n_kept, n_chunks``)
   is assembled from the wave read-back and appended to the output.

A segment is owned exactly once, in the batch it first arrives; state
rows are append-only, so ownership can never flip. When batches arrive
in ascending id order the result is IDENTICAL to the batch operator
(pinned by tests/test_chunk_dedup.py); under arbitrary arrival order the
owner is the first ARRIVAL rather than the global min (doc, pos) — the
semantics an ingest pipeline actually wants.

At 100 TB: the per-batch probe reads one 8-byte column of the state —
columnar, but O(corpus segments). That is the inherent cost of EXACT
dedup at ingest; the standard mitigations compose here without changing
the kernel: compact waves periodically (``compact``), and front the
probe with per-wave Bloom-filter sidecars so only waves with possible
collisions are scanned (hash registry lookups are the textbook Bloom
use case). The near-dedup twin has the same probe shape on its band
table.

Reference parity: composes the reference's state-node semantics
(beavers dag.py:501-518 — durable value folded per cycle) with its
replay/live driver loop (kafka.py:534-544); the reference has no dedup
surface itself (README.md:43-50 scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from beavers_spark.functions.curation import word_chunks
from beavers_spark.functions.dedup import md5_hash64
from beavers_spark.streaming.maintenance import (
    BatchWatermark,
    ProbeMetrics,
    WaveBloomIndex,
    table_exists,
)


class IncrementalChunkDedup:
    """``foreachBatch`` callable maintaining corpus-wide chunk ownership.

    ::

        dedup = IncrementalChunkDedup(state_path, out_path,
                                      text_col="text", id_col="doc_id")
        stream.writeStream.foreachBatch(dedup).start()

    ``read_kept(spark)`` returns every deduplicated document emitted so
    far; ``read_state(spark)`` the segment-hash ownership registry.
    """

    def __init__(
        self,
        state_path: str,
        out_path: str,
        text_col: str,
        id_col: str,
        k: int = 10,
        bloom_bits: int | None = 1 << 23,
    ) -> None:
        self.state_path = state_path
        self.out_path = out_path
        self.text_col = text_col
        self.id_col = id_col
        self.k = k
        #: bits per wave Bloom sidecar (None disables the probe filter)
        self.bloom_bits = bloom_bits
        self._has_state = False
        self._watermark = BatchWatermark(state_path)
        self._bloom = WaveBloomIndex(state_path, bloom_bits)
        #: per-batch Bloom-prune accounting (see maintenance.ProbeMetrics)
        self.probe_metrics: list[ProbeMetrics] = []

    # -- state access -----------------------------------------------------
    def _state_exists(self, spark: SparkSession) -> bool:
        if self._has_state:
            return True
        if table_exists(spark, self.state_path):
            self._has_state = True
            return True
        return False

    def read_state(self, spark: SparkSession) -> DataFrame:
        """Segment ownership registry ``(h, doc_id, idx)`` (the wave
        column ``w`` is a storage detail)."""
        return spark.read.parquet(self.state_path).select(
            "h", "doc_id", "idx"
        )

    def read_kept(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.out_path)

    def compact(self, spark: SparkSession) -> int:
        """Coarsen all wave partitions into ``w=-1`` (see
        ``IncrementalNearDedup.compact`` for why the partition column
        must survive compaction); returns the post-compaction file
        count."""
        from beavers_spark.streaming.maintenance import compact_parquet

        compact_parquet(spark, self.out_path)
        return self._bloom.compact_merge(
            lambda: compact_parquet(
                spark,
                self.state_path,
                partition_by="w",
                transform=lambda df: df.withColumn("w", F.lit(-1)),
            )
        )

    # -- the kernel -------------------------------------------------------
    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self._watermark.is_applied(batch_id):
            return
        spark = batch_df.sparkSession
        batch = batch_df
        had_state = self._state_exists(spark)
        if had_state:
            # redelivered doc ids (producer retry, re-ingest) would
            # re-own their unique segments and duplicate output rows;
            # the probe reads the doc_id column only, excluding this
            # wave's own half-committed directory (crash-replay safety —
            # same reasoning as IncrementalNearDedup)
            seen = (
                spark.read.parquet(self.state_path)
                .filter(F.col("w") != batch_id)
                .select(F.col("doc_id").alias(self.id_col))
                .distinct()
            )
            batch = batch.join(seen, self.id_col, "left_anti")

        chunks = word_chunks(F.col(self.text_col), self.k)
        # repartition before the fan-out (same rationale as the batch
        # operator: a single-partition batch serializes segment hashing)
        batch = batch.repartition(spark.sparkContext.defaultParallelism)
        segs = batch.select(
            F.col(self.id_col).alias("doc_id"),
            # bigint to match the batch twin's count()-derived column
            F.size(chunks).cast("bigint").alias("n_chunks"),
            F.posexplode(chunks).alias("idx", "chunk"),
        ).withColumn("h", md5_hash64(F.col("chunk")))
        # lexicographic struct min — no packing range limit (mirrors
        # the batch twin in functions/curation.py)
        occ = F.struct(F.col("doc_id"), F.col("idx"))
        owners = (
            segs.groupBy("h")
            .agg(F.min(occ).alias("owner"))
            .withColumnRenamed("h", "oh")
        )
        winners = segs.join(
            owners, (F.col("h") == F.col("oh")) & (occ == F.col("owner"))
        ).select("h", "doc_id", "idx", "chunk", "n_chunks")
        # the checkpoint is the batch's one heavy materialization: the
        # Bloom-probe collect, the cross-batch anti-join, and the wave
        # write all read the checkpointed result instead of
        # re-segmenting the batch
        winners = winners.localCheckpoint()
        pre_h = self._bloom.collect_keys(winners, "h")
        if had_state:
            # cross-batch ownership: any hash already registered wins.
            # Column pruning keeps this scan to the 8-byte h column; the
            # wave Bloom sidecars additionally prune WAVES that cannot
            # contain any batch hash (see WaveBloomIndex — a pruned wave
            # has no possible match, so excluding it is exact)
            prior = spark.read.parquet(self.state_path).filter(
                F.col("w") != batch_id
            )
            prior = self._bloom.prune_prior(
                prior, pre_h, batch_id, self.probe_metrics
            )
            if prior is not None:
                winners = winners.join(
                    prior.select("h"), "h", "left_anti"
                )

        # overwriting one wave directory is idempotent under replays
        wave_dir = f"{self.state_path}/w={batch_id}"
        winners.write.mode("overwrite").parquet(wave_dir)
        if pre_h is not None:
            # PRE-anti hash set: a superset bitmap only adds false
            # positives (an unnecessary wave scan), never wrong answers
            self._bloom.save_wave(wave_dir, pre_h)
        self._has_state = True
        wave = spark.read.parquet(wave_dir)
        kept = wave.groupBy("doc_id").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("idx", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.count("*").alias("n_kept"),
            F.first("n_chunks").alias("n_chunks"),
        )
        # written even when empty so read_kept() is valid from batch 0
        kept.write.mode("append").parquet(self.out_path)
        self._watermark.mark(batch_id)
