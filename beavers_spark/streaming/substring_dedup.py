"""Incremental substring-level exact dedup: duplicated k-token spans are
detected ACROSS BATCHES against a growing span-hash registry, and each
arriving document's duplicate token ranges are emitted in the batch it
arrives.

This is the streaming twin of ``functions.curation.substring_dedup``
(same stride-1 span hashing, same gaps-and-islands range merge, same
output schema) — the Lee et al. suffix-array-style pass running at
ingest: each micro-batch pays O(batch + state-hash probe), and history
is never re-hashed.

Per batch:

1. span + hash ONLY the new documents (``sliding_spans`` +
   ``md5_hash64`` — one narrow pass, the fan-out stays in the scan);
2. within-batch ownership: lexicographic min (doc, pos) per span hash;
3. cross-batch ownership: batch winners are anti-joined against the
   persistent hash registry (a column-pruned scan of the 8-byte ``h``
   column only);
4. the NEW owners land in the registry as their own wave partition
   (``w=<batch_id>/``) — written FIRST, the batch's one
   materialization barrier (mirroring ``IncrementalChunkDedup``);
5. every span occurrence that did NOT become an owner is a duplicate;
   per doc they merge into maximal ``[span_start, span_end)`` token
   ranges (the batch operator's gaps-and-islands window) and land in
   the output as the wave partition ``w=<batch_id>/``.

Both writes are per-wave directory overwrites, so crash-replays of a
batch are idempotent. A span hash is owned exactly once, in the batch
it first arrives; when batches arrive in ascending id order the union
of per-wave ranges is IDENTICAL to the batch operator (pinned by
tests/test_substring_dedup_incremental.py); under arbitrary arrival
order the owner is the first ARRIVAL — the semantics an ingest
pipeline actually wants.

At 100 TB: the per-batch probe reads one 8-byte column of the registry
— columnar, but O(corpus spans). That is the inherent cost of EXACT
dedup at ingest (same shape as the chunk/near-dedup twins); compact
waves periodically (``compact``) and front the probe with per-wave
Bloom-filter sidecars when wave count grows.

Reference parity: composes the reference's state-node semantics
(beavers dag.py:501-518) with its replay/live driver loop
(kafka.py:534-544); the reference has no dedup surface itself
(README.md:43-50 scope).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from beavers_spark.functions.curation import sliding_spans
from beavers_spark.functions.dedup import md5_hash64
from beavers_spark.streaming.maintenance import (
    BatchWatermark,
    ProbeMetrics,
    WaveBloomIndex,
    WaveMetrics,
    partition_stats,
    table_exists,
)


class IncrementalSubstringDedup:
    """``foreachBatch`` callable maintaining corpus-wide span ownership
    and per-document duplicate token ranges.

    ::

        dedup = IncrementalSubstringDedup(state_path, out_path,
                                          text_col="text", id_col="doc_id")
        stream.writeStream.foreachBatch(dedup).start()

    ``read_dup_ranges(spark)`` returns every duplicate range emitted so
    far (``doc_id, span_start, span_end, n_dup_tokens``);
    ``read_state(spark)`` the span-hash ownership registry.
    """

    def __init__(
        self,
        state_path: str,
        out_path: str,
        text_col: str,
        id_col: str,
        k: int = 8,
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
        #: per-wave registry-append volume (see maintenance.WaveMetrics)
        self.metrics: list[WaveMetrics] = []
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
        """Span ownership registry ``(h, doc_id, idx)`` (the wave column
        ``w`` is a storage detail)."""
        return spark.read.parquet(self.state_path).select("h", "doc_id", "idx")

    def read_dup_ranges(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.out_path).select(
            "doc_id", "span_start", "span_end", "n_dup_tokens"
        )

    def compact(self, spark: SparkSession) -> int:
        """Coarsen all wave partitions into ``w=-1`` on both tables (the
        partition column must survive compaction — see
        ``IncrementalNearDedup.compact``); returns the registry's
        post-compaction file count. Wave Bloom sidecars are OR-merged
        into the coalesced wave (fixed ``m`` makes bitmaps mergeable) —
        if any wave lacks one, no merged sidecar is written and the
        coalesced wave is simply never pruned (conservative)."""
        from beavers_spark.streaming.maintenance import compact_parquet

        compact_parquet(
            spark,
            self.out_path,
            partition_by="w",
            transform=lambda df: df.withColumn("w", F.lit(-1)),
        )
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
            # re-own their unique spans AND re-emit their dup ranges;
            # every doc with >= 1 span left a trace in the registry (its
            # owned spans) or the output (its dup ranges), so the union
            # of both doc_id columns is the seen-set. Both probes are
            # column-pruned and exclude this wave's own half-committed
            # directories (crash-replay safety)
            seen = (
                spark.read.parquet(self.state_path)
                .filter(F.col("w") != batch_id)
                .select("doc_id")
            )
            if table_exists(spark, self.out_path):
                seen = seen.unionByName(
                    spark.read.parquet(self.out_path)
                    .filter(F.col("w") != batch_id)
                    .select("doc_id")
                )
            seen = seen.distinct().withColumnRenamed("doc_id", self.id_col)
            batch = batch.join(seen, self.id_col, "left_anti")

        # repartition before the fan-out: a single-file (or
        # single-partition) batch would serialize span construction +
        # hashing on one core (same rationale as the batch operator)
        parallelism = spark.sparkContext.defaultParallelism
        spans = batch.repartition(parallelism).select(
            F.col(self.id_col).alias("doc_id"),
            F.posexplode(sliding_spans(F.col(self.text_col), self.k)).alias(
                "idx", "span"
            ),
        ).withColumn("h", md5_hash64(F.col("span"))).drop("span")
        occ = F.struct(F.col("doc_id"), F.col("idx"))
        owners = (
            spans.groupBy("h")
            .agg(F.min(occ).alias("owner"))
            .withColumnRenamed("h", "oh")
        )
        winners = spans.join(
            owners, (F.col("h") == F.col("oh")) & (occ == F.col("owner"))
        ).select("h", "doc_id", "idx")
        # the checkpoint is the batch's one heavy materialization: the
        # Bloom-probe collect, the cross-batch anti-join, and the wave
        # write all read the (one-row-per-owned-span) checkpointed
        # result instead of re-hashing the batch
        winners = winners.localCheckpoint()
        pre_h = self._bloom.collect_keys(winners, "h")
        if had_state:
            # cross-batch ownership: any hash already registered wins —
            # the 8-byte h column is the only thing this scan reads.
            # With wave Bloom sidecars, ONLY waves that may contain one
            # of the batch's hashes are scanned (partition pruning on
            # ``w``): a wave whose bitmap rejects every batch hash can
            # contain no match, so excluding it from the anti-join is
            # exact. Efficacy is data-dependent (temporally-local
            # duplication prunes most waves; adversarially-uniform
            # duplication prunes none) — correctness never is.
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
            # bitmap from the PRE-anti hash set (a superset of the
            # registered one — extra bits only add false positives,
            # which cost a wave scan, never correctness)
            self._bloom.save_wave(wave_dir, pre_h)
        self._has_state = True
        new_owned = spark.read.parquet(wave_dir)

        # every occurrence that did not become an owner is a duplicate:
        # within-batch non-minimal occurrences AND batch-minimal
        # occurrences of already-registered hashes both fail this
        # anti-join on the full (h, doc, pos) identity
        dups = spans.join(
            new_owned, ["h", "doc_id", "idx"], "left_anti"
        ).select(
            "doc_id",
            F.col("idx").cast("bigint").alias("s0"),
            (F.col("idx") + self.k).cast("bigint").alias("e0"),
        )
        w_prev = (
            Window.partitionBy("doc_id")
            .orderBy("s0")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        w_run = (
            Window.partitionBy("doc_id")
            .orderBy("s0")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        ranges = (
            dups.withColumn(
                "brk",
                F.when(
                    F.col("s0")
                    <= F.coalesce(F.max("e0").over(w_prev), F.lit(-1)),
                    F.lit(0),
                ).otherwise(F.lit(1)),
            )
            .withColumn("g", F.sum("brk").over(w_run))
            .groupBy("doc_id", "g")
            .agg(F.min("s0").alias("span_start"), F.max("e0").alias("span_end"))
            .select(
                "doc_id",
                "span_start",
                "span_end",
                (F.col("span_end") - F.col("span_start")).alias(
                    "n_dup_tokens"
                ),
            )
        )
        # written even when empty so read_dup_ranges() is valid from
        # batch 0; per-wave overwrite = replay-idempotent output
        ranges.write.mode("overwrite").parquet(
            f"{self.out_path}/w={batch_id}"
        )
        files, nbytes, mx = partition_stats(spark, [wave_dir])
        self.metrics.append(WaveMetrics(batch_id, 1, files, nbytes, mx))
        self._watermark.mark(batch_id)
