"""BatchWatermark: foreachBatch replays (same batch_id re-delivered
after a restart) must not corrupt non-idempotent state."""

from __future__ import annotations

from pyspark.sql import functions as F

from beavers_spark.plans.common import t
from beavers_spark.streaming import (
    ContinuousRollup,
    IncrementalIVFIndex,
    IncrementalNearDedup,
    KeyedStateTable,
)

SF_DIR = "/root/testdata/sf0.001"


def test_rollup_replayed_batch_does_not_double_count(spark, tmp_path):
    rollup = ContinuousRollup(
        str(tmp_path / "r"), ts_col="ts", keys=["k"], sum_col="v",
        bucket="1 hour",
    )
    batch = spark.createDataFrame(
        [("2024-01-01T00:10:00", "a", 2.0), ("2024-01-01T00:20:00", "a", 3.0)],
        "ts string, k string, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rollup(batch, 0)
    rollup(batch, 0)  # replay of the SAME batch id
    [row] = rollup.read(spark).collect()
    assert (row.n, row.total) == (2, 5.0)
    rollup(batch, 1)  # a genuinely new batch still merges
    [row] = rollup.read(spark).collect()
    assert (row.n, row.total) == (4, 10.0)


def test_dedup_replayed_batch_does_not_duplicate_state_or_pairs(
    spark, tmp_path
):
    docs = t(spark, SF_DIR, "documents").select("doc_id", "text").limit(120)
    dedup = IncrementalNearDedup(
        state_path=str(tmp_path / "s"),
        pairs_path=str(tmp_path / "p"),
        text_col="text",
        id_col="doc_id",
        threshold=0.2,
    )
    dedup(docs, 0)
    state_rows = dedup.read_state(spark).count()
    pair_rows = dedup.read_pairs(spark).count()
    dedup(docs, 0)  # replay
    assert dedup.read_state(spark).count() == state_rows
    assert dedup.read_pairs(spark).count() == pair_rows


def test_ivf_replayed_batch_does_not_duplicate_index(spark, tmp_path):
    emb = t(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    index = IncrementalIVFIndex(
        str(tmp_path / "ivf"), id_col="vec_id", n_cells=4
    )
    index(emb, 0)
    n = index.read_index(spark).count()
    index(emb, 0)  # replay
    assert index.read_index(spark).count() == n


def test_state_table_replay_skipped(spark, tmp_path):
    state = KeyedStateTable(
        str(tmp_path / "st"), keys=["k"], order_by="seq", n_buckets=4
    )
    b0 = spark.createDataFrame([("a", 1.0, 1)], "k string, v double, seq long")
    state(b0, 0)
    state(b0, 0)  # replay: no-op (merge is idempotent anyway)
    [row] = state.read(spark).collect()
    assert (row.k, row.v, row.seq) == ("a", 1.0, 1)
