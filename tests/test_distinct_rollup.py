"""ContinuousDistinct: incrementally-merged HLL sketches must equal a
one-shot sketch over all input — the property plain counts cannot have
(returning entities would double-count)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from beavers_spark.plans.common import t
from beavers_spark.streaming import ContinuousDistinct

SCHEMA = "ts timestamp, event_type string, user_id string"


def _write(dir_path: str, name: str, rows: list[dict], mtime: int) -> None:
    p = os.path.join(dir_path, name)
    with open(p, "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")
    os.utime(p, (mtime, mtime))


def test_incremental_sketches_equal_batch(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(
        d,
        "b0.json",
        [
            {"ts": "2024-01-01T00:05:00Z", "event_type": "click", "user_id": "u1"},
            {"ts": "2024-01-01T00:10:00Z", "event_type": "click", "user_id": "u2"},
            {"ts": "2024-01-01T01:10:00Z", "event_type": "view", "user_id": "u1"},
        ],
        1_700_000_000,
    )
    _write(
        d,
        "b1.json",
        [
            # u1/u2 return in hour 0: a naive count-merge would say 4
            {"ts": "2024-01-01T00:30:00Z", "event_type": "click", "user_id": "u1"},
            {"ts": "2024-01-01T00:45:00Z", "event_type": "click", "user_id": "u3"},
            {"ts": "2024-01-01T00:50:00Z", "event_type": "click", "user_id": "u2"},
        ],
        1_700_000_001,
    )

    uniq = ContinuousDistinct(
        str(tmp_path / "u"),
        ts_col="ts",
        keys=["event_type"],
        entity_col="user_id",
        bucket="1 hour",
    )
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(d)
    q = (
        stream.writeStream.foreachBatch(uniq)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.bucket), r.event_type): r.n_distinct
        for r in uniq.read(spark).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "click"): 3,  # u1,u2,u3 — not 5 rows
        ("2024-01-01 01:00:00", "view"): 1,
    }

    # incremental merge == one-shot sketch over everything
    batch = (
        spark.read.schema(SCHEMA)
        .json(d)
        .groupBy(F.window("ts", "1 hour").start.alias("bucket"), "event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
            .cast("long")
            .alias("n_distinct")
        )
    )
    expected = {
        (str(r.bucket), r.event_type): r.n_distinct for r in batch.collect()
    }
    assert got == expected


def test_events_table_rollup_and_replay_guard(spark, tmp_path):
    ev = t(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "event_type", "user_id"
    )
    uniq = ContinuousDistinct(
        str(tmp_path / "u"),
        ts_col="ts",
        keys=["event_type"],
        entity_col="user_id",
        bucket="1 day",
    )
    uniq(ev, 0)
    got = {
        (str(r.bucket), r.event_type): r.n_distinct
        for r in uniq.read(spark).collect()
    }
    uniq(ev, 0)  # replayed batch: state unchanged
    again = {
        (str(r.bucket), r.event_type): r.n_distinct
        for r in uniq.read(spark).collect()
    }
    assert got == again and got

    # further mergeability: day buckets roll into per-type totals whose
    # estimate equals sketching the whole column directly
    total = {
        r.event_type: r.n
        for r in uniq.read_sketches(spark)
        .groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch"))
            .cast("long")
            .alias("n")
        )
        .collect()
    }
    direct = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
            .cast("long")
            .alias("n")
        )
        .collect()
    }
    assert total == direct
