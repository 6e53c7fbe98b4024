"""ContinuousRollup: incrementally-maintained time-bucketed aggregate
(continuous-aggregate / hypertable-rollup pattern)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from beavers_spark.streaming import ContinuousRollup

SCHEMA = "ts timestamp, event_type string, value double"


def _write(dir_path: str, name: str, rows: list[dict], mtime: int) -> None:
    p = os.path.join(dir_path, name)
    with open(p, "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")
    os.utime(p, (mtime, mtime))


def test_continuous_rollup_incremental_equals_batch(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(
        d,
        "b0.json",
        [
            {"ts": "2024-01-01T00:10:00Z", "event_type": "click", "value": 1.0},
            {"ts": "2024-01-01T00:40:00Z", "event_type": "click", "value": 2.0},
            {"ts": "2024-01-01T01:05:00Z", "event_type": "view", "value": 5.0},
        ],
        1_700_000_000,
    )
    _write(
        d,
        "b1.json",
        [
            # same hour-0 bucket as b0 (merge) + late row + a new hour
            {"ts": "2024-01-01T00:55:00Z", "event_type": "click", "value": 4.0},
            {"ts": "2024-01-01T02:30:00Z", "event_type": "click", "value": 8.0},
        ],
        1_700_000_001,
    )

    rollup = ContinuousRollup(
        str(tmp_path / "rollup"),
        ts_col="ts",
        keys=["event_type"],
        sum_col="value",
        bucket="1 hour",
    )
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(d)
    q = (
        stream.writeStream.foreachBatch(rollup)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (str(r.bucket), r.event_type): (r.n, r.total)
        for r in rollup.read(spark).collect()
    }
    # hour 0 'click' merged across batches: 1+2+4; untouched buckets intact
    assert got == {
        ("2024-01-01 00:00:00", "click"): (3, 7.0),
        ("2024-01-01 01:00:00", "view"): (1, 5.0),
        ("2024-01-01 02:00:00", "click"): (1, 8.0),
    }

    # incremental result == one-shot batch recompute over all input
    batch = (
        spark.read.schema(SCHEMA)
        .json(d)
        .groupBy(F.window("ts", "1 hour").start.alias("bucket"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
    )
    expected = {
        (str(r.bucket), r.event_type): (r.n, r.total) for r in batch.collect()
    }
    assert got == expected
