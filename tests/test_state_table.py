"""KeyedStateTable: durable latest-row-per-key upsert state, merged one
key-hash bucket at a time via dynamic partition overwrite."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from beavers_spark.operators.tabular import last_by_keys
from beavers_spark.streaming import KeyedStateTable

SCHEMA = "ticker string, price double, seq long"


def _write(dir_path: str, name: str, rows: list[dict], mtime: int) -> None:
    p = os.path.join(dir_path, name)
    with open(p, "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")
    os.utime(p, (mtime, mtime))


def test_streamed_upserts_equal_batch_last_by_keys(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(
        d,
        "b0.json",
        [
            {"ticker": "AAPL", "price": 10.0, "seq": 1},
            {"ticker": "MSFT", "price": 20.0, "seq": 2},
            {"ticker": "AAPL", "price": 11.0, "seq": 3},  # within-batch upsert
        ],
        1_700_000_000,
    )
    _write(
        d,
        "b1.json",
        [
            {"ticker": "AAPL", "price": 12.0, "seq": 4},  # cross-batch upsert
            {"ticker": "GOOG", "price": 30.0, "seq": 5},  # new key
        ],
        1_700_000_001,
    )

    state = KeyedStateTable(
        str(tmp_path / "state"), keys=["ticker"], order_by="seq", n_buckets=8
    )
    stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(d)
    q = (
        stream.writeStream.foreachBatch(state)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r.ticker: (r.price, r.seq) for r in state.read(spark).collect()
    }
    assert got == {
        "AAPL": (12.0, 4),
        "MSFT": (20.0, 2),
        "GOOG": (30.0, 5),
    }

    # incremental state == one-shot batch last_by_keys over all input
    batch = last_by_keys(
        spark.read.schema(SCHEMA).json(d), ["ticker"], ["seq"]
    )
    expected = {r.ticker: (r.price, r.seq) for r in batch.collect()}
    assert got == expected


def test_only_touched_buckets_are_rewritten(spark, tmp_path):
    path = str(tmp_path / "state")
    state = KeyedStateTable(path, keys=["k"], order_by="seq", n_buckets=64)
    base = spark.createDataFrame(
        [(f"key{i}", float(i), 1) for i in range(200)], "k string, v double, seq long"
    )
    state(base, 0)
    dirs_before = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("__bucket=")
    }
    assert len(dirs_before) > 10  # keys spread over many buckets

    # upsert ONE key: exactly one bucket directory may change
    state(
        spark.createDataFrame(
            [("key7", 99.0, 2)], "k string, v double, seq long"
        ),
        1,
    )
    dirs_after = {
        d: os.path.getmtime(os.path.join(path, d))
        for d in os.listdir(path)
        if d.startswith("__bucket=")
    }
    changed = {
        d
        for d in dirs_after
        if d not in dirs_before or dirs_after[d] != dirs_before[d]
    }
    assert len(changed) == 1

    got = {r.k: (r.v, r.seq) for r in state.read(spark).collect()}
    assert got["key7"] == (99.0, 2)
    assert len(got) == 200


def test_order_tie_goes_to_incoming_batch(spark, tmp_path):
    state = KeyedStateTable(
        str(tmp_path / "state"), keys=["k"], order_by="seq", n_buckets=4
    )
    state(spark.createDataFrame([("a", 1.0, 1)], "k string, v double, seq long"), 0)
    state(spark.createDataFrame([("a", 2.0, 1)], "k string, v double, seq long"), 1)
    [row] = state.read(spark).collect()
    assert (row.k, row.v, row.seq) == ("a", 2.0, 1)


def test_fresh_instance_sees_existing_bucket_state(spark, tmp_path):
    """Restart regression (review r12): a keyed-state table's entries
    are ALL underscore-prefixed (``__bucket=<n>`` partition dirs + the
    watermark sidecar), and the old prefix-only hidden rule made a
    fresh instance conclude "no table yet" — its first upsert then
    skipped the merge and dynamic overwrite silently DROPPED the other
    keys sharing the touched buckets. Spark itself treats a
    "_"-prefixed name containing "=" as a partition directory, and
    table_exists now matches that rule."""
    from beavers_spark.streaming import KeyedStateTable
    from beavers_spark.streaming.maintenance import table_exists

    path = str(tmp_path / "ks")
    first = KeyedStateTable(path, keys=["k"], order_by="seq", n_buckets=1)
    first(
        spark.createDataFrame(
            [("a", 1, 10.0), ("b", 1, 20.0)], "k string, seq long, v double"
        ),
        0,
    )
    assert table_exists(spark, path)
    # a RESTARTED instance (fresh object, no in-memory flag) upserts
    # one key — every other key in the shared bucket must survive
    second = KeyedStateTable(path, keys=["k"], order_by="seq", n_buckets=1)
    second(
        spark.createDataFrame(
            [("a", 2, 11.0)], "k string, seq long, v double"
        ),
        1,
    )
    got = {(r.k, r.seq, r.v) for r in second.read(spark).collect()}
    assert got == {("a", 2, 11.0), ("b", 1, 20.0)}
