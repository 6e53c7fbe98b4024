"""Processing-time timeout watchdog (live TimerManager twin).

A stateful query with ProcessingTimeTimeout keeps running no-data
batches so pending timers can fire — so a single run observes the full
lifecycle: timer armed on data (stale=false), stale marker emitted after
``timeout_ms`` of silence (stale=true), state removed. The query never
self-terminates (timers keep it alive), so the test polls the memory
sink and stops it explicitly.
"""

from __future__ import annotations

import json
import os
import time

from beavers_spark.streaming import streaming_timeout_monitor

SCHEMA = "ts timestamp, user string, value double"


def _write(dir_path: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(dir_path, name), "w") as fh:
        for row in rows:
            fh.write(json.dumps(row) + "\n")


def test_timeout_fires_for_stale_key(spark, tmp_path):
    d = str(tmp_path / "in")
    os.makedirs(d)
    _write(
        d,
        "b0.json",
        [
            {"ts": "2024-01-01T00:00:00Z", "user": "a", "value": 1.0},
            {"ts": "2024-01-01T00:00:01Z", "user": "b", "value": 2.0},
        ],
    )

    stream = spark.readStream.schema(SCHEMA).json(d)
    out = streaming_timeout_monitor(stream, ["user"], "ts", timeout_ms=3_000)
    q = (
        out.writeStream.format("memory")
        .queryName("watchdog")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            rows = {
                (r.user, r.stale)
                for r in spark.sql("SELECT user, stale FROM watchdog").collect()
            }
            if ("a", True) in rows and ("b", True) in rows:
                break
            time.sleep(1.0)
    finally:
        q.stop()
    # every key: timer armed on arrival, then stale marker after silence
    assert rows == {("a", False), ("a", True), ("b", False), ("b", True)}

    last_seen = {
        r.user: r.last_seen
        for r in spark.sql(
            "SELECT user, last_seen FROM watchdog WHERE stale"
        ).collect()
    }
    # stale row carries the key's last observed event time
    assert last_seen["a"].second == 0
    assert last_seen["b"].second == 1


def test_event_time_timeout_is_deterministic(spark, tmp_path):
    """Event-time watchdog: the stale marker fires when the WATERMARK
    passes last_seen + timeout — no wall-clock involved, so the test
    needs no sleeps. maxFilesPerTrigger=1 forces one batch per file so
    the watermark advances between batches within one availableNow run."""
    from beavers_spark.streaming import streaming_event_timeout_monitor

    d = str(tmp_path / "in")
    os.makedirs(d)
    # file order == batch order: watermark after b0 = 00:00, after b1 = 00:30
    _write(d, "b0.json", [{"ts": "2024-01-01T00:00:00Z", "user": "a", "value": 1.0}])
    _write(d, "b1.json", [{"ts": "2024-01-01T00:30:00Z", "user": "b", "value": 2.0}])
    # one more batch so the 00:30 watermark (past a's 00:10 deadline) is applied
    _write(d, "b2.json", [{"ts": "2024-01-01T00:31:00Z", "user": "b", "value": 3.0}])
    # the file source orders batches by modification time — pin distinct
    # mtimes so batch order (and thus watermark progression) is stable
    for i, name in enumerate(["b0.json", "b1.json", "b2.json"]):
        os.utime(os.path.join(d, name), (1_700_000_000 + i, 1_700_000_000 + i))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(d)
    )
    out = streaming_event_timeout_monitor(
        stream, ["user"], "ts", timeout_ms=10 * 60 * 1000  # 10 min event time
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ev_watchdog")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    rows = {
        (r.user, r.stale)
        for r in spark.sql("SELECT user, stale FROM ev_watchdog").collect()
    }
    assert ("a", False) in rows  # armed on arrival
    assert ("a", True) in rows  # watermark 00:30 > 00:00+10min -> stale
    assert ("b", False) in rows
    assert ("b", True) not in rows  # watermark never passed b's deadline
