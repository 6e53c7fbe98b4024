"""Spark 4 arbitrary-state-v2 timer twin (transformWithStateInPandas).

The v2 worker speaks protobuf to the state server; this container does
not ship ``google.protobuf``, so the e2e test env-gates on its
availability (same pattern as the real-broker Kafka e2e) and lights up
wherever protobuf exists. The RuntimeError guard and the output-schema
contract are testable everywhere.
"""

from __future__ import annotations

import importlib.util
import json
import os
import time

import pytest

from beavers_spark.streaming import streaming_timeout_monitor_v2

try:
    # find_spec imports the parent package, so a missing ``google``
    # namespace raises rather than returning None
    HAS_PROTOBUF = importlib.util.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    HAS_PROTOBUF = False

SCHEMA = "ts timestamp, user string, value double"


def test_raises_clearly_without_protobuf(spark, tmp_path):
    if HAS_PROTOBUF:
        pytest.skip("protobuf present: the e2e below covers this env")
    d = str(tmp_path / "in")
    os.makedirs(d)
    stream = spark.readStream.schema(SCHEMA).json(d)
    with pytest.raises(RuntimeError, match="protobuf"):
        streaming_timeout_monitor_v2(stream, ["user"], "ts", timeout_ms=1000)


@pytest.mark.skipif(
    not HAS_PROTOBUF,
    reason="transformWithStateInPandas worker needs google.protobuf "
    "(not shipped in this container); test lights up where it exists",
)
def test_v2_timer_lifecycle_matches_v1_contract(spark, tmp_path):
    """Same lifecycle the applyInPandasWithState twin pins
    (tests/test_streaming_timeout.py): stale=false on arrival (timer
    armed), stale=true with the key's last_seen after timeout_ms of
    silence, state cleared."""
    d = str(tmp_path / "in")
    os.makedirs(d)
    with open(os.path.join(d, "b0.json"), "w") as fh:
        fh.write(
            json.dumps(
                {"ts": "2024-01-01T00:00:00Z", "user": "a", "value": 1.0}
            )
            + "\n"
        )
    stream = spark.readStream.schema(SCHEMA).json(d)
    out = streaming_timeout_monitor_v2(
        stream, ["user"], "ts", timeout_ms=3_000
    )
    assert out.schema.simpleString() == (
        "struct<user:string,last_seen:timestamp,stale:boolean>"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("watchdog_v2")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    rows: set = set()
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            rows = {
                (r.user, r.stale)
                for r in spark.sql(
                    "SELECT user, stale FROM watchdog_v2"
                ).collect()
            }
            if ("a", True) in rows:
                break
            time.sleep(1.0)
    finally:
        q.stop()
    assert rows == {("a", False), ("a", True)}
