"""Per-key staleness watchdog on a live stream: the distributed twin of
the kernel's TimerManager (reference: dag.py:95-154 — one pending timer
per node; here one per KEY, in the state store).

Uses the EVENT-TIME variant so the example is fully deterministic: the
stale marker fires when the stream's watermark passes
``last_seen + timeout`` — replaying the same data always yields the same
markers (reference replay-parity promise applied to timers).

Run: ``python examples/streaming_watchdog.py``
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beavers_spark.session import get_spark  # noqa: E402
from beavers_spark.streaming import streaming_event_timeout_monitor  # noqa: E402

spark = get_spark("watchdog_example")

d = tempfile.mkdtemp()
SCHEMA = "ts timestamp, sensor string, reading double"

batches = [
    ("b0.json", [{"ts": "2024-01-01T00:00:00Z", "sensor": "pump", "reading": 3.2}]),
    ("b1.json", [{"ts": "2024-01-01T00:20:00Z", "sensor": "fan", "reading": 1.1}]),
    # pump silent for 20 min of EVENT time -> watchdog must flag it
    ("b2.json", [{"ts": "2024-01-01T00:21:00Z", "sensor": "fan", "reading": 1.2}]),
]
for i, (name, rows) in enumerate(batches):
    path = os.path.join(d, name)
    with open(path, "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))
    os.utime(path, (1_700_000_000 + i,) * 2)  # pin batch order

stream = spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(d)
out = streaming_event_timeout_monitor(
    stream, ["sensor"], "ts", timeout_ms=10 * 60 * 1000  # 10 min event time
)
q = (
    out.writeStream.format("memory")
    .queryName("sensor_watchdog")
    .outputMode("update")
    .option("checkpointLocation", os.path.join(d, "ckpt"))
    .trigger(availableNow=True)
    .start()
)
q.awaitTermination(120)

rows = {
    (r.sensor, r.stale)
    for r in spark.sql("SELECT sensor, stale FROM sensor_watchdog").collect()
}
assert ("pump", False) in rows  # armed on arrival
assert ("pump", True) in rows  # flagged stale: watermark passed 00:10
assert ("fan", False) in rows
assert ("fan", True) not in rows  # fan kept reporting

print("streaming_watchdog: all asserts passed")
