"""Kafka live-mode wiring: offset policies, serde, sink projection
(reference example: examples/kafka_concepts.py + driver machinery
beavers/kafka.py — re-expressed as Structured Streaming configuration).

No broker runs in this container, so this example exercises the full
configuration surface — the part the engine owns. The identical dag code
runs against files in examples/replay_csv.py: that interchangeability IS
the batch/stream parity promise.

Run: ``python examples/kafka_concepts.py``
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.session import get_spark  # noqa: E402
from beavers_spark.sources import (  # noqa: E402
    KafkaSinkConfig,
    KafkaSourceConfig,
    OffsetPolicy,
)
from beavers_spark.sources.kafka import (  # noqa: E402
    reader_options,
    serialize_for_kafka,
)

NOW = pd.Timestamp("2024-06-15T12:30:00Z")

# -- offset policies -> startingOffsets[ByTimestamp] -------------------
# (reference: 6 policies, kafka.py:72-141; start-of-day honors a tz,
# kafka.py:655-664)
# Topics with DIFFERENT start timestamps need explicit partition counts:
# Spark's startingOffsetsByTimestamp JSON has no partition wildcard, so
# reader_options asks for {topic: n_partitions} (from AdminClient
# metadata in production) and emits every partition explicitly.
opts = reader_options(
    [
        KafkaSourceConfig("trades", OffsetPolicy.START_OF_DAY, timezone="America/New_York"),
        KafkaSourceConfig("quotes", OffsetPolicy.RELATIVE_TIME, relative=pd.Timedelta(minutes=30)),
    ],
    bootstrap_servers="broker:9092",
    now=NOW,
    topic_partitions={"trades": 2, "quotes": 1},
)
assert opts["subscribe"] == "trades,quotes"
assert opts["maxOffsetsPerTrigger"] == "5000"  # reference batch_size default

by_ts = json.loads(opts["startingOffsetsByTimestamp"])
# NY start-of-day for 12:30Z on 2024-06-15 is 04:00Z (EDT)
sod_ms = int(pd.Timestamp("2024-06-15T04:00:00Z").timestamp() * 1000)
rel_ms = int((NOW - pd.Timedelta(minutes=30)).timestamp() * 1000)
assert by_ts["trades"] == {"0": sod_ms, "1": sod_ms}
assert by_ts["quotes"] == {"0": rel_ms}

# A single shared timestamp policy needs no partition metadata at all —
# it maps to the global startingTimestamp option.
uniform = reader_options(
    [
        KafkaSourceConfig("trades", OffsetPolicy.RELATIVE_TIME, relative=pd.Timedelta(minutes=30)),
        KafkaSourceConfig("quotes", OffsetPolicy.RELATIVE_TIME, relative=pd.Timedelta(minutes=30)),
    ],
    bootstrap_servers="broker:9092",
    now=NOW,
)
assert uniform["startingTimestamp"] == str(rel_ms)

# -- sink projection: row -> (key, value JSON, topic) ------------------
# (reference: _RuntimeSinkTopic.serialize, kafka.py:449-460)
spark = get_spark("kafka_concepts_example")
navs = spark.createDataFrame(
    [("TECH", 133.33), ("NEW", None)], "etf string, nav double"
)
wire = serialize_for_kafka(navs, KafkaSinkConfig("navs-out", key_column="etf"))
rows = {r.key: r for r in wire.collect()}
assert rows["TECH"].topic == "navs-out"
assert json.loads(rows["TECH"].value) == {"etf": "TECH", "nav": 133.33}
assert json.loads(rows["NEW"].value) == {"etf": "NEW"}  # null dropped by to_json

# -- value deserialization is the from_json projection ------------------
payload = spark.createDataFrame([('{"price": 1.5, "qty": 3}',)], "value string")
parsed = payload.select(F.from_json("value", "price double, qty int").alias("p")).select("p.*")
assert parsed.collect()[0].asDict() == {"price": 1.5, "qty": 3}

print("kafka_concepts: all asserts passed")
