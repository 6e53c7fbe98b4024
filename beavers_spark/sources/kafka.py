"""Kafka live-mode integration expressed as Structured Streaming options.

The reference implements a consumer manager with six start-offset
policies, timestamp-aligned priming, partition-pause backpressure and a
fire-and-forget producer (beavers/kafka.py:45-141, 247-396, 181-221).
Spark's Kafka source subsumes most of that machinery natively:

| reference mechanism                | Spark equivalent (set here)        |
|------------------------------------|------------------------------------|
| OffsetPolicy latest/earliest       | ``startingOffsets``                |
| relative-time / start-of-day / abs | ``startingOffsetsByTimestamp``     |
| committed group offsets            | checkpointed offsets (stronger)    |
| batch_size admission (5000/cycle)  | ``maxOffsetsPerTrigger``           |
| partition pause/resume             | built-in admission control         |
| JSON<->Arrow serde                 | ``from_json`` / ``to_json``        |

The cross-topic priming watermark (kafka.py:298-346) has no Spark knob;
``streaming.alignment.AlignedReleaseDriver`` implements it at the
``foreachBatch`` boundary — wrap this reader's output in it during
catch-up to release rows in global event-time order up to the lagging
topic's low-water-mark (semantics mirrored from reference
tests/test_kafka.py:194-285 in tests/test_kafka_alignment.py).

No Kafka broker exists in this container: ``kafka_reader`` builds and
returns the configured reader/plan; integration is exercised against the
option dict in tests and would run unchanged on a real cluster.
"""

from __future__ import annotations

import dataclasses
import json
from enum import Enum

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class OffsetPolicy(Enum):
    """Start-position policies (reference: kafka.py:45-141)."""

    LATEST = "latest"
    EARLIEST = "earliest"
    RELATIVE_TIME = "relative_time"
    START_OF_DAY = "start_of_day"
    ABSOLUTE_TIME = "absolute_time"
    COMMITTED = "committed"


@dataclasses.dataclass(frozen=True)
class KafkaSourceConfig:
    """One subscribed topic and how to start reading it."""

    topic: str
    policy: OffsetPolicy = OffsetPolicy.LATEST
    relative: pd.Timedelta | None = None  # for RELATIVE_TIME
    timezone: str = "UTC"  # for START_OF_DAY (reference: kafka.py:655-664)
    absolute: pd.Timestamp | None = None  # for ABSOLUTE_TIME
    value_schema: str | None = None  # spark DDL for from_json

    def starting_timestamp(self, now: pd.Timestamp) -> int | None:
        """Millisecond start timestamp for timestamp-based policies."""
        if self.policy == OffsetPolicy.RELATIVE_TIME:
            if self.relative is None:
                raise ValueError("RELATIVE_TIME needs relative=")
            return int((now - self.relative).timestamp() * 1000)
        if self.policy == OffsetPolicy.START_OF_DAY:
            local = now.tz_convert(self.timezone)
            start = local.normalize()
            return int(start.timestamp() * 1000)
        if self.policy == OffsetPolicy.ABSOLUTE_TIME:
            if self.absolute is None:
                raise ValueError("ABSOLUTE_TIME needs absolute=")
            return int(self.absolute.timestamp() * 1000)
        return None


@dataclasses.dataclass(frozen=True)
class KafkaSinkConfig:
    topic: str
    key_column: str | None = None


def reader_options(
    configs: list[KafkaSourceConfig],
    bootstrap_servers: str,
    batch_size: int = 5000,
    now: pd.Timestamp | None = None,
    topic_partitions: dict[str, int] | None = None,
) -> dict[str, str]:
    """Build the Structured Streaming option dict for N topics on one
    consumer (reference: one consumer, N topics, kafka.py:463-527;
    batch_size default 5000, kafka.py:493).

    Start-position resolution is broker-correct: Spark's
    ``startingOffsetsByTimestamp`` JSON requires EXPLICIT partition
    numbers (there is no ``-1`` wildcard), so:

    - all topics LATEST/COMMITTED -> ``startingOffsets=latest``; all
      topics EARLIEST -> ``startingOffsets=earliest``.
    - all topics on timestamp policies resolving to the SAME millisecond
      -> the global ``startingTimestamp`` option, which applies to every
      partition without needing partition ids.
    - any other mix needs real partition counts: pass ``topic_partitions``
      ({topic: n_partitions}, e.g. from AdminClient.describe_topics) and
      every topic is emitted into one explicit
      ``startingOffsetsByTimestamp`` map — timestamp policies use their
      resolved ms, EARLIEST uses ms 0 (``offsetsForTimes(0)`` = log
      start), LATEST/COMMITTED use ``now`` ms — with
      ``startingOffsetsByTimestampStrategy=latest`` so partitions with no
      message at/after the timestamp start at the log end.
    - otherwise raise. (Silently starting a LATEST topic at ``earliest``
      — the round-1 behavior — replays the topic's full history.)
    """
    now = now or pd.Timestamp.now(tz="UTC")
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(c.topic for c in configs),
        "maxOffsetsPerTrigger": str(batch_size),
        "failOnDataLoss": "false",
    }
    start_ms: dict[str, int | None] = {
        c.topic: c.starting_timestamp(now) for c in configs
    }
    simple: dict[str, str] = {
        c.topic: ("earliest" if c.policy == OffsetPolicy.EARLIEST else "latest")
        # LATEST and COMMITTED both start at the log head on a fresh
        # checkpoint; COMMITTED resumes from checkpointed offsets.
        for c in configs
        if start_ms[c.topic] is None
    }
    ts_values = {ms for ms in start_ms.values() if ms is not None}
    if not ts_values:
        vals = set(simple.values())
        if len(vals) == 1:
            opts["startingOffsets"] = vals.pop()
            return opts
    elif not simple and len(ts_values) == 1:
        opts["startingTimestamp"] = str(ts_values.pop())
        opts["startingOffsetsByTimestampStrategy"] = "latest"
        return opts
    if topic_partitions is None:
        raise ValueError(
            "mixed start policies across topics need explicit partition "
            "counts: pass topic_partitions={topic: n_partitions} (Spark's "
            "per-topic timestamp/offset JSON has no partition wildcard)"
        )
    missing = [c.topic for c in configs if c.topic not in topic_partitions]
    if missing:
        raise ValueError(f"topic_partitions missing entries for {missing}")
    now_ms = int(now.timestamp() * 1000)
    by_ts = {
        topic: {
            str(p): (
                ms
                if ms is not None
                else (0 if simple.get(topic) == "earliest" else now_ms)
            )
            for p in range(topic_partitions[topic])
        }
        for topic, ms in start_ms.items()
    }
    opts["startingOffsetsByTimestamp"] = json.dumps(by_ts)
    opts["startingOffsetsByTimestampStrategy"] = "latest"
    return opts


def kafka_reader(
    spark: SparkSession,
    configs: list[KafkaSourceConfig],
    bootstrap_servers: str,
    batch_size: int = 5000,
    now: pd.Timestamp | None = None,
    topic_partitions: dict[str, int] | None = None,
) -> DataFrame:
    """Streaming reader over the configured topics, payload deserialized
    per-topic when a value_schema is declared (reference serde:
    pyarrow_kafka.py:16-34 -> from_json). ``topic_partitions`` is required
    when start policies mix across topics — see :func:`reader_options`."""
    schemas = {c.value_schema for c in configs if c.value_schema}
    if schemas and (
        len(schemas) > 1 or any(not c.value_schema for c in configs)
    ):
        # a single returned frame cannot carry differently-typed payload
        # columns, and silently dropping the schemaless topics' rows
        # (the round-1 behavior) is data loss. Per-topic
        # deserialization belongs at the routing seam
        # (kafka_driver.SourceTopicBinding.deserializer).
        raise ValueError(
            "kafka_reader can parse a payload only when EVERY topic "
            "declares the SAME value_schema; for mixed or per-topic "
            "schemas leave value_schema unset and deserialize per topic "
            "via SourceTopicBinding.deserializer"
        )
    opts = reader_options(configs, bootstrap_servers, batch_size, now, topic_partitions)
    reader = spark.readStream.format("kafka")
    for k, v in opts.items():
        reader = reader.option(k, v)
    df = reader.load()
    out = df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.col("timestamp").alias("ts"),
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
    if not schemas:
        return out
    return out.withColumn(
        "payload", F.from_json(F.col("value"), schemas.pop())
    )


def serialize_for_kafka(
    df: DataFrame, config: KafkaSinkConfig, key_expr: Column | None = None
) -> DataFrame:
    """Project to the (key, value) shape the Kafka sink requires
    (reference: _RuntimeSinkTopic.serialize, kafka.py:449-460 ->
    to_json of the full row)."""
    key = (
        key_expr
        if key_expr is not None
        else (
            F.col(config.key_column).cast("string")
            if config.key_column
            else F.lit(None).cast("string")
        )
    )
    return df.select(
        key.alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("value"),
        F.lit(config.topic).alias("topic"),
    )


def kafka_writer(
    df: DataFrame,
    config: KafkaSinkConfig,
    bootstrap_servers: str,
    checkpoint_dir: str,
):
    """Configured writeStream for a serialized frame; caller ``.start()``s
    it (no broker in this container)."""
    return (
        serialize_for_kafka(df, config)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("checkpointLocation", checkpoint_dir)
    )
