"""Kafka option mapping (reference behaviors: offset-policy resolution
tests/test_kafka.py:950-1278; batching kafka.py:493). No broker in this
container — we verify the generated Structured Streaming configuration
and the serde projections, which is the integration surface Spark owns.
"""

from __future__ import annotations

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beavers_spark.sources import (
    KafkaSinkConfig,
    KafkaSourceConfig,
    OffsetPolicy,
)
from beavers_spark.sources.kafka import reader_options, serialize_for_kafka

NOW = pd.Timestamp("2024-06-15T12:30:00Z")


def test_latest_and_earliest_policies():
    opts = reader_options(
        [
            KafkaSourceConfig("a", OffsetPolicy.LATEST),
            KafkaSourceConfig("b", OffsetPolicy.LATEST),
        ],
        "broker:9092",
        now=NOW,
    )
    assert opts["subscribe"] == "a,b"
    assert opts["startingOffsets"] == "latest"
    assert opts["maxOffsetsPerTrigger"] == "5000"  # reference default batch_size


def test_relative_time_policy_uses_global_starting_timestamp():
    # a uniform timestamp policy needs no partition ids: the global
    # startingTimestamp option applies to every partition
    opts = reader_options(
        [KafkaSourceConfig("t", OffsetPolicy.RELATIVE_TIME, relative=pd.Timedelta(hours=2))],
        "broker:9092",
        now=NOW,
    )
    expect = int((NOW - pd.Timedelta(hours=2)).timestamp() * 1000)
    assert opts["startingTimestamp"] == str(expect)
    assert opts["startingOffsetsByTimestampStrategy"] == "latest"
    assert "startingOffsetsByTimestamp" not in opts


def test_start_of_day_policy_respects_timezone():
    # reference: start-of-day in a configured tz (kafka.py:655-664)
    cfg = KafkaSourceConfig("t", OffsetPolicy.START_OF_DAY, timezone="America/New_York")
    start_ms = cfg.starting_timestamp(NOW)
    start = pd.Timestamp(start_ms, unit="ms", tz="UTC").tz_convert("America/New_York")
    assert (start.hour, start.minute) == (0, 0)
    assert start.date() == NOW.tz_convert("America/New_York").date()


def test_absolute_time_policy():
    at = pd.Timestamp("2024-06-01T00:00:00Z")
    opts = reader_options(
        [KafkaSourceConfig("t", OffsetPolicy.ABSOLUTE_TIME, absolute=at)],
        "broker:9092",
        now=NOW,
    )
    assert opts["startingTimestamp"] == str(int(at.timestamp() * 1000))


def test_mixed_policies_require_partition_counts():
    # Spark's per-topic timestamp JSON has no partition wildcard, so a
    # policy mix without real partition ids must raise, not silently
    # replay LATEST topics from earliest (round-1 bug)
    configs = [
        KafkaSourceConfig("hist", OffsetPolicy.EARLIEST),
        KafkaSourceConfig("live", OffsetPolicy.RELATIVE_TIME, relative=pd.Timedelta(minutes=5)),
    ]
    with pytest.raises(ValueError, match="topic_partitions"):
        reader_options(configs, "broker:9092", now=NOW)


def test_mixed_policies_with_partition_counts():
    configs = [
        KafkaSourceConfig("hist", OffsetPolicy.EARLIEST),
        KafkaSourceConfig("tail", OffsetPolicy.LATEST),
        KafkaSourceConfig("live", OffsetPolicy.RELATIVE_TIME, relative=pd.Timedelta(minutes=5)),
    ]
    opts = reader_options(
        configs, "broker:9092", now=NOW,
        topic_partitions={"hist": 2, "tail": 1, "live": 3},
    )
    by_ts = json.loads(opts["startingOffsetsByTimestamp"])
    live_ms = int((NOW - pd.Timedelta(minutes=5)).timestamp() * 1000)
    now_ms = int(NOW.timestamp() * 1000)
    # every partition id explicit, every topic covered by the ONE option
    assert by_ts["hist"] == {"0": 0, "1": 0}  # offsetsForTimes(0) = log start
    assert by_ts["tail"] == {"0": now_ms}  # nothing at/after now -> strategy
    assert by_ts["live"] == {"0": live_ms, "1": live_ms, "2": live_ms}
    assert opts["startingOffsetsByTimestampStrategy"] == "latest"

    with pytest.raises(ValueError, match="missing entries"):
        reader_options(
            configs, "broker:9092", now=NOW, topic_partitions={"hist": 2}
        )


def test_kafka_serialization_shape(spark):
    df = spark.createDataFrame([("w1", 3)], "word string, n long")
    out = serialize_for_kafka(df, KafkaSinkConfig("counts", key_column="word"))
    row = out.collect()[0]
    assert row.key == "w1"
    assert json.loads(row.value) == {"word": "w1", "n": 3}
    assert row.topic == "counts"


def test_kafka_serialization_without_key(spark):
    df = spark.createDataFrame([(1,)], "x long")
    row = serialize_for_kafka(df, KafkaSinkConfig("t")).collect()[0]
    assert row.key is None


def test_kafka_reader_rejects_mixed_value_schemas(spark):
    """Mixed / partial value_schema declarations would either silently
    drop the schemaless topics' rows or fail at union type-check depth;
    the reader refuses up front with the per-topic-deserializer hint."""
    import pytest

    from beavers_spark.sources.kafka import KafkaSourceConfig, kafka_reader

    with pytest.raises(ValueError, match="SAME value_schema"):
        kafka_reader(
            spark,
            [
                KafkaSourceConfig(topic="a", value_schema="x int"),
                KafkaSourceConfig(topic="b"),
            ],
            "localhost:9092",
        )
    with pytest.raises(ValueError, match="SAME value_schema"):
        kafka_reader(
            spark,
            [
                KafkaSourceConfig(topic="a", value_schema="x int"),
                KafkaSourceConfig(topic="b", value_schema="y string"),
            ],
            "localhost:9092",
        )
