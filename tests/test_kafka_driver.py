"""Broker-free behavioral test of the Kafka dag-driver loop, mirroring
the reference's e2e word count (tests/test_kafka.py:474-586,
test_kafka_driver_word_count): messages are fed through a mock poll, the
dag folds per-word totals, and each cycle produces ONLY the words
updated in that cycle with their new totals.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beavers_spark.dag import Dag
from beavers_spark.sources.kafka import KafkaSinkConfig
from beavers_spark.sources.kafka_driver import (
    KafkaDagDriver,
    SinkTopicBinding,
    SourceTopicBinding,
)

CUTOFF = pd.to_datetime("2022-10-19 01:00:00", utc=True)
MSG_SCHEMA = (
    "topic string, partition int, offset long, ts timestamp, "
    "key string, value string"
)


class MockConsumer:
    """Reference MockConsumer analog: a drainable message list."""

    def __init__(self, spark):
        self.spark = spark
        self._pending: list[tuple] = []

    def extend(self, msgs):
        self._pending.extend(msgs)

    def poll(self, timeout: float) -> DataFrame | None:
        if not self._pending:
            return None
        batch, self._pending = self._pending, []
        return self.spark.createDataFrame(batch, MSG_SCHEMA)


class MockProducer:
    """Reference MockProducerManager analog: captures produced rows."""

    def __init__(self):
        self._out: list[tuple[str, str, str]] = []

    def produce(self, topic: str, df: DataFrame) -> None:
        for r in df.orderBy("key").collect():
            self._out.append((topic, r.key, r.value))

    def flush(self):
        out, self._out = self._out, []
        return out


def _msg(ms_from_cutoff: int, word: str, offset: int):
    ts = (
        (CUTOFF + pd.Timedelta(milliseconds=ms_from_cutoff))
        .tz_convert("UTC")
        .tz_localize(None)
        .to_pydatetime()
    )
    return ("topic-a", 0, offset, ts, None, word)


class WordCountState:
    """Durable totals merged per cycle (the reference's WordCount state
    node, Spark-first: DataFrame state, updated keys only downstream)."""

    def __init__(self, spark):
        self.spark = spark
        self.totals = spark.createDataFrame([], "word string, count long")

    def __call__(self, batch_counts: DataFrame) -> DataFrame:
        merged = (
            self.totals.unionByName(batch_counts)
            .groupBy("word")
            .agg(F.sum("count").alias("count"))
        )
        self.totals = merged
        return merged

    def counts(self) -> dict[str, int]:
        return {r.word: r["count"] for r in self.totals.collect()}


def _build_dag(spark):
    dag = Dag(spark=spark)
    source = dag.source_table("value string, ts timestamp", name="messages")
    batch_counts = dag.table_stream(
        lambda df: df.groupBy(F.col("value").alias("word")).agg(
            F.count(F.lit(1)).alias("count")
        ),
        "word string, count long",
    ).map(source)
    word_count = WordCountState(spark)
    totals = dag.state(word_count).map(batch_counts)
    # per-cycle delta: totals restricted to this batch's words
    updated = dag.table_stream(
        lambda tot, bc: tot.join(bc.select("word"), "word"),
        "word string, count long",
    ).map(totals, batch_counts)
    dag.sink("results", updated)
    return dag, word_count


def test_kafka_driver_word_count(spark):
    dag, word_count = _build_dag(spark)
    consumer = MockConsumer(spark)
    producer = MockProducer()

    driver = KafkaDagDriver(
        dag,
        sources=[
            SourceTopicBinding(
                topic="topic-a",
                node=dag.get_sources()["messages"],
                deserializer=lambda df: df.select("value", "ts"),
            )
        ],
        sinks=[
            SinkTopicBinding(
                sink_name="results",
                config=KafkaSinkConfig("topic-out", key_column="word"),
            )
        ],
        poll=consumer.poll,
        produce=producer.produce,
    )

    # no messages, no timers: idle cycle
    assert driver.run_cycle(0.0) is False
    assert producer.flush() == []

    consumer.extend(
        [
            _msg(-10, "FOO", 0),
            _msg(-9, "BAR", 1),
            _msg(-8, "FOO", 2),
            _msg(-7, "BARZ", 3),
        ]
    )
    assert driver.run_cycle(0.0) is True
    assert word_count.counts() == {"FOO": 2, "BAR": 1, "BARZ": 1}
    produced = producer.flush()
    assert [(t, k) for t, k, _ in produced] == [
        ("topic-out", "BAR"),
        ("topic-out", "BARZ"),
        ("topic-out", "FOO"),
    ]
    # values are the full-row JSON of the updated (word, count) rows
    assert json.loads(dict((k, v) for _, k, v in produced)["FOO"]) == {
        "word": "FOO",
        "count": 2,
    }

    # idle again: nothing produced, dag not pumped
    assert driver.run_cycle(0.0) is False
    assert producer.flush() == []

    # a later message updates ONLY its word
    consumer.extend([_msg(+10, "FOO", 4)])
    assert driver.run_cycle(0.0) is True
    produced = producer.flush()
    assert [(t, k) for t, k, _ in produced] == [("topic-out", "FOO")]
    assert json.loads(produced[0][2]) == {"word": "FOO", "count": 3}
    assert word_count.counts() == {"FOO": 3, "BAR": 1, "BARZ": 1}

    metrics = driver.flush_metrics()
    assert metrics.poll_count == 4
    assert metrics.message_count == 5
    assert metrics.execution_count == 2
    assert metrics.execution_ns > 0
    assert metrics.serialization_count == 2


def test_kafka_driver_multi_topic_routing(spark):
    """Messages route per topic to their bound source nodes; a cycle
    with traffic on one topic leaves the other source empty."""
    dag = Dag(spark=spark)
    a = dag.source_table("value string, ts timestamp", name="a")
    b = dag.source_table("value string, ts timestamp", name="b")
    seen: dict[str, list[str]] = {"a": [], "b": []}

    def recorder(name):
        def rec(df):
            vals = [r.value for r in df.collect()]
            seen[name].extend(vals)
            return df

        return rec

    dag.sink("a_out", dag.table_stream(recorder("a"), "value string, ts timestamp").map(a))
    dag.sink("b_out", dag.table_stream(recorder("b"), "value string, ts timestamp").map(b))

    consumer = MockConsumer(spark)
    producer = MockProducer()
    driver = KafkaDagDriver(
        dag,
        sources=[
            SourceTopicBinding("topic-a", a, lambda df: df.select("value", "ts")),
            SourceTopicBinding("topic-b", b, lambda df: df.select("value", "ts")),
        ],
        sinks=[],
        poll=consumer.poll,
        produce=producer.produce,
    )
    consumer.extend([_msg(-5, "only-a", 0)])
    assert driver.run_cycle(0.0) is True
    assert seen == {"a": ["only-a"], "b": []}

    consumer.extend(
        [
            _msg(-4, "a2", 1),
            ("topic-b", 0, 0, _msg(-4, "x", 0)[3], None, "b1"),
        ]
    )
    assert driver.run_cycle(0.0) is True
    assert seen == {"a": ["only-a", "a2"], "b": ["b1"]}
