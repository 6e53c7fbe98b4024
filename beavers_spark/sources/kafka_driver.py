"""The Kafka dag-driver loop: poll -> deserialize -> dag cycle ->
serialize -> produce, broker-free testable.

Spark twin of the reference's ``KafkaDriver`` (kafka.py:534-620): the
reference owns a confluent consumer/producer pair and pumps its dag once
per poll; here the loop is expressed against two injected callables —

- ``poll(timeout) -> DataFrame | None``: kafka-shaped rows ``(topic,
  partition, offset, ts, key, value)``. In production this is the
  micro-batch handed to ``foreachBatch`` by ``kafka_reader``'s stream
  (optionally re-ordered through
  ``streaming.alignment.AlignedReleaseDriver``); in tests it is a mock
  list — the reference tests the same seam with MockConsumer
  (tests/test_kafka.py:69-163).
- ``produce(topic, DataFrame)``: receives ``serialize_for_kafka``-shaped
  rows ``(key, value, topic)``. Production: the frame is written with
  ``df.write.format("kafka")``; tests capture it.

Cycle semantics preserved (reference kafka.py:560-597):
- one poll = one dag cycle; an empty poll runs a cycle only when a
  timer is due, else reports idle (returns False);
- the cycle clock is the max message timestamp of the poll (the
  reference pumps with the latest consumed time);
- each sink topic emits only if its nodes UPDATED in this cycle, and
  only the updated rows (the per-cycle delta, not the full state).
"""

from __future__ import annotations

import dataclasses
import time
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beavers_spark.dag import Dag, Node
from beavers_spark.sources.kafka import KafkaSinkConfig, serialize_for_kafka


@dataclasses.dataclass
class SourceTopicBinding:
    """Route one topic's messages into one dag source node.

    ``deserializer`` maps the kafka-shaped slice for this topic to the
    node's table schema (reference: deserializers, kafka.py:57-76 /
    pyarrow_kafka.py:16-34). Defaults to passing the raw slice through.
    """

    topic: str
    node: Node
    deserializer: Callable[[DataFrame], DataFrame] | None = None


@dataclasses.dataclass
class SinkTopicBinding:
    """Serialize one sink's per-cycle updates onto one topic."""

    sink_name: str
    config: KafkaSinkConfig
    key_expr: object | None = None  # Column; None -> config.key_column


@dataclasses.dataclass
class DriverMetrics:
    """Cycle accounting (reference ExecutionMetrics, kafka.py:398-430)."""

    poll_count: int = 0
    message_count: int = 0
    execution_count: int = 0
    execution_ns: int = 0
    serialization_count: int = 0


class KafkaDagDriver:
    """Pump a :class:`beavers_spark.dag.Dag` from kafka-shaped polls.

    ::

        driver = KafkaDagDriver(dag, sources=[...], sinks=[...],
                                poll=poll_fn, produce=produce_fn)
        while True:
            driver.run_cycle(timeout=1.0)
    """

    def __init__(
        self,
        dag: Dag,
        sources: list[SourceTopicBinding],
        sinks: list[SinkTopicBinding],
        poll: Callable[[float], DataFrame | None],
        produce: Callable[[str, DataFrame], None],
    ) -> None:
        self.dag = dag
        self.sources = sources
        self.sinks = sinks
        self.poll = poll
        self.produce = produce
        self._metrics = DriverMetrics()

    def run_cycle(self, timeout: float = 1.0) -> bool:
        """One poll + one dag cycle. Returns True if work happened."""
        msgs = self.poll(timeout)
        self._metrics.poll_count += 1
        n_msgs = 0 if msgs is None else msgs.count()
        timers_due = (
            self.dag.get_next_timer().value
            <= pd.Timestamp.now(tz="UTC").value
        )
        if n_msgs == 0 and not timers_due:
            return False
        now = pd.Timestamp.now(tz="UTC")
        if n_msgs:
            self._metrics.message_count += n_msgs
            # cycle clock = latest consumed message time (reference
            # kafka.py:560-573); 1-row agg, never a data collect
            max_ts = msgs.agg(F.max("ts").alias("m")).collect()[0]["m"]
            if max_ts is not None:
                now = pd.Timestamp(max_ts)
                now = now.tz_localize("UTC") if now.tzinfo is None else now
            for binding in self.sources:
                slice_df = msgs.filter(F.col("topic") == binding.topic).drop(
                    "topic"
                )
                if binding.deserializer is not None:
                    slice_df = binding.deserializer(slice_df)
                binding.node.set_stream(slice_df)
        t0 = time.perf_counter_ns()
        self.dag.execute(now)
        self._metrics.execution_ns += time.perf_counter_ns() - t0
        self._metrics.execution_count += 1
        cycle_id = self.dag.get_cycle_id()
        for sink in self.sinks:
            nodes = self.dag.get_sinks()[sink.sink_name]
            for node in nodes:
                if node.get_cycle_id() != cycle_id:
                    continue
                value = node.get_value()
                if value is None or (
                    isinstance(value, DataFrame) and value.isEmpty()
                ):
                    continue
                out = serialize_for_kafka(
                    value, sink.config, key_expr=sink.key_expr
                )
                self._metrics.serialization_count += 1
                self.produce(sink.config.topic, out)
        return True

    def flush_metrics(self) -> DriverMetrics:
        out = self._metrics
        self._metrics = DriverMetrics()
        return out
