"""Test bench for dag scenarios (reference: DagTestBench,
beavers/testing.py:11-54 — fluent set/execute/assert API, re-designed
for DataFrame payloads).
"""

from __future__ import annotations

from typing import Any

import pandas as pd

from beavers_spark.dag import Dag


class DagTestBench:
    """Fluent harness: inject source batches, advance virtual time,
    assert sink values and — crucially — assert *non*-updates (the
    no-fire semantics the reference's golden tests lean on,
    tests/test_etfs.py:7-79)."""

    def __init__(self, dag: Dag) -> None:
        self.dag = dag

    def set_source(self, name: str, value: Any) -> "DagTestBench":
        self.dag.get_sources()[name].set_stream(value)
        return self

    def execute(self, timestamp: pd.Timestamp | str | None = None) -> "DagTestBench":
        if isinstance(timestamp, str):
            timestamp = pd.Timestamp(timestamp, tz="UTC")
        self.dag.execute(timestamp)
        return self

    def assert_sink_value(self, name: str, expected: Any) -> "DagTestBench":
        actual = self.dag.get_sink_value(name)
        assert actual == expected, f"sink {name!r}: {actual!r} != {expected!r}"
        return self

    def assert_sink_rows(
        self, name: str, expected_rows: list[tuple], sort: bool = True
    ) -> "DagTestBench":
        """Compare a DataFrame-valued sink against expected row tuples."""
        df = self.dag.get_sink_value(name)
        actual = [tuple(r) for r in df.collect()]
        if sort:
            actual, expected_rows = sorted(actual), sorted(expected_rows)
        assert actual == expected_rows, f"sink {name!r}: {actual} != {expected_rows}"
        return self

    def assert_sink_updated(self, name: str) -> "DagTestBench":
        node = self.dag.get_sinks()[name][0]
        assert node.get_cycle_id() == self.dag.get_cycle_id(), (
            f"sink {name!r} did not fire in cycle {self.dag.get_cycle_id()}"
        )
        return self

    def assert_sink_not_updated(self, name: str) -> "DagTestBench":
        node = self.dag.get_sinks()[name][0]
        assert node.get_cycle_id() != self.dag.get_cycle_id(), (
            f"sink {name!r} unexpectedly fired in cycle {self.dag.get_cycle_id()}"
        )
        return self
