"""Kernel concepts: sources, stream/state duality, const, now, cutoff,
silence, timers, sinks — every assert runs (docs-as-tests, the
reference's pattern: examples/dag_concepts.py + examples/advanced_concepts.py,
run by `just examples`).

Run: ``python examples/dag_concepts.py``
"""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beavers_spark.dag import Dag  # noqa: E402

T0 = pd.Timestamp("2024-01-01T00:00:00Z")

# -- build a dag: word stream -> running counts (state) ----------------
dag = Dag()
words = dag.source_stream(name="words")  # list payload, self-clearing


def to_lower(batch: list[str]) -> list[str]:
    return [w.lower() for w in batch]


lowered = dag.stream(to_lower).map(words)


class RunningCounts:
    """State node: durable dict accumulated across cycles."""

    def __init__(self) -> None:
        self.counts: dict[str, int] = {}

    def __call__(self, batch: list[str]) -> dict[str, int]:
        for w in batch:
            self.counts[w] = self.counts.get(w, 0) + 1
        return self.counts


counts = dag.state(RunningCounts()).map(lowered)
dag.sink("counts", counts)

# cycle 1: data flows, state accumulates
words.set_stream(["Hello", "world", "hello"])
dag.execute(T0)
assert dag.get_sink_value("counts") == {"hello": 2, "world": 1}

# cycle 2: EMPTY batch -> stream resets, state NOT notified (dag.py
# empty-batch suppression; reference dag.py:350)
cycle_before = dag.get_sinks()["counts"][0].get_cycle_id()
dag.execute(T0 + pd.Timedelta(minutes=1))
assert dag.get_sinks()["counts"][0].get_cycle_id() == cycle_before  # no fire
assert dag.get_sink_value("counts") == {"hello": 2, "world": 1}  # retained

# -- cutoff: suppress propagation when the value didn't change ---------
dag2 = Dag()
nums = dag2.source_stream(name="nums")
total_state = dag2.state(lambda xs, acc=[0]: acc.__setitem__(0, acc[0] + sum(xs)) or acc[0]).map(nums)
stable = dag2.cutoff(total_state)  # default comparator: equality
fires = []
dag2.sink("stable", dag2.stream(lambda v: [v]).map(stable))

nums.set_stream([1, 2])
dag2.execute(T0)
assert dag2.get_sink_value("stable") == [3]

nums.set_stream([0])  # total unchanged -> cutoff suppresses downstream
sink_node = dag2.get_sinks()["stable"][0]
before = sink_node.get_cycle_id()
dag2.execute(T0 + pd.Timedelta(minutes=1))
assert sink_node.get_cycle_id() == before  # did not fire

# -- timers: wake up without data (reference dag.py TimerManager) ------
dag3 = Dag()
src = dag3.source_stream(name="ticks")
tm = dag3.timer_manager()
fired: list[pd.Timestamp] = []


def on_timer(timer, batch):
    if batch:  # data cycle: arm a wake-up 5 minutes after the last event
        timer.set_next_timer(batch[-1] + pd.Timedelta(minutes=5))
        return list(batch)
    fired.append("woke")  # timer cycle: node runs with NO data
    return ["woke"]


node = dag3.stream(on_timer).map(tm, src)
dag3.sink("out", node)

src.set_stream([T0])
dag3.execute(T0)  # arms a timer for T0+5m
assert dag3.get_next_timer() == T0 + pd.Timedelta(minutes=5)
dag3.execute(T0 + pd.Timedelta(minutes=6))  # no data; deadline passed
assert fired == ["woke"]
assert dag3.get_sink_value("out") == ["woke"]

print("dag_concepts: all asserts passed")
