"""Core dataflow-kernel semantics, mirroring the reference's truth table
(reference tests: tests/test_dag.py — stream reset, empty suppression,
state retention, cutoff, silence, timers, now, metrics, prune).

Plain-Python payloads here (no Spark session needed): the kernel is
payload-agnostic; DataFrame payloads are covered in test_dag_spark.py.
"""

from __future__ import annotations

import operator

import pandas as pd
import pytest

from beavers_spark.dag import STATE_UNCHANGED, Dag, SilentUpdate, TimerManager
from beavers_spark.testing import DagTestBench

T0 = pd.Timestamp("2024-01-01T00:00:00Z")


def ts(minutes: int) -> pd.Timestamp:
    return T0 + pd.Timedelta(minutes=minutes)


def test_stream_map_positional_and_kwargs():
    dag = Dag()
    src = dag.source_stream(name="in")
    doubled = dag.stream(lambda xs: [x * 2 for x in xs]).map(src)
    merged = dag.stream(lambda a, b: a + b).map(doubled, b=src)
    dag.sink("out", merged)

    src.set_stream([1, 2])
    dag.execute(ts(0))
    assert dag.get_sink_value("out") == [2, 4, 1, 2]


def test_stream_resets_to_empty_after_cycle():
    dag = Dag()
    src = dag.source_stream(name="in")
    passthrough = dag.stream(lambda xs: list(xs)).map(src)
    dag.sink("out", passthrough)

    src.set_stream([1])
    dag.execute(ts(0))
    assert passthrough.get_value() == [1]
    dag.execute(ts(1))  # no new data
    assert passthrough.get_value() == []  # ephemeral: reset between cycles


def test_empty_stream_output_does_not_notify():
    calls = []
    dag = Dag()
    src = dag.source_stream(name="in")
    evens = dag.stream(lambda xs: [x for x in xs if x % 2 == 0]).map(src)

    def downstream(xs):
        calls.append(list(xs))
        return list(xs)

    out = dag.stream(downstream).map(evens)
    dag.sink("out", out)

    src.set_stream([1, 3])  # filtered to empty
    dag.execute(ts(0))
    assert calls == []  # empty output => downstream never ran

    src.set_stream([2])
    dag.execute(ts(1))
    assert calls == [[2]]


def test_state_retains_value_across_cycles():
    dag = Dag()
    src = dag.source_stream(name="in")

    total = {"sum": 0}

    def accumulate(xs):
        total["sum"] += sum(xs)
        return total["sum"]

    acc = dag.state(accumulate).map(src)
    dag.sink("out", acc)

    src.set_stream([1, 2])
    dag.execute(ts(0))
    assert dag.get_sink_value("out") == 3
    dag.execute(ts(1))  # nothing new: state keeps its value, no recompute
    assert acc.get_value() == 3
    src.set_stream([4])
    dag.execute(ts(2))
    assert dag.get_sink_value("out") == 7


def test_state_unchanged_suppresses_notification():
    dag = Dag()
    src = dag.source_stream(name="in")
    latest = dag.state(lambda xs: STATE_UNCHANGED if not xs else max(xs)).map(src)
    sink_calls = []
    probe = dag.stream(lambda v: (sink_calls.append(v), [v])[1]).map(latest)
    dag.sink("out", probe)

    src.set_stream([5])
    dag.execute(ts(0))
    assert sink_calls == [5]
    src.set_stream([])  # source fires nothing; but test unchanged via filter
    dag.execute(ts(1))
    assert sink_calls == [5]


def test_silent_update_stores_without_notifying():
    dag = Dag()
    src = dag.source_stream(name="in")
    silent = dag.state(lambda xs: SilentUpdate(sum(xs))).map(src)
    downstream_calls = []
    probe = dag.stream(lambda v: (downstream_calls.append(v), [v])[1]).map(silent)
    dag.sink("out", probe)

    src.set_stream([1, 2])
    dag.execute(ts(0))
    assert silent.get_value() == 3  # stored
    assert downstream_calls == []  # never notified


def test_silence_wrapper_node():
    dag = Dag()
    src = dag.source_stream(name="in")
    state = dag.state(lambda xs: sum(xs)).map(src)
    silenced = dag.silence(state)
    downstream_calls = []
    probe = dag.stream(lambda v: (downstream_calls.append(v), [v])[1]).map(silenced)
    dag.sink("out", probe)

    src.set_stream([1])
    dag.execute(ts(0))
    assert silenced.get_value() == 1
    assert downstream_calls == []


def test_cutoff_suppresses_equal_values():
    dag = Dag()
    src = dag.source_stream(name="in")
    latest = dag.state(lambda xs: xs[-1]).map(src)
    cut = dag.cutoff(latest)
    fired = []
    probe = dag.stream(lambda v: (fired.append(v), [v])[1]).map(cut)
    dag.sink("out", probe)

    src.set_stream([10])
    dag.execute(ts(0))
    src.set_stream([10])  # same value: cut off
    dag.execute(ts(1))
    src.set_stream([11])
    dag.execute(ts(2))
    assert fired == [10, 11]


def test_cutoff_custom_comparator_tolerance():
    dag = Dag()
    src = dag.source_stream(name="in")
    latest = dag.state(lambda xs: xs[-1]).map(src)
    cut = dag.cutoff(latest, comparator=lambda a, b: abs(a - b) < 0.5)
    fired = []
    probe = dag.stream(lambda v: (fired.append(v), [v])[1]).map(cut)
    dag.sink("out", probe)

    for v, t in [(1.0, 0), (1.2, 1), (2.0, 2)]:
        src.set_stream([v])
        dag.execute(ts(t))
    assert fired == [1.0, 2.0]  # 1.2 within tolerance of 1.0


def test_const_never_refires():
    dag = Dag()
    src = dag.source_stream(name="in")
    k = dag.const(10)
    out = dag.stream(lambda xs, c: [x + c for x in xs]).map(src, c=k)
    dag.sink("out", out)
    src.set_stream([1])
    dag.execute(ts(0))
    assert dag.get_sink_value("out") == [11]
    assert k.get_cycle_id() == 0  # consts never update


def test_now_node_is_silent_clock():
    dag = Dag()
    src = dag.source_stream(name="in")
    now = dag.now()
    stamped = dag.stream(lambda xs, t: [(x, t) for x in xs]).map(src, t=now)
    dag.sink("out", stamped)

    src.set_stream([1])
    dag.execute(ts(5))
    assert dag.get_sink_value("out") == [(1, ts(5))]
    # clock advances but alone does not trigger recompute
    dag.execute(ts(6))
    assert dag.get_sink_value("out") == [(1, ts(5))]


def test_timer_fires_without_data():
    dag = Dag()
    src = dag.source_stream(name="in")
    tm = dag.timer_manager()
    fired = []

    def schedule(xs, timer: TimerManager):
        if xs:
            timer.set_next_timer(ts(10))
            return []
        fired.append("fired")
        return ["fired"]

    node = dag.stream(schedule).map(src, tm)
    dag.sink("out", node)

    src.set_stream([1])
    dag.execute(ts(0))  # schedules timer for ts(10)
    assert dag.get_next_timer() == ts(10)
    dag.execute(ts(5))  # before deadline: nothing
    assert fired == []
    dag.execute(ts(10))  # deadline passes with no data
    assert fired == ["fired"]
    assert dag.get_next_timer().year == 2262  # cleared to UTC_MAX


def test_source_dedup_by_name():
    dag = Dag()
    a = dag.source_stream(name="x")
    b = dag.source_stream(name="x")
    assert a is b


def test_sink_not_updated_assertion():
    dag = Dag()
    src = dag.source_stream(name="in")
    evens = dag.stream(lambda xs: [x for x in xs if x % 2 == 0]).map(src)
    dag.sink("out", evens)
    bench = DagTestBench(dag)
    bench.set_source("in", [2]).execute(ts(0)).assert_sink_updated("out")
    bench.set_source("in", [3]).execute(ts(1)).assert_sink_not_updated("out")
    bench.assert_sink_value("out", [2])  # sink retains last fired value


def test_prune_removes_sinkless_subgraph():
    dag = Dag()
    src = dag.source_stream(name="in")
    used = dag.stream(lambda xs: xs).map(src)
    dag.stream(lambda xs: xs).map(src)  # dead branch: no sink
    dag.sink("out", used)
    removed = dag.prune()
    assert len(removed) == 1
    src.set_stream([1])
    dag.execute(ts(0))
    assert dag.get_sink_value("out") == [1]


def test_metrics_accounting():
    dag = Dag()
    src = dag.source_stream(name="in")
    out = dag.stream(lambda xs: xs).map(src)
    dag.sink("out", out)
    src.set_stream([1])
    dag.execute(ts(0))
    dag.execute(ts(1))
    metrics = dag.flush_metrics()
    assert metrics.cycles == 2
    assert metrics.updated_nodes >= 2  # stream + sink in cycle 1
    assert metrics.nodes == 4  # now + source + stream + sink
    assert dag.flush_metrics().cycles == 0  # flushed


def test_input_from_other_dag_rejected():
    dag1, dag2 = Dag(), Dag()
    src = dag1.source_stream(name="in")
    with pytest.raises(ValueError):
        dag2.stream(lambda x: x).map(src)


def test_cycle_ids_monotone():
    dag = Dag()
    src = dag.source_stream(name="in")
    out = dag.stream(lambda xs: xs).map(src)
    dag.sink("out", out)
    src.set_stream([1])
    dag.execute(ts(0))
    first = out.get_cycle_id()
    dag.execute(ts(1))
    assert out.get_cycle_id() == first  # did not fire again
    src.set_stream([2])
    dag.execute(ts(2))
    assert out.get_cycle_id() == first + 2


def test_cutoff_with_operator_module_comparator():
    dag = Dag()
    src = dag.source_stream(name="in")
    latest = dag.state(lambda xs: xs[-1]).map(src)
    cut = dag.cutoff(latest, comparator=operator.eq)
    dag.sink("out", cut)
    src.set_stream(["a"])
    dag.execute(ts(0))
    assert dag.get_sink_value("out") == "a"


def test_map_stream_with_async_calls():
    """Async UDF bodies via a sync asyncio.run wrapper (reference parity:
    tests/test_dag.py:208-239 — the engine only requires a callable; the
    user fans out coroutines inside it)."""
    import asyncio

    async def get_square(x: int) -> int:
        await asyncio.sleep(0.01)
        return x * x

    async def get_squares(xs: list[int]) -> list[int]:
        return await asyncio.gather(*[get_square(x) for x in xs])

    def run_get_squares(xs: list[int]) -> list[int]:
        return list(asyncio.run(get_squares(xs)))

    dag = Dag()
    source = dag.source_stream(name="nums")
    node = dag.stream(run_get_squares).map(source)
    dag.sink("squares", node)
    source.set_stream([0, 1, 2, 3])
    dag.execute(ts(0))
    assert dag.get_sink_value("squares") == [0, 1, 4, 9]


def test_node_error_reports_map_call_site():
    """A failing node function reports the user's .map() build site
    (reference: call-site traceback capture, dag.py:318-326, 373)."""
    dag = Dag()
    src = dag.source_stream(name="in")

    def boom(xs):
        raise ValueError("kaput")

    node = dag.stream(boom).map(src)  # <- this line must appear in the error
    dag.sink("out", node)
    src.set_stream([1])
    try:
        dag.execute(ts(0))
        raise AssertionError("expected ValueError")
    except ValueError as exc:
        notes = "".join(getattr(exc, "__notes__", []))
        assert "test_dag.py" in notes and "dag node created at" in notes


def test_map_stream_with_async_wrapper():
    """The reference pattern: a sync wrapper around asyncio.run
    (reference tests/test_dag.py:208-239)."""
    import asyncio
    import time

    async def get_square(x: int) -> int:
        await asyncio.sleep(0.1)
        return x * x

    async def get_squares(xs: list[int]) -> list[int]:
        return await asyncio.gather(*[get_square(x) for x in xs])

    def run_get_squares(xs: list[int]) -> list[int]:
        return asyncio.run(get_squares(xs))

    dag = Dag()
    source = dag.source_stream(name="in")
    async_node = dag.stream(run_get_squares).map(source)
    dag.sink("out", async_node)
    source.set_stream([0, 1, 2, 3, 4, 5, 6])

    start = time.time()
    dag.execute(ts(0))
    elapsed = time.time() - start

    # concurrent: ~0.1s total, not 0.7s serial
    assert 0.1 <= elapsed < 0.5
    assert async_node.get_value() == [0, 1, 4, 9, 16, 25, 36]


def test_map_stream_with_native_coroutine_function():
    """Beyond the reference: coroutine functions are accepted directly as
    node UDFs; the dag owns the event loop."""
    import asyncio
    import time

    async def get_squares(xs: list[int]) -> list[int]:
        async def sq(x: int) -> int:
            await asyncio.sleep(0.1)
            return x * x

        return await asyncio.gather(*[sq(x) for x in xs])

    dag = Dag()
    source = dag.source_stream(name="in")
    async_node = dag.stream(get_squares).map(source)
    dag.sink("out", async_node)
    source.set_stream([0, 1, 2, 3, 4, 5, 6])

    start = time.time()
    dag.execute(ts(0))
    elapsed = time.time() - start

    assert 0.1 <= elapsed < 0.5
    assert async_node.get_value() == [0, 1, 4, 9, 16, 25, 36]

    # the loop persists across cycles (loop-bound resources survive)
    source.set_stream([8])
    dag.execute(ts(1))
    assert async_node.get_value() == [64]


def test_async_state_node_accumulates():
    """Coroutine state UDFs fold durably like sync ones."""

    dag = Dag()
    source = dag.source_stream(name="in")
    # state carried in a closure-held box, folded by a coroutine UDF
    box = {"total": 0}

    async def fold(xs: list[int]) -> int:
        box["total"] += sum(xs)
        return box["total"]

    node = dag.stream(fold, empty=0).map(source)
    dag.sink("out", node)
    source.set_stream([1, 2, 3])
    dag.execute(ts(0))
    assert node.get_value() == 6
    source.set_stream([4])
    dag.execute(ts(1))
    assert node.get_value() == 10


def test_async_node_error_reports_call_site():
    """Exceptions raised inside a coroutine UDF still carry the build
    site note."""

    async def boom(xs):
        raise ValueError("async kaput")

    dag = Dag()
    src = dag.source_stream(name="in")
    node = dag.stream(boom).map(src)
    dag.sink("out", node)
    src.set_stream([1])
    with pytest.raises(ValueError, match="async kaput") as excinfo:
        dag.execute(ts(0))
    notes = "".join(getattr(excinfo.value, "__notes__", []))
    assert "dag node created at" in notes
