"""Replay driver semantics (reference: tests/test_replay.py — pass-through
e2e, no-update corner case, source stitching, virtual-clock skip-ahead)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from beavers_spark.dag import UTC_MAX, Dag
from beavers_spark.streaming import (
    IteratorDataSourceAdapter,
    ListDataSink,
    ListDataSource,
    ParquetDataSource,
    ReplayContext,
    ReplayDriver,
)

T0 = pd.Timestamp("2023-01-01T00:00:00Z")


def ts(minutes: int) -> pd.Timestamp:
    return T0 + pd.Timedelta(minutes=minutes)


def passthrough_dag() -> Dag:
    dag = Dag()
    src = dag.source_stream(name="messages")
    out = dag.stream(lambda xs: list(xs)).map(src)
    dag.sink("out", out)
    return dag


def test_replay_passthrough():
    dag = passthrough_dag()
    source = ListDataSource([(ts(60), "hello"), (ts(61), "world"), (ts(200), "late")])
    sink = ListDataSink()
    driver = ReplayDriver(
        dag,
        ReplayContext(T0, ts(300), pd.Timedelta(hours=1)),
        {"messages": source},
        {"out": sink},
    )
    driver.run()
    values = [v for _, v in sink.appended]
    # hello lands exactly on the 01:00 quantum; world (01:01) waits for the
    # next hourly cycle; late warps the clock to its own quantum
    assert values == [["hello"], ["world"], ["late"]]
    assert sink.closed


def test_replay_no_data_never_fires():
    dag = passthrough_dag()
    sink = ListDataSink()
    driver = ReplayDriver(
        dag,
        ReplayContext(T0, ts(120), pd.Timedelta(hours=1)),
        {"messages": ListDataSource([])},
        {"out": sink},
    )
    driver.run()
    assert sink.appended == []


def test_replay_clock_skips_over_gaps():
    dag = passthrough_dag()
    # one event at +1min, then nothing until +10h
    source = ListDataSource([(ts(1), "a"), (ts(600), "b")])
    driver = ReplayDriver(
        dag,
        ReplayContext(T0, ts(700), pd.Timedelta(minutes=1)),
        {"messages": source},
        {"out": ListDataSink()},
    )
    driver.run()
    # the clock warps: far fewer cycles than 700 one-minute steps
    assert len(driver.metrics) < 20


def test_replay_respects_frequency_quantization():
    dag = passthrough_dag()
    source = ListDataSource([(ts(90), "x")])  # lands mid-quantum
    seen = []
    dagsink = ListDataSink()
    driver = ReplayDriver(
        dag,
        ReplayContext(T0, ts(240), pd.Timedelta(hours=1)),
        {"messages": source},
        {"out": dagsink},
    )
    while not driver.is_done():
        driver.run_cycle()
        seen.append(driver.current_time)
    # times stay on the hourly grid
    assert all(t.minute == 0 and t.second == 0 for t in seen)
    assert dagsink.appended and dagsink.appended[0][0] == ts(120)


def test_unknown_source_name_rejected():
    dag = passthrough_dag()
    with pytest.raises(ValueError):
        ReplayDriver(
            dag,
            ReplayContext(T0, ts(60), pd.Timedelta(hours=1)),
            {"nope": ListDataSource([])},
        )


def test_iterator_adapter_stitches_days():
    daily = iter(
        [
            ListDataSource([(ts(10), "d1a"), (ts(20), "d1b")]),
            ListDataSource([]),  # empty middle day
            ListDataSource([(ts(30), "d3a")]),
        ]
    )
    adapter = IteratorDataSourceAdapter(daily, [], lambda a, b: a + b)
    assert adapter.get_next() == ts(10)
    assert adapter.read_to(ts(25)) == ["d1a", "d1b"]
    assert adapter.read_to(ts(35)) == ["d3a"]
    assert adapter.get_next() == UTC_MAX
    assert adapter.read_to(ts(60)) == []


def test_parquet_source_searchsorted(tmp_path):
    path = str(tmp_path / "events.parquet")
    table = pa.table(
        {
            "ts": pa.array(
                [ts(5).tz_convert(None), ts(1).tz_convert(None), ts(9).tz_convert(None)],
                type=pa.timestamp("us"),
            ),
            "v": ["b", "a", "c"],
        }
    )
    import pyarrow.parquet as pq

    pq.write_table(table, path)
    src = ParquetDataSource(path, "ts")
    assert src.get_next() == ts(1)
    first = src.read_to(ts(5))
    assert first["v"].to_pylist() == ["a", "b"]  # sorted by ts, sliced
    assert src.get_next() == ts(9)
    assert src.read_to(ts(4)).num_rows == 0  # nothing new before ts 9
    assert src.read_to(ts(10))["v"].to_pylist() == ["c"]
    assert src.get_next() == UTC_MAX


def test_replay_with_timers():
    """Timers fire during replay even when no data is due
    (reference: replay.py:230 timer-or-records gate)."""
    dag = Dag()
    src = dag.source_stream(name="messages")
    tm = dag.timer_manager()
    fired = []

    def fn(xs, timer):
        if xs:
            timer.set_next_timer(ts(180))
            return []
        fired.append("timer")
        return ["timer"]

    node = dag.stream(fn).map(src, tm)
    dag.sink("out", node)

    sink = ListDataSink()
    driver = ReplayDriver(
        dag,
        ReplayContext(T0, ts(400), pd.Timedelta(hours=1)),
        {"messages": ListDataSource([(ts(30), "x")])},
        {"out": sink},
    )
    driver.run()
    assert fired == ["timer"]
    assert [v for _, v in sink.appended] == [["timer"]]


def test_csv_replay_end_to_end(tmp_path):
    """CSV in -> dag transform -> CSV out across virtual-clock cycles
    (reference example: examples/replay_concepts.py:78-121 CSV adapters)."""
    import pyarrow.compute as pc

    from beavers_spark.streaming import CsvDataSink, CsvDataSource

    src_path = str(tmp_path / "in.csv")
    out_path = str(tmp_path / "out.csv")
    pd.DataFrame(
        {
            "timestamp": [ts(90), ts(5), ts(130)],  # unsorted on purpose
            "message": ["mid", "early", "late"],
        }
    ).to_csv(src_path, index=False)

    dag = Dag()
    src = dag.source_stream(
        name="messages", empty_factory=lambda: pa.table({"timestamp": [], "message": []})
    )
    upper = dag.stream(
        lambda t: t.set_column(
            1, "message", pc.utf8_upper(t.column("message"))
        )
    ).map(src)
    dag.sink("out", upper)

    sink = CsvDataSink(out_path)
    driver = ReplayDriver(
        dag,
        ReplayContext(start=ts(0), end=ts(180), frequency=pd.Timedelta(hours=1)),
        sources={"messages": CsvDataSource(src_path, "timestamp")},
        sinks={"out": sink},
    )
    driver.run()

    out = pd.read_csv(out_path, parse_dates=["timestamp"])
    # rows arrive sorted by timestamp and transformed
    assert out["message"].tolist() == ["EARLY", "MID", "LATE"]
    assert out["timestamp"].tolist() == [ts(5), ts(90), ts(130)]


def test_spark_slice_source_replay(spark, tmp_path):
    """Scale-path replay: lazy pushdown-sliced DataFrames through the
    dag; empty cycles cost zero Spark jobs (read_to returns None)."""
    import pyarrow.parquet as pq

    from beavers_spark.streaming import SparkSliceSource

    path = str(tmp_path / "trades.parquet")
    table = pa.table(
        {
            "ts": pa.array(
                [ts(m).tz_convert(None) for m in (5, 65, 70, 200)],
                type=pa.timestamp("us"),
            ),
            "qty": [1.0, 2.0, 3.0, 4.0],
        }
    )
    pq.write_table(table, path)

    from beavers_spark.dag import Dag

    dag = Dag(spark)
    src = dag.source_table("ts timestamp, qty double", "trades")
    totals = dag.state(
        lambda df, acc=[0.0]: (
            acc.__setitem__(0, acc[0] + df.agg({"qty": "sum"}).first()[0]),
            acc[0],
        )[1]
    ).map(src)
    dag.sink("total", totals)

    driver = ReplayDriver(
        dag,
        ReplayContext(start=ts(0), end=ts(240), frequency=pd.Timedelta(hours=1)),
        sources={"trades": SparkSliceSource(spark, path, "ts")},
    )
    source = driver.sources["trades"]
    assert source.get_next() == ts(5)
    driver.run()
    assert dag.get_sink_value("total") == 10.0
    # cycles with data: 0-60 (ts5), 60-120 (ts65,70), 180-240 (ts200)
    assert sum(1 for m in driver.metrics if m.records) == 3


def test_cross_source_event_time_alignment():
    """Two sources with interleaved timestamps are released in global
    event-time order (quantized by frequency) — the replay analog of the
    reference's cross-topic priming alignment (kafka.py:298-346): no
    source ever runs ahead of the shared virtual clock."""
    dag = Dag()
    trades = dag.source_stream(name="trades")
    quotes = dag.source_stream(name="quotes")
    merged = dag.stream(
        lambda t, q: sorted([*t, *q], key=lambda r: r[0])
    ).map(trades, quotes)
    dag.sink("merged", merged)

    sink = ListDataSink()
    driver = ReplayDriver(
        dag,
        ReplayContext(ts(0), ts(300), pd.Timedelta(minutes=30)),
        sources={
            # interleaved: trades at 10,100,250 / quotes at 40,70,220
            "trades": ListDataSource([(ts(10), (ts(10), "T1")), (ts(100), (ts(100), "T2")), (ts(250), (ts(250), "T3"))]),
            "quotes": ListDataSource([(ts(40), (ts(40), "Q1")), (ts(70), (ts(70), "Q2")), (ts(220), (ts(220), "Q3"))]),
        },
        sinks={"merged": sink},
    )
    driver.run()

    released = [label for _, batch in sink.appended for _, label in batch]
    # global event-time order across BOTH sources
    assert released == ["T1", "Q1", "Q2", "T2", "Q3", "T3"]
    # and no record was released before its cycle's virtual time
    for cycle_time, batch in sink.appended:
        assert all(r_ts <= cycle_time for r_ts, _ in batch)


def test_replay_driver_rejects_unknown_sink_name():
    """A typo'd sink key would silently discard all output (review r5):
    validation is now symmetric with sources."""
    import pytest as _pytest

    from beavers_spark.dag import Dag
    from beavers_spark.streaming.replay import (
        ListDataSink,
        ReplayContext,
        ReplayDriver,
    )

    dag = Dag()
    src = dag.source_stream(name="in")
    dag.sink("results", dag.stream(lambda xs: xs).map(src))
    ctx = ReplayContext(
        start=pd.Timestamp("2024-01-01", tz="UTC"),
        end=pd.Timestamp("2024-01-02", tz="UTC"),
        frequency=pd.Timedelta(hours=1),
    )
    with _pytest.raises(ValueError, match="no dag sink named 'reslts'"):
        ReplayDriver(dag, ctx, sources={}, sinks={"reslts": ListDataSink()})


def test_batch_len_handles_empty_dataframe(spark):
    """An un-len()-able empty Spark DataFrame counts as 0 records, so
    gap cycles skip instead of running phantom dag cycles (review r5)."""
    from beavers_spark.streaming.replay import _batch_len

    df = spark.range(3)
    assert _batch_len(df.filter("id < 0")) == 0
    assert _batch_len(df) == 1  # non-empty, count unknown
    assert _batch_len([1, 2]) == 2
    assert _batch_len(None) == 0
