"""Cross-source priming alignment (AlignedReleaseDriver) replaying the
reference's consumer-manager scenario step-for-step
(reference tests/test_kafka.py:194-285, test_consumer_manager_priming).

Four "partitions" (a:0, a:1, b:0, c:0) with different replay depths;
messages arrive out of order across sources; the driver must release
them in global event-time order, never past the lagging source's
low-water-mark, and free-run once every source is live.
"""

from __future__ import annotations

import pandas as pd
import pytest

from beavers_spark.streaming.alignment import UTC_EPOCH, AlignedReleaseDriver

CUTOFF = pd.to_datetime("2022-10-19 01:00:00", utc=True)
SCHEMA = "source string, ts timestamp, offset long, value string"


def _msg(source: str, ms_from_cutoff: int, value: str, offset: int):
    ts = (CUTOFF + pd.Timedelta(milliseconds=ms_from_cutoff)).tz_convert(
        "UTC"
    ).tz_localize(None)
    return (source, ts.to_pydatetime(), offset, value)


@pytest.fixture(params=["memory", "staged"])
def driver_and_log(spark, request, tmp_path):
    """Both hold-buffer modes run the identical reference scenario: the
    in-memory DataFrame hold and the parquet staging-directory hold
    (multi-day catch-up mode) must be behaviorally indistinguishable."""
    released: list[list[str]] = []

    def capture(df):
        released.append([r.value for r in df.collect()])

    driver = AlignedReleaseDriver(
        source_col="source",
        ts_col="ts",
        cutoff=CUTOFF,
        sources=["a:0", "a:1", "b:0", "c:0"],
        on_release=capture,
        order_tiebreak=["offset"],
        progress_col="offset",
        # startup high-water offsets (reference watermark_offsets ends)
        live_marks={"a:0": 11, "a:1": 22, "b:0": 32, "c:0": 43},
        staging_dir=(
            str(tmp_path / "staging") if request.param == "staged" else None
        ),
    )
    return driver, released


def test_priming_alignment_mirrors_reference(spark, driver_and_log):
    driver, released = driver_and_log

    def feed(msgs, batch_id):
        df = spark.createDataFrame(msgs, SCHEMA)
        driver.process_batch(df, batch_id)

    # 0. no messages in, no messages out
    feed([], 0)
    assert released == []
    assert driver.priming_watermark() == UTC_EPOCH

    # one source only: everything held, watermark still at epoch
    feed([_msg("a:0", -100, "M1", 10)], 1)
    assert released == []
    assert driver.metrics()["held_count"] == 1
    assert driver.priming_watermark() == UTC_EPOCH

    # 1. messages on all sources: release up to the min max-ts
    feed(
        [
            _msg("a:1", -100, "M2", 20),
            _msg("b:0", -100, "M3", 30),
            _msg("c:0", -50, "M4", 40),
        ],
        2,
    )
    assert released == [["M1", "M2", "M3"]]  # M4 (-50) held
    assert driver.metrics()["held_count"] == 1

    # 2. out-of-order arrivals are re-sorted on release
    feed(
        [
            _msg("a:0", -90, "M5", 11),
            _msg("a:1", -90, "M6", 21),
            _msg("b:0", -91, "M7", 31),
            _msg("b:0", -90, "M8", 32),
        ],
        3,
    )
    assert released[-1] == ["M7", "M5", "M6", "M8"]  # -91 first, then -90s
    assert driver.metrics()["held_count"] == 1  # still holding M4
    assert driver.priming_watermark() == CUTOFF - pd.Timedelta(milliseconds=90)

    # 3. a:1 reaches its live offset -> only c:0 constrains the watermark
    feed([_msg("a:1", -90, "M9", 22)], 4)
    assert released[-1] == ["M9", "M4"]
    assert driver.metrics()["held_count"] == 0
    assert driver.priming_watermark() == CUTOFF - pd.Timedelta(milliseconds=50)

    # 4. last source passes the cutoff: fully live, messages flow freely
    feed([_msg("c:0", +10, "M10", 41)], 5)
    assert released[-1] == ["M10"]
    assert driver.metrics()["held_count"] == 0
    assert driver.priming_watermark() is None
    assert driver.low_water_mark() is None


def test_undeclared_source_raises(spark, driver_and_log):
    driver, _ = driver_and_log
    df = spark.createDataFrame([_msg("mystery", -10, "X", 1)], SCHEMA)
    with pytest.raises(ValueError, match="undeclared source"):
        driver.process_batch(df, 0)


def test_alignment_through_streaming_union(spark, tmp_path):
    """e2e: two file-backed 'topics' with different replay depths feed a
    streaming union; foreachBatch(AlignedReleaseDriver) emits the
    globally time-ordered merge (reference kafka.py:298-346 live path)."""
    deep = [_msg("deep", -1000 + 10 * i, f"D{i}", i) for i in range(20)]
    shallow = [_msg("shallow", -100 + 10 * i, f"S{i}", i) for i in range(10)]
    src = str(tmp_path / "in")
    spark.createDataFrame(deep, SCHEMA).coalesce(1).write.parquet(src + "/deep")
    spark.createDataFrame(shallow, SCHEMA).coalesce(1).write.parquet(
        src + "/shallow"
    )

    released: list[str] = []
    order_check: list[pd.Timestamp] = []

    def capture(df):
        for r in df.collect():
            released.append(r.value)
            order_check.append(r.ts)

    driver = AlignedReleaseDriver(
        source_col="source",
        ts_col="ts",
        cutoff=CUTOFF,
        sources=["deep", "shallow"],
        on_release=capture,
        order_tiebreak=["offset"],
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(driver.process_batch)
        .option(
            "checkpointLocation", str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # one source is exhausted but below cutoff: its last ts caps release
    assert released, "alignment must release the overlapping prefix"
    assert order_check == sorted(order_check)  # global event-time order
    # drain: once both sources pass cutoff-equivalent (end of files), a
    # final free-release batch flushes the hold
    driver.process_batch(
        spark.createDataFrame(
            [_msg("deep", 10, "DX", 99), _msg("shallow", 10, "SX", 99)], SCHEMA
        ),
        999,
    )
    assert len(released) == 32
    assert order_check == sorted(order_check)


def test_staged_hold_survives_driver_restart(spark, tmp_path):
    """Staged mode's durability claim: rows held in the parquet staging
    directory by one driver instance are released by a NEW instance
    (fresh in-memory progress) once its low-water-mark passes them."""
    staging = str(tmp_path / "staging")

    def make(released):
        return AlignedReleaseDriver(
            source_col="source",
            ts_col="ts",
            cutoff=CUTOFF,
            sources=["x", "y"],
            on_release=lambda df: released.extend(
                r.value for r in df.collect()
            ),
            order_tiebreak=["offset"],
            staging_dir=staging,
        )

    first: list[str] = []
    d1 = make(first)
    # only x heard from: A1/A2 staged, nothing released
    d1.process_batch(
        spark.createDataFrame(
            [_msg("x", -200, "A1", 0), _msg("x", -150, "A2", 1)], SCHEMA
        ),
        0,
    )
    assert first == [] and d1.metrics()["held_count"] == 2

    second: list[str] = []
    d2 = make(second)  # "restart": fresh progress marks, same staging dir
    assert d2.metrics()["held_count"] == 0  # no session captured yet
    # y catches up past A1/A2: the restarted driver releases the staged
    # rows interleaved with the new batch, in global event-time order
    d2.process_batch(
        spark.createDataFrame(
            [_msg("x", -100, "A3", 2), _msg("y", -120, "B1", 0)], SCHEMA
        ),
        0,
    )
    assert second == ["A1", "A2", "B1"]
    assert d2.metrics()["held_count"] == 1  # A3 (-100) still held


def test_staged_release_failure_keeps_rows_releasable(spark, tmp_path):
    """Crash-safety ordering (review r5): the release is delivered while
    staging is intact, so an on_release failure loses nothing — the
    retry re-releases the same rows (at-least-once out)."""
    staging = str(tmp_path / "staging")
    released: list[str] = []
    fail = {"on": True}

    def on_release(df):
        if fail["on"]:
            raise RuntimeError("downstream sink outage")
        released.extend(r.value for r in df.collect())

    def make():
        return AlignedReleaseDriver(
            source_col="source",
            ts_col="ts",
            cutoff=CUTOFF,
            sources=["x", "y"],
            on_release=on_release,
            order_tiebreak=["offset"],
            staging_dir=staging,
        )

    d = make()
    d.process_batch(
        spark.createDataFrame(
            [_msg("x", -200, "A1", 0), _msg("x", -150, "A2", 1)], SCHEMA
        ),
        0,
    )
    # y catches up -> release attempt fails downstream
    import pytest as _pytest

    with _pytest.raises(RuntimeError):
        d.process_batch(
            spark.createDataFrame([_msg("y", -120, "B1", 0)], SCHEMA), 1
        )
    assert released == []

    # "restart" after the failure: staging still holds everything, the
    # recovered driver (fresh progress marks — it needs to hear from
    # both sources) re-releases the same rows once downstream heals
    fail["on"] = False
    d2 = make()
    d2.process_batch(
        spark.createDataFrame(
            [_msg("x", -105, "A3", 2), _msg("y", -90, "B2", 1)], SCHEMA
        ),
        2,
    )
    assert released == ["A1", "A2", "B1", "A3"]


def test_staged_boundary_tail_survives_release(spark, tmp_path):
    """The boundary hour is rewritten to just its tail on release (one
    dynamic-overwrite swap, no delete-then-reappend window): the tail
    stays held and releases later in order."""
    staging = str(tmp_path / "staging")
    released: list[str] = []
    d = AlignedReleaseDriver(
        source_col="source",
        ts_col="ts",
        cutoff=CUTOFF,
        sources=["x", "y"],
        on_release=lambda df: released.extend(r.value for r in df.collect()),
        order_tiebreak=["offset"],
        staging_dir=staging,
    )
    # same hour: A1(-200) releases at lwm=-150, A2's tail would be empty;
    # plant a tail by keeping x ahead: A2(-100) stays held past the mark
    d.process_batch(
        spark.createDataFrame(
            [_msg("x", -200, "A1", 0), _msg("x", -100, "A2", 1)], SCHEMA
        ),
        0,
    )
    d.process_batch(
        spark.createDataFrame([_msg("y", -150, "B1", 0)], SCHEMA), 1
    )
    # lwm = -150: A1, B1 out; A2 (the boundary-hour tail) still held
    assert released == ["A1", "B1"]
    assert d.metrics()["held_count"] == 1
    # both sources pass A2 -> the preserved tail releases in order
    d.process_batch(
        spark.createDataFrame(
            [_msg("x", -50, "A3", 2), _msg("y", -60, "B2", 1)], SCHEMA
        ),
        2,
    )
    assert released == ["A1", "B1", "A2", "B2"]
