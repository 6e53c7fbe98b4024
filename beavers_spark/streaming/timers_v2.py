"""Spark 4 arbitrary-state-v2 timer path: the ``streaming_timeout_monitor``
twin on ``transformWithStateInPandas`` with FIRST-CLASS timers.

``streaming/live.py`` implements the per-key staleness watchdog (the
reference TimerManager's live twin, beavers dag.py:95-154) on
``applyInPandasWithState`` GroupState timeouts — the predecessor API,
chosen because it is fully executable in this environment. This module
is the successor-API implementation the upgrade note in
``streaming_timeout_monitor`` promises:

* ``handle.registerTimer(at_ms)`` is an explicit per-key timer (the
  exact ``set_next_timer`` semantics of the reference TimerManager),
  not a state-wide timeout side effect;
* re-arming deletes the previously registered timer, so a chatty key
  never accumulates stale wake-ups;
* expiry is delivered to ``handleExpiredTimer`` with the authoritative
  expiry timestamp — no "did the timeout or the data win" ambiguity.

Environment gate, honestly: ``transformWithStateInPandas``'s Python
worker speaks protobuf to the state server, and this container does not
ship ``google.protobuf`` — so constructing the monitor raises a clear
RuntimeError here, and ``tests/test_streaming_timers_v2.py`` skips
unless protobuf is importable (the same env-gated pattern as the
real-broker Kafka e2e). The module is import-safe everywhere; only
execution needs protobuf.

Semantics contract (shared with ``streaming_timeout_monitor``, pinned
by the env-gated test): emits ``(keys..., last_seen, stale)`` —
stale=false on every update (timer re-armed), stale=true once when a
key goes ``timeout_ms`` of processing time without updates (state then
cleared, so a revived key starts fresh).
"""

from __future__ import annotations

from typing import Any, Iterator

from pyspark.sql import DataFrame


def _require_protobuf() -> None:
    try:
        import google.protobuf  # noqa: F401
    except ImportError as ex:  # pragma: no cover - env without protobuf
        raise RuntimeError(
            "transformWithStateInPandas needs the protobuf Python "
            "package (its worker speaks protobuf to the state server); "
            "it is not installed here. Use "
            "beavers_spark.streaming.live.streaming_timeout_monitor — "
            "the applyInPandasWithState twin with identical output — "
            "or install protobuf."
        ) from ex


def streaming_timeout_monitor_v2(
    stream_df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    timeout_ms: int,
) -> DataFrame:
    """Per-key staleness watchdog on arbitrary state v2 — explicit
    ``registerTimer`` per key instead of GroupState timeouts.

    Same output contract as ``live.streaming_timeout_monitor``:
    ``(keys..., last_seen timestamp, stale boolean)``, update mode.
    Raises RuntimeError where protobuf is unavailable (see module
    docstring).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    _require_protobuf()

    key_schema = ", ".join(
        f"{c} {stream_df.schema[c].dataType.simpleString()}" for c in key_cols
    )
    out_schema = f"{key_schema}, last_seen timestamp, stale boolean"

    class _TimeoutProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            # one timestamp per key — same bounded state as the
            # GroupState twin
            self._last = handle.getValueState(
                "last_seen", "last_seen timestamp"
            )
            # the armed wake-up, so re-arming can delete it (explicit
            # TimerManager semantics: at most one pending timer per key)
            self._armed = handle.getValueState("armed_at", "at_ms long")

        def handleInputRows(
            self, key: Any, rows: Iterator, timerValues: TimerValues
        ) -> Iterator:
            newest = None
            for pdf in rows:
                batch_max = pdf[ts_col].max()
                if newest is None or batch_max > newest:
                    newest = batch_max
            if newest is None:
                return
            self._last.update((newest,))
            # re-arm: drop the previous wake-up, register the new one
            if self._armed.exists():
                self._handle.deleteTimer(self._armed.get()[0])
            at = timerValues.getCurrentProcessingTimeInMs() + timeout_ms
            self._handle.registerTimer(at)
            self._armed.update((at,))
            yield pd.DataFrame(
                [[*key, newest, False]],
                columns=[*key_cols, "last_seen", "stale"],
            )

        def handleExpiredTimer(
            self,
            key: Any,
            timerValues: TimerValues,
            expiredTimerInfo: ExpiredTimerInfo,
        ) -> Iterator:
            if not self._last.exists():
                return
            (last_seen,) = self._last.get()
            self._last.clear()
            self._armed.clear()
            yield pd.DataFrame(
                [[*key, last_seen, True]],
                columns=[*key_cols, "last_seen", "stale"],
            )

        def close(self) -> None:
            pass

    return stream_df.groupBy(*key_cols).transformWithStateInPandas(
        _TimeoutProcessor(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
