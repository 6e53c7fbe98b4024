"""HTTP latest-state serving — the Spark-first analog of the reference's
perspective live-dashboard stack (beavers/perspective_wrapper.py:156-285:
named indexed tables updated per dag cycle, pushed to web clients; Arrow
IPC stream bytes as the wire format, ``_table_to_bytes``
perspective_wrapper.py:125-131; scalar type surface
perspective_wrapper.py:184-198).

perspective + tornado aren't available here, so the serving layer is
stdlib ``http.server`` with the same contract:

- named tables, each defined by a declarative :class:`TableView`
  (index/sort/filter/limit — operators/view.py);
- ``GET /``                     -> bundled live dashboard page (HTML; the
  analog of the reference's ``table.html`` assets);
- ``GET /tables``               -> table registry + typed schema (JSON);
- ``GET /table/<name>``         -> latest snapshot rows (JSON);
- ``GET /table/<name>.arrow``   -> latest snapshot as an Arrow IPC stream
  (the exact bytes a perspective client ingests).

Scale posture: the view is computed **Spark-side** — ``view.apply(df)``
compiles to latest-per-key + filter + TakeOrderedAndProject with a row
``limit`` — so only the bounded dashboard page ever reaches the
driver-side server; raw state stays distributed. Updates plug into either
driver: pass :meth:`ViewServer.handle_sink` to ``StreamingDagDriver``
(live) or call :meth:`ViewServer.update` from a replay sink.
"""

from __future__ import annotations

import dataclasses
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from typing import Any

import pyarrow as pa
from pyspark.sql import DataFrame

from beavers_spark.operators.view import TableView

#: Arrow type -> dashboard scalar type name
#: (reference surface: perspective_wrapper.py:184-198)
_DATA_TYPES = [
    (pa.types.is_integer, "integer"),
    (pa.types.is_floating, "float"),
    (pa.types.is_boolean, "boolean"),
    (pa.types.is_date, "date"),
    (pa.types.is_string, "string"),
    (pa.types.is_timestamp, "datetime"),
]


_ASSETS = Path(__file__).parent / "assets"


def _dashboard_html() -> bytes:
    """The bundled single-file dashboard page (reference ships table.html
    + assets/, perspective_wrapper.py:235-285). Read per-request so edits
    show on refresh; ~5 KB, so no caching is warranted."""
    return (_ASSETS / "dashboard.html").read_bytes()


def scalar_type_name(data_type: pa.DataType) -> str:
    for predicate, name in _DATA_TYPES:
        if predicate(data_type):
            return name
    return str(data_type)  # arrays/structs: surface the arrow name


def table_to_ipc_bytes(table: pa.Table) -> bytes:
    """Arrow IPC stream serialization (reference: _table_to_bytes,
    perspective_wrapper.py:125-131)."""
    with pa.BufferOutputStream() as sink:
        with pa.ipc.new_stream(sink, table.schema) as writer:
            for batch in table.to_batches():
                writer.write_batch(batch)
        return sink.getvalue().to_pybytes()


@dataclasses.dataclass
class _ServedTable:
    view: TableView | None
    snapshot: pa.Table | None = None
    updates: int = 0


class ViewServer:
    """Registry of named dashboard tables + a threaded HTTP server.

    The server thread is a daemon; ``start()`` binds (port=0 picks a free
    port) and returns immediately. Snapshot swaps are atomic under a lock,
    so readers always see a complete table.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0) -> None:
        self._host = host
        self._port = port
        self._tables: dict[str, _ServedTable] = {}
        self._lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    # -- registry / updates -------------------------------------------
    def register(self, name: str, view: TableView | None = None) -> None:
        with self._lock:
            if name in self._tables:
                raise ValueError(f"duplicate table name {name!r}")
            self._tables[name] = _ServedTable(view=view)

    def update(self, name: str, df: DataFrame) -> None:
        """Recompute the view over ``df`` Spark-side and publish the
        bounded snapshot (reference: perspective table.update per cycle,
        perspective_wrapper.py:143-153)."""
        entry = self._tables[name]
        page = entry.view.apply(df) if entry.view is not None else df
        snapshot = page.toArrow()
        with self._lock:
            entry.snapshot = snapshot
            entry.updates += 1

    def handle_sink(self, sink_name: str, value: Any, batch_id: int) -> None:
        """StreamingDagDriver sink-handler adapter: routes dag sink
        updates to same-named registered tables; ignores others."""
        if sink_name in self._tables and isinstance(value, DataFrame):
            self.update(sink_name, value)

    # -- http ----------------------------------------------------------
    @property
    def port(self) -> int:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_address[1]

    @property
    def url(self) -> str:
        return f"http://{self._host}:{self.port}"

    def start(self) -> "ViewServer":
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args: Any) -> None:  # quiet
                pass

            def _send(self, code: int, body: bytes, ctype: str) -> None:
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _json(self, code: int, payload: Any) -> None:
                body = json.dumps(payload, default=str).encode()
                self._send(code, body, "application/json")

            def do_GET(self) -> None:  # noqa: N802 (http.server API)
                path = self.path.rstrip("/")
                if path in ("", "/dashboard"):
                    self._send(200, _dashboard_html(), "text/html; charset=utf-8")
                    return
                if path == "/tables":
                    self._json(200, server._registry_payload())
                    return
                if path.startswith("/table/"):
                    name = path[len("/table/"):]
                    as_arrow = name.endswith(".arrow")
                    if as_arrow:
                        name = name[: -len(".arrow")]
                    snapshot = server._get_snapshot(name)
                    if snapshot is None:
                        self._json(404, {"error": f"no table {name!r}"})
                        return
                    if as_arrow:
                        self._send(
                            200,
                            table_to_ipc_bytes(snapshot),
                            "application/vnd.apache.arrow.stream",
                        )
                    else:
                        self._json(
                            200,
                            {
                                "name": name,
                                "columns": snapshot.column_names,
                                "rows": snapshot.to_pylist(),
                            },
                        )
                    return
                self._json(404, {"error": f"unknown path {self.path!r}"})

        self._httpd = ThreadingHTTPServer((self._host, self._port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None

    # -- internals -----------------------------------------------------
    def _registry_payload(self) -> dict:
        with self._lock:
            return {
                "tables": [
                    {
                        "name": name,
                        "rows": 0 if e.snapshot is None else e.snapshot.num_rows,
                        "updates": e.updates,
                        "schema": (
                            {}
                            if e.snapshot is None
                            else {
                                f.name: scalar_type_name(f.type)
                                for f in e.snapshot.schema
                            }
                        ),
                    }
                    for name, e in self._tables.items()
                ]
            }

    def _get_snapshot(self, name: str) -> pa.Table | None:
        with self._lock:
            entry = self._tables.get(name)
            return None if entry is None else entry.snapshot
