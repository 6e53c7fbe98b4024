"""ViewServer — HTTP latest-state dashboard serving (perspective analog)."""

from __future__ import annotations

import json
import urllib.request

import pyarrow as pa
import pytest

from beavers_spark.operators.view import TableView, ViewFilter
from beavers_spark.serving import ViewServer, scalar_type_name, table_to_ipc_bytes


def _get(url: str) -> bytes:
    with urllib.request.urlopen(url, timeout=10) as resp:
        return resp.read()


@pytest.fixture()
def server():
    s = ViewServer().start()
    yield s
    s.stop()


def test_serves_view_snapshot_json_and_arrow(spark, server):
    view = TableView(
        index_columns=["ticker"],
        order_by=["seq"],
        sort=[("price", "desc")],
        filters=(ViewFilter("price", ">", 0),),
        limit=10,
    )
    server.register("prices", view)

    df = spark.createDataFrame(
        [
            ("AAPL", 1, 100.0),
            ("MSFT", 2, 200.0),
            ("AAPL", 3, 150.0),  # upsert: latest per ticker wins
            ("BAD", 4, -1.0),  # filtered out
        ],
        "ticker string, seq int, price double",
    )
    server.update("prices", df)

    registry = json.loads(_get(server.url + "/tables"))
    (entry,) = registry["tables"]
    assert entry["name"] == "prices"
    assert entry["rows"] == 2 and entry["updates"] == 1
    assert entry["schema"] == {
        "ticker": "string",
        "seq": "integer",
        "price": "float",
    }

    page = json.loads(_get(server.url + "/table/prices"))
    assert [(r["ticker"], r["price"]) for r in page["rows"]] == [
        ("MSFT", 200.0),
        ("AAPL", 150.0),  # latest AAPL row, sorted desc by price
    ]

    # Arrow IPC wire format — what a perspective-style client ingests
    ipc = _get(server.url + "/table/prices.arrow")
    table = pa.ipc.open_stream(ipc).read_all()
    assert table.num_rows == 2
    assert table.column("ticker").to_pylist() == ["MSFT", "AAPL"]


def test_dashboard_page_served_at_root(server):
    """GET / is a browsable HTML page over the JSON endpoints (reference
    ships table.html + assets/, perspective_wrapper.py:235-285)."""
    for path in ("/", "/dashboard"):
        with urllib.request.urlopen(server.url + path, timeout=10) as resp:
            assert resp.headers["Content-Type"].startswith("text/html")
            page = resp.read().decode()
        assert "<!DOCTYPE html>" in page
        # the page drives the documented API, not a private one
        assert "/tables" in page and "/table/" in page


def test_unknown_table_404(server):
    server.register("known")
    req = urllib.request.Request(server.url + "/table/nope")
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=10)
    assert err.value.code == 404


def test_handle_sink_routes_by_name(spark, server):
    server.register("watch")  # no view: raw snapshot
    df = spark.createDataFrame([(1,)], "x int")
    server.handle_sink("watch", df, batch_id=0)
    server.handle_sink("other", df, batch_id=0)  # unregistered: ignored
    page = json.loads(_get(server.url + "/table/watch"))
    assert page["rows"] == [{"x": 1}]


def test_scalar_type_names():
    assert scalar_type_name(pa.int64()) == "integer"
    assert scalar_type_name(pa.float32()) == "float"
    assert scalar_type_name(pa.bool_()) == "boolean"
    assert scalar_type_name(pa.date32()) == "date"
    assert scalar_type_name(pa.string()) == "string"
    assert scalar_type_name(pa.timestamp("ns", "UTC")) == "datetime"
    assert scalar_type_name(pa.list_(pa.int64())) == "list<item: int64>"


def test_ipc_roundtrip():
    t = pa.table({"a": [1, 2], "b": ["x", "y"]})
    out = pa.ipc.open_stream(table_to_ipc_bytes(t)).read_all()
    assert out.equals(t)
