"""Live dashboard serving: keyed-latest TableView published over HTTP
with JSON + Arrow IPC endpoints (reference: perspective dashboard sink,
beavers/perspective_wrapper.py:156-285 — indexed table, declarative
sort/filter/limit, Arrow IPC wire bytes).

Run: ``python examples/serving_dashboard.py``
"""

from __future__ import annotations

import json
import os
import sys
import urllib.request

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from beavers_spark.operators.view import TableView, ViewFilter  # noqa: E402
from beavers_spark.serving import ViewServer  # noqa: E402
from beavers_spark.session import get_spark  # noqa: E402

spark = get_spark("serving_example")

# a dashboard view: latest price per ticker, positive prices only,
# top 5 by price — compiles Spark-side to TakeOrderedAndProject
view = TableView(
    index_columns=["ticker"],
    order_by=["seq"],
    sort=[("price", "desc")],
    filters=(ViewFilter("price", ">", 0),),
    limit=5,
)

server = ViewServer().start()
server.register("prices", view)

updates = spark.createDataFrame(
    [
        ("AAPL", 1, 100.0),
        ("MSFT", 2, 200.0),
        ("AAPL", 3, 150.0),  # upsert: latest AAPL wins
        ("JUNK", 4, -1.0),  # filtered out by the view
    ],
    "ticker string, seq int, price double",
)
server.update("prices", updates)  # in live mode: server.handle_sink via dag

page = json.loads(
    urllib.request.urlopen(server.url + "/table/prices", timeout=10).read()
)
assert [(r["ticker"], r["price"]) for r in page["rows"]] == [
    ("MSFT", 200.0),
    ("AAPL", 150.0),
]

# Arrow IPC — the bytes a perspective-style web client would ingest
ipc = urllib.request.urlopen(server.url + "/table/prices.arrow", timeout=10).read()
table = pa.ipc.open_stream(ipc).read_all()
assert table.num_rows == 2

registry = json.loads(urllib.request.urlopen(server.url + "/tables", timeout=10).read())
assert registry["tables"][0]["schema"]["price"] == "float"

# GET / is a browsable live page (open server.url in a browser while the
# pipeline runs): the bundled single-file dashboard polls /tables and
# /table/<name>, with client-side sort — the table.html analog
home = urllib.request.urlopen(server.url + "/", timeout=10).read().decode()
assert "<!DOCTYPE html>" in home and "/tables" in home

# the same dashboard can sit on DURABLE upsert state: KeyedStateTable
# keeps latest-row-per-key in bucketed parquet (survives restarts; at
# 100 TB the dashboard reads a partition-pruned table, not process RAM)
import tempfile  # noqa: E402

from beavers_spark.streaming import KeyedStateTable  # noqa: E402

with tempfile.TemporaryDirectory() as tmp:
    state = KeyedStateTable(
        os.path.join(tmp, "prices"), keys=["ticker"], order_by="seq",
        n_buckets=8,
    )
    state(updates, 0)  # in live mode: writeStream.foreachBatch(state)
    server.update("prices", state.read(spark))
    page = json.loads(
        urllib.request.urlopen(server.url + "/table/prices", timeout=10).read()
    )
    assert [(r["ticker"], r["price"]) for r in page["rows"]] == [
        ("MSFT", 200.0),
        ("AAPL", 150.0),
    ]

server.stop()
print("serving_dashboard: all asserts passed")
