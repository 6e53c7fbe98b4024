"""Tabular operator concepts: typed table streams, filters, keyed
latest, concat, delta fan-out (reference examples:
examples/pyarrow_concepts.py + examples/polars_concepts.py — the same
surface here is DataFrame-native, so Catalyst owns the plan).

Run: ``python examples/tabular_concepts.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.operators import (  # noqa: E402
    concat_streams,
    filter_stream,
    get_column,
    last_by_keys,
)
from beavers_spark.session import get_spark  # noqa: E402

spark = get_spark("tabular_concepts_example")

SCHEMA = "seq long, ticker string, price double"
batch1 = spark.createDataFrame(
    [(1, "AAPL", 100.0), (2, "MSFT", 200.0), (3, "AAPL", 101.0)], SCHEMA
)
batch2 = spark.createDataFrame([(4, "GOOG", 150.0), (5, "MSFT", 205.0)], SCHEMA)

# filter_stream: positional predicates + kwargs equality (reference:
# pl.filter_stream constraints, polars_wrapper.py:75-86)
cheap_aapl = filter_stream(batch1, F.col("price") < 100.5, ticker="AAPL")
assert [r.seq for r in cheap_aapl.collect()] == [1]

# concat_streams: schema-checked union (pyarrow_wrapper.py:143-159)
both = concat_streams(batch1, batch2)
assert both.count() == 5

# last_by_keys: keyed latest with EXPLICIT arrival order — Spark has no
# implicit row order, so the seq column is the determinism contract
# (reference: max row index, pyarrow_wrapper.py:23-30)
latest = {r.ticker: r.price for r in last_by_keys(both, ["ticker"], ["seq"]).collect()}
assert latest == {"AAPL": 101.0, "MSFT": 205.0, "GOOG": 150.0}

# get_column projection
assert get_column(batch2, "ticker").columns == ["ticker"]

# delta fan-out (reference: pyarrow_concepts.py:140-180): an update batch
# touches some tickers; recompute ONLY rows whose key is affected,
# via a broadcast semi-join — never a full-state rescan at scale
state = both
update = spark.createDataFrame([(6, "MSFT", 210.0)], SCHEMA)
affected = state.join(
    F.broadcast(update.select("ticker").distinct()), "ticker", "left_semi"
)
assert {r.ticker for r in affected.collect()} == {"MSFT"}

print("tabular_concepts: all asserts passed")
