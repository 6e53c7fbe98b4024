"""ETF valuation pipeline: price/composition upserts -> NAV per ETF,
updated incrementally (reference business example: examples/etfs.py +
golden sequence tests/test_etfs.py:7-79 — initial join+agg, partial
update, missing-price null).

Spark-first: node payloads are DataFrames; the join + weighted average is
ordinary Catalyst planning; the explicit ``seq`` column makes keyed
upserts deterministic (Spark has no implicit row order — SURVEY §4.1.5).

Run: ``python examples/etf_pipeline.py``
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from beavers_spark.dag import Dag  # noqa: E402
from beavers_spark.operators import last_by_keys  # noqa: E402
from beavers_spark.session import get_spark  # noqa: E402
from beavers_spark.testing import DagTestBench  # noqa: E402

spark = get_spark("etf_pipeline_example")

PRICE_SCHEMA = "seq long, ticker string, price double"
COMP_SCHEMA = "seq long, etf string, ticker string, weight double"


class Upsert:
    """Keyed-latest state: accumulate batches, keep the newest row per
    key by the explicit seq column."""

    def __init__(self, keys: list[str]) -> None:
        self.keys = keys
        self.table = None

    def __call__(self, batch):
        merged = batch if self.table is None else self.table.unionByName(batch)
        self.table = last_by_keys(merged, self.keys, ["seq"]).localCheckpoint()
        return self.table


def nav(price_df, comp_df):
    """Weighted NAV per ETF; NULL if any component price is missing
    (reference: calculate_nav, examples/etfs.py:70-91)."""
    joined = comp_df.join(price_df.select("ticker", "price"), "ticker", "left")
    return joined.groupBy("etf").agg(
        F.when(F.count("price") < F.count("weight"), F.lit(None).cast("double"))
        .otherwise(F.sum(F.col("price") * F.col("weight")) / F.sum("weight"))
        .alias("nav")
    )


dag = Dag(spark)
prices = dag.source_table(PRICE_SCHEMA, "prices")
comps = dag.source_table(COMP_SCHEMA, "composition")
price_state = dag.state(Upsert(["ticker"])).map(prices)
comp_state = dag.state(Upsert(["etf", "ticker"])).map(comps)
navs = dag.stream(nav, empty_factory=None).map(price_state, comp_state)
dag.sink("navs", navs)

bench = DagTestBench(dag)

# cycle 1: initial composition + both prices -> NAV computed
bench.set_source(
    "composition",
    spark.createDataFrame(
        [(1, "TECH", "AAPL", 2.0), (2, "TECH", "MSFT", 1.0)], COMP_SCHEMA
    ),
).set_source(
    "prices",
    spark.createDataFrame([(1, "AAPL", 100.0), (2, "MSFT", 200.0)], PRICE_SCHEMA),
).execute("2024-01-01T00:00:00").assert_sink_rows(
    "navs", [("TECH", (2 * 100.0 + 1 * 200.0) / 3)]
)

# cycle 2: partial price update re-prices the ETF
bench.set_source(
    "prices", spark.createDataFrame([(3, "AAPL", 110.0)], PRICE_SCHEMA)
).execute("2024-01-01T00:01:00").assert_sink_rows(
    "navs", [("TECH", (2 * 110.0 + 1 * 200.0) / 3)]
)

# cycle 3: new composition referencing an unpriced ticker -> NULL NAV
bench.set_source(
    "composition", spark.createDataFrame([(3, "NEW", "NVDA", 1.0)], COMP_SCHEMA)
).execute("2024-01-01T00:02:00").assert_sink_rows(
    "navs", [("TECH", (2 * 110.0 + 1 * 200.0) / 3), ("NEW", None)]
)

print("etf_pipeline: all asserts passed")
