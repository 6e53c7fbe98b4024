"""DataFrame-payload dag scenarios: the reference's ETF golden sequence
(reference: tests/test_etfs.py:7-79 — initial join+agg, partial update,
unrelated update must NOT fire, new key, missing-price null) re-expressed
with Spark DataFrames as node values.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from beavers_spark.dag import Dag
from beavers_spark.operators import last_by_keys
from beavers_spark.testing import DagTestBench

T0 = pd.Timestamp("2024-01-01T00:00:00Z")


def ts(minutes: int) -> pd.Timestamp:
    return T0 + pd.Timedelta(minutes=minutes)


PRICE_SCHEMA = "seq long, ticker string, price double"
COMP_SCHEMA = "seq long, etf string, ticker string, weight double"


@pytest.fixture()
def etf_dag(spark):
    dag = Dag(spark)
    prices = dag.source_table(PRICE_SCHEMA, "prices")
    comps = dag.source_table(COMP_SCHEMA, "composition")

    # keyed upsert state: callable class holds the accumulated table, the
    # explicit seq column keeps arrival order deterministic (SURVEY §4.1.5)
    class Upsert:
        def __init__(self, keys):
            self.keys = keys
            self.table = None

        def __call__(self, batch):
            merged = (
                batch if self.table is None else self.table.unionByName(batch)
            )
            self.table = last_by_keys(merged, self.keys, ["seq"]).localCheckpoint()
            return self.table

    price_state = dag.state(Upsert(["ticker"])).map(prices)
    comp_state = dag.state(Upsert(["etf", "ticker"])).map(comps)

    def nav(price_df, comp_df):
        joined = comp_df.join(price_df.select("ticker", "price"), "ticker", "left")
        return (
            joined.groupBy("etf")
            .agg(
                F.when(
                    F.count("price") < F.count("weight"), F.lit(None).cast("double")
                )
                .otherwise(
                    F.sum(F.col("price") * F.col("weight")) / F.sum("weight")
                )
                .alias("nav")
            )
        )

    nav_node = dag.state(nav).map(price_state, comp_state)
    dag.sink("nav", nav_node)
    return dag


def _prices(spark, seq, rows):
    return spark.createDataFrame(
        [(seq + i, t, p) for i, (t, p) in enumerate(rows)], PRICE_SCHEMA
    )


def _comps(spark, seq, rows):
    return spark.createDataFrame(
        [(seq + i, e, t, w) for i, (e, t, w) in enumerate(rows)], COMP_SCHEMA
    )


def test_etf_golden_sequence(spark, etf_dag):
    bench = DagTestBench(etf_dag)

    # 1) initial prices + composition -> NAV = (180*1 + 120*1.5)/2.5 = 144
    bench.set_source("prices", _prices(spark, 0, [("AAPL", 180.0), ("GOOG", 120.0)]))
    bench.set_source(
        "composition", _comps(spark, 0, [("TECH", "AAPL", 1.0), ("TECH", "GOOG", 1.5)])
    )
    bench.execute(ts(0)).assert_sink_updated("nav")
    bench.assert_sink_rows("nav", [("TECH", 144.0)])

    # 2) AAPL -> 200: NAV = (200 + 180)/2.5 = 152
    bench.set_source("prices", _prices(spark, 10, [("AAPL", 200.0)]))
    bench.execute(ts(1)).assert_sink_rows("nav", [("TECH", 152.0)])

    # 3) unrelated ticker update: price state fires, NAV recomputes to the
    # same value (reference asserts no sink fire via cutoff; the kernel
    # equivalent is wrapping nav in dag.cutoff + dataframe_equal)
    bench.set_source("prices", _prices(spark, 20, [("MSFT", 310.0)]))
    bench.execute(ts(2)).assert_sink_rows("nav", [("TECH", 152.0)])

    # 4) new ETF referencing MSFT and GOOG
    bench.set_source(
        "composition", _comps(spark, 10, [("SOFT", "MSFT", 0.5), ("SOFT", "GOOG", 1.0)])
    )
    bench.execute(ts(3)).assert_sink_rows(
        "nav", [("SOFT", (310.0 * 0.5 + 120.0 * 1.0) / 1.5), ("TECH", 152.0)]
    )

    # 5) SOFT gains a missing-price constituent -> NAV null
    bench.set_source("composition", _comps(spark, 20, [("SOFT", "ORCL", 1.0)]))
    bench.execute(ts(4)).assert_sink_rows(
        "nav", [("SOFT", None), ("TECH", 152.0)]
    )


def test_no_fire_with_dataframe_cutoff(spark):
    from beavers_spark.dag import dataframe_equal

    dag = Dag(spark)
    src = dag.source_table("k string, v long", "in")

    class Upsert:
        def __init__(self):
            self.table = None

        def __call__(self, batch):
            agg = batch.groupBy("k").agg(F.max("v").alias("v"))
            if self.table is not None:
                agg = last_by_keys(
                    self.table.withColumn("seq", F.lit(0)).unionByName(
                        agg.withColumn("seq", F.lit(1))
                    ),
                    ["k"],
                    ["seq"],
                ).drop("seq")
            self.table = agg.localCheckpoint()
            return self.table

    state = dag.state(Upsert()).map(src)
    cut = dag.cutoff(state, comparator=dataframe_equal)
    dag.sink("out", cut)
    bench = DagTestBench(dag)

    bench.set_source("in", spark.createDataFrame([("a", 1)], "k string, v long"))
    bench.execute(ts(0)).assert_sink_updated("out")
    # same value again -> cutoff suppresses the sink
    bench.set_source("in", spark.createDataFrame([("a", 1)], "k string, v long"))
    bench.execute(ts(1)).assert_sink_not_updated("out")
    bench.set_source("in", spark.createDataFrame([("a", 2)], "k string, v long"))
    bench.execute(ts(2)).assert_sink_updated("out")


def test_word_count_incremental(spark):
    """Streaming word-count (reference: examples/kafka_concepts.py:12-31):
    per-cycle emit only the counts of words updated this cycle."""
    dag = Dag(spark)
    src = dag.source_table("word string", "words")

    class Counts:
        def __init__(self):
            self.table = None

        def __call__(self, batch):
            delta = batch.groupBy("word").agg(F.count("*").alias("n"))
            if self.table is None:
                self.table = delta.localCheckpoint()
            else:
                merged = (
                    self.table.alias("old")
                    .join(delta.alias("new"), "word", "full_outer")
                    .select(
                        "word",
                        (
                            F.coalesce(F.col("old.n"), F.lit(0))
                            + F.coalesce(F.col("new.n"), F.lit(0))
                        ).alias("n"),
                    )
                )
                self.table = merged.localCheckpoint()
            return self.table

    counts = dag.state(Counts()).map(src)

    def changed_only(batch, table):
        return table.join(batch.select("word").distinct(), "word", "left_semi")

    update_stream = dag.table_stream(changed_only, "word string, n long").map(
        src, counts
    )
    dag.sink("updates", update_stream)
    bench = DagTestBench(dag)

    bench.set_source(
        "words", spark.createDataFrame([("foo",), ("bar",), ("foo",)], "word string")
    )
    bench.execute(ts(0)).assert_sink_rows("updates", [("bar", 1), ("foo", 2)])

    bench.set_source("words", spark.createDataFrame([("foo",)], "word string"))
    bench.execute(ts(1)).assert_sink_rows("updates", [("foo", 3)])  # bar unchanged: not emitted
