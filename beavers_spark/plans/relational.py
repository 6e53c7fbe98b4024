"""Core relational plans — one per operator row of SURVEY.md §2.

Each plan cites the reference usage it re-expresses (file:line into
/root/reference) and is paired with a DuckDB oracle. Spark-first: every
plan is pure DataFrame API, so Catalyst handles pushdown/pruning/join
strategy; ``F.broadcast`` marks the genuinely small dimensions.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from beavers_spark.operators import (
    concat_streams,
    filter_stream,
    join_counts,
    last_by_keys,
    topk,
    weighted_average,
)
from beavers_spark.plans.common import t
from beavers_spark.plans.registry import query

# ---------------------------------------------------------------------------
# Flagship: the ETF-valuation shape (join -> arithmetic -> keyed sum)
# Reference: examples/pyarrow_concepts.py:64-74 (ops #27-29)
# ---------------------------------------------------------------------------


@query(
    "etf_valuation",
    oracle="""
    SELECT p_brand,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_value,
           count(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def etf_valuation(spark, sf_dir):
    """Composition x price -> value -> sum per basket, on lineitem x part.

    Scale: ``part`` is the small dimension -> broadcast join (no shuffle of
    the fact table); the groupBy is one hash shuffle with map-side partials.
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .withColumn("value", F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("value"), 4).alias("total_value"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Filters / projection (ops #17, #23, #34, #35)
# ---------------------------------------------------------------------------


@query(
    "filter_predicate",
    oracle="""
    SELECT l_orderkey, l_partkey, round(l_quantity, 6) AS qty
    FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'
    """,
)
def filter_predicate(spark, sf_dir):
    """Predicate filter with kwargs equality (reference:
    pyarrow_wrapper.py:112-125, polars_wrapper.py:75-86). Both predicates
    reach the parquet scan as PushedFilters."""
    li = t(spark, sf_dir, "lineitem")
    return filter_stream(
        li, F.col("l_quantity") > 45, l_returnflag="R"
    ).select("l_orderkey", "l_partkey", F.round("l_quantity", 6).alias("qty"))


@query(
    "projection_rename",
    oracle="""
    SELECT c_custkey AS custkey, c_name AS name, c_mktsegment AS segment
    FROM customer
    """,
)
def projection_rename(spark, sf_dir):
    """Projection + rename (reference: tests/test_pyarrow_wrapper.py:44-47,
    examples/pyarrow_concepts.py:73). Column pruning reaches the scan."""
    return t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )


# ---------------------------------------------------------------------------
# Keyed latest state (op #18/#24/#31) — the reference's flagship state op
# ---------------------------------------------------------------------------


@query(
    "last_by_keys",
    oracle="""
    SELECT user_id,
           event_id AS last_event_id,
           event_type AS last_event_type,
           round(value, 6) AS last_value,
           epoch_us(ts) AS last_ts_us
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def last_by_keys_q(spark, sf_dir):
    """Latest row per key with explicit arrival order (ts, event_id).

    Reference: pa.last_by_keys (pyarrow_wrapper.py:127-133) keyed on max
    row index; Spark needs the order explicit (SURVEY §4.1.5)."""
    ev = t(spark, sf_dir, "events")
    return last_by_keys(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round("value", 6).alias("last_value"),
        F.unix_micros("ts").alias("last_ts_us"),
    )


@query(
    "argmax_latest",
    oracle="""
    SELECT event_type, round(value, 6) AS latest_value, n FROM (
        SELECT event_type, value,
               row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY ts DESC, event_id DESC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM events)
    WHERE rn = 1
    """,
)
def argmax_latest(spark, sf_dir):
    """Ordered last()-style aggregation per group (reference:
    polars_wrapper.py:22-26 maintain_order last; op #31) via max_by with a
    composite order key — single shuffle, no window pass."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(
            F.max_by("value", F.struct("ts", "event_id")), 6
        ).alias("latest_value"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# Union / distinct / set ops (ops #20, #25, #32, #39, #42)
# ---------------------------------------------------------------------------


@query(
    "concat_streams",
    oracle="""
    SELECT event_id, event_type FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, event_type FROM events WHERE event_type = 'view'
    """,
)
def concat_streams_q(spark, sf_dir):
    """Type-checked stream concat (reference: pyarrow_wrapper.py:143-159)."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "event_type")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "event_type")
    return concat_streams(clicks, views)


@query(
    "distinct_values",
    oracle="SELECT DISTINCT event_type FROM events",
)
def distinct_values(spark, sf_dir):
    """Distinct/unique (reference: examples/pyarrow_concepts.py:143-147)."""
    return t(spark, sf_dir, "events").select("event_type").distinct()


@query(
    "set_dedup_batch",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def set_dedup_batch(spark, sf_dir):
    """Set-valued stream: dedup within batch (reference:
    examples/dag_concepts.py:58-63 set-stream)."""
    return t(spark, sf_dir, "events").dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )


@query(
    "merge_sorted_union",
    oracle="""
    SELECT epoch_us(ts) AS ts_us, 'events' AS src FROM events
    UNION ALL
    SELECT epoch_us(o_orderdate) AS ts_us, 'orders' AS src FROM orders
    """,
)
def merge_sorted_union(spark, sf_dir):
    """Merge-sorted union by timestamp (reference:
    scripts/kafka_test_bench.py:20-22). orderBy range-partitions at scale."""
    ev = t(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("ts_us"), F.lit("events").alias("src")
    )
    orders = t(spark, sf_dir, "orders").select(
        F.unix_micros("o_orderdate").alias("ts_us"), F.lit("orders").alias("src")
    )
    return concat_streams(ev, orders).orderBy("ts_us")


# ---------------------------------------------------------------------------
# Joins (ops #27, #33, #40)
# ---------------------------------------------------------------------------


@query(
    "semi_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    """,
)
def semi_join(spark, sf_dir):
    """Semi-join / IN-list filter (reference:
    examples/pyarrow_concepts.py:144-148 is_in). left_semi never
    duplicates rows and only shuffles the key column of the right side."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@query(
    "anti_join",
    oracle="""
    SELECT p_partkey, p_name FROM part
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
    """,
)
def anti_join(spark, sf_dir):
    """NOT EXISTS complement of the semi-join (beyond-reference set op)."""
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem")
    return part.join(li, part.p_partkey == li.l_partkey, "left_anti").select(
        "p_partkey", "p_name"
    )


@query(
    "delta_fanout",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM events
    WHERE user_id IN (SELECT DISTINCT user_id FROM events
                      WHERE event_type = 'purchase')
    GROUP BY user_id
    """,
)
def delta_fanout(spark, sf_dir):
    """Changed-key -> affected-group fan-out recompute (reference:
    examples/pyarrow_concepts.py:140-180: changed tickers -> affected ETFs).
    The updated-key set is tiny -> broadcast semi-join, then one agg."""
    ev = t(spark, sf_dir, "events")
    changed = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return (
        ev.join(F.broadcast(changed), "user_id", "left_semi")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


@query(
    "isin_filter",
    oracle="""
    SELECT event_type, count(*) AS n FROM events
    WHERE event_type IN ('click', 'purchase') GROUP BY event_type
    """,
)
def isin_filter(spark, sf_dir):
    """Literal IN-list filter (reference: pc.is_in,
    examples/pyarrow_concepts.py:163-170); pushed to the scan."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# Aggregations (ops #29, #30, #37, #38, #44)
# ---------------------------------------------------------------------------


@query(
    "groupby_sum",
    oracle="""
    SELECT l_returnflag, round(sum(l_quantity), 4) AS sum_qty,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def groupby_sum(spark, sf_dir):
    """Hash aggregation sum-by-key (reference:
    examples/pyarrow_concepts.py:70-73)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "groupby_max",
    oracle="""
    SELECT l_partkey, round(max(l_extendedprice), 6) AS max_price,
           count(*) AS n
    FROM lineitem GROUP BY l_partkey
    """,
)
def groupby_max(spark, sf_dir):
    """Max-by-key (reference: argmax index agg, pyarrow_wrapper.py:26-29)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.round(F.max("l_extendedprice"), 6).alias("max_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "word_count",
    oracle="""
    SELECT word, count(*) AS n
    FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def word_count(spark, sf_dir):
    """The reference's streaming word-count example in batch form
    (examples/kafka_concepts.py:12-18, tests/test_util.py:67-75)."""
    docs = t(spark, sf_dir, "documents")
    parallelism = spark.sparkContext.defaultParallelism
    return (
        docs.repartition(parallelism)  # one small file = one partition
        .select(F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "weighted_average",
    oracle="""
    SELECT p_brand,
           round(sum(p_retailprice * l_quantity) / sum(l_quantity), 4) AS wavg
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def weighted_average_q(spark, sf_dir):
    """NAV-style weighted average Σ(p·w)/Σw per basket (reference:
    examples/etfs.py:70-91). Missing-component->null branch is exercised in
    unit tests (no nulls in this dataset)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    wavg = weighted_average(
        joined, ["p_brand"], "p_retailprice", "l_quantity", out_col="wavg_raw"
    )
    return wavg.select("p_brand", F.round("wavg_raw", 4).alias("wavg"))


@query(
    "join_counts_pivot",
    oracle="""
    SELECT coalesce(c.user_id, v.user_id) AS user_id,
           coalesce(c.n, 0) AS clicks,
           coalesce(v.n, 0) AS views
    FROM (SELECT user_id, count(*) AS n FROM events
          WHERE event_type = 'click' GROUP BY user_id) c
    FULL OUTER JOIN
         (SELECT user_id, count(*) AS n FROM events
          WHERE event_type = 'view' GROUP BY user_id) v
    ON c.user_id = v.user_id
    """,
)
def join_counts_pivot(spark, sf_dir):
    """Cross-tab of two counters, absent side = 0 (reference:
    tests/test_util.py:78-81 join_counts via pandas concat+fillna)."""
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    views = ev.filter(F.col("event_type") == "view")
    return join_counts(clicks, views, "user_id", "clicks", "views")


@query(
    "pivot_linestatus",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark, sf_dir):
    """Pivot/cross-tab (op #44 generalized): one shuffle, pivot values
    declared up front so no extra distinct-discovery job runs."""
    li = t(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
    )
    return piv.select(
        "l_returnflag",
        F.round(F.col("O"), 4).alias("O"),
        F.round(F.col("F"), 4).alias("F"),
    )


@query(
    "rollup_agg",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark, sf_dir):
    """Hierarchical rollup totals (beyond-reference; Catalyst expands to a
    single expand+agg, one shuffle)."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
    )


# ---------------------------------------------------------------------------
# Time & windows (ops #43, #45, #46; beyond-reference analytic windows)
# ---------------------------------------------------------------------------


@query(
    "time_delay",
    oracle="""
    SELECT event_type,
           round(sum(delay_us) / count(*), 4) AS avg_delay_us
    FROM (SELECT event_type,
                 epoch_us(ts) - min(epoch_us(ts))
                     OVER (PARTITION BY user_id) AS delay_us
          FROM events)
    GROUP BY event_type
    """,
)
def time_delay(spark, sf_dir):
    """Per-row time-delay vs a reference clock (reference:
    examples/advanced_concepts.py:67-87 now - timestamp).

    The mean is computed as exact-integer sum / count, NOT avg(): both
    engines sum int64 microseconds exactly (Spark long, DuckDB HUGEINT)
    and perform ONE double division, so the result is bit-stable at any
    scale — avg() accumulates in floating point, whose ~1e11-magnitude
    drift flips the 4th decimal at sf0.1."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    return (
        ev.withColumn(
            "delay_us", F.unix_micros("ts") - F.min(F.unix_micros("ts")).over(w)
        )
        .groupBy("event_type")
        .agg(
            F.round(
                F.sum("delay_us") / F.count(F.lit(1)), 4
            ).alias("avg_delay_us")
        )
    )


@query(
    "topk_customers",
    oracle="""
    SELECT c_custkey, c_name, round(c_acctbal, 6) AS acctbal
    FROM customer ORDER BY c_acctbal DESC, c_custkey LIMIT 10
    """,
)
def topk_customers(spark, sf_dir):
    """Sort+limit view (reference: perspective table definition
    perspective_wrapper.py:52-57). Compiles to TakeOrderedAndProject."""
    cust = t(spark, sf_dir, "customer")
    return topk(
        cust, [F.col("c_acctbal").desc(), F.col("c_custkey").asc()], 10
    ).select("c_custkey", "c_name", F.round("c_acctbal", 6).alias("acctbal"))


@query(
    "window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey, rnk FROM (
        SELECT o_custkey, o_orderkey,
               row_number() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders)
    WHERE rnk <= 3
    """,
)
def window_rank(spark, sf_dir):
    """Top-N per group via ranking window (beyond-reference: SURVEY §2.7
    notes the reference lacks window ranking; Spark-native)."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@query(
    "running_sum",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4
           ) AS running_value
    FROM events
    """,
)
def running_sum(spark, sf_dir):
    """Running per-key cumulative sum (beyond-reference analytic window)."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
    )


@query(
    "tumbling_window",
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS total
    FROM events GROUP BY 1, 2
    """,
)
def tumbling_window(spark, sf_dir):
    """Tumbling event-time window aggregation (reference analog: yearly
    timer bucket, examples/advanced_concepts.py:94-115; Spark-native
    ``window()`` is the streaming-compatible form)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "total",
        )
    )


@query(
    "scalar_transform",
    oracle="""
    SELECT event_id,
           round(value * 2 + 1, 6) AS scaled,
           round(sqrt(abs(value)), 6) AS root,
           CAST(floor(value) AS BIGINT) AS floored
    FROM events
    """,
)
def scalar_transform(spark, sf_dir):
    """Map-side per-element arithmetic (reference: multiply_by_2 et al,
    examples/dag_concepts.py:39-47; op #41). Pure codegen'd projection —
    zero shuffle, the shape that must never become a Python UDF."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.round(F.col("value") * 2 + 1, 6).alias("scaled"),
        F.round(F.sqrt(F.abs("value")), 6).alias("root"),
        F.floor("value").cast("bigint").alias("floored"),
    )


@query(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract(spark, sf_dir):
    """JSON deserialization of the message payload (reference:
    JsonDeserializer, pyarrow_kafka.py:16-34 -> from_json)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.from_json(F.col("props"), "k BIGINT").getField("k").alias("k"),
    )


@query(
    "hourly_rollup",
    oracle="""
    SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
           count(*) AS n, round(sum(value), 4) AS total
    FROM events
    GROUP BY 1, 2
    """,
)
def hourly_rollup(spark, sf_dir):
    """Time-bucketed rollup: date_trunc-hour x event_type aggregation —
    the canonical time-series downsample. One hash shuffle with map-side
    partials; at scale the hour bucket doubles as the natural write
    partition for the rollup table."""
    from beavers_spark.plans.common import ts_us

    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .select(ts_us("h").alias("hour_us"), "event_type", "n", "total")
    )


@query(
    "stats_by_segment",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           round(avg(o_totalprice), 4) AS avg_price,
           round(stddev_samp(o_totalprice), 4) AS sd_price,
           round(corr(o_totalprice, c_acctbal), 4) AS price_bal_corr
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def stats_by_segment(spark, sf_dir):
    """Statistical aggregates (stddev, correlation) per market segment:
    broadcast the customer dimension, single-pass moment accumulation in
    the agg (no second scan for the variance)."""
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(
            F.broadcast(cust), orders.o_custkey == cust.c_custkey
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.round(F.stddev_samp("o_totalprice"), 4).alias("sd_price"),
            F.round(F.corr("o_totalprice", "c_acctbal"), 4).alias(
                "price_bal_corr"
            ),
        )
    )


@query(
    "rolling_avg",
    oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS avg5
    FROM events
    """,
)
def rolling_avg(spark, sf_dir):
    """Trailing 5-row moving average per user (the bounded-frame window
    shape — running_sum covers the unbounded frame). One shuffle keyed
    on user_id; the frame recompute is O(frame) per row and the
    partition sort is per-user volume, never corpus-global."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w), 4).alias("avg5"),
    )


@query(
    "anomaly_zscore",
    oracle="""
    WITH stats AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(27,12))) AS DOUBLE) AS sv,
               CAST(sum(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE)
                   AS sv2
        FROM events GROUP BY 1, 2
    ),
    derived AS (
        SELECT event_type, day, sv / n AS m,
               sqrt(greatest((sv2 - sv * sv / n) / nullif(n - 1, 0), 0))
                   AS s
        FROM stats
    )
    SELECT e.event_id, e.event_type,
           round((e.value - d.m) / nullif(d.s, 0), 4) + 0.0 AS z
    FROM events e
    JOIN derived d
      ON e.event_type = d.event_type
     AND date_trunc('day', e.ts) = d.day
    """,
)
def anomaly_zscore(spark, sf_dir):
    """Per-event z-score against its (event_type, day) population — the
    metrics-anomaly primitive; thresholding the score is the caller's
    dial (a registered boolean flag would hash-flip on scores landing
    exactly at the cut). Mean/stddev derive from ORDER-EXACT decimal
    sums (Σv, Σv² — the label_centroids trick), so both engines divide
    identical doubles and the 4dp round can't straddle a float-drift
    boundary at any sf. The stats table is dimension-sized (types ×
    days) and broadcasts back; no window carries raw rows."""
    ev = t(spark, sf_dir, "events")
    stats = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(27,12)"))
        .cast("double")
        .alias("sv"),
        F.sum((F.col("value") * F.col("value")).cast("decimal(38,12)"))
        .cast("double")
        .alias("sv2"),
    )
    derived = stats.select(
        "event_type",
        "day",
        (F.col("sv") / F.col("n")).alias("m"),
        F.sqrt(
            F.greatest(
                (F.col("sv2") - F.col("sv") * F.col("sv") / F.col("n"))
                / F.nullif(F.col("n") - 1, F.lit(0)),
                F.lit(0.0),
            )
        ).alias("s"),
    )
    return (
        ev.withColumn("day", F.date_trunc("day", "ts"))
        .join(F.broadcast(derived), ["event_type", "day"])
        .select(
            "event_id",
            "event_type",
            # + 0.0 folds -0.0 to 0.0 (a z rounding to negative zero
            # reprs differently across engines)
            (
                F.round(
                    (F.col("value") - F.col("m"))
                    / F.nullif(F.col("s"), F.lit(0)),
                    4,
                )
                + F.lit(0.0)
            ).alias("z"),
        )
    )


@query(
    "time_weighted_avg",
    oracle="""
    WITH spans AS (
        SELECT user_id, value,
               (lead(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                - epoch_us(ts)) / 3600000000.0 AS dt_h
        FROM events
    )
    SELECT user_id,
           round(sum(value * dt_h) / sum(dt_h), 4) AS twa
    FROM spans WHERE dt_h IS NOT NULL
    GROUP BY user_id
    """,
)
def time_weighted_avg(spark, sf_dir):
    """Time-weighted average value per user — each observation weighted
    by how long it was the LATEST one (the financial TWAP/position-value
    shape, thematic to the reference's ETF examples). lead() over the
    per-user sort gives the holding span; the weights are hours (a
    double near unity) so the weighted sums stay well inside the
    round-4 tolerance at any series length. One user-keyed shuffle."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    spans = ev.select(
        "user_id",
        "value",
        (
            (
                F.lead(F.unix_micros("ts")).over(w)
                - F.unix_micros("ts")
            )
            / F.lit(3.6e9)
        ).alias("dt_h"),
    ).filter(F.col("dt_h").isNotNull())
    return spans.groupBy("user_id").agg(
        F.round(
            F.sum(F.col("value") * F.col("dt_h")) / F.sum("dt_h"), 4
        ).alias("twa")
    )


@query(
    "window_distribution",
    oracle="""
    SELECT o_orderkey, tile,
           round(pct_rank, 6) AS pct_rank,
           round(cume, 6) AS cume
    FROM (
        SELECT o_orderkey,
               ntile(4) OVER w AS tile,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    )
    """,
)
def window_distribution(spark, sf_dir):
    """Distribution-rank window functions — ntile / percent_rank /
    cume_dist per order-priority class (beyond-reference §2.7 breadth:
    the quartile/percentile bucketing a feature pipeline derives from
    ranked business keys). The window ORDER BY is made TOTAL with the
    orderkey tiebreak, so tile boundaries and both rank fractions are
    deterministic on both engines. One hash exchange on the partition
    key; the output is a per-row projection of the sorted runs."""
    orders = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return orders.select(
        "o_orderkey",
        F.ntile(4).over(w).alias("tile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "unpivot_metrics",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, round(value, 6) AS value
    FROM (
        SELECT l_orderkey, l_linenumber,
               'quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'extendedprice', l_extendedprice FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber,
               'discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem
    )
    """,
)
def unpivot_metrics(spark, sf_dir):
    """UNPIVOT (melt) — the inverse of the pivot plans: four lineitem
    measure columns become (metric, value) rows, the long format a
    metrics store or feature pipeline ingests. Spark-native
    ``unpivot`` (a Generate/Expand over the scan — ONE pass, no join,
    no shuffle; the four-way UNION the oracle runs is the semantic
    spec, not the plan). At 100 TB this is a 4x row fan-out of a
    column-pruned scan — map-side only."""
    li = t(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "metric",
        "value",
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("substring(metric, 3)").alias("metric"),
        F.round("value", 6).alias("value"),
    )


@query(
    "mad_by_priority",
    oracle="""
    WITH med AS (
        SELECT o_orderpriority, median(o_totalprice) AS m
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           round(any_value(med.m), 4) AS med_price,
           round(median(abs(o.o_totalprice - med.m)), 4) AS mad_price
    FROM orders o JOIN med USING (o_orderpriority)
    GROUP BY o.o_orderpriority
    """,
)
def mad_by_priority(spark, sf_dir):
    """Median absolute deviation per order-priority class — the robust
    dispersion statistic an outlier gate uses where stddev is skewed
    by the tail (the anomaly_zscore plan's robust sibling). Two-level
    exact median: per-group median, broadcast back into the scan, then
    the median of absolute deviations. Both engines interpolate even-
    count medians identically (exact percentile, not a sketch); one
    hash exchange per level on the 5-value priority key."""
    orders = t(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.median("o_totalprice").alias("m")
    )
    joined = orders.join(F.broadcast(med), "o_orderpriority")
    return joined.groupBy("o_orderpriority").agg(
        F.round(F.first("m"), 4).alias("med_price"),
        F.round(
            F.median(F.abs(F.col("o_totalprice") - F.col("m"))), 4
        ).alias("mad_price"),
    )
