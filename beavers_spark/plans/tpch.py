"""TPC-H-shaped headline queries adapted to the testdata schema.

These are the bench workhorses: classic scan->join->agg shapes whose plans
we tune (broadcast the dimensions, one shuffle per agg, filters pushed to
the parquet scan). The reference has no SQL surface (SURVEY §2.7) — these
demonstrate the Spark-native capability ceiling on the same data.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from beavers_spark.plans.common import t, ts_us
from beavers_spark.plans.registry import query


@query(
    "tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4) AS sum_qty,
           round(sum(l_extendedprice), 4) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)
               AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1(spark, sf_dir):
    """Pricing summary report. Single scan (shipdate filter pushed down),
    one hash shuffle with map-side partial aggregation."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "tpch_q3",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           epoch_us(o_orderdate) AS orderdate_us
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate
    """,
)
def tpch_q3(spark, sf_dir):
    """Shipping-priority: two joins where the filtered customer side is
    broadcast; only lineitem shuffles (on l_orderkey) for the agg."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            ts_us("o_orderdate").alias("orderdate_us"),
        )
    )


@query(
    "tpch_q5",
    oracle="""
    SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
)
def tpch_q5(spark, sf_dir):
    """Local-supplier volume: star join where every dimension is broadcast;
    the fact table never shuffles until the final small agg."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (F.col("l_suppkey") == supp.s_suppkey)
            & (F.col("c_nationkey") == supp.s_nationkey),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), F.col("n_regionkey") == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q6",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """Forecasting revenue change: pure scan+filter+global agg — every
    predicate reaches the parquet reader (PushedFilters)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def tpch_q4(spark, sf_dir):
    """Order-priority checking (q4 adapted: no l_commitdate in this
    schema, so 'late' = any lineitem shipped >90 days after order date).
    EXISTS(l_shipdate > X) is rewritten to max(l_shipdate) > X: the fact
    is reduced to one (orderkey, max_sd) row per order BEFORE any join —
    map-side partial max means the shuffle carries groups, not lines
    (~30% faster than the left-semi formulation, and the win grows with
    lines-per-order at scale). The join against the date-filtered orders
    is left unhinted so AQE broadcasts it here but may shuffle at 100 TB."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    max_sd = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_sd"))
    )
    return (
        max_sd.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(
            F.col("max_sd") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@query(
    "tpch_q10",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """Returned-item reporting: top 20 customers by returned revenue.
    Dimensions broadcast; the sort+limit compiles to
    TakeOrderedAndProject (no full sort); the custkey tiebreak makes the
    limit deterministic."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle="""
    SELECT round(
        100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14(spark, sf_dir):
    """Promotion effect (q14 adapted: p_type equality, this schema's
    types are single words). One broadcast join + a global conditional
    agg; the shipdate range prunes the lineitem scan."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue")
        )
    )


@query(
    "tpch_q22",
    oracle="""
    WITH avg_bal AS (
        SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0
    )
    SELECT c_nationkey,
           count(*) AS numcust,
           round(sum(c_acctbal), 4) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '1999-01-01'
      )
    GROUP BY c_nationkey
    """,
)
def tpch_q22(spark, sf_dir):
    """Global-sales-opportunity (q22 adapted: grouped by nationkey):
    customers with above-average balance and no RECENT orders. The
    scalar average is a 1-row broadcast cross join (not a collect); the
    NOT EXISTS compiles to a LEFT ANTI join against the date-filtered
    o_custkey column of orders (filter pushed to the scan)."""
    cust = t(spark, sf_dir, "customer")
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 4).alias("totacctbal"),
        )
    )


@query(
    "tpch_q2",
    oracle="""
    WITH f AS (
        SELECT * FROM part WHERE p_size < 10 AND p_type = 'PROMO'
    ),
    min_price AS (
        -- min over the FILTERED domain, matching the Spark plan (an
        -- unfiltered min could undercut every filtered row for a key
        -- whose global-cheapest row fails the predicate)
        SELECT p_partkey AS mk, min(p_retailprice) AS mp
        FROM f GROUP BY p_partkey
    )
    SELECT p_partkey, p_name, p_brand, p_retailprice
    FROM f JOIN min_price ON p_partkey = mk AND p_retailprice = mp
    """,
)
def tpch_q2(spark, sf_dir):
    """Groupwise-min selection (q2's correlated `= (SELECT min(...))`
    shape, adapted to this schema: cheapest row per part among small
    PROMO parts). Decorrelated the way Catalyst likes it: a grouped-min
    aggregate self-joined back — two scans of the filtered dim, no
    correlated subquery execution per row."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_size") < 10) & (F.col("p_type") == "PROMO")
    )
    # NB: filter BEFORE the min so both engines agree on the group domain
    min_price = part.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("p_retailprice").alias("mp")
    )
    return part.join(
        F.broadcast(min_price),
        (part.p_partkey == F.col("mk")) & (part.p_retailprice == F.col("mp")),
    ).select("p_partkey", "p_name", "p_brand", "p_retailprice")


@query(
    "tpch_q7",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           round(sum(volume), 4) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7(spark, sf_dir):
    """Volume shipping between two nations by year. Scale plan: both
    nation filters reduce supplier/customer to ~1/25 each, so they
    broadcast into the facts; the only big shuffle is lineitem join orders
    on orderkey (both sides pre-reduced by their broadcast dim)."""
    nation = t(spark, sf_dir, "nation")
    pair = ["NATION_1", "NATION_2"]
    supp_n = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin(pair))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust_n = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin(pair))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders_f = t(spark, sf_dir, "orders").join(
        F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey")
    )
    return (
        li.join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


@query(
    "tpch_q8",
    oracle="""
    SELECT o_year,
           round(sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)
                 / sum(volume), 4) AS mkt_share
    FROM (
        SELECT year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount) AS volume,
               n2.n_name AS nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8(spark, sf_dir):
    """National market share within a region. The p_type filter (1/6 of
    part) broadcasts into lineitem; region->nation->customer broadcasts
    into the date-filtered orders; supplier+nation broadcast for the
    numerator tag. One orderkey shuffle joins the two reduced facts."""
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    cust_asia = (
        t(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_n = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders_f = (
        t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(cust_asia), F.col("o_custkey") == F.col("c_custkey"))
    )
    li = t(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_3", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@query(
    "tpch_q9",
    oracle="""
    SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
    FROM (
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.1 * p_retailprice * l_quantity AS amount
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9(spark, sf_dir):
    """Product-type profit (q9 adapted: this schema has no partsupp, so
    supply cost := 10% of p_retailprice per unit). The p_name LIKE filter
    broadcasts into lineitem; the unfiltered orders join is the one real
    shuffle (orderkey), kept narrow by projecting orders to two columns."""
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp_n = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = t(spark, sf_dir, "lineitem")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 4).alias("sum_profit"))
    )


@query(
    "tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag
    """,
)
def tpch_q12(spark, sf_dir):
    """Shipping-mode priority (q12 adapted: no l_shipmode column, grouped
    by l_returnflag). Fact-fact join on orderkey — the shipdate range
    prunes lineitem at the scan, and orders is projected to two columns
    before the exchange so the shuffle payload stays minimal."""
    orders = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def tpch_q13(spark, sf_dir):
    """Customer order-count distribution (q13 adapted: the NOT LIKE
    comment filter becomes a priority filter). Left outer join preserves
    zero-order customers; count(o_orderkey) ignores the nulls they
    produce. Two shuffles are inherent (custkey, then c_count) — the
    second one is tiny (distinct counts only)."""
    cust = t(spark, sf_dir, "customer").select("c_custkey")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "5-LOW"
    ).select("o_custkey", "o_orderkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


@query(
    "tpch_q15",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               round(sum(l_extendedprice * (1 - l_discount)), 4)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15(spark, sf_dir):
    """Top supplier (q15): quarterly revenue per supplier, keep the max.
    The revenue view is computed ONCE and cached across its two uses
    (argmax scan + scalar max); the scalar max is a 1-row broadcast cross
    join, never a collect. Rounded before the equality so both engines
    compare identical doubles."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("total_revenue")
        )
        # lazy checkpoint: materializes ONCE at first action and serves
        # both downstream branches; a persist()+count() here ran a full
        # lineitem job at plan-CONSTRUCTION time and leaked cache for
        # the session (every other registered plan is lazy)
        .localCheckpoint(eager=False)
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("supplier_no") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "tpch_q17",
    oracle="""
    SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
        SELECT l_partkey AS ap, 0.2 * avg(l_quantity) AS aq
        FROM lineitem GROUP BY l_partkey
    ) pa ON ap = p_partkey
    WHERE p_brand = 'Brand#1' AND l_quantity < aq
    """,
)
def tpch_q17(spark, sf_dir):
    """Small-quantity-order revenue (q17): lineitems below 20% of their
    part's average quantity. The correlated avg decorrelates to a grouped
    aggregate; computing it AFTER semi-reducing lineitem to the brand's
    parts (broadcast) keeps the partkey shuffle at 1/25 of the fact."""
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = t(spark, sf_dir, "lineitem").join(
        F.broadcast(part.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("ap")).agg(
        (0.2 * F.avg("l_quantity")).alias("aq")
    )
    return (
        li.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("aq"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@query(
    "tpch_q18",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           epoch_us(o_orderdate) AS orderdate_us,
           round(o_totalprice, 4) AS totalprice,
           round(sum(l_quantity), 4) AS sum_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    """,
)
def tpch_q18(spark, sf_dir):
    """Large-volume customers (q18): orders whose total quantity exceeds
    250 (~top 1%). The HAVING subquery and the outer sum are the SAME
    aggregate — computed once on the orderkey shuffle, filtered, then the
    now-tiny result broadcasts into orders and customer instead of
    re-scanning lineitem."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 4).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            ts_us("o_orderdate").alias("orderdate_us"),
            F.round(F.col("o_totalprice"), 4).alias("totalprice"),
            "sum_qty",
        )
    )


@query(
    "tpch_q19",
    oracle="""
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 20
           AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40
           AND l_quantity BETWEEN 20 AND 50)
    """,
)
def tpch_q19(spark, sf_dir):
    """Discounted revenue under a disjunction of brand/size/quantity
    conjuncts (q19). Catalyst does NOT derive the common p_brand IN (...)
    / range bounds implied by an OR-of-ANDs, so we state the implied
    single-table filters explicitly — they reach both parquet scans as
    PushedFilters and the exact OR evaluates as a residual after the
    broadcast join. (The canonical q19 rewrite.)"""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 50))
    part = t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3")
        & F.col("p_size").between(1, 40)
    )
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#1") & s.between(1, 10) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(5, 20) & q.between(10, 30))
        | ((b == "Brand#3") & s.between(10, 40) & q.between(20, 50))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)
def tpch_q21(spark, sf_dir):
    """Suppliers who kept orders waiting (q21 adapted: no receipt/commit
    dates — 'late' = shipped >60 days after order date). The EXISTS /
    NOT EXISTS pair decorrelates into per-order window aggregates over a
    SINGLE scan of lineitem: a late line qualifies iff its order has >1
    distinct supplier (EXISTS) and exactly one distinct LATE supplier —
    which, since the line itself is late, must be this one (NOT EXISTS).
    The window partitions on the same l_orderkey the orders join shuffled
    by, so the whole correlated pair costs one Exchange; the naive
    semi+anti formulation scans lineitem three times and fact-fact joins
    it twice, which cannot survive a 100 TB fact."""
    orders_f = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    w = Window.partitionBy("l_orderkey")
    flagged = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("late", late)
        .withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
    )
    waiting = flagged.filter(
        F.col("late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    return (
        waiting.join(
            F.broadcast(t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


@query(
    "tpch_q11",
    oracle="""
    WITH supplied AS (
        SELECT l_partkey,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
        GROUP BY l_partkey
    )
    SELECT l_partkey, value
    FROM supplied
    WHERE value > (SELECT 0.001 * sum(value) FROM supplied)
    """,
)
def tpch_q11(spark, sf_dir):
    """Important-stock identification (q11 adapted: no partsupp table, so
    'supplied value' := revenue shipped by the nation's suppliers, from
    lineitem). The per-part aggregate is computed ONCE and cached across
    its two uses (group scan + global total); the total is a 1-row
    broadcast cross join. Per-part values are rounded identically on both
    engines BEFORE the total/threshold so the > comparison is stable."""
    supp = (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    supplied = (
        t(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("value")
        )
        # lazy checkpoint — see tpch_q15's note
        .localCheckpoint(eager=False)
    )
    total = supplied.agg((0.001 * F.sum("value")).alias("threshold"))
    return (
        supplied.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


@query(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def tpch_q16(spark, sf_dir):
    """Parts/supplier relationship (q16 adapted: the part-supplier pairs
    come from lineitem instead of partsupp, and the 'customer complaints'
    exclusion becomes negative-balance suppliers). The excluded-supplier
    set broadcasts as a LEFT ANTI join; count(DISTINCT) shuffles once on
    the (brand,type,size) group keys after a partial distinct."""
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45)
    )
    bad_supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad_supp), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "tpch_q20",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_2'
      AND s_suppkey IN (
          SELECT l_suppkey FROM (
              SELECT l_suppkey,
                     sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                              AND l_shipdate < TIMESTAMP '1998-01-01'
                              THEN l_quantity ELSE 0 END) AS q97,
                     sum(l_quantity) AS qtot
              FROM lineitem
              WHERE l_partkey IN (
                  SELECT p_partkey FROM part WHERE p_name LIKE '%widget%'
              )
              GROUP BY l_suppkey
          ) activity
          WHERE q97 > 0.16 * qtot
      )
    ORDER BY s_name
    """,
)
def tpch_q20(spark, sf_dir):
    """Potential part promotion (q20 adapted: no partsupp availqty, so
    'excess stock' := suppliers whose 1997 widget shipments exceeded 16%
    of their all-time widget quantity — shipdates span ~7 years, so a
    uniform year is ~14%). The nested IN chain decorrelates to: broadcast
    semi-join lineitem to widget parts, one suppkey-grouped conditional
    aggregate, then the tiny qualifying-supplier set broadcast semi-joins
    into the nation-filtered supplier dim. Quantities are exact integers,
    so the 30% comparison is engine-stable without rounding."""
    widget_parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    active = (
        t(spark, sf_dir, "lineitem")
        .join(
            F.broadcast(widget_parts),
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                F.when(
                    (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
                    & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp")),
                    F.col("l_quantity"),
                ).otherwise(0.0)
            ).alias("q97"),
            F.sum("l_quantity").alias("qtot"),
        )
        .filter(F.col("q97") > 0.16 * F.col("qtot"))
        .select("l_suppkey")
    )
    return (
        t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(active), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
        )
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
