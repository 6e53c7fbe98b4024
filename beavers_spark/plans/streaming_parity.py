"""Stream-shaped operators checked in batch form (replay parity).

The reference's promise is "same DAG in live and replay" (README.md:32-39);
these plans are the batch twins of stream operators, so the driver's oracle
can verify the event-time semantics relationally.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from beavers_spark.operators import asof_join
from beavers_spark.plans.common import t
from beavers_spark.plans.registry import query


@query(
    "asof_join_events",
    oracle="""
    WITH quotes AS (
        SELECT user_id, ts, arg_max(value, event_id) AS qvalue
        FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    trades AS (SELECT * FROM events WHERE event_type = 'purchase')
    SELECT t.event_id, t.user_id, epoch_us(t.ts) AS ts_us,
           round(q.qvalue, 6) AS last_view_value
    FROM trades t ASOF LEFT JOIN quotes q
      ON t.user_id = q.user_id AND q.ts <= t.ts
    """,
)
def asof_join_events(spark, sf_dir):
    """Point-in-time join: each purchase picks up the latest prior view's
    value per user (quote/trade shape). Quotes are deduped to one row per
    (key, ts) first so ties are deterministic. Union+window merge-asof —
    one shuffle on the key, no range explosion (operators/asof.py)."""
    ev = t(spark, sf_dir, "events")
    quotes = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("qvalue"))
    )
    trades = ev.filter(F.col("event_type") == "purchase")
    joined = asof_join(
        trades, quotes, on=["user_id"], left_ts="ts", right_ts="ts",
        direction="backward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.round("qvalue_right", 6).alias("last_view_value"),
    )


@query(
    "sessionize",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL THEN 0
                    WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 3600000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           epoch_us(min(ts)) AS session_start_us,
           epoch_us(max(ts)) AS session_end_us
    FROM sessions GROUP BY user_id, session_id
    """,
)
def sessionize(spark, sf_dir):
    """Gap-based sessionization (1h inactivity): the batch twin of
    Structured Streaming's ``session_window``. lag -> gap flag -> running
    sum = session id -> per-session agg; one shuffle on user_id reused by
    both window passes and the final agg."""
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = 3_600_000_000
    flagged = ev.withColumn(
        "new_session",
        F.when(F.lag("ts").over(w).isNull(), 0)
        .when(
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us, 1
        )
        .otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_id", F.sum("new_session").over(run).cast("bigint")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_micros(F.min("ts")).alias("session_start_us"),
        F.unix_micros(F.max("ts")).alias("session_end_us"),
    )


@query(
    "interval_join_events",
    oracle="""
    SELECT l.event_id AS err_id, r.event_id AS next_id,
           epoch_us(r.ts) AS next_ts_us
    FROM events l
    JOIN events r
      ON l.user_id = r.user_id
     AND l.event_type = 'error'
     AND r.ts > l.ts
     AND r.ts <= l.ts + INTERVAL 5 MINUTE
    """,
)
def interval_join_events(spark, sf_dir):
    """Range join: every event within 5 minutes AFTER an error by the
    same user (error-impact analysis). Time-binned equi-join — candidate
    volume O(rows per 5-min bucket), never the O(n^2) a bare inequality
    join would plan (operators/interval.py)."""
    import pandas as pd

    from beavers_spark.operators import interval_join
    from beavers_spark.plans.common import ts_us

    ev = t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id"), F.col("user_id"), F.col("ts")
    )
    return interval_join(
        errors,
        ev.select("event_id", "user_id", "ts"),
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        lower=pd.Timedelta(0),
        upper=pd.Timedelta(minutes=5),
    ).select(
        F.col("event_id").alias("err_id"),
        F.col("r_event_id").alias("next_id"),
        ts_us("r_ts").alias("next_ts_us"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH steps AS (
        SELECT user_id,
               min(ts) FILTER (WHERE event_type = 'view') AS t_view,
               min(ts) FILTER (WHERE event_type = 'click') AS t_click,
               min(ts) FILTER (WHERE event_type = 'purchase') AS t_purchase
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(t_view) AS viewed,
           count(CASE WHEN t_click > t_view THEN 1 END) AS clicked_after_view,
           count(CASE WHEN t_purchase > t_click AND t_click > t_view
                      THEN 1 END) AS purchased_after_click
    FROM steps
    """,
)
def funnel_conversion(spark, sf_dir):
    """Event-sequence funnel (view -> click -> purchase, order-enforced):
    per-user first-occurrence times via conditional min — ONE shuffle on
    user_id, then a single global agg. The classic product-analytics /
    conversion query; no joins, no window functions, so it scales as a
    plain two-level aggregation."""
    ev = t(spark, sf_dir, "events")

    def first_ts(etype):
        return F.min(F.when(F.col("event_type") == etype, F.col("ts")))

    steps = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return steps.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("viewed"),
        F.count(
            F.when(F.col("t_click") > F.col("t_view"), 1)
        ).alias("clicked_after_view"),
        F.count(
            F.when(
                (F.col("t_purchase") > F.col("t_click"))
                & (F.col("t_click") > F.col("t_view")),
                1,
            )
        ).alias("purchased_after_click"),
    )


@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id, f.cohort,
               datediff('week', f.cohort, date_trunc('week', e.ts)) AS week_n
        FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT epoch_us(cohort) AS cohort_us, week_n,
           count(*) AS active_users
    FROM activity
    GROUP BY cohort, week_n
    """,
)
def cohort_retention(spark, sf_dir):
    """Weekly cohort retention: users grouped by first-seen week, counted
    in each subsequent week they were active. Two shuffles on user_id
    (first-seen agg + the broadcast-joined activity dedup), then a small
    rollup — the standard retention-curve input."""
    from beavers_spark.plans.common import ts_us

    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = (
        ev.join(F.broadcast(firsts), "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.floor(
                    F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort"))
                    / 7
                ).cast("bigint")
            ).alias("week_n"),
        )
        .distinct()
    )
    return activity.groupBy("cohort", "week_n").agg(
        F.count(F.lit(1)).alias("active_users")
    ).select(ts_us("cohort").alias("cohort_us"), "week_n", "active_users")
