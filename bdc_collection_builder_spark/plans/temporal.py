"""Temporal join queries: as-of attribution and point-in-interval
range join over the events table (operators the reference lacks —
SURVEY §2.3 notes no as-of/range joins exist there; these are the
engine-feature additions a time-series pipeline needs, with exact
DuckDB oracles: ASOF JOIN and an inequality join respectively).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import duck_ts, t
from bdc_collection_builder_spark.plans.registry import query

_TS = duck_ts()


@query(
    "tj_asof_purchase_attribution",
    survey=("TJ-asof",),
    oracle=f"""
        WITH p AS (
            SELECT user_id, event_id, {_TS} AS ts FROM events
            WHERE event_type = 'purchase'
        ),
        c AS (
            SELECT user_id, {_TS} AS ts, value FROM events
            WHERE event_type = 'click'
        )
        SELECT p.user_id, p.event_id, p.ts,
               c.ts AS click_ts, c.value AS click_value
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def tj_asof_purchase_attribution(spark, sf_dir):
    """As-of join: each purchase attributed to the user's most recent
    click at-or-before it (backward as-of, left semantics). Single
    union + one ranking-window pass — no range cross-product."""
    from bdc_collection_builder_spark.operators.temporal import asof_join

    events = t(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts")
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value"))
    return asof_join(
        purchases, clicks, on=["user_id"],
        right_values=["click_value"], matched_ts_col="click_ts",
    ).select("user_id", "event_id", "ts", "click_ts", "click_value")


@query(
    "tj_range_error_followups",
    survey=("TJ-range",),
    oracle=f"""
        WITH e AS (
            SELECT user_id, event_id, {_TS} AS ts FROM events
            WHERE event_type = 'error'
        ),
        a AS (
            SELECT user_id, {_TS} AS ts FROM events
        )
        SELECT e.event_id, count(*) AS n_followups
        FROM e JOIN a
          ON a.user_id = e.user_id
         AND a.ts >= e.ts
         AND a.ts <= e.ts + INTERVAL 10 MINUTE
        GROUP BY e.event_id
    """,
)
def tj_range_error_followups(spark, sf_dir):
    """Range join: per error event, how many same-user events land in
    the 10 minutes at-or-after it. Intervals bucketize (10-min buckets,
    so each explodes to ≤2 rows); points map to one bucket; the match
    is an equi-join on (user_id, bucket) + exact re-filter — never an
    inequality-only BroadcastNestedLoop."""
    from bdc_collection_builder_spark.operators.temporal import range_join

    events = t(spark, sf_dir, "events")
    window_us = 600 * 1_000_000
    # cast() tolerates both TIMESTAMP and TIMESTAMP_NTZ source columns;
    # only relative differences feed the join so the tz anchor is moot.
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    points = events.select("user_id", ts_us.alias("at_us"))
    intervals = events.filter(F.col("event_type") == "error").select(
        "user_id", "event_id",
        ts_us.alias("start_us"),
        (ts_us + window_us).alias("end_us"))
    return (
        range_join(points, intervals, "at_us", "start_us", "end_us",
                   bucket_width=window_us, keys=["user_id"])
        .groupBy("event_id")
        .agg(F.count("*").alias("n_followups"))
    )
