"""Window/ranking queries (SURVEY §2.5, W1-W3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import t
from bdc_collection_builder_spark.plans.registry import query


@query(
    "w01_latest_execution",
    survey=("W1",),
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_id, event_type, ts,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT user_id, event_id, event_type, ts
        FROM ranked WHERE rn = 1
    """,
)
def w01_latest_execution(spark, sf_dir):
    """W1 — latest execution per activity (models.py:55, forms.py:113-117)
    via the generic latest-per-group operator."""
    from bdc_collection_builder_spark.operators.windows import latest_per_group

    events = t(spark, sf_dir, "events")
    return latest_per_group(events, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "event_type", "ts")


@query(
    "w02_latest_failed",
    survey=("W2", "J5"),
    oracle="""
        WITH ranked AS (
            SELECT user_id, event_type,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY ts DESC, event_id DESC
                   ) AS rn
            FROM events
        )
        SELECT count(*) AS n_failed_latest
        FROM ranked WHERE rn = 1 AND event_type = 'error'
    """,
)
def w02_latest_failed(spark, sf_dir):
    """W2 — scenes whose latest attempt failed (controller.py:479-495):
    ranking window + filter + count, no join-back."""
    from bdc_collection_builder_spark.operators.windows import latest_per_group

    events = t(spark, sf_dir, "events")
    latest = latest_per_group(events, ["user_id"], ["ts", "event_id"])
    return latest.filter(F.col("event_type") == "error").agg(
        F.count("*").alias("n_failed_latest"))


@query(
    "w03_pagination",
    survey=("W3", "T5"),
    oracle="""
        WITH ranked AS (
            SELECT o_orderkey, o_custkey, o_totalprice,
                   row_number() OVER (ORDER BY o_orderkey) AS row_index
            FROM orders
        )
        SELECT o_orderkey, o_custkey, o_totalprice, row_index
        FROM ranked WHERE row_index > 20 AND row_index <= 30
    """,
)
def w03_pagination(spark, sf_dir):
    """W3 — page 3 @ 10/page (views.py:37-49)."""
    from bdc_collection_builder_spark.operators.windows import paginate

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice")
    return paginate(orders, ["o_orderkey"], page=3, per_page=10)
