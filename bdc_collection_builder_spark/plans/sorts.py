"""Sort / limit / top-k queries (SURVEY §2.6, T1-T5).

The value hash is order-insensitive, so every sort query materializes
its order as a rank column (or uses a unique-keyed LIMIT) to make the
ordering verifiable.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import duck_ts, t
from bdc_collection_builder_spark.plans.registry import query

_TS = duck_ts()


@query(
    "t02_ordered_catalog",
    survey=("T2",),
    oracle="""
        SELECT r_regionkey, r_name,
               row_number() OVER (ORDER BY r_regionkey) AS position
        FROM region
    """,
)
def t02_ordered_catalog(spark, sf_dir):
    """T2 — ORDER BY id catalog listings (controller.py:625-628)."""
    region = t(spark, sf_dir, "region")
    w = Window.orderBy("r_regionkey")
    return region.select(
        "r_regionkey", "r_name", F.row_number().over(w).alias("position"))


@query(
    "t04_first_element",
    survey=("T4",),
    oracle=f"""
        SELECT user_id, min({_TS}) AS first_ts
        FROM events GROUP BY user_id
    """,
)
def t04_first_element(spark, sf_dir):
    """T4 — first-element top-1 per key (forms.py:117, tasks.py:329)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_ts"))
    )


@query(
    "t05_top_k",
    survey=("T5", "T1"),
    oracle="""
        SELECT o_orderkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 10
    """,
)
def t05_top_k(spark, sf_dir):
    """T5 — top-k with a deterministic tiebreaker. Spark runs this as a
    per-partition top-k + single-reduce (TakeOrderedAndProject), never a
    global sort — the 100 TB-safe form of LIMIT."""
    return (
        t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


_ANSI_SHARED_SQL = """
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                AS BIGINT) AS price_cents,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(min(l_orderkey) AS BIGINT) AS first_order,
           CAST(max(l_orderkey) AS BIGINT) AS last_order
    FROM lineitem
    WHERE l_quantity > 5
      AND l_shipdate >= TIMESTAMP '1996-01-01'
    GROUP BY l_returnflag, l_linestatus
"""


@query(
    "sql01_shared_ansi_text",
    survey=("A1", "X-scalar"),
    oracle=_ANSI_SHARED_SQL,
)
def sql01_shared_ansi_text(spark, sf_dir):
    """SQL front-end parity: ONE shared ANSI SQL string — the module
    constant above — is executed verbatim by BOTH engines: Spark SQL
    here (`spark.sql` over a temp view), DuckDB as the oracle (the
    oracle IS the same constant, not a translation). Every other
    query in the registry pairs a DataFrame plan with a DuckDB
    dialect oracle; this one pins the dialect-portable subset the two
    SQL parsers agree on byte-for-byte — aggregate casts, round(),
    TIMESTAMP date literals, grouped scans — so a user porting ANSI
    warehouse SQL onto this engine knows the text runs unchanged.
    The reference exposes exactly this surface through SQLAlchemy
    textual queries (controller.py raw-SQL paths).

    The temp view is (re)registered from the CURRENT sf_dir on every
    call — createOrReplaceTempView is idempotent and session-scoped,
    so a stale registration from a previous scale factor cannot leak
    into this run.

    100 TB: Catalyst compiles the text to the identical plan the
    DataFrame API would build (one partial-agg shuffle, filters
    pushed to the scan); the SQL surface adds zero execution cost."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_ANSI_SHARED_SQL)
