"""Data-layout queries: Z-order curve keys and compaction planning.

Engine features beyond the reference (whose layout is one-file-per-band
on a shared FS, publish.py:419-464, with PostGIS carrying the spatial
index): at 100 TB on object storage the engine owns file layout, and
both the space-filling-curve key and the bin-packing plan are pure
relational arithmetic — oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.operators.layout import (
    plan_compaction,
    zorder_oracle_sql,
    zorder_value,
)
from bdc_collection_builder_spark.plans._util import t
from bdc_collection_builder_spark.plans.registry import query

_Z_BITS = 8


@query(
    "lo_zorder_curve",
    survey=("F2", "J8"),
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey,
                   c_custkey % 256 AS zx,
                   (c_custkey * 7) % 256 AS zy
            FROM customer
        )
        SELECT c_custkey, zx, zy,
               {zorder_oracle_sql(["zx", "zy"], bits=_Z_BITS)} AS zval
        FROM pts
    """,
)
def lo_zorder_curve(spark, sf_dir):
    """Z-order (Morton) key over a 2-D grid — the clustering key behind
    spatially-pruned item layouts (the scale form of F2/J8's bbox
    pruning: files sorted by zval carry tight parquet min/max stats, so
    a bbox predicate prunes to a handful of files). Pure shift/and
    arithmetic in whole-stage codegen; the oracle re-computes the same
    closed form."""
    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        (F.col("c_custkey") % 256).alias("zx"),
        ((F.col("c_custkey") * 7) % 256).alias("zy"),
    )
    return pts.select(
        "c_custkey", "zx", "zy",
        zorder_value(["zx", "zy"], bits=_Z_BITS).alias("zval"),
    )


@query(
    "lo_compaction_plan",
    survey=("S16",),
    oracle="""
        WITH manifest AS (
            SELECT o_orderpriority AS part,
                   'part-' || lpad(CAST(o_orderkey AS VARCHAR), 12, '0')
                       AS path,
                   (o_orderkey % 997 + 1) * 131072 AS bytes
            FROM orders
        ),
        cum AS (
            SELECT part, path, bytes,
                   sum(bytes) OVER (
                       PARTITION BY part ORDER BY path
                       ROWS UNBOUNDED PRECEDING
                   ) AS running
            FROM manifest
        )
        SELECT part, path, bytes,
               CAST(floor((running - bytes) / 134217728.0) AS BIGINT) AS bin
        FROM cum
    """,
)
def lo_compaction_plan(spark, sf_dir):
    """Small-file compaction plan — bin-pack a file manifest into
    ~128 MB output groups per table partition (the streaming-ingest
    small-files fix, the sync-layout analog of S16). One window
    cumulative sum over the manifest; the data files are never read."""
    orders = t(spark, sf_dir, "orders")
    manifest = orders.select(
        F.col("o_orderpriority").alias("part"),
        F.concat(F.lit("part-"),
                 F.lpad(F.col("o_orderkey").cast("string"), 12, "0"))
        .alias("path"),
        ((F.col("o_orderkey") % 997 + 1) * 131072).alias("bytes"),
    )
    return plan_compaction(manifest, target_bytes=128 * 1024 * 1024,
                           partition_cols=["part"])
