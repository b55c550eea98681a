"""Set-operation queries (SURVEY §2.7, U1-U3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import t
from bdc_collection_builder_spark.plans.registry import query


@query(
    "u01_union_scene_sets",
    survey=("U1",),
    oracle="""
        SELECT o_custkey AS scene_key FROM orders
        WHERE o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        UNION
        SELECT o_custkey FROM orders
        WHERE o_orderstatus = 'P'
    """,
)
def u01_union_scene_sets(spark, sf_dir):
    """U1 — union of provider scene sets across periods + cache hits
    (controller.py:595, 602)."""
    orders = t(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderdate") < "1996-01-01").select(
        F.col("o_custkey").alias("scene_key"))
    b = orders.filter(F.col("o_orderstatus") == "P").select(
        F.col("o_custkey").alias("scene_key"))
    return a.union(b).distinct()


@query(
    "u02_missing_scenes_difference",
    survey=("U2",),
    oracle="""
        SELECT c_custkey AS scene_key FROM customer
        EXCEPT
        SELECT o_custkey FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def u02_missing_scenes_difference(spark, sf_dir):
    """U2 — external − internal missing-scene difference
    (controller.py:606-618)."""
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("scene_key"))
    have = (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= "1995-01-01")
                & (F.col("o_orderdate") < "1996-01-01"))
        .select(F.col("o_custkey").alias("scene_key"))
    )
    return cust.subtract(have)  # EXCEPT (distinct) semantics


@query(
    "u03_sorted_union_array",
    survey=("U3", "A6"),
    oracle="""
        SELECT n_nationkey,
               array_to_string(
                   list_sort(list_distinct(
                       [n_nationkey % 5, n_regionkey, n_regionkey + 2, 7]
                   )), ','
               ) AS merged_positions
        FROM nation
    """,
)
def u03_sorted_union_array(spark, sf_dir):
    """U3 — numpy.union1d semantics (utils.py:369): sorted distinct
    union of index arrays, serialized for engine-neutral hashing."""
    nation = t(spark, sf_dir, "nation")
    arr_a = F.array(F.col("n_nationkey") % 5, F.col("n_regionkey"))
    arr_b = F.array(F.col("n_regionkey") + 2, F.lit(7))
    return nation.select(
        "n_nationkey",
        F.concat_ws(",", F.array_sort(F.array_union(arr_a, arr_b)))
         .alias("merged_positions"),
    )


@query(
    "u04_intersect_scene_sets",
    survey=("U1", "U2"),
    oracle="""
        SELECT o_custkey AS scene_key FROM orders WHERE o_orderstatus = 'O'
        INTERSECT
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u04_intersect_scene_sets(spark, sf_dir):
    """INTERSECT — absent from the reference (SURVEY §2.7) but free on
    Spark; scenes present in both the external and internal sets."""
    orders = t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("scene_key"))
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("scene_key"))
    return o.intersect(f)


@query(
    "u05_except_all_bag",
    survey=("U2",),
    oracle="""
        SELECT o_custkey AS scene_key FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u05_except_all_bag(spark, sf_dir):
    """EXCEPT ALL — bag semantics (multiplicity-aware difference): each
    candidate occurrence is cancelled by at most one published
    occurrence, the retry-accounting shape a DISTINCT difference
    cannot express. Spark's native exceptAll plans this as one
    aggregate over a tagged union (count diff per key, regenerate) —
    one shuffle, no join."""
    orders = t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("scene_key"))
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("scene_key"))
    return o.exceptAll(f)


@query(
    "u06_symmetric_difference",
    survey=("U1", "U2"),
    oracle="""
        WITH o AS (SELECT DISTINCT o_custkey AS scene_key FROM orders
                   WHERE o_orderstatus = 'O'),
             f AS (SELECT DISTINCT o_custkey AS scene_key FROM orders
                   WHERE o_orderstatus = 'F')
        SELECT scene_key, 'open_only' AS side
        FROM (SELECT scene_key FROM o EXCEPT SELECT scene_key FROM f)
        UNION ALL
        SELECT scene_key, 'final_only'
        FROM (SELECT scene_key FROM f EXCEPT SELECT scene_key FROM o)
    """,
)
def u06_symmetric_difference(spark, sf_dir):
    """Symmetric difference with provenance — keys on exactly one side
    of a reconciliation, tagged with WHICH side (the 'only in catalog'
    vs 'only on remote' report S16's sync diff prints). Two
    distinct-EXCEPTs over the same two scans; at scale both EXCEPTs
    and both DISTINCTs hash on the same key, so AQE plans one
    partitioning reused four ways."""
    orders = t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("scene_key")).distinct()
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("scene_key")).distinct()
    return (
        o.exceptAll(f).withColumn("side", F.lit("open_only"))
        .unionByName(f.exceptAll(o).withColumn("side", F.lit("final_only")))
    )


@query(
    "u07_intersect_all_bag",
    survey=("U1", "U2"),
    oracle="""
        SELECT sceneid FROM (
            SELECT concat('S', CAST(o_orderkey % 500 AS VARCHAR)) AS sceneid
            FROM orders WHERE o_orderkey % 2 = 0
        )
        INTERSECT ALL
        SELECT sceneid FROM (
            SELECT concat('S', CAST(o_orderkey % 500 AS VARCHAR)) AS sceneid
            FROM orders WHERE o_orderkey % 3 = 0
        )
    """,
)
def u07_intersect_all_bag(spark, sf_dir):
    """INTERSECT ALL — bag intersection with multiplicity
    min(count_l, count_r), completing the bag-algebra trio next to
    u05's EXCEPT ALL: the overlap-with-duplicates question
    reconciliation runs when BOTH sides legitimately repeat (multiple
    attempts of the same scene on each side). Spark plans this as one
    partial-count aggregate per side + a join on the key — the same
    single-shuffle-per-side cost as the DISTINCT variant."""
    orders = t(spark, sf_dir, "orders")
    mk = F.concat(F.lit("S"), (F.col("o_orderkey") % 500).cast("string"))
    left = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        mk.alias("sceneid"))
    right = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        mk.alias("sceneid"))
    return left.intersectAll(right)
