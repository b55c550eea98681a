"""Aggregation queries (SURVEY §2.4, A1-A8) + the TPC-H-style flagship.

Floating-point aggregates are rounded identically on both sides so the
order-insensitive value hash is stable across engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import duck_ts, t
from bdc_collection_builder_spark.functions.persist import tracked_persist
from bdc_collection_builder_spark.plans.registry import query

_TS = duck_ts()


@query(
    "a01_status_histogram",
    survey=("A1",),
    oracle="""
        SELECT o_orderstatus AS status, count(*) AS n
        FROM orders GROUP BY o_orderstatus
    """,
)
def a01_status_histogram(spark, sf_dir):
    """A1 — COUNT(*) GROUP BY status (controller.py:426-445). Partial
    (map-side) aggregation is built in — the shuffle carries one row per
    status per partition, not the fact table."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(F.count("*").alias("n"))
    )


@query(
    "a02_daily_status_histogram",
    survey=("A2", "T3", "X7"),
    oracle="""
        SELECT strftime(o_orderdate, '%Y-%m-%d') AS day,
               o_orderstatus AS status, count(*) AS n
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    """,
)
def a02_daily_status_histogram(spark, sf_dir):
    """A2 — COUNT(*) GROUP BY day, status (controller.py:447-468)."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1997-01-01")
        .groupBy(
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(F.count("*").alias("n"))
    )


@query(
    "a03_latest_attempt_per_scene",
    survey=("A3",),
    oracle=f"""
        SELECT user_id, max({_TS}) AS last_ts, count(*) AS n_events
        FROM events GROUP BY user_id
    """,
)
def a03_latest_attempt_per_scene(spark, sf_dir):
    """A3 — MAX(start) GROUP BY sceneid (controller.py:481-486)."""
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max("ts").alias("last_ts"), F.count("*").alias("n_events"))
    )


@query(
    "a04_distinct_collections",
    survey=("A4",),
    oracle="SELECT DISTINCT c_mktsegment AS collection FROM customer",
)
def a04_distinct_collections(spark, sf_dir):
    """A4 — DISTINCT collection_id having activities
    (controller.py:470-474)."""
    return (
        t(spark, sf_dir, "customer")
        .select(F.col("c_mktsegment").alias("collection"))
        .distinct()
    )


@query(
    "a05_missing_per_collection",
    survey=("A5", "U2"),
    oracle="""
        SELECT n_name AS collection, count(*) AS total_missing
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
        )
        GROUP BY n_name
    """,
)
def a05_missing_per_collection(spark, sf_dir):
    """A5 — per-collection missing-scene totals (controller.py:604-618):
    anti-join then count per dimension."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    nation = t(spark, sf_dir, "nation")
    missing = cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left_anti")
    return (
        missing.join(F.broadcast(nation), missing["c_nationkey"] == nation["n_nationkey"])
        .groupBy(F.col("n_name").alias("collection"))
        .agg(F.count("*").alias("total_missing"))
    )


@query(
    "a07_result_count",
    survey=("A7",),
    oracle="SELECT count(*) AS results FROM lineitem WHERE l_discount > 0.05",
)
def a07_result_count(spark, sf_dir):
    """A7 — result-set cardinality (views.py:74-77)."""
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.05)
        .agg(F.count("*").alias("results"))
    )


@query(
    "a08_band_min_max",
    survey=("A8",),
    oracle="""
        SELECT l_returnflag AS band,
               round(min(l_quantity), 2) AS min_value,
               round(max(l_quantity), 2) AS max_value
        FROM lineitem GROUP BY l_returnflag
    """,
)
def a08_band_min_max(spark, sf_dir):
    """A8 — per-band min/max reduce (publish.py:85)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("band"))
        .agg(
            F.round(F.min("l_quantity"), 2).alias("min_value"),
            F.round(F.max("l_quantity"), 2).alias("max_value"),
        )
    )


@query(
    "q1_pricing_summary",
    survey=("A1", "A8", "T3"),
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 4) AS avg_qty,
               round(avg(l_extendedprice), 4) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship aggregate (TPC-H Q1 shape): multi-measure hash aggregate
    with map-side partial aggregation — the canonical 100 TB-safe
    reduction (shuffle carries #groups × #partitions rows only)."""
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= "1998-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "a09_rollup_hierarchy",
    survey=("A1", "A2"),
    oracle="""
        SELECT coalesce(o_orderstatus, 'ALL') AS status,
               coalesce(o_orderpriority, 'ALL') AS priority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def a09_rollup_hierarchy(spark, sf_dir):
    """Hierarchical subtotals via ROLLUP — free on Spark (one pass,
    partial-aggregated); the reference would need N queries. SURVEY
    §2.4 notes these come free once a SQL surface exists."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n", "total",
        )
    )


@query(
    "a10_cube_cross_totals",
    survey=("A1", "A5"),
    oracle="""
        SELECT coalesce(CAST(l_returnflag AS VARCHAR), 'ALL') AS rflag,
               coalesce(CAST(l_linestatus AS VARCHAR), 'ALL') AS lstatus,
               count(*) AS n
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def a10_cube_cross_totals(spark, sf_dir):
    """All-dimension cross totals via CUBE — again free on Spark."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n",
        )
    )


@query(
    "a11_approx_distinct",
    survey=("A4", "A5"),
)
def a11_approx_distinct(spark, sf_dir):
    """HyperLogLog++ distinct counts — the 100 TB form of A4/A5's
    exact-distinct reconciliation (sketches merge map-side; no
    key-shuffle). Rows-only: HLL estimates are engine-specific; the
    companion check asserts the estimate lands within the documented
    5% of exact (which the oracle-checked a04 computes exactly). For a
    FULLY value-checked approximate-distinct estimator see
    sk_kmv_distinct (plans/sketches.py) — KMV's estimate is a pure
    function of the hashes, so its oracle is exact."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
             F.count("*").alias("n_events"))
        .orderBy("event_type")
    )


@query(
    "a12_group_percentiles",
    survey=("A8",),
    oracle="""
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.5) AS p50,
               quantile_cont(l_extendedprice, 0.9) AS p90,
               quantile_disc(l_extendedprice, 0.5) AS p50_disc
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def a12_group_percentiles(spark, sf_dir):
    """Exact per-group percentiles (continuous + discrete) — the
    distribution-summary form of A8's min/max reduce. Spark's
    `percentile` matches DuckDB's `quantile_cont` bit-for-bit (both
    linear-interpolate on the sorted group); the 100 TB path swaps in
    `approx_percentile` (t-digest sketch, map-side mergeable, no
    full-group sort) — same plan shape, bounded memory."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem")
    # ONE sort feeds every quantile: rank rows per group, pick the 5
    # boundary ranks, interpolate. The groupBy reuses the window's hash
    # partitioning (no second Exchange), and nothing buffers whole
    # groups — vs percentile/percentile_disc aggregates, which each
    # collect and sort every group's values in their own agg buffer.
    # Interpolation is the two-sided weighted form
    # lower*(ceil(h)-h) + higher*(h-floor(h)) at h = (n-1)*q — the exact
    # expression percentile/quantile_cont evaluate, so results stay
    # bit-identical (lower + (higher-lower)*frac differs by ULPs).
    # NULL measures are excluded up front — percentile/quantile_cont
    # ignore NULLs, and a NULL would otherwise take rank 1 under NULLS
    # FIRST and inflate n, shifting every boundary rank. (A group whose
    # measures are ALL NULL drops out rather than emitting NULL
    # percentiles — acceptable here; left-join distinct keys back if
    # that edge ever matters.)
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    ranked = (
        li.select("l_returnflag", "l_extendedprice")
        .filter(F.col("l_extendedprice").isNotNull())
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(
            Window.partitionBy("l_returnflag")))
    )

    def rank_val(rank_expr):
        return F.min(F.when(F.col("rn") == rank_expr,
                            F.col("l_extendedprice")))

    def cont_ranks(q):
        h = (F.col("n") - 1) * q
        return F.floor(h) + 1, F.least(F.floor(h) + 2, F.col("n"))

    lo50, hi50 = cont_ranks(0.5)
    lo90, hi90 = cont_ranks(0.9)
    disc50 = F.greatest(F.ceil(F.col("n") * 0.5), F.lit(1).cast("bigint"))
    agg = ranked.groupBy("l_returnflag").agg(
        F.max("n").alias("n"),
        rank_val(lo50).alias("lo50"), rank_val(hi50).alias("hi50"),
        rank_val(lo90).alias("lo90"), rank_val(hi90).alias("hi90"),
        rank_val(disc50).alias("p50_disc"),
    )

    def interp(lo, hi, q):
        h = (F.col("n") - 1) * q
        frac = h - F.floor(h)
        return F.when(frac == 0, F.col(lo)).otherwise(
            F.col(lo) * (F.ceil(h) - h) + F.col(hi) * frac)

    return agg.select(
        "l_returnflag",
        interp("lo50", "hi50", 0.5).alias("p50"),
        interp("lo90", "hi90", 0.9).alias("p90"),
        "p50_disc",
    )


@query(
    "a13_grouping_sets",
    survey=("A1", "A2"),
    oracle="""
        SELECT coalesce(l_returnflag, 'ALL') AS rflag,
               coalesce(l_linestatus, 'ALL') AS lstatus,
               count(*) AS n,
               round(sum(l_extendedprice), 2) AS revenue
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def a13_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — two independent histograms in ONE scan
    + ONE shuffle (the reference issues A1-style counts per dimension
    as separate queries; grouping sets Expand computes them together,
    halving passes over a 100 TB fact table)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("l_extendedprice"), 2).alias("revenue"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("lstatus"),
            "n", "revenue",
        )
    )


@query(
    "a14_pivot_status_matrix",
    survey=("A2",),
    oracle=f"""
        SELECT strftime({_TS}, '%Y-%m-%d') AS day,
               CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
               CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
               CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
        FROM events
        GROUP BY strftime({_TS}, '%Y-%m-%d')
    """,
)
def a14_pivot_status_matrix(spark, sf_dir):
    """Pivoted day × event-type count matrix — the wide form of A2's
    daily histogram (the dashboard shape the reference renders client-
    side). Pivot values are declared explicitly, so this stays ONE
    scan + ONE shuffle with no value-discovery pre-pass, and the output
    schema is deterministic."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "error"])
    )


@query(
    "a15_approx_percentiles",
    survey=("A8",),
)
def a15_approx_percentiles(spark, sf_dir):
    """The 100 TB percentile path a12's docstring points at:
    approx_percentile's sketch is map-side mergeable with bounded
    memory — no per-group sort, no full-value buffers, same plan shape
    at any scale. Rows-only (sketch estimates are engine-specific); the
    companion test bounds the error against a12's exact values via the
    accuracy parameter (10000 → rank error ≤ n/10000)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9), 10000)")
            .alias("ps"))
        .select(
            "l_returnflag",
            F.col("ps")[0].alias("p50_approx"),
            F.col("ps")[1].alias("p90_approx"),
        )
    )


@query(
    "a17_stats_suite",
    survey=("A8",),
    oracle="""
        SELECT l_returnflag,
               round(stddev_samp(l_extendedprice), 2) AS price_stddev,
               round(var_samp(l_quantity), 4) AS qty_var,
               round(corr(l_extendedprice, l_quantity), 6) AS price_qty_corr,
               round(regr_slope(l_extendedprice, l_quantity), 4)
                 AS price_per_qty
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def a17_stats_suite(spark, sf_dir):
    """Statistical aggregate suite — sample stddev/variance,
    correlation, and regression slope per group, all single-pass
    map-side-combinable moments (each is sums of x, x², xy, n merged
    associatively), so ONE shuffle carries five statistics at any
    scale. The monitoring surface for drift checks the reference
    delegates to external dashboards."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2)
            .alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6)
            .alias("price_qty_corr"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4)
            .alias("price_per_qty"),
        )
    )


@query(
    "a18_hll_rollup",
    survey=("A4", "A5", "Y1"),
    # Rows-only: DataSketches HLL binaries are engine-specific (DuckDB
    # has no compatible sketch type). The companion pytest pins the
    # two properties that matter: union-of-daily-sketches returns the
    # IDENTICAL estimate as a single full-pass sketch (mergeability),
    # and the estimate lands within the documented error of the exact
    # distinct count that oracle-checked a04/a11 compute.
)
def a18_hll_rollup(spark, sf_dir):
    """Mergeable-sketch rollup — the pattern that makes 100 TB distinct
    counting incremental: per-day HLL sketches are built once (a
    partial-agg over each day's partition), persisted dimension-sized,
    and any coarser period (week/month/all-time) is answered by
    hll_union_agg over the tiny sketch table — ZERO rescans of the
    event log, register-max merge is associative and commutative so
    late-arriving days just union in. The streaming twin drops the
    same sketches per trigger. approx_count_distinct (a11) gives one
    fused number; this keeps the REUSABLE intermediate."""
    events = t(spark, sf_dir, "events")
    daily = (
        events.select(F.to_date("ts").alias("day"), "event_type", "user_id")
        .groupBy("day", "event_type")
        .agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    )
    return (
        daily.groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_days"),
             F.hll_sketch_estimate(F.hll_union_agg("sk"))
             .cast("bigint").alias("approx_users"))
    )


@query(
    "a18b_distinct_rollup_exact",
    survey=("A4", "A5", "Y1"),
    # The value-checked twin of a18_hll_rollup (which is rows-only
    # because DataSketches HLL register layouts are engine-specific):
    # same rollup-over-reusable-intermediate shape, exact arithmetic.
    # The pairing lets the driver verify the rollup semantics while
    # the companion pytest pins a18's estimate against this exact
    # count. Keep both adjacent in COVERAGE.md.
    oracle=f"""
        WITH daily AS (
            SELECT DISTINCT CAST({_TS} AS DATE) AS day,
                   event_type, user_id
            FROM events
        )
        SELECT event_type,
               CAST(count(DISTINCT day) AS BIGINT) AS n_days,
               CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
        FROM daily GROUP BY event_type
    """,
)
def a18b_distinct_rollup_exact(spark, sf_dir):
    """Exact twin of the a18 sketch rollup: the reusable intermediate
    is the deduped (day, event_type, user_id) table — one shuffle on
    the triple — and the rollup answers per-type day counts and exact
    distinct users from it. At 100 TB the intermediate is what you
    persist (it is bounded by distinct daily users, not events); the
    HLL variant (a18) swaps it for constant-size sketches when even
    that is too large. Same A4/A5 semantics as reference
    controller.py:426-468 distinct rollups."""
    events = t(spark, sf_dir, "events")
    daily = (
        events.select(F.to_date("ts").alias("day"), "event_type",
                      "user_id")
        .distinct()
    )
    return (
        daily.groupBy("event_type")
        .agg(F.countDistinct("day").cast("bigint").alias("n_days"),
             F.countDistinct("user_id").cast("bigint")
             .alias("exact_users"))
    )


@query(
    "a19_price_histogram",
    survey=("A8", "A1"),
    oracle="""
        WITH bounds AS (
            SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
            FROM orders
        ),
        binned AS (
            SELECT CASE WHEN hi = lo THEN 0
                        ELSE least(CAST(floor((o_totalprice - lo) * 20.0
                                              / (hi - lo)) AS INTEGER), 19)
                   END AS bin,
                   lo, hi
            FROM orders, bounds
        )
        SELECT bin,
               round(min(lo) + bin * (min(hi) - min(lo)) / 20.0, 4)
                 AS bin_lo,
               CAST(count(*) AS BIGINT) AS n
        FROM binned GROUP BY bin
    """,
)
def a19_price_histogram(spark, sf_dir):
    """Equi-width histogram (20 bins over observed min/max) — the
    distribution profile behind every data-quality dashboard and CBO
    statistics collection. Two passes by necessity (bounds, then
    binning) but both are scan+partial-agg: the bounds collapse to a
    one-row broadcast, bin assignment is pure projection arithmetic,
    and the final count shuffles 20 keys. The single-pass variant at
    scale is a fixed-domain bin (known sensor ranges) or t-digest
    (a15) when bounds are unknown."""
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(F.min("o_totalprice").alias("lo"),
                        F.max("o_totalprice").alias("hi"))
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(F.floor((F.col("o_totalprice") - F.col("lo")) * 20.0
                            / (F.col("hi") - F.col("lo"))).cast("int"),
                    F.lit(19))).alias("bin"),
        "lo", "hi")
    return (
        binned.groupBy("bin")
        .agg(F.round(F.min("lo") + F.col("bin")
                     * (F.min("hi") - F.min("lo")) / 20.0, 4)
             .alias("bin_lo"),
             F.count("*").cast("bigint").alias("n"))
    )


@query(
    "a20_unpivot_measures",
    survey=("A2", "A8"),
    oracle="""
        WITH wide AS (
            SELECT l_returnflag,
                   CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
                   CAST(sum(l_extendedprice) AS DOUBLE) AS sum_price,
                   CAST(count(*) AS DOUBLE) AS n_rows
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, measure, round(val, 2) AS val FROM (
            SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val
            FROM wide
            UNION ALL
            SELECT l_returnflag, 'sum_price', sum_price FROM wide
            UNION ALL
            SELECT l_returnflag, 'n_rows', n_rows FROM wide
        )
    """,
)
def a20_unpivot_measures(spark, sf_dir):
    """Unpivot/melt — a14's inverse reshape: a wide per-group measure
    row becomes (group, measure, value) tall form, the shape metric
    stores and dataset cards ingest. Spark's native ``unpivot``
    (Expand node) emits all measure rows in the SAME pass as the
    aggregate — no self-union, no re-scan per measure, exactly one
    shuffle (the group-by); the DuckDB mirror spells it as the
    equivalent UNION ALL over a shared CTE."""
    li = t(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").cast("double").alias("sum_qty"),
        F.sum("l_extendedprice").cast("double").alias("sum_price"),
        F.count("*").cast("double").alias("n_rows"),
    )
    return (
        wide.unpivot(
            ids=["l_returnflag"],
            values=["sum_qty", "sum_price", "n_rows"],
            variableColumnName="measure",
            valueColumnName="val",
        )
        .select("l_returnflag", "measure", F.round("val", 2).alias("val"))
    )


@query(
    "a21_hourly_seasonality",
    survey=("A2",),
    oracle=f"""
        WITH norm AS (SELECT {duck_ts()} AS ts, value FROM events)
        SELECT CAST(date_part('dow', ts) AS INTEGER) AS dow,
               CAST(date_part('hour', ts) AS INTEGER) AS hour,
               CAST(count(*) AS BIGINT) AS n_events,
               round(avg(value), 4) AS mean_value
        FROM norm GROUP BY 1, 2
    """,
)
def a21_hourly_seasonality(spark, sf_dir):
    """Day-of-week × hour-of-day activity heatmap — the seasonality
    profile behind capacity planning and anomaly baselines (an
    observed count far from its (dow, hour) cell's norm is the alert
    condition). One scan, one map-side-combined aggregate over a
    fixed 7×24 key space; Spark's dayofweek is 1-based Sunday so it
    shifts to DuckDB/ISO's 0-based Sunday convention explicitly."""
    events = t(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "value")
    return (
        events.groupBy(
            (F.dayofweek("ts") - 1).cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"))
        .agg(F.count("*").alias("n_events"),
             F.round(F.avg("value"), 4).alias("mean_value"))
    )


@query(
    "a22_group_mode",
    survey=("A1", "A8", "W3"),
    oracle="""
        SELECT o_orderstatus AS status, o_orderpriority AS modal_priority,
               n
        FROM (
            SELECT o_orderstatus, o_orderpriority,
                   CAST(count(*) AS BIGINT) AS n,
                   row_number() OVER (
                       PARTITION BY o_orderstatus
                       ORDER BY count(*) DESC, o_orderpriority
                   ) AS rnk
            FROM orders
            GROUP BY o_orderstatus, o_orderpriority
        ) WHERE rnk = 1
    """,
)
def a22_group_mode(spark, sf_dir):
    """Exact per-group MODE with a deterministic tie-break — the
    categorical aggregate SQL engineshistorically lack (Spark 3.4+
    ships `mode()` but with UNSPECIFIED tie behavior, so this plan
    derives it from first principles): count per (group, value), rank
    within group by (count DESC, value ASC), keep rank 1. Ties
    therefore resolve to the lexicographically smallest value on BOTH
    engines — reproducible, unlike the built-in.

    100 TB: the value-count aggregate combines map-side down to
    |groups|x|values| rows; the ranking window runs on that reduced
    table, never the fact."""
    from pyspark.sql import Window

    counts = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("status"),
                 F.col("o_orderpriority").alias("modal_priority"))
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    w = Window.partitionBy("status").orderBy(
        F.desc("n"), F.asc("modal_priority"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select("status", "modal_priority", "n")
    )


@query(
    "a23_copurchase_support",
    survey=("A2", "J1", "DD-pairs"),
    oracle="""
        WITH items AS (
            SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pairs AS (
            SELECT a.l_partkey AS p1, b.l_partkey AS p2
            FROM items a
            JOIN items b ON b.l_orderkey = a.l_orderkey
                        AND a.l_partkey < b.l_partkey
        )
        SELECT p1, p2, CAST(count(*) AS BIGINT) AS support
        FROM pairs
        GROUP BY p1, p2
        HAVING count(*) >= 2
    """,
)
def a23_copurchase_support(spark, sf_dir):
    """Frequent-pair mining (the support-counting core of Apriori /
    market-basket analysis, Agrawal & Srikant 1994, public): part
    pairs bought together in at least 2 orders. (Minsup 2 is the
    scale-stable choice here: the pair space grows quadratically with
    the part dimension while pair instances grow linearly, so a
    higher absolute minsup empties out as SF grows — at minsup 2 the
    expected collision count is birthday-bounded and stays O(1000) at
    every SF of this generator.) The reference's
    analog is the band-combination report (which asset pairs co-occur
    in published scenes, publish.py band loops). Items are deduped
    per order FIRST (a part can appear on several lineitems of one
    order; support counts orders, not lineitems). Pure integer
    output.

    100 TB: the self-join is keyed on l_orderkey — ONE shuffle
    co-locates each order's items, and the pair fan-out is bounded
    by (items-per-order choose 2), a per-group constant (~21 for
    TPC-H's ~7-item orders), not a cross product; the support count
    shuffles once more on the pair key with map-side combine. The
    HAVING prunes the long tail before any downstream use."""
    items = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey").distinct()
    )
    # items feeds both sides of the pair self-join, and Catalyst does
    # NOT reuse the exchange across the differing aliases — persist so
    # the fact scan + distinct shuffle run once (the dd_prefix round-9
    # lesson)
    items = tracked_persist(items)
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("p1"))
    b = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("p2"))
    return (
        a.join(b, "l_orderkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").cast("bigint").alias("support"))
        .filter(F.col("support") >= 2)
    )


@query(
    "a24_pivot_status_matrix",
    survey=("A1", "A2"),
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'F')
                    AS BIGINT) AS n_f,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'O')
                    AS BIGINT) AS n_o,
               CAST(count(*) FILTER (WHERE o_orderstatus = 'P')
                    AS BIGINT) AS n_p,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                    FILTER (WHERE o_orderstatus = 'F')
                    AS BIGINT) AS f_cents
        FROM orders
        GROUP BY o_orderpriority
    """,
)
def a24_pivot_status_matrix(spark, sf_dir):
    """PIVOT — the status x priority cross-matrix as COLUMNS (the
    operations dashboard's wide layout; the reference renders this
    matrix from its per-status counts, controller.py:426-445). Spark's
    relational PIVOT with an EXPLICIT value list compiles to one
    hash aggregate with conditional measures — no second pass to
    discover the pivot domain, no shuffle beyond the one groupBy.
    n_total is deliberately count(*) on the oracle side but the SUM
    of the three pivoted columns on the Spark side: equality proves
    the pivot domain assumption ('F','O','P' exhausts the status
    column) instead of silently dropping an unexpected status. Money
    is cents-quantized int64 before the sum (house exactness style).

    100 TB: one map-side-combined hash aggregate over the fact scan;
    the pivoted width is |priorities| x |statuses| cells, a constant."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("bigint")
        .alias("cents"))
    pv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("cents").alias("cents"))
    )
    z = F.lit(0).cast("bigint")
    n_f = F.coalesce(F.col("F_n"), z)
    n_o = F.coalesce(F.col("O_n"), z)
    n_p = F.coalesce(F.col("P_n"), z)
    return pv.select(
        "o_orderpriority",
        n_f.alias("n_f"), n_o.alias("n_o"), n_p.alias("n_p"),
        (n_f + n_o + n_p).alias("n_total"),
        F.col("F_cents").cast("bigint").alias("f_cents"))
