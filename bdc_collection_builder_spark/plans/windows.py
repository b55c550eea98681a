"""Window/ranking queries (SURVEY §2.5, W1-W3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import duck_ts, t
from bdc_collection_builder_spark.functions.persist import tracked_persist
from bdc_collection_builder_spark.plans.registry import query

_TS = duck_ts()


@query(
    "w01_latest_execution",
    survey=("W1",),
    oracle=f"""
        WITH ranked AS (
            SELECT user_id, event_id, event_type, {_TS} AS ts,
                   row_number() OVER (
                       PARTITION BY user_id
                       ORDER BY {_TS} DESC, event_id DESC
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


@query(
    "w04_lag_lead_gap",
    survey=("W1", "W2"),
    oracle=f"""
        SELECT user_id, event_id,
               date_diff('microsecond',
                         lag({_TS}) OVER w, {_TS}) AS gap_us,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY {_TS}, event_id)
    """,
)
def w04_lag_lead_gap(spark, sf_dir):
    """Analytic lag/lead over the event stream — inter-event gap and
    next-event lookahead per user (the frame-spec surface SURVEY §2.5
    notes the reference lacks; one hash shuffle on user_id, one sort,
    both offsets computed in the same window pass)."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    return events.select(
        "user_id", "event_id",
        (ts_us - F.lag(ts_us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@query(
    "w05_time_range_rolling",
    survey=("W1", "Y2"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, event_id, {_TS} AS ts, value FROM events
        )
        SELECT user_id, event_id,
               CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
               round(sum(value) OVER w, 2) AS value_last_hour
        FROM norm
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
        )
    """,
)
def w05_time_range_rolling(spark, sf_dir):
    """Time-RANGE window frame: per user, rolling one-hour event count
    and value sum at every event — the retry-rate / throughput gauge
    shape (views.py:131-134 adjacent) that a ROWS frame cannot express
    when events are unevenly spaced. Spark's rangeBetween needs a
    numeric ordering key, so ts becomes epoch microseconds; the frame
    is then [-3.6e9 us, 0]. Same one-shuffle-per-user-partition plan
    as any window at any scale."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (Window.partitionBy("user_id").orderBy(ts_us.cast("long"))
         .rangeBetween(-3_600_000_000, 0))
    return events.select(
        "user_id", "event_id",
        F.count("*").over(w).cast("bigint").alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_last_hour"),
    )


@query(
    "w06_ntile_buckets",
    survey=("W3", "CU-sample"),
    oracle="""
        SELECT doc_id, lang,
               CAST(ntile(8) OVER (
                   PARTITION BY lang
                   ORDER BY length(text), doc_id) AS INTEGER) AS len_bucket
        FROM documents
    """,
)
def w06_ntile_buckets(spark, sf_dir):
    """Equi-depth bucketing via ntile, PER LANGUAGE — the
    curriculum/length-bucket assignment step of batch-assembly (docs
    of similar length batch together to minimize padding), partitioned
    so no global order exists anywhere in the plan: each language
    stratum sorts independently (the same reason cu_stratified_sample
    keys on lang). Deterministic ORDER BY (length, id) tie-break; both
    engines share ntile's exact remainder-to-early-buckets
    definition."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.length("text"), "doc_id")
    return docs.select(
        "doc_id", "lang",
        F.ntile(8).over(w).cast("int").alias("len_bucket"))


@query(
    "w07_locf_gap_fill",
    survey=("W1", "Y2"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, event_id, {_TS} AS ts,
                   CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END
                     AS value
            FROM events
        )
        SELECT user_id, event_id,
               round(coalesce(
                   last_value(value IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   -1.0), 2) AS value_filled
        FROM norm
    """,
)
def w07_locf_gap_fill(spark, sf_dir):
    """Last-observation-carried-forward gap filling: sensor dropouts
    (planted NULLs on every 7th event) forward-fill from the user's
    most recent non-null reading — `last_value(... IGNORE NULLS)` over
    a running ROWS frame, the standard time-series repair pass. One
    user-partitioned window shuffle; leading NULLs fall back to a
    sentinel so both engines agree on the no-history case."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    val = F.when(F.col("event_id") % 7 == 0, None).otherwise(F.col("value"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return events.select(
        "user_id", "event_id",
        F.round(F.coalesce(
            F.last(val, ignorenulls=True).over(w), F.lit(-1.0)), 2)
        .alias("value_filled"))


@query(
    "w08_rank_distributions",
    survey=("W3", "A8"),
    oracle="""
        SELECT doc_id, source,
               round(percent_rank() OVER w, 6) AS len_pct_rank,
               round(cume_dist() OVER w, 6) AS len_cume_dist
        FROM documents
        WINDOW w AS (PARTITION BY source ORDER BY n_chars)
    """,
)
def w08_rank_distributions(spark, sf_dir):
    """Distribution-rank analytics per source: percent_rank and
    cume_dist of document length in one window pass — the CDF position
    signal quality-threshold sweeps read ('drop the bottom 5% per
    source'). Both functions share one partition+sort; tie semantics
    (all peers share a rank) are identical across engines, so no
    tie-break column is needed."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars")
    return docs.select(
        "doc_id", "source",
        F.round(F.percent_rank().over(w), 6).alias("len_pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("len_cume_dist"))


@query(
    "w09_cumulative_new_users",
    survey=("W3", "A2", "Y1"),
    oracle=f"""
        WITH first_seen AS (
            SELECT user_id, min(CAST({_TS} AS DATE)) AS first_day
            FROM events GROUP BY user_id
        ),
        daily_new AS (
            SELECT first_day AS day, count(*) AS new_users
            FROM first_seen GROUP BY first_day
        )
        SELECT CAST(day AS VARCHAR) AS day,
               CAST(new_users AS BIGINT) AS new_users,
               CAST(sum(new_users) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cumulative_users
        FROM daily_new
    """,
)
def w09_cumulative_new_users(spark, sf_dir):
    """Running distinct-user count per day (the adoption/retention
    curve): a naive per-day COUNT(DISTINCT user ≤ day) rescans the log
    once per day — O(days × corpus). The scalable identity: a user
    contributes exactly on their FIRST day, so one partial-agg per
    user (min day), one tiny per-day count, and a cumulative window
    over the DAY-cardinality table (hundreds of rows however big the
    log — the partition-less window is safe precisely because its
    input is dimension-sized)."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    first_seen = (events.select("user_id", F.to_date("ts").alias("day"))
                  .groupBy("user_id").agg(F.min("day").alias("first_day")))
    daily_new = (first_seen.groupBy(F.col("first_day").alias("day"))
                 .agg(F.count("*").alias("new_users")))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily_new.select(
        F.col("day").cast("string").alias("day"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.sum("new_users").over(w).cast("bigint")
        .alias("cumulative_users"))


@query(
    "w10_cohort_retention",
    survey=("W3", "A2", "J1"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, CAST({_TS} AS DATE) AS day FROM events
        ),
        cohorts AS (
            SELECT user_id,
                   min(CAST(date_trunc('week', day) AS DATE)) AS cohort_week
            FROM norm GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', day) AS DATE) AS active_week
            FROM norm
        )
        SELECT CAST(c.cohort_week AS VARCHAR) AS cohort_week,
               CAST(date_diff('week', c.cohort_week, a.active_week)
                    AS BIGINT) AS week_offset,
               CAST(count(*) AS BIGINT) AS n_active
        FROM cohorts c JOIN activity a USING (user_id)
        GROUP BY c.cohort_week,
                 date_diff('week', c.cohort_week, a.active_week)
    """,
)
def w10_cohort_retention(spark, sf_dir):
    """Weekly cohort retention — the product-analytics matrix (users
    grouped by first-seen week; how many are still active N weeks
    later). Three bounded aggregations: first-seen per user (partial
    agg), distinct (user, week) activity (partial agg), then a join on
    user_id feeding a (cohort, offset)-keyed count — output is
    weeks² rows however large the event log. The user_id join is the
    only big⋈big edge; both sides are already user-keyed aggregates,
    so AQE coalesces and at scale the two aggregations reuse one
    user-hash partitioning."""
    events = t(spark, sf_dir, "events")
    norm = events.select(
        "user_id",
        F.date_trunc("week", F.col("ts").cast("timestamp"))
        .cast("date").alias("week"))
    cohorts = norm.groupBy("user_id").agg(
        F.min("week").alias("cohort_week"))
    activity = norm.distinct().withColumnRenamed("week", "active_week")
    offset = (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7) \
        .cast("bigint")
    return (
        activity.join(cohorts, "user_id")
        .groupBy(F.col("cohort_week").cast("string").alias("cohort_week"),
                 offset.alias("week_offset"))
        .agg(F.count("*").cast("bigint").alias("n_active"))
    )


@query(
    "w11_funnel_stages",
    survey=("W1", "A1", "J1"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, event_type, {_TS} AS ts FROM events
        ),
        v AS (
            SELECT user_id, min(ts) AS t1 FROM norm
            WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT n.user_id, min(n.ts) AS t2
            FROM norm n JOIN v USING (user_id)
            WHERE n.event_type = 'click' AND n.ts >= v.t1
            GROUP BY n.user_id
        ),
        p AS (
            SELECT n.user_id, min(n.ts) AS t3
            FROM norm n JOIN c USING (user_id)
            WHERE n.event_type = 'purchase' AND n.ts >= c.t2
            GROUP BY n.user_id
        )
        SELECT stage, n_users FROM (
            SELECT 1 AS ord, 'view' AS stage,
                   CAST((SELECT count(*) FROM v) AS BIGINT) AS n_users
            UNION ALL
            SELECT 2, 'click', CAST((SELECT count(*) FROM c) AS BIGINT)
            UNION ALL
            SELECT 3, 'purchase', CAST((SELECT count(*) FROM p) AS BIGINT)
        ) ORDER BY ord
    """,
)
def w11_funnel_stages(spark, sf_dir):
    """Ordered conversion funnel (view → click → purchase, each step
    strictly at-or-after the previous step's FIRST occurrence) — the
    sequence-constrained count SQL engines express with three
    chained min-aggregates. Every aggregate and join is keyed on
    user_id, so at scale the whole funnel reuses ONE user-hash
    partitioning (no re-shuffle between stages); stage outputs are
    user-dimension-sized, and the final counts are three scalar
    aggregates unioned into the report shape."""
    events = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    v = (events.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    c = (events.filter(F.col("event_type") == "click").join(v, "user_id")
         .filter(F.col("ts") >= F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t2")))
    p = (events.filter(F.col("event_type") == "purchase").join(c, "user_id")
         .filter(F.col("ts") >= F.col("t2"))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))

    def stage(df, ord_, name):
        return df.agg(F.lit(ord_).alias("ord"), F.lit(name).alias("stage"),
                      F.count("*").cast("bigint").alias("n_users"))

    return (stage(v, 1, "view")
            .unionByName(stage(c, 2, "click"))
            .unionByName(stage(p, 3, "purchase"))
            .orderBy("ord").select("stage", "n_users"))


@query(
    "w12_conversion_latency",
    survey=("W1", "A8", "TJ-asof"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, event_type, {_TS} AS ts FROM events
        ),
        v AS (
            SELECT user_id, min(ts) AS t1 FROM norm
            WHERE event_type = 'view' GROUP BY user_id
        ),
        p AS (
            SELECT n.user_id, min(n.ts) AS t3
            FROM norm n JOIN v USING (user_id)
            WHERE n.event_type = 'purchase' AND n.ts >= v.t1
            GROUP BY n.user_id
        ),
        lat AS (
            SELECT p.user_id,
                   date_diff('second', v.t1, p.t3) AS latency_s
            FROM p JOIN v USING (user_id)
        )
        SELECT CAST(count(*) AS BIGINT) AS n_converted,
               round(quantile_cont(CAST(latency_s AS DOUBLE), 0.5), 2)
                 AS p50_s,
               round(quantile_cont(CAST(latency_s AS DOUBLE), 0.9), 2)
                 AS p90_s,
               CAST(max(latency_s) AS BIGINT) AS max_s
        FROM lat
    """,
)
def w12_conversion_latency(spark, sf_dir):
    """Conversion-latency distribution — seconds from a user's first
    view to their first subsequent purchase, summarized as exact
    p50/p90/max (the time-to-convert report next to w11's stage
    counts). Two user-keyed min-aggregates + one user join produce a
    user-dimension-sized latency table; the exact percentiles then
    run over THAT (bounded) table, never the event log — so the
    expensive sort is always dimension-scale. a15's t-digest is the
    drop-in when even the user dimension is too wide."""
    events = t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts"))
    v = (events.filter(F.col("event_type") == "view")
         .groupBy("user_id").agg(F.min("ts").alias("t1")))
    p = (events.filter(F.col("event_type") == "purchase").join(v, "user_id")
         .filter(F.col("ts") >= F.col("t1"))
         .groupBy("user_id").agg(F.min("ts").alias("t3")))
    lat = p.join(v, "user_id").select(
        (F.unix_timestamp("t3") - F.unix_timestamp("t1"))
        .alias("latency_s"))
    return lat.agg(
        F.count("*").cast("bigint").alias("n_converted"),
        F.round(F.expr("percentile(CAST(latency_s AS DOUBLE), 0.5)"), 2)
        .alias("p50_s"),
        F.round(F.expr("percentile(CAST(latency_s AS DOUBLE), 0.9)"), 2)
        .alias("p90_s"),
        F.max("latency_s").cast("bigint").alias("max_s"),
    )


@query(
    "w13_ewma_smoothing",
    survey=("W-ewma", "Y1"),
    oracle=f"""
        WITH norm AS (
            SELECT event_type, {_TS} AS ts, value FROM events
        ),
        daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   avg(value) AS mean_v
            FROM norm GROUP BY 1, 2
        ),
        framed AS (
            SELECT event_type, day,
                   array_agg(mean_v) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
            FROM daily
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
               round(CAST(list_reduce(xs, (acc, x) ->
                     CAST(0.3 AS DOUBLE) * x + CAST(0.7 AS DOUBLE) * acc)
                   AS DOUBLE), 6) AS ewma
        FROM framed
    """,
)
def w13_ewma_smoothing(spark, sf_dir):
    """Bounded-lookback EWMA (α=0.3 over the trailing 20 days) of the
    daily mean metric per event type — the loss-curve / drift-monitor
    smoother of a training pipeline. The recursive EWMA is not a
    windowed aggregate SQL engines ship, but restricted to a bounded
    frame it IS expressible exactly: collect the frame into an array
    (20 doubles max, regardless of corpus size) and left-fold
    s' = αx + (1-α)s. Cost at 100 TB: the daily pre-aggregate is the
    only corpus-scale shuffle; the window then runs over the (days ×
    types) dimension, and the per-row fold is O(20) arithmetic inside
    codegen — no UDF, no self-join fan-out of the naive Σ α(1-α)^k
    formulation."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("mean_v"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-19, 0)
    framed = daily.withColumn("xs", F.collect_list("mean_v").over(w))
    ewma = F.aggregate(
        F.slice(F.col("xs"), F.lit(2), F.size("xs") - 1),
        F.element_at("xs", 1).cast("double"),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return framed.select(
        "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(ewma, 6).alias("ewma"))


@query(
    "w14_rolling_median",
    survey=("W-ewma", "A8"),
    oracle=f"""
        WITH norm AS (
            SELECT event_type, {_TS} AS ts, value FROM events
        ),
        daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   avg(value) AS mean_v
            FROM norm GROUP BY 1, 2
        ),
        framed AS (
            SELECT event_type, day,
                   array_agg(mean_v) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
            FROM daily
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
               round(list_sort(xs)[CAST((len(xs) + 1) // 2 AS INTEGER)], 6)
                   AS rolling_median
        FROM framed
    """,
)
def w14_rolling_median(spark, sf_dir):
    """Trailing-20-day rolling median of the daily metric — the
    outlier-robust twin of w13's EWMA (a single bad day cannot move
    it). Same bounded-frame trick: collect the ≤20-element frame,
    sort it in codegen, pick the lower median BY SELECTION (no
    interpolation, so no float-arithmetic divergence between engines).
    SQL has no windowed exact median at scale; restricted to a bounded
    frame it's O(20 log 20) per row over the (days × types) dimension,
    with the daily pre-aggregate as the only corpus-scale shuffle."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"), "value")
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("mean_v"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-19, 0)
    framed = daily.withColumn("xs", F.collect_list("mean_v").over(w))
    # lower median by selection; both sides use FLOOR division (a bare
    # cast diverges: DuckDB rounds 1.5→2, Spark truncates 1.5→1)
    median = F.element_at(
        F.array_sort("xs"),
        F.floor((F.size("xs") + 1) / 2).cast("int"))
    return framed.select(
        "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(median, 6).alias("rolling_median"))


@query(
    "w15_longest_streak",
    survey=("W1", "Y5"),
    oracle=f"""
        WITH norm AS (SELECT user_id, {_TS} AS ts FROM events),
        active AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM norm
        ),
        islands AS (
            SELECT user_id, day,
                   day - CAST(row_number() OVER (
                       PARTITION BY user_id ORDER BY day
                   ) AS INTEGER) AS grp
            FROM active
        ),
        streaks AS (
            SELECT user_id, grp, CAST(count(*) AS BIGINT) AS streak_len
            FROM islands GROUP BY user_id, grp
        )
        SELECT user_id,
               max(streak_len) AS longest_streak,
               CAST(sum(streak_len) AS BIGINT) AS n_active_days
        FROM streaks GROUP BY user_id
    """,
)
def w15_longest_streak(spark, sf_dir):
    """Gaps-and-islands: longest run of CONSECUTIVE active days per
    user — the retention/engagement streak metric, and the canonical
    islands pattern missing from the window family until now. The
    trick: day minus the user's day-ordinal is CONSTANT within a
    consecutive run, so one ranking window turns runs into group keys
    and two bounded aggregates finish the job — no self-join, no
    recursive CTE. Shuffle budget: the distinct + the window share one
    user-keyed partitioning; streak/summary aggregates run on the
    (user × runs) dimension."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"))
    active = events.select(
        "user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = active.withColumn(
        "grp", F.date_sub("day", F.row_number().over(w)))
    streaks = islands.groupBy("user_id", "grp").agg(
        F.count("*").alias("streak_len"))
    return streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("longest_streak"),
        F.sum("streak_len").alias("n_active_days"))


@query(
    "w16_rolling_distinct_users",
    survey=("W3", "A4", "Y6"),
    oracle=f"""
        WITH act AS (
            SELECT DISTINCT event_type,
                   CAST(date_diff('day', DATE '1970-01-01',
                        CAST({_TS} AS DATE)) AS BIGINT) AS di,
                   user_id
            FROM events
        ),
        days AS (SELECT DISTINCT event_type, di FROM act),
        daily AS (
            SELECT event_type, di,
                   CAST(count(*) AS BIGINT) AS daily_users
            FROM act GROUP BY 1, 2
        )
        SELECT d.event_type, d.di AS day_idx,
               any_value(dl.daily_users) AS daily_users,
               CAST(count(DISTINCT a.user_id) AS BIGINT) AS rolling_users
        FROM days d
        JOIN daily dl ON dl.event_type = d.event_type AND dl.di = d.di
        JOIN act a ON a.event_type = d.event_type
                  AND a.di BETWEEN d.di - 6 AND d.di
        GROUP BY d.event_type, d.di
    """,
)
def w16_rolling_distinct_users(spark, sf_dir):
    """Trailing 7-day EXACT distinct actives per event type beside the
    daily distinct count — the DAU/WAU pair every activity monitor
    reports, and the one rolling metric that does NOT decompose into
    partial aggregates (distinct is not sum-able across days; that
    irreducibility is why a18's mergeable HLL sketches exist — this
    query is their exact ground truth at a scale where exactness is
    still affordable).

    Plan: the (type, user, day) activity set is deduped once (one
    shuffle), then a per-type RANGE window over the day index carries
    a collect_set whose size is the rolling distinct — state bounded
    by 7 days × active users, the same bound a streaming watermark
    would enforce. No day×activity self-join (the oracle uses one —
    fine for DuckDB at verification scale, quadratic in window width
    at ours)."""
    from pyspark.sql import Window

    act = (
        t(spark, sf_dir, "events")
        .select(
            "event_type",
            F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01")))
            .cast("bigint").alias("di"),
            "user_id")
        .distinct()
    )
    w = (Window.partitionBy("event_type").orderBy("di")
         .rangeBetween(-6, 0))
    rolled = act.select(
        "event_type", "di",
        F.size(F.collect_set("user_id").over(w)).cast("bigint")
        .alias("rolling_users"))
    daily = act.groupBy("event_type", "di").agg(
        F.count("*").cast("bigint").alias("daily_users"))
    return (
        rolled.dropDuplicates(["event_type", "di"])
        .join(daily, ["event_type", "di"])
        .select("event_type", F.col("di").alias("day_idx"),
                "daily_users", "rolling_users")
    )


@query(
    "w17_event_transition_matrix",
    survey=("W1", "A1", "Y5"),
    oracle=f"""
        WITH seq AS (
            SELECT user_id, event_type AS from_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY {_TS}, event_id
                   ) AS to_type
            FROM events
        ),
        cnt AS (
            SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
            FROM seq WHERE to_type IS NOT NULL
            GROUP BY 1, 2
        )
        SELECT from_type, to_type, n,
               CAST(n AS DOUBLE)
                 / CAST(CAST(sum(n) OVER (PARTITION BY from_type)
                             AS BIGINT) AS DOUBLE) AS p
        FROM cnt
    """,
)
def w17_event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), the
    behavioral fingerprint a funnel or anomaly model starts from
    (the reference's status-machine transitions: activity state
    changes in publish.py's dispatch loop). One window pass
    (lead over user timeline) turns the log into bigram rows; a
    grouped count plus a per-from-state window normalizes rows into
    probabilities. The probability is one IEEE division of two
    exactly-converted int64 counts — byte-identical cross-engine.

    100 TB: one shuffle to co-locate each user's timeline (window),
    one for the |types|^2-sized bigram count; the normalizing window
    runs over at most |types|^2 rows. Sequence order is total
    (ts, event_id tiebreak), so the lead() is deterministic."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"))
    cnt = (
        seq.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    wn = Window.partitionBy("from_type")
    return cnt.select(
        "from_type", "to_type", "n",
        (F.col("n").cast("double")
         / F.sum("n").over(wn).cast("bigint").cast("double")).alias("p"))


@query(
    "w18_week_over_week_change",
    survey=("W1", "A2", "DQ-drift"),
    oracle=f"""
        WITH norm AS (
            SELECT event_type, {_TS} AS ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        weekly AS (
            SELECT event_type,
                   strftime(date_trunc('week', ts), '%Y-%m-%d') AS week,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM norm GROUP BY 1, 2
        )
        SELECT event_type, week, n_events,
               CAST(cents AS DOUBLE) / 100 AS total_value,
               CASE WHEN lag(cents) OVER w IS NULL THEN NULL
                    ELSE 100 * (CAST(cents AS DOUBLE)
                                - CAST(lag(cents) OVER w AS DOUBLE))
                         / CAST(lag(cents) OVER w AS DOUBLE)
               END AS wow_value_pct
        FROM weekly
        WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
)
def w18_week_over_week_change(spark, sf_dir):
    """Week-over-week percentage change of event volume value per
    type — the growth-rate monitor every ingest dashboard leads with
    (the reference reports per-period download deltas in its admin
    CLI). ISO-Monday week bucketing (`date_trunc('week')` agrees
    between engines), exact integer-cents weekly totals, and the
    delta as one IEEE expression over two exactly-converted int64s —
    first week per type emits NULL, not 0, so a flat series and a
    missing series are distinguishable.

    100 TB: one corpus shuffle for the weekly aggregate; the lag
    window runs over (weeks x types) rows."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    weekly = (
        events.groupBy(
            "event_type",
            F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
            .alias("week"))
        .agg(F.count("*").cast("bigint").alias("n_events"),
             F.sum("cents").cast("bigint").alias("cents"))
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("cents").over(w)
    return weekly.select(
        "event_type", "week", "n_events",
        (F.col("cents").cast("double") / 100).alias("total_value"),
        F.when(prev.isNull(), F.lit(None).cast("double"))
         .otherwise(100 * (F.col("cents").cast("double")
                           - prev.cast("double")) / prev.cast("double"))
         .alias("wow_value_pct"))


_RFM_ANCHOR = "2024-02-01"   # fixed analysis date just past the corpus
_RFM_R_DAYS = 7              # "recent" = active within a week of anchor
_RFM_F_EVENTS = 25           # "frequent" = at least this many events
_RFM_M_CENTS = 100000        # "high-value" = >= $1000 total


@query(
    "w19_rfm_segments",
    survey=("W1", "A1", "CU-mix"),
    oracle=f"""
        WITH per_user AS (
            SELECT user_id,
                   date_diff('day', CAST(max({_TS}) AS DATE),
                             DATE '{_RFM_ANCHOR}') AS recency_days,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events GROUP BY user_id
        )
        SELECT CASE WHEN recency_days <= {_RFM_R_DAYS}
                    THEN 1 ELSE 0 END AS r_recent,
               CASE WHEN n_events >= {_RFM_F_EVENTS}
                    THEN 1 ELSE 0 END AS f_frequent,
               CASE WHEN cents >= {_RFM_M_CENTS}
                    THEN 1 ELSE 0 END AS m_high,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(cents) AS DOUBLE) / 100 AS total_value
        FROM per_user
        GROUP BY 1, 2, 3
    """,
)
def w19_rfm_segments(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary), the
    standard user-value partitioning, with FIXED business thresholds
    rather than quartile codes — deliberately: quartile ntiles need a
    global sort (a single-partition exchange this suite's plan lint
    forbids), while threshold segments are one grouped pass and mean
    the same thing operationally once thresholds are chosen. The
    anchor date is a literal (end of the corpus window), so recency
    is reproducible — never now().

    Money exact in int64 cents, recency in whole days, 8 possible
    segments out. 100 TB: ONE shuffle for the per-user aggregate;
    the segment rollup combines map-side to <= 8 rows."""
    events = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    per_user = events.groupBy("user_id").agg(
        F.datediff(F.lit(_RFM_ANCHOR).cast("date"),
                   F.max("ts").cast("date")).alias("recency_days"),
        F.count("*").cast("bigint").alias("n_events"),
        F.sum("cents").cast("bigint").alias("cents"))
    return (
        per_user.groupBy(
            F.when(F.col("recency_days") <= _RFM_R_DAYS, 1).otherwise(0)
            .alias("r_recent"),
            F.when(F.col("n_events") >= _RFM_F_EVENTS, 1).otherwise(0)
            .alias("f_frequent"),
            F.when(F.col("cents") >= _RFM_M_CENTS, 1).otherwise(0)
            .alias("m_high"))
        .agg(F.count("*").cast("bigint").alias("n_users"),
             (F.sum("cents").cast("double") / 100).alias("total_value"))
    )


@query(
    "w20_weekly_churn",
    survey=("W1", "U2", "A2"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, {_TS} AS ts FROM events
        ),
        uw AS (
            SELECT DISTINCT user_id,
                   strftime(date_trunc('week', ts), '%Y-%m-%d') AS week
            FROM norm
        ),
        weeks AS (SELECT DISTINCT week FROM uw),
        nxt AS (
            SELECT w.week,
                   lead(w.week) OVER (ORDER BY w.week) AS next_week
            FROM weeks w
        )
        SELECT n.week,
               CAST(count(*) AS BIGINT) AS active_users,
               CAST(sum(CASE WHEN r.user_id IS NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS churned,
               CAST(sum(CASE WHEN r.user_id IS NULL THEN 1 ELSE 0 END)
                    AS DOUBLE) / count(*) AS churn_rate
        FROM nxt n
        JOIN uw c ON c.week = n.week
        LEFT JOIN uw r ON r.week = n.next_week
                      AND r.user_id = c.user_id
        WHERE n.next_week IS NOT NULL
        GROUP BY n.week
    """,
)
def w20_weekly_churn(spark, sf_dir):
    """Weekly churn: of the users active in week w, how many are
    absent in the NEXT OBSERVED week (the retention complement of
    w10's cohort matrix; the reference's provider-activity lapse
    report is the same shape). "Next week" is the next week present
    in the data, not calendar+7 — so an ingestion gap doesn't mark
    the whole user base churned (that distinction is the usual bug
    in churn SQL). One distinct (user, week) pass, a tiny week-lag
    window over |weeks| rows, and one left anti-style join; churn
    rate is an exact int64 division.

    100 TB: the distinct is the only corpus-scale shuffle; the
    presence join is keyed (user, week) — co-partitioned with the
    distinct's output, and the weeks dimension broadcasts."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"))
    uw = events.select(
        "user_id",
        F.date_format(F.date_trunc("week", F.col("ts")), "yyyy-MM-dd")
        .alias("week")).distinct()
    weeks = uw.select("week").distinct()
    nxt = weeks.withColumn(
        "next_week",
        F.lead("week").over(Window.partitionBy(F.lit(1)).orderBy("week"))
    ).filter(F.col("next_week").isNotNull())
    cur = uw.join(F.broadcast(nxt), "week")
    ret = uw.select(F.col("week").alias("rweek"),
                    F.col("user_id").alias("ruser"))
    joined = cur.join(
        ret, (ret["rweek"] == cur["next_week"])
        & (ret["ruser"] == cur["user_id"]), "left")
    return joined.groupBy("week").agg(
        F.count("*").cast("bigint").alias("active_users"),
        F.sum(F.when(F.col("ruser").isNull(), 1).otherwise(0))
        .cast("bigint").alias("churned"),
        (F.sum(F.when(F.col("ruser").isNull(), 1).otherwise(0))
         .cast("double") / F.count("*")).alias("churn_rate"))


@query(
    "w21_interarrival_gap_profile",
    survey=("W1", "A8", "Y6"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, event_id, {_TS} AS ts FROM events
        ),
        seq AS (
            SELECT user_id, ts,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
            FROM norm
        ),
        gaps AS (
            SELECT date_diff('second', ts, nxt) AS gap_s
            FROM seq WHERE nxt IS NOT NULL
        ),
        ranked AS (
            SELECT gap_s,
                   row_number() OVER (ORDER BY gap_s) AS rn,
                   count(*) OVER () AS n
            FROM gaps
        )
        SELECT CAST(max(n) AS BIGINT) AS n_gaps,
               CAST(min(gap_s) AS BIGINT) AS min_gap_s,
               CAST(max(gap_s) AS BIGINT) AS max_gap_s,
               CAST(max(CASE WHEN rn = (n + 1) // 2 THEN gap_s END)
                    AS BIGINT) AS median_low_s,
               CAST(max(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT)
                        THEN gap_s END) AS BIGINT) AS p90_low_s
        FROM ranked
    """,
)
def w21_interarrival_gap_profile(spark, sf_dir):
    """Inter-arrival profile of the event feed: per-user consecutive
    event gaps in whole seconds, summarized as exact order statistics
    (min / lower-median / lower-p90 / max) — the feed-health shape a
    monitoring surface alerts on (a collapsing p90 means a runaway
    producer; a growing median means ingestion lag). Quantiles are
    picked at EXPLICIT integer ranks (rank (n+1)/2 and ceil(0.9n)
    under ORDER BY gap), so no engine's interpolating quantile
    semantics are involved: the picked VALUE is deterministic even
    under duplicate gaps, and every output is an exact int64.
    Consecutive ordering tie-breaks on (ts, event_id) so both engines
    pair identical rows.

    100 TB: one shuffle on user_id for the lag window (state = one
    row per user per partition), one global rank over the gap column
    — at scale the global sort is the cost; swap the rank-pick for
    approx_percentile on the same gaps frame when exactness is not
    required (same plan upstream). Reference anchor: activity
    monitoring cadence (Y6, views status dashboards)."""
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    wseq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("nxt", F.lead("ts").over(wseq))
    gaps = (
        seq.filter(F.col("nxt").isNotNull())
        .select((F.col("nxt").cast("long") - F.col("ts").cast("long"))
                .alias("gap_s"))
    )
    wr = Window.partitionBy(F.lit(1)).orderBy("gap_s")
    ranked = (
        gaps.withColumn("rn", F.row_number().over(wr))
        .withColumn("n", F.count("*").over(Window.partitionBy(F.lit(1))))
    )
    med_rank = F.floor((F.col("n") + 1) / 2)
    p90_rank = F.ceil(0.9 * F.col("n"))
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_gaps"),
        F.min("gap_s").cast("bigint").alias("min_gap_s"),
        F.max("gap_s").cast("bigint").alias("max_gap_s"),
        F.max(F.when(F.col("rn") == med_rank, F.col("gap_s")))
        .cast("bigint").alias("median_low_s"),
        F.max(F.when(F.col("rn") == p90_rank, F.col("gap_s")))
        .cast("bigint").alias("p90_low_s"))
