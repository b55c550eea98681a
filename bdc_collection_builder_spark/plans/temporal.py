"""Temporal join queries: as-of attribution and point-in-interval
range join over the events table (operators the reference lacks —
SURVEY §2.3 notes no as-of/range joins exist there; these are the
engine-feature additions a time-series pipeline needs, with exact
DuckDB oracles: ASOF JOIN and an inequality join respectively).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import duck_ts, t
from bdc_collection_builder_spark.functions.persist import tracked_persist
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


_G_US = 600_000_000  # 10-minute grid, epoch microseconds


@query(
    "tj_resample_interpolate",
    survey=("TJ-asof", "Y2"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, epoch_us({_TS}) AS ts_us, value FROM events
        ),
        obs AS (
            SELECT user_id, ts_us, avg(value) AS v
            FROM norm GROUP BY user_id, ts_us
        ),
        bounds AS (
            SELECT user_id,
                   (min(ts_us) + {_G_US - 1}) // {_G_US} AS g0,
                   max(ts_us) // {_G_US} AS g1
            FROM obs GROUP BY user_id
        ),
        spine AS (
            SELECT user_id, g.i * {_G_US} AS t_us
            FROM bounds, UNNEST(generate_series(g0, g1)) AS g(i)
            WHERE g0 <= g1
        ),
        b AS (
            SELECT s.user_id, s.t_us, o.ts_us AS tb, o.v AS vb
            FROM spine s ASOF LEFT JOIN obs o
              ON s.user_id = o.user_id AND s.t_us >= o.ts_us
        ),
        f AS (
            SELECT s.user_id, s.t_us, o.ts_us AS tf, o.v AS vf
            FROM spine s ASOF LEFT JOIN obs o
              ON s.user_id = o.user_id AND s.t_us <= o.ts_us
        )
        SELECT user_id, t_us,
               round(CASE WHEN tb = tf THEN vb
                          ELSE vb + (vf - vb)
                               * (CAST(t_us - tb AS DOUBLE)
                                  / CAST(tf - tb AS DOUBLE))
                     END, 4) AS v_interp
        FROM b JOIN f USING (user_id, t_us)
    """,
)
def tj_resample_interpolate(spark, sf_dir):
    """Resample each user's irregular value series onto a regular
    10-minute grid with linear interpolation — the gap-fill/resample
    primitive (TimescaleDB ``time_bucket_gapfill`` + ``interpolate``
    shape) satellite revisit series need. Grid points span only the
    observed range per user, so both bracketing observations always
    exist; BOTH brackets come from one obs-union-spine frame shuffled
    ONCE on user_id — an ascending carry-forward window takes the last
    observation at-or-before each grid point, a descending one takes
    the first at-or-after (the second window re-sorts locally but
    never re-shuffles), and filtering back to spine rows replaces the
    bracket join entirely. The previous two-as-of-join form paid that
    union+sort twice plus a grid-sized equi-join (round-10 profile:
    6.9s -> ~3.1s warm at sf0.1, where the 10-min spine is 63x
    the observation count). The spine explodes from per-user bounds,
    all partition-parallel on user_id at any scale."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    obs = (events.select("user_id", ts_us.alias("ts_us"), "value")
           .groupBy("user_id", "ts_us").agg(F.avg("value").alias("v")))
    bounds = obs.groupBy("user_id").agg(
        F.expr(f"(min(ts_us) + {_G_US - 1}) div {_G_US}").alias("g0"),
        F.expr(f"max(ts_us) div {_G_US}").alias("g1"))
    spine = (bounds.filter(F.col("g0") <= F.col("g1"))
             .select("user_id",
                     F.explode(F.sequence("g0", "g1")).alias("i"))
             .select("user_id", (F.col("i") * _G_US).alias("t_us")))
    # obs rows sort BEFORE a coincident grid point in BOTH directions
    # (is_spine breaks the tie), so an observation exactly ON the grid
    # is its own backward and forward bracket — tb = tf = t_us, the
    # exact-hit branch below, matching both engines' inclusive as-of.
    u = obs.select(
        "user_id", F.col("ts_us").alias("t"),
        F.col("ts_us").alias("ot"), "v",
        F.lit(0).alias("is_spine"),
    ).unionByName(spine.select(
        "user_id", F.col("t_us").alias("t"),
        F.lit(None).cast("bigint").alias("ot"),
        F.lit(None).cast("double").alias("v"),
        F.lit(1).alias("is_spine")))
    w_asc = (Window.partitionBy("user_id")
             .orderBy(F.col("t").asc(), F.col("is_spine").asc())
             .rowsBetween(Window.unboundedPreceding, 0))
    w_desc = (Window.partitionBy("user_id")
              .orderBy(F.col("t").desc(), F.col("is_spine").asc())
              .rowsBetween(Window.unboundedPreceding, 0))
    bracketed = (
        u.withColumn("tb", F.last("ot", ignorenulls=True).over(w_asc))
        .withColumn("vb", F.last("v", ignorenulls=True).over(w_asc))
        .withColumn("tf", F.last("ot", ignorenulls=True).over(w_desc))
        .withColumn("vf", F.last("v", ignorenulls=True).over(w_desc))
        .filter(F.col("is_spine") == 1)
    )
    frac = ((F.col("t") - F.col("tb")).cast("double")
            / (F.col("tf") - F.col("tb")).cast("double"))
    interp = F.when(F.col("tb") == F.col("tf"), F.col("vb")).otherwise(
        F.col("vb") + (F.col("vf") - F.col("vb")) * frac)
    return bracketed.select(
        "user_id", F.col("t").alias("t_us"),
        F.round(interp, 4).alias("v_interp"))


@query(
    "tj_interval_coalesce",
    survey=("TJ-range", "Y5"),
    oracle=f"""
        WITH iv AS (
            SELECT user_id, {duck_ts()} AS s,
                   {duck_ts()} + INTERVAL 5 MINUTE AS e
            FROM events
        ),
        flagged AS (
            SELECT user_id, s, e,
                   CASE WHEN s > max(e) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ) THEN 1 ELSE 0 END AS new_span
            FROM iv
        ),
        spans AS (
            SELECT user_id, s, e,
                   CAST(sum(new_span) OVER (
                       PARTITION BY user_id ORDER BY s, e
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS BIGINT) AS span_id
            FROM flagged
        )
        SELECT user_id, span_id,
               min(s) AS span_start, max(e) AS span_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM spans GROUP BY user_id, span_id
    """,
)
def tj_interval_coalesce(spark, sf_dir):
    """Interval coalescing: each event opens a 5-minute activity
    interval; overlapping/touching intervals per user merge into
    maximal spans — the temporal-normalization primitive behind
    "total active time", on-call coverage, and validity-period
    compaction. The classic two-window formulation: a running
    ``max(end)`` over all PRIOR intervals flags span starts (an
    interval that begins after everything before it has closed), a
    running sum of flags numbers the spans, and one bounded aggregate
    emits them. Both windows share a single user-keyed sort — one
    shuffle total, no self-join, no recursion."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("s"))
    iv = events.withColumn(
        "e", F.col("s") + F.expr("INTERVAL 5 MINUTES"))
    order = Window.partitionBy("user_id").orderBy("s", "e")
    prior_max_end = F.max("e").over(
        order.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_span",
        F.when(F.col("s") > prior_max_end, 1).otherwise(0))
    spans = flagged.withColumn(
        "span_id",
        F.sum("new_span").over(
            order.rowsBetween(Window.unboundedPreceding, 0)))
    return spans.groupBy("user_id", "span_id").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count("*").alias("n_events"))


@query(
    "tj_scd2_dimension_join",
    survey=("TJ-asof", "J6", "W1"),
    oracle=f"""
        WITH dim AS (
            SELECT user_id, tier,
                   TIMESTAMP '2024-01-01 00:00:00'
                   + CASE tier WHEN 'basic' THEN 0
                               WHEN 'plus' THEN user_id % 7 + 1
                               ELSE user_id % 7 + 10 END
                     * INTERVAL 1 DAY AS valid_from
            FROM (SELECT DISTINCT user_id FROM events),
                 (VALUES ('basic'), ('plus'), ('pro')) AS t(tier)
        ),
        ev AS (
            SELECT user_id, {duck_ts()} AS ts, value FROM events
        ),
        matched AS (
            SELECT user_id, ts, value, tier FROM (
                SELECT e.user_id, e.ts, e.value, d.tier,
                       row_number() OVER (
                           PARTITION BY e.user_id, e.ts, e.value
                           ORDER BY d.valid_from DESC
                       ) AS rk
                FROM ev e JOIN dim d
                  ON e.user_id = d.user_id AND d.valid_from <= e.ts
            ) WHERE rk = 1
        )
        SELECT tier, CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM matched GROUP BY tier
    """,
)
def tj_scd2_dimension_join(spark, sf_dir):
    """SCD2 (slowly-changing-dimension type 2) temporal lookup: each
    event resolves the dimension VERSION valid at its event time — the
    warehouse-standard versioned-dimension join the reference leans on
    PostgreSQL point-in-time queries for. With non-overlapping
    contiguous validity periods, SCD2 is exactly a backward as-of join
    on valid_from, so it reuses the engine's asof_join operator (one
    union + carry-forward window pass per side, one shuffle each, no
    range explosion and no nested loop — operators/temporal.py). The
    dimension here is analytic (per-user tier upgrades at
    user-dependent dates) so the DuckDB oracle replays the same
    point-in-time resolution; per-tier event counts and value sums
    hash-check the whole assignment. The events side never has rows
    before every tier's epoch, and the output is the aggregated rollup
    (tier mix over time), the shape billing/attribution actually
    consumes."""
    import datetime as dt

    from bdc_collection_builder_spark.operators.temporal import asof_join

    events = t(spark, sf_dir, "events").select("user_id", "ts", "value")
    users = events.select("user_id").distinct()
    epoch = dt.datetime(2024, 1, 1)
    tiers = F.array(F.lit("basic"), F.lit("plus"), F.lit("pro"))
    offset_days = (
        F.when(F.col("tier") == "basic", F.lit(0))
        .when(F.col("tier") == "plus", F.col("user_id") % 7 + 1)
        .otherwise(F.col("user_id") % 7 + 10))
    dim = (
        users.select("user_id", F.explode(tiers).alias("tier"))
        .select(
            "user_id", "tier",
            (F.lit(epoch) + F.make_dt_interval(days=offset_days))
            .alias("valid_from"))
    )
    matched = asof_join(
        events, dim, on=["user_id"], left_ts="ts",
        right_ts="valid_from", right_values=["tier"],
        direction="backward")
    return (
        matched.groupBy("tier")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )


_LTTB_T = 12          # output points (first + 10 buckets + last)
_LTTB_NB = _LTTB_T - 2

# shared sub-expressions (identical text both engines modulo indexing):
# bucket id of middle point j (1-based over the middle) with m middles
# is floor((j-1)*NB/m); bucket averages are exact-integer sums / count.


def _lttb_spark_expr() -> str:
    nb = _LTTB_NB
    last_x = "CAST(element_at(pts, -1).di AS DOUBLE)"
    last_y = "CAST(element_at(pts, -1).y AS DOUBLE)"
    nx = f"IF(k < {nb - 1}, bstats[CAST(k + 1 AS INT)].ax, {last_x})"
    ny = f"IF(k < {nb - 1}, bstats[CAST(k + 1 AS INT)].ay, {last_y})"
    best = f"""element_at(array_sort(transform(
        filter(mids, q -> q.b = k),
        q -> named_struct(
            'na', -abs((acc.px - {nx}) * (CAST(q.y AS DOUBLE) - acc.py)
                       - (acc.px - CAST(q.di AS DOUBLE))
                         * ({ny} - acc.py)),
            'di', q.di, 'y', q.y))), 1)"""
    return f"""
    IF(size(pts) <= {_LTTB_T}, pts,
       aggregate(
           sequence(0, {nb - 1}),
           named_struct(
               'px', CAST(pts[0].di AS DOUBLE),
               'py', CAST(pts[0].y AS DOUBLE),
               'sel', CAST(array() AS ARRAY<STRUCT<di: BIGINT, y: BIGINT>>)),
           (acc, k) -> named_struct(
               'px', CAST({best}.di AS DOUBLE),
               'py', CAST({best}.y AS DOUBLE),
               'sel', concat(acc.sel, array(named_struct(
                   'di', {best}.di, 'y', {best}.y)))),
           acc -> concat(array(pts[0]), acc.sel,
                         array(element_at(pts, -1)))))
    """


_LTTB_PREP_SQL = """
    daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01',
                    CAST({ts} AS DATE)) AS BIGINT) AS di,
               CAST(count(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
    ),
    series AS (
        SELECT event_type,
               list_sort(list(struct_pack(di := di, y := y))) AS pts
        FROM daily GROUP BY event_type
    ),
    prep AS (
        SELECT event_type, pts, len(pts) - 2 AS m,
               list_transform(generate_series(1, len(pts) - 2),
                   j -> struct_pack(
                       di := pts[j + 1].di, y := pts[j + 1].y,
                       b := CAST(floor((j - 1) * {nb} / (len(pts) - 2))
                                 AS BIGINT))) AS mids
        FROM series
    ),
    pb AS (
        SELECT event_type, pts, mids,
               list_transform(generate_series(0, {nb} - 1),
                   k -> struct_pack(
                       ax := CAST(list_sum(list_transform(
                                 list_filter(mids, q -> q.b = k),
                                 q -> q.di)) AS DOUBLE)
                             / len(list_filter(mids, q -> q.b = k)),
                       ay := CAST(list_sum(list_transform(
                                 list_filter(mids, q -> q.b = k),
                                 q -> q.y)) AS DOUBLE)
                             / len(list_filter(mids, q -> q.b = k))))
                   AS bstats
        FROM prep
    )
"""


@query(
    "tj_lttb_downsample",
    survey=("TJ-resample", "Y6"),
    oracle="WITH RECURSIVE "
    + _LTTB_PREP_SQL.format(ts=_TS, nb=_LTTB_NB)
    + f""",
    lt AS (
        SELECT event_type, pts, mids, bstats, 0 AS k,
               CAST(pts[1].di AS DOUBLE) AS px,
               CAST(pts[1].y AS DOUBLE) AS py,
               CAST([] AS STRUCT(di BIGINT, y BIGINT)[]) AS sel
        FROM pb WHERE len(pts) > {_LTTB_T}
        UNION ALL
        SELECT event_type, pts, mids, bstats, k + 1,
               CAST(best.di AS DOUBLE), CAST(best.y AS DOUBLE),
               list_append(sel, struct_pack(di := best.di, y := best.y))
        FROM (
            SELECT *,
                list_sort(list_transform(
                    list_filter(mids, q -> q.b = k),
                    q -> struct_pack(
                        na := -abs((px - (CASE WHEN k < {_LTTB_NB - 1}
                                   THEN bstats[k + 2].ax
                                   ELSE CAST(pts[len(pts)].di AS DOUBLE)
                                   END)) * (CAST(q.y AS DOUBLE) - py)
                              - (px - CAST(q.di AS DOUBLE))
                                * ((CASE WHEN k < {_LTTB_NB - 1}
                                    THEN bstats[k + 2].ay
                                    ELSE CAST(pts[len(pts)].y AS DOUBLE)
                                    END) - py)),
                        di := q.di, y := q.y)))[1] AS best
            FROM lt WHERE k < {_LTTB_NB}
        )
    ),
    picked AS (
        SELECT event_type,
               [pts[1]] || sel || [pts[len(pts)]] AS sel
        FROM lt WHERE k = {_LTTB_NB}
        UNION ALL
        SELECT event_type, pts AS sel
        FROM pb WHERE len(pts) <= {_LTTB_T}
    )
    SELECT event_type,
           CAST(generate_subscripts(sel, 1) AS INTEGER) - 1 AS pos,
           unnest(list_transform(sel, s -> s.di)) AS day_idx,
           unnest(list_transform(sel, s -> s.y)) AS n_events
    FROM picked
""",
)
def tj_lttb_downsample(spark, sf_dir):
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013,
    public; TimescaleDB toolkit ships it as `lttb`) of each event
    type's daily-volume series to {_LTTB_T} points: the
    dashboard-rendering operator that keeps the VISUAL shape (peaks,
    cliffs) a plain strided/avg decimation destroys. First/last points
    are pinned; each of the {_LTTB_NB} interior buckets contributes
    the point maximizing the triangle area against the previously
    SELECTED point and the next bucket's centroid — a sequential
    dependency, run as ONE fold over the per-series point array
    (bounded: a series longer than memory would be chunked by
    calendar range first, the standard recipe).

    Determinism: the y-series is integer daily counts, bucket
    centroids are exact-integer sums over doubles, the area formula
    has a pinned operand order, and ties break to the earliest day —
    the DuckDB oracle replays the fold as a list-state recursive CTE
    bit-for-bit. One shuffle (daily counts) + one per-type collect;
    the fold itself is a cached-SQL aggregate HOF, zero Python."""
    from bdc_collection_builder_spark.extensions.similarity import (
        _cached_expr,
    )

    nb = _LTTB_NB
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"),
                       F.to_date(F.lit("1970-01-01")))
            .cast("bigint").alias("di"))
        .agg(F.count("*").cast("bigint").alias("y"))
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("di", "y"))).alias("pts"))
    prep = series.select(
        "event_type", "pts",
        _cached_expr(f"""
            transform(sequence(1, size(pts) - 2),
                j -> named_struct(
                    'di', pts[j].di, 'y', pts[j].y,
                    'b', CAST(floor((j - 1) * {nb} / (size(pts) - 2))
                              AS BIGINT)))
        """).alias("mids"))
    pb = prep.select(
        "event_type", "pts", "mids",
        _cached_expr(f"""
            transform(sequence(0, {nb} - 1),
                k -> named_struct(
                    'ax', CAST(aggregate(filter(mids, q -> q.b = k),
                              CAST(0 AS BIGINT), (a, q) -> a + q.di)
                              AS DOUBLE)
                          / size(filter(mids, q -> q.b = k)),
                    'ay', CAST(aggregate(filter(mids, q -> q.b = k),
                              CAST(0 AS BIGINT), (a, q) -> a + q.y)
                              AS DOUBLE)
                          / size(filter(mids, q -> q.b = k))))
        """).alias("bstats"))
    picked = pb.select(
        "event_type", _cached_expr(_lttb_spark_expr()).alias("sel"))
    return picked.select(
        "event_type",
        F.posexplode("sel").alias("pos", "s"),
    ).select(
        "event_type", "pos",
        F.col("s.di").alias("day_idx"),
        F.col("s.y").alias("n_events"))


@query(
    "tj_cusum_changepoint",
    survey=("TJ-changepoint", "Y6"),
    oracle=f"""
        WITH RECURSIVE daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', {_TS}) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        idx AS (
            SELECT event_type, day, cnt,
                   CAST(row_number() OVER (
                       PARTITION BY event_type ORDER BY day) AS BIGINT) AS i
            FROM daily
        ),
        tot AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS t,
                   CAST(sum(cnt) AS BIGINT) AS total
            FROM daily GROUP BY event_type
        ),
        walk(event_type, i, s, best, best_day) AS (
            SELECT event_type, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                   CAST(0 AS BIGINT), ''
            FROM tot
            UNION ALL
            SELECT w.event_type, w.i + 1,
                   greatest(CAST(0 AS BIGINT), w.s + (b.cnt * t.t - t.total)),
                   CASE WHEN greatest(CAST(0 AS BIGINT),
                                      w.s + (b.cnt * t.t - t.total)) > w.best
                        THEN greatest(CAST(0 AS BIGINT),
                                      w.s + (b.cnt * t.t - t.total))
                        ELSE w.best END,
                   CASE WHEN greatest(CAST(0 AS BIGINT),
                                      w.s + (b.cnt * t.t - t.total)) > w.best
                        THEN strftime(b.day, '%Y-%m-%d')
                        ELSE w.best_day END
            FROM walk w
            JOIN idx b ON b.event_type = w.event_type AND b.i = w.i + 1
            JOIN tot t ON t.event_type = w.event_type
        )
        SELECT w.event_type, t.t AS n_days, t.total AS n_events,
               w.best AS cusum_peak, w.best_day AS changepoint_day
        FROM walk w JOIN tot t ON t.event_type = w.event_type
        WHERE w.i = t.t
    """,
)
def tj_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detection on daily ingest volume, per event
    type: with daily counts c_1..c_T, the scaled deviation
    d_t = c_t·T − Σc (integer — no float mean, so the recurrence is
    EXACT) drives S_t = max(0, S_{t−1} + d_t); the earliest day where
    S_t attains its maximum is the level-shift changepoint. This is
    the sequential counterpart to dq_volume_anomaly's windowed
    robust-z: CUSUM accumulates small persistent shifts a per-day
    z-score never flags.

    Scale shape: ONE daily-count aggregate over the stream (partial
    combine), then a per-type fold over the sorted day array — state
    is O(1) per type, array length = #days, all inside one codegen'd
    higher-order `aggregate`; nothing iterates over the raw events.
    The oracle replays the identical recurrence as a recursive CTE.
    All arithmetic is int64, so cross-engine equality is exact by
    construction."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("event_type"),
                 F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    arr = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "cnt"))).alias("days"))
    sized = arr.select(
        "event_type", "days",
        F.size("days").cast("bigint").alias("n_days"),
        F.expr("CAST(aggregate(days, 0L, (a, x) -> a + x.cnt) AS BIGINT)")
         .alias("n_events"))
    folded = sized.select(
        "event_type", "n_days", "n_events",
        F.expr("""
            aggregate(
                days,
                named_struct('s', 0L, 'best', 0L, 'best_day', ''),
                (acc, x) -> named_struct(
                    's', greatest(0L, acc.s + (x.cnt * n_days - n_events)),
                    'best',
                    CASE WHEN greatest(0L,
                              acc.s + (x.cnt * n_days - n_events)) > acc.best
                         THEN greatest(0L,
                              acc.s + (x.cnt * n_days - n_events))
                         ELSE acc.best END,
                    'best_day',
                    CASE WHEN greatest(0L,
                              acc.s + (x.cnt * n_days - n_events)) > acc.best
                         THEN date_format(x.day, 'yyyy-MM-dd')
                         ELSE acc.best_day END)
            ) AS cp
        """).alias("cp"),
    )
    return folded.select(
        "event_type", "n_days", "n_events",
        F.col("cp.best").alias("cusum_peak"),
        F.col("cp.best_day").alias("changepoint_day"))


@query(
    "tj_holt_linear_smoothing",
    survey=("W-ewma", "Y1"),
    oracle=f"""
        WITH norm AS (
            SELECT event_type, {_TS} AS ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / 100
                     AS day_total
            FROM norm GROUP BY 1, 2
        ),
        framed AS (
            SELECT event_type, day,
                   array_agg(day_total) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
            FROM daily
        ),
        folded AS (
            SELECT event_type, day,
                   list_reduce(
                       list_transform(xs,
                           x -> [x, CAST(0 AS DOUBLE)]),
                       (acc, p) -> [
                           CAST(0.5 AS DOUBLE) * p[1]
                             + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]),
                           CAST(0.25 AS DOUBLE)
                             * ((CAST(0.5 AS DOUBLE) * p[1]
                                 + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]))
                                - acc[1])
                             + CAST(0.75 AS DOUBLE) * acc[2]
                       ]) AS st
            FROM framed
        )
        SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
               round(st[1], 6) AS level,
               round(st[2], 6) AS trend,
               round(st[1] + st[2], 6) AS forecast_next
        FROM folded
    """,
)
def tj_holt_linear_smoothing(spark, sf_dir):
    """Holt double-exponential smoothing (level + linear trend,
    alpha=0.5, beta=0.25) of the daily value total per event type,
    with the one-step-ahead forecast level+trend — the trend-aware
    sequel to w13's simple EWMA, and the standard capacity-planning
    smoother for ingest-volume series (the reference sizes provider
    quotas off exactly such a trended daily series). The recursion
    carries TWO coupled states, so the fold accumulator is a 2-array
    [level, trend]; restricted to a bounded 20-day frame it is exact
    on both engines: collect the frame, left-fold
      level' = a*x + (1-a)*(level+trend)
      trend' = b*(level'-level) + (1-b)*trend
    with level'=x1, trend'=0 seeding. Both coefficients are binary
    fractions (0.5/0.25) and the daily totals are exact integer
    cents, so every fold step is the SAME IEEE op sequence on both
    engines — byte-identical without tolerance.

    100 TB: the daily pre-aggregate is the only corpus-scale
    shuffle; the window and the O(20) codegen'd fold run over the
    (days x types) dimension. Citation: reference collections.py
    quota sizing (trend extrapolation the reference does in a
    Python loop, here one whole-stage-codegen expression)."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    daily = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg((F.sum("cents").cast("bigint").cast("double") / 100
              ).alias("day_total"))
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(-19, 0)
    framed = daily.withColumn("xs", F.collect_list("day_total").over(w))

    def step(acc, x):
        level = (F.lit(0.5) * x
                 + F.lit(0.5) * (acc[0] + acc[1]))
        trend = (F.lit(0.25)
                 * ((F.lit(0.5) * x
                     + F.lit(0.5) * (acc[0] + acc[1])) - acc[0])
                 + F.lit(0.75) * acc[1])
        return F.array(level, trend)

    st = F.aggregate(
        F.slice(F.col("xs"), F.lit(2),
                F.greatest(F.size("xs") - 1, F.lit(0))),
        F.array(F.element_at("xs", 1).cast("double"), F.lit(0.0)),
        step,
    )
    return framed.select(
        "event_type", F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.round(st[0], 6).alias("level"),
        F.round(st[1], 6).alias("trend"),
        F.round(st[0] + st[1], 6).alias("forecast_next"))


@query(
    "tj_seasonal_naive_eval",
    survey=("W-ewma", "DQ-drift"),
    oracle=f"""
        WITH norm AS (
            SELECT event_type, {_TS} AS ts,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(sum(cents) AS BIGINT) AS cents
            FROM norm GROUP BY 1, 2
        ),
        joined AS (
            SELECT a.event_type, a.day, a.cents,
                   b.cents AS forecast
            FROM daily a
            JOIN daily b ON b.event_type = a.event_type
                        AND b.day = a.day - INTERVAL 7 DAY
        )
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(abs(cents - forecast)) AS DOUBLE)
                   / (100 * count(*)) AS mae_value,
               CAST(max(abs(cents - forecast)) AS DOUBLE) / 100
                   AS max_abs_err
        FROM joined GROUP BY event_type
    """,
)
def tj_seasonal_naive_eval(spark, sf_dir):
    """Forecast BACKTEST with the seasonal-naive baseline: predict
    each day's value total as the same weekday one week earlier, and
    score MAE / max-abs-error per event type — the floor every
    capacity forecast must beat (tj_holt_linear_smoothing is the
    challenger; this query is the benchmark protocol). Implemented as
    a self-join of the daily aggregate on (type, day-7) — at daily
    grain an equi-join, no window needed, and missing history days
    simply drop out (inner join = only scoreable days).

    All errors are exact int64 cents; the MAE is ONE IEEE division
    of the exact error sum by (100 * n) at the end — no float mean
    accumulates.

    100 TB: the daily aggregate is the only corpus-scale shuffle; the
    self-join runs on (days x types) rows."""
    events = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("day")).agg(
        F.sum("cents").cast("bigint").alias("cents"))
    # daily feeds both sides of the day-7 self-join — persist so it
    # computes once (the dd_prefix round-9 lesson)
    daily = tracked_persist(daily)
    prev = daily.select(
        F.col("event_type").alias("et"),
        F.date_add(F.col("day"), 7).alias("target_day"),
        F.col("cents").alias("forecast"))
    joined = daily.join(
        prev, (daily["event_type"] == prev["et"])
        & (daily["day"] == prev["target_day"]))
    err = F.abs(F.col("cents") - F.col("forecast"))
    return joined.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"),
        (F.sum(err).cast("double") / (100 * F.count("*")))
        .alias("mae_value"),
        (F.max(err).cast("double") / 100).alias("max_abs_err"))


@query(
    "tj_autocorrelation_lag1",
    survey=("Y6", "A2"),
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', {duck_ts()}) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        pairs AS (
            SELECT event_type, c AS x,
                   lead(c) OVER (PARTITION BY event_type
                                 ORDER BY day) AS y
            FROM daily
        ),
        s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM pairs WHERE y IS NOT NULL GROUP BY event_type
        )
        SELECT event_type, n AS n_pairs,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            * CAST(n * syy - sy * sy AS DOUBLE)),
                     6) AS autocorr_lag1
        FROM s
    """,
)
def tj_autocorrelation_lag1(spark, sf_dir):
    """Lag-1 autocorrelation of the per-type daily event volume — the
    monitoring statistic that separates a drifting/trending feed
    (autocorr near 1) from independent daily noise (near 0), feeding
    the same alerting surface as dq_volume_anomaly and the CUSUM
    changepoint (reference Y6: activity status monitoring). Pairs are
    (day t, next OBSERVED day) within each type, so an ingestion gap
    contributes one pair, not a run of artificial zeros.

    Determinism contract (same as gr_degree_assortativity): daily
    counts are exact int64, all six Pearson moments are exact int64
    sums, and the correlation is one double expression over them —
    bit-identical on both engines before the 6-decimal round.

    100 TB: one corpus-scale shuffle (the daily count), then a window
    over |types| x |days| rows and a moment aggregate over the same —
    dimension-sized. No collect, no global sort."""
    from pyspark.sql import Window

    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts").cast("timestamp"))
                 .cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pairs = (
        daily.select("event_type", F.col("c").alias("x"),
                     F.lead("c").over(w).alias("y"))
        .filter(F.col("y").isNotNull())
    )
    s = pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    vx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")) \
        .cast("double")
    vy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")) \
        .cast("double")
    return s.select(
        "event_type", F.col("n").alias("n_pairs"),
        F.round(num / F.sqrt(vx * vy), 6).alias("autocorr_lag1"))


@query(
    "tj_theil_sen_trend",
    survey=("Y6", "A2"),
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', {duck_ts()}) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        slopes AS (
            SELECT a.event_type,
                   CAST(b.c - a.c AS DOUBLE)
                     / date_diff('day', a.day, b.day) AS slope
            FROM daily a JOIN daily b
              ON b.event_type = a.event_type AND a.day < b.day
        ),
        ranked AS (
            SELECT event_type, slope,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY slope) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM slopes
        )
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n_pairs,
               round(max(CASE WHEN rn = (n + 1) // 2 THEN slope END), 6)
                 AS theil_sen_slope
        FROM ranked GROUP BY event_type
    """,
)
def tj_theil_sen_trend(spark, sf_dir):
    """Theil-Sen trend (median of pairwise slopes, Theil 1950 / Sen
    1968 — public) of the per-type daily event volume: the robust
    alternative to OLS for feed-health trending — a single burst day
    corrupts a least-squares slope but moves the median of slopes by
    at most one rank. Complements the lag-1 autocorrelation and CUSUM
    changepoint in the monitoring suite (reference Y6).

    Determinism: every pairwise slope is one double division of exact
    int64 differences (identical arithmetic both engines), and the
    median is picked at an EXPLICIT integer rank under ORDER BY slope
    — the picked value is deterministic even with duplicate slopes.

    Scale shape: the pair join is per-type over the DAILY table
    (|days|² per type — a dimension-sized quadratic over dozens of
    rows, NEVER the corpus); the only corpus-scale work is the first
    daily count shuffle. At very long horizons swap the pair explode
    for a windowed sample of day pairs — same downstream plan."""
    from pyspark.sql import Window

    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts").cast("timestamp"))
                 .cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    # daily feeds a/b pair self-join — persist so the
    # corpus-scale events scan runs once (the dd_prefix
    # round-9 lesson: every unpersisted consumer re-scans the
    # fact table)
    daily = tracked_persist(daily)
    a = daily.select("event_type", F.col("day").alias("d1"),
                     F.col("c").alias("c1"))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("day").alias("d2"), F.col("c").alias("c2"))
    slopes = (
        a.join(b, (F.col("event_type") == F.col("et2"))
               & (F.col("d1") < F.col("d2")))
        .select("event_type",
                ((F.col("c2") - F.col("c1")).cast("double")
                 / F.datediff("d2", "d1")).alias("slope"))
    )
    w = Window.partitionBy("event_type").orderBy("slope")
    ranked = (
        slopes.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(
            Window.partitionBy("event_type")))
    )
    med_rank = F.floor((F.col("n") + 1) / 2)
    return ranked.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_pairs"),
        F.round(F.max(F.when(F.col("rn") == med_rank, F.col("slope"))),
                6).alias("theil_sen_slope"))


@query(
    "tj_mann_kendall_trend",
    survey=("Y6", "A2"),
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', {duck_ts()}) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        nd AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
            FROM daily GROUP BY 1
        ),
        pairs AS (
            SELECT a.event_type,
                   CASE WHEN b.c > a.c THEN 1
                        WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
            FROM daily a JOIN daily b
              ON b.event_type = a.event_type AND a.day < b.day
        )
        SELECT p.event_type,
               max(n.n_days) AS n_days,
               CAST(sum(p.sgn) AS BIGINT) AS s_statistic,
               round(2.0 * CAST(sum(p.sgn) AS DOUBLE)
                     / (max(n.n_days) * (max(n.n_days) - 1)), 6)
                 AS kendall_tau_a
        FROM pairs p JOIN nd n ON n.event_type = p.event_type
        GROUP BY p.event_type
    """,
)
def tj_mann_kendall_trend(spark, sf_dir):
    """Mann-Kendall trend test statistic (Mann 1945 / Kendall 1975 —
    public) over the per-type daily event volume: S = Σ_{i<j}
    sign(c_j − c_i), the non-parametric monotonic-trend detector that
    complements tj_theil_sen_trend (Theil-Sen estimates the slope;
    Mann-Kendall decides whether a trend EXISTS — the standard
    pairing in monitoring literature). Also reports Kendall's tau-a
    (S normalized by the pair count).

    Determinism: daily counts are exact int64; every pairwise term is
    an integer sign, summed as int64 (order-free); tau-a is ONE final
    double division of exact integers — bit-deterministic on both
    engines, no float folds anywhere.

    Scale shape: identical envelope to tj_theil_sen_trend — the pair
    join is per-type over the DAILY aggregate (dimension-sized
    quadratic over dozens of rows), the only corpus-scale work is the
    first daily-count shuffle (map-side combined). Reference anchor:
    Y6 status monitoring (the reference eyeballs activity trends in
    its dashboard; this is the statistical version)."""
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.date_trunc("day", F.col("ts").cast("timestamp"))
                 .cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    # daily feeds nd reduction + a/b pair self-join — persist so the
    # corpus-scale events scan runs once (the dd_prefix
    # round-9 lesson: every unpersisted consumer re-scans the
    # fact table)
    daily = tracked_persist(daily)
    nd = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_days"))
    a = daily.select("event_type", F.col("day").alias("d1"),
                     F.col("c").alias("c1"))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("day").alias("d2"), F.col("c").alias("c2"))
    sgn = (F.when(F.col("c2") > F.col("c1"), 1)
           .when(F.col("c2") < F.col("c1"), -1).otherwise(0))
    pairs = (
        a.join(b, (F.col("event_type") == F.col("et2"))
               & (F.col("d1") < F.col("d2")))
        .select("event_type", sgn.alias("sgn"))
    )
    agg = pairs.groupBy("event_type").agg(
        F.sum("sgn").cast("bigint").alias("s_statistic"))
    return (
        agg.join(nd, "event_type")
        .select(
            "event_type", "n_days", "s_statistic",
            F.round(F.lit(2.0) * F.col("s_statistic").cast("double")
                    / (F.col("n_days") * (F.col("n_days") - 1)), 6)
            .alias("kendall_tau_a"))
    )


@query(
    "tj_runs_test_randomness",
    survey=("Y6", "W1", "A2"),
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', {_TS}) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1
        ),
        deltas AS (
            SELECT day,
                   c - lag(c) OVER (ORDER BY day) AS d
            FROM daily
        ),
        signs AS (
            SELECT day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS sgn
            FROM deltas WHERE d IS NOT NULL AND d <> 0
        ),
        runs AS (
            SELECT sgn,
                   CASE WHEN lag(sgn) OVER (ORDER BY day) IS NULL
                         OR lag(sgn) OVER (ORDER BY day) <> sgn
                        THEN 1 ELSE 0 END AS new_run
            FROM signs
        )
        SELECT CAST(count(*) AS BIGINT) AS n_moves,
               CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_up,
               CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_down,
               CAST(sum(new_run) AS BIGINT) AS n_runs
        FROM runs
    """,
)
def tj_runs_test_randomness(spark, sf_dir):
    """Wald-Wolfowitz runs test statistics (1940, public) over the
    daily event-volume series: the number of maximal same-direction
    runs in the up/down sequence of day-over-day changes. Too FEW
    runs = trending/autocorrelated feed, too MANY = oscillating
    (load-balancer flapping, retry storms) — the monitoring
    complement to tj_autocorrelation_lag1 that is distribution-free
    (reference Y6: activity status monitoring). Zero deltas are
    dropped (the standard treatment); the z-score is left to the
    caller since n_up/n_down/n_runs determine it — every output is
    an exact integer, deterministic bytes by construction.

    100 TB: one corpus-scale shuffle (the daily count); both windows
    run over |days| rows — dimension-sized by construction (the
    single-partition window is over a ~3k-row table for a decade of
    days). No collect."""
    from pyspark.sql import Window

    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts").cast("timestamp"))
                 .cast("date").alias("day"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    w = Window.partitionBy(F.lit(1)).orderBy("day")
    signs = (
        daily.select("day", (F.col("c") - F.lag("c").over(w)).alias("d"))
        .filter(F.col("d").isNotNull() & (F.col("d") != 0))
        .select("day", F.when(F.col("d") > 0, 1).otherwise(-1)
                .alias("sgn"))
    )
    runs = signs.select(
        "sgn",
        F.when(F.lag("sgn").over(w).isNull()
               | (F.lag("sgn").over(w) != F.col("sgn")), 1)
        .otherwise(0).alias("new_run"))
    return runs.agg(
        F.count("*").cast("bigint").alias("n_moves"),
        F.sum(F.when(F.col("sgn") == 1, 1).otherwise(0))
        .cast("bigint").alias("n_up"),
        F.sum(F.when(F.col("sgn") == -1, 1).otherwise(0))
        .cast("bigint").alias("n_down"),
        F.sum("new_run").cast("bigint").alias("n_runs"))


@query(
    "tj_classical_decomposition",
    survey=("Y6", "A2", "W2"),
    oracle=f"""
        WITH daily AS (
            SELECT CAST(date_trunc('day', {duck_ts()}) AS DATE) AS d,
                   CAST(sum(CAST(round(value * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1
        ),
        win AS (
            SELECT a.d AS d,
                   CAST(sum(b.cents) AS BIGINT) AS sum7,
                   CAST(count(*) AS BIGINT) AS n7
            FROM daily a
            JOIN daily b ON b.d BETWEEN a.d - 3 AND a.d + 3
            GROUP BY a.d
        ),
        det AS (
            SELECT w.d,
                   CAST(date_diff('day', DATE '2024-01-01', w.d) % 7
                        AS BIGINT) AS dow_idx,
                   7 * daily.cents - w.sum7 AS det_x7
            FROM win w JOIN daily ON daily.d = w.d
            WHERE w.n7 = 7
        )
        SELECT dow_idx,
               CAST(count(*) AS BIGINT) AS n_days,
               CAST(sum(det_x7) AS BIGINT) AS det_sum_x7,
               CAST(sum(det_x7) AS BIGINT)
                 / (7.0 * CAST(count(*) AS BIGINT)) AS seasonal
        FROM det GROUP BY dow_idx
    """,
)
def tj_classical_decomposition(spark, sf_dir):
    """CLASSICAL seasonal decomposition (moving-average method,
    period 7 — the textbook decompose() everyone runs before picking
    a forecaster; Holt/EWMA/seasonal-naive already exist here, the
    DECOMPOSITION step itself was the gap): trend = centered 7-day
    moving average of daily purchase cents, seasonal index = mean of
    the detrended series per day-of-week over FULL windows only.

    Exactness engineering: the centered MA is computed as SCATTER —
    each day explodes its 7 target anchors and one groupBy(anchor)
    sums them (an equi-join shuffle, never a partition-less global
    window: the 100 TB-honest shape, and at fixture scale the days
    frame is dimension-sized anyway). Everything stays x7-scaled
    int64 (detrended_x7 = 7*cents - sum7) so no division touches the
    data path; the reported ``seasonal`` is ONE identical two-op
    double chain (int / (7.0 * n)) over exact integer sums, the house
    ratio rule. Day-of-week is datediff-mod-7 from an explicit epoch
    — Spark's dayofweek() and DuckDB's dayofweek() disagree on
    numbering, so neither is used.

    100 TB: daily aggregate is map-side combined; the scatter
    multiplies the DAYS frame by 7 (dimension-sized), not the fact
    table; one join back on day; final groupBy has 7 groups."""
    ev = t(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.to_date(F.date_trunc("day",
                                       F.col("ts").cast("timestamp")))
                .alias("d"),
                F.round(F.col("value") * 100).cast("bigint")
                .alias("cents"))
        .groupBy("d").agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    return classical_decomposition(daily)


def classical_decomposition(daily: "DataFrame") -> "DataFrame":
    """Period-7 MA decomposition engine behind
    :func:`tj_classical_decomposition` — factored out (the scc_labels
    pattern) so tests can drive it with PLANTED series (a pure
    zero-mean weekly signal is recovered EXACTLY: cents = C + s[dow]
    with sum(s)=0 gives sum7 = 7C, det_x7 = 7*s, seasonal = s).
    ``daily`` is (d date, cents bigint), one row per day."""
    win = (
        daily.select(
            "cents",
            F.explode(F.sequence(F.lit(-3), F.lit(3))).alias("off"),
            F.col("d").alias("src"))
        .select(F.expr("date_add(src, off)").alias("d"), "cents")
        .groupBy("d")
        .agg(F.sum("cents").cast("bigint").alias("sum7"),
             F.count("*").cast("bigint").alias("n7"))
    )
    det = (
        win.filter(F.col("n7") == 7)
        .join(daily, "d")
        .select(
            (F.datediff(F.col("d"), F.lit("2024-01-01").cast("date"))
             % 7).cast("bigint").alias("dow_idx"),
            (7 * F.col("cents") - F.col("sum7")).alias("det_x7"))
    )
    return det.groupBy("dow_idx").agg(
        F.count("*").cast("bigint").alias("n_days"),
        F.sum("det_x7").cast("bigint").alias("det_sum_x7"),
        (F.sum("det_x7").cast("bigint")
         / (7.0 * F.count("*").cast("bigint"))).alias("seasonal"))
