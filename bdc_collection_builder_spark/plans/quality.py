"""Data-quality queries: one-pass table profiling and declarative
expectation checks — the validation stage every production pipeline
runs before publishing a batch (the reference validates per-file with
is_valid_compressed/BDCCatalog constraints, collection_builder
utils.py; here validation is set-level and declarative).

Both queries are single-scan: profiling fuses every column's
statistics into ONE aggregate (no per-column scans), expectations
evaluate all rules as conditional counts in ONE aggregate — at 100 TB
each costs exactly one pass over the table, combiner-friendly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.plans._util import duck_ts, t
from bdc_collection_builder_spark.plans.registry import query


@query(
    "dq_table_profile",
    survey=("A4", "A7", "A8"),
    oracle="""
        SELECT 'doc_id' AS column_name,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(count(doc_id) AS BIGINT) AS n_nonnull,
               CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
               CAST(min(doc_id) AS DOUBLE) AS min_val,
               CAST(max(doc_id) AS DOUBLE) AS max_val
        FROM documents
        UNION ALL
        SELECT 'n_chars', CAST(count(*) AS BIGINT),
               CAST(count(n_chars) AS BIGINT),
               CAST(count(DISTINCT n_chars) AS BIGINT),
               CAST(min(n_chars) AS DOUBLE), CAST(max(n_chars) AS DOUBLE)
        FROM documents
        UNION ALL
        SELECT 'lang', CAST(count(*) AS BIGINT),
               CAST(count(lang) AS BIGINT),
               CAST(count(DISTINCT lang) AS BIGINT),
               NULL, NULL
        FROM documents
        UNION ALL
        SELECT 'source', CAST(count(*) AS BIGINT),
               CAST(count(source) AS BIGINT),
               CAST(count(DISTINCT source) AS BIGINT),
               NULL, NULL
        FROM documents
    """,
)
def dq_table_profile(spark, sf_dir):
    """Column profile (rows / non-null / distinct / min / max per
    column) computed in ONE aggregate over ONE scan — the stats a
    cost-based planner or a data catalog publishes per table. The
    oracle spells it as four UNION'd per-column aggregates; the engine
    fuses them: Catalyst evaluates all 16 aggregate expressions in a
    single partial-agg pass, then a 1×16 row is unpivoted to the
    per-column layout with ``stack`` (map-only). Profiling a 100 TB
    table therefore costs the same scan a single count(*) does."""
    docs = t(spark, sf_dir, "documents")
    wide = docs.agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.count("doc_id").cast("bigint").alias("nn_doc_id"),
        F.countDistinct("doc_id").cast("bigint").alias("nd_doc_id"),
        F.min("doc_id").cast("double").alias("min_doc_id"),
        F.max("doc_id").cast("double").alias("max_doc_id"),
        F.count("n_chars").cast("bigint").alias("nn_n_chars"),
        F.countDistinct("n_chars").cast("bigint").alias("nd_n_chars"),
        F.min("n_chars").cast("double").alias("min_n_chars"),
        F.max("n_chars").cast("double").alias("max_n_chars"),
        F.count("lang").cast("bigint").alias("nn_lang"),
        F.countDistinct("lang").cast("bigint").alias("nd_lang"),
        F.count("source").cast("bigint").alias("nn_source"),
        F.countDistinct("source").cast("bigint").alias("nd_source"),
    )
    return wide.select(F.expr("""
        stack(4,
          'doc_id',  n_rows, nn_doc_id,  nd_doc_id,  min_doc_id,
                     max_doc_id,
          'n_chars', n_rows, nn_n_chars, nd_n_chars, min_n_chars,
                     max_n_chars,
          'lang',    n_rows, nn_lang,    nd_lang,    CAST(NULL AS DOUBLE),
                     CAST(NULL AS DOUBLE),
          'source',  n_rows, nn_source,  nd_source,  CAST(NULL AS DOUBLE),
                     CAST(NULL AS DOUBLE)
        ) AS (column_name, n_rows, n_nonnull, n_distinct, min_val, max_val)
    """))


@query(
    "dq_expectations",
    survey=("F1", "F9", "A7"),
    oracle="""
        SELECT 'doc_id_not_null' AS rule,
               CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_violations,
               CAST(count(*) AS BIGINT) AS n_checked
        FROM documents
        UNION ALL
        SELECT 'n_chars_positive',
               CAST(sum(CASE WHEN n_chars <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'lang_in_domain',
               CAST(sum(CASE WHEN lang NOT IN
                    ('en','de','es','fr','zh') THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'n_chars_matches_text',
               CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'doc_id_unique',
               CAST(count(*) - count(DISTINCT doc_id) AS BIGINT),
               CAST(count(*) AS BIGINT)
        FROM documents
    """,
)
def dq_expectations(spark, sf_dir):
    """Declarative expectation checks (not-null, range, domain,
    cross-column consistency, key uniqueness) — the publish gate the
    reference enforces row-by-row through SQLAlchemy constraints,
    evaluated here set-wide as conditional counts fused into ONE
    single-scan aggregate. Uniqueness rides the same pass as
    count(*) − count(distinct key). Violation ROW EXTRACTION (which
    rows broke the rule) is the same predicates in a filter — cheap
    because the expensive question (how many / which rules) was
    answered without a shuffle per rule."""
    docs = t(spark, sf_dir, "documents")
    n = F.count("*").cast("bigint")
    wide = docs.agg(
        n.alias("n_checked"),
        F.sum(F.col("doc_id").isNull().cast("int")).cast("bigint")
        .alias("v_notnull"),
        F.sum((F.col("n_chars") <= 0).cast("int")).cast("bigint")
        .alias("v_positive"),
        F.sum((~F.col("lang").isin("en", "de", "es", "fr", "zh"))
              .cast("int")).cast("bigint").alias("v_domain"),
        F.sum((F.col("n_chars") != F.length("text")).cast("int"))
        .cast("bigint").alias("v_consistent"),
        (F.count("*") - F.countDistinct("doc_id")).cast("bigint")
        .alias("v_unique"),
    )
    return wide.select(F.expr("""
        stack(5,
          'doc_id_not_null',      v_notnull,    n_checked,
          'n_chars_positive',     v_positive,   n_checked,
          'lang_in_domain',       v_domain,     n_checked,
          'n_chars_matches_text', v_consistent, n_checked,
          'doc_id_unique',        v_unique,     n_checked
        ) AS (rule, n_violations, n_checked)
    """))


@query(
    "dq_psi_drift",
    survey=("DQ-drift",),
    oracle="""
        WITH norm AS (
            SELECT event_type, value, event_id % 2 AS half FROM events
        ),
        bounds AS (
            SELECT event_type, min(value) AS mn,
                   CASE WHEN max(value) > min(value)
                        THEN max(value) - min(value)
                        ELSE CAST(1 AS DOUBLE) END AS span
            FROM norm GROUP BY event_type
        ),
        binned AS (
            SELECT n.event_type, n.half,
                   least(9, greatest(0, CAST(floor(
                       (n.value - b.mn) * CAST(10 AS DOUBLE) / b.span
                   ) AS BIGINT))) AS bin
            FROM norm n JOIN bounds b USING (event_type)
        ),
        counts AS (
            SELECT event_type, half, bin, CAST(count(*) AS BIGINT) AS c
            FROM binned GROUP BY 1, 2, 3
        ),
        dense AS (
            SELECT b.event_type, h.half, g.bin
            FROM bounds b,
                 (SELECT unnest([0, 1]) AS half) h,
                 (SELECT unnest(generate_series(0, 9)) AS bin) g
        ),
        filled AS (
            SELECT d.event_type, d.half, d.bin, COALESCE(c.c, 0) AS c
            FROM dense d LEFT JOIN counts c
              ON c.event_type = d.event_type AND c.half = d.half
             AND c.bin = d.bin
        ),
        tot AS (
            SELECT event_type, half, sum(c) AS t
            FROM filled GROUP BY 1, 2
        ),
        props AS (
            SELECT f.event_type, f.bin, f.half,
                   (f.c + CAST(0.5 AS DOUBLE))
                   / (t.t + CAST(5 AS DOUBLE)) AS prop
            FROM filled f JOIN tot t
              ON t.event_type = f.event_type AND t.half = f.half
        ),
        pq AS (
            SELECT event_type, bin,
                   max(CASE WHEN half = 0 THEN prop END) AS p,
                   max(CASE WHEN half = 1 THEN prop END) AS q
            FROM props GROUP BY 1, 2
        )
        SELECT event_type,
               round(sum((p - q) * ln(p / q)), 8) AS psi,
               round(sum(p * ln(p / q)), 8) AS kl_pq
        FROM pq GROUP BY event_type
    """,
)
def dq_psi_drift(spark, sf_dir):
    """Population-stability-index + KL drift between two halves of the
    event stream (even/odd event_id stands in for reference vs
    current snapshot) — the per-feature distribution-drift monitor a
    training pipeline runs before trusting a new data batch.

    Shape: per-type bounds (tiny dim, broadcast) → equi-width binning
    in codegen → count aggregate whose key space is |types|×2×10 —
    the one corpus-scale shuffle is map-side combined down to ≤20
    rows per type. Empty bins are densified from a generated (type ×
    half × bin) frame so the Laplace-smoothed proportions are defined
    everywhere; PSI/KL then reduce over the bounded bin dimension.
    Binning uses only exact min/max (no averages), so bucket edges
    are bit-identical across engines."""
    events = t(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("event_id") % 2).alias("half"))
    bounds = events.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.when(F.max("value") > F.min("value"),
               F.max("value") - F.min("value"))
        .otherwise(F.lit(1.0)).alias("span"))
    binned = events.join(F.broadcast(bounds), "event_type").select(
        "event_type", "half",
        F.least(F.lit(9), F.greatest(F.lit(0), F.floor(
            (F.col("value") - F.col("mn")) * F.lit(10.0) / F.col("span")
        ))).cast("bigint").alias("bin"))
    counts = binned.groupBy("event_type", "half", "bin").agg(
        F.count("*").alias("c"))
    dense = (
        bounds.select("event_type")
        .select("event_type", F.explode(F.array(
            F.lit(0).cast("bigint"), F.lit(1).cast("bigint"))).alias("half"))
        .select("event_type", "half",
                F.explode(F.sequence(F.lit(0).cast("bigint"),
                                     F.lit(9).cast("bigint"))).alias("bin"))
    )
    filled = (
        dense.join(counts, ["event_type", "half", "bin"], "left")
        .select("event_type", "half", "bin",
                F.coalesce("c", F.lit(0)).alias("c"))
    )
    tot = filled.groupBy("event_type", "half").agg(F.sum("c").alias("t"))
    props = filled.join(tot, ["event_type", "half"]).select(
        "event_type", "bin", "half",
        ((F.col("c") + F.lit(0.5)) / (F.col("t") + F.lit(5.0)))
        .alias("prop"))
    pq = props.groupBy("event_type", "bin").agg(
        F.max(F.when(F.col("half") == 0, F.col("prop"))).alias("p"),
        F.max(F.when(F.col("half") == 1, F.col("prop"))).alias("q"))
    return pq.groupBy("event_type").agg(
        F.round(F.sum((F.col("p") - F.col("q"))
                      * F.log(F.col("p") / F.col("q"))), 8).alias("psi"),
        F.round(F.sum(F.col("p") * F.log(F.col("p") / F.col("q"))), 8)
        .alias("kl_pq"))


@query(
    "dq_skew_profile",
    survey=("A8", "J6"),
    oracle="""
        WITH profiled AS (
            SELECT 'l_orderkey' AS key_col, l_orderkey AS k
            FROM lineitem
            UNION ALL
            SELECT 'l_partkey', l_partkey FROM lineitem
        ),
        per_key AS (
            SELECT key_col, k, CAST(count(*) AS BIGINT) AS cnt
            FROM profiled GROUP BY key_col, k
        )
        SELECT key_col,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(cnt) AS BIGINT) AS n_rows,
               CAST(max(cnt) AS BIGINT) AS max_cnt,
               round(CAST(sum(cnt) AS DOUBLE) / count(*), 4) AS avg_cnt,
               round(CAST(max(cnt) AS DOUBLE)
                     / (CAST(sum(cnt) AS DOUBLE) / count(*)), 4)
                   AS skew_ratio,
               CAST(least(32, CAST(ceil(
                   CAST(max(cnt) AS DOUBLE)
                   / (CAST(sum(cnt) AS DOUBLE) / count(*))) AS BIGINT))
                   AS INT) AS recommended_salts
        FROM per_key GROUP BY key_col
    """,
)
def dq_skew_profile(spark, sf_dir):
    """Join-key skew pre-flight: per candidate key, the distribution
    stats that decide the physical join strategy BEFORE a 100 TB
    shuffle is attempted — key count, hottest-key count, hot/average
    ratio, and the salt factor the salted-join operator
    (operators/skew.py) would need to level it (ceil of the ratio,
    capped). AQE's skew-join split handles sort-merge skew reactively;
    this profile is the proactive form for choosing broadcast vs salt
    vs plain hash up front, and it is ONE map-side-combined count per
    key column. All arithmetic is exact (no percentile sketches), so
    the oracle pins every number."""
    li = t(spark, sf_dir, "lineitem")

    def profile(key_col):
        per_key = li.groupBy(F.col(key_col).alias("k")).agg(
            F.count("*").alias("cnt"))
        avg_cnt = F.sum("cnt").cast("double") / F.count("*")
        ratio = F.max("cnt").cast("double") / avg_cnt
        return per_key.agg(
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("cnt").cast("bigint").alias("n_rows"),
            F.max("cnt").cast("bigint").alias("max_cnt"),
            F.round(avg_cnt, 4).alias("avg_cnt"),
            F.round(ratio, 4).alias("skew_ratio"),
            F.least(F.lit(32), F.ceil(ratio).cast("bigint"))
            .cast("int").alias("recommended_salts"),
        ).select(F.lit(key_col).alias("key_col"), "*")

    return profile("l_orderkey").unionByName(profile("l_partkey"))


_AN_WIN = 7      # trailing window (observed days, current row excluded)
_AN_MIN = 4      # min prior days before scoring
_AN_THRESH = 3.5  # Iglewicz-Hoaglin robust-z cutoff
_DTS = duck_ts()

# exact median of a small sorted DOUBLE list, identical arithmetic on
# both engines: odd -> middle element, even -> mean of the two middles
# (1-indexed element access in both Spark element_at and DuckDB lists)
_MED_SQL = """(CASE WHEN len({a}) % 2 = 1
         THEN {a}[(len({a}) + 1) // 2]
         ELSE ({a}[len({a}) // 2] + {a}[len({a}) // 2 + 1])
              / CAST(2 AS DOUBLE) END)"""


@query(
    "dq_volume_anomaly",
    survey=("DQ-profile", "Y6"),
    oracle=f"""
        WITH daily AS (
            SELECT event_type,
                   CAST(date_trunc('day', {_DTS}) AS DATE) AS day,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        framed AS (
            SELECT event_type, day, n_events,
                   list_sort(list(CAST(n_events AS DOUBLE)) OVER (
                       PARTITION BY event_type ORDER BY day
                       ROWS BETWEEN {_AN_WIN} PRECEDING
                                AND 1 PRECEDING)) AS w
            FROM daily
        ),
        med AS (
            SELECT event_type, day, n_events, w,
                   {_MED_SQL.format(a='w')} AS med
            FROM framed WHERE len(w) >= {_AN_MIN}
        ),
        mad AS (
            SELECT event_type, day, n_events, med,
                   {_MED_SQL.format(
                       a="list_sort(list_transform(w, v -> abs(v - med)))")}
                       AS mad
            FROM med
        )
        SELECT event_type, CAST(day AS VARCHAR) AS day, n_events,
               round(med, 4) AS trailing_median,
               round(mad, 4) AS trailing_mad,
               round(CASE WHEN mad = 0 THEN NULL
                     ELSE CAST(0.6745 AS DOUBLE) * (n_events - med) / mad
                     END, 4) AS robust_z,
               (CASE WHEN mad = 0 THEN n_events <> med
                     ELSE abs(CAST(0.6745 AS DOUBLE) * (n_events - med)
                              / mad) > CAST({_AN_THRESH} AS DOUBLE)
                END) AS is_anomaly
        FROM mad
    """,
)
def dq_volume_anomaly(spark, sf_dir):
    """Ingest-volume anomaly detection — the monitoring-tick
    counterpart to the static profilers (dq_table_profile / dq_psi):
    per event type, each day's event count is scored against the
    TRAILING 7-day window (current day excluded) with the
    robust z-score 0.6745·(x−median)/MAD and the standard
    Iglewicz-Hoaglin |z| > 3.5 cutoff — median/MAD because
    volume series have exactly the outliers a mean/stddev detector
    would absorb into its own baseline. A zero-MAD window (flat
    baseline) flags any deviation.

    Scale shape: ONE daily count aggregate over the stream, then a
    per-type ordered window whose state is a ≤7-element list
    — the median/MAD arithmetic runs as array HOFs on that bounded
    list, JVM-side, identical element-indexing math on both engines
    (no percentile_approx, whose sketch internals are
    engine-specific). Day counts are exact integers, so the medians
    are exact dyadic rationals and the scores hash-stable."""
    from pyspark.sql import Window

    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type",
                 F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-_AN_WIN, -1))
    framed = daily.withColumn(
        "w", F.array_sort(F.collect_list(
            F.col("n_events").cast("double")).over(w)))

    def med_of(arr):
        n = F.size(arr)
        odd = F.element_at(arr, ((n + 1) / 2).cast("int"))
        even = (F.element_at(arr, (n / 2).cast("int"))
                + F.element_at(arr, (n / 2 + 1).cast("int"))) / F.lit(2.0)
        return F.when(n % 2 == 1, odd).otherwise(even)

    med = (framed.filter(F.size("w") >= _AN_MIN)
           .withColumn("med", med_of(F.col("w"))))
    mad = med.withColumn(
        "mad", med_of(F.array_sort(F.transform(
            "w", lambda v: F.abs(v - F.col("med"))))))
    z = F.lit(0.6745) * (F.col("n_events") - F.col("med")) / F.col("mad")
    return mad.select(
        "event_type", F.col("day").cast("string").alias("day"), "n_events",
        F.round("med", 4).alias("trailing_median"),
        F.round("mad", 4).alias("trailing_mad"),
        F.round(F.when(F.col("mad") == 0, F.lit(None)).otherwise(z), 4)
        .alias("robust_z"),
        F.when(F.col("mad") == 0, F.col("n_events") != F.col("med"))
        .otherwise(F.abs(z) > _AN_THRESH).alias("is_anomaly"))


@query(
    "dq_ks_drift",
    survey=("DQ-drift",),
    oracle="""
        WITH ev AS (
            SELECT event_type, value, event_id % 2 AS half FROM events
        ),
        per_value AS (
            SELECT event_type, value,
                   CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS ca,
                   CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS cb
            FROM ev GROUP BY event_type, value
        ),
        totals AS (
            SELECT event_type, CAST(sum(ca) AS BIGINT) AS na,
                   CAST(sum(cb) AS BIGINT) AS nb
            FROM per_value GROUP BY event_type
        ),
        cdf AS (
            SELECT p.event_type,
                   sum(p.ca) OVER (PARTITION BY p.event_type
                                   ORDER BY p.value) AS cuma,
                   sum(p.cb) OVER (PARTITION BY p.event_type
                                   ORDER BY p.value) AS cumb,
                   t.na, t.nb
            FROM per_value p JOIN totals t USING (event_type)
        )
        SELECT event_type, any_value(na) AS n_a, any_value(nb) AS n_b,
               round(max(abs(CAST(cuma AS DOUBLE) / na
                             - CAST(cumb AS DOUBLE) / nb)), 6) AS ks_stat,
               round(max(abs(CAST(cuma AS DOUBLE) / na
                             - CAST(cumb AS DOUBLE) / nb))
                     * sqrt(CAST(any_value(na) AS DOUBLE)
                            * any_value(nb)
                            / (any_value(na) + any_value(nb))), 6)
                   AS ks_scaled
        FROM cdf GROUP BY event_type
    """,
)
def dq_ks_drift(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov drift test per event type — the
    nonparametric complement to dq_psi_drift's binned PSI/KL: PSI needs
    a bin design and goes blind to within-bin shifts; KS is the exact
    sup-distance between the two halves' empirical CDFs, with the
    scaled statistic D·sqrt(n_a·n_b/(n_a+n_b)) comparable against the
    standard Kolmogorov critical values (1.36 ≈ α=0.05).

    Exact and deterministic: per-(type, value) counts, one ordered
    cumulative-sum window per type (parallel across types), and a max
    aggregate — integer counts, order-free max, IEEE-exact sqrt, so
    the statistic hashes identically cross-engine. One corpus shuffle
    (the value-grouped count); the CDF walk runs on the distinct-value
    table, which is bounded by the value domain, not the event count.
    """
    from pyspark.sql import Window

    ev = t(spark, sf_dir, "events").select(
        "event_type", "value", (F.col("event_id") % 2).alias("half"))
    per_value = ev.groupBy("event_type", "value").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("bigint").alias("ca"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("bigint").alias("cb"))
    totals = per_value.groupBy("event_type").agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"))
    w = (Window.partitionBy("event_type").orderBy("value")
         .rowsBetween(Window.unboundedPreceding, 0))
    cdf = (
        per_value.join(F.broadcast(totals), "event_type")
        .select("event_type", "na", "nb",
                F.sum("ca").over(w).alias("cuma"),
                F.sum("cb").over(w).alias("cumb"))
    )
    diff = F.abs(F.col("cuma").cast("double") / F.col("na")
                 - F.col("cumb").cast("double") / F.col("nb"))
    return cdf.groupBy("event_type").agg(
        F.first("na").alias("n_a"), F.first("nb").alias("n_b"),
        F.round(F.max(diff), 6).alias("ks_stat"),
        F.round(
            F.max(diff) * F.sqrt(
                F.first("na").cast("double") * F.first("nb")
                / (F.first("na") + F.first("nb"))), 6).alias("ks_scaled"))


@query(
    "dq_referential_integrity",
    survey=("A7", "J4", "J6"),
    oracle="""
        SELECT 'orders.o_custkey->customer' AS fk_edge,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_orphans,
               CAST(count(DISTINCT CASE WHEN c_custkey IS NULL
                          THEN o_custkey END) AS BIGINT) AS n_orphan_keys
        FROM orders LEFT JOIN customer ON o_custkey = c_custkey
        UNION ALL
        SELECT 'lineitem.l_orderkey->orders',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(count(DISTINCT CASE WHEN o_orderkey IS NULL
                          THEN l_orderkey END) AS BIGINT)
        FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey
        UNION ALL
        SELECT 'lineitem.l_partkey->part',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN p_partkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(count(DISTINCT CASE WHEN p_partkey IS NULL
                          THEN l_partkey END) AS BIGINT)
        FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
        UNION ALL
        SELECT 'customer.c_nationkey->nation',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN n_nationkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(count(DISTINCT CASE WHEN n_nationkey IS NULL
                          THEN c_nationkey END) AS BIGINT)
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        UNION ALL
        SELECT 'events.user_id->customer',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT),
               CAST(count(DISTINCT CASE WHEN c_custkey IS NULL
                          THEN user_id END) AS BIGINT)
        FROM events LEFT JOIN customer ON user_id = c_custkey
    """,
)
def dq_referential_integrity(spark, sf_dir):
    """Referential-integrity audit: for five FK edges of the star
    schema (plus the events→customer edge, where orphans are
    expected — event streams outlive dimension snapshots), count rows,
    orphan rows, and distinct orphan keys. The reference enforces FKs
    row-at-a-time through SQLAlchemy constraints at INSERT time
    (bdc_collection_builder/models at db commit); a lakehouse has no
    enforced constraints, so this set-level audit IS the integrity
    check, run before publishing a batch.

    Scale: each edge is one left join whose dimension side is
    broadcast when small (customer/part/nation at any realistic dim
    scale); the orphan metrics fold into one aggregate per edge, so
    the total cost is one scan per fact table edge — and the two
    lineitem edges could share a scan under Spark's cache if desired.
    No shuffle carries more than #distinct-keys rows."""
    def edge(fact, fk, dim, pk, label, broadcast_dim=True):
        d = dim.select(pk).withColumnRenamed(pk, "__pk")
        if broadcast_dim:
            d = F.broadcast(d)
        joined = fact.select(F.col(fk).alias("__fk")).join(
            d, F.col("__fk") == F.col("__pk"), "left")
        return joined.agg(
            F.lit(label).alias("fk_edge"),
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("__pk").isNull(), 1).otherwise(0))
             .cast("bigint").alias("n_orphans"),
            F.countDistinct(
                F.when(F.col("__pk").isNull(), F.col("__fk")))
             .cast("bigint").alias("n_orphan_keys"),
        ).select("fk_edge", "n_rows", "n_orphans", "n_orphan_keys")

    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    customer = t(spark, sf_dir, "customer")
    part = t(spark, sf_dir, "part")
    nation = t(spark, sf_dir, "nation")
    events = t(spark, sf_dir, "events")
    return (
        edge(orders, "o_custkey", customer, "c_custkey",
             "orders.o_custkey->customer")
        .unionAll(edge(li, "l_orderkey", orders, "o_orderkey",
                       "lineitem.l_orderkey->orders", broadcast_dim=False))
        .unionAll(edge(li, "l_partkey", part, "p_partkey",
                       "lineitem.l_partkey->part"))
        .unionAll(edge(customer, "c_nationkey", nation, "n_nationkey",
                       "customer.c_nationkey->nation"))
        .unionAll(edge(events, "user_id", customer, "c_custkey",
                       "events.user_id->customer"))
    )


@query(
    "dq_schema_drift",
    survey=("A4", "A7", "A8"),
    oracle="""
        SELECT
            CAST(sum(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_a,
            CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_rows_b,
            CAST(count(DISTINCT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                       THEN o_orderstatus END) AS BIGINT) AS nd_status_a,
            CAST(count(DISTINCT CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                       THEN o_orderstatus END) AS BIGINT) AS nd_status_b,
            CAST(count(DISTINCT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                       THEN o_orderpriority END) AS BIGINT) AS nd_priority_a,
            CAST(count(DISTINCT CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                       THEN o_orderpriority END) AS BIGINT) AS nd_priority_b,
            CAST(count(DISTINCT CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                       THEN o_custkey END) AS BIGINT) AS nd_custkey_a,
            CAST(count(DISTINCT CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                       THEN o_custkey END) AS BIGINT) AS nd_custkey_b,
            round(min(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                      THEN o_totalprice END), 2) AS min_price_a,
            round(min(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                      THEN o_totalprice END), 2) AS min_price_b,
            round(max(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                      THEN o_totalprice END), 2) AS max_price_a,
            round(max(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                      THEN o_totalprice END), 2) AS max_price_b
        FROM orders
    """,
)
def dq_schema_drift(spark, sf_dir):
    """Snapshot-drift audit: profile two temporal halves of `orders`
    (pre/post 1996) — row counts, categorical domain sizes, key
    cardinality, price ranges — side by side in ONE conditional
    aggregate over ONE scan, no join or pivot at all. This is the
    "did the upstream writer change what it emits?" check a
    production ingest runs between batches; the reference has no
    equivalent (schema is frozen by SQLAlchemy models), which is
    exactly why a schema-on-read lakehouse needs it.

    Scale: one scan, one partial-agg-friendly aggregate. Metrics are
    counts and exact min/max — no order-dependent float sums — so the
    cross-engine comparison is byte-stable by construction."""
    is_a = F.col("o_orderdate") < "1996-01-01"
    orders = t(spark, sf_dir, "orders")

    def side(suffix, cond):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")
             .alias(f"n_rows_{suffix}"),
            F.countDistinct(F.when(cond, F.col("o_orderstatus")))
             .cast("bigint").alias(f"nd_status_{suffix}"),
            F.countDistinct(F.when(cond, F.col("o_orderpriority")))
             .cast("bigint").alias(f"nd_priority_{suffix}"),
            F.countDistinct(F.when(cond, F.col("o_custkey")))
             .cast("bigint").alias(f"nd_custkey_{suffix}"),
            F.round(F.min(F.when(cond, F.col("o_totalprice"))), 2)
             .alias(f"min_price_{suffix}"),
            F.round(F.max(F.when(cond, F.col("o_totalprice"))), 2)
             .alias(f"max_price_{suffix}"),
        ]

    agg = orders.agg(*(side("a", is_a) + side("b", ~is_a)))
    return agg.select(
        "n_rows_a", "n_rows_b", "nd_status_a", "nd_status_b",
        "nd_priority_a", "nd_priority_b", "nd_custkey_a", "nd_custkey_b",
        "min_price_a", "min_price_b", "max_price_a", "max_price_b")


# Benford first-digit probabilities as FIXED literals (log10(1+1/d) to
# 12 dp) — no cross-engine libm reliance (the cu_epoch_repeat_plan
# decay-table recipe).
_BENFORD = {
    1: 0.301029995664, 2: 0.176091259056, 3: 0.124938736608,
    4: 0.096910013008, 5: 0.079181246048, 6: 0.066946789631,
    7: 0.057991946978, 8: 0.051152522447, 9: 0.045757490561,
}
_BENFORD_SQL = "CASE d " + " ".join(
    f"WHEN {d} THEN {p!r}" for d, p in _BENFORD.items()) + " END"


@query(
    "dq_benford_anomaly",
    survey=("DQ-profile", "A8"),
    oracle=f"""
        WITH digits AS (
            SELECT o_orderpriority AS grp,
                   CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                    AS VARCHAR), 1, 1) AS INT) AS d
            FROM orders WHERE o_totalprice >= 1.0
        ),
        counts AS (
            SELECT grp, d, CAST(count(*) AS BIGINT) AS obs
            FROM digits GROUP BY grp, d
        ),
        totals AS (
            SELECT grp, CAST(sum(obs) AS BIGINT) AS n FROM counts GROUP BY grp
        )
        SELECT c.grp, CAST(count(*) AS BIGINT) AS n_digits_seen,
               t.n AS n_values,
               round(sum(
                   (c.obs - t.n * ({_BENFORD_SQL}))
                   * (c.obs - t.n * ({_BENFORD_SQL}))
                   / (t.n * ({_BENFORD_SQL}))
               ), 6) + 0.0 AS chi2
        FROM counts c JOIN totals t ON t.grp = c.grp
        GROUP BY c.grp, t.n
    """,
)
def dq_benford_anomaly(spark, sf_dir):
    """Benford's-law first-digit audit per order priority: fabricated
    or unit-mangled monetary batches show up as a first-digit
    distribution that rejects Benford under χ² — the classic
    forensic-accounting data-quality screen. Expected frequencies are
    FIXED 12-dp literals (no engine log10), so the χ² arithmetic tree
    is bit-identical cross-engine.

    Scale: digit extraction is per-row string arithmetic in codegen;
    then ONE (group, digit) count aggregate — the χ² is computed on
    the ≤9-row-per-group histogram, never on the raw data. The
    floating sum folds ≤9 values per group in digit order (groupBy
    output joined and summed per group — at 9 values, DuckDB and
    Spark sum in ascending-digit order deterministically via the
    sort below)."""
    from pyspark.sql import Window

    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1.0)
    digits = orders.select(
        F.col("o_orderpriority").alias("grp"),
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"),
                    1, 1).cast("int").alias("d"))
    counts = digits.groupBy("grp", "d").agg(
        F.count("*").cast("bigint").alias("obs"))
    totals = counts.groupBy("grp").agg(
        F.sum("obs").cast("bigint").alias("n"))
    exp_p = F.create_map(*[F.lit(x) for kv in _BENFORD.items()
                           for x in kv])[F.col("d")]
    term = ((F.col("obs") - F.col("n") * exp_p)
            * (F.col("obs") - F.col("n") * exp_p)
            / (F.col("n") * exp_p))
    # Deterministic fold order for the <=9-term double sum: collect
    # the per-digit terms sorted by digit and fold sequentially —
    # same order DuckDB's sum sees after its group sort at this size
    # is NOT guaranteed, so both engines get an explicit order: the
    # oracle's sum feeds from a (grp, d)-grouped scan that DuckDB
    # evaluates in d order per group at this cardinality; the Spark
    # side pins it with a sorted-array fold.
    per_digit = counts.join(F.broadcast(totals), "grp").select(
        "grp", "n", "d", term.alias("chi_term"))
    arr = per_digit.groupBy("grp", "n").agg(
        F.count("*").cast("bigint").alias("n_digits_seen"),
        F.array_sort(F.collect_list(F.struct("d", "chi_term"))).alias("ts"))
    return arr.select(
        "grp", "n_digits_seen", F.col("n").alias("n_values"),
        (F.round(F.expr(
            "aggregate(ts, CAST(0.0 AS DOUBLE), (a, x) -> a + x.chi_term)"
        ), 6) + F.lit(0.0)).alias("chi2"))


@query(
    "dq_gini_concentration",
    survey=("A8", "J6", "W3"),
    oracle="""
        WITH rev AS (
            SELECT l_suppkey,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * (100 - CAST(round(l_discount * 100) AS BIGINT)))
                        AS BIGINT) AS x
            FROM lineitem GROUP BY 1
        ),
        ranked AS (
            SELECT n_name, x,
                   row_number() OVER (
                       PARTITION BY n_name ORDER BY x, l_suppkey) AS i
            FROM rev
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation   ON n_nationkey = s_nationkey
        )
        SELECT n_name,
               CAST(count(*) AS BIGINT) AS n_suppliers,
               CAST(sum(x) AS DOUBLE) / 10000 AS total_revenue,
               CAST(2 * CAST(sum(i * x) AS BIGINT)
                    - (count(*) + 1) * CAST(sum(x) AS BIGINT) AS DOUBLE)
                 / (count(*) * CAST(sum(x) AS BIGINT)) AS gini
        FROM ranked
        GROUP BY n_name
    """,
)
def dq_gini_concentration(spark, sf_dir):
    """Gini coefficient of shipped-revenue concentration across the
    suppliers of each nation — the inequality audit a pipeline runs
    on source contributions (is 1% of providers supplying 90% of the
    corpus?); the reference eyeballs the same from its per-provider
    download totals (cli.py provider report). Uses the exact
    rank-weighted identity G = (2*sum(i*x_i) - (n+1)*sum(x)) /
    (n*sum(x)) over ascending-sorted values: every term is int64
    (revenue in exact ten-thousandths, rank from a deterministic
    (value, suppkey) sort), so the only float op is the final
    division — byte-identical cross-engine, ties resolved identically
    by the total sort key.

    100 TB: one fact shuffle for the per-supplier aggregate, then the
    rank window and the closing aggregate run on |suppliers| rows
    partitioned by nation — no global sort, no all-pairs |x_i - x_j|
    formulation (the naive Gini is a self-join; the rank identity is
    one window)."""
    from pyspark.sql import Window

    li = t(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        (F.round(F.col("l_extendedprice") * 100).cast("bigint")
         * (100 - F.round(F.col("l_discount") * 100).cast("bigint"))
         ).alias("rev_tenk"))
    rev = li.groupBy("l_suppkey").agg(
        F.sum("rev_tenk").cast("bigint").alias("x"))
    supp = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    ranked = (
        rev.join(supp, rev["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(nation),
              supp["s_nationkey"] == nation["n_nationkey"])
        .withColumn("i", F.row_number().over(
            Window.partitionBy("n_name").orderBy("x", "l_suppkey")))
    )
    n = F.count("*")
    sx = F.sum("x").cast("bigint")
    six = F.sum(F.col("i") * F.col("x")).cast("bigint")
    return ranked.groupBy("n_name").agg(
        n.cast("bigint").alias("n_suppliers"),
        (sx.cast("double") / 10000).alias("total_revenue"),
        ((2 * six - (n + 1) * sx).cast("double")
         / (n * sx).cast("double")).alias("gini"))


@query(
    "dq_outlier_iqr",
    survey=("A8", "DQ-profile"),
    oracle=f"""
        WITH vals AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events
        ),
        ranked AS (
            SELECT event_type, cents,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY cents
                   ) AS rnk,
                   CAST(count(*) OVER (PARTITION BY event_type)
                        AS BIGINT) AS n
            FROM vals
        ),
        fences AS (
            SELECT event_type, any_value(n) AS n,
                   CAST(max(CASE WHEN rnk = (n - 1) // 4 + 1
                                 THEN cents END) AS BIGINT) AS q1,
                   CAST(max(CASE WHEN rnk = 3 * (n - 1) // 4 + 1
                                 THEN cents END) AS BIGINT) AS q3
            FROM ranked GROUP BY event_type
        )
        SELECT v.event_type, f.n,
               CAST(f.q1 AS DOUBLE) / 100 AS q1,
               CAST(f.q3 AS DOUBLE) / 100 AS q3,
               CAST(sum(CASE WHEN 4 * v.cents < 4 * f.q1 - 6 * (f.q3 - f.q1)
                              OR 4 * v.cents > 4 * f.q3 + 6 * (f.q3 - f.q1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM vals v JOIN fences f USING (event_type)
        GROUP BY v.event_type, f.n, f.q1, f.q3
    """,
)
def dq_outlier_iqr(spark, sf_dir):
    """Tukey-fence outlier audit per event type: values beyond
    [Q1 - 1.5*IQR, Q3 + 1.5*IQR] — the standard box-plot rule, made
    engine-exact by (a) defining the quartiles as EXPLICIT discrete
    picks (sorted rank floor(q*(n-1))+1, the same rule spelled out on
    both engines rather than trusting each engine's quantile_disc
    indexing), and (b) scaling the fence comparison by 4 so the
    1.5*IQR term stays integral — every comparison is int64 cents,
    no float fence ever computed. Complements cu_outlier_mad (median/
    MAD robust z) with the quartile formulation auditors expect.

    100 TB: one shuffle for the per-type rank window; the fence table
    is |types| rows and broadcasts back onto the value scan."""
    from pyspark.sql import Window

    vals = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"))
    wr = Window.partitionBy("event_type").orderBy("cents")
    wn = Window.partitionBy("event_type")
    ranked = vals.select(
        "event_type", "cents",
        F.row_number().over(wr).alias("rnk"),
        F.count("*").over(wn).cast("bigint").alias("n"))
    fences = (
        ranked.groupBy("event_type")
        .agg(F.first("n").alias("n"),
             F.max(F.when(
                 F.col("rnk") == F.floor((F.col("n") - 1) / 4) + 1,
                 F.col("cents"))).cast("bigint").alias("q1"),
             F.max(F.when(
                 F.col("rnk") == F.floor(3 * (F.col("n") - 1) / 4) + 1,
                 F.col("cents"))).cast("bigint").alias("q3"))
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = ((4 * F.col("cents") < 4 * F.col("q1") - 6 * iqr)
              | (4 * F.col("cents") > 4 * F.col("q3") + 6 * iqr))
    return (
        vals.join(F.broadcast(fences), "event_type")
        .groupBy("event_type", "n", "q1", "q3")
        .agg(F.sum(F.when(is_out, 1).otherwise(0)).cast("bigint")
             .alias("n_outliers"))
        .select("event_type", "n",
                (F.col("q1").cast("double") / 100).alias("q1"),
                (F.col("q3").cast("double") / 100).alias("q3"),
                "n_outliers")
    )


@query(
    "dq_cardinality_drift",
    survey=("DQ-profile", "A4"),
    oracle="""
        WITH halves AS (
            SELECT CASE WHEN o_orderkey % 2 = 0
                        THEN 'a' ELSE 'b' END AS half,
                   o_custkey, o_orderstatus, o_orderpriority
            FROM orders
        ),
        m AS (
            SELECT half,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS nd_cust,
                   CAST(count(DISTINCT o_orderstatus) AS BIGINT)
                       AS nd_status,
                   CAST(count(DISTINCT o_orderpriority) AS BIGINT)
                       AS nd_priority
            FROM halves GROUP BY half
        )
        SELECT a.n_rows AS rows_a, b.n_rows AS rows_b,
               a.nd_cust AS cust_a, b.nd_cust AS cust_b,
               CAST(b.nd_cust AS DOUBLE) / a.nd_cust AS cust_ratio,
               a.nd_status AS status_a, b.nd_status AS status_b,
               a.nd_priority AS priority_a, b.nd_priority AS priority_b
        FROM (SELECT * FROM m WHERE half = 'a') a,
             (SELECT * FROM m WHERE half = 'b') b
    """,
)
def dq_cardinality_drift(spark, sf_dir):
    """Cardinality-drift audit between two dataset slices (here the
    deterministic even/odd-key halves standing in for yesterday/today
    snapshots): exact distinct counts per key column on each side and
    their ratio — the first alarm for an upstream id-space change
    (a provider re-keying scenes, a join suddenly fanning out;
    complements dq_schema_drift's shape check and dq_psi/ks value
    drift with ID-SPACE drift). One grouped pass computes every
    column's exact distinct per slice (Spark expands multi-distinct
    aggregates internally); the ratio is one IEEE division of exact
    int64s.

    100 TB: swap count(DISTINCT) for approx_count_distinct / the HLL
    sketches (a18) at billion-key scale — same plan shape, bounded
    memory; the exact form is the audit-grade variant."""
    halves = t(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 2 == 0, "a").otherwise("b")
        .alias("half"),
        "o_custkey", "o_orderstatus", "o_orderpriority")
    m = halves.groupBy("half").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.countDistinct("o_custkey").cast("bigint").alias("nd_cust"),
        F.countDistinct("o_orderstatus").cast("bigint").alias("nd_status"),
        F.countDistinct("o_orderpriority").cast("bigint")
        .alias("nd_priority"))
    a = m.filter("half = 'a'").select(
        F.col("n_rows").alias("rows_a"), F.col("nd_cust").alias("cust_a"),
        F.col("nd_status").alias("status_a"),
        F.col("nd_priority").alias("priority_a"))
    b = m.filter("half = 'b'").select(
        F.col("n_rows").alias("rows_b"), F.col("nd_cust").alias("cust_b"),
        F.col("nd_status").alias("status_b"),
        F.col("nd_priority").alias("priority_b"))
    return a.join(F.broadcast(b)).select(
        "rows_a", "rows_b", "cust_a", "cust_b",
        (F.col("cust_b").cast("double") / F.col("cust_a"))
        .alias("cust_ratio"),
        "status_a", "status_b", "priority_a", "priority_b")


@query(
    "dq_k_anonymity",
    survey=("A2", "TX-quality"),
    oracle="""
        WITH classes AS (
            SELECT lang, source,
                   CAST(floor(n_chars / 100) AS BIGINT) AS size_bucket,
                   CAST(count(*) AS BIGINT) AS class_size
            FROM documents
            GROUP BY 1, 2, 3
        )
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(class_size) AS BIGINT) AS min_class_size,
               CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_classes_below_k,
               CAST(sum(CASE WHEN class_size < 5 THEN class_size
                        ELSE 0 END) AS BIGINT) AS n_docs_at_risk
        FROM classes
    """,
)
def dq_k_anonymity(spark, sf_dir):
    """k-anonymity audit (Sweeney 2002, public) over the documents
    table's quasi-identifier tuple (lang, source, length bucket): an
    equivalence class smaller than k=5 means those documents are
    re-identifiable by their metadata alone — the privacy gate a
    training-data release pipeline runs BEFORE publishing corpus
    metadata, complementing the PII content scan (tx_pii_scrub) with
    a structural check the content scan cannot see.

    Pure integer counting — one groupBy on the quasi-identifier
    tuple (map-side combined), one fused rollup aggregate over the
    class table. Deterministic bytes by construction.

    100 TB: the class table is bounded by the quasi-identifier
    cardinality (languages x sources x buckets), orders below the
    corpus; the only corpus-scale cost is the first combine."""
    classes = (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source",
                 F.floor(F.col("n_chars") / 100).cast("bigint")
                 .alias("size_bucket"))
        .agg(F.count("*").cast("bigint").alias("class_size"))
    )
    below = F.when(F.col("class_size") < 5, 1).otherwise(0)
    at_risk = F.when(F.col("class_size") < 5,
                     F.col("class_size")).otherwise(0)
    return classes.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
        F.sum(below).cast("bigint").alias("n_classes_below_k"),
        F.sum(at_risk).cast("bigint").alias("n_docs_at_risk"))


@query(
    "dq_l_diversity",
    survey=("A2", "TX-quality"),
    oracle="""
        WITH classes AS (
            SELECT source,
                   CAST(floor(n_chars / 100) AS BIGINT) AS size_bucket,
                   CAST(count(*) AS BIGINT) AS class_size,
                   CAST(count(DISTINCT lang) AS BIGINT) AS l_distinct
            FROM documents
            GROUP BY 1, 2
        )
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               CAST(min(l_distinct) AS BIGINT) AS min_l,
               CAST(sum(CASE WHEN l_distinct < 3 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_classes_below_l,
               CAST(sum(CASE WHEN l_distinct < 3 THEN class_size
                        ELSE 0 END) AS BIGINT) AS n_docs_at_risk
        FROM classes
    """,
)
def dq_l_diversity(spark, sf_dir):
    """l-diversity audit (Machanavajjhala et al. 2007, public) — the
    k-anonymity companion: an equivalence class over the
    quasi-identifier tuple (source, length bucket) may be LARGE (so
    k-anonymous) yet still leak its sensitive attribute if every
    member shares the same value. Here the sensitive attribute is
    ``lang``; a class with fewer than l=3 distinct languages lets an
    observer infer a member's language from its metadata. Pairs with
    dq_k_anonymity as the release-gate duo.

    One groupBy on the quasi-identifier with a count + exact
    count(DISTINCT lang) (Spark plans this as the standard two-phase
    expand-aggregate, still one logical shuffle family), one fused
    rollup over the dimension-sized class table. All-integer output —
    deterministic bytes by construction.

    100 TB: the distinct-count expansion is bounded by
    |classes| x |langs| (both dimension-sized), orders below the
    corpus; the only corpus-scale cost is the first combine."""
    classes = (
        t(spark, sf_dir, "documents")
        .groupBy("source",
                 F.floor(F.col("n_chars") / 100).cast("bigint")
                 .alias("size_bucket"))
        .agg(F.count("*").cast("bigint").alias("class_size"),
             F.countDistinct("lang").cast("bigint").alias("l_distinct"))
    )
    below = F.when(F.col("l_distinct") < 3, 1).otherwise(0)
    at_risk = F.when(F.col("l_distinct") < 3,
                     F.col("class_size")).otherwise(0)
    return classes.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.min("l_distinct").cast("bigint").alias("min_l"),
        F.sum(below).cast("bigint").alias("n_classes_below_l"),
        F.sum(at_risk).cast("bigint").alias("n_docs_at_risk"))


@query(
    "dq_mutual_information",
    survey=("A2", "TX-quality"),
    oracle="""
        WITH xy AS (
            SELECT lang, source, CAST(count(*) AS BIGINT) AS nxy
            FROM documents GROUP BY 1, 2
        ),
        x AS (SELECT lang, CAST(sum(nxy) AS BIGINT) AS nx
              FROM xy GROUP BY 1),
        y AS (SELECT source, CAST(sum(nxy) AS BIGINT) AS ny
              FROM xy GROUP BY 1),
        tot AS (SELECT CAST(sum(nxy) AS BIGINT) AS n FROM xy),
        mi AS (
            SELECT CAST(sum(xy.nxy * CAST(floor(ln(
                       CAST(xy.nxy * t.n AS DOUBLE)
                       / CAST(x.nx * y.ny AS DOUBLE)) * 10000000e0)
                   AS BIGINT)) AS BIGINT) AS s
            FROM xy
            JOIN x USING (lang) JOIN y USING (source)
            CROSS JOIN tot t
        ),
        hx AS (
            SELECT CAST(sum(x.nx * CAST(floor(ln(
                       CAST(x.nx AS DOUBLE) / t.n) * 10000000e0)
                   AS BIGINT)) AS BIGINT) AS s
            FROM x CROSS JOIN tot t
        ),
        hy AS (
            SELECT CAST(sum(y.ny * CAST(floor(ln(
                       CAST(y.ny AS DOUBLE) / t.n) * 10000000e0)
                   AS BIGINT)) AS BIGINT) AS s
            FROM y CROSS JOIN tot t
        )
        SELECT t.n AS n_total,
               round(CAST(mi.s AS DOUBLE) / (t.n * 10000000e0), 6)
                 AS mi_nats,
               round(-CAST(hx.s AS DOUBLE) / (t.n * 10000000e0), 6)
                 AS h_lang,
               round(-CAST(hy.s AS DOUBLE) / (t.n * 10000000e0), 6)
                 AS h_source,
               round((CAST(mi.s AS DOUBLE) / (t.n * 10000000e0))
                     / sqrt((-CAST(hx.s AS DOUBLE) / (t.n * 10000000e0))
                            * (-CAST(hy.s AS DOUBLE)
                               / (t.n * 10000000e0))), 6)
                 AS normalized_mi
        FROM tot t CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy
    """,
)
def dq_mutual_information(spark, sf_dir):
    """Mutual information between two categorical metadata columns
    (lang x source) in nats, plus both marginal entropies and the
    sqrt-normalized MI — the drift-and-leakage diagnostic: a source
    whose language distribution is far from the corpus marginal
    (high MI) is the feed to inspect before mixing, and a sudden MI
    jump between snapshots is a routing bug. Public formula
    (Shannon 1948); complements dq_psi_drift (one column over time)
    with a two-column association measure.

    Determinism contract (the tx_zipf_slope pattern): every ln() is
    computed per CLASS row from exact integer counts (the ratio is a
    division of int64 products, each < 2^53 so exactly representable)
    and quantized to int64 at 1e-7; the MI/entropy sums are then
    exact integer sums (order-free), and the final values are fixed
    scalar expressions over those integers — a 1-ulp libm
    disagreement moves the result by ~1e-8, below the 6-decimal
    round.

    100 TB: one map-side-combined groupBy on (lang, source); the
    marginals re-aggregate the CLASS table (dimension-sized, no
    second corpus scan); tot is a one-row broadcast attach."""
    xy = (
        t(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(F.count("*").cast("bigint").alias("nxy"))
    )
    from bdc_collection_builder_spark.functions.persist import (
        tracked_persist,
    )

    xy = tracked_persist(xy)  # reused by both marginals + the MI join
    x = xy.groupBy("lang").agg(F.sum("nxy").cast("bigint").alias("nx"))
    y = xy.groupBy("source").agg(F.sum("nxy").cast("bigint").alias("ny"))
    tot = xy.agg(F.sum("nxy").cast("bigint").alias("n"))
    scale = 10000000.0
    q_mi = F.floor(F.log(
        (F.col("nxy") * F.col("n")).cast("double")
        / (F.col("nx") * F.col("ny")).cast("double")) * scale) \
        .cast("bigint")
    mi = (
        xy.join(x, "lang").join(y, "source").join(F.broadcast(tot))
        .agg(F.sum(F.col("nxy") * q_mi).cast("bigint").alias("s_mi"))
    )
    q_hx = F.floor(F.log(F.col("nx").cast("double") / F.col("n"))
                   * scale).cast("bigint")
    hx = (x.join(F.broadcast(tot))
          .agg(F.sum(F.col("nx") * q_hx).cast("bigint").alias("s_hx")))
    q_hy = F.floor(F.log(F.col("ny").cast("double") / F.col("n"))
                   * scale).cast("bigint")
    hy = (y.join(F.broadcast(tot))
          .agg(F.sum(F.col("ny") * q_hy).cast("bigint").alias("s_hy")))
    denom = F.col("n").cast("double") * F.lit(scale)
    mi_v = F.col("s_mi").cast("double") / denom
    hx_v = -F.col("s_hx").cast("double") / denom
    hy_v = -F.col("s_hy").cast("double") / denom
    return (
        tot.join(F.broadcast(mi)).join(F.broadcast(hx))
        .join(F.broadcast(hy))
        .select(
            F.col("n").alias("n_total"),
            F.round(mi_v, 6).alias("mi_nats"),
            F.round(hx_v, 6).alias("h_lang"),
            F.round(hy_v, 6).alias("h_source"),
            F.round(mi_v / F.sqrt(hx_v * hy_v), 6)
            .alias("normalized_mi"))
    )


@query(
    "dq_t_closeness",
    survey=("A2", "TX-quality"),
    oracle="""
        WITH g AS (
            SELECT lang, CAST(count(*) AS HUGEINT) AS gl
            FROM documents GROUP BY lang
        ),
        tot AS (SELECT CAST(count(*) AS HUGEINT) AS nn FROM documents),
        cl AS (
            SELECT source, CAST(floor(n_chars / 100) AS BIGINT) AS b,
                   lang, CAST(count(*) AS HUGEINT) AS n
            FROM documents GROUP BY 1, 2, 3
        ),
        msize AS (
            SELECT source, b, CAST(sum(n) AS HUGEINT) AS m
            FROM cl GROUP BY 1, 2
        ),
        per AS (
            SELECT cl.source, cl.b,
                   sum(abs(cl.n * tot.nn - g.gl * msize.m))
                     + max(msize.m) * (max(tot.nn) - sum(g.gl)) AS s,
                   max(msize.m) AS m, max(tot.nn) AS nn
            FROM cl
            JOIN g USING (lang)
            JOIN msize ON msize.source = cl.source AND msize.b = cl.b,
            tot
            GROUP BY 1, 2
        )
        SELECT CAST(count(*) AS BIGINT) AS n_classes,
               CAST(sum(CASE WHEN s > m * nn THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_classes_above_t,
               CAST(sum(CASE WHEN s > m * nn THEN m ELSE 0 END)
                    AS BIGINT) AS n_docs_at_risk,
               CAST(max(floor(CAST(s AS DOUBLE) * 1000000e0
                              / (2e0 * CAST(m AS DOUBLE)
                                 * CAST(nn AS DOUBLE)))) AS BIGINT)
                 AS worst_tvd_ppm
        FROM per
    """,
)
def dq_t_closeness(spark, sf_dir):
    """t-closeness audit (Li, Li & Venkatasubramanian 2007, public) —
    the third member of the release-gate trio with dq_k_anonymity and
    dq_l_diversity: an equivalence class over the quasi-identifier
    (source, length bucket) may be large AND diverse yet still leak
    if its sensitive-attribute DISTRIBUTION (here ``lang``) deviates
    far from the corpus-wide one. Distance is total variation
    TVD = (1/2) sum_l |n_cl/m_c - g_l/N|; a class with TVD > t=1/2 is
    flagged.

    Exactness: clearing denominators gives
    S_c = sum_{l present} |n*N - g_l*m| + m*(N - sum_{l present} g_l)
    (the second term folds every ABSENT language's |0 - g_l*m| without
    generating absent combos), and ``TVD > 1/2  <=>  S > m*N`` — all
    integer. Products reach N^2 (~1e22 at 100 TB), so the Spark side
    carries decimal(38,0) matching DuckDB's hugeint; the reported
    worst-class ppm is one identical double chain over the exact
    integers on both engines.

    100 TB: one corpus-scale shuffle for the (class, lang) counts;
    everything after is dimension-sized (classes x langs), with the
    language marginals and class sizes attached by broadcast."""
    dec = "decimal(38,0)"
    docs = t(spark, sf_dir, "documents").select(
        "source",
        F.floor(F.col("n_chars") / 100).cast("bigint").alias("b"),
        "lang")
    cl = docs.groupBy("source", "b", "lang").agg(
        F.count("*").cast(dec).alias("n"))
    g = docs.groupBy("lang").agg(F.count("*").cast(dec).alias("gl"))
    tot = docs.agg(F.count("*").cast(dec).alias("nn"))
    msize = cl.groupBy("source", "b").agg(
        F.sum("n").cast(dec).alias("m"))
    j = (
        cl.join(F.broadcast(g), "lang")
        .join(F.broadcast(msize), ["source", "b"])
        .crossJoin(F.broadcast(tot))
    )
    per = j.groupBy("source", "b").agg(
        F.sum(F.abs(F.col("n") * F.col("nn") - F.col("gl") * F.col("m")))
        .alias("s1"),
        F.sum("gl").alias("sg"),
        F.max("m").alias("m"), F.max("nn").alias("nn"))
    per = per.withColumn(
        "s", F.col("s1") + F.col("m") * (F.col("nn") - F.col("sg")))
    above = F.col("s") > F.col("m") * F.col("nn")
    ppm = F.floor(F.col("s").cast("double") * F.lit(1000000.0)
                  / (F.lit(2.0) * F.col("m").cast("double")
                     * F.col("nn").cast("double")))
    return per.agg(
        F.count("*").cast("bigint").alias("n_classes"),
        F.sum(F.when(above, 1).otherwise(0)).cast("bigint")
        .alias("n_classes_above_t"),
        F.sum(F.when(above, F.col("m")).otherwise(F.lit(0).cast(dec)))
        .cast("bigint").alias("n_docs_at_risk"),
        F.max(ppm).cast("bigint").alias("worst_tvd_ppm"))


# -- differentially private release (deterministic discrete Laplace) -------

_DP_B = 20  # resolution: uniform ticks U in [0, 3 * 2^B)


def _dp_geometric_case(u: str) -> str:
    """Shared SQL (identical text on BOTH engines) mapping a uniform
    integer tick ``u`` in [0, 3*2^B) to a two-sided-geometric noise
    value with alpha = 1/2 (the DISCRETE Laplace mechanism of
    Ghosh/Roughgarden/Sundararajan 2009, epsilon = ln 2): P(0) = 1/3,
    P(+-k) = (1/3) * 2^-k. All cumulative thresholds are EXACT
    integers because the probabilities are dyadic rationals over the
    common denominator 3*2^B — no float, no ln(), no libm divergence
    anywhere (the house exactness rule for anything on the data
    path). The 2 leftover ticks of the truncated tail go to +-(B)
    deterministically."""
    lines, acc = [], 0
    acc += 1 << _DP_B
    lines.append(f"WHEN {u} < {acc} THEN 0")
    for k in range(1, _DP_B + 1):
        w = 1 << (_DP_B - k)
        acc += w
        lines.append(f"WHEN {u} < {acc} THEN {k}")
        acc += w
        lines.append(f"WHEN {u} < {acc} THEN {-k}")
    # acc == 3*2^B - 2 here; the final 2 ticks split symmetrically
    lines.append(f"WHEN {u} < {acc + 1} THEN {_DP_B}")
    return "CASE " + " ".join(lines) + f" ELSE {-_DP_B} END"


_DP_U = ("(CAST(concat('0x', substr(md5(concat('dp:', event_type)), "
         f"1, 15)) AS BIGINT) % {3 * (1 << _DP_B)})")


@query(
    "dq_dp_laplace_counts",
    survey=("DQ-privacy", "A1"),
    oracle=f"""
        WITH c AS (
            SELECT event_type, CAST(count(*) AS BIGINT) AS n_true
            FROM events GROUP BY event_type
        ),
        noised AS (
            SELECT event_type, n_true,
                   CAST({_dp_geometric_case(_DP_U)} AS BIGINT) AS z
            FROM c
        )
        SELECT event_type, n_true, z, n_true + z AS n_noisy
        FROM noised
    """,
)
def dq_dp_laplace_counts(spark, sf_dir):
    """Differentially private count release — per-event-type counts
    plus DISCRETE Laplace noise (two-sided geometric, alpha = 1/2 <=>
    epsilon = ln 2; Ghosh/Roughgarden/Sundararajan 2009, the
    utility-optimal mechanism for counting queries). The training-
    data pipeline needs this the moment corpus statistics leave the
    enclave (per-source doc counts, PII-hit counts): a DP release
    bounds what any one record reveals. The noise here is SEEDED
    (md5 of 'dp:'||key -> uniform tick -> exact integer inverse-CDF
    ladder over dyadic probabilities), so the mechanism is
    reproducible and BOTH engines compute bit-identical noise — the
    oracle value-checks the mechanism itself, not just the true
    counts. (A production release would draw the tick from a real
    RNG per release and drop n_true from the output; the mechanism,
    ladder, and post-processing are exactly this query. n_true rides
    along here so the oracle pins signal AND noise.) No ln(), no
    float: the geometric CDF's dyadic thresholds make the inverse
    transform pure integer comparison (the house no-libm rule).

    100 TB: ONE map-side-combined groupBy(event_type); the noise map
    is a constant 42-branch CASE over a dimension-sized frame."""
    from bdc_collection_builder_spark.extensions.dedup import md5_hash60

    c = (
        t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("n_true"))
    )
    # tick derivation differs in spelling only (Spark's conv() vs
    # DuckDB's 0x-cast — both are the house md5-60bit hash); the
    # inverse-CDF ladder below is the SAME generated SQL text on
    # both engines
    u = (md5_hash60(F.concat(F.lit("dp:"), F.col("event_type")))
         % (3 * (1 << _DP_B)))
    z = F.expr(f"CAST({_dp_geometric_case('u')} AS BIGINT)")
    return (
        c.withColumn("u", u)
        .withColumn("z", z)
        .select("event_type", "n_true", "z",
                (F.col("n_true") + F.col("z")).alias("n_noisy"))
    )
