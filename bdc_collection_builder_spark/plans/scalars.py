"""Scalar-function queries (SURVEY §2.8, X1-X21) and the event-window
queries that batch-mirror the streaming semantics (§2.9).

Scene identifiers are synthesized deterministically from order rows in
the Sentinel-2 naming grammar, then parsed back — exercising the same
split/regexp/date functions the reference applies to real scene ids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.functions.persist import tracked_persist
from bdc_collection_builder_spark.plans._util import duck_ts, t
from bdc_collection_builder_spark.plans.registry import query

_TS = duck_ts()

# Sentinel-2-style scene id synthesized from an order row; identical
# string grammar on both engines.
_SCENE_SQL = """
    SELECT o_orderkey,
           'S2A_MSIL1C_' || strftime(o_orderdate, '%Y%m%d') || 'T103021_N0204_R'
             || lpad(CAST(o_orderkey % 175 AS VARCHAR), 3, '0') || '_T'
             || lpad(CAST(o_custkey % 60 AS VARCHAR), 2, '0') || 'LLF_20240101T120000'
             AS scene_id
    FROM orders WHERE o_orderkey % 10 = 0
"""


def _scene_ids(spark, sf_dir):
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
    return orders.select(
        "o_orderkey",
        F.concat(
            F.lit("S2A_MSIL1C_"),
            F.date_format("o_orderdate", "yyyyMMdd"),
            F.lit("T103021_N0204_R"),
            F.lpad((F.col("o_orderkey") % 175).cast("string"), 3, "0"),
            F.lit("_T"),
            F.lpad((F.col("o_custkey") % 60).cast("string"), 2, "0"),
            F.lit("LLF_20240101T120000"),
        ).alias("scene_id"),
    )


@query(
    "x01_scene_id_parsing",
    survey=("X1", "X3"),
    oracle=f"""
        WITH scenes AS ({_SCENE_SQL})
        SELECT o_orderkey, scene_id,
               split_part(scene_id, '_', 6) AS tile,
               strftime(strptime(substr(split_part(scene_id, '_', 3), 1, 8),
                                 '%Y%m%d'), '%Y-%m-%d') AS sensing_date,
               starts_with(scene_id, 'S2') AS is_sentinel2
        FROM scenes
    """,
)
def x01_scene_id_parsing(spark, sf_dir):
    """X1 — scene-id fragment parsing (tasks.py:283-285,
    publish.py:284-291): tile = frag[5], sensing date = frag[2]."""
    from bdc_collection_builder_spark.functions.scalar import (
        scene_sensing_date,
        scene_tile,
    )

    scenes = _scene_ids(spark, sf_dir)
    return scenes.select(
        "o_orderkey", "scene_id",
        scene_tile(F.col("scene_id")).alias("tile"),
        F.date_format(scene_sensing_date(F.col("scene_id")), "yyyy-MM-dd")
         .alias("sensing_date"),
        F.col("scene_id").startswith("S2").alias("is_sentinel2"),
    )


@query(
    "x02_output_name_rewrite",
    survey=("X2",),
    oracle=f"""
        WITH scenes AS ({_SCENE_SQL})
        SELECT o_orderkey,
               regexp_replace(scene_id, 'MSIL1C|MSIL2A', 'B04') AS band_file
        FROM scenes
    """,
)
def x02_output_name_rewrite(spark, sf_dir):
    """X2 — output-name pattern rewrite (publish.py:411-417):
    re.subn('(MSIL1C|MSIL2A)', band_name, name)."""
    scenes = _scene_ids(spark, sf_dir)
    return scenes.select(
        "o_orderkey",
        F.regexp_replace("scene_id", "MSIL1C|MSIL2A", "B04").alias("band_file"),
    )


@query(
    "x03_dispatch_predicates",
    survey=("X3",),
    oracle="""
        SELECT p_partkey,
               starts_with(p_type, 'PROMO') AS is_promo,
               p_type LIKE '%BRASS' AS is_brass,
               contains(p_name, 'green') AS has_green
        FROM part
    """,
)
def x03_dispatch_predicates(spark, sf_dir):
    """X3 — startswith/endswith/contains dispatch predicates
    (publish.py:262-297, tasks.py:268-271)."""
    part = t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_type").startswith("PROMO").alias("is_promo"),
        F.col("p_type").endswith("BRASS").alias("is_brass"),
        F.col("p_name").contains("green").alias("has_green"),
    )


@query(
    "x04_mime_guess",
    survey=("X4",),
    oracle="""
        WITH files AS (
            SELECT o_orderkey,
                   CASE o_orderkey % 4 WHEN 0 THEN 'scene.tif'
                        WHEN 1 THEN 'quick.png' WHEN 2 THEN 'meta.xml'
                        ELSE 'band.jp2' END AS filename
            FROM orders WHERE o_orderkey % 25 = 0
        )
        SELECT o_orderkey, filename,
               CASE WHEN filename LIKE '%.tif' THEN 'image/tiff; application=geotiff'
                    WHEN filename LIKE '%.png' THEN 'image/png'
                    WHEN filename LIKE '%.jp2' THEN 'image/jp2'
                    WHEN filename LIKE '%.xml' THEN 'application/xml'
                    ELSE 'application/octet-stream' END AS mime
        FROM files
    """,
)
def x04_mime_guess(spark, sf_dir):
    """X4 — extension → MIME lookup (publish.py:49-56)."""
    from bdc_collection_builder_spark.functions.scalar import guess_mime

    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 25 == 0)
    filename = (
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("scene.tif"))
        .when(F.col("o_orderkey") % 4 == 1, F.lit("quick.png"))
        .when(F.col("o_orderkey") % 4 == 2, F.lit("meta.xml"))
        .otherwise(F.lit("band.jp2"))
    )
    files = orders.select("o_orderkey", filename.alias("filename"))
    return files.withColumn("mime", guess_mime(F.col("filename")))


@query(
    "x05_period_generation",
    survey=("X5",),
    oracle="""
        WITH months AS (
            SELECT unnest(generate_series(
                DATE '1996-01-01', DATE '1996-12-01', INTERVAL 1 MONTH
            )) AS m
        )
        SELECT strftime(m, '%Y-%m-%d') AS period_start,
               strftime(last_day(CAST(m AS DATE)), '%Y-%m-%d') AS period_end
        FROM months
    """,
)
def x05_period_generation(spark, sf_dir):
    """X5 — month-aligned period generation (controller.py:45-68):
    sequence + last_day replaces the driver-side relativedelta loop."""
    from bdc_collection_builder_spark.functions.scalar import generate_month_periods

    bounds = spark.createDataFrame(
        [("1996-01-01 00:00:00", "1996-12-31 00:00:00")], "s string, e string"
    ).select(F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e"))
    periods = generate_month_periods(bounds, "s", "e")
    return periods.select(
        F.date_format("period_start", "yyyy-MM-dd").alias("period_start"),
        F.date_format("period_end", "yyyy-MM-dd").alias("period_end"),
    )


@query(
    "x06_composite_end_date",
    survey=("X6", "X7"),
    oracle="""
        SELECT o_orderkey,
               strftime(CAST(o_orderdate AS DATE) + 15,
                        '%Y-%m-%d') || ' 23:59:59' AS composite_end
        FROM orders WHERE o_orderkey % 50 = 0
    """,
)
def x06_composite_end_date(spark, sf_dir):
    """X6 — cube composite end = start + (step-1) days @ 23:59:59
    (publish.py:321-330)."""
    from bdc_collection_builder_spark.functions.scalar import composite_end

    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    return orders.select(
        "o_orderkey",
        F.date_format(composite_end(F.col("o_orderdate"), 16),
                      "yyyy-MM-dd HH:mm:ss").alias("composite_end"),
    )


@query(
    "x18_json_args_merge",
    survey=("X18", "X19"),
    oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
               'download' AS stage, 1 AS attempt
        FROM events
        WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
    """,
)
def x18_json_args_merge(spark, sf_dir):
    """X18/X19 — JSON args decode + shallow merge across task hops
    (tasks.py:86-89): from_json → map_concat → project merged fields.

    The merged args stay a MAP end to end: the old form re-encoded via
    merge_args (to_json) and re-parsed per consumer, and because the
    pushed-down filter and both projections each inlined the whole
    chain, every row paid 6 from_json + 2 to_json evaluations. The
    map-valued merge is the identical value (to_json∘from_json is the
    identity on map<string,string>), computed once per consumer group
    — 2 evaluations per row (the pushed-down filter still inlines the
    chain separately from the shared `m` projection, see the recorded
    after-plan), down from 8."""
    from bdc_collection_builder_spark.functions.scalar import merge_args_map

    events = t(spark, sf_dir, "events")
    merged = events.withColumn(
        "m", merge_args_map(F.col("props"),
                            {"stage": "download", "attempt": "1"}))
    return (
        merged.select(
            "event_id",
            F.col("m").getItem("k").cast("bigint").alias("k"),
            F.col("m").getItem("stage").alias("stage"),
            F.col("m").getItem("attempt").cast("int").alias("attempt"),
        )
        .filter(F.col("k") > 50)
    )


@query(
    "x20_asset_href_math",
    survey=("X20",),
    oracle=f"""
        WITH scenes AS ({_SCENE_SQL})
        SELECT o_orderkey,
               regexp_replace('/archive/repository/' || scene_id || '.zip',
                              '^/archive/repository/', 's3://bdc-data/')
                 AS href
        FROM scenes
    """,
)
def x20_asset_href_math(spark, sf_dir):
    """X20 — asset href prefix rewrite (publish.py:131-156)."""
    from bdc_collection_builder_spark.functions.scalar import relativize_href

    scenes = _scene_ids(spark, sf_dir)
    path = F.concat(F.lit("/archive/repository/"), F.col("scene_id"), F.lit(".zip"))
    return scenes.select(
        "o_orderkey",
        relativize_href(path, "/archive/repository/", "s3://bdc-data/").alias("href"),
    )


@query(
    "x21_collection_identifier",
    survey=("X21",),
    oracle="""
        SELECT n_nationkey, n_name || '-' || CAST(n_regionkey AS VARCHAR)
               AS identifier
        FROM nation
    """,
)
def x21_collection_identifier(spark, sf_dir):
    """X21 — '{name}-{version}' identifier build (controller.py:236-238)."""
    from bdc_collection_builder_spark.functions.scalar import collection_identifier

    nation = t(spark, sf_dir, "nation")
    return nation.select(
        "n_nationkey",
        collection_identifier(F.col("n_name"), F.col("n_regionkey")).alias("identifier"),
    )


# --- §2.9 streaming semantics, batch-mirrored on the events table --------

@query(
    "y01_tumbling_window",
    survey=("Y1",),
    oracle=f"""
        SELECT to_timestamp(CAST(floor(epoch({_TS}) / 600) * 600 AS BIGINT))
                 AT TIME ZONE 'UTC' AS window_start,
               event_type, count(*) AS n,
               round(sum(value), 2) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
)
def y01_tumbling_window(spark, sf_dir):
    """Y1 — 10-minute tumbling window aggregate: the batch shape of the
    per-stage queue throughput rollup. Uses the engine's native
    F.window; the oracle reproduces the epoch-aligned bucketing."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type", "n", "total_value",
        )
    )


@query(
    "y02_sliding_window",
    survey=("Y2",),
    oracle=f"""
        WITH shifted AS (
            SELECT {_TS} AS ts, value,
                   to_timestamp(CAST(floor(epoch({_TS}) / 300) * 300 AS BIGINT))
                     AT TIME ZONE 'UTC' - o * INTERVAL 5 MINUTE AS window_start
            FROM events, (VALUES (0), (1)) AS t(o)
        )
        SELECT window_start, count(*) AS n, round(sum(value), 2) AS total_value
        FROM shifted
        WHERE ts < window_start + INTERVAL 10 MINUTE
        GROUP BY window_start
    """,
)
def y02_sliding_window(spark, sf_dir):
    """Y2-adjacent — 10-minute window sliding by 5: each event lands in
    two windows (the retry-horizon rollup shape)."""
    events = t(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "n", "total_value")
    )


@query(
    "y05_session_window",
    survey=("Y5", "Y6"),
    oracle=f"""
        WITH norm AS (
            SELECT user_id, {_TS} AS ts FROM events
        ), flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             > INTERVAL 30 MINUTE
                        OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM norm
        ), numbered AS (
            SELECT user_id, ts,
                   CAST(sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS session_no
            FROM flagged
        )
        SELECT user_id, session_no, count(*) AS n_events,
               min(ts) AS session_start
        FROM numbered
        GROUP BY user_id, session_no
    """,
)
def y05_session_window(spark, sf_dir):
    """Sessionization with a 30-minute gap — lag + cumulative-sum
    (identical semantics to streaming session_window for batch data;
    the oracle uses the same formulation)."""
    from pyspark.sql import Window

    events = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    lagged = F.lag("ts").over(w)
    new_session = F.when(
        lagged.isNull()
        | (F.col("ts").cast("timestamp").cast("double")
           - lagged.cast("timestamp").cast("double") > 1800), 1
    ).otherwise(0)
    numbered = events.withColumn("new_session", new_session).withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy("user_id", "session_no")
        .agg(F.count("*").alias("n_events"), F.min("ts").alias("session_start"))
    )


@query(
    "x23_url_normalize",
    survey=("X2", "X20"),
    oracle="""
        WITH urls AS (
            SELECT doc_id,
                   concat('HTTPS://Example', CAST(doc_id % 7 AS VARCHAR),
                          '.COM:443/Docs/', CAST(doc_id AS VARCHAR),
                          '?z=1&a=', CAST(doc_id % 3 AS VARCHAR),
                          '&m=2#frag', CAST(doc_id AS VARCHAR)) AS url
            FROM documents
        )
        SELECT doc_id,
               concat(
                   lower(regexp_extract(url, '^([A-Za-z]+)://', 1)), '://',
                   lower(regexp_extract(url, '://([^/:?#]+)', 1)),
                   regexp_extract(url, '://[^/?#]+([^?#]*)', 1),
                   '?',
                   array_to_string(list_sort(string_split(
                       regexp_extract(url, '\\?([^#]*)', 1), '&')), '&')
               ) AS canonical_url
        FROM urls
    """,
)
def x23_url_normalize(spark, sf_dir):
    """URL canonicalization for web-corpus dedup: lowercase scheme and
    host, strip the default port and fragment, sort query parameters —
    so the same page fetched via trivially-different URLs collapses to
    one key before any content hashing. All string built-ins
    (regexp_extract + split/sort/join), zero shuffle, the narrow map
    stage that prefixes every URL-keyed dedup at any scale."""
    docs = t(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(
        F.lit("HTTPS://Example"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:443/Docs/"), F.col("doc_id").cast("string"),
        F.lit("?z=1&a="), (F.col("doc_id") % 3).cast("string"),
        F.lit("&m=2#frag"), F.col("doc_id").cast("string"))
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z]+)://", 1))
    host = F.lower(F.regexp_extract(url, r"://([^/:?#]+)", 1))
    path = F.regexp_extract(url, r"://[^/?#]+([^?#]*)", 1)
    qs = F.regexp_extract(url, r"\?([^#]*)", 1)
    canonical = F.concat(
        scheme, F.lit("://"), host, path, F.lit("?"),
        F.array_join(F.array_sort(F.split(qs, "&")), "&"))
    return docs.select("doc_id", canonical.alias("canonical_url"))


@query(
    "x24_fuzzy_id_match",
    survey=("X1", "F10"),
    oracle="""
        WITH ids AS (
            SELECT DISTINCT concat('S2A_', o_orderpriority, '_',
                            CAST(o_orderkey % 300 AS VARCHAR)) AS scene_id
            FROM orders
        ),
        bucketed AS (
            SELECT scene_id, substr(scene_id, 1, 6) AS bucket FROM ids
        )
        SELECT a.scene_id AS id_a, b.scene_id AS id_b,
               CAST(levenshtein(a.scene_id, b.scene_id) AS INTEGER)
                   AS edit_dist
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND a.scene_id < b.scene_id
        WHERE levenshtein(a.scene_id, b.scene_id) <= 2
    """,
)
def x24_fuzzy_id_match(spark, sf_dir):
    """Edit-distance identifier matching: near-identical scene ids
    (typos, re-processing suffixes) within Levenshtein distance 2 —
    the fuzzy-key reconciliation that exact F10 dedup can't see.
    Scale guard: candidates are PRE-BUCKETED on a shared prefix
    (an equi-join), so the quadratic edit-distance only runs inside
    buckets — the blocking-key pattern of record linkage; all-pairs
    levenshtein over a corpus is never planned. Both engines share the
    standard unit-cost Levenshtein definition as a built-in."""
    orders = t(spark, sf_dir, "orders")
    ids = orders.select(
        F.concat(F.lit("S2A_"), F.col("o_orderpriority"), F.lit("_"),
                 (F.col("o_orderkey") % 300).cast("string"))
        .alias("scene_id")).distinct()
    # the deduped id dimension (≤ #priorities × 300 rows) feeds both
    # self-join sides; unpersisted, the orders scan + distinct replays
    # twice (round's persist rule: tiny frame, corpus-scale producer)
    b = tracked_persist(
        ids.withColumn("bucket", F.substring("scene_id", 1, 6)))
    a_side = b.select(F.col("scene_id").alias("id_a"), "bucket")
    b_side = b.select(F.col("scene_id").alias("id_b"), "bucket")
    return (
        a_side.join(b_side, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_dist",
                    F.levenshtein("id_a", "id_b").cast("int"))
        .filter(F.col("edit_dist") <= 2)
        .select("id_a", "id_b", "edit_dist")
    )


@query(
    "x26_geohash_encode",
    survey=("X13", "J8"),
    oracle="""
        WITH pts AS (
            SELECT event_id,
                   CAST((event_id * 31) % 36000 AS DOUBLE) / 100 - 180
                       AS lon,
                   CAST((event_id * 17) % 18000 AS DOUBLE) / 100 - 90
                       AS lat
            FROM events
        ),
        quant AS (
            SELECT event_id,
                   CAST(floor((lon + 180) / 360 * 1048576) AS BIGINT)
                       AS ix,
                   CAST(floor((lat + 90) / 180 * 1048576) AS BIGINT)
                       AS iy
            FROM pts
        ),
        inter AS (
            SELECT event_id,
                   CAST((((ix >> 19) & 1) << 39) + (((iy >> 19) & 1) << 38) + (((ix >> 18) & 1) << 37) + (((iy >> 18) & 1) << 36) + (((ix >> 17) & 1) << 35) + (((iy >> 17) & 1) << 34) + (((ix >> 16) & 1) << 33) + (((iy >> 16) & 1) << 32) + (((ix >> 15) & 1) << 31) + (((iy >> 15) & 1) << 30) + (((ix >> 14) & 1) << 29) + (((iy >> 14) & 1) << 28) + (((ix >> 13) & 1) << 27) + (((iy >> 13) & 1) << 26) + (((ix >> 12) & 1) << 25) + (((iy >> 12) & 1) << 24) + (((ix >> 11) & 1) << 23) + (((iy >> 11) & 1) << 22) + (((ix >> 10) & 1) << 21) + (((iy >> 10) & 1) << 20) + (((ix >> 9) & 1) << 19) + (((iy >> 9) & 1) << 18) + (((ix >> 8) & 1) << 17) + (((iy >> 8) & 1) << 16) + (((ix >> 7) & 1) << 15) + (((iy >> 7) & 1) << 14) + (((ix >> 6) & 1) << 13) + (((iy >> 6) & 1) << 12) + (((ix >> 5) & 1) << 11) + (((iy >> 5) & 1) << 10) + (((ix >> 4) & 1) << 9) + (((iy >> 4) & 1) << 8) + (((ix >> 3) & 1) << 7) + (((iy >> 3) & 1) << 6) + (((ix >> 2) & 1) << 5) + (((iy >> 2) & 1) << 4) + (((ix >> 1) & 1) << 3) + (((iy >> 1) & 1) << 2) + (((ix >> 0) & 1) << 1) + (((iy >> 0) & 1) << 0) AS BIGINT) AS gh
            FROM (SELECT event_id,
                         least(ix, 1048575) AS ix,
                         least(iy, 1048575) AS iy FROM quant)
        ),
        encoded AS (
            SELECT event_id, substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> 35) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> 30) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> 25) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> 20) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> 15) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> 10) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> 5) & 31) AS INT) + 1, 1) || substr('0123456789bcdefghjkmnpqrstuvwxyz', CAST(((gh >> 0) & 31) AS INT) + 1, 1) AS geohash8 FROM inter
        )
        SELECT substr(geohash8, 1, 4) AS cell,
               CAST(count(*) AS BIGINT) AS n,
               min(geohash8) AS min_hash,
               max(geohash8) AS max_hash
        FROM encoded GROUP BY 1
    """,
)
def x26_geohash_encode(spark, sf_dir):
    """Geohash encoding (public base-32 bit-interleave scheme) as a
    PURE-INTEGER plan: quantize lon/lat to 2^20 cells, interleave the
    20+20 bits (even positions longitude, the standard layout), map
    5-bit groups onto the geohash alphabet — no trigonometry, no libm,
    no UDF; the whole encoder is one codegen'd integer expression, so
    both engines produce byte-identical strings. This is the
    cell-indexing primitive the spatial-join family (j10/j28) would
    use on real-world coordinates, and what the reference's tile-id
    parsing (x01) stands in for. Emitted as a 4-char-prefix histogram
    with min/max full hashes per cell (string-exact check).

    100 TB: encode is map-side; the histogram is one combine-friendly
    aggregate on a short string key."""
    pts = t(spark, sf_dir, "events").select(
        "event_id",
        (((F.col("event_id") * 31) % 36000).cast("double") / 100 - 180
         ).alias("lon"),
        (((F.col("event_id") * 17) % 18000).cast("double") / 100 - 90
         ).alias("lat"))
    quant = pts.select(
        "event_id",
        F.least(F.floor((F.col("lon") + 180) / 360 * 1048576)
                .cast("bigint"), F.lit(1048575)).alias("ix"),
        F.least(F.floor((F.col("lat") + 90) / 180 * 1048576)
                .cast("bigint"), F.lit(1048575)).alias("iy"))
    inter = quant.select(
        "event_id", F.expr("CAST(shiftleft((shiftright(ix, 19) & 1), 39) + shiftleft((shiftright(iy, 19) & 1), 38) + shiftleft((shiftright(ix, 18) & 1), 37) + shiftleft((shiftright(iy, 18) & 1), 36) + shiftleft((shiftright(ix, 17) & 1), 35) + shiftleft((shiftright(iy, 17) & 1), 34) + shiftleft((shiftright(ix, 16) & 1), 33) + shiftleft((shiftright(iy, 16) & 1), 32) + shiftleft((shiftright(ix, 15) & 1), 31) + shiftleft((shiftright(iy, 15) & 1), 30) + shiftleft((shiftright(ix, 14) & 1), 29) + shiftleft((shiftright(iy, 14) & 1), 28) + shiftleft((shiftright(ix, 13) & 1), 27) + shiftleft((shiftright(iy, 13) & 1), 26) + shiftleft((shiftright(ix, 12) & 1), 25) + shiftleft((shiftright(iy, 12) & 1), 24) + shiftleft((shiftright(ix, 11) & 1), 23) + shiftleft((shiftright(iy, 11) & 1), 22) + shiftleft((shiftright(ix, 10) & 1), 21) + shiftleft((shiftright(iy, 10) & 1), 20) + shiftleft((shiftright(ix, 9) & 1), 19) + shiftleft((shiftright(iy, 9) & 1), 18) + shiftleft((shiftright(ix, 8) & 1), 17) + shiftleft((shiftright(iy, 8) & 1), 16) + shiftleft((shiftright(ix, 7) & 1), 15) + shiftleft((shiftright(iy, 7) & 1), 14) + shiftleft((shiftright(ix, 6) & 1), 13) + shiftleft((shiftright(iy, 6) & 1), 12) + shiftleft((shiftright(ix, 5) & 1), 11) + shiftleft((shiftright(iy, 5) & 1), 10) + shiftleft((shiftright(ix, 4) & 1), 9) + shiftleft((shiftright(iy, 4) & 1), 8) + shiftleft((shiftright(ix, 3) & 1), 7) + shiftleft((shiftright(iy, 3) & 1), 6) + shiftleft((shiftright(ix, 2) & 1), 5) + shiftleft((shiftright(iy, 2) & 1), 4) + shiftleft((shiftright(ix, 1) & 1), 3) + shiftleft((shiftright(iy, 1) & 1), 2) + shiftleft((shiftright(ix, 0) & 1), 1) + shiftleft((shiftright(iy, 0) & 1), 0) AS BIGINT)").alias("gh"))
    encoded = inter.select(
        "event_id",
        F.expr("concat(substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((shiftright(gh, 35) & 31) AS INT) + 1, 1), substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((shiftright(gh, 30) & 31) AS INT) + 1, 1), substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((shiftright(gh, 25) & 31) AS INT) + 1, 1), substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((shiftright(gh, 20) & 31) AS INT) + 1, 1), substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((shiftright(gh, 15) & 31) AS INT) + 1, 1), substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((shiftright(gh, 10) & 31) AS INT) + 1, 1), substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((shiftright(gh, 5) & 31) AS INT) + 1, 1), substring('0123456789bcdefghjkmnpqrstuvwxyz', CAST((shiftright(gh, 0) & 31) AS INT) + 1, 1))").alias("geohash8"))
    return encoded.groupBy(
        F.substring("geohash8", 1, 4).alias("cell")).agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("geohash8").alias("min_hash"),
        F.max("geohash8").alias("max_hash"))
