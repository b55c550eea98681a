"""Filter/predicate queries (SURVEY §2.2, F1-F11) over the test tables.

Each query re-expresses one reference predicate on the synthetic data:
``events.value`` stands in for cloud cover, customer keys derive scene
bounding boxes deterministically, orders are the activity/scene ledger.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.operators.filters import (
    bbox_intersects,
    cloud_cover_filter,
    temporal_overlap,
)
from bdc_collection_builder_spark.plans._util import duck_ts, t
from bdc_collection_builder_spark.plans.registry import query

_TS = duck_ts()


@query(
    "f01_cloud_cover_filter",
    survey=("F1",),
    oracle="""
        SELECT event_id, value AS cloud_cover
        FROM events WHERE value <= 50.0
    """,
)
def f01_cloud_cover_filter(spark, sf_dir):
    """F1 — cloud_cover <= threshold, pushed to the scan
    (controller.py:230-232)."""
    events = t(spark, sf_dir, "events").withColumnRenamed("value", "cloud_cover")
    return cloud_cover_filter(events, 50.0).select("event_id", "cloud_cover")


# Deterministic scene-bbox derivation shared by Spark and the oracle:
# integer arithmetic only, so both engines agree bit-for-bit.
_BBOX_SQL = """
    SELECT c_custkey,
           CAST((c_custkey * 7) % 340 AS DOUBLE) / 2.0 - 85.0 AS xmin,
           CAST((c_custkey * 13) % 160 AS DOUBLE) / 2.0 - 40.0 AS ymin,
           CAST((c_custkey * 7) % 340 AS DOUBLE) / 2.0 - 85.0
             + 3.0 + CAST(c_custkey % 5 AS DOUBLE) AS xmax,
           CAST((c_custkey * 13) % 160 AS DOUBLE) / 2.0 - 40.0
             + 2.0 + CAST(c_custkey % 3 AS DOUBLE) AS ymax
    FROM customer
"""


def _scene_bboxes(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    xmin = ((F.col("c_custkey") * 7) % 340).cast("double") / 2.0 - 85.0
    ymin = ((F.col("c_custkey") * 13) % 160).cast("double") / 2.0 - 40.0
    return c.select(
        "c_custkey",
        xmin.alias("xmin"),
        ymin.alias("ymin"),
        (xmin + 3.0 + (F.col("c_custkey") % 5).cast("double")).alias("xmax"),
        (ymin + 2.0 + (F.col("c_custkey") % 3).cast("double")).alias("ymax"),
    )


@query(
    "f02_bbox_intersects",
    survey=("F2", "X16"),
    oracle=f"""
        WITH scenes AS ({_BBOX_SQL})
        SELECT c_custkey, xmin, ymin, xmax, ymax
        FROM scenes
        WHERE NOT (xmax < -30.0 OR xmin > 10.0 OR ymax < -20.0 OR ymin > 10.0)
    """,
)
def f02_bbox_intersects(spark, sf_dir):
    """F2 — envelope-overlap predicate on bbox structs: the bbox-column
    form of ST_Intersects(ST_MakeEnvelope(w,s,e,n), geom)
    (controller.py:563-569)."""
    scenes = _scene_bboxes(spark, sf_dir)
    pred = bbox_intersects(
        -30.0, -20.0, 10.0, 10.0,
        F.col("xmin"), F.col("ymin"), F.col("xmax"), F.col("ymax"),
    )
    return scenes.filter(pred)


@query(
    "f03_temporal_overlap",
    survey=("F3",),
    oracle="""
        SELECT o_orderkey,
               o_orderdate AS start_date,
               o_orderdate + INTERVAL 30 DAY AS end_date
        FROM orders
        WHERE o_orderdate <= TIMESTAMP '1996-12-31 23:59:59'
          AND o_orderdate + INTERVAL 30 DAY >= TIMESTAMP '1996-01-01 00:00:00'
    """,
)
def f03_temporal_overlap(spark, sf_dir):
    """F3 — interval-overlap truth table (controller.py:571-575):
    3-way OR collapses to (start <= p_end) AND (end >= p_start)."""
    orders = t(spark, sf_dir, "orders")
    start = F.col("o_orderdate")
    end = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    return (
        orders
        .withColumn("start_date", start)
        .withColumn("end_date", end)
        .filter(temporal_overlap(
            F.col("start_date"), F.col("end_date"),
            "1996-01-01 00:00:00", "1996-12-31 23:59:59"))
        .select("o_orderkey", "start_date", "end_date")
    )


@query(
    "f04_restart_filters",
    survey=("F4",),
    oracle="""
        SELECT o_orderkey AS activity_id, o_custkey AS scene_key,
               o_orderstatus AS status, o_orderpriority AS activity_type
        FROM orders
        WHERE o_orderstatus = 'F'
          AND o_orderpriority IN ('1-URGENT', '2-HIGH')
          AND o_custkey % 7 = 0
    """,
)
def f04_restart_filters(spark, sf_dir):
    """F4 — activity-restart predicate set: equality + IN-list + key
    subset (controller.py:86-108)."""
    orders = t(spark, sf_dir, "orders")
    return (
        orders.filter(
            (F.col("o_orderstatus") == "F")
            & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
            & (F.col("o_custkey") % 7 == 0)
        )
        .select(
            F.col("o_orderkey").alias("activity_id"),
            F.col("o_custkey").alias("scene_key"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("activity_type"),
        )
    )


@query(
    "f05_activity_list_filters",
    survey=("F5",),
    oracle=f"""
        SELECT event_id, user_id, event_type, {_TS} AS ts
        FROM events
        WHERE event_type LIKE '%ick%'
          AND {_TS} BETWEEN TIMESTAMP '2024-01-05 00:00:00'
                        AND TIMESTAMP '2024-01-20 00:00:00'
    """,
)
def f05_activity_list_filters(spark, sf_dir):
    """F5 — contains() on type + BETWEEN on history.start
    (controller.py:406-420)."""
    events = t(spark, sf_dir, "events")
    return (
        events.filter(
            F.col("event_type").contains("ick")
            & F.col("ts").between("2024-01-05 00:00:00", "2024-01-20 00:00:00")
        )
        .select("event_id", "user_id", "event_type", "ts")
    )


@query(
    "f06_skip_published",
    survey=("F6", "J4"),
    oracle="""
        WITH candidates AS (
            SELECT DISTINCT o_custkey AS scene_key FROM orders
            WHERE o_orderstatus = 'O'
        ), published AS (
            SELECT DISTINCT o_custkey AS scene_key FROM orders
            WHERE o_orderstatus = 'F'
        )
        SELECT scene_key FROM candidates
        WHERE scene_key NOT IN (SELECT scene_key FROM published)
    """,
)
def f06_skip_published(spark, sf_dir):
    """F6/J4 — skip-already-published left-anti join
    (controller.py:298-316, 332-337)."""
    from bdc_collection_builder_spark.operators.joins import skip_published

    orders = t(spark, sf_dir, "orders")
    candidates = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("scene_key")).distinct()
    )
    published = orders.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("scene_key"))
    return skip_published(candidates, published, ["scene_key"])


_ASSET_BANDS = ["B04", "B08", "SCL", "thumbnail", "NDVI", "EVI", "Fmask4"]


def _scene_assets(spark, sf_dir):
    """Asset map exploded to (scene, band, href) rows — the DataFrame
    form of the published item assets JSON (publish.py:450-464)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    bands = F.array(*[F.lit(b) for b in _ASSET_BANDS])
    return (
        orders.select(
            F.col("o_orderkey").alias("scene"),
            F.explode(bands).alias("band"),
        )
        .withColumn("href", F.concat(
            F.lit("s3://scenes/"), F.col("scene"), F.lit("_"),
            F.col("band"), F.lit(".tif")))
    )


_ASSET_SQL = """
    SELECT o_orderkey AS scene, band,
           's3://scenes/' || o_orderkey || '_' || band || '.tif' AS href
    FROM orders, (
        VALUES ('B04'), ('B08'), ('SCL'), ('thumbnail'), ('NDVI'),
               ('EVI'), ('Fmask4')
    ) AS b(band)
    WHERE o_orderkey % 100 = 0
"""


@query(
    "f07_asset_projection",
    survey=("F7",),
    oracle=f"""
        WITH assets AS ({_ASSET_SQL})
        SELECT scene, band, href FROM assets
        WHERE lower(band) NOT IN ('thumbnail', 'ndvi', 'evi')
    """,
)
def f07_asset_projection(spark, sf_dir):
    """F7 — drop thumbnail/ndvi/evi assets before post-processing
    (tasks.py:411-419): explode the asset map, filter on key."""
    assets = _scene_assets(spark, sf_dir)
    return assets.filter(~F.lower(F.col("band")).isin("thumbnail", "ndvi", "evi"))


@query(
    "f09_value_clamp",
    survey=("F9", "X11"),
    oracle="""
        SELECT event_id,
               GREATEST(LEAST(value * 400.0 - 5000.0, 10000.0), -10000.0)
                 AS clamped
        FROM events
    """,
)
def f09_value_clamp(spark, sf_dir):
    """F9 — clamp expression output to the dtype range
    (index_generator.py:107-136)."""
    from bdc_collection_builder_spark.operators.filters import clamp

    events = t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        clamp(F.col("value") * 400.0 - 5000.0, -10000.0, 10000.0).alias("clamped"),
    )


@query(
    "f10_dedup_scenes",
    survey=("F10",),
    oracle="SELECT DISTINCT l_partkey AS scene_key FROM lineitem",
)
def f10_dedup_scenes(spark, sf_dir):
    """F10 — unique requested scenes (controller.py:266-268)."""
    from bdc_collection_builder_spark.operators.filters import dedup_scenes

    li = t(spark, sf_dir, "lineitem").withColumnRenamed("l_partkey", "scene_key")
    return dedup_scenes(li, ["scene_key"])


@query(
    "f11_cog_skip_predicate",
    survey=("F11",),
    oracle=f"""
        WITH assets AS ({_ASSET_SQL})
        SELECT scene, band,
               CASE WHEN band IN ('AOT', 'WVP', 'thumbnail') THEN FALSE
                    ELSE TRUE END AS generate_cog
        FROM assets
    """,
)
def f11_cog_skip_predicate(spark, sf_dir):
    """F11 — AOT/WVP/quicklook bands skip COG generation
    (publish.py:419-431)."""
    assets = _scene_assets(spark, sf_dir)
    return assets.select(
        "scene", "band",
        (~F.col("band").isin("AOT", "WVP", "thumbnail")).alias("generate_cog"),
    )


# --- X17: exact polygon ST_Intersects --------------------------------------

# Octagonal footprint offsets (unit shape scaled by per-scene r) and a
# concave 4-point star query polygon: star-arm gaps give cases where
# the envelope pre-filter says "maybe" but exact geometry says "no" —
# the false positives the old rectangle approximation could not reject.
# No trig anywhere: vertices come from literal offset tables so both
# engines run identical IEEE-double multiply/adds.
_OCTAGON = [(1.0, 0.0), (0.7, 0.7), (0.0, 1.0), (-0.7, 0.7),
            (-1.0, 0.0), (-0.7, -0.7), (0.0, -1.0), (0.7, -0.7)]
_STAR = [(35.0, 18.0), (29.0, 20.0), (27.0, 26.0), (25.0, 20.0),
         (19.0, 18.0), (25.0, 16.0), (27.0, 10.0), (29.0, 16.0)]


# CAST every literal to DOUBLE in the DuckDB fragments: DuckDB parses
# bare float literals as DECIMAL, and the predicates must run the same
# IEEE-754 double arithmetic as the Spark side to match bit-for-bit.
_FOOT_DUCK = "[" + ", ".join(
    f"{{'x': cx + r * CAST({ox!r} AS DOUBLE),"
    f" 'y': cy + r * CAST({oy!r} AS DOUBLE)}}"
    for ox, oy in _OCTAGON) + "]"

# (event_id, footprint) CTE body shared by every footprint oracle
FOOTPRINTS_SQL = f"""
    SELECT event_id, {_FOOT_DUCK} AS footprint FROM (
        SELECT event_id,
               CAST(event_id % 37 AS DOUBLE) * 1.5 AS cx,
               CAST((event_id // 37) % 29 AS DOUBLE) * 1.3 AS cy,
               0.8 + CAST(event_id % 5 AS DOUBLE) * 0.25 AS r
        FROM events WHERE event_id % 23 = 0
    )
"""


def event_footprints(spark, sf_dir):
    """(event_id, footprint) — deterministic octagonal scene footprints
    derived from the events table; the Spark twin of FOOTPRINTS_SQL."""
    events = t(spark, sf_dir, "events").filter(F.col("event_id") % 23 == 0)
    cx = (F.col("event_id") % 37).cast("double") * 1.5
    cy = (F.expr("event_id div 37") % 29).cast("double") * 1.3
    r = F.lit(0.8) + (F.col("event_id") % 5).cast("double") * 0.25
    foot = F.array(*[
        F.struct((cx + r * F.lit(ox)).alias("x"),
                 (cy + r * F.lit(oy)).alias("y"))
        for ox, oy in _OCTAGON])
    return events.select("event_id", foot.alias("footprint"))


def _x17_oracle() -> str:
    from bdc_collection_builder_spark.functions.geometry import (
        duck_envelopes_overlap,
        duck_polygon_intersects,
    )

    star = "[" + ", ".join(
        f"{{'x': CAST({x!r} AS DOUBLE), 'y': CAST({y!r} AS DOUBLE)}}"
        for x, y in _STAR) + "]"
    env = duck_envelopes_overlap("footprint", "qpoly")
    exact = duck_polygon_intersects("footprint", "qpoly")
    return f"""
        WITH polys AS (
            SELECT event_id, footprint, {star} AS qpoly
            FROM ({FOOTPRINTS_SQL})
        )
        SELECT event_id,
               {env} AS env_overlap,
               ({env} AND {exact}) AS intersects
        FROM polys
    """


@query(
    "x17_polygon_intersects",
    survey=("X17",),
    oracle=_x17_oracle(),
)
def x17_polygon_intersects(spark, sf_dir):
    """X17 — exact ST_Intersects on true polygons (reference PostGIS
    predicate, controller.py:565-569; footprint publish.py:591-593):
    synthetic octagonal scene footprints against a concave star query
    region. Envelope bbox check stays as the cheap first pass; the
    orientation-sign segment test + ray-casting containment runs only
    on envelope survivors. All of it is built-in higher-order
    functions inside whole-stage codegen — no UDF, no Python, no
    shuffle (map-only over the scan)."""
    from bdc_collection_builder_spark.functions.geometry import (
        _GEO_CACHE,
        cached_intersects_pred,
        envelopes_overlap,
    )

    qpoly = F.array(*[
        F.struct(F.lit(x).alias("x"), F.lit(y).alias("y")) for x, y in _STAR])
    df = event_footprints(spark, sf_dir).select(
        "event_id", "footprint", qpoly.alias("qpoly"))
    if "env:footprint:qpoly" not in _GEO_CACHE:
        _GEO_CACHE["env:footprint:qpoly"] = envelopes_overlap(
            F.col("footprint"), F.col("qpoly"))
    env = _GEO_CACHE["env:footprint:qpoly"]
    return df.select(
        "event_id",
        env.alias("env_overlap"),
        cached_intersects_pred("footprint", "qpoly").alias("intersects"),
    )


def _x17b_oracle() -> str:
    from bdc_collection_builder_spark.functions.geometry import (
        duck_polygon_area,
        duck_polygon_centroid,
        duck_polygon_geojson,
    )

    area = duck_polygon_area("footprint")
    cent = duck_polygon_centroid("footprint")
    gj = duck_polygon_geojson("footprint")
    # `+ 0.0` after every round(): DuckDB's round() preserves -0.0
    # where Spark's normalizes to +0.0 (round-3 driver hash fail —
    # equal under ==, unequal as IEEE bytes). -0.0 + 0.0 = +0.0, so
    # adding positive zero on BOTH engines makes the bytes identical.
    return f"""
        SELECT event_id,
               round({area}, 6) + 0.0 AS area,
               round(({cent}).x, 6) + 0.0 AS centroid_x,
               round(({cent}).y, 6) + 0.0 AS centroid_y,
               round(list_min(list_transform(footprint, v -> v.x)), 6) + 0.0
                 AS xmin,
               round(list_max(list_transform(footprint, v -> v.y)), 6) + 0.0
                 AS ymax,
               {gj} AS geojson
        FROM ({FOOTPRINTS_SQL})
    """


@query(
    "x17b_geometry_accessors",
    survey=("X17",),
    oracle=_x17b_oracle(),
)
def x17b_geometry_accessors(spark, sf_dir):
    """X17 accessor suite — the remaining PostGIS expressions the
    reference uses on footprints (controller.py:506-513, 651-661):
    ST_Area / ST_Centroid (shoelace fold), ST_Xmin/ST_Ymax (envelope
    fields), ST_AsGeoJSON (fixed %.4f formatting). Every accessor is a
    left-fold or transform over the vertex array inside whole-stage
    codegen; the DuckDB twin folds in the same order, and both engines
    add +0.0 after round() so signed zeros normalize identically
    (byte-checked by the strict gate, tests/test_oracle.py)."""
    from bdc_collection_builder_spark.functions.geometry import (
        polygon_area,
        polygon_centroid,
        polygon_geojson,
    )

    foot = event_footprints(spark, sf_dir)
    p = F.col("footprint")
    cent = polygon_centroid(p)
    xs = F.transform(p, lambda v: v.x)
    ys = F.transform(p, lambda v: v.y)
    # + 0.0 normalizes any signed zero to +0.0 on both engines (the
    # oracle adds the same); the driver hashes IEEE bytes, not values.
    z = F.lit(0.0)
    return foot.select(
        "event_id",
        (F.round(polygon_area(p), 6) + z).alias("area"),
        (F.round(cent.getField("x"), 6) + z).alias("centroid_x"),
        (F.round(cent.getField("y"), 6) + z).alias("centroid_y"),
        (F.round(F.array_min(xs), 6) + z).alias("xmin"),
        (F.round(F.array_max(ys), 6) + z).alias("ymax"),
        polygon_geojson(p).alias("geojson"),
    )
