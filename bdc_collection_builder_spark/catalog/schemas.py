"""Typed schemas for the catalog/ledger tables.

Mirrors the reference's PostgreSQL data model (SURVEY §1.1/§1.2):

- collections/bands: utils.py:578-611, examples/data/sentinel-2-l2a.json
- providers/collection_providers: models.py:131-193
- items: publish.py:575-603 (assets JSON, bbox, footprint WKT, srid)
- activities/activity_history/activity_src: models.py:37-128
- tasks (celery_taskmeta mirror): forms.py:37-44

Dynamic JSON parts (``args``, band ``metadata``) stay JSON strings —
open schema, parsed with ``from_json`` where needed (SURVEY §1.2).
Geometries are WKT strings + a bbox struct for cheap envelope
predicates (controller.py:563-569 semantics).
"""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMAS: dict[str, T.StructType] = {
    "collections": T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("version", T.IntegerType(), False),
        T.StructField("identifier", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("collection_type", T.StringType(), True),
        T.StructField("grid_ref_sys_id", T.IntegerType(), True),
        T.StructField("metadata", T.StringType(), True),
        T.StructField("temporal_composition_schema", T.StringType(), True),
        T.StructField("quicklook", T.StringType(), True),
        T.StructField("is_available", T.BooleanType(), True),
    ]),
    "bands": T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("collection_id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("common_name", T.StringType(), True),
        T.StructField("data_type", T.StringType(), True),
        T.StructField("nodata", T.DoubleType(), True),
        T.StructField("min_value", T.DoubleType(), True),
        T.StructField("max_value", T.DoubleType(), True),
        T.StructField("scale", T.DoubleType(), True),
        T.StructField("resolution_x", T.DoubleType(), True),
        T.StructField("resolution_y", T.DoubleType(), True),
        T.StructField("metadata", T.StringType(), True),
    ]),
    "providers": T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("driver_name", T.StringType(), True),
        T.StructField("credentials", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("description", T.StringType(), True),
    ]),
    "collection_providers": T.StructType([
        T.StructField("provider_id", T.IntegerType(), False),
        T.StructField("collection_id", T.IntegerType(), False),
        T.StructField("active", T.BooleanType(), False),
        T.StructField("priority", T.ShortType(), False),
    ]),
    "tiles": T.StructType([
        T.StructField("id", T.IntegerType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("grid_ref_sys_id", T.IntegerType(), True),
        T.StructField("xmin", T.DoubleType(), True),
        T.StructField("ymin", T.DoubleType(), True),
        T.StructField("xmax", T.DoubleType(), True),
        T.StructField("ymax", T.DoubleType(), True),
    ]),
    "items": T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("collection_id", T.IntegerType(), False),
        T.StructField("start_date", T.TimestampNTZType(), True),
        T.StructField("end_date", T.TimestampNTZType(), True),
        T.StructField("cloud_cover", T.DoubleType(), True),
        T.StructField("bbox_xmin", T.DoubleType(), True),
        T.StructField("bbox_ymin", T.DoubleType(), True),
        T.StructField("bbox_xmax", T.DoubleType(), True),
        T.StructField("bbox_ymax", T.DoubleType(), True),
        T.StructField("footprint_wkt", T.StringType(), True),
        T.StructField("srid", T.IntegerType(), True),
        T.StructField("tile_id", T.IntegerType(), True),
        T.StructField("provider_id", T.IntegerType(), True),
        T.StructField("assets", T.StringType(), True),
        T.StructField("is_available", T.BooleanType(), True),
        T.StructField("updated", T.TimestampNTZType(), True),
    ]),
    "activities": T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("collection_id", T.IntegerType(), False),
        T.StructField("activity_type", T.StringType(), False),
        T.StructField("sceneid", T.StringType(), False),
        T.StructField("scene_type", T.StringType(), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("args", T.StringType(), True),
        T.StructField("created", T.TimestampNTZType(), True),
        T.StructField("updated", T.TimestampNTZType(), True),
    ]),
    "activity_history": T.StructType([
        T.StructField("activity_id", T.LongType(), False),
        T.StructField("task_id", T.LongType(), False),
        T.StructField("start", T.TimestampNTZType(), True),
        T.StructField("env", T.StringType(), True),
    ]),
    "tasks": T.StructType([
        T.StructField("id", T.LongType(), False),
        T.StructField("task_id", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("date_done", T.TimestampNTZType(), True),
        T.StructField("traceback", T.StringType(), True),
    ]),
    "activity_src": T.StructType([
        T.StructField("activity_id", T.LongType(), False),
        T.StructField("activity_src_id", T.LongType(), False),
    ]),
}

# Upsert identity per table (reference unique constraints).
MERGE_KEYS: dict[str, list[str]] = {
    "items": ["name", "collection_id"],                        # publish.py:581-582
    "activities": ["collection_id", "activity_type", "sceneid"],  # models.py:60-63
    "providers": ["name"],                         # cli.py create-provider get_or_create
    "collection_providers": ["provider_id", "collection_id"],  # models.py PK
}
