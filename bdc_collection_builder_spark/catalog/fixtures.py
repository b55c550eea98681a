"""Deterministic domain fixtures mirroring the reference data model
(FIXTURES.md §2): Sentinel-2-style collections/bands (from
examples/data/sentinel-2-l2a.json), providers with priorities
(collect.py:140-169), tiles, published items, an activity ledger with
multi-attempt history (models.py:37-128), lineage edges, and a mock
remote-provider scene feed that partially overlaps the published items
(so skip-published and check-scenes set algebra are non-trivial).

Everything derives from integer formulas — regenerable anywhere,
no randomness.
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import DataFrame, SparkSession

from bdc_collection_builder_spark.catalog.schemas import SCHEMAS

EPOCH = dt.datetime(2024, 1, 1)

BAND_SPECS = [
    # name, common_name, data_type, nodata, min, max, scale, res
    ("B02", "blue", "int16", 0.0, 0.0, 10000.0, 0.0001, 10.0),
    ("B03", "green", "int16", 0.0, 0.0, 10000.0, 0.0001, 10.0),
    ("B04", "red", "int16", 0.0, 0.0, 10000.0, 0.0001, 10.0),
    ("B08", "nir", "int16", 0.0, 0.0, 10000.0, 0.0001, 10.0),
    ("B11", "swir16", "int16", 0.0, 0.0, 10000.0, 0.0001, 20.0),
    ("SCL", "quality", "uint8", 0.0, 0.0, 11.0, 1.0, 20.0),
    ("Fmask4", "quality", "uint8", 255.0, 0.0, 4.0, 1.0, 30.0),
    # Derived bands with runtime expressions (index_generator.py:75-77)
    ("NDVI", "ndvi", "int16", -9999.0, -10000.0, 10000.0, 0.0001, 10.0),
    ("EVI", "evi", "int16", -9999.0, -10000.0, 10000.0, 0.0001, 10.0),
]

EXPRESSIONS = {
    "NDVI": "10000. * ((B08 - B04) / (B08 + B04))",
    "EVI": "10000. * 2.5 * (B08 - B04) / (B08 + 6. * B04 - 7.5 * B02 + 10000.)",
}


def scene_name(collection: str, seq: int, tile: str, day: int) -> str:
    date = (EPOCH + dt.timedelta(days=day)).strftime("%Y%m%d")
    return (f"{collection}_MSIL2A_{date}T103021_N0510_R{seq % 175:03d}"
            f"_T{tile}_{date}T145523")


def make_fixtures(spark: SparkSession, n_scenes: int = 200,
                  n_tiles: int = 12) -> dict[str, DataFrame]:
    tiles = [f"{23 + i % 3}L{chr(ord('L') + i % 5)}{chr(ord('F') + i % 4)}"
             for i in range(n_tiles)]

    collections = [
        (1, "S2_L2A", 1, "S2_L2A-1", "Sentinel-2 L2A", "collection", 1,
         json.dumps({"processors": [{"name": "sen2cor"}]}), None,
         json.dumps({"red": 3, "green": 2, "blue": 1}), True),
        (2, "LC8_SR", 1, "LC8_SR-1", "Landsat-8 SR", "collection", 1,
         json.dumps({"processors": [{"name": "lasrc"}]}), None,
         json.dumps({"red": 3, "green": 2, "blue": 1}), True),
        (3, "S2-16D", 2, "S2-16D-2", "Sentinel-2 16-day cube", "cube", 2,
         None, json.dumps({"step": 16, "unit": "day"}), None, True),
    ]

    bands = []
    for cid in (1, 2):
        for i, (name, common, dtype, nodata, lo, hi, scale, res) in enumerate(BAND_SPECS):
            meta = (json.dumps({"expression": {"bands": ["B02", "B04", "B08"],
                                               "value": EXPRESSIONS[name]}})
                    if name in EXPRESSIONS else None)
            bands.append((cid * 100 + i, cid, name, common, dtype, nodata,
                          lo, hi, scale, res, res, meta))

    providers = [
        (1, "ESA-SciHub", "SciHub", json.dumps({"username": "u"}),
         "https://apihub.example", None),
        (2, "USGS", "USGS", json.dumps({"username": "u"}),
         "https://m2m.example", None),
        (3, "CREODIAS", "CREODIAS", None, "https://creodias.example", None),
        (4, "GCS", "Google", None, "https://storage.example", None),
    ]
    collection_providers = [
        (1, 1, True, 1), (3, 1, True, 2), (4, 1, False, 3),
        (2, 2, True, 1), (4, 2, True, 2),
    ]

    tile_rows = [
        (i + 1, t, 1,
         float(-60 + (i * 7) % 30), float(-20 + (i * 5) % 15),
         float(-60 + (i * 7) % 30 + 1.5), float(-20 + (i * 5) % 15 + 1.5))
        for i, t in enumerate(tiles)
    ]

    items, activities, history, task_rows, edges, remote = [], [], [], [], [], []
    activity_seq = 0
    task_seq = 0
    for i in range(n_scenes):
        cid = 1 if i % 3 else 2
        cname = "S2A" if cid == 1 else "LC08"
        tile_idx = i % n_tiles
        day = i % 90
        name = scene_name(cname, i, tiles[tile_idx], day)
        start = EPOCH + dt.timedelta(days=day, hours=10)
        published = i % 4 != 0      # 25% of scenes not yet published
        cloud = float((i * 37) % 101)
        tx, ty, txa, tya = tile_rows[tile_idx][3:7]
        if published:
            items.append((
                i + 1, name, cid, start, start, cloud,
                tx, ty, txa, tya,
                f"POLYGON(({tx} {ty},{txa} {ty},{txa} {tya},{tx} {tya},{tx} {ty}))",
                4326, tile_idx + 1, 1 + i % 2,
                json.dumps({
                    "B04": {"href": f"/data/{name}/B04.tif", "type": "image/tiff; application=geotiff"},
                    "B08": {"href": f"/data/{name}/B08.tif", "type": "image/tiff; application=geotiff"},
                    "thumbnail": {"href": f"/data/{name}/thumb.png", "type": "image/png"},
                    "Fmask4": {"href": f"/data/{name}/Fmask4.tif", "type": "image/tiff; application=geotiff"},
                }),
                True, start + dt.timedelta(days=1),
            ))
        # activity chain download -> publish (+post for published)
        chain = ["download", "publish"] + (["post"] if published else [])
        prev_id = None
        for stage in chain:
            activity_seq += 1
            aid = activity_seq
            activities.append((
                aid, cid, stage, name, "SCENE", ["fixture"],
                json.dumps({"cloud": cloud, "catalog": "fixture",
                            "dataset": "S2MSI2A" if cid == 1 else "LC08_SR"}),
                start, start,
            ))
            # 1-3 attempts; latest attempt fails for every 7th scene's
            # publish stage (drives J5/W2 non-trivially)
            n_attempts = 1 + (i + len(stage)) % 3
            for attempt in range(n_attempts):
                task_seq += 1
                latest = attempt == n_attempts - 1
                failed_latest = latest and stage == "publish" and i % 7 == 0
                status = ("FAILURE" if failed_latest
                          else ("SUCCESS" if latest else "RETRY"))
                task_rows.append((
                    task_seq, f"uuid-{task_seq:08d}", status,
                    start + dt.timedelta(minutes=10 * attempt + 5), None))
                history.append((
                    aid, task_seq,
                    start + dt.timedelta(minutes=10 * attempt), None))
            if prev_id is not None:
                edges.append((aid, prev_id))
            prev_id = aid
        # remote provider feed: all scenes + extra never-published ones
        remote.append((name, "S2MSI2A" if cid == 1 else "LC08_SR", "fixture",
                       start, cloud, tiles[tile_idx], tx, ty, txa, tya,
                       f"https://prov.example/{name}.zip", 813.67))
    for j in range(n_scenes, n_scenes + n_scenes // 5):
        tile_idx = j % n_tiles
        day = j % 90
        name = scene_name("S2B", j, tiles[tile_idx], day)
        start = EPOCH + dt.timedelta(days=day, hours=10)
        tx, ty, txa, tya = tile_rows[tile_idx][3:7]
        remote.append((name, "S2MSI2A", "fixture", start,
                       float((j * 37) % 101), tiles[tile_idx],
                       tx, ty, txa, tya,
                       f"https://prov.example/{name}.zip", 813.67))

    out = {
        "collections": spark.createDataFrame(collections, SCHEMAS["collections"]),
        "bands": spark.createDataFrame(bands, SCHEMAS["bands"]),
        "providers": spark.createDataFrame(providers, SCHEMAS["providers"]),
        "collection_providers": spark.createDataFrame(
            collection_providers, SCHEMAS["collection_providers"]),
        "tiles": spark.createDataFrame(tile_rows, SCHEMAS["tiles"]),
        "items": spark.createDataFrame(items, SCHEMAS["items"]),
        "activities": spark.createDataFrame(activities, SCHEMAS["activities"]),
        "activity_history": spark.createDataFrame(history, SCHEMAS["activity_history"]),
        "tasks": spark.createDataFrame(task_rows, SCHEMAS["tasks"]),
        "activity_src": spark.createDataFrame(edges, SCHEMAS["activity_src"]),
    }
    out["scenes_remote"] = spark.createDataFrame(
        remote,
        "scene_id string, dataset string, catalog string, "
        "sensing_date timestamp_ntz, cloud_cover double, tile string, "
        "bbox_xmin double, bbox_ymin double, bbox_xmax double, "
        "bbox_ymax double, link string, size_mb double",
    )
    return out
