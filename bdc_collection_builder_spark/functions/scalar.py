"""Scalar function surface (SURVEY §2.8).

Each helper returns a Catalyst Column (JVM-side, codegen'd) — the Spark
re-expression of the reference's per-row Python string/date/JSON code.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- X1: scene-id parsing (tasks.py:283-285; publish.py:284-291) ---------

def scene_tile(scene_id: Column) -> Column:
    """Sentinel scene-id fragment 5 = tile (tasks.py:283-285)."""
    return F.split(scene_id, "_").getItem(5)


def scene_sensing_date(scene_id: Column) -> Column:
    """Fragment 2 prefix = sensing date yyyyMMdd (tasks.py:284)."""
    return F.to_date(F.substring(F.split(scene_id, "_").getItem(2), 1, 8), "yyyyMMdd")


# --- X4: MIME guess (publish.py:49-56) -----------------------------------

MIME_BY_EXTENSION = {
    "tif": "image/tiff; application=geotiff",
    "png": "image/png",
    "jp2": "image/jp2",
    "xml": "application/xml",
    "json": "application/json",
    "hdf": "application/x-hdf",
}


def guess_mime(path: Column, cog: bool = False) -> Column:
    """Extension → MIME with a COG override, as a when/otherwise chain."""
    ext = F.lower(F.element_at(F.split(path, "\\."), -1))
    expr: Column = F.lit("application/octet-stream")
    for extension, mime in reversed(list(MIME_BY_EXTENSION.items())):
        if cog and extension == "tif":
            mime = "image/tiff; application=geotiff; profile=cloud-optimized"
        expr = F.when(ext == extension, F.lit(mime)).otherwise(expr)
    return expr


# --- X5: period generation (controller.py:45-68) -------------------------

def generate_month_periods(df: DataFrame, start_col: str, end_col: str) -> DataFrame:
    """Explode [start, end] into month-aligned (period_start, period_end)
    rows — `sequence` + `last_day`, fully JVM-side, replaces the
    reference's driver-side relativedelta loop."""
    months = F.sequence(
        F.date_trunc("month", F.col(start_col)).cast("date"),
        F.col(end_col).cast("date"),
        F.expr("INTERVAL 1 MONTH"),
    )
    return (
        df.select(F.explode(months).alias("period_start"))
        .select(
            F.col("period_start"),
            F.last_day(F.col("period_start")).alias("period_end"),
        )
    )


# --- X6: composite end-date (publish.py:321-330) -------------------------

def composite_end(start: Column, step: int) -> Column:
    """end = start + (step-1) days @ 23:59:59 (temporal_composition)."""
    return F.to_timestamp(
        F.concat(
            F.date_format(F.date_add(start.cast("date"), step - 1), "yyyy-MM-dd"),
            F.lit(" 23:59:59"),
        )
    )


# --- X18/X19: JSON args merge across task hops (tasks.py:86-89) ----------

def merge_args_map(existing_json: Column, updates: dict[str, str]) -> Column:
    """Shallow dict.update over a JSON-string args column, kept as a
    map: parse, drop the keys being updated, map_concat (right wins).
    Consumers that project fields out of the merged args should read
    THIS form — re-encoding to JSON only to re-parse it is a per-row
    to_json+from_json identity roundtrip (map<string,string> survives
    it byte-for-byte) that the optimizer does not elide."""
    parsed = F.from_json(existing_json, "map<string,string>")
    update_map = F.create_map(
        *[x for k, v in updates.items() for x in (F.lit(k), F.lit(v))]
    )
    return F.map_concat(
        F.map_filter(parsed, lambda k, _: ~k.isin(*updates)), update_map)


def merge_args(existing_json: Column, updates: dict[str, str]) -> Column:
    """Shallow dict.update over a JSON-string args column: parse to map,
    map_concat (right wins), re-encode — the cross-hop wire format."""
    return F.to_json(merge_args_map(existing_json, updates))


# --- X21: collection identifier (controller.py:236-238) ------------------

def collection_identifier(name: Column, version: Column) -> Column:
    return F.concat_ws("-", name, version)


# --- X20: asset href path math (publish.py:131-156) ----------------------

def relativize_href(href: Column, prefix: str, bucket: str) -> Column:
    return F.regexp_replace(href, f"^{prefix}", bucket)
