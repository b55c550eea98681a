"""Filter/predicate operators (SURVEY §2.2).

All are single Catalyst predicates → pushed to the parquet scan
(PushedFilters) wherever the column is stored, so at 100 TB they prune
row groups before any row is materialized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cloud_cover_filter(df: DataFrame, max_cloud: float = 100.0,
                       col: str = "cloud_cover") -> DataFrame:
    """F1 — cloud_cover <= threshold (controller.py:230-232)."""
    return df.filter(F.col(col) <= F.lit(max_cloud))


def bbox_intersects(west: float, south: float, east: float, north: float,
                    xmin: Column, ymin: Column, xmax: Column, ymax: Column) -> Column:
    """F2 — envelope-overlap predicate, the bbox-struct re-expression of
    ``ST_Intersects(ST_MakeEnvelope(...), geom)`` (controller.py:563-569).
    Exact for rectangles; a cheap pre-filter ahead of any true geometry
    test. Pure comparisons → pushdown-eligible."""
    return ~((xmax < F.lit(west)) | (xmin > F.lit(east))
             | (ymax < F.lit(south)) | (ymin > F.lit(north)))


def temporal_overlap(start: Column, end: Column, period_start: str,
                     period_end: str) -> Column:
    """F3 — interval-overlap truth table (controller.py:571-575): the
    3-way OR collapses to (start <= p_end) AND (end >= p_start)."""
    return (start <= F.lit(period_end)) & (end >= F.lit(period_start))


def dedup_scenes(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """F10 — unique requested scenes (controller.py:266-268)."""
    return df.select(*key_cols).distinct()


def clamp(col: Column, lo: float, hi: float, nodata: float | None = None) -> Column:
    """F9 — clamp to dtype range, masked → nodata
    (index_generator.py:107-136)."""
    out = F.greatest(F.least(col, F.lit(hi)), F.lit(lo))
    if nodata is not None:
        out = F.coalesce(out, F.lit(nodata))
    return out
