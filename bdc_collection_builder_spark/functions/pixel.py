"""Pixel kernels over long/wide-format pixel DataFrames.

The reference processes rasters block-window by block-window with numpy
(windowed reads index_generator.py:120-124, quality-mask union
utils.py:350-375, quicklook radiometry publish.py:77-91, nearest
resampling utils.py:317-345). Here the same kernels are Catalyst
expressions over pixel DataFrames — partition-parallel by
(scene_id, window_id), codegen'd, no Python in the hot path. At 100 TB
a pixel table is partitioned by scene/window so every kernel below is a
narrow (shuffle-free) transformation except the nodata union, which
aggregates within a (scene, y, x) key that is co-partitioned with the
data layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

NODATA_SENTINEL = -9999.0


def synthetic_pixels(spark: SparkSession, n_scenes: int = 4, height: int = 16,
                     width: int = 16) -> DataFrame:
    """Deterministic wide pixel grid (scene_id, y, x, B04, B08, SCL).

    Analytic integer formulas so an external oracle can regenerate the
    exact values; nodata sentinels are injected on a fixed stride
    (mirrors the -9999 sentinel of utils.py:367).
    """
    scenes = spark.range(n_scenes).withColumnRenamed("id", "scene_id")
    grid = (
        scenes
        .select("scene_id", F.explode(F.sequence(F.lit(0), F.lit(height - 1))).alias("y"))
        .select("scene_id", "y", F.explode(F.sequence(F.lit(0), F.lit(width - 1))).alias("x"))
    )
    b04 = (F.col("scene_id") * 31 + F.col("y") * 17 + F.col("x") * 7) % 10000
    b08 = (F.col("scene_id") * 29 + F.col("y") * 13 + F.col("x") * 11) % 10000
    scl = (F.col("scene_id") + F.col("y") + F.col("x")) % 12
    hole04 = ((F.col("y") * width + F.col("x")) % 41 == 0)
    hole08 = ((F.col("y") * width + F.col("x")) % 53 == 0)
    return grid.select(
        "scene_id", "y", "x",
        F.when(hole04, F.lit(NODATA_SENTINEL)).otherwise(b04.cast("double")).alias("B04"),
        F.when(hole08, F.lit(NODATA_SENTINEL)).otherwise(b08.cast("double")).alias("B08"),
        scl.cast("double").alias("SCL"),
    )


def synthetic_pixels_for(names: DataFrame, name_col: str = "scene_id",
                         height: int = 16, width: int = 16) -> DataFrame:
    """Same analytic pixel grid as :func:`synthetic_pixels`, keyed
    directly by scene NAME: the per-scene seed is
    ``pmod(xxhash64(name), 1000)`` instead of a dense ordinal, so no
    global-order window, no extra count job, no single-task sort — the
    grid explodes map-side from the names relation and stays
    partition-parallel at any scene count. Nodata hole positions depend
    only on (y, x), so quality-mask consumers (post_stage) see
    identical masks to the ordinal-seeded grid."""
    seed = F.pmod(F.xxhash64(F.col(name_col)), F.lit(1000))
    grid = (
        names.select(F.col(name_col), seed.alias("__seed"))
        .select(name_col, "__seed",
                F.explode(F.sequence(F.lit(0), F.lit(height - 1))).alias("y"))
        .select(name_col, "__seed", "y",
                F.explode(F.sequence(F.lit(0), F.lit(width - 1))).alias("x"))
    )
    b04 = (F.col("__seed") * 31 + F.col("y") * 17 + F.col("x") * 7) % 10000
    b08 = (F.col("__seed") * 29 + F.col("y") * 13 + F.col("x") * 11) % 10000
    scl = (F.col("__seed") + F.col("y") + F.col("x")) % 12
    hole04 = ((F.col("y") * width + F.col("x")) % 41 == 0)
    hole08 = ((F.col("y") * width + F.col("x")) % 53 == 0)
    return grid.select(
        name_col, "y", "x",
        F.when(hole04, F.lit(NODATA_SENTINEL)).otherwise(b04.cast("double"))
        .alias("B04"),
        F.when(hole08, F.lit(NODATA_SENTINEL)).otherwise(b08.cast("double"))
        .alias("B08"),
        scl.cast("double").alias("SCL"),
    )


SYNTHETIC_PIXELS_SQL = """
    SELECT s.scene_id, gy.y, gx.x,
           CASE WHEN (gy.y * {w} + gx.x) % 41 = 0 THEN -9999.0
                ELSE CAST((s.scene_id * 31 + gy.y * 17 + gx.x * 7) % 10000 AS DOUBLE)
           END AS B04,
           CASE WHEN (gy.y * {w} + gx.x) % 53 = 0 THEN -9999.0
                ELSE CAST((s.scene_id * 29 + gy.y * 13 + gx.x * 11) % 10000 AS DOUBLE)
           END AS B08,
           CAST((s.scene_id + gy.y + gx.x) % 12 AS DOUBLE) AS SCL
    FROM (SELECT unnest(generate_series(0, {ns} - 1)) AS scene_id) s,
         (SELECT unnest(generate_series(0, {h} - 1)) AS y) gy,
         (SELECT unnest(generate_series(0, {w} - 1)) AS x) gx
"""


def synthetic_pixels_oracle(n_scenes: int = 4, height: int = 16, width: int = 16) -> str:
    """DuckDB SQL producing the identical pixel grid (for the oracle)."""
    return SYNTHETIC_PIXELS_SQL.format(ns=n_scenes, h=height, w=width)


def mask_nodata(col: Column, nodata: float = NODATA_SENTINEL) -> Column:
    """masked=True read semantics (utils.py:253-259): sentinel → NULL."""
    return F.when(col == F.lit(nodata), None).otherwise(col)


def quicklook_radiometry(col: Column, nodata: float = NODATA_SENTINEL) -> Column:
    """Quicklook scaling (publish.py:84-88): v/10000*255 clipped to 255,
    nodata → 0, integer byte value (explicit floor so semantics don't
    depend on engine cast-rounding rules)."""
    scaled = F.floor(F.least(col / F.lit(10000.0) * F.lit(255.0), F.lit(255.0)))
    return F.when(col == F.lit(nodata), F.lit(0)).otherwise(scaled).cast("int")


def nodata_union(pixels: DataFrame, band_cols: list[str],
                 nodata: float = NODATA_SENTINEL) -> DataFrame:
    """Quality post-processing (utils.py:350-375): a pixel position is
    invalid if ANY spectral band is nodata there. numpy.union1d over
    raveled indices becomes a max-of-indicators aggregation keyed by
    pixel position — partial aggregation map-side, tiny shuffle."""
    indicator = None
    for band in band_cols:
        flag = F.when(F.col(band) == F.lit(nodata), F.lit(1)).otherwise(F.lit(0))
        indicator = flag if indicator is None else F.greatest(indicator, flag)
    return (
        pixels.select("scene_id", "y", "x", indicator.alias("any_nodata"))
        .groupBy("scene_id", "y", "x")
        .agg(F.max("any_nodata").alias("any_nodata"))
    )


def resample_nearest(pixels: DataFrame, factor: int, value_cols: list[str]) -> DataFrame:
    """Nearest-neighbour downsample by an integer factor
    (utils.py:317-345 / tasks.py:421-427): keep the top-left pixel of
    each factor×factor block — a narrow filter + projection, no shuffle."""
    kept = pixels.filter((F.col("y") % factor == 0) & (F.col("x") % factor == 0))
    return kept.select(
        "scene_id",
        (F.col("y") / factor).cast("int").alias("y"),
        (F.col("x") / factor).cast("int").alias("x"),
        *[F.col(c) for c in value_cols],
    )
