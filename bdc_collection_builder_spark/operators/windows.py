"""Window/ranking operators (SURVEY §2.5) and pagination."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def latest_per_group(df: DataFrame, partition_cols: list[str],
                     order_cols: list[str]) -> DataFrame:
    """W1/W2 — latest row per key (models.py:55 ordered relationship,
    controller.py:481-486 CTE). ``order_cols`` should end with a unique
    tiebreaker for determinism. Single hash-shuffle on the partition
    keys; with AQE, skewed scene keys are split automatically."""
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    w = Window.partitionBy(*partition_cols).orderBy(
        *[F.col(c).desc() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def paginate(df: DataFrame, order_cols: list[str], page: int,
             per_page: int = 10) -> DataFrame:
    """W3 — `.paginate(page, per_page)` (views.py:37-49) as a ranking
    window + range filter. NOTE: a global row_number requires a single
    ordered partition — fine for catalog-plane result sets (what the
    reference paginates); for 100 TB results use keyset pagination
    (WHERE key > last_seen ORDER BY key LIMIT n) instead."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    lo = (page - 1) * per_page
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") > lo) & (F.col("__rn") <= lo + per_page))
        .withColumnRenamed("__rn", "row_index")
    )
