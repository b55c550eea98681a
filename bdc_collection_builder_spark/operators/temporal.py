"""Temporal join operators: as-of join and range (point-in-interval) join.

Neither exists in the reference (SURVEY §2.3 notes J5's latest-attempt
window as the closest as-of analog) and neither is a Spark built-in —
these are the custom operators a time-series/training-data pipeline
needs, built as compositions of shuffle-bounded DataFrame primitives:

- **as-of join** — the union-and-carry-forward plan: tag both inputs,
  union them, and run ONE ranking-window pass per key that carries the
  most recent right-side payload forward onto each left row. Cost is a
  single hash shuffle of each side on the join key plus one sort —
  never a range cross-product, never per-row lookups. At 100 TB this
  scales linearly with input; skew is bounded by the per-key row count
  (salt upstream via operators.skew for pathological keys).

- **range join** — interval bucketization: intervals explode to the
  O(length/width) buckets they overlap, points map to exactly ONE
  bucket, and the match becomes an equi-join on (keys…, bucket)
  re-filtered by the exact predicate. Each (point, interval) pair meets
  in exactly one bucket, so no dedup pass is needed. Pick
  ``bucket_width`` ≈ the typical interval length: shorter explodes
  intervals into more rows, longer widens each equi-bucket — both ends
  degrade toward the O(n·m) inequality join Spark would otherwise run
  as BroadcastNestedLoop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_values: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
    matched_ts_col: str = "matched_ts",
) -> DataFrame:
    """For each left row, attach the nearest right row per key.

    ``backward`` (default, pandas/DuckDB semantics): the right row with
    the greatest ``right_ts <= left_ts``. ``forward``: the smallest
    ``right_ts >= left_ts``. Ties on the timestamp are inclusive. Left
    rows with no match keep NULL payloads (left-join semantics).

    The right side should be unique per (keys…, right_ts) — pre-aggregate
    otherwise, or which duplicate wins is undefined (same caveat DuckDB's
    ASOF JOIN carries).

    ``tolerance_seconds`` nulls out matches farther than the tolerance
    (pandas ``merge_asof`` semantics), keeping the left row.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    right_values = (
        right_values
        if right_values is not None
        else [c for c in right.columns if c not in (*on, right_ts)]
    )
    left_cols = left.columns

    l_tagged = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in left_cols if c not in on and c != left_ts],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_values],
    )
    r_tagged = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left_cols if c not in on and c != left_ts],
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    )
    unioned = l_tagged.unionByName(r_tagged)

    # Window order: right rows sort before left rows at equal ts, so the
    # carry-forward is inclusive of ties. One shuffle on the keys; both
    # sides land co-partitioned and are scanned once.
    order = (
        [F.col("__ts").asc(), F.col("__is_left").asc()]
        if direction == "backward"
        else [F.col("__ts").desc(), F.col("__is_left").asc()]
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last(F.when(F.col("__is_left") == 0, F.col("__ts")),
               ignorenulls=True).over(w).alias("__matched_ts"),
        *[F.last(F.when(F.col("__is_left") == 0, F.col(f"__r_{c}")),
                 ignorenulls=True).over(w).alias(f"__m_{c}")
          for c in right_values],
    ).filter(F.col("__is_left") == 1)

    within: Column = F.lit(True)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts").cast("timestamp"))
            - F.unix_micros(F.col("__matched_ts").cast("timestamp"))
        )
        within = gap <= int(tolerance_seconds * 1_000_000)

    return carried.select(
        *on,
        F.col("__ts").alias(left_ts),
        *[F.col(c) for c in left_cols if c not in on and c != left_ts],
        F.when(within, F.col("__matched_ts")).alias(matched_ts_col),
        *[F.when(within, F.col(f"__m_{c}")).alias(c) for c in right_values],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    keys: list[str] | None = None,
) -> DataFrame:
    """Inner join of points to the intervals containing them
    (``start <= point <= end``, inclusive), optionally also matching on
    equality ``keys``.

    ``point_col``/``start_col``/``end_col`` must be numeric (for
    timestamps, project ``F.unix_micros`` first). ``bucket_width`` is in
    the same unit. Column names must be disjoint apart from ``keys`` —
    rename upstream.
    """
    keys = keys or []
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / F.lit(bucket_width)))
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / F.lit(bucket_width)),
            F.floor(F.col(end_col) / F.lit(bucket_width)),
        )),
    )
    return (
        p.join(iv, [*keys, "__bucket"])
        .filter((F.col(point_col) >= F.col(start_col))
                & (F.col(point_col) <= F.col(end_col)))
        .drop("__bucket")
    )
