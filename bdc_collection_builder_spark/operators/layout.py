"""Data-layout operators: Z-order clustering and small-file compaction.

Neither exists in the reference — its layout is one-file-per-band on a
shared filesystem (publish.py:419-464) and PostGIS carries the spatial
index. At 100 TB on object storage the engine itself must own layout:

- **Z-order clustering** — interleave the bits of N integer columns into
  one space-filling-curve key, then range-partition + sort the write on
  it. Rows close in N-dim space land in the same files, so a bbox/time
  predicate prunes to a few files instead of scanning the table (the
  Parquet min/max footer on the z column does the pruning for free).
  The whole computation is shift/and/or arithmetic — whole-stage
  codegen, no UDF, no shuffle beyond the single range partitioning the
  write needs anyway.

- **Compaction planning** — streaming ingest (Y1-Y3) leaves many small
  files; a 100 TB table with 10 MB files spends more time opening
  footers than reading data. ``plan_compaction`` bin-packs a file
  manifest into target-size output groups with one window cumulative
  sum per table partition — O(n log n) in manifest size, never touches
  the data. ``compact_parquet_dir`` executes a plan with one Spark job.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def zorder_value(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each non-negative integer
    column into one long (Morton / Z-curve key).

    Dimension ``d`` of ``n`` owns output bit positions ``k*n + d`` —
    column order is significant and must match any external
    re-computation. ``bits * len(cols)`` must fit a signed long
    (≤ 63). Callers quantize floats first (e.g. ``floor((x - min) /
    step)``); ranks from ``percent_rank`` give the equi-depth variant.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_value needs at least one column")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} dims exceeds a signed long")
    # Mask inputs to the low `bits` first: arithmetic shiftright
    # sign-extends, so an unmasked negative input would contribute an
    # all-ones bit pattern (every row degenerates to the same max key).
    # With the mask, negatives wrap into the 2^bits domain instead —
    # still monotone-correct for callers that quantize properly, and
    # never silently degenerate.
    mask = F.lit((1 << bits) - 1)
    cs = [(F.col(c) if isinstance(c, str) else c).cast("long")
          .bitwiseAND(mask) for c in cols]
    z = F.lit(0).cast("long")
    for k in range(bits):
        for d, c in enumerate(cs):
            z = z + F.shiftleft(
                F.shiftright(c, k).bitwiseAND(F.lit(1)),
                k * n + d,
            )
    return z


def zorder_oracle_sql(col_names: list[str], bits: int = 16) -> str:
    """The exact SQL expression ``zorder_value`` computes, for external
    verification (DuckDB shares the >>/<</& operators)."""
    n = len(col_names)
    mask = (1 << bits) - 1
    terms = [
        f"((({c} & {mask}) >> {k}) & 1) * {1 << (k * n + d)}"
        for k in range(bits)
        for d, c in enumerate(col_names)
    ]
    return " + ".join(terms)


def cluster_by_zorder(df: DataFrame, cols: list[str], n_partitions: int,
                      bits: int = 16) -> DataFrame:
    """Lay ``df`` out for writing along the Z-curve of ``cols``.

    Range-partition on the z key (one shuffle — the one any clustered
    write pays) and sort within partitions so Parquet row-group min/max
    stats stay tight. Equi-width quantization on each column's observed
    min/max; the two-row bounds aggregate is the only driver action.
    """
    bounds = df.agg(*[f(c).alias(f"{f.__name__}_{c}")
                      for c in cols for f in (F.min, F.max)]).first()
    quantized = []
    for c in cols:
        lo, hi = bounds[f"min_{c}"], bounds[f"max_{c}"]
        if lo is None or hi is None:
            # empty input or all-NULL column: no spread to encode —
            # constant 0 keeps the z key defined and the write a no-op
            # instead of a driver TypeError
            quantized.append(F.lit(0).cast("long"))
            continue
        span = (hi - lo) or 1
        quantized.append(
            F.floor((F.coalesce(F.col(c), F.lit(lo)).cast("double")
                     - float(lo))
                    / float(span) * ((1 << bits) - 1)).cast("long"))
    z = zorder_value(quantized, bits=bits)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def plan_compaction(files: DataFrame, target_bytes: int,
                    partition_cols: list[str] | None = None) -> DataFrame:
    """Assign each file in a ``(path, bytes, partition…)`` manifest to an
    output bin of ~``target_bytes``.

    Bin = which target-size offset window the file STARTS in, from a
    cumulative sum ordered by path within each table partition — fully
    deterministic, one window shuffle over the (tiny) manifest, data
    untouched. A file larger than the target spans its bin alone past
    the boundary (its successors start beyond it), so a bin's size is
    bounded by ``target_bytes`` + the largest file that starts inside
    it. Returns the manifest plus ``bin``.
    """
    keys = partition_cols or []
    w = (Window.partitionBy(*keys).orderBy("path")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("bytes").over(w)
    return files.withColumn(
        "bin",
        F.floor((cum - F.col("bytes")) / F.lit(target_bytes)).cast("long"))


def compact_parquet_dir(spark: SparkSession, src: str, dst: str,
                        target_bytes: int = 128 * 1024 * 1024) -> int:
    """Rewrite the parquet files under ``src`` into ~``target_bytes``
    files at ``dst``; returns the output file count.

    Listing is driver-side metadata (every compactor's is; this helper
    walks the local filesystem — swap the walk for the Hadoop
    ``FileSystem`` API on object stores). Hive-partitioned layouts
    (``key=value`` subdirectories) are preserved: the partition columns
    are re-applied with ``partitionBy`` on the rewrite, so downstream
    partition pruning survives compaction. The rewrite is ONE
    distributed job — a scan + round-robin repartition to the planned
    bin count (round-robin, not coalesce, so each output file draws
    from many inputs and sizes stay even).
    """
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, names in os.walk(src)
        for f in names if f.endswith(".parquet")
    )
    # hive partition keys appear as key=value directory names
    detected = sorted({
        d.split("=", 1)[0]
        for root, dirs, _ in os.walk(src) for d in dirs if "=" in d
    })
    n_bins = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src)
    # validate detected keys against the columns Spark actually
    # inferred — a stray non-hive `name=value` directory must not feed
    # a bogus column into partitionBy
    part_cols = [c for c in detected if c in df.columns]
    if part_cols:
        # Bin WITHIN each hive partition: a plain repartition(n_bins)
        # before partitionBy makes every repartition task write one
        # file per partition value (n_bins × n_partitions files —
        # re-fragmenting what compaction should fix). Hash-routing on
        # (partition cols, in-partition salt) gives each partition
        # value ~ceil(its share of total/target) output files.
        n_part_dirs = max(1, len({
            root for root, _, names in os.walk(src)
            if any(f.endswith(".parquet") for f in names)
        }))
        bins_per_val = max(1, math.ceil(total / target_bytes / n_part_dirs))
        data_cols = [c for c in df.columns if c not in part_cols]
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]),
                      F.lit(bins_per_val))
        writer = (
            df.withColumn("__bin", salt)
            .repartition(n_bins, *part_cols, "__bin")
            .drop("__bin")
            .write.mode("overwrite").partitionBy(*part_cols)
        )
    else:
        writer = df.repartition(n_bins).write.mode("overwrite")
    writer.parquet(dst)
    return sum(
        1 for _, _, names in os.walk(dst)
        for f in names if f.endswith(".parquet")
    )


def write_bucketed_table(df: DataFrame, name: str, path: str,
                         keys: list[str], n_buckets: int,
                         sort_keys: list[str] | None = None) -> None:
    """Materialize ``df`` as a hash-bucketed (and optionally
    bucket-sorted) parquet table registered in the session catalog.

    Bucketing is THE shuffle-elimination lever for the repeated big⋈big
    joins a 100 TB deployment runs every cycle (scene⋈asset,
    order⋈lineitem): both sides pre-hashed into the same number of
    buckets on the join key means Catalyst reuses the on-disk
    distribution and plans a SortMergeJoin with **no Exchange on
    either side** — the join cost collapses from 2×(shuffle write +
    read) to a streaming merge of co-located files. ``sortBy`` on the
    same key additionally persists within-bucket order, shrinking the
    per-task sort to a merge of pre-sorted spills.

    The reference keeps hot entities in PostgreSQL with B-tree indexes
    (models/base_sql.py); bucketing is the lakehouse equivalent of
    that access path. Pair with ``spark.sql.sources.bucketing.enabled``
    (default true) and matching ``n_buckets`` on both tables — Spark
    only elides the shuffle when the bucket counts are equal or
    integer multiples (AQE cannot recover a mismatch).
    """
    writer = (df.write.mode("overwrite").format("parquet")
              .bucketBy(n_buckets, *keys))
    if sort_keys:
        writer = writer.sortBy(*sort_keys)
    writer.option("path", path).saveAsTable(name)
