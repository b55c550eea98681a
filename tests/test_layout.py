"""Layout operators: Z-order clustering locality and compaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from bdc_collection_builder_spark.operators.layout import (
    cluster_by_zorder,
    compact_parquet_dir,
    plan_compaction,
    zorder_value,
)


def test_zorder_interleaves_bits(spark):
    # z(x=0b101, y=0b011) with x on even bits: 0b011011 -> x bits at
    # 0,2,4 = 1,0,1 ; y bits at 1,3,5 = 1,1,0
    df = spark.createDataFrame([(0b101, 0b011)], "x long, y long")
    got = df.select(zorder_value(["x", "y"], bits=3).alias("z")).first().z
    assert got == 0b011011


def test_cluster_by_zorder_gives_spatial_locality(spark, tmp_path):
    # 32x32 grid written clustered into 16 files: an 8x8 query box must
    # live in far fewer files than the 16 a row-major or random layout
    # spreads it across. (Measured on the written files — a filter on
    # the in-memory frame would be pushed below the repartition.)
    path = str(tmp_path / "zorder")
    pts = spark.range(32 * 32).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y"))
    cluster_by_zorder(pts, ["x", "y"], n_partitions=16, bits=5) \
        .write.parquet(path)
    hit = (spark.read.parquet(path)
           .filter((F.col("x") < 8) & (F.col("y") < 8))
           .select(F.input_file_name().alias("f")))
    n_files = hit.distinct().count()
    assert hit.count() == 64
    assert n_files <= 4, f"8x8 box touched {n_files} of 16 files"


def test_plan_compaction_packs_to_target(spark):
    files = spark.createDataFrame(
        [(f"f{i:03d}", 40) for i in range(10)] + [("g_big", 250)],
        "path string, bytes long")
    plan = plan_compaction(files, target_bytes=100).collect()
    by_bin: dict[int, int] = {}
    for r in plan:
        by_bin[r.bin] = by_bin.get(r.bin, 0) + r.bytes
    # every bin except possibly the last stays under target + one file
    assert all(v <= 100 + 250 for v in by_bin.values())
    # deterministic: same input -> same assignment
    again = plan_compaction(files, target_bytes=100).collect()
    assert sorted((r.path, r.bin) for r in plan) == \
        sorted((r.path, r.bin) for r in again)


def test_compact_parquet_dir_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    # 64 tiny files
    spark.range(100_000).repartition(64).write.parquet(src)
    n_out = compact_parquet_dir(spark, src, dst, target_bytes=1 << 30)
    assert n_out == 1
    assert spark.read.parquet(dst).count() == 100_000


def test_compact_preserves_hive_partitioning(spark, tmp_path):
    src = str(tmp_path / "psrc")
    dst = str(tmp_path / "pdst")
    (spark.range(10_000)
     .selectExpr("id", "CAST(id % 4 AS INT) AS part")
     .repartition(32).write.partitionBy("part").parquet(src))
    compact_parquet_dir(spark, src, dst, target_bytes=1 << 30)
    out = spark.read.parquet(dst)
    assert out.count() == 10_000
    # layout survives: key=value dirs exist and pruning reaches the scan
    import os
    assert any(d.startswith("part=") for d in os.listdir(dst))
    plan = spark._jvm.PythonSQLUtils.explainString(
        out.filter(F.col("part") == 2)._jdf.queryExecution(), "formatted")
    assert "PartitionFilters: [isnotnull(part" in plan


def test_cluster_by_zorder_empty_input_is_noop(spark):
    empty = spark.range(0).selectExpr("id AS x", "id AS y")
    assert cluster_by_zorder(empty, ["x", "y"], n_partitions=4).count() == 0


def test_zorder_negative_inputs_not_degenerate(spark):
    # sign-extension would give every negative row the identical
    # all-ones key; the masked form keeps distinct negatives distinct
    df = spark.createDataFrame([(-1, 5), (-7, 5), (3, 5)], "x long, y long")
    zs = [r.z for r in
          df.select(zorder_value(["x", "y"], bits=4).alias("z")).collect()]
    assert len(set(zs)) == 3


def test_compact_hive_multibin_does_not_refragment(spark, tmp_path):
    """With n_bins > 1 and hive partitions, output must stay near the
    planned bin count — not n_bins x n_partitions (the re-fragmenting
    shape a plain repartition-then-partitionBy writes)."""
    import math
    import os

    src = str(tmp_path / "mb_src")
    dst = str(tmp_path / "mb_dst")
    (spark.range(40_000)
     .selectExpr("id", "CAST(id % 4 AS INT) AS part",
                 "repeat(CAST(id AS STRING), 20) AS pad")
     .repartition(32).write.partitionBy("part").parquet(src))
    total = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, names in os.walk(src)
        for f in names if f.endswith(".parquet"))
    target = total // 8          # forces n_bins ~ 8 over 4 partitions
    n_out = compact_parquet_dir(spark, src, dst, target_bytes=target)
    n_bins = max(1, math.ceil(total / target))
    assert spark.read.parquet(dst).count() == 40_000
    # per-partition binning: ~bins_per_val files per partition value,
    # within a small factor of the plan — NOT n_bins per partition
    assert n_out <= 2 * n_bins, f"{n_out} files vs {n_bins} planned bins"


def test_compact_ignores_stray_equals_dir(spark, tmp_path):
    """A stray `name=value` directory that is not a real partition key
    must not feed a bogus column into partitionBy."""
    import os

    src = str(tmp_path / "stray_src")
    dst = str(tmp_path / "stray_dst")
    spark.range(5_000).repartition(8).write.parquet(src)
    # an empty leftover dir (e.g. an aborted writer's staging) — Spark's
    # read ignores it, but naive '=' splitting would feed `notes` to
    # partitionBy and abort the rewrite
    os.makedirs(os.path.join(src, "notes=tmp"))
    n_out = compact_parquet_dir(spark, src, dst, target_bytes=1 << 30)
    assert n_out == 1
    assert spark.read.parquet(dst).count() == 5_000


def test_bucketed_join_elides_both_shuffles(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key at the same bucket count
    must join with NO Exchange on either side (the on-disk hash
    distribution is reused), and the result must equal the plain
    shuffled join."""
    from bdc_collection_builder_spark.operators.layout import (
        write_bucketed_table,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(orders, "orders_b", str(tmp_path / "orders_b"),
                         ["o_orderkey"], 8, sort_keys=["o_orderkey"])
    write_bucketed_table(lineitem, "lineitem_b",
                         str(tmp_path / "lineitem_b"),
                         ["l_orderkey"], 8, sort_keys=["l_orderkey"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = (
                spark.table("orders_b")
                .join(spark.table("lineitem_b"),
                      F.col("o_orderkey") == F.col("l_orderkey"))
                .select("o_orderkey", "l_linenumber", "l_quantity")
            )
            plan = spark._jvm.PythonSQLUtils.explainString(
                joined._jdf.queryExecution(), "formatted")
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan
            expect = (
                orders.join(
                    lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
                .select("o_orderkey", "l_linenumber", "l_quantity")
            )
            assert sorted(map(tuple, joined.collect())) == \
                sorted(map(tuple, expect.collect()))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
