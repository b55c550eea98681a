"""SparkSession factory.

Local mode is a single JVM; on a real cluster the same configs apply per
executor. Tuned defaults:

- AQE on (runtime join-strategy changes, partition coalescing, skew-join
  splitting) — at 100 TB the static plan is always wrong somewhere.
- shuffle.partitions sized to cores locally; on a cluster this should be
  2-3x total cores (AQE coalesces the excess).
- Arrow on for every pandas-UDF boundary.
- Session timezone pinned to UTC so timestamps hash-match external
  oracles (DuckDB is UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "bdc_collection_builder_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    # In sandboxed containers the executor→driver RPC can spin for ~2min
    # resolving the driver endpoint; pinning the loopback address makes
    # local-mode boot ~6x faster and is a no-op on a real cluster where
    # these are set by the cluster manager.
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    master = master or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.driver.bindAddress", "127.0.0.1")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
