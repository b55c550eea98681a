"""Per-barrier profile of the shipped SCC engine (VERDICT-r10 item 5).

Monkeypatches DataFrame.localCheckpoint and DataFrame.count with
timing wrappers, then runs gr_strongly_connected end to end at
$SPARK_GRAFT_SF_DIR through the noop sink — every eager barrier the
engine executes is logged with its wall time and (for count) the row
count, so the profile attributes the wall to rounds/phases of the
REAL code, not a reimplementation. Output: one line per barrier plus
a summary (barrier count, total barrier wall, end-to-end wall).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # Spark 4: pyspark.sql.DataFrame is the abstract facade; the
    # instances the engine runs are the classic subclass — patch that.
    from pyspark.sql.classic.dataframe import DataFrame

    from bdc_collection_builder_spark.plans.registry import (
        QUERY_REGISTRY, all_queries,
    )
    from bdc_collection_builder_spark.session import get_spark
    from bdc_collection_builder_spark.sources.tables import TABLES, load_table

    all_queries()
    spark = get_spark("profile_scc")
    for name in TABLES:
        load_table(spark, sf_dir, name).limit(1).collect()

    log: list[tuple[str, float, int | None]] = []
    real_ckpt = DataFrame.localCheckpoint
    real_count = DataFrame.count

    def timed_ckpt(self, eager=True):
        t0 = time.perf_counter()
        out = real_ckpt(self, eager=eager)
        log.append(("ckpt", time.perf_counter() - t0, None))
        return out

    def timed_count(self):
        t0 = time.perf_counter()
        n = real_count(self)
        log.append(("count", time.perf_counter() - t0, n))
        return n

    DataFrame.localCheckpoint = timed_ckpt
    DataFrame.count = timed_count
    try:
        # warm run (codegen/classload), unprofiled timing-wise but logged
        fn = QUERY_REGISTRY["gr_strongly_connected"].spark_fn
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        warm_wall = time.perf_counter() - t0
        spark.catalog.clearCache()
        log.clear()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.perf_counter() - t0
    finally:
        DataFrame.localCheckpoint = real_ckpt
        DataFrame.count = real_count

    for i, (kind, dt, n) in enumerate(log):
        print(f"{i:3d} {kind:5s} {dt:7.3f}s" + (f" rows={n}" if n is not None else ""))
    barrier = sum(dt for _, dt, _ in log)
    print(f"barriers={len(log)} barrier_wall={barrier:.2f}s "
          f"end_to_end={wall:.2f}s (first/warm run {warm_wall:.2f}s) "
          f"residual={wall - barrier:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
