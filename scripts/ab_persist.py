"""Alternating A/B for persist sites gated by ab_tracked_persist.

Usage: python scripts/ab_persist.py q1:tag[,tag] [q2:tags ...] [--pairs N]

For each named query, runs N interleaved (persist ON, persist OFF)
pairs in ONE warmed session — the round-10 single-session alternating
protocol, so machine drift cannot masquerade as a result. OFF is
produced by listing the site tags in $SPARK_GRAFT_AB_NOPERSIST (read at
plan-construction time by functions/persist.ab_tracked_persist). Noop
sink, clearCache between runs, minima reported (contention only ever
adds time).
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    specs = []
    pairs = 6
    for arg in sys.argv[1:]:
        if arg.startswith("--pairs"):
            pairs = int(arg.split("=", 1)[1])
        else:
            name, tags = arg.split(":", 1)
            specs.append((name, tags))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bdc_collection_builder_spark.plans.registry import (
        QUERY_REGISTRY, all_queries,
    )
    from bdc_collection_builder_spark.session import get_spark
    from bdc_collection_builder_spark.sources.tables import TABLES, load_table

    all_queries()
    spark = get_spark("ab_persist")
    for name in TABLES:
        load_table(spark, sf_dir, name).limit(1).collect()
    spark.range(256).repartition(32).mapInPandas(
        lambda it: it, "id long").write.format("noop").mode(
        "overwrite").save()

    def run(name: str) -> float:
        fn = QUERY_REGISTRY[name].spark_fn
        start = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - start
        spark.catalog.clearCache()
        return round(t, 3)

    for name, tags in specs:
        on, off = [], []
        run(name)  # warm the query's own codegen path, unmeasured
        for _ in range(pairs):
            os.environ["SPARK_GRAFT_AB_NOPERSIST"] = ""
            spark.sparkContext.setJobDescription(f"{name} ON")
            on.append(run(name))
            os.environ["SPARK_GRAFT_AB_NOPERSIST"] = tags
            spark.sparkContext.setJobDescription(f"{name} OFF({tags})")
            off.append(run(name))
        os.environ["SPARK_GRAFT_AB_NOPERSIST"] = ""
        print(f"{name} tags={tags}")
        print(f"  ON : min={min(on):.3f} sorted={sorted(on)}")
        print(f"  OFF: min={min(off):.3f} sorted={sorted(off)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
