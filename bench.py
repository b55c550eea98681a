"""Benchmark harness: runs the headline query suite at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Each query is fully materialized through the ``noop`` sink so Catalyst
cannot prune the measured work (a bare count() would skip computed
columns). First query includes JVM/codegen warmup; a warmup pass runs a
trivial scan first so per-query numbers are comparable.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline suite: one representative per operator family, weighted
# toward the scale-relevant paths (joins, windows, dedup, ANN, text).
BENCH_QUERIES = [
    "q1_pricing_summary",        # multi-measure hash aggregate
    "j01_three_way_status_counts",  # 3-way join + agg
    "j05_latest_failed_per_scene",  # ranking window + broadcast join
    "j06_fk_broadcast_lookup",   # broadcast dim lookup over the fact table
    "f06_skip_published",        # anti-join reconciliation
    "w01_latest_execution",      # latest-per-key window
    "y01_tumbling_window",       # event-time window aggregate
    "y05_session_window",        # sessionization (lag + cumsum)
    "px_x9_band_expression_ndvi",   # band-expression engine
    "dd_minhash_lsh_pairs",      # MinHash+LSH dedup (shuffle-heavy)
    "ss_brute_force_topk",       # cosine top-k
    "tx_text_stats",             # text analysis over documents
    "tx_fingerprint",            # rolling-hash fingerprint
]


def materialize(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    from bdc_collection_builder_spark.plans.registry import QUERY_REGISTRY, all_queries
    from bdc_collection_builder_spark.session import get_spark
    from bdc_collection_builder_spark.sources.tables import TABLES, load_table

    all_queries()
    spark = get_spark("bench")

    # Warmup: touch every table so codegen/classloading noise stays out
    # of the first measured query.
    for name in TABLES:
        load_table(spark, sf_dir, name).limit(1).collect()

    # Best-of-2 per query: local-mode wall times carry scheduler/GC
    # noise that a real cluster amortizes; min-of-runs is the steadier
    # estimator of the plan's cost.
    times: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = QUERY_REGISTRY[name].spark_fn
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            materialize(fn(spark, sf_dir))
            best = min(best, time.perf_counter() - start)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(json.dumps({
        "metric": "headline_query_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
