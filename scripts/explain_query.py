"""Dump ``explain("formatted")`` for named registered queries.

Usage: python scripts/explain_query.py out_dir suffix name1 [name2 ...]

Writes ``out_dir/<name>_<suffix>.txt`` for each query. Used to produce
the ``plans/r10/<query>_before.txt`` / ``..._after.txt`` optimization
evidence; runs under the project session (same confs as the bench) at
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) so the plan matches what the
bench times. Queries whose construction *executes* work (streaming
drains, store builds) still produce the plan of the returned frame.
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)
    from bdc_collection_builder_spark.plans.registry import all_queries
    from bdc_collection_builder_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = all_queries()
    spark = get_spark("explain")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
