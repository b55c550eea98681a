"""Command-line entry point (`python -m bdc_collection_builder_spark`).

The reference ships a Click CLI whose smoke tests are its whole test
suite (tests/test_cli.py:18-29: the group and module entry points exit
0); this mirrors that surface over the engine — list the query
registry, run one query against a scale-factor directory, or time the
headline suite.
"""

from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bdc_collection_builder_spark",
        description="PySpark-native collection-builder analytics engine",
    )
    sub = p.add_subparsers(dest="command")

    sub.add_parser("list-queries", help="print the query registry")

    run = sub.add_parser("run", help="run one registered query")
    run.add_argument("name", help="query name (see list-queries)")
    run.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    run.add_argument("--limit", type=int, default=20,
                     help="rows to show (0 = count only)")

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.command is None:
        build_parser().print_help()
        return 0

    from bdc_collection_builder_spark.plans.registry import (
        QUERY_REGISTRY,
        all_queries,
    )

    all_queries()
    if args.command == "list-queries":
        for name, qd in sorted(QUERY_REGISTRY.items()):
            kind = "oracle" if qd.oracle else "rows-only"
            print(f"{name}\t{kind}\t{qd.description}")
        return 0

    if args.command == "run":
        if args.name not in QUERY_REGISTRY:
            print(f"unknown query: {args.name}", file=sys.stderr)
            return 2
        from bdc_collection_builder_spark.session import get_spark

        spark = get_spark("cli")
        df = QUERY_REGISTRY[args.name].spark_fn(spark, args.sf_dir)
        # persist so show + count execute the pipeline once, not twice
        df.persist()
        try:
            if args.limit:
                df.show(args.limit, truncate=False)
            print(f"rows: {df.count()}")
        finally:
            df.unpersist()
            spark.stop()
        return 0

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
