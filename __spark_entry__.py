"""Driver contract for the PySpark-native engine.

``queries()`` exposes every implemented operator from SURVEY.md §2 (plus
the training-data-pipeline extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each hash-checkable query. Column names are
aliased identically on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the multi-measure
    pricing-summary aggregate (TPC-H Q1 shape)."""
    from bdc_collection_builder_spark.plans.aggregates import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from bdc_collection_builder_spark.plans.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check)."""
    from bdc_collection_builder_spark.plans.registry import oracle_sqls

    return oracle_sqls()
