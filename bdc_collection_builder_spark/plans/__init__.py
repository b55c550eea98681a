"""Named query registry: every SURVEY.md §2 operator as a (Spark plan,
DuckDB oracle SQL) pair runnable over the synthetic test tables."""

from bdc_collection_builder_spark.plans.registry import (
    QUERY_REGISTRY,
    QueryDef,
    all_queries,
    oracle_sqls,
    query,
)

__all__ = ["QUERY_REGISTRY", "QueryDef", "all_queries", "oracle_sqls", "query"]
