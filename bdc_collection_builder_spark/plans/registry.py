"""Query registry.

Each registered query is one operator (or operator composition) from the
SURVEY.md §2 inventory, expressed twice:

- ``spark_fn(spark, sf_dir) -> DataFrame`` — the engine's plan, written
  DataFrame-first so Catalyst optimizes it (pushdown, broadcast, AQE);
- ``oracle`` — equivalent ANSI SQL for DuckDB over the same parquet
  tables (views pre-registered by the harness), or ``None`` for ops that
  aren't SQL-expressible (those get a rows-only check).

Column names are aliased identically on both sides: the correctness
harness sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    survey: tuple[str, ...] = field(default_factory=tuple)
    description: str = ""


QUERY_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, survey: tuple[str, ...] = (), oracle: str | None = None,
          description: str = "") -> Callable[[SparkQuery], SparkQuery]:
    """Decorator registering a Spark query with its DuckDB oracle."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        QUERY_REGISTRY[name] = QueryDef(
            name=name, spark_fn=fn, oracle=oracle, survey=tuple(survey),
            description=description or (fn.__doc__ or "").strip().splitlines()[0]
            if (description or fn.__doc__) else "",
        )
        return fn

    return deco


def _load_all() -> None:
    """Import every plan module so its decorators run."""
    from bdc_collection_builder_spark.plans import (  # noqa: F401
        aggregates,
        extensions,
        filters,
        joins,
        layout,
        pixels,
        scalars,
        setops,
        sorts,
        sources,
        temporal,
        windows,
    )


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: qd.spark_fn for name, qd in QUERY_REGISTRY.items()}


def oracle_sqls() -> dict[str, str]:
    _load_all()
    return {name: qd.oracle for name, qd in QUERY_REGISTRY.items() if qd.oracle}
