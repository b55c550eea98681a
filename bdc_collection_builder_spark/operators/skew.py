"""Skew-mitigation operators.

AQE's skew-join splitting (enabled in the session factory) handles most
runtime skew; these operators cover the cases AQE cannot: a broadcast-
ineligible dimension joined on a pathologically hot key, and top-level
aggregations whose per-key state is large (collect_list-style).

The salt never changes results — it only spreads one logical key over
``n_salts`` physical partitions, at the cost of replicating the small
side n_salts times (choose n_salts ≈ hot-key-rows / target-partition-
rows; 8-32 is typical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, keys: list[str],
                n_salts: int = 16, how: str = "inner",
                seed: int = 42) -> DataFrame:
    """Equi-join a skew-keyed big side against a small (but not
    broadcastable) side: big rows get a uniform salt, small rows are
    replicated across all salts, and the join runs on (keys + salt) so
    a hot key spreads over n_salts reducers."""
    salted_big = big.withColumn(
        "__salt", F.floor(F.rand(seed) * n_salts).cast("int"))
    salted_small = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return (
        salted_big.join(salted_small, [*keys, "__salt"], how)
        .drop("__salt")
    )


def salted_agg_count(df: DataFrame, keys: list[str],
                     n_salts: int = 16, seed: int = 42) -> DataFrame:
    """Two-stage count for hot grouping keys: partial count per
    (keys, salt), then final sum per keys. Spark's hash aggregate
    already partial-aggregates map-side, so this pattern matters when
    upstream partitioning concentrates a key (e.g. after a join on the
    same hot key) or the agg state is heavy."""
    partial = (
        df.withColumn("__salt", F.floor(F.rand(seed) * n_salts).cast("int"))
        .groupBy(*keys, "__salt")
        .agg(F.count("*").alias("__partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("__partial").alias("n"))
