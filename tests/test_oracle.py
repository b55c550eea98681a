"""Cross-engine correctness: every registered query's Spark result must
match its DuckDB oracle (row count + schema width + exact values after
column-name sort), mirroring the driver's t2 harness."""

from __future__ import annotations

import pandas as pd
import pytest

from bdc_collection_builder_spark.plans.registry import QUERY_REGISTRY, all_queries


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        s = df[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[col] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object:
            df[col] = s.map(lambda v: None if v is None else str(v))
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def _ids():
    all_queries()  # force registration
    return sorted(QUERY_REGISTRY)


@pytest.mark.parametrize("name", _ids())
def test_query_matches_oracle(name, spark, duck, sf_dir):
    qd = QUERY_REGISTRY[name]
    result = qd.spark_fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert result is not None
        return
    expected = duck.execute(qd.oracle).fetchdf()
    assert len(result) == len(expected), (
        f"{name}: rows {len(result)} != oracle {len(expected)}")
    assert sorted(result.columns) == sorted(expected.columns), (
        f"{name}: columns {sorted(result.columns)} != {sorted(expected.columns)}")
    # Driver's value hash is dtype-sensitive: DuckDB HUGEINT sums surface
    # as float64 in pandas, hashing 3.0 vs Spark's 3 unequal even though
    # values match (round-2 a14/y05 failure class). An int-vs-float kind
    # split between engines is therefore a FAIL, not a tolerable cast.
    kind_splits = [
        c for c in result.columns
        if {result[c].dtype.kind, expected[c].dtype.kind} in
        ({"i", "f"}, {"u", "f"})
    ]
    assert not kind_splits, (
        f"{name}: int/float dtype split (driver hash would differ): "
        f"{kind_splits} — CAST the DuckDB aggregate to BIGINT or align "
        f"the Spark column type")
    got = canonicalize(result)
    want = canonicalize(expected)
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True, obj=name)
