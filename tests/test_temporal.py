"""As-of and range join operators: semantics on hand-built frames
(backward/forward, tie inclusivity, tolerance, left rows without a
match) and the physical-plan guarantees (no nested-loop join, one
shuffle per side for the as-of)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bdc_collection_builder_spark.operators.temporal import asof_join, range_join


def ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, ts(5), "a"), (1, ts(10), "b"), (2, ts(7), "c"), (3, ts(1), "d")],
        "key int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, ts(4), 40.0), (1, ts(10), 100.0), (2, ts(9), 90.0)],
        "key int, ts timestamp, v double")
    return left, right


def test_asof_backward_with_ties_and_misses(spark):
    left, right = _frames(spark)
    got = {r.tag: (r.matched_ts, r.v)
           for r in asof_join(left, right, on=["key"]).collect()}
    assert got["a"] == (ts(4), 40.0)     # strictly before
    assert got["b"] == (ts(10), 100.0)   # tie is inclusive
    assert got["c"] == (None, None)      # right row is later
    assert got["d"] == (None, None)      # key has no right rows


def test_asof_forward(spark):
    left, right = _frames(spark)
    got = {r.tag: (r.matched_ts, r.v)
           for r in asof_join(left, right, on=["key"],
                              direction="forward").collect()}
    assert got["a"] == (ts(10), 100.0)   # next at-or-after
    assert got["b"] == (ts(10), 100.0)   # tie is inclusive
    assert got["c"] == (ts(9), 90.0)
    assert got["d"] == (None, None)


def test_asof_tolerance_nulls_far_matches(spark):
    left, right = _frames(spark)
    got = {r.tag: r.v
           for r in asof_join(left, right, on=["key"],
                              tolerance_seconds=30).collect()}
    assert got["a"] is None              # 60s gap > 30s tolerance
    assert got["b"] == 100.0             # 0s gap
    assert len(got) == 4                 # left rows all kept


def test_range_join_inclusive_bounds(spark):
    points = spark.createDataFrame(
        [(1, 0), (1, 100), (1, 250), (1, 251), (2, 100)], "k int, p long")
    intervals = spark.createDataFrame(
        [(1, "iv1", 100, 250), (2, "iv2", 0, 99)], "k int, iv string, s long, e long")
    got = sorted(
        (r.iv, r.p)
        for r in range_join(points, intervals, "p", "s", "e",
                            bucket_width=64, keys=["k"]).collect())
    # both endpoints inclusive; 0 and 251 fall outside; user 2's point
    # misses iv2 (100 > 99) and never sees iv1 (key mismatch)
    assert got == [("iv1", 100), ("iv1", 250)]


def test_asof_plan_one_shuffle_no_nested_loop(spark, sf_dir):
    from bdc_collection_builder_spark.plans.registry import (
        QUERY_REGISTRY,
        all_queries,
    )

    all_queries()
    for name in ("tj_asof_purchase_attribution", "tj_range_error_followups"):
        df = QUERY_REGISTRY[name].spark_fn(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        assert "BroadcastNestedLoopJoin" not in plan, name
        assert "CartesianProduct" not in plan, name
    asof = QUERY_REGISTRY["tj_asof_purchase_attribution"].spark_fn(
        spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        asof._jdf.queryExecution(), "formatted")
    # union-and-carry-forward: the window's single hashpartitioning on
    # user_id is the only exchange in the whole as-of plan
    assert plan.count("Arguments: hashpartitioning") == 1
