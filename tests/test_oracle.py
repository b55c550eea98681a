"""Cross-engine correctness: every registered query's Spark result must
match its DuckDB oracle (row count + schema width + BYTE-exact values
after column-name sort), mirroring the driver's t2 harness.  The strict
compare lives in bdc_collection_builder_spark.compare — float columns
are compared as IEEE-754 bytes, so signed zero and NaN-payload splits
fail here the way they fail the driver's value hash."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from bdc_collection_builder_spark.compare import strict_mismatch
from bdc_collection_builder_spark.plans.registry import QUERY_REGISTRY, all_queries


def _fast_names() -> set[str]:
    """The bench-tracked queries (suite + heavy): the paths
    optimization rounds touch, kept in the FAST gate. The full-registry
    sweep runs with --runslow (round close) — the driver's own
    CORRECTNESS verify covers the registry window independently, so
    the driver-visible pytest gate trades full oracle breadth for
    fitting the verify window (VERDICT-r10 item 2)."""
    import bench

    return set(bench.BENCH_QUERIES) | set(bench.HEAVY_QUERIES)


def _ids():
    all_queries()  # force registration
    fast = _fast_names()
    return [n if n in fast else pytest.param(n, marks=pytest.mark.slow)
            for n in sorted(QUERY_REGISTRY)]


@pytest.mark.parametrize("name", _ids())
def test_query_matches_oracle(name, spark, duck, sf_dir):
    qd = QUERY_REGISTRY[name]
    result = qd.spark_fn(spark, sf_dir).toPandas()
    if qd.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert result is not None
        return
    expected = duck.execute(qd.oracle).fetchdf()
    why = strict_mismatch(result, expected)
    assert why is None, f"{name}: {why}"


def test_gate_catches_negative_zero():
    """Regression for the round-3 x17b class: -0.0 == +0.0 under
    value comparison, but the driver hashes the 8 float bytes, so the
    local gate must flag it."""
    got = pd.DataFrame({"k": [1, 2], "v": [0.0, 1.5]})
    want = pd.DataFrame({"k": [1, 2], "v": [-0.0, 1.5]})
    # sanity: the old value-level compare would pass this
    pd.testing.assert_frame_equal(got, want, check_exact=True)
    why = strict_mismatch(got, want)
    assert why is not None and "byte mismatch" in why and "-0.0" in why


def test_gate_catches_nan_payload_and_kind_split():
    neg_nan = np.array([np.uint64(0xFFF8000000000000)]).view("float64")[0]
    got = pd.DataFrame({"v": [neg_nan]})
    want = pd.DataFrame({"v": [np.float64("nan")]})
    assert strict_mismatch(got, want) is not None
    got = pd.DataFrame({"n": [3]})
    want = pd.DataFrame({"n": [3.0]})
    why = strict_mismatch(got, want)
    assert why is not None and "dtype split" in why


def test_gate_passes_equal_frames():
    got = pd.DataFrame({"a": [1, 2], "b": [0.5, float("nan")],
                        "c": ["x", None]})
    want = got.copy()
    assert strict_mismatch(got, want) is None
