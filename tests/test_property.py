"""Property-based tests (hypothesis): the band-expression compiler vs a
numpy masked-array reference implementation — the exact semantics of the
reference's block-window evaluator (index_generator.py:99-141 driving
interpreter.py:28-58): masked inputs propagate, division by zero masks,
output clamps to the dtype range, masked results fill with nodata.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bdc_collection_builder_spark.functions.expression import (
    compile_band_expression,
)

NODATA = -9999.0
BANDS = ("B04", "B08")


@st.composite
def expressions(draw, depth=2):
    """Random arithmetic trees over B04/B08 and bounded constants."""
    if depth == 0:
        leaf = draw(st.sampled_from(["B04", "B08", "const"]))
        if leaf == "const":
            c = draw(st.floats(min_value=-50, max_value=50,
                               allow_nan=False, allow_infinity=False))
            # keep constants away from 0 so x/c stays bounded
            return f"{(c if abs(c) > 1 else c + 2.0):.4f}"
        return leaf
    op = draw(st.sampled_from(["+", "-", "*", "/", "abs"]))
    left = draw(expressions(depth=depth - 1))
    if op == "abs":
        return f"abs({left})"
    right = draw(expressions(depth=depth - 1))
    return f"({left} {op} {right})"


def numpy_reference(expr: str, b04: np.ma.MaskedArray,
                    b08: np.ma.MaskedArray, scale: float) -> np.ndarray:
    """The reference's evaluator: numpy.ma arithmetic (invalid ops and
    zero-division mask), int16 clamp, nodata fill."""
    with np.errstate(all="ignore"):
        result = eval(  # noqa: S307 - test-only, generated input
            expr, {"__builtins__": {}},
            {"B04": b04, "B08": b08, "abs": np.ma.abs})
        if not isinstance(result, np.ma.MaskedArray):
            result = np.ma.masked_array(
                np.broadcast_to(np.asarray(result, dtype=np.float64),
                                b04.shape).copy())
        result = result.astype(np.float64) * scale
        result = np.ma.masked_invalid(result)
        clipped = np.ma.clip(result, -32768.0, 32767.0)
    return clipped.filled(NODATA)


@settings(max_examples=25, deadline=None)
@given(expressions())
def test_expression_compiler_matches_numpy_reference(shared_spark, expr):
    rng = np.random.default_rng(7)
    n = 64
    b04 = rng.integers(0, 10000, n).astype(np.float64)
    b08 = rng.integers(0, 10000, n).astype(np.float64)
    mask04 = rng.random(n) < 0.1
    mask08 = rng.random(n) < 0.1
    # force interesting cases: a zero row and a masked row
    b04[0], b08[0] = 0.0, 0.0
    mask04[1] = True

    ma04 = np.ma.masked_array(b04, mask=mask04)
    ma08 = np.ma.masked_array(b08, mask=mask08)
    want = numpy_reference(expr, ma04, ma08, scale=10.0)

    rows = [
        (None if mask04[i] else float(b04[i]),
         None if mask08[i] else float(b08[i]))
        for i in range(n)
    ]
    df = shared_spark.createDataFrame(rows, "B04 double, B08 double")
    col = compile_band_expression(
        expr, set(BANDS), dtype="int16", nodata=NODATA, scale=10.0)
    got = np.array([r[0] for r in df.select(col).collect()], dtype=np.float64)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


@pytest.fixture(scope="module")
def shared_spark(spark):
    return spark


# --- Curation operators vs plain-Python references -----------------------
# The DuckDB oracles replay the same relational formulation; these
# references are independent reimplementations (hashlib + loops), so
# they catch formulation-level mistakes the oracle would mirror.

_pack_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=10**9),
              st.integers(min_value=1, max_value=30)),
    min_size=1, max_size=25, unique_by=lambda t: t[0])


@settings(max_examples=8, deadline=None)
@given(rows=_pack_rows)
def test_pack_sequences_matches_reference(spark, rows):
    from bdc_collection_builder_spark.extensions.curation import pack_sequences

    capacity, shards = 16, 4
    df = spark.createDataFrame(
        [(i, "tok " * n) for i, n in rows], ["doc_id", "text"])
    got = {r.doc_id: (r.shard, r.n_tokens, r.start_offset, r.pack_id)
           for r in pack_sequences(df, capacity=capacity,
                                   n_shards=shards).collect()}
    want = {}
    for sh in range(shards):
        cum = 0
        for i, n in sorted((i, n) for i, n in rows if i % shards == sh):
            want[i] = (sh, n, cum, cum // capacity)
            cum += n
    assert got == want


@settings(max_examples=8, deadline=None)
@given(ids=st.lists(st.integers(min_value=0, max_value=10**12),
                    min_size=1, max_size=30, unique=True))
def test_hash_split_matches_reference(spark, ids):
    import hashlib

    from bdc_collection_builder_spark.extensions.curation import hash_split

    df = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    got = {r.doc_id: (r.bucket, r.split) for r in hash_split(df).collect()}
    for i in ids:
        b = int(hashlib.md5(f"{i}:split".encode()).hexdigest()[:15], 16) % 100
        split = "train" if b < 90 else ("val" if b < 95 else "test")
        assert got[i] == (b, split), i


# --- geometry predicate: cross-engine agreement on random polygons --------

def _hull(pts):
    """Andrew's monotone chain (pure Python, no trig) — builds a convex
    simple polygon from random points for the geometry property test."""
    pts = sorted(set(pts))
    if len(pts) < 3:
        return None

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and (
                (out[-1][0] - out[-2][0]) * (p[1] - out[-2][1])
                - (out[-1][1] - out[-2][1]) * (p[0] - out[-2][0])
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = half(pts)
    upper = half(list(reversed(pts)))
    ring = lower[:-1] + upper[:-1]
    return ring if len(ring) >= 3 else None


@st.composite
def polygon_pairs(draw):
    def poly():
        n = draw(st.integers(min_value=4, max_value=9))
        pts = [(round(draw(st.floats(0, 20, allow_nan=False,
                                     allow_infinity=False)), 2),
                round(draw(st.floats(0, 20, allow_nan=False,
                                     allow_infinity=False)), 2))
               for _ in range(n)]
        return _hull(pts)

    a, b = poly(), poly()
    if a is None or b is None:
        # degenerate draw — substitute fixed triangles
        a = a or [(0.0, 0.0), (3.0, 0.0), (1.5, 2.0)]
        b = b or [(10.0, 10.0), (13.0, 10.0), (11.5, 12.0)]
    return a, b


@settings(max_examples=30, deadline=None)
@given(polygon_pairs())
@pytest.mark.slow  # >8s e2e pin: round-close gate (--runslow)
def test_polygon_intersects_agrees_across_engines(shared_spark, pair):
    """The Spark higher-order-function predicate and its DuckDB
    list-function twin must agree on random convex polygons — the
    cross-engine divergence (different arithmetic, different HOF
    evaluation) is the practical failure mode the dual implementation
    must exclude."""
    import duckdb

    from bdc_collection_builder_spark.functions.geometry import (
        duck_polygon_intersects,
        polygon_intersects,
    )
    from pyspark.sql import functions as F

    pa, pb = pair

    def spark_ring(pts):
        return F.array(*[F.struct(F.lit(float(x)).alias("x"),
                                  F.lit(float(y)).alias("y"))
                         for x, y in pts])

    def duck_ring(pts):
        return "[" + ", ".join(
            f"{{'x': CAST({x!r} AS DOUBLE), 'y': CAST({y!r} AS DOUBLE)}}"
            for x, y in pts) + "]"

    got_spark = shared_spark.range(1).select(
        polygon_intersects(spark_ring(pa), spark_ring(pb)).alias("ix")
    ).first().ix
    got_duck = duckdb.connect().execute(
        f"SELECT {duck_polygon_intersects(duck_ring(pa), duck_ring(pb))}"
    ).fetchone()[0]
    assert got_spark == got_duck, f"engines disagree on {pa} vs {pb}"


@settings(max_examples=40, deadline=None)
@given(
    dtype=st.sampled_from(["uint8", "uint16", "int16", "int32",
                           "float32", "float64"]),
    height=st.integers(1, 40),
    width=st.integers(1, 40),
    rows_per_strip=st.one_of(st.none(), st.integers(1, 45)),
    seed=st.integers(0, 2**31),
)
def test_tiff_roundtrip_property(dtype, height, width, rows_per_strip, seed):
    """Any shape × dtype × strip split round-trips bit-exactly through
    the pure-Python TIFF codec."""
    from bdc_collection_builder_spark.sources.tiff import read_tiff, write_tiff

    rng = np.random.default_rng(seed)
    if dtype.startswith("float"):
        a = rng.normal(scale=1e4, size=(height, width)).astype(dtype)
    else:
        info = np.iinfo(dtype)
        a = rng.integers(info.min, info.max, size=(height, width),
                         endpoint=True).astype(dtype)
    img = read_tiff(write_tiff(a, rows_per_strip=rows_per_strip))
    assert img.array.dtype == a.dtype
    assert np.array_equal(img.array, a)


@settings(max_examples=40, deadline=None)
@given(
    height=st.integers(1, 40),
    width=st.integers(1, 40),
    rgb=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_png_roundtrip_property(height, width, rgb, seed):
    from bdc_collection_builder_spark.sources.png import read_png, write_png

    rng = np.random.default_rng(seed)
    shape = (height, width, 3) if rgb else (height, width)
    a = rng.integers(0, 256, size=shape).astype("uint8")
    assert np.array_equal(read_png(write_png(a)), a)


@settings(max_examples=6, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10**6))
@pytest.mark.slow  # >8s e2e pin: round-close gate (--runslow)
def test_delete_keys_equals_filter_delete(shared_spark, tmp_path_factory,
                                          seed):
    """Property: for ANY key subset, store.delete_keys (anti-join
    MERGE) leaves exactly the rows a predicate-based delete_where of
    the same keys would — survivors identical as multisets."""
    from pyspark.sql import functions as F

    from bdc_collection_builder_spark.catalog.fixtures import make_fixtures
    from bdc_collection_builder_spark.catalog.store import CatalogStore

    spark = shared_spark
    base = tmp_path_factory.mktemp(f"dkprop{seed}")
    fx = make_fixtures(spark, n_scenes=20, n_tiles=3)
    a = CatalogStore(spark, str(base / "a"))
    b = CatalogStore(spark, str(base / "b"))
    for s in (a, b):
        s.overwrite("items", fx["items"])
    victims = fx["items"].filter(
        F.xxhash64(F.col("name"), F.lit(seed)) % 3 == 0
    ).select("name", "collection_id")
    rows = victims.collect()
    if rows:
        preds = " OR ".join(
            f"(name = '{r.name}' AND collection_id = {r.collection_id})"
            for r in rows)
        a.delete_where("items", preds)
    b.delete_keys("items", victims, ["name", "collection_id"])
    left = sorted(map(tuple, a.read("items").collect()))
    right = sorted(map(tuple, b.read("items").collect()))
    assert left == right


@settings(max_examples=5, deadline=None)
@given(seed=st.integers(min_value=0, max_value=10**6))
@pytest.mark.slow  # >8s e2e pin: round-close gate (--runslow)
def test_partitioned_evolution_read_invariants(shared_spark,
                                               tmp_path_factory, seed):
    """Property: for ANY subset of partitions touched by an evolving
    merge, the reconciled read preserves row count, appends exactly
    one column, marks exactly the merged rows non-null, and leaves
    untouched partitions' generation pointers unmoved."""
    from pyspark.sql import functions as F

    from bdc_collection_builder_spark.catalog.fixtures import make_fixtures
    from bdc_collection_builder_spark.catalog.schemas import SCHEMAS
    from bdc_collection_builder_spark.catalog.store import (
        PartitionedCatalogStore,
    )

    spark = shared_spark
    st_dir = tmp_path_factory.mktemp(f"pevoprop{seed}")
    fx = make_fixtures(spark, n_scenes=16, n_tiles=3)
    store = PartitionedCatalogStore(spark, str(st_dir / "c"))
    store.overwrite("items", fx["items"])
    vals = store._partition_values("items")
    pre = {v: store._sub("items", v)._current_gen("items") for v in vals}
    n0 = store.read("items").count()
    base_cols = [f.name for f in SCHEMAS["items"].fields]

    # hashlib, not hash(): str hashing depends on PYTHONHASHSEED, so
    # a Hypothesis failure replayed in a new process would pick a
    # DIFFERENT partition subset and read as flaky (ADVICE-r6).
    import hashlib

    def _pick(v: str) -> bool:
        d = hashlib.md5(f"{seed}:{v}".encode()).digest()
        return d[0] % 2 == 0

    touched = {v for v in vals if _pick(v)} or {vals[0]}
    batch = (fx["items"]
             .filter(F.col("collection_id").cast("string")
                     .isin(*touched))
             .withColumn("flag", F.lit("evolved")))
    n_batch = batch.count()
    store.merge_upsert("items", batch, evolve_schema=True)

    got = store.read("items")
    assert got.columns == base_cols + ["flag"]
    assert got.count() == n0
    assert got.filter(F.col("flag") == "evolved").count() == n_batch
    assert got.filter(F.col("flag").isNull()).count() == n0 - n_batch
    for v in vals:
        moved = store._sub("items", v)._current_gen("items") != pre[v]
        assert moved == (v in touched), (v, touched)
