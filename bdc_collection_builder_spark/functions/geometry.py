"""Exact polygon geometry as Catalyst expressions (SURVEY §2 X17).

The reference evaluates true polygon predicates through PostGIS
(``ST_Intersects`` at controller.py:565-569; footprint construction at
publish.py:591-593). Neither Sedona nor shapely is available in this
environment, so the predicate is implemented directly as Spark
higher-order functions over vertex arrays — entirely JVM-side, inside
whole-stage codegen, no Python in the hot path — with a structurally
identical DuckDB formulation serving as the cross-engine oracle
(:func:`duckdb_intersects_sql`).

Algorithm (simple polygons, convex or concave):

- two polygons intersect iff (a) some edge of A properly crosses some
  edge of B, or (b) a vertex of A lies inside B (A ⊆ B), or (c) a
  vertex of B lies inside A (B ⊆ A);
- edge crossing uses orientation signs: segments (p1,p2) and (q1,q2)
  properly cross iff cross(p1,p2,q1)·cross(p1,p2,q2) < 0 and
  cross(q1,q2,p1)·cross(q1,q2,p2) < 0;
- containment uses ray casting (odd crossing count of a +x ray).

Degenerate contacts (collinear touching edges, vertex-on-edge) are
measure-zero and excluded by fixture construction, exactly as the
envelope approximation before it assumed axis-aligned rectangles.

Both engines run the same IEEE-754 double operations in the same
order (multiply/subtract/divide only — no trig, whose libm results
differ across engines), so boolean outcomes are bit-identical and the
driver's value hash is stable.

Polygons are ``array<struct<x:double,y:double>>`` open rings (the
closing edge last→first is implicit).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ring_edges(poly: Column) -> Column:
    """Edge list of an open ring: (v1,v2), (v2,v3), …, (vn,v1)."""
    n = F.size(poly)
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.struct(
            F.element_at(poly, i).alias("a"),
            F.element_at(poly, F.when(i == n, F.lit(1)).otherwise(i + 1))
            .alias("b"),
        ),
    )


def _cross(o: Column, a: Column, b: Column) -> Column:
    """2D cross product of (a-o) × (b-o)."""
    return ((a.x - o.x) * (b.y - o.y)) - ((a.y - o.y) * (b.x - o.x))


def _segments_cross(ea: Column, eb: Column) -> Column:
    """Proper crossing of edge structs {a,b} (orientation-sign test)."""
    return (
        (_cross(ea.a, ea.b, eb.a) * _cross(ea.a, ea.b, eb.b) < 0)
        & (_cross(eb.a, eb.b, ea.a) * _cross(eb.a, eb.b, ea.b) < 0)
    )


def point_in_polygon_edges(pt: Column, edges: Column) -> Column:
    """Ray casting over a precomputed edge array: odd number of edges
    crossed by the +x ray from pt. Higher-order functions evaluate
    interpreted (outside codegen), so callers on a hot path should
    materialize :func:`ring_edges` ONCE per row in a projection and
    pass it here rather than letting every predicate branch rebuild
    the edge structs."""
    crossings = F.filter(
        edges,
        lambda e: ((e.a.y > pt.y) != (e.b.y > pt.y))
        & (pt.x < (e.b.x - e.a.x) * (pt.y - e.a.y) / (e.b.y - e.a.y) + e.a.x),
    )
    return F.size(crossings) % 2 == 1


def point_in_polygon(pt: Column, poly: Column) -> Column:
    """Ray casting: odd number of edges crossed by the +x ray from pt."""
    return point_in_polygon_edges(pt, ring_edges(poly))


def envelopes_overlap(pa: Column, pb: Column) -> Column:
    """Cheap bbox pre-filter — the rectangle approximation the engine
    used for X17 before this module; kept as the first pass so the
    exact test only runs on envelope-overlapping pairs."""
    xs = lambda p: F.transform(p, lambda v: v.x)  # noqa: E731
    ys = lambda p: F.transform(p, lambda v: v.y)  # noqa: E731
    return (
        (F.array_min(xs(pa)) <= F.array_max(xs(pb)))
        & (F.array_min(xs(pb)) <= F.array_max(xs(pa)))
        & (F.array_min(ys(pa)) <= F.array_max(ys(pb)))
        & (F.array_min(ys(pb)) <= F.array_max(ys(pa)))
    )


def polygon_intersects(pa: Column, pb: Column) -> Column:
    """Exact ST_Intersects for simple polygons (see module docstring).
    Wrap in ``envelopes_overlap(pa, pb) & polygon_intersects(pa, pb)``
    on hot paths: Catalyst's And short-circuits, so the 2·|A|·|B|
    crossing tests only run on envelope-overlapping pairs (hoisting
    the edge arrays into columns does NOT help — CollapseProject
    inlines them right back into every consumer)."""
    ea, eb = ring_edges(pa), ring_edges(pb)
    any_edge_cross = F.exists(
        ea, lambda e1: F.exists(eb, lambda e2: _segments_cross(e1, e2)))
    return (
        any_edge_cross
        | point_in_polygon_edges(F.element_at(pa, 1), eb)
        | point_in_polygon_edges(F.element_at(pb, 1), ea)
    )


def grid_cells(poly: Column, cell: float) -> Column:
    """Grid cells (gx, gy) overlapped by the polygon's envelope — the
    bucketing key that turns a polygon⋈polygon join into an equi-join:
    two polygons whose envelopes overlap always share at least one
    cell (any point of the envelope intersection lies in a cell both
    envelope ranges cover), so cell-join candidates are a superset of
    envelope candidates and nothing is lost. Cost per row is the
    envelope's cell count (pick ``cell`` ≳ typical polygon diameter so
    it stays 1-4)."""
    xs = F.transform(poly, lambda v: v.x)
    ys = F.transform(poly, lambda v: v.y)
    c = F.lit(cell)
    gx0 = F.floor(F.array_min(xs) / c).cast("long")
    gx1 = F.floor(F.array_max(xs) / c).cast("long")
    gy0 = F.floor(F.array_min(ys) / c).cast("long")
    gy1 = F.floor(F.array_max(ys) / c).cast("long")
    return F.flatten(F.transform(
        F.sequence(gx0, gx1),
        lambda gx: F.transform(
            F.sequence(gy0, gy1),
            lambda gy: F.struct(gx.alias("gx"), gy.alias("gy")))))


def _shoelace_sum(poly: Column) -> Column:
    """Signed shoelace sum Σ(aₓ·b_y − bₓ·a_y) over the ring edges
    (= 2 × signed area). Explicit left fold so the summation order is
    reproducible in the DuckDB twin."""
    return F.aggregate(
        ring_edges(poly), F.lit(0.0),
        lambda acc, e: acc + (e.a.x * e.b.y - e.b.x * e.a.y))


def polygon_area(poly: Column) -> Column:
    """ST_Area for a simple ring: |shoelace| / 2."""
    return F.abs(_shoelace_sum(poly)) / F.lit(2.0)


def polygon_centroid(poly: Column) -> Column:
    """ST_Centroid of a simple ring — struct(x, y) via the standard
    shoelace-weighted vertex formula Cₓ = Σ(aₓ+bₓ)(aₓb_y−bₓa_y)/(3S)."""
    s = _shoelace_sum(poly)
    cx = F.aggregate(
        ring_edges(poly), F.lit(0.0),
        lambda acc, e: acc + (e.a.x + e.b.x) * (e.a.x * e.b.y
                                                - e.b.x * e.a.y))
    cy = F.aggregate(
        ring_edges(poly), F.lit(0.0),
        lambda acc, e: acc + (e.a.y + e.b.y) * (e.a.x * e.b.y
                                                - e.b.x * e.a.y))
    return F.struct((cx / (F.lit(3.0) * s)).alias("x"),
                    (cy / (F.lit(3.0) * s)).alias("y"))


def polygon_geojson(poly: Column) -> Column:
    """ST_AsGeoJSON: fixed %.4f formatting (identical printf semantics
    both engines for non-tie values), ring closed per RFC 7946."""
    vert = lambda v: F.format_string("[%.4f,%.4f]", v.x, v.y)  # noqa: E731
    coords = F.concat_ws(",", F.transform(poly, vert))
    first = vert(F.element_at(poly, 1))
    return F.concat(
        F.lit('{"type":"Polygon","coordinates":[['), coords,
        F.lit(","), first, F.lit("]]}"))


# --- DuckDB twin -----------------------------------------------------------
#
# The same predicate, generated as DuckDB SQL over LIST(STRUCT(x,y))
# columns, operation-for-operation identical to the Column version so
# boolean outcomes match bit-for-bit. DuckDB lists are 1-indexed like
# Spark's element_at, which keeps the edge construction symmetrical.

def _duck_edges(poly: str) -> str:
    return (
        f"list_transform(generate_series(1, len({poly})), i -> "
        f"{{'a': {poly}[i], "
        f"'b': {poly}[CASE WHEN i = len({poly}) THEN 1 ELSE i + 1 END]}})"
    )


def _duck_cross(o: str, a: str, b: str) -> str:
    # outer parens matter: the caller multiplies two cross products
    return (f"(((({a}).x - ({o}).x) * (({b}).y - ({o}).y))"
            f" - ((({a}).y - ({o}).y) * (({b}).x - ({o}).x)))")


def _duck_segments_cross(e1: str, e2: str) -> str:
    return (
        f"({_duck_cross(e1 + '.a', e1 + '.b', e2 + '.a')}"
        f" * {_duck_cross(e1 + '.a', e1 + '.b', e2 + '.b')} < 0"
        f" AND {_duck_cross(e2 + '.a', e2 + '.b', e1 + '.a')}"
        f" * {_duck_cross(e2 + '.a', e2 + '.b', e1 + '.b')} < 0)"
    )


def duck_point_in_polygon(pt: str, poly: str) -> str:
    """DuckDB ray-casting containment, twin of :func:`point_in_polygon`."""
    cond = (
        f"((e.a.y > ({pt}).y) <> (e.b.y > ({pt}).y)) AND "
        f"(({pt}).x < (e.b.x - e.a.x) * (({pt}).y - e.a.y)"
        f" / (e.b.y - e.a.y) + e.a.x)"
    )
    return (f"len(list_filter({_duck_edges(poly)}, e -> {cond})) % 2 = 1")


def duck_envelopes_overlap(pa: str, pb: str) -> str:
    """DuckDB twin of :func:`envelopes_overlap`."""
    def mn(p, f):
        return f"list_min(list_transform({p}, v -> v.{f}))"

    def mx(p, f):
        return f"list_max(list_transform({p}, v -> v.{f}))"

    return (
        f"({mn(pa, 'x')} <= {mx(pb, 'x')} AND {mn(pb, 'x')} <= {mx(pa, 'x')}"
        f" AND {mn(pa, 'y')} <= {mx(pb, 'y')}"
        f" AND {mn(pb, 'y')} <= {mx(pa, 'y')})"
    )


def _duck_shoelace(poly: str) -> str:
    # list_reduce is a left fold like F.aggregate, so partial sums
    # accumulate in the same order and the doubles match bit-for-bit
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform({_duck_edges(poly)}, "
        f"e -> e.a.x * e.b.y - e.b.x * e.a.y)), (acc, t) -> acc + t)"
    )


def duck_polygon_area(poly: str) -> str:
    """DuckDB twin of :func:`polygon_area`."""
    return f"abs({_duck_shoelace(poly)}) / CAST(2.0 AS DOUBLE)"


def duck_polygon_centroid(poly: str) -> str:
    """DuckDB twin of :func:`polygon_centroid` (struct(x, y))."""
    def fold(term):
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform({_duck_edges(poly)}, e -> {term})), "
            f"(acc, t) -> acc + t)"
        )

    s = _duck_shoelace(poly)
    cx = fold("(e.a.x + e.b.x) * (e.a.x * e.b.y - e.b.x * e.a.y)")
    cy = fold("(e.a.y + e.b.y) * (e.a.x * e.b.y - e.b.x * e.a.y)")
    return (f"{{'x': ({cx}) / (CAST(3.0 AS DOUBLE) * ({s})), "
            f"'y': ({cy}) / (CAST(3.0 AS DOUBLE) * ({s}))}}")


def duck_polygon_geojson(poly: str) -> str:
    """DuckDB twin of :func:`polygon_geojson`."""
    coords = (f"array_to_string(list_transform({poly}, "
              f"v -> printf('[%.4f,%.4f]', v.x, v.y)), ',')")
    first = f"printf('[%.4f,%.4f]', ({poly})[1].x, ({poly})[1].y)"
    return (
        "concat('{\"type\":\"Polygon\",\"coordinates\":[[', "
        f"{coords}, ',', {first}, ']]}}')"
    )


def duck_polygon_intersects(pa: str, pb: str) -> str:
    """DuckDB twin of :func:`polygon_intersects`."""
    edge_cross = (
        f"len(list_filter({_duck_edges(pa)}, e1 -> "
        f"len(list_filter({_duck_edges(pb)}, e2 -> "
        f"{_duck_segments_cross('e1', 'e2')})) > 0)) > 0"
    )
    return (
        f"({edge_cross}"
        f" OR {duck_point_in_polygon(pa + '[1]', pb)}"
        f" OR {duck_point_in_polygon(pb + '[1]', pa)})"
    )


# -- memoized predicate entry points (construction-cost control) --------
# Building the nested exists/filter lambda trees costs ~0.3-0.6s of
# py4j driver time per call; the expressions only depend on column
# NAMES, so the common predicates are memoized process-wide (same
# rationale as extensions/similarity._EXPR_CACHE).

_GEO_CACHE: dict[str, Column] = {}


def cached_intersects_pred(pa_name: str, pb_name: str) -> Column:
    """``envelopes_overlap AND polygon_intersects`` over two polygon
    columns, memoized by column names. Catalyst's And short-circuits,
    so the exact crossing tests only run on envelope-overlapping
    pairs."""
    key = f"ix:{pa_name}:{pb_name}"
    if key not in _GEO_CACHE:
        pa, pb = F.col(pa_name), F.col(pb_name)
        _GEO_CACHE[key] = (envelopes_overlap(pa, pb)
                           & polygon_intersects(pa, pb))
    return _GEO_CACHE[key]
