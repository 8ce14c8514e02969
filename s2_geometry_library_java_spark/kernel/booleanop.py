"""G1: polygon boolean operations (intersection / union / difference) for
GENERIC-POSITION inputs.

The reference's construction (S2Polygon.initToIntersection/initToUnion/
initToDifference, S2Polygon.java:1645-2100) is: clip A's boundary to the
(interior/exterior) of B, clip B's boundary likewise, and assemble the kept
directed segments into loops. The full S2Builder snap-rounding framework
exists to make that robust under degeneracies (shared vertices, tangent
edges, near-coincident geometry); this kernel implements the same
construction for inputs in general position — no shared vertices, no
tangencies, proper crossings only — which covers real-world query geometry.
Degenerate inputs raise instead of producing silently-wrong output.

Crossing points are computed ONCE per (edgeA, edgeB) pair and reused by
both clip passes, so chained segment endpoints match exactly (bit-equal
tuples) and assembly is a dict walk, no merge radius needed.

At engine scale this runs per polygon PAIR inside applyInPandas over
candidate pairs from a covering range join; polygons are small (the
reference's own boolean ops are single-threaded per pair too).
"""

from __future__ import annotations

import numpy as np

from . import edges as ek
from . import region as rg
from . import sphere


def _loop_edges(poly: "rg.Polygon"):
    for lp in poly.loops:
        v = lp.vertices
        for k in range(len(v)):
            yield v[k], v[(k + 1) % len(v)]


def _crossings_for_edge(a, b, other: "rg.Polygon", cross_cache: dict):
    """Intersection points of edge (a,b) with every edge of `other`,
    computed through a shared cache keyed by both edges' endpoints."""
    from . import predicates

    pts = []
    for c, d in _loop_edges(other):
        if (
            np.array_equal(a, c) or np.array_equal(a, d)
            or np.array_equal(b, c) or np.array_equal(b, d)
        ):
            raise ValueError("boolean op requires generic position (shared vertex)")
        if predicates._arcs_cross_scalar(a, b, c, d):
            key = (tuple(a), tuple(b), tuple(c), tuple(d))
            rkey = (tuple(c), tuple(d), tuple(a), tuple(b))
            if key in cross_cache:
                x = cross_cache[key]
            elif rkey in cross_cache:
                x = cross_cache[rkey]
            else:
                x = tuple(
                    ek.edge_intersection(a[None], b[None], c[None], d[None])[0]
                )
                cross_cache[key] = x
            pts.append(np.array(x))
    return pts


def _midpoint(a, b):
    m = a + b
    n = float(np.sqrt(m @ m))
    if n < 1e-12:
        raise ValueError("antipodal sub-segment (not generic position)")
    return m / n


def _clip_boundary(poly: "rg.Polygon", other: "rg.Polygon", keep_inside: bool,
                   reverse: bool, cross_cache: dict):
    """Directed sub-segments of poly's boundary whose midpoint is inside
    (or outside) `other`; optionally reversed (for difference)."""
    segs = []
    for a, b in _loop_edges(poly):
        xs = _crossings_for_edge(a, b, other, cross_cache)
        # order crossings along the edge by angle from a
        xs.sort(key=lambda p: float(
            sphere.angle_between(a[0], a[1], a[2], p[0], p[1], p[2])
        ))
        chain = [a] + xs + [b]
        for s, e in zip(chain, chain[1:]):
            m = _midpoint(s, e)
            inside = bool(other.contains_points(m[0:1], m[1:2], m[2:3])[0])
            if inside == keep_inside:
                segs.append((tuple(e), tuple(s)) if reverse else (tuple(s), tuple(e)))
    return segs


def _assemble(segs) -> "rg.Polygon":
    """Chain directed segments into loops (endpoints match exactly)."""
    by_start: dict = {}
    for s, e in segs:
        if s in by_start:
            raise ValueError("non-manifold boundary (not generic position)")
        by_start[s] = e
    loops = []
    while by_start:
        start = next(iter(by_start))
        verts = [start]
        cur = by_start.pop(start)
        guard = len(segs) + 1
        while cur != start:
            verts.append(cur)
            cur = by_start.pop(cur)
            guard -= 1
            if guard == 0:
                raise ValueError("boundary did not close (not generic position)")
        # Normalize orientation for the engine's XOR-loop convention (hole
        # loops stored CCW-small): a chained loop whose CCW interior spans
        # more than a hemisphere is a hole traversed backwards — reverse
        # it. (Limits results to regions under a hemisphere per loop, like
        # the generic-position contract above.)
        lp = rg.Loop(np.array(verts))
        if sphere.signed_loop_area(lp.vertices) > 2.0 * np.pi:
            lp = rg.Loop(np.array(verts[::-1]))
        loops.append(lp)
    return rg.Polygon(loops)


def _no_crossing_case(a: "rg.Polygon", b: "rg.Polygon", op: str) -> "rg.Polygon":
    pa = a.loops[0].vertices[0]
    pb = b.loops[0].vertices[0]
    a_in_b = bool(b.contains_points(pa[0:1], pa[1:2], pa[2:3])[0])
    b_in_a = bool(a.contains_points(pb[0:1], pb[1:2], pb[2:3])[0])
    empty = rg.Polygon([])
    if op == "intersection":
        return a if a_in_b else (b if b_in_a else empty)
    if op == "union":
        if a_in_b:
            return b
        if b_in_a:
            return a
        return rg.Polygon(list(a.loops) + list(b.loops))  # disjoint multi-loop
    if op == "difference":
        if a_in_b:
            return empty
        if b_in_a:
            # A with a B-shaped hole: XOR-loop convention (hole loop as-is)
            return rg.Polygon(list(a.loops) + list(b.loops))
        return a
    raise ValueError(op)


def boolean_op(a: "rg.Polygon", b: "rg.Polygon", op: str) -> "rg.Polygon":
    """intersection | union | difference of two generic-position polygons.

    intersection: A-boundary inside B  +  B-boundary inside A
    union:        A-boundary outside B +  B-boundary outside A
    difference:   A-boundary outside B +  B-boundary inside A, reversed
    (S2Polygon.java:1747-1756, 1874-1882, 2012-2020 comment blocks.)
    """
    cache: dict = {}
    if op == "intersection":
        segs = _clip_boundary(a, b, True, False, cache) + _clip_boundary(
            b, a, True, False, cache
        )
    elif op == "union":
        segs = _clip_boundary(a, b, False, False, cache) + _clip_boundary(
            b, a, False, False, cache
        )
    elif op == "difference":
        segs = _clip_boundary(a, b, False, False, cache) + _clip_boundary(
            b, a, True, True, cache
        )
    else:
        raise ValueError(op)
    if not segs:
        return _no_crossing_case(a, b, op)
    return _assemble(segs)


def intersection(a, b):
    return boolean_op(a, b, "intersection")


def union(a, b):
    return boolean_op(a, b, "union")


def difference(a, b):
    return boolean_op(a, b, "difference")
