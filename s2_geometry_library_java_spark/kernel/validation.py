"""G7: geometry validation queries (S2Loop.findValidationError
S2Loop.java:1439-1530 + S2ShapeUtil.findSelfIntersection semantics).

Returns an error STRING (or None when valid) so callers can surface it as
a column in data-quality pipelines; the per-edge self-intersection test
reuses the robust crossing predicates.
"""

from __future__ import annotations

import numpy as np

from . import predicates


def _point_on_closed_edge(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> bool:
    """p lies on the closed minor arc [a, b]: exactly collinear with the
    edge's great circle (exact-rational zero, no perturbation) and within
    the arc span (for non-antipodal a,b: p.a >= a.b and p.b >= a.b)."""
    if predicates._exact_sign_one(a, b, p, perturb=False) != 0:
        return False
    ab = float(a @ b)
    return float(p @ a) >= ab and float(p @ b) >= ab


def _edges_touch_improperly(a, b, c, d) -> bool:
    """Degenerate intersection of edges AB, CD that share NO vertex: a
    vertex of one lies in the other's closed arc (covers interior-touch
    and collinear overlap — overlapping co-circular arcs always contain
    one of the four endpoints)."""
    return (
        _point_on_closed_edge(c, a, b)
        or _point_on_closed_edge(d, a, b)
        or _point_on_closed_edge(a, c, d)
        or _point_on_closed_edge(b, c, d)
    )


def find_loop_validation_error(vertices: np.ndarray) -> str | None:
    """None when the vertex list forms a valid loop; else a message:
    too-few/non-unit/duplicate-or-adjacent-degenerate vertices, antipodal
    adjacent vertices, or crossing edges (self-intersection)."""
    v = np.asarray(vertices, dtype=np.float64)
    if len(v) < 3:
        return f"loop has {len(v)} vertices (minimum 3)"
    norms = (v * v).sum(axis=1)
    if not np.all(np.abs(norms - 1.0) <= 5e-14):
        return "vertex is not unit length"
    nxt = np.roll(v, -1, axis=0)
    if np.any(np.all(v == nxt, axis=1)):
        k = int(np.nonzero(np.all(v == nxt, axis=1))[0][0])
        return f"edge {k} is degenerate (duplicate vertex)"
    if np.any(np.all(v == -nxt, axis=1)):
        k = int(np.nonzero(np.all(v == -nxt, axis=1))[0][0])
        return f"vertices {k} and {(k + 1) % len(v)} are antipodal"
    # duplicate (non-adjacent) vertices also invalidate a loop
    seen: dict = {}
    for i, p in enumerate(map(tuple, v)):
        if p in seen:
            return f"vertices {seen[p]} and {i} are duplicates"
        seen[p] = i
    # self-intersection: any non-adjacent edge pair that crosses or shares
    # an interior point. Non-adjacent edges in a valid loop share no vertex
    # (duplicates rejected above), so a degenerate touch — a vertex in the
    # interior of another edge, or collinear overlap — is just as invalid
    # as a proper crossing (the reference's crossingSign >= 0 semantics).
    n = len(v)
    for i in range(n):
        a, b = v[i], nxt[i]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue  # adjacent edges share a vertex legitimately
            c, d = v[j], nxt[j]
            if predicates._arcs_cross_scalar(a, b, c, d):
                return f"edges {i} and {j} cross"
            if _edges_touch_improperly(a, b, c, d):
                return f"edges {i} and {j} touch degenerately"
    return None


def find_polygon_validation_error(loops: list[np.ndarray]) -> str | None:
    """Per-loop validity plus cross-loop edge crossings (S2Polygon
    findValidationError: loops may nest but never cross)."""
    for k, lp in enumerate(loops):
        err = find_loop_validation_error(lp)
        if err is not None:
            return f"loop {k}: {err}"
    for k1 in range(len(loops)):
        v1 = np.asarray(loops[k1])
        n1 = np.roll(v1, -1, axis=0)
        for k2 in range(k1 + 1, len(loops)):
            v2 = np.asarray(loops[k2])
            n2 = np.roll(v2, -1, axis=0)
            for i in range(len(v1)):
                for j in range(len(v2)):
                    a, b, c, d = v1[i], n1[i], v2[j], n2[j]
                    if predicates._arcs_cross_scalar(a, b, c, d):
                        return f"loop {k1} edge {i} crosses loop {k2} edge {j}"
                    # loops may legitimately share vertices (nested loops
                    # touching); only a vertex in the INTERIOR of a foreign
                    # edge / collinear overlap is degenerate
                    shared = any(
                        np.array_equal(p, q) for p in (a, b) for q in (c, d)
                    )
                    if not shared and _edges_touch_improperly(a, b, c, d):
                        return (
                            f"loop {k1} edge {i} touches loop {k2} edge {j} "
                            "degenerately"
                        )
    return None
