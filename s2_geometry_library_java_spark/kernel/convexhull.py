"""G5: spherical convex hull (S2ConvexHullQuery.java:146-236).

Andrew's monotone chain around an origin O = ortho(bounding-cap axis):
points sort CCW around O (all points lie on one side of a geodesic through
O when the bounding cap is convex), then two maximal left-turn chains are
combined. Orientation signs use the exact-escalating predicate cascade, so
collinear inputs resolve deterministically.
"""

from __future__ import annotations

import functools

import numpy as np

from . import predicates


#: The reference's full loop: a single fake vertex at Z_NEG
#: (S2Loop.java:103 FULL_VERTEX, S2Loop.full()).
FULL_LOOP = np.array([[0.0, 0.0, -1.0]])


def is_full_hull(hull: np.ndarray | None) -> bool:
    """True iff ``hull`` is the full-sphere loop sentinel."""
    return (
        hull is not None and len(hull) == 1 and bool((hull[0] == FULL_LOOP[0]).all())
    )


def convex_hull(points: np.ndarray) -> np.ndarray:
    """(m,3) hull loop vertices in CCW order, a superset-free subset of
    the inputs. When the points span a hemisphere or more, returns the
    FULL loop — a single Z_NEG vertex, exactly the reference's semantics
    (S2ConvexHullQuery.java:137-153: geometry spanning more than half the
    sphere hulls to S2Loop.full(); :255-265 antipodal pairs likewise).
    Fewer than 3 distinct points return them as-is (callers pad like
    getSinglePointLoop if a valid loop is required)."""
    pts = np.asarray(points, dtype=np.float64)
    if len(pts) == 0:
        return pts
    centroid = pts.mean(axis=0)
    n = float(np.sqrt(centroid @ centroid))
    if n < 1e-12:
        return FULL_LOOP.copy()
    axis = centroid / n
    # convexity precondition (cap height < 1): every point strictly within
    # 90 degrees of the axis
    if float((pts @ axis).min()) <= 0:
        return FULL_LOOP.copy()
    origin = predicates.ortho(axis)

    def cmp(x, y):
        s = predicates._sign1(origin, np.asarray(x), np.asarray(y))
        return -s  # sign > 0 means x < y (CCW-around-origin order)

    unique = list({tuple(p) for p in pts})
    unique.sort(key=functools.cmp_to_key(cmp))
    if len(unique) < 3:
        return np.array(unique)

    def chain(seq):
        out: list = []
        for p in seq:
            pa = np.asarray(p)
            while len(out) >= 2 and predicates._sign1(
                np.asarray(out[-2]), np.asarray(out[-1]), pa
            ) <= 0:
                out.pop()
            out.append(p)
        return out

    lower = chain(unique)
    upper = chain(list(reversed(unique)))
    assert lower[0] == upper[-1] and lower[-1] == upper[0]
    hull = lower[:-1] + upper[:-1]
    return np.array(hull)
