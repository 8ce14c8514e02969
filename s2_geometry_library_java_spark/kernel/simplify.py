"""G6: polyline simplification — faithful port of
S2Polyline.subsampleVertices / findEndVertex (S2Polyline.java:445-545).

Greedy, order-preserving (NOT Douglas-Peucker): from each kept vertex,
extend the output segment as far as possible while a ray from the start
can pass within ``tolerance`` of every interior vertex IN ORDER — tracked
as a shrinking wedge of ray angles in the start vertex's tangent frame.
Parametric equivalence is preserved (backtracking survives), simplified
edges stay under 90 degrees.
"""

from __future__ import annotations

import numpy as np

from . import predicates


def _wrap(a: float) -> float:
    return float((a + np.pi) % (2.0 * np.pi) - np.pi)


def _find_end_vertex(v: np.ndarray, tol: float, index: int) -> int:
    """Maximal end index such that the segment from v[index] passes within
    tol of all interior vertices, in order (S2Polyline.java:468-545)."""
    origin = v[index]
    p1 = predicates.ortho(origin)  # S2.getFrame: p1 = ortho(p0)
    p2 = np.cross(p1, origin)
    p2 = p2 / np.linalg.norm(p2)
    full = True
    mid = 0.0
    half = 0.0
    last_distance = 0.0
    sin_tol = np.sin(tol)
    i = index + 1
    while i < len(v):
        candidate = v[i]
        distance = float(
            np.arctan2(np.linalg.norm(np.cross(origin, candidate)), origin @ candidate)
        )
        # no simplified edges longer than 90 degrees (numeric stability)
        if distance > np.pi / 2 and last_distance > 0:
            break
        # vertices must come in increasing order along the ray, except
        # inside the initial tolerance disc around the origin
        if distance < last_distance and last_distance > tol:
            break
        last_distance = distance
        # points within tolerance of the origin don't constrain the ray
        if distance <= tol:
            i += 1
            continue
        center = float(np.arctan2(p1 @ candidate, p2 @ candidate))
        if not full and abs(_wrap(center - mid)) > half:
            break
        # spherical law of sines: half-angle of the allowable wedge
        half_angle = float(np.arcsin(min(1.0, sin_tol / np.sin(distance))))
        if full:
            full = False
            mid, half = center, half_angle
        else:
            delta = _wrap(center - mid)
            lo = max(-half, delta - half_angle)
            hi = min(half, delta + half_angle)
            mid = _wrap(mid + 0.5 * (lo + hi))
            half = 0.5 * (hi - lo)
        i += 1
    return max(index + 1, i - 1)


def subsample_vertices(vertices: np.ndarray, tolerance_rad: float) -> list[int]:
    """Indices of the kept vertices (S2Polyline.subsampleVertices :445-461).
    Negative tolerances clamp to 0 (keep everything except duplicates)."""
    v = np.asarray(vertices, dtype=np.float64)
    if len(v) == 0:
        return []
    tol = max(float(tolerance_rad), 0.0)
    results = [0]
    i = 0
    while i < len(v) - 1:
        nxt = _find_end_vertex(v, tol, i)
        if not np.array_equal(v[nxt], v[i]):
            results.append(nxt)
        i = nxt
    return results
