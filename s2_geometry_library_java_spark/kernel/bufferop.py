"""G3: polygon buffering with true offset geometry (S2BufferOperation.java:28+).

Produces the buffered POLYGON (Minkowski sum with a spherical disc of the
given radius), not just a covering approximation: each boundary edge is
offset outward along its small circle at distance r, convex vertices get
round joins (arcs of the radius-r circle around the vertex), and the
resulting offset curves are resolved into a clean polygon with the G4
winding operation — exactly the reference's architecture
(S2BufferOperation tessellates offset curves to a tolerance and feeds them
to S2WindingOperation). The boundary is therefore accurate to ``max_error``
radians, the same contract as the reference's error-fraction option.

Holes (XOR loops nested at odd depth) shrink: their boundaries are
traversed reversed so the offset moves into the hole and the winding
contribution cancels the shell over the vanished region, which also makes
radius >= hole inradius degenerate gracefully (the hole disappears).

Scope: both signs of radius. Positive radius grows (Minkowski sum);
negative radius erodes (|radius|-disc fully inside — the reference's
negative-radius semantics), verified against the distance oracle including
holes. BufferedRegion (kernel/region.py) remains the covering-tier
pre-filter for joins.
"""

from __future__ import annotations

import numpy as np

from . import region as rg
from . import windingop


def _rotate_about(axis: np.ndarray, v: np.ndarray, ang: np.ndarray) -> np.ndarray:
    """Rodrigues rotation of v (or rows of v) around unit axis by ang."""
    v = np.atleast_2d(v)
    ang = np.atleast_1d(ang)[:, None]
    k = axis[None, :]
    kxv = np.cross(np.broadcast_to(k, v.shape), v)
    kdv = (v @ axis)[:, None]
    return v * np.cos(ang) + kxv * np.sin(ang) + k * kdv * (1 - np.cos(ang))


def _offset_loop(
    vertices: np.ndarray, radius: float, max_error: float, outward: bool = True
) -> np.ndarray:
    """Tessellated offset curve at distance ``radius`` beside the directed
    boundary — on the RIGHT when ``outward`` (the exterior of a CCW
    shell, growth) or on the LEFT (erosion). Round joins appear at the
    vertices where the two offset pieces leave a gap (left turns when
    outward, right turns when inward); at the opposite turns the pieces
    overshoot and cross, and the winding resolution cancels the spur.
    Sample spacing keeps the sagitta of each small-circle arc under
    max_error."""
    v = np.asarray(vertices, dtype=np.float64)
    n = len(v)
    cr, sr = float(np.cos(radius)), float(np.sin(radius))
    side = -1.0 if outward else 1.0  # multiplier on the left normal
    # max angular step so the chord-vs-arc sagitta stays under max_error
    step = 2.0 * np.sqrt(2.0 * max_error / max(sr, max_error))
    out = []
    for i in range(n):
        a, b, c = v[i], v[(i + 1) % n], v[(i + 2) % n]
        nrm = np.cross(a, b)
        nrm = nrm / np.linalg.norm(nrm)  # left normal of a->b
        length = float(np.arccos(np.clip(a @ b, -1.0, 1.0)))
        k = max(1, int(np.ceil(length / step)))
        t = np.linspace(0.0, 1.0, k + 1)
        sl = np.sin((1 - t) * length)[:, None]
        st = np.sin(t * length)[:, None]
        e = (sl * a[None, :] + st * b[None, :]) / np.sin(length)
        e = e / np.linalg.norm(e, axis=1, keepdims=True)
        out.append(cr * e + sr * side * nrm[None, :])
        nrm2 = np.cross(b, c)
        nrm2 = nrm2 / np.linalg.norm(nrm2)
        d1, d2 = side * nrm, side * nrm2
        # signed sweep from d1 to d2 around axis b; a gap (needing an arc)
        # opens on positive sweeps when outward, negative when inward
        sweep = float(
            np.arctan2(float(np.cross(d1, d2) @ b), float(np.clip(d1 @ d2, -1, 1)))
        )
        need_arc = sweep > 1e-15 if outward else sweep < -1e-15
        if need_arc:
            kk = max(1, int(np.ceil(abs(sweep) / step)))
            ang = np.linspace(0.0, sweep, kk + 1)[1:-1]
            if len(ang):
                start = cr * b + sr * d1
                out.append(_rotate_about(b, start, ang))
    pts = np.concatenate(out, axis=0)
    # drop consecutive duplicates (shared endpoints of adjacent pieces)
    keep = np.ones(len(pts), dtype=bool)
    keep[1:] = np.linalg.norm(np.diff(pts, axis=0), axis=1) > 1e-15
    pts = pts[keep]
    if np.linalg.norm(pts[0] - pts[-1]) <= 1e-15:
        pts = pts[:-1]
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def _loop_depths(poly: "rg.Polygon") -> list[int]:
    """Nesting depth of each XOR loop (hole iff odd): number of OTHER
    loops containing its first vertex."""
    depths = []
    for i, lp in enumerate(poly.loops):
        p = lp.vertices[0]
        d = 0
        for j, other in enumerate(poly.loops):
            if j != i and bool(
                other.contains_points(p[0:1], p[1:2], p[2:3])[0]
            ):
                d += 1
        depths.append(d)
    return depths


def buffer_polygon(
    poly: "rg.Polygon",
    radius: float,
    max_error: float = 1e-6,
    snap_radius: float = 1e-10,
) -> "rg.Polygon":
    """Minkowski sum of the polygon with a disc of ``radius`` radians
    (positive = growth), or the EROSION by |radius| (negative: the points
    whose whole radius-disc lies inside — S2BufferOperation's negative
    radii). Boundary accurate to ``max_error``. The reference point for
    the winding resolution is the antipode of the first shell's first
    vertex — callers buffering near-hemispheric geometry should keep
    results under a hemisphere (the engine-wide loop contract)."""
    if radius == 0:
        raise ValueError("buffer radius must be nonzero")
    if not poly.loops:
        return rg.Polygon([])
    outward = radius > 0
    depths = _loop_depths(poly)
    offset_loops = []
    for lp, depth in zip(poly.loops, depths):
        verts = lp.vertices if depth % 2 == 0 else lp.vertices[::-1]
        offset_loops.append(
            _offset_loop(verts, abs(radius), max_error, outward=outward)
        )
    ref = -poly.loops[0].vertices[0]
    return windingop.winding_operation(
        offset_loops, ref, 0, "positive", snap_radius=snap_radius
    )
