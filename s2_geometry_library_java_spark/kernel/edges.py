"""Geodesic edge math (A21 + B9): robust cross products, point<->edge
distances, closest-point projection, interpolation.

Parity targets: S2RobustCrossProd.java:62-205 (robustCrossProd with the
stable (b+a)x(b-a) form and exact/symbolic escalation), S2EdgeUtil.java:
2091-2302 (updateMinDistance / maybeUpdateMinInteriorDistance /
updateMaxDistance), :2661-2714 (project / getClosestPoint), :2884-2975
(interpolate / interpolateAtDistance).

All kernels are batch numpy over (n,3) float64 unit vectors; the exact
escalation paths run per-row on the (expected ~zero) residue, preserving
the no-per-row-Python contract for the fast path.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from . import predicates
from .sphere import cross3

DBL_EPSILON = float(np.finfo(np.float64).eps)
DBL_ERROR = 0.5 * DBL_EPSILON
_SQRT3 = float(np.sqrt(3.0))

#: S2.java:97 — stable-path norm floor before exact escalation, derived from
#: the ROBUST_CROSS_PROD_ERROR = 8*DBL_ERROR budget.
MIN_NORM = (32.0 * _SQRT3 * DBL_ERROR) / (8.0 - (1.0 + 2.0 * _SQRT3))
MIN_NORM2 = MIN_NORM * MIN_NORM


# ---------------------------------------------------------------------------
# B9: robustCrossProd
# ---------------------------------------------------------------------------

def _symbolic_cross_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """symbolicCrossProdSorted (S2RobustCrossProd.java:214-288): first
    nonzero perturbation coefficient for exactly-collinear sorted a < b."""
    if b[0] != 0 or b[1] != 0:  # da[2]
        return np.array([-b[1], b[0], 0.0])
    if b[2] != 0:  # da[1]
        return np.array([b[2], 0.0, 0.0])
    if a[0] != 0 or a[1] != 0:  # db[2]
        return np.array([a[1], -a[0], 0.0])
    return np.array([1.0, 0.0, 0.0])  # db[2] * da[1]


def _ensure_normalizable(p: np.ndarray) -> np.ndarray:
    """Scale by the largest |component| when too small to normalize without
    underflow (S2RobustCrossProd.ensureNormalizable)."""
    m = float(np.max(np.abs(p)))
    if m == 0.0:
        return p
    if m >= 2.0 ** -242:
        return p
    return p / m


def _exact_cross_one(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """exactCrossProd (S2RobustCrossProd.java:90-114): exact rational cross
    of (b+a) x (b-a); symbolic perturbation for exactly collinear inputs."""
    if np.array_equal(a, b):
        return predicates.ortho(a)
    af = [Fraction(float(v)) for v in a]
    bf = [Fraction(float(v)) for v in b]
    s = [bf[i] + af[i] for i in range(3)]
    d = [bf[i] - af[i] for i in range(3)]
    c = [
        s[1] * d[2] - s[2] * d[1],
        s[2] * d[0] - s[0] * d[2],
        s[0] * d[1] - s[1] * d[0],
    ]
    if any(v != 0 for v in c):
        m = max(abs(v) for v in c)
        return np.array([float(v / m) for v in c])
    # exactly collinear: symbolic perturbation, anti-symmetrized by sort
    ta, tb = tuple(float(v) for v in a), tuple(float(v) for v in b)
    if ta < tb:
        return _ensure_normalizable(_symbolic_cross_sorted(np.asarray(a), np.asarray(b)))
    return -_ensure_normalizable(_symbolic_cross_sorted(np.asarray(b), np.asarray(a)))


def robust_cross_prod(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Batch robustCrossProd: (n,3),(n,3) -> (n,3). Stable (b+a) x (b-a)
    (exactly 2*(a x b) mathematically, numerically near-orthogonal to both
    inputs); rows below MIN_NORM escalate to exact rationals / symbolic.
    Result is NOT normalized (callers use it in scale-free ratios)."""
    a = np.atleast_2d(np.asarray(a, dtype=np.float64))
    b = np.atleast_2d(np.asarray(b, dtype=np.float64))
    a, b = np.broadcast_arrays(a, b)
    out = cross3(b + a, b - a)
    n2 = (out * out).sum(axis=-1)
    bad = n2 < MIN_NORM2
    if np.any(bad):
        flat = out.reshape(-1, 3)
        fa = np.ascontiguousarray(a).reshape(-1, 3)
        fb = np.ascontiguousarray(b).reshape(-1, 3)
        for i in np.nonzero(bad.reshape(-1))[0]:
            flat[i] = _exact_cross_one(fa[i], fb[i])
        out = flat.reshape(out.shape)
    return out


# ---------------------------------------------------------------------------
# A21: point <-> edge chord distances
# ---------------------------------------------------------------------------

def min_chord2_to_edges(x: np.ndarray, a: np.ndarray, b: np.ndarray,
                        c: np.ndarray | None = None) -> np.ndarray:
    """Min squared-chord distance from each point to each edge, broadcast.

    x, a, b: broadcastable (...,3) unit vectors; c optionally the
    precomputed robust_cross_prod(a, b) (reuse it when one edge set is
    tested against many points). Returns (...) chord2 in [0,4].

    Mirrors maybeUpdateMinInteriorDistance (S2EdgeUtil.java:2214-2302):
    conservative planar acute-angle test, wedge sign test via cx = c x x,
    interior distance XQ^2 + QR^2; endpoint min otherwise.
    """
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    xa = x - a
    xb = x - b
    xa2 = (xa * xa).sum(axis=-1)
    xb2 = (xb * xb).sum(axis=-1)
    endpoint = np.minimum(xa2, xb2)
    ab = a - b
    ab2 = (ab * ab).sum(axis=-1)
    max_error = 4.75 * DBL_EPSILON * (xa2 + xb2 + ab2) + 8.0 * DBL_EPSILON * DBL_EPSILON
    planar_ok = np.abs(xa2 - xb2) < ab2 + max_error
    if c is None:
        c = robust_cross_prod(a, b)
    c = np.asarray(c, dtype=np.float64)
    c2 = (c * c).sum(axis=-1)
    x_dot_c = (x * c).sum(axis=-1)
    x_dot_c2 = x_dot_c * x_dot_c
    cx = cross3(np.broadcast_to(c, np.broadcast_shapes(c.shape, x.shape)), x)
    interior = (
        planar_ok
        & (((a - x) * cx).sum(axis=-1) < 0)
        & (((b - x) * cx).sum(axis=-1) > 0)
        & (c2 > 0)
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        qr = 1.0 - np.sqrt((cx * cx).sum(axis=-1) / c2)
        dist2 = x_dot_c2 / c2 + qr * qr
    out = np.where(interior, np.minimum(dist2, endpoint), endpoint)
    return np.minimum(out, 4.0)


def min_chord2_points_to_chain(points: np.ndarray, va: np.ndarray,
                               vb: np.ndarray) -> np.ndarray:
    """(n,) min chord2 from each of n points to the closest of m edges
    (va[k], vb[k]). Full (n,m) broadcast; callers batch to bound memory."""
    p = np.asarray(points, dtype=np.float64)[:, None, :]  # (n,1,3)
    a = np.asarray(va, dtype=np.float64)[None, :, :]  # (1,m,3)
    b = np.asarray(vb, dtype=np.float64)[None, :, :]
    c = robust_cross_prod(va, vb)[None, :, :]
    d = min_chord2_to_edges(p, a, b, c)  # (n,m)
    return d.min(axis=1)


def max_chord2_to_edges(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """updateMaxDistance (S2EdgeUtil.java:2305-2324): max chord2 from x to
    edge ab — endpoint max, recomputed via the antipode when > 90 deg."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    xa = x - a
    xb = x - b
    d = np.maximum((xa * xa).sum(axis=-1), (xb * xb).sum(axis=-1))
    far = d > 2.0  # S1ChordAngle.RIGHT.length2 == 2
    if np.any(far):
        dmin = min_chord2_to_edges(-x, a, b)
        # STRAIGHT - dist: chord2 subtraction (S1ChordAngle.sub):
        # length2 = (2 sin(pi/2 - th/2))^2 = 4 - l2*(4-l2) ... use angles
        sub = (2.0 * np.sin(np.pi / 2 - np.arcsin(0.5 * np.sqrt(np.minimum(dmin, 4.0))))) ** 2
        d = np.where(far, np.maximum(d, sub), d)
    return np.minimum(d, 4.0)


def project_to_edges(x: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Closest point on edge AB to X (S2EdgeUtil.project :2661-2714),
    broadcastable (...,3) -> (...,3)."""
    x = np.asarray(x, dtype=np.float64)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    x, a, b = np.broadcast_arrays(x, a, b)
    c = robust_cross_prod(a.reshape(-1, 3), b.reshape(-1, 3)).reshape(x.shape)
    n = c / np.sqrt((c * c).sum(axis=-1, keepdims=True))
    nx = robust_cross_prod(n.reshape(-1, 3), x.reshape(-1, 3)).reshape(x.shape)
    p = cross3(nx, n)
    p = p / np.sqrt((p * p).sum(axis=-1, keepdims=True))
    # interior iff sign(p,n,a) > 0 and sign(p,n,b) < 0
    sa = predicates.sign_batch(p.reshape(-1, 3), n.reshape(-1, 3), a.reshape(-1, 3))
    sb = predicates.sign_batch(p.reshape(-1, 3), n.reshape(-1, 3), b.reshape(-1, 3))
    interior = ((sa > 0) & (sb < 0)).reshape(x.shape[:-1])
    xa = x - a
    xb = x - b
    nearer_a = (xa * xa).sum(axis=-1) <= (xb * xb).sum(axis=-1)
    endpoint = np.where(nearer_a[..., None], a, b)
    out = np.where(interior[..., None], p, endpoint)
    # exact-endpoint short-circuit (project returns x when x == a or x == b)
    eq_a = np.all(x == a, axis=-1)
    eq_b = np.all(x == b, axis=-1)
    return np.where((eq_a | eq_b)[..., None], x, out)


# ---------------------------------------------------------------------------
# A21: interpolation along edges
# ---------------------------------------------------------------------------

def interpolate_at_distance(ax_radians, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Point at angular distance ax from A along the great circle toward B
    (S2EdgeUtil.getPointOnLine :2781-2794: rotate A by ax in the plane
    spanned by A and dir = normalize(rcp(a,b) x a)); extrapolates outside
    [0, ab]. Broadcastable."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    a, b = np.broadcast_arrays(a, b)
    ax = np.asarray(ax_radians, dtype=np.float64)
    n = robust_cross_prod(a.reshape(-1, 3), b.reshape(-1, 3)).reshape(a.shape)
    d = cross3(n, a)
    norm = np.sqrt((d * d).sum(axis=-1, keepdims=True))
    with np.errstate(divide="ignore", invalid="ignore"):
        d = d / norm
    out = np.cos(ax)[..., None] * a + np.sin(ax)[..., None] * d
    # renormalize to keep repeated interpolations on the unit sphere
    out = out / np.sqrt((out * out).sum(axis=-1, keepdims=True))
    # ax == 0 (also covers the a == b degenerate edge) -> a exactly
    zero = np.broadcast_to(ax == 0, out.shape[:-1])
    return np.where(zero[..., None], np.broadcast_to(a, out.shape), out)


def interpolate(a: np.ndarray, b: np.ndarray, t) -> np.ndarray:
    """Point the fraction t of the way from A to B along the geodesic
    (S2EdgeUtil.interpolate :2939-2950). t outside [0,1] extrapolates."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    from . import sphere

    ab = sphere.angle_between(
        a[..., 0], a[..., 1], a[..., 2], b[..., 0], b[..., 1], b[..., 2]
    )
    out = interpolate_at_distance(t * ab, a, b)
    one = np.broadcast_to(t == 1.0, out.shape[:-1])
    return np.where(one[..., None], np.broadcast_to(b, out.shape), out)


def project_to_chain(points: np.ndarray, va: np.ndarray, vb: np.ndarray):
    """G8 S2Polyline.project/uninterpolate: closest point on the chain of
    edges (va[k], vb[k]) for each query point. Returns (projected (n,3),
    segment index (n,), chord2 (n,))."""
    p = np.asarray(points, dtype=np.float64)
    a = np.asarray(va, dtype=np.float64)
    b = np.asarray(vb, dtype=np.float64)
    c = robust_cross_prod(a, b)
    d = min_chord2_to_edges(p[:, None, :], a[None, :, :], b[None, :, :], c[None, :, :])
    seg = d.argmin(axis=1)
    proj = project_to_edges(p, a[seg], b[seg])
    return proj, seg.astype(np.int64), d.min(axis=1)


def edge_intersection(a: np.ndarray, b: np.ndarray, c: np.ndarray,
                      d: np.ndarray) -> np.ndarray:
    """Intersection point of crossing edges AB and CD (S2EdgeUtil
    getIntersection :2017 simple form): normalize(rcp(rcp(a,b), rcp(c,d)))
    oriented to the hemisphere of the edge midpoints. REQUIRES the edges
    actually cross (use the crossing predicates first)."""
    ab = robust_cross_prod(a, b)
    cd = robust_cross_prod(c, d)
    x = robust_cross_prod(ab, cd)
    n = np.sqrt((x * x).sum(axis=-1, keepdims=True))
    x = x / n
    # orient toward the crossing: the true intersection has positive dot
    # with (a+b) and (c+d) sums
    ref = (np.asarray(a) + np.asarray(b) + np.asarray(c) + np.asarray(d))
    flip = (x * ref).sum(axis=-1) < 0
    return np.where(flip[..., None], -x, x)


def edge_pair_min_chord2(a0, a1, b0, b1) -> np.ndarray:
    """Min squared-chord distance between edge pairs (A0A1, B0B1) —
    S2EdgeUtil.getEdgePairDistance: zero when the edges cross, else the
    minimum of the four endpoint-to-other-edge distances. Broadcasts over
    leading dimensions; uses the robust crossing cascade, so
    crossing-or-touching pairs report exactly 0."""
    from . import predicates

    a0 = np.asarray(a0, dtype=np.float64)
    a1 = np.asarray(a1, dtype=np.float64)
    b0 = np.asarray(b0, dtype=np.float64)
    b1 = np.asarray(b1, dtype=np.float64)
    acb = predicates.sign_batch(a0, b0, a1)
    bda = predicates.sign_batch(a1, b1, a0)
    cbd = predicates.sign_batch(b0, a1, b1)
    dac = predicates.sign_batch(b1, a0, b0)
    # robustCrossing >= 0 (proper crossing or shared/touching vertex)
    crossing = (acb == bda) & (acb == cbd) & (acb == dac) & (acb != 0)
    touching = (
        np.all(a0 == b0, axis=-1) | np.all(a0 == b1, axis=-1)
        | np.all(a1 == b0, axis=-1) | np.all(a1 == b1, axis=-1)
    )
    d = np.minimum(
        np.minimum(
            min_chord2_to_edges(a0, b0, b1), min_chord2_to_edges(a1, b0, b1)
        ),
        np.minimum(
            min_chord2_to_edges(b0, a0, a1), min_chord2_to_edges(b1, a0, a1)
        ),
    )
    return np.where(crossing | touching, 0.0, d)
