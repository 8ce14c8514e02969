"""G6: edge tessellation between geodesics and 2D projections
(S2EdgeTessellator.java:160-290 + Projection.java).

Converts a spherical geodesic edge into a chain of projected edges (or a
projected edge into a chain of geodesics) whose maximum deviation is at
most ``tolerance``, by recursive midpoint splitting with the reference's
two-point parametric error estimate (evaluated at t = 0.312.. and its
mirror so equator inflection points — where the midpoint error is exactly
zero — are still detected; constants from S2EdgeTessellator.java:164-167).
This is the raster<->vector bridge for projected tile geometry.
"""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from . import edges as ek
from . import sphere

#: S2EdgeTessellator.java:164 — fraction where the two error functions meet.
INTERPOLATION_FRACTION = 0.31215691082248315
#: :167 — E1(x0) == E2(x0); tolerance is scaled by this before comparison.
SCALE_FACTOR = 0.8382999256988851
#: :173 — less than one micrometer on Earth.
MIN_TOLERANCE = 1e-13


class PlateCarreeProjection:
    """(x, y) = (lng, lat) radians; x wraps at 2*pi."""

    wrap_x = 2.0 * np.pi

    def project(self, p: np.ndarray) -> np.ndarray:
        lat, lng = ci.xyz_to_latlng(p[0:1], p[1:2], p[2:3])
        return np.array([float(lng[0]), float(lat[0])])

    def unproject(self, xy: np.ndarray) -> np.ndarray:
        x, y, z = ci.latlng_to_xyz(np.array([xy[1]]), np.array([xy[0]]))
        return np.array([float(x[0]), float(y[0]), float(z[0])])


class MercatorProjection:
    """(x, y) = (lng, asinh(tan(lat))); x wraps at 2*pi."""

    wrap_x = 2.0 * np.pi

    def project(self, p: np.ndarray) -> np.ndarray:
        lat, lng = ci.xyz_to_latlng(p[0:1], p[1:2], p[2:3])
        return np.array([float(lng[0]), float(np.arcsinh(np.tan(lat[0])))])

    def unproject(self, xy: np.ndarray) -> np.ndarray:
        lat = np.arctan(np.sinh(xy[1]))
        x, y, z = ci.latlng_to_xyz(np.array([lat]), np.array([xy[0]]))
        return np.array([float(x[0]), float(y[0]), float(z[0])])


def _wrap_destination(proj, pa: np.ndarray, pb: np.ndarray) -> np.ndarray:
    """Shift pb by whole wrap periods so it is as close as possible to pa
    (Projection.wrapDestination): tessellating (0:170)-(0:-170) yields
    (0:170)-(0:190)."""
    w = proj.wrap_x
    dx = pb[0] - pa[0]
    dx -= w * np.round(dx / w)
    return np.array([pa[0] + dx, pb[1]])


def _estimate_max_error(proj, pa, a, pb, b) -> float:
    """Two-point parametric error as chord2 (:276-290)."""
    if float(a @ b) < -1e-14:
        return 4.0
    t1 = INTERPOLATION_FRACTION
    t2 = 1.0 - INTERPOLATION_FRACTION
    mid1 = ek.interpolate(a[None], b[None], np.array([t1]))[0]
    mid2 = ek.interpolate(a[None], b[None], np.array([t2]))[0]
    pm1 = proj.unproject(pa + t1 * (pb - pa))
    pm2 = proj.unproject(pa + t2 * (pb - pa))
    d1 = float(sphere.chord2_between(mid1[0], mid1[1], mid1[2], pm1[0], pm1[1], pm1[2]))
    d2 = float(sphere.chord2_between(mid2[0], mid2[1], mid2[2], pm2[0], pm2[1], pm2[2]))
    return max(d1, d2)


def append_projected(proj, a: np.ndarray, b: np.ndarray, vertices: list,
                     tolerance_rad: float) -> None:
    """Geodesic edge AB -> chain of projected vertices appended to
    ``vertices`` (first vertex appended only when the list is empty)."""
    scaled = float(
        sphere.chord2_from_angle(max(MIN_TOLERANCE, tolerance_rad) * SCALE_FACTOR)
    )
    pa = proj.project(a)
    if not vertices:
        vertices.append(pa)
    else:
        pa = _wrap_destination(proj, np.asarray(vertices[-1]), pa)
    pb = proj.project(b)

    def helper(pa, a, pb_in, b):
        pb = _wrap_destination(proj, pa, pb_in)
        if _estimate_max_error(proj, pa, a, pb, b) <= scaled:
            vertices.append(pb)
        else:
            mid = a + b
            mid = mid / np.linalg.norm(mid)
            pmid = _wrap_destination(proj, pa, proj.project(mid))
            helper(pa, a, pmid, mid)
            helper(pmid, mid, pb, b)

    helper(pa, a, pb, b)


def append_unprojected(proj, pa: np.ndarray, pb: np.ndarray, vertices: list,
                       tolerance_rad: float) -> None:
    """Projected edge -> chain of geodesic vertices appended to
    ``vertices``."""
    scaled = float(
        sphere.chord2_from_angle(max(MIN_TOLERANCE, tolerance_rad) * SCALE_FACTOR)
    )
    a = proj.unproject(pa)
    if not vertices:
        vertices.append(a)

    def helper(pa, a, pb_in, b):
        pb = _wrap_destination(proj, pa, pb_in)
        if _estimate_max_error(proj, pa, a, pb, b) <= scaled:
            vertices.append(b)
        else:
            pmid = pa + 0.5 * (pb - pa)
            mid = proj.unproject(pmid)
            helper(pa, a, pmid, mid)
            helper(pmid, mid, pb, b)

    helper(pa, np.asarray(a), np.asarray(pb), proj.unproject(np.asarray(pb)))
