"""G6 edge tessellator: error-bound contract and inflection handling."""

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import edges as ek
from s2_geometry_library_java_spark.kernel import sphere
from s2_geometry_library_java_spark.kernel import tessellator as tz


def _pt(lat, lng):
    x, y, z = ci.latlng_to_xyz(np.radians(np.array([lat])), np.radians(np.array([lng])))
    return np.array([x[0], y[0], z[0]])


def _max_dev_projected(proj, a, b, verts, n=200):
    """Max distance from dense samples of the projected chain (unprojected
    back to the sphere) to the geodesic AB."""
    worst = 0.0
    for (p, q) in zip(verts, verts[1:]):
        p, q = np.asarray(p), np.asarray(q)
        for t in np.linspace(0, 1, n // max(1, len(verts) - 1) + 2):
            s = proj.unproject(p + t * (q - p))
            d = ek.min_chord2_to_edges(s[None], a[None], b[None])[0]
            worst = max(worst, float(sphere.angle_from_chord2(d)))
    return worst


def test_projected_error_bound_mercator():
    proj = tz.MercatorProjection()
    tol = np.radians(0.05)
    a, b = _pt(10.0, -30.0), _pt(35.0, 40.0)
    verts = []
    tz.append_projected(proj, a, b, verts, tol)
    assert len(verts) >= 3  # long edge must subdivide
    assert _max_dev_projected(proj, a, b, verts) <= tol * 1.01


def test_projected_equator_inflection():
    """Same-|lat| endpoints: midpoint error is exactly zero at the equator
    crossing — the two-point estimate must still subdivide."""
    proj = tz.MercatorProjection()
    tol = np.radians(0.01)
    a, b = _pt(20.0, -40.0), _pt(-20.0, 40.0)
    verts = []
    tz.append_projected(proj, a, b, verts, tol)
    assert len(verts) >= 3
    assert _max_dev_projected(proj, a, b, verts) <= tol * 1.01


def test_projected_wraps_dateline():
    proj = tz.PlateCarreeProjection()
    a, b = _pt(0.0, 170.0), _pt(0.0, -170.0)
    verts = []
    tz.append_projected(proj, a, b, verts, np.radians(0.5))
    xs = [v[0] for v in verts]
    # destination wraps to ~190 degrees instead of jumping to -170
    assert xs[-1] > xs[0]
    np.testing.assert_allclose(np.degrees(xs[-1]), 190.0, atol=1e-9)


def test_unprojected_error_bound():
    """Projected straight segment -> geodesic chain whose samples stay
    within tolerance of the segment (parametrically)."""
    proj = tz.MercatorProjection()
    tol = np.radians(0.05)
    pa = np.array([np.radians(-30.0), float(np.arcsinh(np.tan(np.radians(10.0))))])
    pb = np.array([np.radians(40.0), float(np.arcsinh(np.tan(np.radians(35.0))))])
    verts = []
    tz.append_unprojected(proj, pa, pb, verts, tol)
    assert len(verts) >= 3
    # each chain vertex must lie on the projected segment (within FP)
    for v in verts:
        p = proj.project(np.asarray(v))
        # distance of p from segment pa-pb in projection space
        d = pb - pa
        t = float(np.clip((p - pa) @ d / (d @ d), 0, 1))
        nearest = pa + t * d
        assert np.linalg.norm(p - nearest) < 1e-9


def test_tolerance_controls_vertex_count():
    proj = tz.MercatorProjection()
    a, b = _pt(5.0, -60.0), _pt(55.0, 70.0)
    counts = []
    for tol_deg in (1.0, 0.1, 0.01):
        verts = []
        tz.append_projected(proj, a, b, verts, np.radians(tol_deg))
        counts.append(len(verts))
    assert counts[0] <= counts[1] <= counts[2]
    assert counts[2] > counts[0]
