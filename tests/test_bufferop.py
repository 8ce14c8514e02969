"""G3 buffer op: offset-curve Minkowski sum vs the exact distance oracle."""

import numpy as np

from s2_geometry_library_java_spark.kernel import bufferop as bf
from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import edges as ek
from s2_geometry_library_java_spark.kernel import region as rg

R = 0.03
BAND = 5e-6  # tessellation tolerance band around the offset boundary


def _poly(pts):
    return rg.Polygon([rg.Loop.from_latlng_degrees(pts)])


def _sample(n=4000, seed=3):
    rng = np.random.default_rng(seed)
    lat = np.radians(rng.uniform(8, 32, n))
    lng = np.radians(rng.uniform(18, 42, n))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def _check(poly, buf, pts):
    got = buf.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
    d2 = np.full(len(pts), 4.0)
    for lp in poly.loops:
        va = lp.vertices
        d2 = np.minimum(
            d2, ek.min_chord2_points_to_chain(pts, va, np.roll(va, -1, axis=0))
        )
    dang = 2 * np.arcsin(0.5 * np.sqrt(d2))
    dist = np.where(poly.contains_points(pts[:, 0], pts[:, 1], pts[:, 2]), 0.0, dang)
    want = dist <= R
    assert int(((got != want) & (np.abs(dist - R) > BAND)).sum()) == 0


def test_buffer_convex_quad():
    p = _poly([(14.0, 24.0), (14.0, 36.0), (26.0, 36.0), (26.0, 24.0)])
    buf = bf.buffer_polygon(p, R, max_error=1e-6)
    assert len(buf.loops) == 1
    _check(p, buf, _sample())


def test_buffer_concave_reflex_vertex():
    p = _poly(
        [(14.0, 24.0), (14.0, 36.0), (20.0, 36.0), (20.0, 30.0), (26.0, 30.0), (26.0, 24.0)]
    )
    buf = bf.buffer_polygon(p, R, max_error=1e-6)
    assert len(buf.loops) == 1  # reflex excursion erased by the winding op
    _check(p, buf, _sample(seed=5))


def test_buffer_hole_shrinks_and_vanishes():
    shell = [(14.0, 24.0), (14.0, 36.0), (26.0, 36.0), (26.0, 24.0)]
    hole = [(18.0, 28.0), (18.0, 32.0), (22.0, 32.0), (22.0, 28.0)]
    p = rg.Polygon(
        [rg.Loop.from_latlng_degrees(shell), rg.Loop.from_latlng_degrees(hole)]
    )
    buf = bf.buffer_polygon(p, R, max_error=1e-6)
    assert len(buf.loops) == 2  # hole survives, smaller
    _check(p, buf, _sample(seed=7))
    # radius larger than the hole inradius: hole disappears entirely
    big = bf.buffer_polygon(p, 0.04, max_error=1e-6)
    assert len(big.loops) == 1


def test_buffer_negative_radius_erosion():
    """Negative radius erodes: survive iff inside AND farther than |r|
    from the boundary; shapes thinner than 2|r| vanish."""
    for pts in (
        [(14.0, 24.0), (14.0, 36.0), (26.0, 36.0), (26.0, 24.0)],
        [(14.0, 24.0), (14.0, 36.0), (20.0, 36.0), (20.0, 30.0), (26.0, 30.0), (26.0, 24.0)],
    ):
        p = _poly(pts)
        er = bf.buffer_polygon(p, -R, max_error=1e-6)
        sam = _sample(seed=11)
        got = er.contains_points(sam[:, 0], sam[:, 1], sam[:, 2])
        d2 = np.full(len(sam), 4.0)
        for lp in p.loops:
            va = lp.vertices
            d2 = np.minimum(
                d2, ek.min_chord2_points_to_chain(sam, va, np.roll(va, -1, axis=0))
            )
        dang = 2 * np.arcsin(0.5 * np.sqrt(d2))
        inside = p.contains_points(sam[:, 0], sam[:, 1], sam[:, 2])
        want = inside & (dang > R)
        assert int(((got != want) & (np.abs(dang - R) > BAND)).sum()) == 0
    thin = _poly([(14.0, 24.0), (14.0, 36.0), (14.8, 36.0), (14.8, 24.0)])
    assert len(bf.buffer_polygon(thin, -R, max_error=1e-6).loops) == 0
