"""A21/B9 edge-math kernel fixtures ported from S2EdgeUtilTest.java
(testDistance :851-870, testInterpolate :981-1012) and
S2RobustCrossProdTest invariants."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import edges, sphere


def _n(x, y, z):
    v = np.array([x, y, z], dtype=np.float64)
    return v / np.linalg.norm(v)


PI = np.pi
PI_2 = np.pi / 2
PI_4 = np.pi / 4

# (x, a, b, expected_distance_radians, expected_closest or None=endpoint)
DISTANCE_FIXTURES = [
    (_n(1, 0, 0), _n(1, 0, 0), _n(0, 1, 0), 0.0, _n(1, 0, 0)),
    (_n(0, 1, 0), _n(1, 0, 0), _n(0, 1, 0), 0.0, _n(0, 1, 0)),
    (_n(1, 3, 0), _n(1, 0, 0), _n(0, 1, 0), 0.0, _n(1, 3, 0)),
    (_n(0, 0, 1), _n(1, 0, 0), _n(0, 1, 0), PI_2, None),
    (_n(0, 0, -1), _n(1, 0, 0), _n(0, 1, 0), PI_2, None),
    (_n(-1, -1, 0), _n(1, 0, 0), _n(0, 1, 0), 0.75 * PI, None),
    (_n(0, 1, 0), _n(1, 0, 0), _n(1, 1, 0), PI_4, _n(1, 1, 0)),
    (_n(0, -1, 0), _n(1, 0, 0), _n(1, 1, 0), PI_2, _n(1, 0, 0)),
    (_n(0, -1, 0), _n(1, 0, 0), _n(-1, 1, 0), PI_2, _n(1, 0, 0)),
    (_n(-1, -1, 0), _n(1, 0, 0), _n(-1, 1, 0), PI_2, _n(-1, 1, 0)),
    (_n(1, 1, 1), _n(1, 0, 0), _n(0, 1, 0), np.arcsin(np.sqrt(1.0 / 3)), _n(1, 1, 0)),
    (_n(1, 1, -1), _n(1, 0, 0), _n(0, 1, 0), np.arcsin(np.sqrt(1.0 / 3)), _n(1, 1, 0)),
    # degenerate edges a == b
    (_n(-1, 0, 0), _n(1, 1, 0), _n(1, 1, 0), 0.75 * PI, _n(1, 1, 0)),
    (_n(0, 0, -1), _n(1, 1, 0), _n(1, 1, 0), PI_2, _n(1, 1, 0)),
    (_n(-1, 0, 0), _n(1, 0, 0), _n(1, 0, 0), PI, _n(1, 0, 0)),
]


def test_min_chord2_fixtures():
    xs = np.array([f[0] for f in DISTANCE_FIXTURES])
    as_ = np.array([f[1] for f in DISTANCE_FIXTURES])
    bs = np.array([f[2] for f in DISTANCE_FIXTURES])
    expect = np.array([f[3] for f in DISTANCE_FIXTURES])
    got = sphere.angle_from_chord2(edges.min_chord2_to_edges(xs, as_, bs))
    np.testing.assert_allclose(got, expect, atol=1e-15)


def test_project_fixtures():
    for x, a, b, dist, closest in DISTANCE_FIXTURES:
        if dist == PI_2 or closest is None:
            continue  # perpendicular / endpoint-ambiguous cases (per checkDistance)
        p = edges.project_to_edges(x[None, :], a[None, :], b[None, :])[0]
        ang = sphere.angle_between(
            p[0], p[1], p[2], closest[0], closest[1], closest[2]
        )
        assert ang < 1e-14, (p, closest, ang)


def test_project_batch_matches_scalar():
    rng = np.random.default_rng(123455)
    v = rng.normal(size=(50, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    x, a, b = v[:20], v[15:35], v[25:45]
    proj = edges.project_to_edges(x, a, b)
    # projected point must achieve the min distance
    d_proj = sphere.chord2_between(
        x[:, 0], x[:, 1], x[:, 2], proj[:, 0], proj[:, 1], proj[:, 2]
    )
    d_min = edges.min_chord2_to_edges(x, a, b)
    np.testing.assert_allclose(d_proj, d_min, atol=1e-14)


INTERP_FIXTURES = [
    (0.0, _n(1, 0, 0), _n(0, 1, 0), _n(1, 0, 0)),
    (1.0, _n(1, 0, 0), _n(0, 1, 0), _n(0, 1, 0)),
    (0.5, _n(1, 0, 0), _n(0, 1, 0), _n(1, 1, 0)),
    (1.0 / 3, _n(1, 0, 0), _n(0, 1, 0), _n(np.sqrt(3), 1, 0)),
    (2.0 / 3, _n(1, 0, 0), _n(0, 1, 0), _n(1, np.sqrt(3), 0)),
    # degenerate a == b
    (0.0, _n(1, 0, 0), _n(1, 0, 0), _n(1, 0, 0)),
    (1.0, _n(1, 0, 0), _n(1, 0, 0), _n(1, 0, 0)),
    (0.5, _n(1, 0, 0), _n(1, 0, 0), _n(1, 0, 0)),
]


def test_interpolate_fixtures():
    ts = np.array([f[0] for f in INTERP_FIXTURES])
    as_ = np.array([f[1] for f in INTERP_FIXTURES])
    bs = np.array([f[2] for f in INTERP_FIXTURES])
    expect = np.array([f[3] for f in INTERP_FIXTURES])
    got = edges.interpolate(as_, bs, ts)
    ang = sphere.angle_between(
        got[:, 0], got[:, 1], got[:, 2], expect[:, 0], expect[:, 1], expect[:, 2]
    )
    assert np.all(ang <= 3e-15), (got, expect, ang)


def test_interpolate_long_edge_sweep():
    # S2EdgeUtilTest :1014-1021: fractions along a long equatorial edge
    k_lng = PI - 1e-2
    a = np.array([1.0, 0.0, 0.0])
    b = np.array(
        [np.cos(k_lng), np.sin(k_lng), 0.0]
    )
    for f in [0.01 * k for k in range(1, 100, 7)]:
        want = np.array([np.cos(f * k_lng), np.sin(f * k_lng), 0.0])
        got = edges.interpolate(a[None], b[None], np.array([f]))[0]
        ang = sphere.angle_between(got[0], got[1], got[2], want[0], want[1], want[2])
        assert ang <= 3e-15


def test_robust_cross_prod_basic():
    a = np.array([[1.0, 0.0, 0.0]])
    b = np.array([[0.0, 1.0, 0.0]])
    c = edges.robust_cross_prod(a, b)[0]
    c /= np.linalg.norm(c)
    np.testing.assert_allclose(c, [0, 0, 1], atol=1e-15)


def test_robust_cross_prod_nearly_identical():
    """Inputs differing in the last bit still give a result orthogonal to
    both (the whole point of the stable (b+a)x(b-a) form)."""
    a = np.array([1.0, 1.0, 1.0])
    a /= np.linalg.norm(a)
    b = a.copy()
    b[2] = np.nextafter(b[2], 1.0)
    c = edges.robust_cross_prod(a[None], b[None])[0]
    n = np.linalg.norm(c)
    assert n > 0
    c /= n
    assert abs(c @ a) < 1e-9 and abs(c @ b) < 1e-9


def test_robust_cross_prod_identical_and_antipodal():
    a = np.array([1.0, 0.0, 0.0])
    c1 = edges.robust_cross_prod(a[None], a[None])[0]
    assert np.linalg.norm(c1) > 0 and abs(c1 @ a) < 1e-15
    c2 = edges.robust_cross_prod(a[None], -a[None])[0]
    assert np.linalg.norm(c2) > 0 and abs(c2 @ a) < 1e-15


def test_robust_cross_prod_antisymmetry():
    rng = np.random.default_rng(42)
    v = rng.normal(size=(30, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    a, b = v[:15], v[15:]
    ab = edges.robust_cross_prod(a, b)
    ba = edges.robust_cross_prod(b, a)
    np.testing.assert_allclose(ab, -ba, atol=1e-18)


def test_chain_min_distance_matches_pairwise():
    rng = np.random.default_rng(7)
    pts = rng.normal(size=(40, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    verts = rng.normal(size=(9, 3))
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    va, vb = verts[:-1], verts[1:]
    got = edges.min_chord2_points_to_chain(pts, va, vb)
    brute = np.array(
        [
            min(
                edges.min_chord2_to_edges(p[None], va[k][None], vb[k][None])[0]
                for k in range(len(va))
            )
            for p in pts
        ]
    )
    np.testing.assert_allclose(got, brute, rtol=0, atol=0)


def test_max_chord2():
    # max distance from x to an edge: attained at an endpoint here
    x = _n(1, 0, 0)
    a, b = _n(0, 1, 0), _n(1, 1, 0)
    d = edges.max_chord2_to_edges(x[None], a[None], b[None])[0]
    np.testing.assert_allclose(d, 2.0, atol=1e-15)  # 90 deg to (0,1,0)
    # antipodal: max distance pi
    d2 = edges.max_chord2_to_edges((-a)[None], a[None], b[None])[0]
    np.testing.assert_allclose(np.sqrt(d2), 2.0, atol=1e-12)


def test_edge_intersection_equator_meridian():
    a, b = _n(1, -1e-3, 0), _n(1, 1e-3, 0)  # tiny equator arc at lng 0
    c, d = _n(1, 0, -1e-3), _n(1, 0, 1e-3)  # tiny meridian arc
    x = edges.edge_intersection(a[None], b[None], c[None], d[None])[0]
    np.testing.assert_allclose(x, [1, 0, 0], atol=1e-14)


def test_normalize_latlng_ieee_remainder():
    from s2_geometry_library_java_spark.kernel import cellid as ci

    lat, lng = ci.normalize_latlng(
        np.array([2.0, -2.0, 0.3]), np.array([3 * np.pi, -3 * np.pi, 0.5])
    )
    np.testing.assert_allclose(lat, [np.pi / 2, -np.pi / 2, 0.3])
    # IEEE remainder of 3pi by 2pi is -pi or +pi (nearest-even quotient ->
    # 3pi - 2*2pi = -pi); magnitude must be pi and 0.5 passes through
    np.testing.assert_allclose(np.abs(lng[:2]), [np.pi, np.pi], atol=1e-15)
    assert lng[2] == 0.5
