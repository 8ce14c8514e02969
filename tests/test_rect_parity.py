"""S2LatLngRectTest parity (S2LatLngRectTest.java:42-260): the interval-op
truth tables, constructors, vertices, and containment cases against the
LatLngRect surface (kernel/region.py over kernel/intervals.py)."""

import numpy as np

from s2_geometry_library_java_spark.kernel import intervals as iv
from s2_geometry_library_java_spark.kernel import predicates
from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import region as rg

PI = np.pi


def rect_deg(lat_lo, lng_lo, lat_hi, lng_hi):
    """Reference test helper arg order: rectFromDegrees(latLo, lngLo,
    latHi, lngHi) — DIRECT lng endpoints (lo > hi wraps), only the -pi
    normalization applied (matches the S2LatLngRect 2-corner
    constructor used by S2LatLngRectTest.rectFromDegrees)."""
    lng = iv.S1Interval._checked(np.radians(lng_lo), np.radians(lng_hi))
    return rg.LatLngRect(np.radians(lat_lo), np.radians(lat_hi), lng.lo, lng.hi)


def check_interval_ops(x, y, expected, expected_union, expected_intersection):
    """S2LatLngRectTest.testIntervalOps truth-table helper: expected is
    'TFTF'-style for contains / interiorContains / intersects /
    interiorIntersects."""
    assert x.contains_rect(y) == (expected[0] == "T")
    assert x.interior_contains_rect(y) == (expected[1] == "T")
    assert x.intersects_rect(y) == (expected[2] == "T")
    assert x.interior_intersects_rect(y) == (expected[3] == "T")
    assert x.contains_rect(y) == x.union(y).approx_equals(x, 1e-12)
    assert x.intersects_rect(y) == (not x.intersection(y).is_empty())
    u = x.union(y)
    i = x.intersection(y)
    assert u.approx_equals(expected_union, 1e-12), (u, expected_union)
    assert i.approx_equals(expected_intersection, 1e-12), (i, expected_intersection)


def test_empty_full():
    empty = rg.LatLngRect.empty()
    full = rg.LatLngRect.full()
    assert empty.is_valid() and empty.is_empty() and not empty.is_point()
    assert full.is_valid() and full.is_full() and not full.is_point()


def test_accessors_and_construction():
    d1 = rect_deg(-90, 0, -45, 180)
    assert abs(np.degrees(d1.lat_lo) - -90) < 1e-12
    assert abs(np.degrees(d1.lat_hi) - -45) < 1e-12
    assert abs(np.degrees(d1.lng_lo) - 0) < 1e-12
    assert abs(np.degrees(d1.lng_hi) - 180) < 1e-12

    # fromCenterSize (S2LatLngRectTest.java:149-157)
    r = rg.LatLngRect.from_center_size(
        np.radians(80), np.radians(170), np.radians(40), np.radians(60)
    )
    assert r.approx_equals(rect_deg(60, 140, 90, -160), 1e-12)
    assert rg.LatLngRect.from_center_size(
        np.radians(10), np.radians(40), np.radians(210), np.radians(400)
    ).is_full()
    r2 = rg.LatLngRect.from_center_size(
        np.radians(-90), np.radians(180), np.radians(20), np.radians(50)
    )
    assert r2.approx_equals(rect_deg(-90, 155, -80, -155), 1e-12)

    # fromPointPair (S2LatLngRectTest.java:160-167)
    p = rg.LatLngRect.from_point_pair(
        np.radians(-35), np.radians(-140), np.radians(15), np.radians(155)
    )
    assert p.approx_equals(rect_deg(-35, 155, 15, -140), 1e-12)
    p2 = rg.LatLngRect.from_point_pair(
        np.radians(25), np.radians(-70), np.radians(-90), np.radians(80)
    )
    assert p2.approx_equals(rect_deg(-90, -70, 25, 80), 1e-12)


def test_center_vertices_containment():
    # r1 = [(0, -pi) .. (pi/2, 0)] (S2LatLngRectTest.java:169-190)
    r1 = rg.LatLngRect.from_point_pair(0.0, -PI, PI / 2, 0.0)
    assert r1.get_center() == (PI / 4, -PI / 2)
    assert r1.get_vertex(0) == (0.0, PI)
    assert r1.get_vertex(1) == (0.0, 0.0)
    assert r1.get_vertex(2) == (PI / 2, 0.0)
    assert r1.get_vertex(3) == (PI / 2, PI)
    for k in range(4):  # arguments reduce mod 4
        assert r1.get_vertex(k + 4) == r1.get_vertex(k)

    assert bool(r1.contains_latlng(np.radians(30.0), np.radians(-45.0)))
    assert not bool(r1.contains_latlng(np.radians(30.0), np.radians(45.0)))
    assert not r1.interior_contains_latlng(0.0, -PI)
    assert not r1.interior_contains_latlng(PI / 2, 0.0)
    assert bool(np.all(r1.contains_points(
        np.array([0.5]), np.array([-0.3]), np.array([0.1]))))
    assert not bool(np.all(r1.contains_points(
        np.array([0.5]), np.array([0.2]), np.array([0.1]))))

    # vertices come back CCW (S2LatLngRectTest.java:192-208)
    for i in range(4):
        lat = PI / 4 * (i - 2)
        lng = PI / 2 * (i - 2) + 0.2
        lo = float(lng - 2 * PI * np.round(lng / (2 * PI)))
        hi_ang = lng + PI / 2
        hi = float(hi_ang - 2 * PI * np.round(hi_ang / (2 * PI)))
        r = rg.LatLngRect(lat, lat + PI / 4, lo, hi)
        for k in range(4):
            def vxyz(j):
                la, ln = r.get_vertex(j)
                return np.ravel(ci.latlng_to_xyz(la, ln))
            s = predicates.sign_batch(
                vxyz((k - 1) & 3)[None], vxyz(k)[None], vxyz((k + 1) & 3)[None]
            )[0]
            assert s > 0


def test_interval_ops_truth_tables():
    """The testIntervalOps cases from testBasic (S2LatLngRectTest.java:215-258)."""
    r1 = rg.LatLngRect.from_point_pair(0.0, -PI, PI / 2, 0.0)
    r1_mid = rect_deg(45, -90, 45, -90)
    r_eq_m180 = rg.LatLngRect.from_point(0.0, iv.S1Interval.from_point(-PI).lo)
    r_north_pole = rg.LatLngRect.from_point(PI / 2, 0.0)
    empty = rg.LatLngRect.empty()

    check_interval_ops(r1, r1_mid, "TTTT", r1, r1_mid)
    check_interval_ops(r1, r_eq_m180, "TFTF", r1, r_eq_m180)
    check_interval_ops(r1, r_north_pole, "TFTF", r1, r_north_pole)

    assert r1.approx_equals(rect_deg(0, -180, 90, 0), 1e-12)
    check_interval_ops(
        r1, rect_deg(-10, -1, 1, 20), "FFTT",
        rect_deg(-10, -180, 90, 20), rect_deg(0, -1, 1, 0))
    check_interval_ops(
        r1, rect_deg(-10, -1, 0, 20), "FFTF",
        rect_deg(-10, -180, 90, 20), rect_deg(0, -1, 0, 0))
    check_interval_ops(
        r1, rect_deg(-10, 0, 1, 20), "FFTF",
        rect_deg(-10, -180, 90, 20), rect_deg(0, 0, 1, 0))

    check_interval_ops(
        rect_deg(-15, -160, -15, -150), rect_deg(20, 145, 25, 155), "FFFF",
        rect_deg(-15, 145, 25, -150), empty)
    check_interval_ops(
        rect_deg(70, -10, 90, -140), rect_deg(60, 175, 80, 5), "FFTT",
        rect_deg(60, -180, 90, 180), rect_deg(70, 175, 80, 5))

    # lat-overlap-only / lng-overlap-only intersections stay valid
    check_interval_ops(
        rect_deg(12, 30, 60, 60), rect_deg(0, 0, 30, 18), "FFFF",
        rect_deg(0, 0, 60, 60), empty)
    check_interval_ops(
        rect_deg(0, 0, 18, 42), rect_deg(30, 12, 42, 60), "FFFF",
        rect_deg(0, 0, 42, 60), empty)


def test_add_point_builds_rect():
    p = rg.LatLngRect.empty()
    p = p.add_point(0.0, 0.0)
    assert p.is_point()
    p = p.add_point(np.radians(30), np.radians(40))
    assert bool(p.contains_latlng(np.radians(10.0), np.radians(20.0)))
    assert not bool(p.contains_latlng(np.radians(10.0), np.radians(50.0)))


def test_rect_cap_bound():
    """S2LatLngRectBase.getCapBound: pole cap for wide/high rects,
    vertex cap for compact ones; always covers the rect."""
    # compact mid-latitude rect -> center cap through the vertices
    r = rect_deg(10, 20, 30, 50)
    cap = r.get_cap_bound()
    for k in range(4):
        vla, vln = r.get_vertex(k)
        p = np.ravel(ci.latlng_to_xyz(vla, vln))
        assert bool(cap.contains_points(p[0:1], p[1:2], p[2:3])[0]), k
    # northern rect spanning all longitudes -> north-pole cap
    arctic = rg.LatLngRect(np.radians(70), np.pi / 2, -PI, PI)
    pc = arctic.get_cap_bound()
    assert pc.center == (0.0, 0.0, 1.0)
    assert abs(pc.angle() - (np.pi / 2 - np.radians(70))) < 1e-12
    # southern-weighted rect picks the south pole
    aust = rg.LatLngRect(-np.pi / 2, np.radians(-60), -PI, PI)
    sc = aust.get_cap_bound()
    assert sc.center == (0.0, 0.0, -1.0)
    assert rg.LatLngRect.empty().get_cap_bound().is_empty()
    # loop cap bound covers all loop vertices
    lp = rg.Loop.from_latlng_degrees([(10, 10), (10, 30), (25, 30), (25, 10)])
    lcap = lp.get_cap_bound()
    for v in lp.vertices:
        assert bool(lcap.contains_points(v[0:1], v[1:2], v[2:3])[0])
