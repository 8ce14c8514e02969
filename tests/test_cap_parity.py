"""S2CapTest parity: the reference's testBasic / testExpanded /
testGetCentroid / testUnion / testAdd* cases (S2CapTest.java:49-378)
against the full Cap surface (kernel/region.py)."""

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import region as rg

EPS = 1e-15


def _pt(lat, lng):
    return np.ravel(ci.latlng_to_xyz(np.radians(lat), np.radians(lng)))


def _norm(v):
    v = np.asarray(v, dtype=np.float64)
    return v / np.linalg.norm(v)


def _contains_pt(cap, p):
    return bool(np.all(cap.contains_points(p[0:1], p[1:2], p[2:3])))


def test_basic_empty_full_singleton():
    """S2CapTest.testBasic (S2CapTest.java:49-152)."""
    empty = rg.Cap.empty()
    full = rg.Cap.full()
    assert empty.is_empty() and empty.complement().is_full()
    assert full.is_full() and full.complement().is_empty()
    assert full.height() == 2.0
    assert abs(np.degrees(full.angle()) - 180.0) < 1e-12

    x_pos = np.array([1.0, 0.0, 0.0])
    assert rg.Cap.from_axis_angle(x_pos, -20.0).is_empty()
    assert rg.Cap.from_axis_angle(x_pos, 5.0).is_full()

    assert empty.contains_cap(empty)
    assert full.contains_cap(empty)
    assert full.contains_cap(full)
    assert not empty.interior_intersects(empty)
    assert full.interior_intersects(full)
    assert not full.interior_intersects(empty)

    xaxis = rg.Cap.from_axis_height(x_pos, 0.0)
    assert _contains_pt(xaxis, x_pos)
    assert not _contains_pt(xaxis, np.array([1.0, 1e-20, 0.0]))
    assert xaxis.angle() == 0.0
    yaxis = rg.Cap.from_axis_angle(np.array([0.0, 1.0, 0.0]), 0.0)
    assert not _contains_pt(yaxis, x_pos)
    assert xaxis.height() == 0.0

    # complement of a singleton is full; complement of that is empty
    xcomp = xaxis.complement()
    assert xcomp.is_full() and _contains_pt(xcomp, x_pos)
    assert xcomp.complement().is_empty()
    assert not _contains_pt(xcomp.complement(), x_pos)

    # tiny caps represent accurately
    tiny_rad = 1e-10
    axis = _norm([1.0, 2.0, 3.0])
    tiny = rg.Cap.from_axis_angle(axis, tiny_rad)
    tangent = _norm(np.cross(axis, [3.0, 2.0, 1.0]))
    assert _contains_pt(tiny, axis + 0.99 * tiny_rad * tangent)
    assert not _contains_pt(tiny, axis + 1.01 * tiny_rad * tangent)

    # hemispherical cap
    hemi = rg.Cap.from_axis_height(_norm([1.0, 0.0, 1.0]), 1.0)
    assert np.allclose(hemi.complement().center, -np.asarray(hemi.center))
    assert hemi.complement().height() == 1.0
    assert _contains_pt(hemi, x_pos)
    assert not _contains_pt(hemi.complement(), x_pos)
    assert _contains_pt(hemi, _norm([1.0, 0.0, -(1.0 - EPS)]))
    assert not hemi.interior_contains_point(*_norm([1.0, 0.0, -(1.0 + EPS)]))

    # cap containment lattice
    assert not empty.contains_cap(xaxis)
    assert not empty.interior_intersects(xaxis)
    assert full.contains_cap(xaxis)
    assert full.interior_intersects(xaxis)
    assert not xaxis.contains_cap(full)
    assert not xaxis.interior_intersects(full)
    assert xaxis.contains_cap(xaxis)
    assert not xaxis.interior_intersects(xaxis)
    assert xaxis.contains_cap(empty)
    assert not xaxis.interior_intersects(empty)
    assert hemi.contains_cap(tiny)
    assert hemi.contains_cap(rg.Cap.from_axis_angle(x_pos, np.pi / 4 - EPS))
    assert not hemi.contains_cap(rg.Cap.from_axis_angle(x_pos, np.pi / 4 + EPS))

    concave = rg.Cap.from_axis_angle(_pt(80.0, 10.0), np.radians(150.0))
    assert concave.contains_cap(hemi)
    assert concave.interior_intersects(hemi.complement())
    assert not concave.contains_cap(
        rg.Cap.from_axis_height(-np.asarray(concave.center), 0.1)
    )


def test_add_point_and_cap():
    """S2CapTest.testAddEmptyCapToNonEmptyCap / testAddNonEmptyCapToEmptyCap."""
    x_pos = np.array([1.0, 0.0, 0.0])
    non_empty = rg.Cap.from_axis_angle(x_pos, np.radians(10.0))
    assert non_empty.add_cap(rg.Cap.empty()).radius2 == non_empty.radius2
    got = rg.Cap.empty().add_cap(non_empty)
    assert got.radius2 == non_empty.radius2 and got.center == non_empty.center
    # addPoint on empty makes a singleton; growth covers the point
    p = _norm([0.0, 1.0, 0.0])
    s = rg.Cap.empty().add_point(p)
    assert s.radius2 == 0.0 and _contains_pt(s, p)
    grown = non_empty.add_point(p)
    assert _contains_pt(grown, p) and grown.center == non_empty.center


def test_expanded():
    """S2CapTest.testExpanded (S2CapTest.java:301-310)."""
    x_pos = np.array([1.0, 0.0, 0.0])
    assert rg.Cap.empty().expanded(2.0).is_empty()
    assert rg.Cap.full().expanded(2.0).is_full()
    cap50 = rg.Cap.from_axis_angle(x_pos, np.radians(50.0))
    cap51 = rg.Cap.from_axis_angle(x_pos, np.radians(51.0))
    assert abs(cap50.expanded(0.0).radius2 - cap50.radius2) < 1e-14
    assert abs(cap50.expanded(np.radians(1.0)).angle() - cap51.angle()) < 1e-14
    assert not cap50.expanded(np.radians(129.99)).is_full()
    assert cap50.expanded(np.radians(130.01)).is_full()


def test_centroid():
    """S2CapTest.testGetCentroid (S2CapTest.java:313-327)."""
    assert np.array_equal(rg.Cap.empty().centroid(), np.zeros(3))
    assert np.linalg.norm(rg.Cap.full().centroid()) <= 1e-15
    rng = np.random.RandomState(5)
    for _ in range(100):
        center = _norm(rng.normal(size=3))
        height = rng.uniform(0.0, 2.0)
        cap = rg.Cap.from_axis_height(center, height)
        expected = center * ((1.0 - height / 2.0) * cap.area())
        assert np.linalg.norm(expected - cap.centroid()) <= 1e-15


def test_union():
    """S2CapTest.testUnion (S2CapTest.java:330-377) incl. the golden
    union axis/angle values."""
    a = rg.Cap.from_axis_angle(_pt(50.0, 10.0), np.radians(0.2))
    b = rg.Cap.from_axis_angle(_pt(50.0, 10.0), np.radians(0.3))
    assert b.contains_cap(a)
    assert a.union_cap(b).radius2 == b.radius2

    assert a.union_cap(rg.Cap.full()).is_full()
    assert a.union_cap(rg.Cap.empty()).radius2 == a.radius2

    c = rg.Cap.from_axis_angle(_pt(51.0, 11.0), np.radians(1.5))
    assert c.contains_cap(a)
    assert a.union_cap(c).center == c.center
    assert a.union_cap(c).angle() == c.angle()

    # disjoint caps: golden union axis/angle (0.001-degree tolerance)
    d = rg.Cap.from_axis_angle(_pt(51.0, 11.0), np.radians(0.1))
    assert not d.contains_cap(a)
    assert not d.intersects_cap(a)
    u = a.union_cap(d)
    lat, lng = ci.xyz_to_latlng(*u.center)
    assert abs(np.degrees(lat) - 50.4588) < 0.001
    assert abs(np.degrees(lng) - 10.4525) < 0.001
    assert abs(np.degrees(u.angle()) - 0.7425) < 0.001

    # partially overlapping caps
    e = rg.Cap.from_axis_angle(_pt(50.3, 10.3), np.radians(0.2))
    assert not e.contains_cap(a)
    assert e.intersects_cap(a)
    u2 = a.union_cap(e)
    lat, lng = ci.xyz_to_latlng(*u2.center)
    assert abs(np.degrees(lat) - 50.1500) < 0.001
    assert abs(np.degrees(lng) - 10.1495) < 0.001
    assert abs(np.degrees(u2.angle()) - 0.3781) < 0.001

    # radius sums above 180 degrees -> full
    f = rg.Cap.from_axis_angle(np.array([0.0, 0.0, 1.0]), np.radians(150.0))
    g = rg.Cap.from_axis_angle(np.array([0.0, 1.0, 0.0]), np.radians(150.0))
    assert f.union_cap(g).is_full()

    hemi = rg.Cap.from_axis_height(np.array([0.0, 0.0, 1.0]), 1.0)
    assert hemi.union_cap(hemi.complement()).is_full()


def test_rect_bound():
    """S2CapTest.testRectBound (S2CapTest.java:173-223) golden bounds."""
    from s2_geometry_library_java_spark.kernel import intervals as iv

    assert rg.Cap.empty().rect_bound().is_empty()
    assert rg.Cap.full().rect_bound().is_full()
    eps_deg = 1e-13

    # includes the south pole
    r = rg.Cap.from_axis_angle(_pt(-45, 57), np.radians(50)).rect_bound()
    assert abs(np.degrees(r.lat_lo) - -90) < eps_deg
    assert abs(np.degrees(r.lat_hi) - 5) < eps_deg
    assert r.lng.is_full()

    # tangent to the north pole (exact zero at the equator side)
    r = rg.Cap.from_axis_angle(_norm([1.0, 0.0, 1.0]), np.pi / 4).rect_bound()
    assert r.lat_lo == 0.0
    assert abs(r.lat_hi - np.pi / 2) < 1e-14
    assert r.lng.is_full()

    r = rg.Cap.from_axis_angle(_norm([1.0, 0.0, 1.0]), np.radians(45)).rect_bound()
    assert abs(np.degrees(r.lat_lo) - 0) < eps_deg
    assert abs(np.degrees(r.lat_hi) - 90) < eps_deg
    assert r.lng.is_full()

    # the eastern hemisphere
    r = rg.Cap.from_axis_angle(
        np.array([0.0, 1.0, 0.0]), np.pi / 2 + 5e-16
    ).rect_bound()
    assert abs(np.degrees(r.lat_lo) - -90) < eps_deg
    assert abs(np.degrees(r.lat_hi) - 90) < eps_deg
    assert r.lng.is_full()

    # centered on the equator
    r = rg.Cap.from_axis_angle(_pt(0, 50), np.radians(20)).rect_bound()
    assert abs(np.degrees(r.lat_lo) - -20) < eps_deg
    assert abs(np.degrees(r.lat_hi) - 20) < eps_deg
    assert abs(np.degrees(r.lng_lo) - 30) < eps_deg
    assert abs(np.degrees(r.lng_hi) - 70) < eps_deg

    # centered on the north pole
    r = rg.Cap.from_axis_angle(_pt(90, 123), np.radians(10)).rect_bound()
    assert abs(np.degrees(r.lat_lo) - 80) < eps_deg
    assert abs(np.degrees(r.lat_hi) - 90) < eps_deg
    assert r.lng.is_full()
