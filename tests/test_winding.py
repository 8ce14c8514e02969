"""G4 winding-number query primitive vs the tangent-plane reference
(_winding_number) on simple and doubly-wound loops."""

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import predicates
from s2_geometry_library_java_spark.kernel import region as rg


def _loop_deg(pts):
    return rg.Loop.from_latlng_degrees(pts).vertices


def test_winding_simple_ccw_loop():
    v = _loop_deg([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])
    # origin far outside has winding 0
    origin = np.array(
        [float(a) for a in np.ravel(ci.latlng_to_xyz(np.radians(-60.0), np.radians(-120.0)))]
    )
    lat = np.radians(np.array([5.0, 5.0, 40.0, -5.0]))
    lng = np.radians(np.array([5.0, 9.9, 5.0, 5.0]))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    pts = np.stack([x, y, z], axis=1)
    got = predicates.winding_numbers(origin, pts, v, origin_winding=0)
    # exact sign equality with the tangent-plane reference: CCW loop,
    # point inside -> +1 (the positive/nonzero winding-rule convention)
    want = np.array([rg._winding_number(p, v) for p in pts])
    assert np.array_equal(got, want), (got, want)
    assert set(got.tolist()) == {0, 1}


def test_winding_doubly_wound():
    """A loop traversing the same square twice: interior winding +-2."""
    sq = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    # two laps with slightly different second lap so vertices stay distinct
    lap2 = [(la + 1e-7, ln + 1e-7) for la, ln in sq]
    v = _loop_deg(sq + lap2)
    origin = np.array(
        [float(a) for a in np.ravel(ci.latlng_to_xyz(np.radians(-60.0), np.radians(-120.0)))]
    )
    x, y, z = ci.latlng_to_xyz(np.radians(np.array([5.0])), np.radians(np.array([5.0])))
    pts = np.stack([x, y, z], axis=1)
    got = predicates.winding_numbers(origin, pts, v)
    want = rg._winding_number(pts[0], v)
    assert int(got[0]) == want == 2


def test_winding_reference_point_offset():
    """Passing a nonzero origin winding shifts every output by it."""
    v = _loop_deg([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])
    origin = np.array(
        [float(a) for a in np.ravel(ci.latlng_to_xyz(np.radians(-60.0), np.radians(-120.0)))]
    )
    x, y, z = ci.latlng_to_xyz(np.radians(np.array([5.0])), np.radians(np.array([5.0])))
    pts = np.stack([x, y, z], axis=1)
    a = predicates.winding_numbers(origin, pts, v, origin_winding=0)
    b = predicates.winding_numbers(origin, pts, v, origin_winding=7)
    assert int(b[0]) - int(a[0]) == 7
