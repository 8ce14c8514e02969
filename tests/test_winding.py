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


def _sq(pts):
    return rg.Loop.from_latlng_degrees(pts).vertices


def _far_origin():
    return np.array(
        [
            float(a)
            for a in np.ravel(
                ci.latlng_to_xyz(np.radians(-60.0), np.radians(-120.0))
            )
        ]
    )


def _members(poly, seed=3, n=4000, lat=(0, 26), lng=(0, 26)):
    rng = np.random.default_rng(seed)
    la = np.radians(rng.uniform(*lat, n))
    ln = np.radians(rng.uniform(*lng, n))
    x, y, z = ci.latlng_to_xyz(la, ln)
    return np.stack([x, y, z], axis=1)


def test_winding_operation_union_and_intersection():
    """S2WindingOperationTest semantics: two overlapping CCW squares with
    POSITIVE rule give the union; rule w >= 2 gives the intersection."""
    from s2_geometry_library_java_spark.kernel import windingop as wo

    a = _sq([(2.0, 2.0), (2.0, 14.0), (14.0, 14.0), (14.0, 2.0)])
    b = _sq([(8.0, 8.0), (8.0, 20.0), (20.0, 20.0), (20.0, 8.0)])
    la = rg.Loop(a)
    lb = rg.Loop(b)
    origin = _far_origin()
    pts = _members(None)

    union = wo.winding_operation([a, b], origin, 0, "positive")
    got = union.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
    want = la.contains_points(pts[:, 0], pts[:, 1], pts[:, 2]) | lb.contains_points(
        pts[:, 0], pts[:, 1], pts[:, 2]
    )
    assert (got == want).all()

    inter = wo.winding_operation([a, b], origin, 0, lambda w: w >= 2)
    got = inter.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
    want = la.contains_points(pts[:, 0], pts[:, 1], pts[:, 2]) & lb.contains_points(
        pts[:, 0], pts[:, 1], pts[:, 2]
    )
    assert (got == want).all()

    odd = wo.winding_operation([a, b], origin, 0, "odd")
    got = odd.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
    want = la.contains_points(pts[:, 0], pts[:, 1], pts[:, 2]) ^ lb.contains_points(
        pts[:, 0], pts[:, 1], pts[:, 2]
    )
    assert (got == want).all()


def test_winding_operation_doubly_wound():
    """A loop winding twice: POSITIVE keeps the square once; w >= 2 keeps
    the (slightly smaller) double-covered core."""
    from s2_geometry_library_java_spark.kernel import windingop as wo

    sq = [(2.0, 2.0), (2.0, 14.0), (14.0, 14.0), (14.0, 2.0)]
    lap2 = [(la + 1e-4 * (1 if la < 8 else -1), ln + 1e-4 * (1 if ln < 8 else -1)) for la, ln in sq]
    v = _sq(sq + lap2)
    origin = _far_origin()
    pos = wo.winding_operation([v], origin, 0, "positive")
    assert len(pos.loops) == 1
    pts = _members(None, seed=9)
    outer = rg.Loop(_sq(sq))
    got = pos.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
    want = outer.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
    assert (got == want).mean() > 0.999  # boundary band between laps is tiny

    core = wo.winding_operation([v], origin, 0, lambda w: w >= 2)
    assert len(core.loops) == 1
    got = core.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
    inner = rg.Loop(_sq(lap2))
    want = inner.contains_points(pts[:, 0], pts[:, 1], pts[:, 2]) & want
    assert (got == want).mean() > 0.999
