"""G1 boolean ops: membership equivalence against the input polygons."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import booleanop as bo
from s2_geometry_library_java_spark.kernel import region as rg
from s2_geometry_library_java_spark.kernel import sphere


def _quad(clat, clng, h):
    return rg.Polygon(
        [
            rg.Loop.from_latlng_degrees(
                [
                    (clat - h, clng - h),
                    (clat - h, clng + h),
                    (clat + h, clng + h),
                    (clat + h, clng - h),
                ]
            )
        ]
    )


def _sample(rng, n=3000):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


A = _quad(20.0043, 30.0021, 6.0)
B = _quad(24.0043, 34.0021, 6.0)


@pytest.mark.parametrize(
    "op,combine",
    [
        ("intersection", lambda ia, ib: ia & ib),
        ("union", lambda ia, ib: ia | ib),
        ("difference", lambda ia, ib: ia & ~ib),
    ],
)
def test_boolean_membership_overlapping(op, combine):
    out = bo.boolean_op(A, B, op)
    rng = np.random.default_rng(5)
    # dense sample in the neighborhood so the interesting region is hit
    lat = np.radians(rng.uniform(10, 34, 4000))
    lng = np.radians(rng.uniform(20, 44, 4000))
    from s2_geometry_library_java_spark.kernel import cellid as ci

    x, y, z = ci.latlng_to_xyz(lat, lng)
    got = out.contains_points(x, y, z)
    want = combine(A.contains_points(x, y, z), B.contains_points(x, y, z))
    assert (got == want).all()


def test_boolean_nested_and_disjoint():
    inner = _quad(20.0043, 30.0021, 2.0)
    far = _quad(-40.0043, -100.0021, 3.0)
    # nested
    assert bo.intersection(A, inner).loops[0].vertices.shape == inner.loops[0].vertices.shape
    assert len(bo.union(A, inner).loops) == 1
    diff = bo.difference(A, inner)
    assert len(diff.loops) == 2  # A with a hole
    rng = np.random.default_rng(6)
    from s2_geometry_library_java_spark.kernel import cellid as ci

    lat = np.radians(rng.uniform(12, 28, 2000))
    lng = np.radians(rng.uniform(22, 38, 2000))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    got = diff.contains_points(x, y, z)
    want = A.contains_points(x, y, z) & ~inner.contains_points(x, y, z)
    assert (got == want).all()
    # disjoint
    assert bo.intersection(A, far).loops == []
    assert len(bo.union(A, far).loops) == 2
    d_far = bo.difference(A, far)
    assert len(d_far.loops) == 1
    assert {tuple(v) for v in d_far.loops[0].vertices} == {
        tuple(v) for v in A.loops[0].vertices
    }


def test_boolean_area_identity():
    """area(A) + area(B) == area(A u B) + area(A n B), within l'Huilier
    accumulation error."""

    def area(poly):
        return sum(sphere.signed_loop_area(lp.vertices) for lp in poly.loops)

    a_area, b_area = area(A), area(B)
    u = area(bo.union(A, B))
    i = area(bo.intersection(A, B))
    np.testing.assert_allclose(a_area + b_area, u + i, rtol=1e-9)


def test_boolean_degenerate_raises():
    with pytest.raises(ValueError):
        bo.intersection(A, A)  # shared vertices: not generic position
