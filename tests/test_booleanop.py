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


def _area(poly):
    """Polygon area under the XOR-loop convention (every stored loop is
    CCW-small; holes subtract): outer loops minus contained loops — here
    computed via dense membership sampling, which is representation-free."""
    rng = np.random.default_rng(11)
    from s2_geometry_library_java_spark.kernel import cellid as ci

    lat = np.radians(rng.uniform(10, 30, 20000))
    lng = np.radians(rng.uniform(20, 46, 20000))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    return poly.contains_points(x, y, z).mean()


def _members(poly, n=4000, seed=7, lat_rng=(10, 30), lng_rng=(20, 46)):
    rng = np.random.default_rng(seed)
    from s2_geometry_library_java_spark.kernel import cellid as ci

    lat = np.radians(rng.uniform(*lat_rng, n))
    lng = np.radians(rng.uniform(*lng_rng, n))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    return (x, y, z)


@pytest.mark.parametrize(
    "op,combine",
    [
        ("intersection", lambda ia, ib: ia & ib),
        ("union", lambda ia, ib: ia | ib),
        ("difference", lambda ia, ib: ia & ~ib),
        ("symmetric_difference", lambda ia, ib: ia ^ ib),
    ],
)
def test_boolean_degenerate_membership(op, combine):
    """Degenerate pairs (shared vertices/edges, tangencies, identity) go
    through the snap-rounding path and must still match pointwise
    membership — the S2PolygonTest OVERLAP-style contract."""

    def poly(pts):
        return rg.Polygon([rg.Loop.from_latlng_degrees(pts)])

    big = poly([(14.0, 24.0), (14.0, 36.0), (26.0, 36.0), (26.0, 24.0)])
    cases = {
        # identical polygons
        "identical": (big, poly([(14.0, 24.0), (14.0, 36.0), (26.0, 36.0), (26.0, 24.0)])),
        # full shared edge, side by side (meridian edge => true geodesic)
        "adjacent": (big, poly([(14.0, 36.0), (14.0, 48.0), (26.0, 48.0), (26.0, 36.0)])),
        # shared corner only
        "corner": (big, poly([(26.0, 36.0), (26.0, 44.0), (32.0, 44.0), (32.0, 36.0)])),
        # collinear partial edge overlap, no shared vertices (notch)
        "notch": (big, poly([(16.0, 24.0), (16.0, 28.0), (20.0, 28.0), (20.0, 24.0)])),
        # vertex of B in the interior of A's edge, crossing boundary
        "t_cross": (big, poly([(18.0, 36.0), (14.0, 44.0), (22.0, 44.0)])),
    }
    for name, (pa, pb) in cases.items():
        out = bo.boolean_op(pa, pb, op)
        x, y, z = _members(pa, lat_rng=(12, 34), lng_rng=(22, 50))
        got = out.contains_points(x, y, z)
        want = combine(pa.contains_points(x, y, z), pb.contains_points(x, y, z))
        assert (got == want).all(), (name, op, int((got != want).sum()))


def test_boolean_snapped_notch_is_single_loop():
    """The snap path must emit the dented single boundary for a notch
    carved out at the edge, not an XOR hole pair."""

    def poly(pts):
        return rg.Polygon([rg.Loop.from_latlng_degrees(pts)])

    big = poly([(14.0, 24.0), (14.0, 36.0), (26.0, 36.0), (26.0, 24.0)])
    notch = poly([(16.0, 24.0), (16.0, 28.0), (20.0, 28.0), (20.0, 24.0)])
    d = bo.boolean_op_snapped(big, notch, "difference")
    assert len(d.loops) == 1
    assert len(d.loops[0].vertices) == 8


def test_boolean_grid_property_stress():
    """Randomized rectilinear polygons on a shared integer grid — the
    adversarial regime for boolean ops (shared vertices/edges, collinear
    overlaps, tangencies on nearly every pair). All four ops must match
    pointwise membership; 10 seeded pairs x 4 ops."""
    from s2_geometry_library_java_spark.kernel import cellid as ci

    rng = np.random.default_rng(7)

    def grid_poly():
        kind = rng.integers(0, 3)
        la0 = float(rng.integers(-5, 6) * 2)
        ln0 = float(rng.integers(-5, 6) * 2)
        h = float(rng.integers(2, 5) * 2)
        w = float(rng.integers(2, 5) * 2)
        if kind == 0:
            pts = [(la0, ln0), (la0, ln0 + w), (la0 + h, ln0 + w), (la0 + h, ln0)]
            return rg.Polygon([rg.Loop.from_latlng_degrees(pts)])
        if kind == 1:  # L-shape
            pts = [(la0, ln0), (la0, ln0 + w), (la0 + h / 2, ln0 + w),
                   (la0 + h / 2, ln0 + w / 2), (la0 + h, ln0 + w / 2), (la0 + h, ln0)]
            return rg.Polygon([rg.Loop.from_latlng_degrees(pts)])
        shell = [(la0, ln0), (la0, ln0 + w), (la0 + h, ln0 + w), (la0 + h, ln0)]
        hole = [(la0 + h / 4, ln0 + w / 4), (la0 + h / 4, ln0 + w / 2),
                (la0 + h / 2, ln0 + w / 2), (la0 + h / 2, ln0 + w / 4)]
        return rg.Polygon([rg.Loop.from_latlng_degrees(shell),
                           rg.Loop.from_latlng_degrees(hole)])

    lat = np.radians(rng.uniform(-14, 18, 2000))
    lng = np.radians(rng.uniform(-14, 18, 2000))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    combos = {
        "intersection": lambda a, b: a & b,
        "union": lambda a, b: a | b,
        "difference": lambda a, b: a & ~b,
        "symmetric_difference": lambda a, b: a ^ b,
    }
    for _ in range(10):
        A, B = grid_poly(), grid_poly()
        ia = A.contains_points(x, y, z)
        ib = B.contains_points(x, y, z)
        for op, comb in combos.items():
            got = bo.boolean_op(A, B, op).contains_points(x, y, z)
            assert (got == comb(ia, ib)).all(), (op, A.to_text(), B.to_text())


# ---------------------------------------------------------------------------
# S2PolygonTest named-fixture parity (S2PolygonTest.java:95-150): CROSS1/2
# form a cross with ONLY shared vertices; OVERLAP1/2 share the middle cell
# with local containment at every shared vertex. Both are snap-path inputs.
# ---------------------------------------------------------------------------

CROSS1 = "-2:1, -1:1, 1:1, 2:1, 2:-1, 1:-1, -1:-1, -2:-1"
CROSS2 = "1:-2, 1:-1, 1:1, 1:2, -1:2, -1:1, -1:-1, -1:-2"
OVERLAP1 = "0:1, 1:1, 2:1, 2:0, 1:0, 0:0"
OVERLAP2 = "1:1, 2:1, 3:1, 3:0, 2:0, 1:0"


def _mem(poly, n=4000, seed=13, lat=(-4, 5), lng=(-4, 5)):
    from s2_geometry_library_java_spark.kernel import cellid as ci

    rng = np.random.default_rng(seed)
    la = np.radians(rng.uniform(*lat, n))
    ln = np.radians(rng.uniform(*lng, n))
    return ci.latlng_to_xyz(la, ln)


def test_s2polygontest_cross_fixtures():
    a = rg.Polygon.from_text(CROSS1)
    b = rg.Polygon.from_text(CROSS2)
    inter = bo.intersection(a, b)
    # the intersection is the center square, whose 4 corners are SHARED
    # input vertices — the snap path must emit them exactly
    assert len(inter.loops) == 1
    got = {tuple(v) for v in inter.loops[0].vertices}
    want = {
        tuple(v)
        for v in rg.Polygon.from_text("-1:1, 1:1, 1:-1, -1:-1").loops[0].vertices
    }
    assert got == want
    x, y, z = _mem(None)
    for op, comb in (
        ("intersection", lambda ia, ib: ia & ib),
        ("union", lambda ia, ib: ia | ib),
        ("difference", lambda ia, ib: ia & ~ib),
    ):
        out = bo.boolean_op(a, b, op).contains_points(x, y, z)
        assert (
            out == comb(a.contains_points(x, y, z), b.contains_points(x, y, z))
        ).all(), op


def test_s2polygontest_overlap_fixtures():
    a = rg.Polygon.from_text(OVERLAP1)
    b = rg.Polygon.from_text(OVERLAP2)
    inter = bo.intersection(a, b)
    assert len(inter.loops) == 1
    got = {tuple(v) for v in inter.loops[0].vertices}
    want = {
        tuple(v)
        for v in rg.Polygon.from_text("1:0, 1:1, 2:1, 2:0").loops[0].vertices
    }
    assert got == want
    x, y, z = _mem(None, lat=(-2, 5), lng=(-2, 3))
    for op, comb in (
        ("intersection", lambda ia, ib: ia & ib),
        ("union", lambda ia, ib: ia | ib),
        ("difference", lambda ia, ib: ia & ~ib),
        ("symmetric_difference", lambda ia, ib: ia ^ ib),
    ):
        out = bo.boolean_op(a, b, op).contains_points(x, y, z)
        assert (
            out == comb(a.contains_points(x, y, z), b.contains_points(x, y, z))
        ).all(), op


def test_clip_boundary_batch_bit_equal_scalar():
    """The vectorized clip path must emit the exact same directed segment
    set (bit-equal tuples) as the scalar reference implementation, for all
    three clip configurations, on wavy overlapping polygons."""
    import numpy as np

    from s2_geometry_library_java_spark.kernel import booleanop as bo
    from s2_geometry_library_java_spark.kernel import region as rg

    def make(lat0, lng0, r, n, phase):
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        lats = lat0 + r * np.sin(ang + phase) * (1 + 0.2 * np.sin(3 * ang))
        lngs = lng0 + r * np.cos(ang + phase) * (1 + 0.2 * np.cos(5 * ang))
        return rg.Polygon([rg.Loop.from_latlng_degrees(list(zip(lats, lngs)))])

    for k in range(4):
        a = make(10 + k, 20, 5.0, 23, 0.1 * k)
        b = make(11 + k, 21.5, 5.0, 31, 0.05 * k + 0.3)
        Aa, Ab, Ba, Bb, ii, jj, X = bo._pair_crossings_batch(a, b)
        assert len(ii) > 0
        for keep, rev in ((True, False), (False, False), (True, True)):
            cache = {}
            want_a = bo._clip_boundary(a, b, keep, rev, cache)
            want_b = bo._clip_boundary(b, a, keep, rev, cache)
            got_a = bo._clip_boundary_batch(Aa, Ab, ii, X, b, keep, rev)
            got_b = bo._clip_boundary_batch(Ba, Bb, jj, X, a, keep, rev)
            assert got_a == want_a
            assert got_b == want_b


def test_boolean_op_mixed_shared_edge():
    """CLOSED-model mixed outputs (S2BooleanOperation polygon models +
    S2ClosedSetNormalizer): two quads tangent along a full shared edge.
    Intersection of their closures is exactly that edge -> degenerate
    edge(s), empty polygon, no points; union has no degeneracies."""
    import numpy as np

    from s2_geometry_library_java_spark.kernel import booleanop as bo
    from s2_geometry_library_java_spark.kernel import edges as ek
    from s2_geometry_library_java_spark.kernel import region as rg

    A = rg.Polygon([rg.Loop.from_latlng_degrees(
        [(14.0, 24.0), (14.0, 36.0), (26.0, 36.0), (26.0, 24.0)])])
    B = rg.Polygon([rg.Loop.from_latlng_degrees(
        [(14.0, 36.0), (14.0, 48.0), (26.0, 48.0), (26.0, 36.0)])])

    poly, edges, points = bo.boolean_op_mixed(A, B, "intersection")
    assert not poly.loops
    assert edges and not points
    # every degenerate edge lies on the shared meridian lng=36 (strictly:
    # on the great circle through the shared edge's endpoints), between
    # lat 14 and 26
    from s2_geometry_library_java_spark.kernel import cellid as ci

    sa = np.ravel(ci.latlng_to_xyz(np.radians(14.0), np.radians(36.0)))
    sb = np.ravel(ci.latlng_to_xyz(np.radians(26.0), np.radians(36.0)))
    for p0, p1 in edges:
        for p in (p0, p1):
            d2 = float(np.atleast_1d(ek.min_chord2_to_edges(p, sa, sb))[0])
            assert d2 < 1e-18
    # the union of the emitted degenerate edges spans the whole shared
    # edge: total arc length equals the full edge's
    import numpy as np
    total = sum(
        float(np.arctan2(np.linalg.norm(np.cross(p0, p1)), p0 @ p1))
        for p0, p1 in edges
    )
    full = float(np.arctan2(np.linalg.norm(np.cross(sa, sb)), sa @ sb))
    assert abs(total - full) < 1e-9

    # union: tangent edge is interior, no degeneracies
    polyu, eu, pu = bo.boolean_op_mixed(A, B, "union")
    assert polyu.loops and not eu and not pu

    # tangent-exterior difference: the shared edge is REGULAR boundary of
    # A \ B (= A), not degenerate
    polyd, edd, pd = bo.boolean_op_mixed(A, B, "difference")
    assert polyd.loops and not edd and not pd

    # flush-interior difference: A2 inside B sharing a sub-segment of B's
    # left MERIDIAN edge (meridians are true geodesics, so the shared
    # piece is exactly collinear). closed(A2) \ open(B) leaves exactly
    # that flush piece as degenerate edges
    # (S2ClosedSetNormalizer difference degeneracy).
    A2 = rg.Polygon([rg.Loop.from_latlng_degrees(
        [(16.0, 36.0), (16.0, 42.0), (22.0, 42.0), (22.0, 36.0)])])
    polyf, edf, pf = bo.boolean_op_mixed(A2, B, "difference")
    assert not polyf.loops and edf and not pf
    # flush pieces lie on the lng-36 meridian between lat 16 and 22
    m0 = np.ravel(ci.latlng_to_xyz(np.radians(16.0), np.radians(36.0)))
    m1 = np.ravel(ci.latlng_to_xyz(np.radians(22.0), np.radians(36.0)))
    total_f = 0.0
    for p0, p1 in edf:
        for p in (p0, p1):
            d2 = float(np.atleast_1d(ek.min_chord2_to_edges(p, m0, m1))[0])
            assert d2 < 1e-18
        total_f += float(np.arctan2(np.linalg.norm(np.cross(p0, p1)), p0 @ p1))
    full_f = float(np.arctan2(np.linalg.norm(np.cross(m0, m1)), m0 @ m1))
    assert abs(total_f - full_f) < 1e-9


def test_boolean_op_mixed_shared_vertex():
    """Two quads touching at exactly one vertex: closed intersection is
    that point -> one degenerate point, no edges, empty polygon."""
    from s2_geometry_library_java_spark.kernel import booleanop as bo
    from s2_geometry_library_java_spark.kernel import cellid as ci
    from s2_geometry_library_java_spark.kernel import region as rg
    import numpy as np

    A = rg.Polygon([rg.Loop.from_latlng_degrees(
        [(10.0, 10.0), (10.0, 20.0), (20.0, 20.0), (20.0, 10.0)])])
    B = rg.Polygon([rg.Loop.from_latlng_degrees(
        [(20.0, 20.0), (20.0, 30.0), (30.0, 30.0), (30.0, 20.0)])])
    poly, edges, points = bo.boolean_op_mixed(A, B, "intersection")
    assert not poly.loops and not edges
    assert len(points) == 1
    want = np.ravel(ci.latlng_to_xyz(np.radians(20.0), np.radians(20.0)))
    got = points[0]
    assert float(((got - want) ** 2).sum()) < 1e-18

    # regularized polygon path unchanged: plain boolean_op gives empty
    assert not bo.boolean_op(A, B, "intersection").loops


def test_snapped_indexed_membership_branch(monkeypatch):
    """Forcing the indexed-membership branch must not change any snapped
    boolean result (bit-equal output polygons vs the broadcast branch)."""
    from s2_geometry_library_java_spark.kernel import booleanop as bo2

    def poly(pts):
        return rg.Polygon([rg.Loop.from_latlng_degrees(pts)])

    big = poly([(14.0, 24.0), (14.0, 36.0), (26.0, 36.0), (26.0, 24.0)])
    cases = [
        poly([(14.0, 36.0), (14.0, 48.0), (26.0, 48.0), (26.0, 36.0)]),
        poly([(16.0, 24.0), (16.0, 28.0), (20.0, 28.0), (20.0, 24.0)]),
        poly([(18.0, 36.0), (14.0, 44.0), (22.0, 44.0)]),
    ]
    for other in cases:
        for op in ("intersection", "union", "difference", "symmetric_difference"):
            base = bo2.boolean_op_snapped(big, other, op)
            monkeypatch.setattr(bo2, "INDEXED_PROBE_THRESHOLD", 0)
            forced = bo2.boolean_op_snapped(big, other, op)
            monkeypatch.setattr(bo2, "INDEXED_PROBE_THRESHOLD", 2_000_000)
            assert len(base.loops) == len(forced.loops)
            for lb, lf in zip(base.loops, forced.loops):
                assert np.array_equal(lb.vertices, lf.vertices)


def _rect4(lat0, lat1, lng0, lng1):
    return rg.Polygon([rg.Loop.from_latlng_degrees(
        [(lat0, lng0), (lat0, lng1), (lat1, lng1), (lat1, lng0)])])


def _on_any_edge(p, edges, tol2=1e-24):
    from s2_geometry_library_java_spark.kernel import edges as ekr
    for e0, e1 in edges:
        if float(np.atleast_1d(ekr.min_chord2_to_edges(p, e0, e1))[0]) < tol2:
            return True
    return False


class TestOpenModelMixed:
    """OPEN polygon model (S2BooleanOperation.java:268-273): operands are
    open sets, so degeneracies are subtractive cracks/punctures (the
    reference's degenerate holes, S2LaxPolygonLayer DegenerateBoundaries)."""

    def test_union_abutting_squares_emits_crack(self):
        a = _rect4(14, 26, 24, 36)
        b = _rect4(14, 26, 36, 48)
        poly, cracks, punc = bo.boolean_op_mixed(a, b, "union", model="open")
        # regularized polygon identical to the snapped result
        ref = bo.boolean_op_snapped(a, b, "union")
        assert len(poly.loops) == len(ref.loops) == 1
        assert not punc
        assert cracks, "shared edge must be excluded from the open union"
        # every crack point lies on the lng=36 meridian between lat 14..26
        from s2_geometry_library_java_spark.kernel import cellid as ci
        for e0, e1 in cracks:
            for p in (e0, e1):
                lat, lng = ci.xyz_to_latlng(p[0], p[1], p[2])
                assert abs(np.degrees(lng) - 36.0) < 1e-9
                assert 14.0 - 1e-9 <= np.degrees(lat) <= 26.0 + 1e-9
        # cracks cover the full shared edge: endpoints 14 and 26 appear
        lats = sorted(
            round(float(np.degrees(ci.xyz_to_latlng(p[0], p[1], p[2])[0])), 6)
            for e in cracks for p in e
        )
        assert lats[0] == 14.0 and lats[-1] == 26.0

    def test_open_intersection_of_tangent_pair_is_fully_empty(self):
        a = _rect4(14, 26, 24, 36)
        b = _rect4(14, 26, 36, 48)
        poly, cracks, punc = bo.boolean_op_mixed(a, b, "intersection", model="open")
        assert not poly.loops and not cracks and not punc
        # while the CLOSED intersection is exactly the shared edge
        _, de, _ = bo.boolean_op_mixed(a, b, "intersection", model="closed")
        assert de

    def test_open_difference_abutting_has_no_degeneracies(self):
        a = _rect4(14, 26, 24, 36)
        b = _rect4(14, 26, 36, 48)
        poly, cracks, punc = bo.boolean_op_mixed(a, b, "difference", model="open")
        assert len(poly.loops) == 1 and not cracks and not punc

    def test_union_l_shape_with_notch_square_cracks_both_notch_edges(self):
        # L-shape covering three quadrants of [0,2]x[0,2]; notch = [1,2]x[1,2]
        l_shape = rg.Polygon([rg.Loop.from_latlng_degrees(
            [(0, 0), (0, 2), (1, 2), (1, 1), (2, 1), (2, 0)])])
        notch = _rect4(1, 2, 1, 2)
        poly, cracks, punc = bo.boolean_op_mixed(l_shape, notch, "union", model="open")
        assert len(poly.loops) == 1
        assert len(cracks) >= 2, "both notch edges are cracks in the open union"
        # the reflex corner (1,1) is an endpoint of a crack (suppressed as
        # a puncture per the closed-set-normalizer rule)
        from s2_geometry_library_java_spark.kernel import cellid as ci
        corner = np.ravel(ci.latlng_to_xyz(np.radians(1.0), np.radians(1.0)))
        assert _on_any_edge(corner, cracks)
        assert not punc

    def test_semi_open_never_degenerate(self):
        a = _rect4(14, 26, 24, 36)
        b = _rect4(14, 26, 36, 48)
        for op in ("union", "intersection", "difference", "symmetric_difference"):
            poly, de, dp = bo.boolean_op_mixed(a, b, op, model="semi_open")
            ref = bo.boolean_op_snapped(a, b, op)
            assert len(poly.loops) == len(ref.loops)
            assert de == [] and dp == []

    def test_unknown_model_raises(self):
        a = _rect4(14, 26, 24, 36)
        with pytest.raises(ValueError):
            bo.boolean_op_mixed(a, a, "union", model="half_open")
