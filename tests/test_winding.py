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


def _pt(lat, lng):
    return np.array(
        [float(a) for a in np.ravel(ci.latlng_to_xyz(np.radians(lat), np.radians(lng)))]
    )


def test_snapped_winding_delta_lens_case():
    """GetSnappedWindingDelta.java semantics: when snapping pulls an edge
    across the reference point, the delta is exactly the winding change
    measured independently from a far base point."""
    from s2_geometry_library_java_spark.kernel import builder as bu
    from s2_geometry_library_java_spark.kernel import windingop as wo

    sq = [(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)]
    big = _loop_deg(sq)
    # a second loop with a vertex just above the big loop's bottom edge:
    # under a 0.02 rad snap radius that vertex becomes a site ON the
    # bottom edge's chain, detouring the snapped edge upward past ref
    small = _loop_deg([(0.3, 4.0), (0.3, 6.0), (0.9, 5.0)])
    loops = [big, small]

    bld = bu.SnapBuilder(bu.IdentitySnapFunction(0.02), split_crossing_edges=True)
    for v in loops:
        bld.add_loop(v, layer=0)
    g = bld.build()
    A = np.stack(bld._a)
    B = np.stack(bld._b)

    # snapped closed chains per loop (same construction as winding_operation)
    snapped, off = [], 0
    for v in loops:
        ids = []
        for ei in range(off, off + len(v)):
            for s in g.chains[ei]:
                if not ids or s != ids[-1]:
                    ids.append(s)
        off += len(v)
        if len(ids) > 1 and ids[0] == ids[-1]:
            ids.pop()
        snapped.append(g.sites[np.asarray(ids, dtype=np.int64)])

    base = _pt(-60.0, -120.0)  # winding 0 for originals and snapped alike

    def w_at(p, loop_list):
        return sum(
            int(predicates.winding_numbers(base, p[None], lv, 0)[0])
            for lv in loop_list
        )

    # ref inside the lens: between the original bottom edge (lat 0) and
    # the snapped detour through the lat-0.3 site
    ref_lens = _pt(0.05, 5.0)
    # ref far from every edge: delta must be zero
    ref_far = _pt(5.0, 8.5)

    for ref in (ref_lens, ref_far):
        want = w_at(ref, snapped) - w_at(ref, loops)
        got = wo.snapped_winding_delta(ref, A, B, g.chains, g.sites)
        assert got == want, (got, want)
    assert wo.snapped_winding_delta(ref_far, A, B, g.chains, g.sites) == 0
    assert wo.snapped_winding_delta(ref_lens, A, B, g.chains, g.sites) != 0


def test_winding_operation_probes_on_snapped_graph():
    """The winding op must classify snapped sub-edges by snapped-graph
    winding: with a coarse snap pulling the boundary, the assembled
    polygon still contains a deep-interior point and excludes a far
    exterior point, and ref may sit anywhere > snap radius from edges."""
    from s2_geometry_library_java_spark.kernel import windingop as wo

    big = _loop_deg([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])
    small = _loop_deg([(0.3, 4.0), (0.3, 6.0), (0.9, 5.0)])
    ref = _pt(-60.0, -120.0)
    poly = wo.winding_operation([big, small], ref, 0, rule="positive", snap_radius=0.02)
    inside = _pt(5.0, 5.0)
    outside = _pt(-5.0, 5.0)
    assert bool(poly.contains_points(inside[0:1], inside[1:2], inside[2:3])[0])
    assert not bool(poly.contains_points(outside[0:1], outside[1:2], outside[2:3])[0])


def test_winding_indexed_equals_broadcast():
    """The signed edge-soup index path must agree with the broadcast
    winding batch on a multi-loop arrangement with holes and overlaps."""
    from s2_geometry_library_java_spark.kernel import shapeindex as si

    rng = np.random.default_rng(17)
    loops = []
    for k in range(5):
        clat, clng = 10.0 + 7 * k, 20.0 + 5 * k
        n = 24
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        pts = [(clat + 6 * np.sin(a), clng + 6 * np.cos(a)) for a in ang]
        if k % 2:
            pts = pts[::-1]  # CW: negative winding contribution
        loops.append(_loop_deg(pts))
    ea = np.concatenate(loops, axis=0)
    eb = np.concatenate([np.roll(lv, -1, axis=0) for lv in loops], axis=0)
    base = _pt(-60.0, -120.0)

    probes = []
    for k in range(300):
        la = rng.uniform(0, 50)
        ln = rng.uniform(10, 50)
        probes.append(_pt(la, ln))
    probes = np.asarray(probes)

    want = np.zeros(len(probes), dtype=np.int64)
    for lv in loops:
        want += predicates.winding_numbers(base, probes, lv, 0)

    def wind_at(p):
        w = 0
        for lv in loops:
            w += int(predicates.winding_numbers(base, p[None], lv, 0)[0])
        return w

    rows = si.build_edge_soup_index(
        ea, eb, max_edges_per_cell=8, contains_point=wind_at, signed=True
    )
    got = si.winding_points_indexed(rows, ea, eb, probes)
    assert np.array_equal(got, want), (got[:10], want[:10])
    assert set(want.tolist()) - {0, 1}  # overlaps produced richer windings


def test_winding_operation_indexed_branch(monkeypatch):
    """Forcing winding_operation's indexed probe branch must reproduce
    the broadcast branch's polygon exactly."""
    from s2_geometry_library_java_spark.kernel import windingop as wo

    big = _loop_deg([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])
    small = _loop_deg([(2.0, 2.0), (2.0, 6.0), (6.0, 6.0), (6.0, 2.0)])
    ref = _pt(-60.0, -120.0)
    base = wo.winding_operation([big, small], ref, 0, rule="odd")
    monkeypatch.setattr(wo, "INDEXED_PROBE_THRESHOLD", 0)
    forced = wo.winding_operation([big, small], ref, 0, rule="odd")
    assert len(base.loops) == len(forced.loops)
    for lb, lf in zip(base.loops, forced.loops):
        assert np.array_equal(lb.vertices, lf.vertices)
