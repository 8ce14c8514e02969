"""S2LoopTest.testLoopRelations parity (S2LoopTest.java:706-800 plus the
testContainsRegression fixtures): the reference's loop-relation truth
table — CONTAINS / CONTAINED / DISJOINT / COVERS per pair, including
shared-edge and CW (inverted) fixtures — evaluated through the boolean-op
kernel: A contains B iff difference(B, A) is empty, disjoint iff the
intersection is empty, covers iff the union is the full sphere. A
regularized result with no boundary is constant over the sphere, so one
off-boundary probe decides empty vs full exactly.

The reference's full/empty singleton loops are not representable as
vertex loops here and those rows are skipped (empty/full regions live in
Cap/composite regions instead)."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import booleanop as bo
from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import region as rg

CONTAINS, CONTAINED, DISJOINT, COVERS = 1, 2, 4, 8

_TEXT = {
    "candy_cane": "-20:150, -20:-70, 0:70, 10:-150, 10:70, -10:-70",
    "small_ne_cw": "35:20, 45:20, 40:25",
    "arctic_80": "80:-150, 80:-30, 80:90",
    "antarctic_80": "-80:120, -80:0, -80:-120",
    "north_hemi": "0:-180, 0:-90, 0:0, 0:90",
    "north_hemi3": "0:-180, 0:-60, 0:60",
    "west_hemi": "0:-180, -90:0, 0:0, 90:0",
    "near_hemi": "0:-90, -90:0, 0:90, 90:0",
    "loop_a": "0:178, -1:180, 0:-179, 1:-180",
    "loop_b": "0:179, -1:180, 0:-178, 1:-180",
    "a_intersect_b": "0:179, -1:180, 0:-179, 1:-180",
    "a_union_b": "0:178, -1:180, 0:-178, 1:-180",
    "a_minus_b": "0:178, -1:180, 0:179, 1:-180",
    "b_minus_a": "0:-179, -1:180, 0:-178, 1:-180",
}


def _loop(text):
    """makeLoop semantics: vertex order preserved, NO normalization
    (a CW loop covers the complement)."""
    pts = []
    for tok in text.split(","):
        la, ln = tok.strip().split(":")
        pts.append((float(la), float(ln)))
    verts = np.array([
        np.ravel(ci.latlng_to_xyz(np.radians(la), np.radians(ln)))
        for la, ln in pts
    ])
    return rg.Polygon([rg.Loop(verts)])


def _invert(text):
    toks = [t.strip() for t in text.split(",")]
    return ", ".join(reversed(toks))


LOOPS = {name: _loop(t) for name, t in _TEXT.items()}
LOOPS["south_hemi"] = _loop(_invert(_TEXT["north_hemi"]))
LOOPS["east_hemi"] = _loop(_invert(_TEXT["west_hemi"]))
LOOPS["far_hemi"] = _loop(_invert(_TEXT["near_hemi"]))

# an off-boundary probe: decides empty-vs-full for loopless results
_PROBE = np.ravel(ci.latlng_to_xyz(np.radians(11.1137), np.radians(23.7159)))


def _member(poly, p):
    r = False
    for lp in poly.loops:
        r ^= bool(lp.contains_points(p[0:1], p[1:2], p[2:3])[0])
    return r


def _result_nonempty(res, a, b, op):
    """A regularized boolean result with boundary loops is non-empty; a
    loopless result is constant and one probe of the pointwise
    combination decides it."""
    if res.loops:
        return True
    ia, ib = _member(a, _PROBE), _member(b, _PROBE)
    combine = {
        "intersection": ia and ib,
        "union": ia or ib,
        "difference": ia and not ib,
    }[op]
    return combine


def relations(a, b):
    inter = _result_nonempty(bo.boolean_op(a, b, "intersection"), a, b, "intersection")
    dif_ba = _result_nonempty(bo.boolean_op(b, a, "difference"), b, a, "difference")
    dif_ab = _result_nonempty(bo.boolean_op(a, b, "difference"), a, b, "difference")
    union = bo.boolean_op(a, b, "union")
    union_full = (
        not union.loops and _result_nonempty(union, a, b, "union")
    ) or (len(union.loops) == 1 and union.loops[0].is_full())
    flags = 0
    if not dif_ba:
        flags |= CONTAINS
    if not dif_ab:
        flags |= CONTAINED
    if not inter:
        flags |= DISJOINT
    if union_full:
        flags |= COVERS
    return flags


# (a, b, flags) rows from S2LoopTest.testLoopRelations (full/empty rows
# skipped; see module docstring)
TABLE = [
    ("north_hemi", "north_hemi", CONTAINS | CONTAINED),
    ("north_hemi", "south_hemi", DISJOINT | COVERS),
    ("north_hemi", "east_hemi", 0),
    ("north_hemi", "arctic_80", CONTAINS),
    ("north_hemi", "antarctic_80", DISJOINT),
    ("north_hemi", "candy_cane", 0),
    ("north_hemi3", "north_hemi3", CONTAINS | CONTAINED),
    ("north_hemi3", "east_hemi", 0),
    ("north_hemi3", "arctic_80", CONTAINS),
    ("north_hemi3", "antarctic_80", DISJOINT),
    ("north_hemi3", "candy_cane", 0),
    ("south_hemi", "north_hemi", DISJOINT | COVERS),
    ("south_hemi", "south_hemi", CONTAINS | CONTAINED),
    ("south_hemi", "far_hemi", 0),
    ("south_hemi", "arctic_80", DISJOINT),
    ("south_hemi", "antarctic_80", CONTAINS),
    ("south_hemi", "candy_cane", 0),
    ("candy_cane", "north_hemi", 0),
    ("candy_cane", "south_hemi", 0),
    ("candy_cane", "arctic_80", DISJOINT),
    ("candy_cane", "antarctic_80", DISJOINT),
    ("candy_cane", "candy_cane", CONTAINS | CONTAINED),
    ("near_hemi", "west_hemi", 0),
    ("small_ne_cw", "south_hemi", CONTAINS),
    ("small_ne_cw", "west_hemi", CONTAINS),
    ("small_ne_cw", "north_hemi", COVERS),
    ("small_ne_cw", "east_hemi", COVERS),
    ("loop_a", "loop_a", CONTAINS | CONTAINED),
    ("loop_a", "loop_b", 0),
    ("loop_a", "a_intersect_b", CONTAINS),
    ("loop_a", "a_union_b", CONTAINED),
    ("loop_a", "a_minus_b", CONTAINS),
    ("loop_a", "b_minus_a", DISJOINT),
    ("loop_b", "loop_a", 0),
    ("loop_b", "loop_b", CONTAINS | CONTAINED),
    ("loop_b", "a_intersect_b", CONTAINS),
    ("loop_b", "a_union_b", CONTAINED),
    ("loop_b", "a_minus_b", DISJOINT),
    ("loop_b", "b_minus_a", CONTAINS),
    ("a_intersect_b", "loop_a", CONTAINED),
    ("a_intersect_b", "loop_b", CONTAINED),
    ("a_intersect_b", "a_intersect_b", CONTAINS | CONTAINED),
    ("a_intersect_b", "a_union_b", CONTAINED),
    ("a_intersect_b", "a_minus_b", DISJOINT),
    ("a_intersect_b", "b_minus_a", DISJOINT),
    ("a_union_b", "loop_a", CONTAINS),
    ("a_union_b", "loop_b", CONTAINS),
    ("a_union_b", "a_intersect_b", CONTAINS),
    ("a_union_b", "a_union_b", CONTAINS | CONTAINED),
    ("a_union_b", "a_minus_b", CONTAINS),
    ("a_union_b", "b_minus_a", CONTAINS),
    ("a_minus_b", "loop_a", CONTAINED),
    ("a_minus_b", "loop_b", DISJOINT),
    ("a_minus_b", "a_intersect_b", DISJOINT),
    ("a_minus_b", "a_union_b", CONTAINED),
    ("a_minus_b", "a_minus_b", CONTAINS | CONTAINED),
    ("a_minus_b", "b_minus_a", DISJOINT),
    ("b_minus_a", "loop_a", DISJOINT),
    ("b_minus_a", "loop_b", CONTAINED),
    ("b_minus_a", "a_intersect_b", DISJOINT),
    ("b_minus_a", "a_union_b", CONTAINED),
    ("b_minus_a", "a_minus_b", DISJOINT),
    ("b_minus_a", "b_minus_a", CONTAINS | CONTAINED),
]


@pytest.mark.parametrize("a_name,b_name,flags", TABLE)
def test_loop_relation(a_name, b_name, flags):
    got = relations(LOOPS[a_name], LOOPS[b_name])
    assert got == flags, f"{a_name} vs {b_name}: got {got:04b}, want {flags:04b}"


def test_contains_regression():
    """S2LoopTest.testContainsRegression golden rectangles."""
    containing = _loop("-38:-135, -38:149, 77:149, 77:-135")
    inner = _loop(
        "37.99616267972809:13.007812500000002, "
        "37.99616267972809:13.359375000000002, "
        "38.272819658516866:13.359375000000002, "
        "38.272819658516866:13.007812500000002"
    )
    extended = _loop(
        "37.99616267972809:13.007812500000002, "
        "37.99616267972809:13.559375000000002, "
        "38.472819658516866:13.559375000000002, "
        "38.472819658516866:13.007812500000002"
    )
    assert relations(containing, inner) == CONTAINS
    assert relations(containing, extended) == CONTAINS


def test_snapped_full_union_representable():
    """The union of two hemispheres sharing their boundary (snap path) is
    the FULL loop, not an ambiguous empty polygon."""
    u = bo.boolean_op(LOOPS["north_hemi"], LOOPS["south_hemi"], "union")
    assert len(u.loops) == 1 and u.loops[0].is_full()
    p = _PROBE
    assert bool(u.contains_points(p[0:1], p[1:2], p[2:3])[0])
    # and the intersection of the same pair regularizes to empty
    i = bo.boolean_op(LOOPS["north_hemi"], LOOPS["south_hemi"], "intersection")
    assert not i.loops


def test_polygon_relation_api():
    """Public S2Polygon.contains/intersects surface wraps the same
    relation logic."""
    assert LOOPS["north_hemi"].contains_polygon(LOOPS["arctic_80"])
    assert not LOOPS["arctic_80"].contains_polygon(LOOPS["north_hemi"])
    assert not LOOPS["north_hemi"].intersects_polygon(LOOPS["antarctic_80"])
    assert LOOPS["north_hemi"].intersects_polygon(LOOPS["east_hemi"])
    assert LOOPS["small_ne_cw"].contains_polygon(LOOPS["south_hemi"])
    # empty polygon conventions
    empty = rg.Polygon([])
    assert LOOPS["north_hemi"].contains_polygon(empty)
    assert not empty.contains_polygon(LOOPS["north_hemi"])
    assert not empty.intersects_polygon(LOOPS["north_hemi"])


def test_polygon_area_and_overlap_fraction():
    """S2Polygon.getArea / getOverlapFraction semantics: hemisphere areas,
    hole subtraction, containment fractions."""
    north = LOOPS["north_hemi"]
    east = LOOPS["east_hemi"]
    assert abs(north.get_area() - 2 * np.pi) < 1e-9
    assert abs(LOOPS["small_ne_cw"].get_area() - (4 * np.pi - 0.0)) < 0.01
    # overlap of two orthogonal hemispheres is a quarter sphere
    assert abs(rg.Polygon.overlap_fraction(north, east) - 0.5) < 1e-6
    # nested pair: inner fully overlaps outer; outer partially
    outer = _loop("10:10, 10:20, 20:20, 20:10")
    inner = _loop("13:13, 13:17, 17:17, 17:13")
    assert rg.Polygon.overlap_fraction(inner, outer) == 1.0
    frac = rg.Polygon.overlap_fraction(outer, inner)
    assert 0.05 < frac < 0.35
    assert abs(frac - inner.get_area() / outer.get_area()) < 1e-12
    # hole subtraction: outer with inner as hole (XOR convention)
    holed = rg.Polygon(list(outer.loops) + list(inner.loops))
    assert abs(holed.get_area() - (outer.get_area() - inner.get_area())) < 1e-12
    # disjoint: fraction 0; 0/0 = 1
    assert rg.Polygon.overlap_fraction(outer, LOOPS["antarctic_80"]) == 0.0
    assert rg.Polygon.overlap_fraction(rg.Polygon([]), rg.Polygon([])) == 1.0


def test_loop_rect_bounds():
    """S2LoopTest.testBounds goldens (S2LoopTest.java:203-232) against
    the RectBounder port + pole widening."""
    assert rg.Polygon([rg.Loop.full()]).loops[0].get_rect_bound().is_full()

    cc = LOOPS["candy_cane"].loops[0].get_rect_bound()
    assert cc.lng.is_full()
    assert np.degrees(cc.lat_lo) < -20
    assert np.degrees(cc.lat_hi) > 10

    assert LOOPS["small_ne_cw"].loops[0].get_rect_bound().is_full()

    lat_err = 2e-15
    arc = LOOPS["arctic_80"].loops[0].get_rect_bound()
    assert abs(arc.lat_lo - np.radians(80)) <= lat_err
    assert abs(arc.lat_hi - np.pi / 2) <= lat_err
    assert arc.lng.is_full()
    ant = LOOPS["antarctic_80"].loops[0].get_rect_bound()
    assert abs(ant.lat_hi - np.radians(-80)) <= lat_err
    assert abs(ant.lat_lo - -np.pi / 2) <= lat_err
    assert ant.lng.is_full()

    # inverted arctic: the highest latitude of each edge is attained at
    # its midpoint (the RectBounder interior-extremum path)
    inv = rg.Loop(LOOPS["arctic_80"].loops[0].vertices[::-1].copy())
    v = inv.vertices
    mid = 0.5 * (v[0] + v[1])
    mid_lat = float(ci.xyz_to_latlng(mid[0], mid[1], mid[2])[0])
    got = inv.get_rect_bound().lat_hi
    assert abs(got - mid_lat) < 1e-9

    sh = LOOPS["south_hemi"].loops[0].get_rect_bound()
    assert sh.lng.is_full()
    assert abs(sh.lat_lo - -np.pi / 2) <= lat_err and abs(sh.lat_hi - 0.0) <= lat_err


def test_rect_bounder_soundness_random():
    """Property: densely sampled edge points always fall inside the
    chain's RectBounder bound."""
    rng = np.random.RandomState(17)
    for _ in range(25):
        n = rng.randint(3, 8)
        lat = rng.uniform(-70, 70, n)
        lng = rng.uniform(-180, 180, n)
        verts = np.stack(
            [np.ravel(ci.latlng_to_xyz(np.radians(a), np.radians(o)))
             for a, o in zip(lat, lng)]
        )
        bound = rg.rect_bound_of_chain(verts, closed=True)
        # ulp-scale slack: sampled points are re-normalized, which can
        # move their computed lat/lng by 1 ulp vs the vertices' own
        # coordinates (the reference's guarantee covers the canonical
        # coordinates of contained points)
        slack = 1e-13
        chain = np.concatenate([verts, verts[:1]])
        for i in range(len(chain) - 1):
            for t in np.linspace(0.0, 1.0, 33):
                p = (1 - t) * chain[i] + t * chain[i + 1]
                p = p / np.linalg.norm(p)
                pla, plo = (float(x) for x in ci.xyz_to_latlng(p[0], p[1], p[2]))
                assert (
                    bound.lat_lo - slack <= pla <= bound.lat_hi + slack
                )
                assert (
                    bound.lng.contains_point(plo)
                    or bound.lng.expanded(slack).contains_point(plo)
                )


def test_curvature_gauss_bonnet_and_reversal():
    """S2LoopTest.testAreaConsistentWithCurvature semantics: for every
    fixture loop, area == 2*pi - curvature within the turning-angle error
    budget, and reversing the vertices negates the curvature."""
    from s2_geometry_library_java_spark.kernel import sphere

    for name, poly in LOOPS.items():
        v = poly.loops[0].vertices
        curv = sphere.loop_curvature(v)
        area = float(sphere.signed_loop_area(v))
        tol = 1e-11 * max(1.0, len(v))
        assert abs(area - (2 * np.pi - curv)) < max(tol, 1e-9), (
            name, area, 2 * np.pi - curv)
        rcurv = sphere.loop_curvature(v[::-1].copy())
        assert abs(rcurv + curv) < 1e-11, name
    # degenerate and full conventions
    assert sphere.loop_curvature(np.zeros((0, 3))) == -2 * np.pi
    assert sphere.loop_curvature(LOOPS["loop_a"].loops[0].vertices[:1]) == 2 * np.pi


def test_polyline_length():
    from s2_geometry_library_java_spark.kernel import sphere

    # quarter of the equator
    line = rg.Polyline.from_latlng_degrees([(0.0, 0.0), (0.0, 45.0), (0.0, 90.0)])
    assert abs(sphere.polyline_length(line.vertices) - np.pi / 2) < 1e-12
    assert sphere.polyline_length(line.vertices[:1]) == 0.0


def test_loop_normalization_surface():
    """S2Loop.isNormalized / normalize: CCW small loops are normalized;
    CW loops invert to their CCW form; inverting twice round-trips."""
    small = LOOPS["arctic_80"].loops[0]
    assert small.is_normalized()
    cw = LOOPS["small_ne_cw"].loops[0]
    assert not cw.is_normalized()
    norm = cw.normalized()
    assert norm.is_normalized()
    assert np.array_equal(norm.vertices, cw.vertices[::-1])
    assert norm.normalized() is norm
    # hemispheres sit at the boundary: turning angle ~ 0, counts as
    # normalized either way round within the error bound
    hemi = LOOPS["north_hemi"].loops[0]
    assert abs(hemi.get_turning_angle()) < 1e-12
    assert hemi.is_normalized()
