"""Coverer property checks mirroring S2RegionCovererTest.checkCovering
(S2RegionCovererTest.java:53-123): level bounds, levelMod residues,
covering ⊇ region, interior ⊆ region, ≤ maxCells (post-merge), determinism.
"""

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import coverer as cv
from s2_geometry_library_java_spark.kernel import region as rg


def _covering_covers(region, ids, n=20000, seed=0):
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(3, n))
    v /= np.sqrt((v * v).sum(axis=0))
    x, y, z = v
    inside = region.contains_points(x, y, z)
    if not inside.any():
        return True
    leaf = ci.xyz_to_cell_id(x[inside], y[inside], z[inside])
    ids = np.asarray(ids, dtype=np.uint64)
    rmin = ci.range_min(ids)
    rmax = ci.range_max(ids)
    covered = ((leaf[:, None] >= rmin[None, :]) & (leaf[:, None] <= rmax[None, :])).any(axis=1)
    return bool(covered.all())


REGIONS = [
    rg.Cap.from_latlng_deg(33.0, -112.0, 2.0),
    rg.Cap.from_latlng_deg(-80.0, 10.0, 5.0),  # near-pole cap
    rg.Cap.from_latlng_deg(0.1, 179.9, 3.0),  # dateline cap
    rg.Polygon.from_text("5:15, 5:25, 15:25, 15:15"),
    rg.Polygon.from_text("-35:135, -35:145, -25:145, -25:135"),
    rg.LatLngRect.from_degrees(10, 20, 170, -175),
]


def test_covering_properties():
    for max_cells in (4, 8, 20):
        cov = cv.RegionCoverer(max_cells=max_cells)
        for region in REGIONS:
            ids = cov.get_covering(region)
            assert 0 < len(ids)
            u = np.array(ids, dtype=np.uint64)
            assert bool(np.all(ci.is_valid(u)))
            # normalized: sorted & disjoint
            norm = cv.union_normalize(ids)
            rmin = ci.range_min(np.array(norm, dtype=np.uint64))
            rmax = ci.range_max(np.array(norm, dtype=np.uint64))
            assert bool(np.all(rmin[1:] > rmax[:-1]))
            assert _covering_covers(region, norm)


def test_max_cells_respected():
    # default options: covering size <= max(max_cells, 6-ish merge floor)
    for region in REGIONS:
        cov = cv.RegionCoverer(max_cells=8)
        assert len(cov.get_covering(region)) <= 8


def test_level_bounds_and_mod():
    cov = cv.RegionCoverer(min_level=4, max_level=10, level_mod=2, max_cells=8)
    cap = rg.Cap.from_latlng_deg(33.0, -112.0, 2.0)
    ids = cov.get_covering(cap)
    lv = ci.level(np.array(ids, dtype=np.uint64))
    assert bool(np.all(lv >= 4)) and bool(np.all(lv <= 10))
    assert bool(np.all((lv - 4) % 2 == 0))
    assert _covering_covers(cap, cv.union_normalize(ids))


def test_interior_covering_subset():
    cov = cv.RegionCoverer(max_cells=12)
    for region in REGIONS[:4]:
        ids = cov.get_interior_covering(region)
        if not ids:
            continue
        u = np.array(ids, dtype=np.uint64)
        x, y, z = ci.cell_id_to_xyz(u)
        assert bool(np.all(region.contains_points(x, y, z)))


def test_determinism():
    cov = cv.RegionCoverer(max_cells=8)
    for region in REGIONS:
        a = cov.get_covering(region)
        b = cov.get_covering(region)
        assert a == b


def test_normalize_collapses_siblings():
    # the 4 children of a cell normalize to the parent (S2CellUnion.java:905)
    parent = int(ci.from_face_pos_level(2, 0x1234500, 20))
    children = [int(ci.child(np.uint64(parent), k)) for k in range(4)]
    assert cv.union_normalize(children) == [parent]
    # denormalize splits back at min_level
    lvl = int(ci.level(np.uint64(parent)))
    out = cv.union_denormalize([parent], lvl + 1, 1)
    assert sorted(out) == sorted(children)


def test_union_normalize_drops_contained():
    parent = int(ci.from_face_pos_level(1, 0x42, 8))
    child = int(ci.child_begin(np.uint64(parent), 12))
    assert cv.union_normalize([parent, child]) == [parent]


def test_maximum_tile_identity():
    # S2CellIdTest.java:130-161: maximumTile(id, id) == id
    rng = np.random.RandomState(123455)
    for _ in range(200):
        lat, lng = rng.uniform(-80, 80), rng.uniform(-180, 180)
        cid = int(ci.parent(ci.latlng_degrees_to_cell_id(lat, lng), rng.randint(5, 25)))
        assert cv.maximum_tile(cid, cid) == cid


def test_cells_from_leaf_range():
    # initFromMinMax of one cell's own range reproduces that cell
    rng = np.random.RandomState(7)
    for _ in range(100):
        lat, lng = rng.uniform(-80, 80), rng.uniform(-180, 180)
        cid = ci.parent(ci.latlng_degrees_to_cell_id(lat, lng), rng.randint(3, 28))
        lo = int(ci.range_min(cid))
        hi = int(ci.range_max(cid))
        assert cv.cells_from_leaf_range(lo, hi + 1) == [int(cid)]
    # a range spanning two sibling cells yields exactly those cells
    a = ci.from_face_pos_level(2, 0x40, 20)
    b = ci.next_cell(a)
    got = cv.cells_from_leaf_range(int(ci.range_min(a)), int(ci.range_max(b)) + 1)
    assert got == [int(a), int(b)]
    # full union property: ranges of output tile the input exactly
    lo = int(ci.range_min(ci.from_face_pos_level(1, 0x1234567, 25)))
    hi = int(ci.range_max(ci.from_face_pos_level(1, 0x1237567, 25)))
    cells = cv.cells_from_leaf_range(lo, hi + 1)
    spans = [(int(ci.range_min(np.uint64(c))), int(ci.range_max(np.uint64(c)))) for c in cells]
    assert spans[0][0] == lo and spans[-1][1] == hi
    for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
        assert b0 == a1 + 2  # leaf ids are odd and stride 2


def test_union_expand_covers_buffer():
    cap = rg.Cap.from_latlng_deg(10.0, 10.0, 1.0)
    cov8 = cv.RegionCoverer(max_cells=16)
    ids = cov8.get_covering(cap)
    import numpy as _np

    expanded = cv.union_expand_radius(ids, _np.radians(0.5))
    # every point within 1.0+0.4 deg of center must be covered
    rng = np.random.RandomState(3)
    lat = np.radians(10 + rng.uniform(-1.4, 1.4, 5000))
    lng = np.radians(10 + rng.uniform(-1.4, 1.4, 5000))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    from s2_geometry_library_java_spark.kernel import sphere as sp

    d = sp.angle_between(x, y, z, *ci.latlng_to_xyz(np.radians(10.0), np.radians(10.0)))
    want = d <= np.radians(1.0 + 0.4)
    leaf = ci.latlng_to_cell_id(lat, lng)
    u = np.array(expanded, dtype=np.uint64)
    covered = (
        (leaf[:, None] >= ci.range_min(u)[None, :])
        & (leaf[:, None] <= ci.range_max(u)[None, :])
    ).any(axis=1)
    assert bool(covered[want].all())


def test_polyline_covering_golden_tokens():
    """S2RegionCovererTest.testPolylineCovering (:144-166): literal token
    list, default coverer. The polyline lies EXACTLY on cell boundaries, so
    this exercises the full exact-predicate + SoS cascade."""
    line = rg.Polyline.from_latlng_degrees([(0.0, 0.0), (0.0, 1.0)])
    toks = cv.RegionCoverer(max_cells=8).get_covering_tokens(line)
    assert toks == [
        "0555555555555555", "0fffffffffffffff", "10001", "10007",
        "10009", "1000a4", "1aaa09e01fffdf7f", "1aaaaaaaaaaaaaab",
    ]


def test_polyline_covering_java_cc_consistency():
    """S2RegionCovererTest.testPolylineCoveringJavaCcConsistency (:168-229):
    the 42-token cross-implementation golden list (Java == C++ == this)."""
    line = rg.Polyline.from_latlng_degrees(
        [(-33.8663457, 151.1960891), (-33.866094000000004, 151.19517439999998)]
    )
    coverer = cv.RegionCoverer(min_level=0, max_level=22, max_cells=2**31 - 1)
    toks = coverer.get_covering_tokens(line)
    assert toks == [
        "6b12ae36313d", "6b12ae36313f", "6b12ae363141", "6b12ae363143",
        "6b12ae363145", "6b12ae363159", "6b12ae36315b", "6b12ae363343",
        "6b12ae363345", "6b12ae36334d", "6b12ae36334f", "6b12ae363369",
        "6b12ae36336f", "6b12ae363371", "6b12ae363377", "6b12ae363391",
        "6b12ae363393", "6b12ae36339b", "6b12ae36339d", "6b12ae3633e3",
        "6b12ae3633e5", "6b12ae3633ed", "6b12ae3633ef", "6b12ae37cc11",
        "6b12ae37cc13", "6b12ae37cc1b", "6b12ae37cc1d", "6b12ae37cc63",
        "6b12ae37cc65", "6b12ae37cc6d", "6b12ae37cc6f", "6b12ae37cc89",
        "6b12ae37cc8f", "6b12ae37cc91", "6b12ae37cc97", "6b12ae37ccb1",
        "6b12ae37ccb3", "6b12ae37ccbb", "6b12ae37ccbd", "6b12ae37cea5",
        "6b12ae37cea7", "6b12ae37cebb",
    ]
