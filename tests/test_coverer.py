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
