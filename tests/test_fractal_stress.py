"""Fractal stress tier (S2FractalBuilder / TestDataGenerator.java:445):
adversarial Koch-snowflake loops exercising D1 (coverer soundness), E2
(shape index completeness), and G1 (boolean op vs pointwise membership)."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import coverer as cov
from s2_geometry_library_java_spark.kernel import fractal as fr
from s2_geometry_library_java_spark.kernel import region as rg
from s2_geometry_library_java_spark.kernel.cell import Cell


def _fractal_poly(seed, center_lat, center_lng, radius_rad, max_level=4,
                  dimension=None, min_level=-1):
    b = fr.FractalBuilder(np.random.default_rng(seed))
    b.set_max_level(max_level)
    if min_level >= 0:
        b.set_min_level(min_level)
    if dimension is not None:
        b.set_fractal_dimension(dimension)
    center = np.ravel(
        ci.latlng_to_xyz(np.radians(center_lat), np.radians(center_lng))
    )
    v = b.make_vertices(fr.frame_at(center), radius_rad)
    return rg.Polygon([rg.Loop(v)]), b, center


def test_fractal_radius_invariants():
    """Every vertex distance from the center lies within the builder's
    [min_radius_factor, max_radius_factor] * nominal radius bounds."""
    for seed, dim in ((1, None), (2, 1.02), (3, 1.5), (4, 2.0)):
        poly, b, center = _fractal_poly(seed, 20.0, 30.0, 0.05, 5, dim)
        v = poly.loops[0].vertices
        ang = np.arccos(np.clip(v @ center, -1, 1))
        assert (ang <= 0.05 * b.max_radius_factor() * (1 + 1e-9)).all()
        assert (ang >= 0.05 * b.min_radius_factor() * (1 - 1e-9)).all()
        # edge count = 3 * 4^max_level in single-level mode
        if dim is None:
            assert len(v) == 3 * 4 ** 5


def test_fractal_multi_level_edge_counts():
    """Multi-level mode: vertex count lies strictly between the min- and
    max-level single-level counts."""
    poly, _, _ = _fractal_poly(7, 0.0, 0.0, 0.03, max_level=5, min_level=2)
    n = len(poly.loops[0].vertices)
    assert 3 * 4 ** 2 < n < 3 * 4 ** 5


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_fractal_covering_sound(seed):
    """D1 over fractal loops: every sampled interior point is covered;
    every interior-covering cell is fully inside."""
    poly, b, center = _fractal_poly(seed, 15.0 + seed, 40.0, 0.04, 4)
    reg = rg.ShapeIndexRegion(poly)
    ids = cov.RegionCoverer(max_cells=32).get_covering(reg)
    u = np.array(ids, dtype=np.uint64)
    lo, hi = ci.range_min(u), ci.range_max(u)
    rng = np.random.default_rng(seed)
    # sample points: mixture of deep-interior (inside min radius) and
    # boundary-band points filtered by exact membership
    n = 600
    ang = rng.uniform(0, 2 * np.pi, n)
    rad = rng.uniform(0, 0.04 * b.max_radius_factor(), n)
    frame = fr.frame_at(center)
    local = np.stack(
        [np.sin(rad) * np.cos(ang), np.sin(rad) * np.sin(ang), np.cos(rad)],
        axis=1,
    )
    pts = local @ frame.T
    inside = poly.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
    assert inside.any() and (~inside).any()
    leaf = ci.xyz_to_cell_id(pts[inside, 0], pts[inside, 1], pts[inside, 2])
    covered = (
        (leaf[:, None] >= lo[None, :].view(np.uint64))
        & (leaf[:, None] <= hi[None, :].view(np.uint64))
    ).any(axis=1)
    assert covered.all(), "covering misses interior points"

    interior = cov.RegionCoverer(max_cells=32).get_interior_covering(reg)
    for cid in interior[:16]:
        cell = Cell(int(cid))
        v = cell.vertices
        assert poly.contains_points(v[:, 0], v[:, 1], v[:, 2]).all()


@pytest.mark.parametrize("seed", [21, 22])
def test_fractal_shape_index_region_sound(seed):
    """E2/C7 over fractal loops: contains_cell never over-claims and
    may_intersect_cell never under-claims vs exact polygon verdicts."""
    poly, b, center = _fractal_poly(seed, -10.0, 120.0 + seed, 0.05, 4)
    reg = rg.ShapeIndexRegion(poly)
    rng = np.random.default_rng(seed)
    clat, clng = -10.0, 120.0 + seed
    lat = rng.uniform(clat - 5, clat + 5, 150)
    lng = rng.uniform(clng - 5, clng + 5, 150)
    lvls = rng.integers(6, 12, 150)
    over = under = 0
    for k in range(150):
        cid = int(
            ci.parent(ci.latlng_degrees_to_cell_id(lat[k], lng[k]), int(lvls[k]))
        )
        cell = Cell(cid)
        v = cell.vertices
        corners_in = poly.contains_points(v[:, 0], v[:, 1], v[:, 2])
        if reg.contains_cell(cell):
            # all corners must be inside (necessary condition)
            assert corners_in.all(), "contains_cell over-claims"
            over += 1
        if corners_in.any():
            assert reg.may_intersect_cell(cell), "may_intersect under-claims"
            under += 1
    assert under > 0  # the sample actually exercised the region


@pytest.mark.parametrize("op", ["intersection", "union", "difference",
                                "symmetric_difference"])
def test_fractal_boolean_membership(op):
    """G1 over two overlapping fractal loops: the constructed result's
    membership equals the pointwise combination, including through the
    snap path when vertices nearly coincide."""
    from s2_geometry_library_java_spark.kernel import booleanop as bo

    a, _, ca = _fractal_poly(31, 10.0, 50.0, 0.05, 3)
    bpoly, _, cb = _fractal_poly(32, 10.8, 50.8, 0.05, 3)
    out = bo.boolean_op(a, bpoly, op)
    rng = np.random.default_rng(33)
    lat = np.radians(rng.uniform(5, 16, 3000))
    lng = np.radians(rng.uniform(45, 56, 3000))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    got = out.contains_points(x, y, z)
    ia = a.contains_points(x, y, z)
    ib = bpoly.contains_points(x, y, z)
    combine = {
        "intersection": ia & ib,
        "union": ia | ib,
        "difference": ia & ~ib,
        "symmetric_difference": ia ^ ib,
    }[op]
    assert (got == combine).all(), int((got != combine).sum())
