"""Batched cells x points distance kernels must be bit-equal to the
scalar Cell methods (kernel/cell.py cells_distance_chord2 /
cells_max_distance_chord2 vs Cell.distance_chord2 / max_distance_chord2).

The aligned forms power the covering-seed pruning pandas_udf
(operators/closestedge.py), so any last-ulp drift would silently change
prune decisions — we pin exact equality, not closeness.
"""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel.cell import (
    Cell,
    cells_distance_chord2,
    cells_geometry,
    cells_max_distance_chord2,
)


def _random_cells(rng, n):
    """Cell ids across all faces and levels 0..30, incl. face cells."""
    lat = rng.uniform(-80, 80, n)
    lng = rng.uniform(-180, 180, n)
    leaf = ci.latlng_to_cell_id(np.radians(lat), np.radians(lng))
    levels = rng.integers(0, 31, n)
    out = np.empty(n, dtype=np.uint64)
    for k in range(n):
        out[k] = ci.parent(np.uint64(leaf[k]), int(levels[k]))
    # force a few face cells into the mix
    out[: min(6, n)] = [ci.from_face(f) for f in range(min(6, n))]
    return out


def _random_points(rng, n):
    p = rng.normal(size=(n, 3))
    return p / np.sqrt((p * p).sum(axis=1, keepdims=True))


@pytest.fixture(scope="module")
def fixture():
    rng = np.random.default_rng(20260817)
    cids = _random_cells(rng, 400)
    pts = _random_points(rng, 400)
    # duplicate some ids so the unique/gather path is exercised
    cids[200:] = cids[:200]
    # make a slice of points lie INSIDE their cell (distance exactly 0)
    for k in range(0, 60):
        cell = Cell(int(cids[k]))
        ctr = cell.vertices.mean(axis=0)
        pts[k] = ctr / np.sqrt(ctr @ ctr)
    # and a slice near-antipodal to exercise the max-distance far branch
    pts[60:120] = -pts[60:120]
    return cids, pts


def test_geometry_matches_scalar(fixture):
    cids, _ = fixture
    uniq = np.unique(cids)
    face, uvb, verts = cells_geometry(uniq)
    for k in range(0, len(uniq), 17):
        cell = Cell(int(uniq[k]))
        assert face[k] == cell.face
        assert tuple(uvb[k]) == cell.uv_bounds
        assert np.array_equal(verts[k], cell.vertices)


def test_min_distance_bit_equal(fixture):
    cids, pts = fixture
    batched = cells_distance_chord2(cids, pts)
    for k in range(len(cids)):
        scalar = Cell(int(cids[k])).distance_chord2(pts[k][None])[0]
        assert batched[k] == scalar, (k, int(cids[k]))
    assert (batched[:60] == 0.0).all()  # the inside slice


def test_max_distance_bit_equal(fixture):
    cids, pts = fixture
    batched = cells_max_distance_chord2(cids, pts)
    hit_far = False
    for k in range(len(cids)):
        cell = Cell(int(cids[k]))
        scalar = cell.max_distance_chord2(pts[k][None])[0]
        assert batched[k] == scalar, (k, int(cids[k]))
        hit_far = hit_far or scalar > 2.0
    assert hit_far  # the antipode branch was actually exercised
