"""E2 shape-index build invariants (S2ShapeIndexTest-style) and the
executor-side covering / indexed-PIP DataFrame paths."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import cellid as s2
from s2_geometry_library_java_spark.kernel import region as rg
from s2_geometry_library_java_spark.kernel import shapeindex as si


def _circle_loop(clat, clng, radius_deg, n=64):
    """n-gon approximating a circle — enough edges to force subdivision."""
    center = np.array(s2.latlng_to_xyz(np.radians(clat), np.radians(clng))).ravel()
    o1 = np.cross(center, [0.0, 0.0, 1.0])
    o1 /= np.linalg.norm(o1)
    o2 = np.cross(center, o1)
    r = np.radians(radius_deg)
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = (
        np.cos(r) * center[None, :]
        + np.sin(r) * (np.cos(th)[:, None] * o1[None, :] + np.sin(th)[:, None] * o2[None, :])
    )
    return pts / np.linalg.norm(pts, axis=1, keepdims=True)


def _biased(u):
    return (np.atleast_1d(np.asarray(u, dtype=np.uint64)) ^ np.uint64(1 << 63)).view(
        np.int64
    )[0]


def test_index_invariants():
    loop = _circle_loop(40.0, 10.0, 5.0, n=96)
    rows = si.build_shape_index([loop], max_edges_per_cell=10, max_level=16)
    assert rows, "index must not be empty"
    # 1. every edge appears in at least one cell
    seen = set()
    for _, edge_ids in rows:
        seen.update(int(e) for e in edge_ids)
    assert seen == set(range(96))
    # 2. emitted cells are disjoint (biased ranges non-overlapping)
    ranges = sorted(
        (
            _biased(s2.range_min(np.uint64(cid))),
            _biased(s2.range_max(np.uint64(cid))),
        )
        for cid, _ in rows
    )
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    # 3. cells over the edge budget occur only at max_level
    for cid, edge_ids in rows:
        lvl = int(s2.level(np.uint64(cid)))
        assert len(edge_ids) <= 10 or lvl == 16
    # 4. output is sorted by biased cell id
    biased = [_biased(s2.range_min(np.uint64(cid))) for cid, _ in rows]
    assert biased == sorted(biased)


def test_index_edge_cell_soundness():
    """Each edge's midpoint leaf cell must be covered by an index cell that
    lists the edge (the index is a superset of true intersections)."""
    loop = _circle_loop(-25.0, 133.0, 8.0, n=48)
    rows = si.build_shape_index([loop], max_edges_per_cell=6, max_level=14)
    va = loop
    vb = np.roll(loop, -1, axis=0)
    mid = va + vb
    mid /= np.linalg.norm(mid, axis=1, keepdims=True)
    leafs = s2.xyz_to_cell_id(mid[:, 0], mid[:, 1], mid[:, 2])
    for e in range(len(loop)):
        lb = _biased(leafs[e])
        hit = any(
            _biased(s2.range_min(np.uint64(cid))) <= lb <= _biased(s2.range_max(np.uint64(cid)))
            and e in set(int(x) for x in edge_ids)
            for cid, edge_ids in rows
        )
        assert hit, f"edge {e} missing from its midpoint cell"


def test_coverings_df_matches_driver(spark):
    """Executor-side coverings == the driver-side coverer, bit for bit."""
    from s2_geometry_library_java_spark.kernel import coverer as cov
    from s2_geometry_library_java_spark.operators import shapes as shape_ops
    from s2_geometry_library_java_spark.queries import PIP_QUADS, _quad_text, pip_polygons

    shapes = spark.createDataFrame(
        [(pid, _quad_text(*spec)) for pid, spec in PIP_QUADS.items()],
        "shape_id string, text string",
    )
    got = {
        (r["shape_id"], r["cell_id"])
        for r in shape_ops.coverings_df(shapes).collect()
    }
    coverer = cov.RegionCoverer(max_cells=8)
    want = set()
    for pid, poly in pip_polygons().items():
        for cid in coverer.get_covering(poly):
            want.add((pid, int(s2.to_signed(np.uint64(cid))[0])))
    assert got == want


def test_pip_join_indexed_matches_kernel(spark):
    """Indexed DF path == direct numpy PIP over random polygons/points."""
    from s2_geometry_library_java_spark.operators import shapes as shape_ops

    rng = np.random.default_rng(11)
    polys = {}
    texts = []
    for k in range(25):
        clat = float(rng.uniform(-60, 60))
        clng = float(rng.uniform(-170, 170))
        h = float(rng.uniform(2, 6))
        pts = [
            (clat - h, clng - h),
            (clat - h, clng + h),
            (clat + h, clng + h),
            (clat + h, clng - h),
        ]
        text = ", ".join(f"{la!r}:{ln!r}" for la, ln in pts)
        texts.append((f"s{k}", text))
        polys[f"s{k}"] = rg.Polygon.from_text(text)
    shapes = spark.createDataFrame(texts, "shape_id string, text string")
    n = 500
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    lat, lng = s2.xyz_to_latlng(v[:, 0], v[:, 1], v[:, 2])
    pts_df = spark.createDataFrame(
        [(i, float(np.degrees(lat[i])), float(np.degrees(lng[i]))) for i in range(n)],
        "id long, lat double, lng double",
    )
    got = {
        (r["point_id"], r["polygon_id"])
        for r in shape_ops.pip_join_indexed(spark, pts_df, shapes).collect()
    }
    want = set()
    for pid, poly in polys.items():
        inside = poly.contains_points(v[:, 0], v[:, 1], v[:, 2])
        want.update((int(i), pid) for i in np.nonzero(inside)[0])
    assert got == want


def test_shape_index_df_roundtrip(spark):
    from s2_geometry_library_java_spark.operators import shapes as shape_ops
    from s2_geometry_library_java_spark.queries import PIP_QUADS, _quad_text

    shapes = spark.createDataFrame(
        [(pid, _quad_text(*spec)) for pid, spec in PIP_QUADS.items()],
        "shape_id string, text string",
    )
    rows = shape_ops.shape_index_df(shapes).collect()
    by_shape = {}
    for r in rows:
        by_shape.setdefault(r["shape_id"], set()).add(r["edge_id"])
    # every quad contributes all 4 edges
    assert set(by_shape) == set(PIP_QUADS)
    for pid, eids in by_shape.items():
        assert eids == {0, 1, 2, 3}
    # endpoints are unit vectors
    for r in rows[:20]:
        assert abs(r["ax"] ** 2 + r["ay"] ** 2 + r["az"] ** 2 - 1.0) < 1e-12
