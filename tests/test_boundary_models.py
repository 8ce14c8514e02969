"""Boundary models (open / semi_open / closed) for polygon membership —
S2BooleanOperation.java:268-273 polygon model semantics."""

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import region as rg


def _pt(lat, lng):
    x, y, z = ci.latlng_to_xyz(np.radians(float(lat)), np.radians(float(lng)))
    return [float(x), float(y), float(z)]


# quad with an equator bottom edge and meridian side edges, so boundary
# points are exactly representable from lat/lng literals
POLY = rg.Polygon(
    [rg.Loop.from_latlng_degrees([(0.0, 10.0), (0.0, 40.0), (25.0, 40.0), (25.0, 10.0)])]
)

BOUNDARY = np.array(
    [
        _pt(0.0, 10.0), _pt(0.0, 40.0), _pt(25.0, 40.0), _pt(25.0, 10.0),  # vertices
        _pt(0.0, 25.0),          # equator edge midpoint
        _pt(12.5, 10.0), _pt(12.5, 40.0),  # meridian edge points
    ]
)
INSIDE = np.array([_pt(10.0, 25.0), _pt(5.0, 12.0)])
OUTSIDE = np.array([_pt(-5.0, 25.0), _pt(10.0, 50.0), _pt(40.0, 25.0)])


def _c(poly, pts, model):
    return poly.contains_points(pts[:, 0], pts[:, 1], pts[:, 2], model=model)


def test_on_boundary_detection():
    assert rg.Polygon(POLY.loops).on_boundary(
        BOUNDARY[:, 0], BOUNDARY[:, 1], BOUNDARY[:, 2]
    ).all()
    assert not POLY.on_boundary(INSIDE[:, 0], INSIDE[:, 1], INSIDE[:, 2]).any()
    assert not POLY.on_boundary(OUTSIDE[:, 0], OUTSIDE[:, 1], OUTSIDE[:, 2]).any()


def test_models_ordering():
    """open <= semi_open <= closed, and they differ only on the boundary."""
    for pts in (BOUNDARY, INSIDE, OUTSIDE):
        o = _c(POLY, pts, "open")
        s = _c(POLY, pts, "semi_open")
        c = _c(POLY, pts, "closed")
        assert (~o | s).all() and (~s | c).all()
    assert not _c(POLY, BOUNDARY, "open").any()
    assert _c(POLY, BOUNDARY, "closed").all()
    assert _c(POLY, INSIDE, "open").all()
    assert not _c(POLY, OUTSIDE, "closed").any()


def test_semi_open_partitions_edge_points():
    """Semi-open: every boundary EDGE point belongs to exactly one of the
    polygon and its reversed complement (the defining property)."""
    comp = rg.Polygon([rg.Loop(POLY.loops[0].vertices[::-1])])
    edge_pts = BOUNDARY[4:]  # edge midpoints (vertex tiebreaks are wedge-
    # dependent and tested via the crossing kernel instead)
    a = _c(POLY, edge_pts, "semi_open")
    b = _c(comp, edge_pts, "semi_open")
    assert (a ^ b).all()
