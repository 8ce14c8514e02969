"""G7 validation queries."""

import numpy as np

from s2_geometry_library_java_spark.kernel import region as rg
from s2_geometry_library_java_spark.kernel import validation as val


def _v(pts):
    return rg.Loop.from_latlng_degrees(pts).vertices


def test_valid_loop():
    assert val.find_loop_validation_error(
        _v([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])
    ) is None


def test_too_few_and_non_unit():
    from s2_geometry_library_java_spark.kernel import cellid as ci

    two = np.stack(
        ci.latlng_to_xyz(np.radians([0.0, 1.0]), np.radians([0.0, 1.0])), axis=1
    )
    assert "minimum 3" in val.find_loop_validation_error(two)
    bad = _v([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0)]).copy()
    bad[1] *= 1.001
    assert "unit length" in val.find_loop_validation_error(bad)


def test_duplicate_and_degenerate():
    v = _v([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0)])
    dup_adjacent = np.vstack([v, v[-1]])
    assert "degenerate" in val.find_loop_validation_error(dup_adjacent)
    dup_far = np.vstack([v, [v[0]], [v[1]]])  # revisits vertex 0 later
    assert "duplicate" in val.find_loop_validation_error(dup_far)


def test_self_intersection():
    # bowtie: edges cross
    bowtie = _v([(0.0, 0.0), (10.0, 10.0), (0.0, 10.0), (10.0, 0.0)])
    assert "cross" in val.find_loop_validation_error(bowtie)


def test_polygon_cross_loop():
    a = _v([(0.0, 0.0), (0.0, 10.0), (10.0, 10.0), (10.0, 0.0)])
    b = _v([(5.0, 5.0), (5.0, 15.0), (15.0, 15.0), (15.0, 5.0)])  # crosses a
    assert "crosses" in val.find_polygon_validation_error([a, b])
    hole = _v([(3.0, 3.0), (3.0, 7.0), (7.0, 7.0), (7.0, 3.0)])  # nested: fine
    assert val.find_polygon_validation_error([a, hole]) is None


def test_valid_query_tiers():
    """S2ValidQuery tier stack (S2ValidationQueries.java:325): duplicate
    edges, shared-vertex wedge crossings, and chain orientation."""
    lat0, lng0 = 5.0, 20.0

    def quad(la, lo, h=6.0):
        return _v([(la, lo), (la, lo + h), (la + h, lo + h), (la + h, lo)])

    assert val.find_valid_query_error([quad(lat0, lng0)]) is None
    # reverse-duplicate edge across loops (two quads sharing a full edge)
    err = val.find_valid_query_error([quad(lat0, lng0), quad(lat0, lng0 + 6)])
    assert err[0] == "duplicate_edge"
    # shared-vertex wedge crossing: chain passes through a lens's pinch
    a, b = (lat0, lng0), (lat0 + 10, lng0)
    l1 = _v([a, (lat0 + 5, lng0 + 3), b, (lat0 + 5, lng0 + 8)])
    l2 = _v([a, (lat0 + 5, lng0 + 5), b, (lat0 + 5, lng0 - 8)])
    assert val.find_valid_query_error([l1, l2])[0] == "vertex_crossing"
    # CCW hole inside CCW shell -> orientation; CW hole -> valid
    shell = quad(lat0, lng0, 10.0)
    ccw_hole = _v([(lat0 + 2, lng0 + 2), (lat0 + 2, lng0 + 8),
                   (lat0 + 8, lng0 + 8), (lat0 + 8, lng0 + 2)])
    cw_hole = ccw_hole[::-1].copy()
    assert val.find_valid_query_error([shell, ccw_hole])[0] == "orientation"
    assert val.find_valid_query_error([shell, cw_hole]) is None
    # vertex TOUCH without interleaving stays valid
    touch = _v([(lat0, lng0), (lat0 - 6, lng0 - 6), (lat0 - 6, lng0)])
    assert val.find_valid_query_error([quad(lat0, lng0), touch]) is None
