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
