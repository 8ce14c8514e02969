"""Hypothesis property tests for the cellid codec — the invariants the
reference's randomized tests (S2CellIdTest) rely on, over generated rather
than fixed seeds."""

import numpy as np
from hypothesis import given, settings, strategies as st

from s2_geometry_library_java_spark.kernel import cellid as c

finite_lat = st.floats(min_value=-90.0, max_value=90.0, allow_nan=False)
finite_lng = st.floats(min_value=-180.0, max_value=180.0, allow_nan=False)
levels = st.integers(min_value=0, max_value=30)


@settings(max_examples=300, deadline=None)
@given(finite_lat, finite_lng)
def test_leaf_roundtrip_within_leaf_diagonal(lat, lng):
    """decode(encode(p)) stays within the level-30 cell diagonal of p
    (S2CellIdTest roundtrip bound)."""
    ids = c.latlng_degrees_to_cell_id(np.array([lat]), np.array([lng]))
    x1, y1, z1 = c.latlng_to_xyz(np.radians(lat), np.radians(lng))
    x2, y2, z2 = c.cell_id_to_xyz(ids)
    chord2 = (x1 - x2) ** 2 + (y1 - y2) ** 2 + (z1 - z2) ** 2
    # level-30 max diagonal ~ 1.4e-9 rad; chord2 bound with margin
    assert float(chord2[0]) < (4e-9) ** 2


@settings(max_examples=300, deadline=None)
@given(finite_lat, finite_lng, levels)
def test_parent_contains_and_token_roundtrip(lat, lng, level):
    ids = c.latlng_degrees_to_cell_id(np.array([lat]), np.array([lng]))
    p = c.parent(ids, level)
    # containment: range_min <= id <= range_max (biased order)
    lo, hi = c.range_min(p), c.range_max(p)
    bi, blo, bhi = c.to_biased(ids), c.to_biased(lo), c.to_biased(hi)
    assert blo[0] <= bi[0] <= bhi[0]
    assert int(c.level(p)[0]) == level
    # token roundtrip
    tok = c.to_token(p)
    back = c.from_token(tok)
    assert back[0] == p[0]


@settings(max_examples=200, deadline=None)
@given(finite_lat, finite_lng, st.integers(min_value=1, max_value=30))
def test_child_position_recovers_path(lat, lng, level):
    """parent(child) == identity along the Hilbert path."""
    ids = c.latlng_degrees_to_cell_id(np.array([lat]), np.array([lng]))
    p = c.parent(ids, level)
    pp = c.parent(ids, level - 1)
    assert c.parent(p, level - 1)[0] == pp[0]
