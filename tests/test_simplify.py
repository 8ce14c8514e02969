"""G6 subsampleVertices golden fixtures (S2PolylineTest.java:476-526)."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import region as rg
from s2_geometry_library_java_spark.kernel import simplify


def _verts(coords: str) -> np.ndarray:
    if not coords.strip():
        return np.zeros((0, 3))
    pts = []
    for tok in coords.split(","):
        la, ln = tok.strip().split(":")
        pts.append((float(la), float(ln)))
    return rg.Polyline.from_latlng_degrees(pts).vertices


CASES = [
    ("", 1.0, []),
    ("0:1", 1.0, [0]),
    ("10:10, 11:11", 5.0, [0, 1]),
    ("-1:0, 0:0, 1:0", 1e-15, [0, 2]),
    ("-1:0, 0:0, 1:1", 0.0, [0, 1, 2]),
    ("-1:0, 0:0, 1:1", -1.0, [0, 1, 2]),
    ("0:1, 0:2, 0:3, 0:4, 0:5", 1.0, [0, 4]),
    # simple example (S2PolylineTest :499-506)
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 3.0, [0, 9]),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 2.0, [0, 6, 9]),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0.9, [0, 2, 6, 9]),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0.4, [0, 1, 2, 3, 4, 6, 9]),
    ("0:0, 0:1, -1:2, 0:3, 0:4, 1:4, 2:4.5, 3:4, 3.5:4, 4:4", 0.0,
     [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    # guarantees (:509-525)
    ("10:10, 12:12, 10:10", 5.0, [0]),
    ("0:0, 1:1, 0:0, 0:120, 0:130", 5.0, [0, 3, 4]),
    ("90:0, 50:180, 20:180, -20:180, -50:180, -90:0, 30:0, 90:0", 5.0,
     [0, 2, 4, 5, 6, 7]),
    ("10:10, 10:20, 10:30, 10:15, 10:40", 5.0, [0, 2, 3, 4]),
    ("10:10, 10:20, 10:30, 10:10, 10:30, 10:40", 5.0, [0, 2, 3, 5]),
    ("10:10, 12:12, 9:9, 10:20, 10:30", 5.0, [0, 4]),
]


@pytest.mark.parametrize("coords,tol_deg,expected", CASES)
def test_subsample_fixtures(coords, tol_deg, expected):
    got = simplify.subsample_vertices(_verts(coords), np.radians(tol_deg))
    assert got == expected, (coords, tol_deg, got, expected)
