"""Koch-snowflake fractal test geometry (S2FractalBuilder.java:34-243).

Generates the reference's adversarial stress loops: an equilateral
triangle whose edges subdivide recursively into four segments, with a
controllable fractal dimension in [1.0, 2.0) (edge_fraction =
4^(-1/dimension), offset_fraction = sqrt(edge_fraction - 1/4)) and an
optional multi-level mode where subdivision stops at a random level
between min and max. Used by the property stress tier for the coverer,
the shape index, and the boolean ops — the reference exercises the same
components with these loops (TestDataGenerator.java:445).

Determinism comes from a caller-provided numpy Generator; the randomness
source differs from java.util.Random, so vertex sequences are not
bit-matched to the reference's seeds — the geometry family and all
radius/level invariants are.
"""

from __future__ import annotations

import numpy as np

from . import predicates


class FractalBuilder:
    def __init__(self, rng: np.random.Generator):
        self.rng = rng
        self.max_level = -1
        self._min_level_arg = -1
        self.min_level = -1
        self.dimension = np.log(4) / np.log(3)
        self._compute_offsets()

    # -- configuration (S2FractalBuilder.java:80-135) -----------------------

    def set_max_level(self, max_level: int) -> None:
        assert max_level >= 0
        self.max_level = int(max_level)
        self._compute_min_level()

    def set_min_level(self, min_level: int) -> None:
        assert min_level >= -1
        self._min_level_arg = int(min_level)
        self._compute_min_level()

    def _compute_min_level(self) -> None:
        if 0 <= self._min_level_arg <= self.max_level:
            self.min_level = self._min_level_arg
        else:
            self.min_level = self.max_level

    def set_fractal_dimension(self, dimension: float) -> None:
        assert 1.0 <= dimension <= 2.0
        self.dimension = float(dimension)
        self._compute_offsets()

    def _compute_offsets(self) -> None:
        self.edge_fraction = 4.0 ** (-1.0 / self.dimension)
        self.offset_fraction = np.sqrt(self.edge_fraction - 0.25)

    @staticmethod
    def _level_from_edges(edges: int) -> int:
        return int(np.ceil(0.5 * np.log(edges / 3.0) / np.log(2.0)))

    def set_level_for_approx_max_edges(self, max_edges: int) -> None:
        self.set_max_level(self._level_from_edges(max_edges))

    def set_level_for_approx_min_edges(self, min_edges: int) -> None:
        self.set_min_level(self._level_from_edges(min_edges))

    # -- radius bounds (S2FractalBuilder.java:139-172) ----------------------

    def min_radius_factor(self) -> float:
        k_min_dim = 1.0852230903040407
        if self.dimension >= k_min_dim:
            return float(
                np.sqrt(1 + 3 * self.edge_fraction * (self.edge_fraction - 1))
            )
        return 0.5

    def max_radius_factor(self) -> float:
        return float(max(1.0, self.offset_fraction * np.sqrt(3) + 0.5))

    # -- construction (S2FractalBuilder.java:175-243) -----------------------

    def _r2_vertices_helper(self, v0, v4, level, out) -> None:
        if level >= self.min_level and (
            int(self.rng.integers(0, self.max_level - level + 1)) == 0
        ):
            out.append(v0)
            return
        d = v4 - v0
        v1 = v0 + self.edge_fraction * d
        # ortho(): CCW 90-degree rotation (R2Vector.java:155-160)
        ortho = np.array([-d[1], d[0]])
        v2 = 0.5 * (v0 + v4) - self.offset_fraction * ortho
        v3 = v4 - self.edge_fraction * d
        self._r2_vertices_helper(v0, v1, level + 1, out)
        self._r2_vertices_helper(v1, v2, level + 1, out)
        self._r2_vertices_helper(v2, v3, level + 1, out)
        self._r2_vertices_helper(v3, v4, level + 1, out)

    def _r2_vertices(self) -> np.ndarray:
        v0 = np.array([1.0, 0.0])
        v1 = np.array([-0.5, np.sqrt(3) / 2])
        v2 = np.array([-0.5, -np.sqrt(3) / 2])
        out: list = []
        self._r2_vertices_helper(v0, v1, 0, out)
        self._r2_vertices_helper(v1, v2, 0, out)
        self._r2_vertices_helper(v2, v0, 0, out)
        return np.asarray(out)

    def make_vertices(self, frame: np.ndarray, nominal_radius: float) -> np.ndarray:
        """(n,3) fractal loop vertices around ``frame``'s third column,
        first vertex toward the frame's +x axis; nominal_radius in
        radians (S2FractalBuilder.makeVertices)."""
        assert self.max_level >= 0, "set_max_level first"
        r2 = self._r2_vertices()
        theta = np.arctan2(r2[:, 1], r2[:, 0])
        radius = nominal_radius * np.sqrt((r2 * r2).sum(axis=1))
        z = np.cos(radius)
        r = np.sin(radius)
        local = np.stack([r * np.cos(theta), r * np.sin(theta), z], axis=1)
        return local @ np.asarray(frame, dtype=np.float64).T


def frame_at(center: np.ndarray) -> np.ndarray:
    """Orthonormal frame whose third column is ``center`` (the loop
    center), matching S2.getFrame's (x, y, z=center) column layout."""
    c = np.asarray(center, dtype=np.float64)
    c = c / np.sqrt(c @ c)
    x = predicates.ortho(c)
    y = np.cross(c, x)
    y = y / np.sqrt(y @ y)
    return np.stack([x, y, c], axis=1)
