"""S2RegionCoverer: best-first priority-queue cell covering of a region.

From-scratch Python reimplementation of the reference algorithm
(S2RegionCoverer.java:322-755): seed with the 4 vertex-neighbor cells of the
region's bounding cap (or the 6 faces), repeatedly pop the highest-priority
candidate (largest cells first, then fewest intersecting children, then
fewest terminal children — priority int at :604-609), expand via the
region's 3-valued cell tests, stop at max_cells; then normalize +
denormalize (S2CellUnion.java:898-960, :380-415) for min_level/level_mod.

Runs scalar-per-region (regions are few, coverings <= max_cells); at scale
it executes inside a pandas_udf over the polygon table, one covering per
row, output exploded to (region_id, cell_id, is_interior) join rows.

Determinism: ties in the queue pop FIFO (insertion order), mirroring the
reference's deterministic comparator + stable construction order
(S2RegionCoverer.java:124-129).
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np

from . import cellid as ci
from . import region as rg
from . import sphere
from .cell import Cell


def union_normalize(ids: list[int]) -> list[int]:
    """Sort (unsigned), drop contained, collapse 4 siblings -> parent
    (S2CellUnion.java:898-960)."""
    ids = sorted(int(i) & 0xFFFFFFFFFFFFFFFF for i in ids)
    out: list[int] = []
    for cid in ids:
        if out and _contains(out[-1], cid):
            continue
        while out and _contains(cid, out[-1]):
            out.pop()
        while len(out) >= 3:
            if (out[-3] ^ out[-2] ^ out[-1]) != cid:
                break
            mask = (_lsb(cid) << 1) & 0xFFFFFFFFFFFFFFFF
            mask = ~(mask + (mask << 1)) & 0xFFFFFFFFFFFFFFFF
            masked = cid & mask
            if (
                (out[-3] & mask) != masked
                or (out[-2] & mask) != masked
                or (out[-1] & mask) != masked
                or _is_face(cid)
            ):
                break
            cid = _parent_once(cid)
            out = out[:-3]
        out.append(cid)
    return out


def union_denormalize(ids: list[int], min_level: int, level_mod: int) -> list[int]:
    """Split cells down to satisfy min_level/level_mod
    (S2CellUnion.java:380-415)."""
    out: list[int] = []
    for cid in ids:
        lvl = int(ci.level(np.uint64(cid)))
        new_level = max(min_level, lvl)
        if level_mod > 1:
            new_level += (ci.MAX_LEVEL - (new_level - min_level)) % level_mod
            new_level = min(ci.MAX_LEVEL, new_level)
        if new_level == lvl:
            out.append(cid)
        else:
            begin = int(ci.child_begin(np.uint64(cid), new_level))
            end = int(ci.child_end(np.uint64(cid), new_level))
            cur = begin
            while cur != end:
                out.append(cur)
                cur = int(ci.next_cell(np.uint64(cur)))
    return out


def union_leaf_cells_covered(ids: list[int]) -> int:
    """D11 S2CellUnion.leafCellsCovered (S2CellUnion.java:812-819)."""
    total = 0
    for cid in ids:
        inverted = ci.MAX_LEVEL - int(ci.level(np.uint64(cid)))
        total += 1 << (inverted << 1)
    return total


def union_average_based_area(ids: list[int]) -> float:
    """D11 averageBasedArea: leaves covered x avg leaf area (:833-835)."""
    return float(
        sphere.metric_value(sphere.AVG_AREA_DERIV, ci.MAX_LEVEL, dim=2)
    ) * union_leaf_cells_covered(ids)


def union_approx_area(ids: list[int]) -> float:
    """D11 approxArea: sum of per-cell cap-corrected flat areas (:843-849)."""
    return sum(Cell(cid).approx_area() for cid in ids)


def union_exact_area(ids: list[int]) -> float:
    """D11 exactArea: sum of per-cell two-triangle areas (:857-863)."""
    return sum(Cell(cid).exact_area() for cid in ids)


def _lsb(cid: int) -> int:
    return cid & (~cid + 1) & 0xFFFFFFFFFFFFFFFF


def _is_face(cid: int) -> bool:
    return (cid & ((1 << ci.POS_BITS) - 1)) == (1 << (ci.POS_BITS - 1))


def _parent_once(cid: int) -> int:
    nl = (_lsb(cid) << 2) & 0xFFFFFFFFFFFFFFFF
    return (cid & (~nl + 1) & 0xFFFFFFFFFFFFFFFF) | nl


def _contains(a: int, b: int) -> bool:
    la = _lsb(a) - 1
    return a - la <= b <= a + la


def _vertex_neighbors(cid: int, level: int) -> list[int]:
    """getVertexNeighbors (S2CellId.java:1029-1070), scalar."""
    u = np.uint64(cid)
    f, i, j, _ = ci.to_face_ij_orientation(u)
    f, i, j = int(f), int(i), int(j)
    halfsize = 1 << (ci.MAX_LEVEL - (level + 1))
    size = halfsize << 1
    if i & halfsize:
        ioffset, isame = size, (i + size) < ci.MAX_SIZE
    else:
        ioffset, isame = -size, (i - size) >= 0
    if j & halfsize:
        joffset, jsame = size, (j + size) < ci.MAX_SIZE
    else:
        joffset, jsame = -size, (j - size) >= 0
    out = [int(ci.parent(u, level))]
    out.append(int(ci.parent(ci.from_face_ij_same(f, i + ioffset, j, isame), level)))
    out.append(int(ci.parent(ci.from_face_ij_same(f, i, j + joffset, jsame), level)))
    if isame or jsame:
        out.append(
            int(
                ci.parent(
                    ci.from_face_ij_same(f, i + ioffset, j + joffset, isame and jsame),
                    level,
                )
            )
        )
    return out


@dataclass
class _Candidate:
    cell: Cell
    is_terminal: bool
    children: list = field(default_factory=list)
    num_terminals: int = 0


class RegionCoverer:
    """Options mirror S2RegionCoverer.Builder (:152-286); defaults
    max_cells=8 (:80), level_mod=1, levels 0..30."""

    def __init__(self, min_level=0, max_level=ci.MAX_LEVEL, level_mod=1, max_cells=8):
        self.min_level = min_level
        self.max_level = max_level
        self.level_mod = level_mod
        self.max_cells = max_cells

    # -- public API -----------------------------------------------------

    def get_covering(self, region) -> list[int]:
        """Covering cell ids (denormalized for min_level/level_mod)."""
        raw = self._covering_internal(region, interior=False)
        return union_denormalize(union_normalize(raw), self.min_level, self.level_mod)

    def get_interior_covering(self, region) -> list[int]:
        raw = self._covering_internal(region, interior=True)
        return union_denormalize(union_normalize(raw), self.min_level, self.level_mod)

    def get_covering_tokens(self, region) -> list[str]:
        return [str(t) for t in ci.to_token(np.array(self.get_covering(region), dtype=np.uint64))]

    def normalize_covering(self, ids: list[int]) -> list[int]:
        """D5 S2RegionCoverer.normalizeCovering (:448-497): clamp levels to
        max_level/level_mod, normalize, then repeatedly merge the adjacent
        pair with the DEEPEST common ancestor until <= max_cells."""
        out = []
        for cid in ids:
            lvl = int(ci.level(np.uint64(cid)))
            new_level = self._adjust_level(min(lvl, self.max_level))
            out.append(
                int(ci.parent(np.uint64(cid), new_level)) if new_level != lvl else cid
            )
        out = union_normalize(out)
        while len(out) > self.max_cells:
            best_index, best_level = -1, -1
            for i in range(len(out) - 1):
                level = int(
                    ci.common_ancestor_level(np.uint64(out[i]), np.uint64(out[i + 1]))[0]
                )
                level = self._adjust_level(level)
                if level > best_level:
                    best_level, best_index = level, i
            if best_level < self.min_level:
                break
            out[best_index] = int(ci.parent(np.uint64(out[best_index]), best_level))
            out = union_normalize(out)
        if self.min_level > 0 or self.level_mod > 1:
            out = union_denormalize(out, self.min_level, self.level_mod)
        return out

    def get_fast_covering(self, cap: rg.Cap) -> list[int]:
        """D4 S2RegionCoverer.getFastCovering (:409-442): the 4 vertex-
        neighbor cells of the cap center at the cap-width level (6 faces
        for huge caps), then normalize_covering. Cheap pre-filter covering
        — may be larger/looser than get_covering."""
        level = sphere.metric_max_level(
            sphere.MIN_WIDTH_DERIV, 2.0 * cap.bound_angle()
        )
        level = min(level, ci.MAX_LEVEL - 1)
        if level == 0:
            covering = [
                int((np.uint64(f) << np.uint64(61)) | (np.uint64(1) << np.uint64(60)))
                for f in range(6)
            ]
        else:
            cx, cy, cz = cap.center
            leaf = int(
                ci.xyz_to_cell_id(np.array([cx]), np.array([cy]), np.array([cz]))[0]
            )
            covering = _vertex_neighbors(leaf, level)
        return self.normalize_covering(covering)

    # -- internals (S2RegionCoverer.ActiveCovering) ----------------------

    def _adjust_level(self, level: int) -> int:
        if self.level_mod > 1 and level > self.min_level:
            level -= (level - self.min_level) % self.level_mod
        return level

    def _max_children_shift(self) -> int:
        return 2 * self.level_mod

    def _new_candidate(self, cell: Cell, interior, may_intersect, contains):
        if not may_intersect(cell):
            return None
        is_terminal = False
        if cell.level >= self.min_level:
            if interior:
                if contains(cell):
                    is_terminal = True
                elif cell.level + self.level_mod > self.max_level:
                    return None
            else:
                if cell.level + self.level_mod > self.max_level or contains(cell):
                    is_terminal = True
        return _Candidate(cell, is_terminal)

    def _expand_children(self, candidate, cell, num_levels, interior, mi, co):
        num_levels -= 1
        num_terminals = 0
        for child in cell.children():
            if num_levels > 0:
                if mi(child):
                    num_terminals += self._expand_children(
                        candidate, child, num_levels, interior, mi, co
                    )
                continue
            c = self._new_candidate(child, interior, mi, co)
            if c is not None:
                candidate.children.append(c)
                if c.is_terminal:
                    num_terminals += 1
        return num_terminals

    def _covering_internal(self, region, interior: bool) -> list[int]:
        contains, may_intersect, cap = rg.region_cell_tests(region)
        result: list[int] = []
        queue: list[tuple[int, int, _Candidate]] = []
        seq = 0

        def add_candidate(candidate):
            nonlocal seq
            if candidate is None:
                return
            if candidate.is_terminal:
                result.append(candidate.cell.id)
                return
            num_levels = 1 if candidate.cell.level < self.min_level else self.level_mod
            num_terminals = self._expand_children(
                candidate, candidate.cell, num_levels, interior, may_intersect, contains
            )
            shift = self._max_children_shift()
            if not candidate.children:
                return
            if (
                not interior
                and num_terminals == (1 << shift)
                and candidate.cell.level >= self.min_level
            ):
                candidate.is_terminal = True
                add_candidate(candidate)
                return
            priority = -(
                (((candidate.cell.level << shift) + len(candidate.children)) << shift)
                + num_terminals
            )
            # reference pops LARGEST queue id first (:124-129); heapq is a
            # min-heap so push the negation; seq gives FIFO tie-break.
            heapq.heappush(queue, (-priority, seq, candidate))
            seq += 1

        # initial candidates (S2RegionCoverer.java:648-682)
        seeded = False
        if self.max_cells >= 4:
            level = min(
                sphere.metric_max_level(sphere.MIN_WIDTH_DERIV, 2 * cap.bound_angle()),
                self.max_level,
                ci.MAX_LEVEL - 1,
            )
            if self.level_mod > 1 and level > self.min_level:
                level -= (level - self.min_level) % self.level_mod
            if level > 0:
                cx, cy, cz = cap.center
                leaf = int(ci.xyz_to_cell_id(np.float64(cx), np.float64(cy), np.float64(cz)))
                for nid in _vertex_neighbors(leaf, level):
                    add_candidate(self._new_candidate(Cell(nid), interior, may_intersect, contains))
                seeded = True
        if not seeded:
            for f in range(6):
                add_candidate(
                    self._new_candidate(Cell(int(ci.from_face(f))), interior, may_intersect, contains)
                )

        while queue and (not interior or len(result) < self.max_cells):
            _, _, candidate = heapq.heappop(queue)
            if (
                interior
                or candidate.cell.level < self.min_level
                or len(candidate.children) == 1
                or len(result) + len(queue) + len(candidate.children) <= self.max_cells
            ):
                for child in candidate.children:
                    if not interior or len(result) < self.max_cells:
                        add_candidate(child)
            else:
                candidate.is_terminal = True
                candidate.children = []
                result.append(candidate.cell.id)
        return result


# ---------------------------------------------------------------------------
# Range tiling + union expansion (S2CellId.maximumTile :1156-1197,
# S2CellUnion.initFromBeginEnd :228-257, expand :700-745)
# ---------------------------------------------------------------------------

def maximum_tile(cid: int, limit: int) -> int:
    """Largest cell with the same range_min whose range_max < limit's
    range_min; 'limit' if none (greedy range tiling primitive)."""
    u = lambda x: x & 0xFFFFFFFFFFFFFFFF  # noqa: E731

    def rmin(x):
        return x - (_lsb(x) - 1)

    def rmax(x):
        return u(x + (_lsb(x) - 1))

    def child0(x):
        l = _lsb(x)
        return u(x - l + (l >> 2))

    cid_start = rmin(cid)
    if cid_start >= rmin(limit):
        return limit
    if rmax(cid) >= limit:
        while rmax(cid) >= limit:
            cid = child0(cid)
        return cid
    while not _is_face(cid):
        p = _parent_once(cid)
        if rmin(p) < cid_start or rmax(p) >= limit:
            break
        cid = p
    return cid


def cells_from_leaf_range(begin: int, end: int) -> list[int]:
    """Minimal sorted cell set covering leaf range [begin, end)
    (initFromBeginEnd) — the Hilbert-range -> cells primitive used for
    shard/cluster construction."""
    out: list[int] = []
    next_begin = begin
    while next_begin < end:
        cid = next_begin
        while not _is_face(cid):
            p = _parent_once(cid)
            la = _lsb(p) - 1
            if p - la != next_begin or p + la >= end:
                break
            cid = p
        out.append(cid)
        # rangeMax().next(): leaves are odd and stride 2 (S2CellUnion:253)
        next_begin = (cid + (_lsb(cid) - 1)) + 2
    return out


def union_expand_level(ids: list[int], expand_level: int) -> list[int]:
    """Buffer a normalized union by its neighbors at expand_level
    (S2CellUnion.expand(int))."""
    ids = union_normalize(ids)
    level_lsb = 1 << (2 * (ci.MAX_LEVEL - expand_level))
    out: list[int] = []
    i = len(ids) - 1
    while i >= 0:
        cid = ids[i]
        if _lsb(cid) < level_lsb:
            cid = int(ci.parent(np.uint64(cid), expand_level))
            while i > 0 and _contains(cid, ids[i - 1]):
                i -= 1
        out.append(cid)
        lvl = int(ci.level(np.uint64(cid)))
        # neighbors at expand_level; cells COARSER than expand_level get the
        # full finer-level ring around their boundary (S2CellUnion.java:716
        # -> S2CellId.getAllNeighbors(expandLevel))
        if expand_level <= lvl:
            nbrs = ci.get_all_neighbors_same_level(np.uint64(cid))[0]
            out.extend(int(n) for n in nbrs)
        else:
            out.extend(ci.get_all_neighbors(cid, expand_level))
        i -= 1
    return union_normalize(out)


def union_expand_radius(ids: list[int], min_radius_rad: float, max_level_diff: int = 8) -> list[int]:
    """Buffer a union so all points within min_radius are covered
    (S2CellUnion.expand(S1Angle,int) — the tolerant-join pre-filter)."""
    ids = union_normalize(ids)
    if not ids:
        return ids
    min_level = min(int(ci.level(np.uint64(c))) for c in ids)
    radius_level = sphere.metric_max_level(sphere.MIN_WIDTH_DERIV, min_radius_rad)
    if radius_level == 0 and min_radius_rad > sphere.metric_value(
        sphere.MIN_WIDTH_DERIV, 0
    ):
        ids = union_expand_level(ids, 0)
    return union_expand_level(ids, min(min_level + max_level_diff, radius_level))


def get_simple_covering(region, start_latlng_deg: tuple[float, float], level: int) -> list[int]:
    """Fixed-level covering of a connected region by BFS flood fill over
    edge neighbors (S2RegionCoverer.getSimpleCovering/floodFill :395-398,
    :731-755). Output order follows the reference's stack discipline."""
    _, may_intersect, _ = rg.region_cell_tests(region)
    from .cell import Cell

    lat, lng = start_latlng_deg
    start = int(ci.parent(ci.latlng_degrees_to_cell_id(np.float64(lat), np.float64(lng)), level))
    all_seen = {start}
    frontier = [start]
    output: list[int] = []
    while frontier:
        cid = frontier.pop()
        if not may_intersect(Cell(cid)):
            continue
        output.append(cid)
        for nbr in ci.get_edge_neighbors(np.uint64(cid))[0]:
            n = int(nbr)
            if n not in all_seen:
                frontier.append(n)
                all_seen.add(n)
    return output
