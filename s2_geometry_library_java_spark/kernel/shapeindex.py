"""E2: shape-index build — clip shape edges into an adaptively refined
cell quadtree with a bounded number of edges per cell.

Semantics follow S2ShapeIndex.updateEdges (S2ShapeIndex.java:766+,
DEFAULT_MAX_EDGES_PER_CELL = 10 at :124): start from the six face cells,
keep the edges intersecting each cell, and subdivide while a cell holds
more than max_edges_per_cell edges. Two deliberate simplifications vs the
reference (documented; both conservative):

* edge/cell intersection is decided geometrically (endpoint-in-cell range
  check on leaf ids + robust edge-crossing signs against the four cell
  edges) instead of the padded (u,v) clip of R2EdgeClipper — same cell ->
  edge mapping up to the reference's CELL_PADDING slack;
* the short/long-edge subdivision economics (makeIndexCell :534-650) are
  replaced by a hard max_level stop, which bounds the worst case (many
  edges through one point) the same way in practice.

The output rows (cell_id, edge_id) sorted by biased cell id ARE the index:
in the engine an index is a DataFrame (SURVEY.md §1.1 S2ShapeIndex row).
"""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from . import predicates
from .cell import Cell


def _edges_intersect_cell(cell: Cell, a: np.ndarray, b: np.ndarray,
                          leaf_a: np.ndarray, leaf_b: np.ndarray) -> np.ndarray:
    """Boolean mask of edges (a[k], b[k]) intersecting the cell: endpoint
    inside (leaf-range containment — exact) or edge crossing/touching any
    of the four cell edges (robust signs; zero counts as touching)."""
    u = np.uint64(cell.id)
    bias = np.uint64(1) << np.uint64(63)
    lob = (np.atleast_1d(ci.range_min(u)) ^ bias).view(np.int64)[0]
    hib = (np.atleast_1d(ci.range_max(u)) ^ bias).view(np.int64)[0]
    la = (leaf_a ^ bias).view(np.int64)
    lb = (leaf_b ^ bias).view(np.int64)
    inside = ((la >= lob) & (la <= hib)) | ((lb >= lob) & (lb <= hib))
    todo = ~inside
    if not np.any(todo):
        return inside
    sa = a[todo]
    sb = b[todo]
    cv = cell.vertices
    cross = np.zeros(len(sa), dtype=bool)
    for k in range(4):
        c = cv[k][None, :]
        d = cv[(k + 1) & 3][None, :]
        acb = predicates.sign_batch(sa, c, sb)
        bda = predicates.sign_batch(sb, d, sa)
        cbd = predicates.sign_batch(c, sb, d)
        dac = predicates.sign_batch(d, sa, c)
        proper = (acb == bda) & (acb == cbd) & (acb == dac) & (acb != 0)
        touching = (acb == 0) | (bda == 0) | (cbd == 0) | (dac == 0)
        cross |= proper | touching
        if cross.all():
            break
    out = inside.copy()
    out[todo] = cross
    return out


def _cell_center(cid: int) -> np.ndarray:
    x, y, z = ci.cell_id_to_xyz(np.uint64(cid))
    return np.array([float(x), float(y), float(z)])


def build_shape_index(
    loops: list[np.ndarray],
    max_edges_per_cell: int = 10,
    max_level: int = 20,
    min_level: int = 0,
) -> list[tuple[int, np.ndarray]]:
    """Index one shape: list of (cell_id, edge_ids) with edges numbered
    globally across loops in order. Cells are disjoint, every edge appears
    in >= 1 cell, and cells with > max_edges_per_cell edges occur only at
    max_level. min_level forces subdivision down to a uniform floor so a
    consumer can equi-join on parent(cell, min_level) (the closest-edge
    ring probe)."""
    return [
        (cid, edges)
        for cid, edges, _ in _build(
            loops, max_edges_per_cell, max_level, min_level, None
        )
        if len(edges)
    ]


def build_shape_index_interior(
    loops: list[np.ndarray],
    contains_point,
    max_edges_per_cell: int = 10,
    max_level: int = 20,
    min_level: int = 0,
) -> list[tuple[int, np.ndarray, bool]]:
    """Index build WITH the interior tracker (S2ShapeIndex.java:643-742):
    rows (cell_id, edge_ids, center_inside) including edgeless INTERIOR
    cells (center_inside=True, no edges) at the level subdivision stopped,
    so the emitted cells cover the shape's entire interior plus boundary
    and containment queries never rescan edges. ``contains_point`` is the
    shape's exact membership callable, invoked exactly 6 times (face
    centers); every deeper center status is carried down the recursion by
    counting crossings of the parent-center -> child-center geodesic
    against the PARENT's candidate edges — sound because S2 cells are
    intersections of four half-spaces (geodesically convex), so the step
    segment never leaves the parent cell."""
    return _build(loops, max_edges_per_cell, max_level, min_level, contains_point)


def build_edge_soup_index(
    va: np.ndarray,
    vb: np.ndarray,
    max_edges_per_cell: int = 10,
    max_level: int = 20,
    min_level: int = 0,
    contains_point=None,
    signed: bool = False,
) -> list[tuple[int, np.ndarray, bool]]:
    """Index an arbitrary directed edge set (not necessarily chained
    loops): rows (cell_id, edge_ids, center_inside). Same build as
    build_shape_index[_interior]; with contains_point=None the
    center_inside flags are all False and edgeless cells are dropped.
    ``signed=True`` tracks the INTEGER WINDING number at cell centers
    instead of boolean parity (contains_point then returns the winding
    int at a point; edgeless cells with winding 0 are dropped — a probe
    with no row has winding 0)."""
    return _build(
        None, max_edges_per_cell, max_level, min_level, contains_point,
        edges=(va, vb), signed=signed,
    )


def winding_points_indexed(
    rows: list[tuple[int, np.ndarray, int]],
    va: np.ndarray,
    vb: np.ndarray,
    pts: np.ndarray,
) -> np.ndarray:
    """Signed-winding analog of contains_points_indexed: per point,
    winding = center winding of its index cell + signed crossings of the
    center->point geodesic with the cell's own edges. Points outside all
    rows have winding 0."""
    out = np.zeros(len(pts), dtype=np.int64)
    if not rows:
        return out
    bias = np.uint64(1) << np.uint64(63)
    ids = np.array([r[0] for r in rows], dtype=np.uint64)
    lo = (ci.range_min(ids) ^ bias).view(np.int64)
    hi = (ci.range_max(ids) ^ bias).view(np.int64)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    leaf = (
        ci.xyz_to_cell_id(pts[:, 0], pts[:, 1], pts[:, 2]) ^ bias
    ).view(np.int64)
    k = np.searchsorted(lo, leaf, side="right") - 1
    valid = (k >= 0) & (leaf <= hi[np.clip(k, 0, len(hi) - 1)])
    for kk in np.unique(k[valid]):
        row = rows[order[kk]]
        m = valid & (k == kk)
        w0 = int(row[2])
        eids = row[1]
        if len(eids) == 0:
            out[m] = w0
            continue
        center = _cell_center(int(row[0]))
        out[m] = w0 + predicates.signed_crossings_edges(
            center, pts[m], va[eids], vb[eids]
        )
    return out


def contains_points_indexed(
    rows: list[tuple[int, np.ndarray, bool]],
    va: np.ndarray,
    vb: np.ndarray,
    pts: np.ndarray,
) -> np.ndarray:
    """Batch membership from interior-tracked index rows, near-linear in
    |pts|: locate each point's (disjoint, sorted) index cell, then
    inside = center_inside XOR parity of crossings of the center->point
    geodesic with the CELL's own edges (sound because S2 cells are
    geodesically convex — the step segment never leaves the cell, and
    the row holds every edge intersecting it; the reference's
    S2ShapeIndex containment walk, S2ShapeIndex.java:643-742). Points in
    no row are in exterior edgeless cells -> outside."""
    if not rows:
        return np.zeros(len(pts), dtype=bool)
    bias = np.uint64(1) << np.uint64(63)
    ids = np.array([r[0] for r in rows], dtype=np.uint64)
    lo = (ci.range_min(ids) ^ bias).view(np.int64)
    hi = (ci.range_max(ids) ^ bias).view(np.int64)
    order = np.argsort(lo)
    lo, hi = lo[order], hi[order]
    leaf = (
        ci.xyz_to_cell_id(pts[:, 0], pts[:, 1], pts[:, 2]) ^ bias
    ).view(np.int64)
    k = np.searchsorted(lo, leaf, side="right") - 1
    valid = (k >= 0) & (leaf <= hi[np.clip(k, 0, len(hi) - 1)])
    out = np.zeros(len(pts), dtype=bool)
    for kk in np.unique(k[valid]):
        row = rows[order[kk]]
        m = valid & (k == kk)
        inside = bool(row[2])
        eids = row[1]
        if len(eids) == 0:
            out[m] = inside
            continue
        center = _cell_center(int(row[0]))
        cr = predicates.count_crossings_edges(
            center, pts[m], va[eids], vb[eids]
        )
        out[m] = np.where((cr & 1) == 1, not inside, inside)
    return out


def _build(loops, max_edges_per_cell, max_level, min_level, contains_point,
           edges=None, signed=False):
    if edges is not None:
        va, vb = (np.asarray(e, dtype=np.float64) for e in edges)
    else:
        va = np.concatenate([lp for lp in loops], axis=0)
        vb = np.concatenate([np.roll(lp, -1, axis=0) for lp in loops], axis=0)
    leaf_a = ci.xyz_to_cell_id(va[:, 0], va[:, 1], va[:, 2])
    leaf_b = ci.xyz_to_cell_id(vb[:, 0], vb[:, 1], vb[:, 2])
    all_ids = np.arange(len(va), dtype=np.int64)
    track = contains_point is not None
    out: list[tuple[int, np.ndarray, bool]] = []
    # six face cells (id = face << 61 | 1 << 60)
    stack = []
    for f in range(6):
        cid = int((np.uint64(f) << np.uint64(61)) | (np.uint64(1) << np.uint64(60)))
        inside = 0 if signed else False
        if track:
            c = _cell_center(cid)
            inside = int(contains_point(c)) if signed else bool(contains_point(c))
        stack.append((cid, all_ids, inside))
    while stack:
        cid, cand, inside = stack.pop()
        cell = Cell(cid)
        mask = _edges_intersect_cell(
            cell, va[cand], vb[cand], leaf_a[cand], leaf_b[cand]
        )
        hits = cand[mask]
        if len(hits) == 0:
            if track and inside:
                out.append((cid, hits, True))
            continue
        if (
            len(hits) <= max_edges_per_cell and cell.level >= min_level
        ) or cell.level >= max_level:
            out.append((cid, hits, inside))
            continue
        u = np.uint64(cid)
        pc = _cell_center(cid) if track else None
        for k in range(4):
            child = int(np.atleast_1d(ci.child(u, k))[0])
            child_inside = 0 if signed else False
            if track:
                cc = _cell_center(child)
                if signed:
                    child_inside = inside + int(
                        predicates.signed_crossings_edges(
                            pc, cc[None], va[hits], vb[hits]
                        )[0]
                    )
                else:
                    crossings = int(
                        predicates.count_crossings_edges(
                            pc, cc[None], va[hits], vb[hits]
                        )[0]
                    )
                    child_inside = bool(inside ^ (crossings & 1))
            stack.append((child, hits, child_inside))
    out.sort(key=lambda r: int(np.uint64(r[0]) ^ (np.uint64(1) << np.uint64(63))))
    return out
