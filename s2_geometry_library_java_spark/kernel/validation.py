"""G7: geometry validation queries (S2Loop.findValidationError
S2Loop.java:1439-1530 + S2ShapeUtil.findSelfIntersection semantics).

Returns an error STRING (or None when valid) so callers can surface it as
a column in data-quality pipelines; the per-edge self-intersection test
reuses the robust crossing predicates.
"""

from __future__ import annotations

import numpy as np

from . import predicates


def _point_on_closed_edge(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> bool:
    """p lies on the closed minor arc [a, b]: exactly collinear with the
    edge's great circle (exact-rational zero, no perturbation) and within
    the arc span (for non-antipodal a,b: p.a >= a.b and p.b >= a.b)."""
    if predicates._exact_sign_one(a, b, p, perturb=False) != 0:
        return False
    ab = float(a @ b)
    return float(p @ a) >= ab and float(p @ b) >= ab


def _edges_touch_improperly(a, b, c, d) -> bool:
    """Degenerate intersection of edges AB, CD that share NO vertex: a
    vertex of one lies in the other's closed arc (covers interior-touch
    and collinear overlap — overlapping co-circular arcs always contain
    one of the four endpoints)."""
    return (
        _point_on_closed_edge(c, a, b)
        or _point_on_closed_edge(d, a, b)
        or _point_on_closed_edge(a, c, d)
        or _point_on_closed_edge(b, c, d)
    )


def find_loop_validation_error(vertices: np.ndarray) -> str | None:
    """None when the vertex list forms a valid loop; else a message:
    too-few/non-unit/duplicate-or-adjacent-degenerate vertices, antipodal
    adjacent vertices, or crossing edges (self-intersection)."""
    v = np.asarray(vertices, dtype=np.float64)
    if len(v) < 3:
        return f"loop has {len(v)} vertices (minimum 3)"
    norms = (v * v).sum(axis=1)
    if not np.all(np.abs(norms - 1.0) <= 5e-14):
        return "vertex is not unit length"
    nxt = np.roll(v, -1, axis=0)
    if np.any(np.all(v == nxt, axis=1)):
        k = int(np.nonzero(np.all(v == nxt, axis=1))[0][0])
        return f"edge {k} is degenerate (duplicate vertex)"
    if np.any(np.all(v == -nxt, axis=1)):
        k = int(np.nonzero(np.all(v == -nxt, axis=1))[0][0])
        return f"vertices {k} and {(k + 1) % len(v)} are antipodal"
    # duplicate (non-adjacent) vertices also invalidate a loop
    seen: dict = {}
    for i, p in enumerate(map(tuple, v)):
        if p in seen:
            return f"vertices {seen[p]} and {i} are duplicates"
        seen[p] = i
    # self-intersection: any non-adjacent edge pair that crosses or shares
    # an interior point. Non-adjacent edges in a valid loop share no vertex
    # (duplicates rejected above), so a degenerate touch — a vertex in the
    # interior of another edge, or collinear overlap — is just as invalid
    # as a proper crossing (the reference's crossingSign >= 0 semantics).
    n = len(v)
    for i in range(n):
        a, b = v[i], nxt[i]
        for j in range(i + 1, n):
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue  # adjacent edges share a vertex legitimately
            c, d = v[j], nxt[j]
            if predicates._arcs_cross_scalar(a, b, c, d):
                return f"edges {i} and {j} cross"
            if _edges_touch_improperly(a, b, c, d):
                return f"edges {i} and {j} touch degenerately"
    return None


def find_polygon_validation_error(loops: list[np.ndarray]) -> str | None:
    """Per-loop validity plus cross-loop edge crossings (S2Polygon
    findValidationError: loops may nest but never cross)."""
    for k, lp in enumerate(loops):
        err = find_loop_validation_error(lp)
        if err is not None:
            return f"loop {k}: {err}"
    for k1 in range(len(loops)):
        v1 = np.asarray(loops[k1])
        n1 = np.roll(v1, -1, axis=0)
        for k2 in range(k1 + 1, len(loops)):
            v2 = np.asarray(loops[k2])
            n2 = np.roll(v2, -1, axis=0)
            for i in range(len(v1)):
                for j in range(len(v2)):
                    a, b, c, d = v1[i], n1[i], v2[j], n2[j]
                    if predicates._arcs_cross_scalar(a, b, c, d):
                        return f"loop {k1} edge {i} crosses loop {k2} edge {j}"
                    # loops may legitimately share vertices (nested loops
                    # touching); only a vertex in the INTERIOR of a foreign
                    # edge / collinear overlap is degenerate
                    shared = any(
                        np.array_equal(p, q) for p in (a, b) for q in (c, d)
                    )
                    if not shared and _edges_touch_improperly(a, b, c, d):
                        return (
                            f"loop {k1} edge {i} touches loop {k2} edge {j} "
                            "degenerately"
                        )
    return None


# ---------------------------------------------------------------------------
# S2ValidQuery constraint tiers (S2ValidationQueries.java:325 S2ValidQuery)
# ---------------------------------------------------------------------------

def _classify_loop_error(msg: str) -> str:
    if "minimum 3" in msg:
        return "too_few_vertices"
    if "unit length" in msg:
        return "non_unit"
    if "degenerate" in msg:
        return "degenerate_edge"
    if "antipodal" in msg:
        return "antipodal"
    if "duplicates" in msg:
        return "duplicate_vertex"
    return "self_intersection"


def _check_duplicate_edges(loops) -> tuple[str, str] | None:
    """S2ValidQuery.checkForDuplicateEdges
    (S2ValidationQueries.java:1089): polygon shapes may not contain
    duplicate edges or reverse-duplicate (sibling) edges across any of
    their chains."""
    seen: dict[tuple, tuple[int, int]] = {}
    for k, lp in enumerate(loops):
        v = np.asarray(lp)
        n = len(v)
        for i in range(n):
            a = tuple(v[i])
            b = tuple(v[(i + 1) % n])
            if (a, b) in seen:
                return ("duplicate_edge",
                        f"loop {k} edge {i} duplicates {seen[(a, b)]}")
            if (b, a) in seen:
                return ("duplicate_edge",
                        f"loop {k} edge {i} is the reverse of {seen[(b, a)]}")
            seen[(a, b)] = (k, i)
    return None


def _check_vertex_crossings(loops) -> tuple[str, str] | None:
    """S2ValidQuery.checkVertexCrossings
    (S2ValidationQueries.java:832): chains meeting at a shared vertex
    must not interleave — the incident wedge boundary-direction pairs of
    any two occurrences must not alternate around the vertex."""
    from collections import defaultdict

    from . import predicates

    occ: dict[tuple, list[tuple[int, np.ndarray, np.ndarray]]] = defaultdict(list)
    for k, lp in enumerate(loops):
        v = np.asarray(lp)
        n = len(v)
        for i in range(n):
            occ[tuple(v[i])].append((k, v[(i - 1) % n], v[(i + 1) % n]))
    for key, wedges in occ.items():
        if len(wedges) < 2:
            continue
        vtx = np.asarray(key, dtype=np.float64)
        e1 = predicates.ortho(vtx)
        e2 = np.cross(vtx, e1)

        def theta(p):
            d = p - float(p @ vtx) * vtx
            return float(np.arctan2(d @ e2, d @ e1))

        for x in range(len(wedges)):
            for y in range(x + 1, len(wedges)):
                k1, a1, c1 = wedges[x]
                k2, a2, c2 = wedges[y]
                t_lo, t_hi = sorted((theta(a1), theta(c1)))

                def inside(p):
                    t = theta(p)
                    return t_lo < t < t_hi

                # the pair {a1,c1} splits directions into two arcs; the
                # wedges interleave iff exactly one of {a2,c2} falls in
                # the (t_lo, t_hi) arc
                if inside(a2) != inside(c2):
                    return ("vertex_crossing",
                            f"chains {k1} and {k2} cross at a shared vertex")
    return None


def _check_chain_orientation(loops) -> tuple[str, str] | None:
    """S2ValidQuery.checkChainOrientation
    (S2ValidationQueries.java:1013): interior must be on the left — a
    chain nested at even depth is CCW, at odd depth CW (S2Polygon's
    shell/hole orientation invariant). Depth is counted by strict
    containment of a representative vertex in the other chains."""
    from . import region as rg
    from . import sphere

    if len(loops) == 0:
        return None
    rloops = [rg.Loop(np.asarray(lp, dtype=np.float64)) for lp in loops]
    for i, lp in enumerate(loops):
        v = np.asarray(lp, dtype=np.float64)
        depth = 0
        for j, other in enumerate(rloops):
            if j == i:
                continue
            # orient the containment test CCW regardless of the stored
            # winding: a CW loop's parity containment is the complement
            inside = bool(other.contains_points(
                v[0:1, 0], v[0:1, 1], v[0:1, 2]
            )[0])
            # signed_loop_area is in [0, 4pi): a CW loop reports the
            # complement's area (> 2pi), and its parity containment is
            # the complement region
            if sphere.signed_loop_area(np.asarray(loops[j])) > 2.0 * np.pi:
                inside = not inside
            depth += int(inside)
        ccw = sphere.signed_loop_area(v) <= 2.0 * np.pi
        if ccw != (depth % 2 == 0):
            return ("orientation",
                    f"loop {i} at depth {depth} has interior on the right")
    return None


def find_valid_query_error(loops) -> tuple[str, str] | None:
    """Full S2ValidQuery tier stack over a polygon's loops: per-chain
    basics, cross-chain crossings/touches, duplicate + sibling edges,
    shared-vertex wedge crossings, and shell/hole orientation. Returns
    (error_code, message) or None when valid."""
    for k, lp in enumerate(loops):
        msg = find_loop_validation_error(np.asarray(lp, dtype=np.float64))
        if msg is not None:
            return (_classify_loop_error(msg), f"loop {k}: {msg}")
    basic = find_polygon_validation_error(
        [np.asarray(lp, dtype=np.float64) for lp in loops]
    )
    if basic is not None:
        return ("loop_crossing", basic)
    for check in (_check_duplicate_edges, _check_vertex_crossings,
                  _check_chain_orientation):
        err = check(loops)
        if err is not None:
            return err
    return None
