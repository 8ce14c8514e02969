"""G1: polygon boolean operations (intersection / union / difference /
symmetric_difference).

The reference's construction (S2Polygon.initToIntersection/initToUnion/
initToDifference, S2Polygon.java:1645-2100) is: clip A's boundary to the
(interior/exterior) of B, clip B's boundary likewise, and assemble the kept
directed segments into loops. Two physical paths here:

* the GENERIC-POSITION fast path — no shared vertices, no tangencies,
  proper crossings only — exactly that construction with bit-shared
  crossing points (covers most real-world query geometry);
* the SNAP-ROUNDING path (boolean_op_snapped, over kernel/builder.py —
  the S2Builder/S2BooleanOperation route) for everything the fast path
  rejects: shared vertices, shared/collinear-overlapping edges,
  vertex-on-edge tangencies, identical polygons. Regularized (area)
  semantics; degenerate touch artifacts are discarded.

Crossing points are computed ONCE per (edgeA, edgeB) pair and reused by
both clip passes, so chained segment endpoints match exactly (bit-equal
tuples) and assembly is a dict walk, no merge radius needed.

At engine scale this runs per polygon PAIR inside applyInPandas over
candidate pairs from a covering range join; polygons are small (the
reference's own boolean ops are single-threaded per pair too).
"""

from __future__ import annotations

import numpy as np

from . import edges as ek
from . import region as rg
from . import sphere

#: probe x edge work above which snapped-path parity membership uses the
#: edge-soup index instead of one broadcast batch (tests patch this)
INDEXED_PROBE_THRESHOLD = 2_000_000


def _loop_edges(poly: "rg.Polygon"):
    for lp in poly.loops:
        v = lp.vertices
        for k in range(len(v)):
            yield v[k], v[(k + 1) % len(v)]


def _edge_arrays(poly: "rg.Polygon"):
    va = np.concatenate([lp.vertices for lp in poly.loops], axis=0)
    vb = np.concatenate(
        [np.roll(lp.vertices, -1, axis=0) for lp in poly.loops], axis=0
    )
    return va, vb


def _pair_crossings_batch(a: "rg.Polygon", b: "rg.Polygon"):
    """All proper crossings between every A edge and every B edge in one
    vectorized sweep (the same four-sign robustCrossing test as
    predicates._arcs_cross_scalar, evaluated through sign_batch's
    triage->stable->exact cascade), with each intersection point computed
    ONCE and bit-shared by both clip passes.

    Returns (Aa, Ab, Ba, Bb, ii, jj, X): directed edge arrays, the
    crossing pair indices (row-major: sorted by ii then jj), and the
    intersection points. Raises on any shared vertex (non-generic)."""
    from . import predicates

    Aa, Ab = _edge_arrays(a)
    Ba, Bb = _edge_arrays(b)
    na, nb = len(Aa), len(Ba)
    ii_parts, jj_parts = [], []
    # chunk A edges so the (blk, nb) broadcast stays ~200k rows
    blk = max(1, 200_000 // max(nb, 1))
    for lo in range(0, na, blk):
        A1 = Aa[lo : lo + blk, None, :]
        A2 = Ab[lo : lo + blk, None, :]
        B1 = Ba[None, :, :]
        B2 = Bb[None, :, :]
        shared = (
            np.all(A1 == B1, axis=-1)
            | np.all(A1 == B2, axis=-1)
            | np.all(A2 == B1, axis=-1)
            | np.all(A2 == B2, axis=-1)
        )
        if shared.any():
            raise ValueError("boolean op requires generic position (shared vertex)")
        acb = predicates.sign_batch(A1, B1, A2)
        bda = predicates.sign_batch(A2, B2, A1)
        cbd = predicates.sign_batch(B1, A2, B2)
        dac = predicates.sign_batch(B2, A1, B1)
        cross = (acb == bda) & (acb == cbd) & (acb == dac) & (acb != 0)
        i_b, j_b = np.nonzero(cross)
        ii_parts.append(i_b + lo)
        jj_parts.append(j_b)
    ii = np.concatenate(ii_parts) if ii_parts else np.zeros(0, dtype=np.int64)
    jj = np.concatenate(jj_parts) if jj_parts else np.zeros(0, dtype=np.int64)
    X = (
        ek.edge_intersection(Aa[ii], Ab[ii], Ba[jj], Bb[jj])
        if len(ii)
        else np.zeros((0, 3))
    )
    return Aa, Ab, Ba, Bb, ii, jj, X


def _crossings_for_edge(a, b, other: "rg.Polygon", cross_cache: dict):
    """Intersection points of edge (a,b) with every edge of `other`,
    computed through a shared cache keyed by both edges' endpoints."""
    from . import predicates

    pts = []
    for c, d in _loop_edges(other):
        if (
            np.array_equal(a, c) or np.array_equal(a, d)
            or np.array_equal(b, c) or np.array_equal(b, d)
        ):
            raise ValueError("boolean op requires generic position (shared vertex)")
        if predicates._arcs_cross_scalar(a, b, c, d):
            key = (tuple(a), tuple(b), tuple(c), tuple(d))
            rkey = (tuple(c), tuple(d), tuple(a), tuple(b))
            if key in cross_cache:
                x = cross_cache[key]
            elif rkey in cross_cache:
                x = cross_cache[rkey]
            else:
                x = tuple(
                    ek.edge_intersection(a[None], b[None], c[None], d[None])[0]
                )
                cross_cache[key] = x
            pts.append(np.array(x))
    return pts


def _midpoint(a, b):
    m = a + b
    n = float(np.sqrt(m @ m))
    if n < 1e-12:
        raise ValueError("antipodal sub-segment (not generic position)")
    return m / n


def _clip_boundary(poly: "rg.Polygon", other: "rg.Polygon", keep_inside: bool,
                   reverse: bool, cross_cache: dict):
    """Directed sub-segments of poly's boundary whose midpoint is inside
    (or outside) `other`; optionally reversed (for difference).

    Kept as the scalar reference implementation (tests pin the vectorized
    path against it); the hot path is _clip_boundary_batch."""
    segs = []
    for a, b in _loop_edges(poly):
        xs = _crossings_for_edge(a, b, other, cross_cache)
        # order crossings along the edge by angle from a
        xs.sort(key=lambda p: float(
            sphere.angle_between(a[0], a[1], a[2], p[0], p[1], p[2])
        ))
        chain = [a] + xs + [b]
        for s, e in zip(chain, chain[1:]):
            m = _midpoint(s, e)
            inside = bool(other.contains_points(m[0:1], m[1:2], m[2:3])[0])
            if inside == keep_inside:
                segs.append((tuple(e), tuple(s)) if reverse else (tuple(s), tuple(e)))
    return segs


def _clip_boundary_batch(Ea, Eb, cross_edge, X, other: "rg.Polygon",
                         keep_inside: bool, reverse: bool):
    """Vectorized _clip_boundary: split every directed edge (Ea[i], Eb[i])
    at its crossing points, classify ALL sub-segment midpoints in ONE
    contains_points call, and emit the kept directed segments.

    cross_edge: (k,) edge index of each crossing (any order); X: (k,3)
    bit-shared crossing points."""
    n = len(Ea)
    k = len(cross_edge)
    if k:
        ea = Ea[cross_edge]
        ang = sphere.angle_between(
            ea[:, 0], ea[:, 1], ea[:, 2], X[:, 0], X[:, 1], X[:, 2]
        )
        order = np.lexsort((ang, cross_edge))
        ce = np.asarray(cross_edge)[order]
        xs = X[order]
        counts = np.bincount(ce, minlength=n)
    else:
        ce = np.zeros(0, dtype=np.int64)
        xs = np.zeros((0, 3))
        counts = np.zeros(n, dtype=np.int64)
    off = np.concatenate([[0], np.cumsum(counts + 1)])
    m = n + k
    S = np.empty((m, 3))
    E = np.empty((m, 3))
    S[off[:-1]] = Ea
    E[off[1:] - 1] = Eb
    if k:
        starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        r = np.arange(k) - starts[ce]
        S[off[ce] + r + 1] = xs
        E[off[ce] + r] = xs
    mid = S + E
    norms = np.sqrt((mid * mid).sum(axis=1))
    if (norms < 1e-12).any():
        raise ValueError("antipodal sub-segment (not generic position)")
    mid = mid / norms[:, None]
    inside = other.contains_points(mid[:, 0], mid[:, 1], mid[:, 2])
    keep = np.nonzero(inside == keep_inside)[0]
    if reverse:
        return [(tuple(E[t]), tuple(S[t])) for t in keep]
    return [(tuple(S[t]), tuple(E[t])) for t in keep]


def _assemble(segs) -> "rg.Polygon":
    """Chain directed segments into loops (endpoints match exactly)."""
    by_start: dict = {}
    for s, e in segs:
        if s in by_start:
            raise ValueError("non-manifold boundary (not generic position)")
        by_start[s] = e
    loops = []
    while by_start:
        start = next(iter(by_start))
        verts = [start]
        cur = by_start.pop(start)
        guard = len(segs) + 1
        while cur != start:
            verts.append(cur)
            cur = by_start.pop(cur)
            guard -= 1
            if guard == 0:
                raise ValueError("boundary did not close (not generic position)")
        # Normalize orientation for the engine's XOR-loop convention (hole
        # loops stored CCW-small): a chained loop whose CCW interior spans
        # more than a hemisphere is a hole traversed backwards — reverse
        # it. (Limits results to regions under a hemisphere per loop, like
        # the generic-position contract above.)
        lp = rg.Loop(np.array(verts))
        if sphere.signed_loop_area(lp.vertices) > 2.0 * np.pi:
            lp = rg.Loop(np.array(verts[::-1]))
        loops.append(lp)
    return rg.Polygon(loops)


def _side_probes(S: np.ndarray, segs, eps: float) -> np.ndarray:
    """(2k,3) probe points eps off both sides of each snapped sub-edge
    (left probes first, then right), vectorized over the segments."""
    uu = np.fromiter((u for u, _ in segs), dtype=np.int64, count=len(segs))
    vv = np.fromiter((v for _, v in segs), dtype=np.int64, count=len(segs))
    su, sv = S[uu], S[vv]
    m = su + sv
    mn = np.sqrt((m * m).sum(axis=1))
    if (mn < 1e-9).any():
        raise ValueError("antipodal snapped sub-edge")
    m = m / mn[:, None]
    n = sphere.cross3(su, sv)
    nn = np.sqrt((n * n).sum(axis=1))
    if (nn == 0.0).any():
        raise ValueError("degenerate snapped sub-edge")
    n = n / nn[:, None]
    pl = m + eps * n
    pr = m - eps * n
    pl = pl / np.sqrt((pl * pl).sum(axis=1))[:, None]
    pr = pr / np.sqrt((pr * pr).sum(axis=1))[:, None]
    return np.concatenate([pl, pr], axis=0)


def _no_crossing_case(a: "rg.Polygon", b: "rg.Polygon", op: str) -> "rg.Polygon":
    pa = a.loops[0].vertices[0]
    pb = b.loops[0].vertices[0]
    a_in_b = bool(b.contains_points(pa[0:1], pa[1:2], pa[2:3])[0])
    b_in_a = bool(a.contains_points(pb[0:1], pb[1:2], pb[2:3])[0])
    empty = rg.Polygon([])
    if a_in_b and b_in_a:
        # Each boundary lies inside the OTHER region (complement-style
        # inputs, e.g. a hemisphere vs a CW small loop): A union B covers
        # the sphere (S2Loop.full() output), the complements are disjoint,
        # and under the XOR-loop convention complementing a k-loop region
        # means adding the FULL loop (odd-parity flip).
        if op == "intersection":
            # not((not A) union (not B)) with disjoint complements
            return rg.Polygon(
                [rg.Loop.full()] + list(a.loops) + list(b.loops)
            )
        if op == "union":
            return rg.Polygon([rg.Loop.full()])
        if op == "difference":
            # A intersect not(B) = not(B) (not-B is contained in A here)
            return rg.Polygon([rg.Loop.full()] + list(b.loops))
        raise ValueError(op)
    if op == "intersection":
        return a if a_in_b else (b if b_in_a else empty)
    if op == "union":
        if a_in_b:
            return b
        if b_in_a:
            return a
        return rg.Polygon(list(a.loops) + list(b.loops))  # disjoint multi-loop
    if op == "difference":
        if a_in_b:
            return empty
        if b_in_a:
            # A with a B-shaped hole: XOR-loop convention (hole loop as-is)
            return rg.Polygon(list(a.loops) + list(b.loops))
        return a
    raise ValueError(op)


#: chord2 below which a vertex counts as lying ON a foreign edge (~1e-14
#: rad) — such tangencies break the generic-position midpoint
#: classification and must take the snap-rounding path.
_TANGENCY_CHORD2 = 1e-28


def _require_generic_position(a: "rg.Polygon", b: "rg.Polygon") -> None:
    """Raise when a vertex of one polygon lies (numerically) on an edge of
    the other — vertex-on-edge tangencies and collinear overlaps make the
    generic path's midpoint classification ill-defined even without shared
    vertices. (Shared vertices themselves are caught edge-by-edge in
    _crossings_for_edge.)"""
    def verts(poly):
        return np.concatenate([lp.vertices for lp in poly.loops], axis=0)

    def chains(poly):
        va = verts(poly)
        vb = np.concatenate(
            [np.roll(lp.vertices, -1, axis=0) for lp in poly.loops], axis=0
        )
        return va, vb

    for p, q in ((a, b), (b, a)):
        va, vb = chains(q)
        d2 = ek.min_chord2_points_to_chain(verts(p), va, vb)
        if (d2 <= _TANGENCY_CHORD2).any():
            raise ValueError(
                "boolean op requires generic position (vertex on foreign edge)"
            )


def _boolean_op_generic(a: "rg.Polygon", b: "rg.Polygon", op: str) -> "rg.Polygon":
    """intersection | union | difference of two generic-position polygons.

    intersection: A-boundary inside B  +  B-boundary inside A
    union:        A-boundary outside B +  B-boundary outside A
    difference:   A-boundary outside B +  B-boundary inside A, reversed
    (S2Polygon.java:1747-1756, 1874-1882, 2012-2020 comment blocks.)
    """
    _require_generic_position(a, b)
    Aa, Ab, Ba, Bb, ii, jj, X = _pair_crossings_batch(a, b)

    def clip_a(keep_inside, rev=False):
        return _clip_boundary_batch(Aa, Ab, ii, X, b, keep_inside, rev)

    def clip_b(keep_inside, rev=False):
        return _clip_boundary_batch(Ba, Bb, jj, X, a, keep_inside, rev)

    if op == "intersection":
        segs = clip_a(True) + clip_b(True)
    elif op == "union":
        segs = clip_a(False) + clip_b(False)
    elif op == "difference":
        segs = clip_a(False) + clip_b(True, rev=True)
    else:
        raise ValueError(op)
    if not segs:
        return _no_crossing_case(a, b, op)
    return _assemble(segs)


_COMBINE = {
    "intersection": lambda ia, ib: ia & ib,
    "union": lambda ia, ib: ia | ib,
    "difference": lambda ia, ib: ia & ~ib,
    "symmetric_difference": lambda ia, ib: ia ^ ib,
}


def boolean_op_snapped(
    a: "rg.Polygon", b: "rg.Polygon", op: str, snap_radius: float = 1e-10
) -> "rg.Polygon":
    """General-position-free boolean op via snap rounding (the S2Builder
    route the reference uses, S2BooleanOperation.java over S2Builder):

    1. both boundaries snap onto ONE site set (kernel/builder.py,
       IdentitySnapFunction) — shared and near-shared vertices merge,
       vertices within the snap radius of a foreign edge are spliced into
       its chain, and proper crossings become forced sites
       (splitCrossingEdges), so the snapped sub-edges form a planar
       arrangement on shared vertices;
    2. each undirected snapped sub-edge is classified by evaluating the
       result region just off its two sides (offset eps = snap_radius / 4:
       far above FP noise, far below the builder's site-separation
       guarantee); membership uses crossing parity against the SNAPPED
       layer boundaries, so classification is consistent with the
       arrangement even when the inputs were degenerate. A sub-edge joins
       the output iff the region covers exactly one side, directed with
       the region on its LEFT — shared edges from both inputs collapse to
       one verdict, interior/exterior edges drop out;
    3. loops assemble with the region-on-the-left face walk
       (builder.assemble_loops), which resolves degree-4+ shared sites.

    Implements REGULARIZED (area-interior) semantics: degenerate outputs
    — isolated points/edges where the inputs merely touch — are discarded,
    matching S2BooleanOperation's default polygon layer with semi-open
    boundaries (boolean_op_mixed emits them). Requires the parity
    reference point (Loop.ORIGIN) to be farther than snap_radius from
    every input boundary.
    """
    return _snapped_core(a, b, op, snap_radius)["polygon"]


def _snapped_core(
    a: "rg.Polygon", b: "rg.Polygon", op: str, snap_radius: float = 1e-10
) -> dict:
    """Shared engine for boolean_op_snapped / boolean_op_mixed: builds the
    snapped arrangement, classifies every sub-edge's two sides under the
    op, assembles the regularized polygon, and returns all intermediates
    (sites, segs, per-side input/result memberships, layer edge sets)."""
    from . import builder as bu
    from . import predicates

    combine = _COMBINE[op]
    bld = bu.SnapBuilder(
        bu.IdentitySnapFunction(snap_radius), split_crossing_edges=True
    )
    for lp in a.loops:
        bld.add_loop(lp.vertices, layer=0)
    for lp in b.loops:
        bld.add_loop(lp.vertices, layer=1)
    g = bld.build()
    S = g.sites

    # snapped per-layer boundaries for parity membership (dedupe=False:
    # parity needs every boundary edge counted with its multiplicity)
    def layer_arrays(layer):
        es = g.layer_edges(layer, dedupe=False)
        if not es:
            return np.zeros((0, 3)), np.zeros((0, 3))
        idx = np.asarray(es, dtype=np.int64)
        return S[idx[:, 0]], S[idx[:, 1]]

    a_ea, a_eb = layer_arrays(0)
    b_ea, b_eb = layer_arrays(1)
    origin = rg.Loop.ORIGIN
    # ORIGIN membership from the loops' stored flags (XOR-loop convention);
    # calling contains_points(ORIGIN) would make the origin->query geodesic
    # degenerate and escalate every edge to exact arithmetic
    def origin_in(poly):
        r = False
        for lp in poly.loops:
            r ^= bool(lp.origin_inside)
        return r

    a_origin_in = origin_in(a)
    b_origin_in = origin_in(b)

    a_edge_set = {(min(s, e), max(s, e)) for s, e in g.layer_edges(0, dedupe=True)}
    b_edge_set = {(min(s, e), max(s, e)) for s, e in g.layer_edges(1, dedupe=True)}
    segs = sorted(a_edge_set | b_edge_set)
    empty = {
        "polygon": rg.Polygon([]),
        "sites": S,
        "segs": [],
        "a_edge_set": a_edge_set,
        "b_edge_set": b_edge_set,
        "a_origin_in": a_origin_in,
        "b_origin_in": b_origin_in,
        "in_a": np.zeros(0, dtype=bool),
        "in_b": np.zeros(0, dtype=bool),
        "r_left": np.zeros(0, dtype=bool),
        "r_right": np.zeros(0, dtype=bool),
        "out_edges": [],
    }
    if not segs:
        return empty

    eps = max(snap_radius * 0.25, 64.0 * np.finfo(np.float64).eps)
    probes = _side_probes(S, segs, eps)

    def member(ea, eb, origin_in):
        if len(ea) == 0:
            return np.zeros(len(probes), dtype=bool)
        if len(ea) * len(probes) <= INDEXED_PROBE_THRESHOLD:
            # small: one broadcast parity batch
            cr = predicates.count_crossings_edges(origin, probes, ea, eb)
            return np.where((cr & 1) == 1, not origin_in, origin_in)
        # large: near-linear indexed membership — probe count and edge
        # count both scale with the input size, so the broadcast batch is
        # O(E^2); the interior-tracked edge-soup index replaces it with
        # per-cell local parity (S2ShapeIndex containment semantics)
        from . import shapeindex as si

        def layer_contains(p):
            cr1 = int(
                predicates.count_crossings_edges(origin, p[None], ea, eb)[0]
            )
            return bool(origin_in) != bool(cr1 & 1)

        rows = si.build_edge_soup_index(
            ea, eb, max_edges_per_cell=16, contains_point=layer_contains
        )
        return si.contains_points_indexed(rows, ea, eb, probes)

    in_a = member(a_ea, a_eb, a_origin_in)
    in_b = member(b_ea, b_eb, b_origin_in)
    r = combine(in_a, in_b)
    n_seg = len(segs)
    r_left, r_right = r[:n_seg], r[n_seg:]

    out_edges = []
    for k, (u, v) in enumerate(segs):
        if r_left[k] and not r_right[k]:
            out_edges.append((u, v))
        elif r_right[k] and not r_left[k]:
            out_edges.append((v, u))
    loops = []
    if out_edges:
        for verts in bu.assemble_loops(S, out_edges):
            lp = rg.Loop(np.asarray(verts))
            if sphere.signed_loop_area(lp.vertices) > 2.0 * np.pi:
                lp = rg.Loop(np.asarray(verts[::-1]))
            loops.append(lp)
    elif n_seg and bool(r_left.all()) and bool(r_right.all()):
        # every sub-edge has the result on BOTH sides: the regularized
        # result is the full sphere (e.g. union of two hemispheres
        # sharing their boundary) — representable since the FULL loop
        # sentinel exists (S2Loop.full())
        loops = [rg.Loop.full()]
    return {
        "polygon": rg.Polygon(loops),
        "sites": S,
        "segs": segs,
        "a_edge_set": a_edge_set,
        "b_edge_set": b_edge_set,
        "a_origin_in": a_origin_in,
        "b_origin_in": b_origin_in,
        "in_a": in_a,
        "in_b": in_b,
        "r_left": r_left,
        "r_right": r_right,
        "out_edges": out_edges,
    }


def boolean_op_mixed(
    a: "rg.Polygon",
    b: "rg.Polygon",
    op: str,
    snap_radius: float = 1e-10,
    model: str = "closed",
) -> tuple["rg.Polygon", list, list]:
    """Mixed-dimension boolean op: (polygon, degenerate_edges,
    degenerate_points) under a polygon boundary model
    (S2BooleanOperation.java:268-273 polygon model options;
    S2ClosedSetNormalizer.java semantics).

    The regularized polygon is exactly boolean_op_snapped's in every
    model; the models differ only in which degenerate elements accompany
    it.

    model="closed" (default): each operand is its closure. Additionally:

    * a snapped sub-edge whose two sides are BOTH excluded from the
      regularized result but which belongs to the op's closed combination
      — e.g. the shared edge of two tangent polygons under intersection
      (closure of A and closure of B both contain it), or A's boundary
      edge flush against B's under difference (closed(A) minus open(B)
      keeps it) — is emitted as a DEGENERATE EDGE (pair of site points);
    * a snapped site that belongs to the closed combination but has no
      incident polygon or degenerate edge in the output — a vertex-only
      tangency — is emitted as a DEGENERATE POINT.

    model="open": each operand is its interior; the result of the open
    combination is an open set, so its degeneracies are SUBTRACTIVE —
    cracks and punctures excluded from the regularized polygon (the
    reference represents these as degenerate holes / sibling edge pairs
    in the lax layers, S2LaxPolygonLayer DegenerateBoundaries):

    * a snapped sub-edge whose two sides are BOTH in the regularized
      result but which fails the op's open combination — e.g. the shared
      edge of two abutting squares under union (neither open operand
      contains it) — is emitted in ``degenerate_edges`` as a CRACK to be
      removed from the open result;
    * a site interior to the regularized polygon that fails the open
      combination and lies on no crack is emitted in
      ``degenerate_points`` as a PUNCTURE (for simple polygon inputs
      every vertex tangency ends a crack, so this is rare by
      construction, but the check is kept for completeness).

    model="semi_open": every boundary point belongs to exactly one side
    (S2BooleanOperation's default), so polygon-x-polygon ops produce no
    degeneracies — the regularized polygon IS the result and both lists
    are empty.

    Per S2ClosedSetNormalizer, degeneracies contained in (closed) /
    bounding (open) a higher-dimension output element are suppressed:
    edge endpoints are never also points; edges on the result polygon's
    boundary are never degenerate."""
    from . import predicates

    if model not in ("closed", "open", "semi_open"):
        raise ValueError(f"unknown polygon model: {model!r}")
    core = _snapped_core(a, b, op, snap_radius)
    if model == "semi_open":
        return core["polygon"], [], []
    if model == "open":
        return _mixed_open(core, op)
    S = core["sites"]
    segs = core["segs"]
    a_set, b_set = core["a_edge_set"], core["b_edge_set"]
    in_a, in_b = core["in_a"], core["in_b"]
    r_left, r_right = core["r_left"], core["r_right"]
    n = len(segs)

    def closed_edge_member(k, on_set, side_member):
        # edge in the CLOSED operand region: covers a side, or lies on
        # the operand's own boundary
        return bool(side_member[k] or side_member[n + k] or (segs[k] in on_set))

    def open_edge_member(k, on_set, side_member):
        # strictly interior: covers both sides and is not boundary
        return bool(
            side_member[k] and side_member[n + k] and (segs[k] not in on_set)
        )

    def combine_closed(ca, cb, oa, ob):
        if op == "intersection":
            return ca and cb
        if op == "union":
            return ca or cb
        if op == "difference":
            return ca and not ob
        return (ca and not ob) or (cb and not oa)  # symmetric_difference

    degen_edges = []
    degen_edge_sites = set()
    for k in range(n):
        if r_left[k] or r_right[k]:
            continue  # a side survives: the edge is ordinary boundary
        ca = closed_edge_member(k, a_set, in_a)
        cb = closed_edge_member(k, b_set, in_b)
        oa = open_edge_member(k, a_set, in_a)
        ob = open_edge_member(k, b_set, in_b)
        if combine_closed(ca, cb, oa, ob):
            u, v = segs[k]
            degen_edges.append((S[u].copy(), S[v].copy()))
            degen_edge_sites.update((u, v))

    # sites used by the output polygon boundary
    poly_sites = {u for u, _ in core["out_edges"]} | {
        v for _, v in core["out_edges"]
    }
    a_sites = {s for e in a_set for s in e}
    b_sites = {s for e in b_set for s in e}
    cand_sites = sorted((a_sites | b_sites) - poly_sites - degen_edge_sites)
    degen_points = []
    if cand_sites:
        pts = S[np.asarray(cand_sites, dtype=np.int64)]
        origin = rg.Loop.ORIGIN

        def strict_inside(poly, edge_set, site_ids):
            # parity membership; ill-defined exactly ON the boundary, but
            # candidate sites that are vertices of this operand are
            # resolved by the vertex rule below, not by parity
            if not edge_set:
                return np.zeros(len(site_ids), dtype=bool)
            es = sorted(edge_set)
            ea = S[np.asarray([u for u, _ in es])]
            eb = S[np.asarray([v for _, v in es])]
            cr = predicates.count_crossings_edges(origin, pts, ea, eb)
            oin = False
            for lp in poly.loops:
                oin ^= bool(lp.origin_inside)
            return np.where((cr & 1) == 1, not oin, oin)

        ins_a = strict_inside(a, a_set, cand_sites)
        ins_b = strict_inside(b, b_set, cand_sites)
        for idx, sid in enumerate(cand_sites):
            va = sid in a_sites
            vb = sid in b_sites
            ca = va or bool(ins_a[idx])
            cb = vb or bool(ins_b[idx])
            oa = bool(ins_a[idx]) and not va
            ob = bool(ins_b[idx]) and not vb
            if combine_closed(ca, cb, oa, ob):
                # the closed combination holds at the site but no output
                # element of higher dimension contains it
                poly_covers = core["polygon"].contains_points(
                    pts[idx : idx + 1, 0], pts[idx : idx + 1, 1], pts[idx : idx + 1, 2]
                )
                if not bool(poly_covers[0]):
                    degen_points.append(S[sid].copy())
    return core["polygon"], degen_edges, degen_points


def _mixed_open(core: dict, op: str) -> tuple["rg.Polygon", list, list]:
    """OPEN-model degeneracies (see boolean_op_mixed): cracks = interior
    sub-edges failing the open combination; punctures = interior sites
    failing it off every crack."""
    S = core["sites"]
    segs = core["segs"]
    a_set, b_set = core["a_edge_set"], core["b_edge_set"]
    in_a, in_b = core["in_a"], core["in_b"]
    r_left, r_right = core["r_left"], core["r_right"]
    n = len(segs)

    def open_member(k, on_set, side):
        # edge in the OPEN operand region: covers both sides and is not
        # on the operand's own boundary
        return bool(side[k] and side[n + k] and (segs[k] not in on_set))

    def closed_member(k, on_set, side):
        return bool(side[k] or side[n + k] or (segs[k] in on_set))

    def combine_open(oa, ob, ca, cb):
        if op == "intersection":
            return oa and ob
        if op == "union":
            return oa or ob
        if op == "difference":
            return oa and not cb
        return (oa and not cb) or (ob and not ca)  # symmetric_difference

    cracks = []
    crack_sites = set()
    for k in range(n):
        if not (r_left[k] and r_right[k]):
            continue  # not interior to the regularized result
        oa = open_member(k, a_set, in_a)
        ob = open_member(k, b_set, in_b)
        ca = closed_member(k, a_set, in_a)
        cb = closed_member(k, b_set, in_b)
        if not combine_open(oa, ob, ca, cb):
            u, v = segs[k]
            cracks.append((S[u].copy(), S[v].copy()))
            crack_sites.update((u, v))

    poly = core["polygon"]
    poly_sites = {u for u, _ in core["out_edges"]} | {
        v for _, v in core["out_edges"]
    }
    a_sites = {s for e in a_set for s in e}
    b_sites = {s for e in b_set for s in e}
    cand = sorted((a_sites | b_sites) - poly_sites - crack_sites)
    punctures = []
    if cand and poly.loops:
        from . import predicates

        pts = S[np.asarray(cand, dtype=np.int64)]
        interior = poly.contains_points(pts[:, 0], pts[:, 1], pts[:, 2])
        origin = rg.Loop.ORIGIN

        def strict_inside(edge_set, origin_in):
            # parity vs the snapped layer boundary; only consulted for
            # sites that are NOT vertices of this operand (vertex sites
            # are resolved by the vertex rule below)
            if not edge_set:
                return np.zeros(len(cand), dtype=bool)
            es = sorted(edge_set)
            ea = S[np.asarray([u for u, _ in es])]
            eb = S[np.asarray([v for _, v in es])]
            cr = predicates.count_crossings_edges(origin, pts, ea, eb)
            return np.where((cr & 1) == 1, not origin_in, origin_in)

        ins_a = strict_inside(a_set, core["a_origin_in"])
        ins_b = strict_inside(b_set, core["b_origin_in"])
        for idx, sid in enumerate(cand):
            if not bool(interior[idx]):
                continue
            va, vb = sid in a_sites, sid in b_sites
            oa = bool(ins_a[idx]) and not va
            ob = bool(ins_b[idx]) and not vb
            ca = va or bool(ins_a[idx])
            cb = vb or bool(ins_b[idx])
            if not combine_open(oa, ob, ca, cb):
                punctures.append(S[sid].copy())
    return poly, cracks, punctures


def boolean_op(a: "rg.Polygon", b: "rg.Polygon", op: str) -> "rg.Polygon":
    """intersection | union | difference | symmetric_difference. The
    generic-position fast path runs first; inputs it rejects (shared
    vertices, tangencies, collinear overlaps — anything non-generic) go
    through the snap-rounding path, so no valid input raises."""
    if op == "symmetric_difference":
        return boolean_op_snapped(a, b, op)
    try:
        return _boolean_op_generic(a, b, op)
    except ValueError:
        return boolean_op_snapped(a, b, op)


def intersection(a, b):
    return boolean_op(a, b, "intersection")


def union(a, b):
    return boolean_op(a, b, "union")


def difference(a, b):
    return boolean_op(a, b, "difference")


def symmetric_difference(a, b):
    return boolean_op(a, b, "symmetric_difference")
