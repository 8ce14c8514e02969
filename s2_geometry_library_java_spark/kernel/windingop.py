"""G4: winding-rule polygon assembly (S2WindingOperation.java:28+).

Given directed input loops (which may self-intersect, overlap, or wind
multiply), a reference point with a known winding number, and a winding
rule, constructs the polygon bounding the region where the rule holds.
Built on the G2 snap-rounding builder: input edges snap onto one site set
with crossings split, each snapped sub-edge is kept iff the rule's verdict
differs between its two sides (winding numbers evaluated just off the edge
via the batch G4 query primitive, kernel/predicates.winding_numbers), and
kept edges assemble with the region-on-the-left face walk.

Rules: 'positive' (w > 0), 'negative' (w < 0), 'non_zero', 'odd', or any
callable int -> bool.
"""

from __future__ import annotations

import numpy as np

from . import builder as bu
from . import predicates
from . import region as rg
from . import sphere

#: probe x edge work above which winding probes use the signed
#: edge-soup index instead of one broadcast batch (tests patch this)
INDEXED_PROBE_THRESHOLD = 2_000_000

_RULES = {
    "positive": lambda w: w > 0,
    "negative": lambda w: w < 0,
    "non_zero": lambda w: w != 0,
    "odd": lambda w: (w & 1) == 1,
}


def snapped_winding_delta(
    ref: np.ndarray,
    A: np.ndarray,
    B: np.ndarray,
    chains: list[list[int]],
    sites: np.ndarray,
) -> int:
    """Winding-number correction under snapping (GetSnappedWindingDelta.java):
    winding of ``ref`` w.r.t. the snapped edges minus its winding w.r.t. the
    original edges.

    Per input edge (a, b) with snapped site chain c, the closed difference
    curve a->b->reverse(S[c])->a lies inside the snap-radius lens around the
    edge, so its winding at any point far from the lens is 0; we take the
    antipode of the edge midpoint as that base and accumulate the little
    loops' windings at ``ref``. Nonzero only when ref sits inside a lens
    (closer than the snap deviation to some edge).
    """
    delta = 0
    rp = np.asarray(ref, dtype=np.float64)[None, :]
    for i in range(len(A)):
        a, b = A[i], B[i]
        pts = [a, b] + [sites[s] for s in reversed(chains[i])]
        loop = [pts[0]]
        for p in pts[1:]:
            if not np.array_equal(p, loop[-1]):
                loop.append(p)
        if len(loop) > 1 and np.array_equal(loop[0], loop[-1]):
            loop.pop()
        if len(loop) < 3:
            continue
        m = a + b
        mn = float(np.sqrt(m @ m))
        if mn < 1e-12:
            continue
        base = -(m / mn)
        # the little loop runs the ORIGINAL edge forward and the snapped
        # chain backward, so its winding at ref is (orig - snapped): negate
        delta -= int(predicates.winding_numbers(base, rp, np.asarray(loop), 0)[0])
    return delta


def winding_operation(
    loops: list[np.ndarray],
    ref_point: np.ndarray,
    ref_winding: int,
    rule="positive",
    snap_radius: float = 1e-10,
) -> "rg.Polygon":
    """Assemble the region {p : rule(winding(p))} bounded by the input
    loops' edges. ``loops`` are (n,3) directed vertex arrays; ``ref_point``
    must be farther than snap_radius from every input edge."""
    rule_fn = _RULES[rule] if isinstance(rule, str) else rule
    ref = np.asarray(ref_point, dtype=np.float64)

    bld = bu.SnapBuilder(
        bu.IdentitySnapFunction(snap_radius), split_crossing_edges=True
    )
    for v in loops:
        bld.add_loop(np.asarray(v, dtype=np.float64), layer=0)
    g = bld.build()
    S = g.sites

    segs = sorted(
        {(min(s, e), max(s, e)) for s, e in g.layer_edges(0, dedupe=True)}
    )
    if not segs:
        return rg.Polygon([])

    from .booleanop import _side_probes

    eps = max(snap_radius * 0.25, 64.0 * np.finfo(np.float64).eps)
    # (2k,3): left probes first then right (boolean_op's probe layout)
    probes = _side_probes(np.asarray(S), segs, eps)

    # Winding numbers are evaluated against the SNAPPED chains (the probes
    # sit just off the snapped edges, and snapped chains can deviate from
    # the original great circles by up to the snap radius — the reference
    # S2WindingOperation also computes winding on the snapped graph). The
    # reference winding carries over via the snapped-winding delta
    # (GetSnappedWindingDelta.java): winding_snapped(ref) =
    # ref_winding + delta.
    A = np.stack(bld._a)
    B = np.stack(bld._b)
    delta = snapped_winding_delta(ref, A, B, g.chains, S)

    # per-input-loop snapped closed chains (consecutive edges share their
    # joint site, so concatenating the edge chains with dup-dropping gives
    # the snapped loop)
    snapped_loops = []
    off = 0
    for v in loops:
        ids: list[int] = []
        for ei in range(off, off + len(v)):
            for s in g.chains[ei]:
                if not ids or s != ids[-1]:
                    ids.append(s)
        off += len(v)
        if len(ids) > 1 and ids[0] == ids[-1]:
            ids.pop()
        if len(ids) >= 2:
            snapped_loops.append(S[np.asarray(ids, dtype=np.int64)])

    base_w = int(ref_winding) + delta
    total_edges = sum(len(sv) for sv in snapped_loops)
    if total_edges * len(probes) <= INDEXED_PROBE_THRESHOLD:
        w = np.full(len(probes), base_w, dtype=np.int64)
        for sv in snapped_loops:
            w += predicates.winding_numbers(ref, probes, sv, 0)
    else:
        # large inputs: probe count and edge count both scale with the
        # input, so the broadcast winding batch is O(E^2); the SIGNED
        # edge-soup index replaces it — integer windings tracked at cell
        # centers down the build recursion, each probe pays only its own
        # cell's edges
        from . import shapeindex as si

        ea = np.concatenate(snapped_loops, axis=0)
        eb = np.concatenate(
            [np.roll(sv, -1, axis=0) for sv in snapped_loops], axis=0
        )

        def wind_at(p):
            wv = base_w
            for sv in snapped_loops:
                wv += int(predicates.winding_numbers(ref, p[None], sv, 0)[0])
            return wv

        rows = si.build_edge_soup_index(
            ea, eb, max_edges_per_cell=16, contains_point=wind_at, signed=True
        )
        w = si.winding_points_indexed(rows, ea, eb, probes)
    keep = rule_fn(w)
    out_edges = []
    for k, (u, v) in enumerate(segs):
        left, right = bool(keep[k]), bool(keep[len(segs) + k])
        if left and not right:
            out_edges.append((u, v))
        elif right and not left:
            out_edges.append((v, u))
    if not out_edges:
        return rg.Polygon([])
    out = []
    for verts in bu.assemble_loops(S, out_edges):
        lp = rg.Loop(np.asarray(verts))
        if sphere.signed_loop_area(lp.vertices) > 2.0 * np.pi:
            lp = rg.Loop(np.asarray(verts[::-1]))
        out.append(lp)
    return rg.Polygon(out)
