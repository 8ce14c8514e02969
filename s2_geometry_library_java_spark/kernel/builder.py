"""G2: snap-rounding builder (S2Builder semantics, kernel tier).

Re-expresses the reference's snap-rounding framework (S2Builder.java:20-80,
S2BuilderSnapFunctions.java, S2BuilderGraph.java) as a vectorized-numpy
kernel, scoped to what the engine's constructive ops need:

* snap functions with the reference's guarantees — snap radius as an upper
  bound on vertex movement, minimum vertex separation between output sites
  (IdentitySnapFunction, S2CellIdSnapFunction, IntLatLngSnapFunction);
* "snap first" site selection in the reference's deterministic order
  (vertices sorted by leaf cell id then point, S2Builder.chooseInitialSites
  S2Builder.java:1150-1207): each snapped vertex becomes a new site unless
  an existing site is within minVertexSeparation;
* optional splitting of crossing edges (splitCrossingEdges): every proper
  interior crossing becomes a forced site, so downstream layers see a
  planar arrangement;
* edge snapping: each input edge is replaced by the chain of sites within
  edgeSnapRadius of it, ordered along the edge, with the reference's
  Voronoi site-exclusion rules (S2Builder.snapEdge S2Builder.java:
  1588-1701 / S2Predicates.getVoronoiSiteExclusion): a site whose
  coverage interval on the edge nests inside a nearer site's is dropped,
  and the three-site circumcenter rule prunes sites shadowed by their two
  neighbors. Interval comparisons use float arithmetic with a stable
  2*asin formulation and ESCALATE TO EXACT rational arithmetic
  (kernel/exactcover.py, the reference's triage->exact cascade) when an
  endpoint comparison falls within VORONOI_TIE_EPS of a tie — exact for
  edges spanning < pi/2; longer edges keep the float decision;
* simplify_edge_chains (S2Builder.java:20-80): Graph.simplified_layer_
  edges subsamples maximal degree-2 paths of the output graph under the
  snap radius, preserving junctions — snap + simplify in one
  topology-preserving pass;
* a polygon layer: assembly of directed region-on-the-left edges into
  loops with a tangent-plane "first outgoing edge clockwise of the
  reversed incoming direction" walk — the face traversal that keeps the
  enclosed region on the left even through degree-4+ snap sites, which is
  what lets boolean ops accept shared vertices.

Everything here is per-shape/per-pair kernel work: at engine scale it runs
inside mapInPandas/applyInPandas over shape tables, never on the driver.
"""

from __future__ import annotations

import numpy as np

from . import cellid as ci
from . import edges as ek
from . import predicates
from . import sphere

#: float coverage-interval endpoint comparisons closer than this (radians)
#: escalate to the exact rational path (kernel/exactcover.py); generous vs
#: the stable 2*asin formulation's ~1e-15 endpoint error
VORONOI_TIE_EPS = 1e-13

DBL_EPSILON = float(np.finfo(np.float64).eps)

#: Max error of the edge_intersection construction (S2EdgeUtil
#: INTERSECTION_ERROR tier): intersection sites can sit this far off the
#: true edges, so edge snapping must tolerate it.
INTERSECTION_ERROR = 8.0 * DBL_EPSILON


class IdentitySnapFunction:
    """Snaps every vertex to itself; vertices within snap_radius merge
    (S2BuilderSnapFunctions.IdentitySnapFunction)."""

    def __init__(self, snap_radius: float = 0.0):
        self.snap_radius = float(snap_radius)

    def snap(self, points: np.ndarray) -> np.ndarray:
        return points

    def min_vertex_separation(self) -> float:
        return self.snap_radius

    def min_edge_vertex_separation(self) -> float:
        return 0.5 * self.snap_radius


class CellIdSnapFunction:
    """Snaps vertices to S2Cell centers at a level
    (S2BuilderSnapFunctions.S2CellIdSnapFunction)."""

    def __init__(self, level: int, snap_radius: float | None = None):
        if not 0 <= level <= 30:
            raise ValueError("level out of range")
        self.level = int(level)
        self._min_radius = (
            0.5 * sphere.metric_value(sphere.MAX_DIAG_DERIV, level)
            + 4.0 * DBL_EPSILON
        )
        self.snap_radius = self._min_radius if snap_radius is None else float(snap_radius)
        if self.snap_radius < self._min_radius:
            raise ValueError("snap_radius below the minimum for this level")

    def snap(self, points: np.ndarray) -> np.ndarray:
        p = np.atleast_2d(points)
        ids = ci.xyz_to_cell_id(p[:, 0], p[:, 1], p[:, 2], self.level)
        x, y, z = ci.cell_id_to_xyz(ids)
        return np.stack([x, y, z], axis=1)

    def min_vertex_separation(self) -> float:
        # max of the constant / proportional / asymptotic bounds
        # (S2BuilderSnapFunctions.java:215-240)
        min_edge = sphere.metric_value(sphere.MIN_EDGE_DERIV, self.level)
        max_diag = sphere.metric_value(sphere.MAX_DIAG_DERIV, self.level)
        return max(
            min_edge,
            0.548 * self.snap_radius,
            self.snap_radius - 0.5 * max_diag,
        )

    def min_edge_vertex_separation(self) -> float:
        min_diag = sphere.metric_value(sphere.MIN_DIAG_DERIV, self.level)
        if self.snap_radius == self._min_radius:
            return 0.565 * min_diag
        sep = self.min_vertex_separation()
        return max(
            0.397 * min_diag,
            0.219 * self.snap_radius,
            sep * (0.5 * sep / self.snap_radius),
        )


class IntLatLngSnapFunction:
    """Snaps to E(exponent) lat/lng integer coordinates
    (S2BuilderSnapFunctions.IntLatLngSnapFunction); exponent 7 == E7."""

    def __init__(self, exponent: int, snap_radius: float | None = None):
        if not 0 <= exponent <= 10:
            raise ValueError("exponent out of range")
        self.exponent = int(exponent)
        self._scale = 10.0 ** exponent
        # min radius ~ (10^-e degrees) / sqrt(2), plus rounding guards
        self._min_radius = (
            np.radians(1.0 / self._scale) * (1.0 / np.sqrt(2.0))
            + 2.0 * DBL_EPSILON
        )
        self.snap_radius = self._min_radius if snap_radius is None else float(snap_radius)

    def snap(self, points: np.ndarray) -> np.ndarray:
        p = np.atleast_2d(points)
        lat, lng = ci.xyz_to_latlng(p[:, 0], p[:, 1], p[:, 2])
        # Math.round (half-up), not banker's, to match the reference
        lat_d = np.floor(np.degrees(lat) * self._scale + 0.5) / self._scale
        lng_d = np.floor(np.degrees(lng) * self._scale + 0.5) / self._scale
        x, y, z = ci.latlng_to_xyz(np.radians(lat_d), np.radians(lng_d))
        return np.stack([x, y, z], axis=1)

    def min_vertex_separation(self) -> float:
        return (1.0 / np.sqrt(2.0)) * self.snap_radius

    def min_edge_vertex_separation(self) -> float:
        return 0.219 * self.snap_radius


# ---------------------------------------------------------------------------
# builder core
# ---------------------------------------------------------------------------


def _sort_key(points: np.ndarray) -> np.ndarray:
    """Deterministic vertex processing order: leaf cell id, then the point
    itself (S2Builder.sortInputVertices)."""
    leaf = ci.xyz_to_cell_id(points[:, 0], points[:, 1], points[:, 2], 30)
    return np.lexsort((points[:, 2], points[:, 1], points[:, 0], leaf.astype(np.int64) ^ np.int64(-0x8000000000000000)))


class Graph:
    """Snap output: unique sites + per-layer directed site-id edges +
    per-input-edge site chains (the S2BuilderGraph surface our layers
    need)."""

    def __init__(self, sites: np.ndarray, chains: list[list[int]],
                 layers: np.ndarray, simplify_tolerance: float | None = None,
                 labels: np.ndarray | None = None):
        self.sites = sites
        self.chains = chains
        self.layers = layers
        #: per input-edge label (-1 = unlabeled), aligned with chains
        self.labels = (
            labels if labels is not None
            else np.full(len(chains), -1, dtype=np.int64)
        )
        #: set when the builder ran with simplify_edge_chains; the default
        #: tolerance for simplified_layer_edges
        self.simplify_tolerance = simplify_tolerance

    def layer_edges(self, layer: int, dedupe: bool = True) -> list[tuple[int, int]]:
        """Directed (src_site, dst_site) pairs of one layer; degenerate
        chain steps removed; duplicates merged when ``dedupe``."""
        out = []
        seen = set()
        for chain, lay in zip(self.chains, self.layers):
            if lay != layer:
                continue
            for s, e in zip(chain, chain[1:]):
                if s == e:
                    continue
                if dedupe:
                    if (s, e) in seen:
                        continue
                    seen.add((s, e))
                out.append((s, e))
        return out

    def lax_edges(self, layer: int) -> list[tuple[int, int]]:
        """Directed (src_site, dst_site) pairs of one layer with
        degeneracies PRESERVED: a degenerate input edge (single-site
        chain) becomes a (s, s) edge, duplicates are kept — the input
        surface for kernel.laxlayers (the reference's lax layers receive
        the unfiltered graph and apply their own GraphOptions)."""
        out = []
        for chain, lay in zip(self.chains, self.layers):
            if lay != layer:
                continue
            if len(chain) == 1:
                out.append((chain[0], chain[0]))
            else:
                out.extend(zip(chain, chain[1:]))
        return out

    def layer_edges_with_labels(
        self, layer: int
    ) -> dict[tuple[int, int], list[int]]:
        """Directed (src_site, dst_site) -> sorted list of input-edge
        labels that produced it (S2BuilderGraph.LabelFetcher semantics):
        every input edge contributing a snapped sub-edge adds its label;
        duplicate input edges merge their labels; -1 (unlabeled) inputs
        are skipped in the lists but still create entries."""
        out: dict[tuple[int, int], set[int]] = {}
        for chain, lay, lbl in zip(self.chains, self.layers, self.labels):
            if lay != layer:
                continue
            for s, e in zip(chain, chain[1:]):
                if s == e:
                    continue
                labels = out.setdefault((s, e), set())
                if int(lbl) >= 0:
                    labels.add(int(lbl))
        return {k: sorted(v) for k, v in out.items()}

    def simplified_layer_edges(self, layer: int, tolerance: float | None = None
                               ) -> list[tuple[int, int]]:
        """simplifyEdgeChains (S2Builder.java:20-80) over one layer's
        output graph: maximal paths of DEGREE-2 sites (degree counted
        across ALL layers, so split crossings, shared vertices and
        multi-layer junctions are always kept) are subsampled with
        S2Polyline.subsampleVertices under ``tolerance`` (defaults to the
        builder's snap radius recorded at build time). Every removed site
        lies within the tolerance of the replacement edge — the
        reference's simplification guarantee; vertices are never moved."""
        from . import simplify as simp

        tol = self.simplify_tolerance if tolerance is None else float(tolerance)
        if tol is None:
            raise ValueError("no tolerance: build with simplify_edge_chains"
                             " or pass tolerance=")
        edges = self.layer_edges(layer, dedupe=True)
        if not edges:
            return edges
        # degree across ALL layers (undirected, deduped)
        from collections import defaultdict

        deg: dict[int, set] = defaultdict(set)
        for lay in set(int(l) for l in self.layers):
            for s, e in self.layer_edges(lay, dedupe=True):
                deg[s].add((min(s, e), max(s, e)))
                deg[e].add((min(s, e), max(s, e)))
        nbrs: dict[int, list[int]] = defaultdict(list)
        for s, e in edges:
            nbrs[s].append(e)
            nbrs[e].append(s)
        removable = {
            v for v in nbrs
            if len(deg[v]) == 2 and len(nbrs[v]) == 2
        }
        out: list[tuple[int, int]] = []
        visited = set()

        def walk(start, first):
            """Follow removable degree-2 sites from start through first."""
            path = [start, first]
            while path[-1] in removable and path[-1] != start:
                a, b = nbrs[path[-1]]
                nxt = b if a == path[-2] else a
                path.append(nxt)
            return path

        for s, e in edges:
            key = (min(s, e), max(s, e))
            if key in visited:
                continue
            if s in removable and e in removable:
                continue  # reached from a path endpoint later
            if s in removable:
                s, e = e, s  # start from the junction end
            if e not in removable:
                visited.add(key)
                out.append((s, e))
                continue
            path = walk(s, e)
            for u, v in zip(path, path[1:]):
                visited.add((min(u, v), max(u, v)))
            keep = simp.subsample_vertices(
                self.sites[np.asarray(path, dtype=np.int64)], tol
            )
            kept = [path[k] for k in keep]
            if kept[-1] != path[-1]:
                kept.append(path[-1])
            out.extend(zip(kept, kept[1:]))
        # isolated all-removable cycles (closed degree-2 loops): anchor at
        # the smallest site id and subsample the ring
        for s, e in edges:
            key = (min(s, e), max(s, e))
            if key in visited:
                continue
            ring = walk(s, e)
            for u, v in zip(ring, ring[1:]):
                visited.add((min(u, v), max(u, v)))
            cyc = ring[:-1] if ring[0] == ring[-1] else ring
            amin = int(np.argmin(cyc))
            cyc = cyc[amin:] + cyc[:amin]
            pts = self.sites[np.asarray(cyc + [cyc[0]], dtype=np.int64)]
            keep = simp.subsample_vertices(pts, tol)
            kept = [(cyc + [cyc[0]])[k] for k in keep]
            if kept[-1] != kept[0]:
                kept.append(kept[0])
            if len(kept) > 3:
                out.extend(zip(kept, kept[1:]))
            else:
                out.extend(zip(ring, ring[1:]))  # too small to simplify
        return out


def _coverage_intervals(cand_pts: np.ndarray, x: np.ndarray, y: np.ndarray,
                        r_chord2: float):
    """Arc-parameter intervals of edge XY covered by each site's
    snap-radius disc (S2Builder.getCoverageEndpoint geometry): the edge is
    parametrized by angle theta from X toward Y; site p covers
    theta in [phi - delta, phi + delta] clipped to [0, theta_max], where
    phi is the arc parameter of p's projection and delta comes from the
    law of cosines on the coverage chord. Returns (lo, hi) arrays; empty
    intervals have lo > hi."""
    t = y - float(y @ x) * x
    tn = float(np.sqrt(t @ t))
    if tn == 0.0:
        z = np.zeros(len(cand_pts))
        return z, z - 1.0
    t = t / tn
    theta_max = float(np.arctan2(y @ t, y @ x))
    px = cand_pts @ x
    pt = cand_pts @ t
    R = np.hypot(px, pt)
    phi = np.arctan2(pt, px)
    # Want cos(theta - phi) >= (1 - r2/2) / R, i.e. 1 - cos(delta) <= u
    # with u = 1 - (1 - r2/2)/R. Computed stably: R - 1 = -pn^2/(R+1)
    # where pn is the site's component normal to the edge plane (unit
    # vectors: px^2 + pt^2 + pn^2 = 1), so u = (r2/2 - pn^2/(R+1)) / R —
    # no 1-ulp cancellation, and delta = 2*asin(sqrt(u/2)) stays accurate
    # down to delta ~ 1e-15 (plain arccos floors at ~1e-8).
    pn2 = np.maximum(0.0, 1.0 - (px * px + pt * pt))
    with np.errstate(divide="ignore", invalid="ignore"):
        u = (0.5 * r_chord2 - pn2 / (R + 1.0)) / R
    empty = u < 0.0
    delta = 2.0 * np.arcsin(np.sqrt(np.clip(u, 0.0, 2.0) / 2.0))
    lo = np.maximum(phi - delta, 0.0)
    hi = np.minimum(phi + delta, theta_max)
    lo = np.where(empty, 1.0, lo)
    hi = np.where(empty, 0.0, hi)
    return lo, hi


def _voronoi_filter(S: np.ndarray, cand: list[int], d2_cand: np.ndarray,
                    x: np.ndarray, y: np.ndarray, r_chord2: float) -> list[int]:
    """S2Builder.snapEdge's Voronoi site exclusion over an ordered
    candidate list (S2Builder.java:1588-1701): a site whose coverage
    interval on XY is contained in another's cannot have its Voronoi
    region intersect the edge and is dropped
    (S2Predicates.getVoronoiSiteExclusion); a site B is also dropped when
    the circumcenter of (A, B, C) for its neighbors lies on the opposite
    side of XY (the two adjacent Voronoi regions shadow B's).
    ``d2_cand``: chord2 from each candidate to the edge (tie-break)."""
    from . import predicates

    pts = S[np.asarray(cand, dtype=np.int64)]
    lo, hi = _coverage_intervals(pts, x, y, r_chord2)
    # Exact escalation (S2Predicates.getVoronoiSiteExclusion's
    # triage->exact cascade): when a float endpoint comparison is within
    # VORONOI_TIE_EPS of a tie, re-decide it with rational arithmetic
    # (kernel/exactcover.py). Scope: the exact parametrization needs the
    # edge to span < pi/2; longer edges keep the float decision.
    exact_ok = float(np.dot(x, y)) > 1e-6

    def contains(i, j) -> bool:
        # interval of cand[i] contains interval of cand[j]
        if exact_ok and (
            abs(lo[i] - lo[j]) < VORONOI_TIE_EPS
            or abs(hi[j] - hi[i]) < VORONOI_TIE_EPS
        ):
            from . import exactcover

            return exactcover.exact_contains(pts[i], pts[j], x, y, r_chord2)
        return lo[i] <= lo[j] and hi[j] <= hi[i]

    def s1(u, v, w) -> int:
        return int(
            predicates.sign_batch(u[None, :], v[None, :], w[None, :])[0]
        )

    chain: list[int] = []  # indices into cand
    for ci in range(len(cand)):
        add_c = True
        while chain:
            bi = chain[-1]
            b_in_c = contains(ci, bi)
            c_in_b = contains(bi, ci)
            if b_in_c and c_in_b:
                # identical coverage: keep the site nearer the edge
                if d2_cand[bi] > d2_cand[ci]:
                    chain.pop()
                    continue
                add_c = False
                break
            if b_in_c:
                chain.pop()
                continue
            if c_in_b:
                add_c = False
                break
            if len(chain) >= 2:
                ai = chain[-2]
                a_p, b_p, c_p = pts[ai], pts[bi], pts[ci]
                # A too far from C to clip B's Voronoi region
                # (maxAdjacentSiteSeparation guard, S2Builder.java:1668)
                ac2 = float(((a_p - c_p) ** 2).sum())
                if ac2 >= 4.0 * r_chord2:
                    break
                xyb = s1(x, y, b_p)
                abc = s1(a_p, b_p, c_p)
                if abc != xyb and xyb != 0 and abc != 0:
                    # circumcenter of ABC (plane-normal direction through
                    # the three sites) vs the XY great circle
                    z = np.cross(b_p - a_p, c_p - a_p)
                    zn = float(np.sqrt(z @ z))
                    if zn > 1e-30:
                        z = z / zn
                        if float(z @ b_p) < 0:
                            z = -z
                        if s1(x, y, z) != xyb:
                            chain.pop()
                            continue
            break
        if add_c:
            chain.append(ci)
    return [cand[i] for i in chain]


class SnapBuilder:
    """Gathers edges, snaps them onto a shared site set, returns a Graph.

    ``voronoi_exclusion`` (default True) applies the reference's snapEdge
    site-exclusion rules, so near-coincident sites along an edge keep the
    separation guarantees instead of all landing in the chain.
    ``simplify_edge_chains`` mirrors S2Builder's simplifyEdgeChains
    option (S2Builder.java:20-80): after snapping, each input edge's site
    chain is subsampled (S2Polyline.subsampleVertices) under the snap
    radius, keeping every junction site shared with another input edge,
    so topology at shared vertices is preserved and the simplified chain
    deviates from the snapped one by at most the snap radius."""

    def __init__(self, snap_function=None, split_crossing_edges: bool = False,
                 voronoi_exclusion: bool = True,
                 simplify_edge_chains: bool = False):
        self.snap_function = snap_function or IdentitySnapFunction(0.0)
        self.split_crossing_edges = split_crossing_edges
        self.voronoi_exclusion = voronoi_exclusion
        self.simplify_edge_chains = simplify_edge_chains
        self._a: list[np.ndarray] = []
        self._b: list[np.ndarray] = []
        self._layers: list[int] = []
        self._labels: list[int] = []

    def add_edge(self, a: np.ndarray, b: np.ndarray, layer: int = 0,
                 label: int = -1) -> None:
        # label: opaque input-edge label surviving snapping
        # (S2Builder.setLabel / S2BuilderGraph label sets); -1 = unlabeled
        self._a.append(np.asarray(a, dtype=np.float64))
        self._b.append(np.asarray(b, dtype=np.float64))
        self._layers.append(layer)
        self._labels.append(int(label))

    def add_loop(self, vertices: np.ndarray, layer: int = 0,
                 label: int = -1) -> None:
        v = np.asarray(vertices, dtype=np.float64)
        for k in range(len(v)):
            self.add_edge(v[k], v[(k + 1) % len(v)], layer, label=label)

    def add_polyline(self, vertices: np.ndarray, layer: int = 0,
                     label: int = -1) -> None:
        v = np.asarray(vertices, dtype=np.float64)
        for k in range(len(v) - 1):
            self.add_edge(v[k], v[k + 1], layer, label=label)

    # -- crossings ----------------------------------------------------------

    def _crossing_points(self, A: np.ndarray, B: np.ndarray) -> np.ndarray:
        """Interior crossing points over all edge pairs (splitCrossingEdges,
        S2Builder.addEdgeCrossings). Pairs sharing a vertex or lying on one
        great circle contribute nothing here — shared vertices are already
        sites, and collinear-overlap endpoints reach the chains through the
        vertex-near-edge snap. The all-pairs four-sign test runs as chunked
        sign_batch sweeps (vectorized; exact arithmetic only on the
        escalation residue), so ~10^3-edge inputs (buffer offset curves)
        stay fast."""
        n = len(A)
        if n < 2:
            return np.zeros((0, 3))
        if n > 1500:
            # large inputs: enumerate only CO-LOCATED pairs via the
            # edge-soup cell index (complete: a crossing point lies in
            # exactly one index cell, and both edges intersect that cell,
            # so the pair shares a cell) instead of the O(n^2) triangle
            from . import shapeindex as si

            rows = si.build_edge_soup_index(A, B, max_edges_per_cell=24)
            pair_set = set()
            for _, eids, _ins in rows:
                if len(eids) < 2:
                    continue
                e = np.sort(eids)
                pi, pj = np.triu_indices(len(e), k=1)
                for a_, b_ in zip(e[pi], e[pj]):
                    pair_set.add((int(a_), int(b_)))
            if not pair_set:
                return np.zeros((0, 3))
            arr = np.array(sorted(pair_set), dtype=np.int64)
            ii, jj = arr[:, 0], arr[:, 1]
        else:
            ii, jj = np.triu_indices(n, k=1)
        pts = []
        chunk = 200_000
        # chord-length prefilter: two edges can only cross if their start
        # points are within len_i + len_j of each other (Euclidean/chord
        # triangle inequality) — prunes the quadratic pair set to the
        # local neighborhoods before any sign evaluation
        L = np.sqrt(((A - B) ** 2).sum(axis=1))
        for lo in range(0, len(ii), chunk):
            i = ii[lo : lo + chunk]
            j = jj[lo : lo + chunk]
            near = ((A[i] - A[j]) ** 2).sum(axis=1) <= (
                (L[i] + L[j]) ** 2 + 64.0 * DBL_EPSILON
            )
            keep0 = np.nonzero(near)[0]
            if not len(keep0):
                continue
            i, j = i[keep0], j[keep0]
            a, b, c, d = A[i], B[i], A[j], B[j]
            shared = (
                np.all(a == c, axis=1)
                | np.all(a == d, axis=1)
                | np.all(b == c, axis=1)
                | np.all(b == d, axis=1)
            )
            # drop shared-vertex pairs BEFORE the sign sweep: their
            # degenerate triples would all escalate to exact arithmetic
            # just to be masked out of `cross` afterwards
            keep = np.nonzero(~shared)[0]
            if not len(keep):
                continue
            a, b, c, d = a[keep], b[keep], c[keep], d[keep]
            acb = predicates.sign_batch(a, c, b)
            bda = predicates.sign_batch(b, d, a)
            cbd = predicates.sign_batch(c, b, d)
            dac = predicates.sign_batch(d, a, c)
            cross = (acb == bda) & (acb == cbd) & (acb == dac) & (acb != 0)
            for k in np.nonzero(cross)[0]:
                # exclude same-great-circle (SoS classifies overlap as
                # crossing, but there is no single intersection point)
                if (
                    predicates._exact_sign_one(a[k], b[k], c[k], perturb=False) == 0
                    and predicates._exact_sign_one(a[k], b[k], d[k], perturb=False) == 0
                ):
                    continue
                pts.append(
                    ek.edge_intersection(
                        a[k][None], b[k][None], c[k][None], d[k][None]
                    )[0]
                )
        if not pts:
            return np.zeros((0, 3))
        return np.asarray(pts)

    # -- build --------------------------------------------------------------

    def build(self) -> Graph:
        if not self._a:
            return Graph(np.zeros((0, 3)), [], np.zeros(0, dtype=np.int64))
        A = np.stack(self._a)
        B = np.stack(self._b)
        layers = np.asarray(self._layers, dtype=np.int64)
        fn = self.snap_function

        forced = (
            self._crossing_points(A, B)
            if self.split_crossing_edges
            else np.zeros((0, 3))
        )

        # ---- site selection (snap first) ----
        # crossing points are ordinary input vertices (the reference's
        # addEdgeCrossings feeds them through the same site selection), so
        # near-coincident crossings — e.g. two edges meeting ON a third
        # edge — merge under minVertexSeparation like any other vertices
        verts = np.concatenate([A, B, forced], axis=0) if len(forced) else np.concatenate([A, B], axis=0)
        snapped = fn.snap(verts)
        sep2 = float(sphere.chord2_from_angle(fn.min_vertex_separation())) if fn.min_vertex_separation() > 0 else 0.0
        # greedy admission in deterministic order, with a cell spatial
        # hash: a new vertex can only merge with sites within the
        # separation chord, which all lie in its 3x3 cell ring at a level
        # whose min width is >= twice the separation angle — so each
        # admission checks a handful of bucketed sites, not every site
        # so far (the plain loop is O(V^2))
        buf = np.empty((len(verts), 3))
        cnt = 0
        if sep2 > 0.0:
            sep_angle = float(sphere.angle_from_chord2(sep2))
            hashL = max(
                0, min(30, sphere.metric_max_level(
                    sphere.MIN_WIDTH_DERIV, 2.0 * sep_angle))
            )
        else:
            hashL = 30
        vcell = ci.xyz_to_cell_id(
            snapped[:, 0], snapped[:, 1], snapped[:, 2], hashL
        )
        vnbrs = ci.get_all_neighbors_same_level(vcell)
        buckets: dict[int, list[int]] = {}
        for k in _sort_key(verts):
            p = snapped[k]
            cand: list[int] = []
            ck = int(vcell[k])
            for c in (ck, *map(int, vnbrs[k])):
                got = buckets.get(c)
                if got:
                    cand.extend(got)
            if cand:
                d2 = ((buf[np.asarray(cand)] - p[None, :]) ** 2).sum(axis=1)
                if (d2 <= sep2).any():
                    continue
            buckets.setdefault(ck, []).append(cnt)
            buf[cnt] = p
            cnt += 1
        S = buf[:cnt].copy()

        # ---- edge snapping (vectorized over edges) ----
        edge_r = fn.snap_radius + INTERSECTION_ERROR if self.split_crossing_edges else fn.snap_radius
        edge_r2 = float(sphere.chord2_from_angle(edge_r)) + 16.0 * DBL_EPSILON

        snapA = fn.snap(A)
        snapB = fn.snap(B)
        n_e = len(A)
        n_s = len(S)
        chains: list[list[int]] = []
        # chunk edges so the (blk, n_s) distance matrices stay ~4M entries
        blk = max(1, 4_000_000 // max(n_s, 1))
        rcp_all = ek.robust_cross_prod(A, B)
        for lo in range(0, n_e, blk):
            hi = min(n_e, lo + blk)
            Sx = S[None, :, :]
            sx_blk = (
                ((snapA[lo:hi, None, :] - Sx) ** 2).sum(axis=-1).argmin(axis=1)
            )
            sy_blk = (
                ((snapB[lo:hi, None, :] - Sx) ** 2).sum(axis=-1).argmin(axis=1)
            )
            # site-to-edge near matrix (blk, n_s). Cheap prefilter first:
            # by the chord (Euclidean) triangle inequality a site within
            # edge_r of edge AB must lie within edge_r + |AB| of A, so the
            # expensive interior-distance formula only runs on the sparse
            # survivor pairs.
            d2_a = ((A[lo:hi, None, :] - Sx) ** 2).sum(axis=-1)
            elen = np.sqrt(((A[lo:hi] - B[lo:hi]) ** 2).sum(axis=-1))
            thresh = (np.sqrt(edge_r2) + elen) ** 2 + 64.0 * DBL_EPSILON
            cand_e, cand_s = np.nonzero(d2_a <= thresh[:, None])
            near = np.zeros(d2_a.shape, dtype=bool)
            nearval = np.full(d2_a.shape, np.inf)
            if len(cand_e):
                d2_pairs = ek.min_chord2_to_edges(
                    S[cand_s],
                    A[lo + cand_e],
                    B[lo + cand_e],
                    c=rcp_all[lo + cand_e],
                )
                nearval[cand_e, cand_s] = d2_pairs
                near[cand_e, cand_s] = d2_pairs <= edge_r2
            ncand = near.sum(axis=1)
            for i in range(lo, hi):
                a, b = A[i], B[i]
                sx = int(sx_blk[i - lo])
                sy = int(sy_blk[i - lo])
                # fast path: the only nearby sites are the edge's own
                # endpoint sites — no ordering or exclusion can change a
                # 2-site chain (the endpoints are always forced), and
                # this is the overwhelmingly common case
                if ncand[i - lo] <= 2:
                    c0 = np.nonzero(near[i - lo])[0]
                    if all(int(c) in (sx, sy) for c in c0):
                        chains.append([sx, sy] if sx != sy else [sx])
                        continue
                cand = np.nonzero(near[i - lo])[0]
                # order candidates by arc parameter along AB: angle of the
                # projection within the (a, t) tangent frame
                t = b - float(b @ a) * a
                tn = float(np.sqrt(t @ t))
                if tn == 0.0:
                    chains.append([sx, sy] if sx != sy else [sx])
                    continue
                t = t / tn
                order = np.arctan2(S[cand] @ t, S[cand] @ a)
                cand = [int(c) for c in cand[np.argsort(order, kind="stable")]]
                if self.voronoi_exclusion and len(cand) > 1:
                    d2c = nearval[i - lo][np.asarray(cand, dtype=np.int64)]
                    cand = _voronoi_filter(S, cand, d2c, a, b, edge_r2)
                chain = [sx] + [c for c in cand if c != sx and c != sy] + (
                    [sy] if sy != sx else []
                )
                # drop consecutive duplicates (paranoia; ids are unique here)
                dedup = [chain[0]]
                for c in chain[1:]:
                    if c != dedup[-1]:
                        dedup.append(c)
                chains.append(dedup)
        tol = (
            float(self.snap_function.snap_radius)
            if self.simplify_edge_chains
            else None
        )
        return Graph(S, chains, layers, simplify_tolerance=tol,
                     labels=np.asarray(self._labels, dtype=np.int64))



# ---------------------------------------------------------------------------
# polygon layer: loop assembly via the region-on-the-left face walk
# ---------------------------------------------------------------------------


def assemble_polylines(
    sites: np.ndarray, edges: list[tuple[int, int]]
) -> list[np.ndarray]:
    """Chain directed (src, dst) site edges into maximal polylines (the
    S2PolylineLayer surface): chains start at sites with more unused
    outgoing than incoming edges (path endpoints), then at arbitrary
    (smallest-id) sites for leftover cycles; within a chain the smallest
    unused successor is taken, so output is deterministic."""
    from collections import defaultdict

    out_adj: dict[int, list[int]] = defaultdict(list)
    in_deg: dict[int, int] = defaultdict(int)
    out_deg: dict[int, int] = defaultdict(int)
    for s, e in edges:
        out_adj[s].append(e)
        out_deg[s] += 1
        in_deg[e] += 1
    for dsts in out_adj.values():
        dsts.sort()
    used = set()
    lines: list[np.ndarray] = []

    def walk(start: int):
        path = [start]
        cur = start
        while True:
            nxt = None
            for w in out_adj.get(cur, ()):  # smallest unused successor
                if (cur, w) not in used:
                    nxt = w
                    break
            if nxt is None:
                break
            used.add((cur, nxt))
            path.append(nxt)
            cur = nxt
        return path

    starts = sorted(
        v for v in out_adj if out_deg[v] > in_deg.get(v, 0)
    )
    for v in starts:
        while any((v, w) not in used for w in out_adj.get(v, ())):
            path = walk(v)
            if len(path) > 1:
                lines.append(np.asarray([sites[p] for p in path]))
    # leftover cycles
    for s, e in sorted(edges):
        if (s, e) not in used:
            path = walk(s)
            if len(path) > 1:
                lines.append(np.asarray([sites[p] for p in path]))
    return lines


def assemble_loops(sites: np.ndarray, edges: list[tuple[int, int]]) -> list[np.ndarray]:
    """Chain directed (src, dst) site edges into closed loops. At each vertex
    the walk takes the first outgoing edge CLOCKWISE of the reversed
    incoming direction (tangent-plane bearings), which keeps the enclosed
    region on the left through any-degree snap sites — the face traversal
    S2BuilderGraph's polygon layers perform. Input edges must form closed
    boundaries (every site has out-degree == in-degree)."""
    if not edges:
        return []
    out_adj: dict[int, list[int]] = {}
    for s, e in edges:
        out_adj.setdefault(s, []).append(e)

    frames: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def frame(v: int):
        fr = frames.get(v)
        if fr is None:
            e1 = predicates.ortho(sites[v])
            e2 = np.cross(sites[v], e1)
            frames[v] = fr = (e1, e2)
        return fr

    def bearing(v: int, w_point: np.ndarray) -> float:
        e1, e2 = frame(v)
        d = w_point - float(w_point @ sites[v]) * sites[v]
        return float(np.arctan2(d @ e2, d @ e1))

    unused = set()
    dup = False
    for e in edges:
        if e in unused:
            dup = True
        unused.add(e)
    if dup or len(unused) != len(edges):
        raise ValueError("duplicate directed edges; dedupe before assembly")

    loops: list[np.ndarray] = []
    for start in sorted(unused):
        if start not in unused:
            continue
        path = [start]
        unused.discard(start)
        guard = len(edges) + 1
        while True:
            u, v = path[-1]
            theta_in = bearing(v, sites[u])
            best, best_delta = None, None
            for w in out_adj.get(v, ()):  # pick first edge clockwise of v->u
                if (v, w) != start and (v, w) not in unused:
                    continue
                delta = (theta_in - bearing(v, sites[w])) % (2.0 * np.pi)
                if delta == 0.0:
                    delta = 2.0 * np.pi  # the pure U-turn is the last resort
                if best_delta is None or delta < best_delta:
                    best, best_delta = (v, w), delta
            if best is None:
                raise ValueError("boundary did not close (open edge chain)")
            if best == start:
                break
            path.append(best)
            unused.discard(best)
            guard -= 1
            if guard == 0:
                raise ValueError("assembly walk did not terminate")
        loops.append(np.asarray([sites[s] for s, _ in path]))
    return loops
