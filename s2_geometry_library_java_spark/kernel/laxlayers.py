"""Lax builder layers: assemble snapped edge graphs into shapes that KEEP
degeneracies (point loops, sibling-pair edge loops) instead of discarding
them like the regularized polygon layer.

Reference surface re-expressed here:

- GraphOptions edge processing (S2BuilderGraph.java:2554-2800
  EdgeProcessor.run): DegenerateEdges DISCARD / DISCARD_EXCESS / KEEP,
  SiblingPairs DISCARD / DISCARD_EXCESS / KEEP, DuplicateEdges MERGE /
  KEEP — directed edges only (the reference's lax polygon layer is also
  directed-only, S2LaxPolygonLayer.java:160-165).
- S2PolygonDegeneracyFinder.java:82-470 (findPolygonDegeneracies /
  isFullyDegenerate): classify every degenerate edge / sibling pair as a
  degenerate SHELL (in the polygon's exterior) or HOLE (interior).
- S2ContainsVertexQuery.java:107-168 (semi-open containment sign from the
  edges incident to a vertex).
- S2LaxPolygonLayer.java:120-270 (DegenerateBoundaries KEEP / DISCARD /
  DISCARD_HOLES / DISCARD_SHELLS over directed loops).
- S2PointVectorLayer.java:37-90 (degenerate edges -> point vector).
- S2PolylineVectorLayer.java:51-120 (edges -> polyline vector, PATH walk).

A loop is a list of site ids; the EMPTY list is the full loop
(S2LaxPolygonShape.create's zero-vertex loop convention). Everything here
is a per-shape kernel: at scale it runs executor-side inside the same
Arrow batches as the boolean/builder kernels.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np

from . import predicates

DISCARD = "DISCARD"
DISCARD_EXCESS = "DISCARD_EXCESS"
KEEP = "KEEP"
MERGE = "MERGE"
DISCARD_HOLES = "DISCARD_HOLES"
DISCARD_SHELLS = "DISCARD_SHELLS"


# ---------------------------------------------------------------------------
# GraphOptions edge processing (directed)
# ---------------------------------------------------------------------------

def process_edges(
    edges: list[tuple[int, int]],
    degenerate_edges: str = KEEP,
    sibling_pairs: str = KEEP,
    duplicate_edges: str = KEEP,
) -> list[tuple[int, int]]:
    """S2BuilderGraph.EdgeProcessor.run (S2BuilderGraph.java:2624-2800),
    directed edges: returns the transformed edge multiset in lexicographic
    order. Label-set merging is not modeled (layers here return site ids,
    not label sets)."""
    cnt = Counter(edges)
    incident_nondegen: set[int] = set()
    for (a, b), _n in cnt.items():
        if a != b:
            incident_nondegen.add(a)
            incident_nondegen.add(b)
    out: list[tuple[int, int]] = []
    for (a, b) in sorted(cnt):
        n_out = cnt[(a, b)]
        if a == b:
            if degenerate_edges == DISCARD:
                continue
            if degenerate_edges == DISCARD_EXCESS and a in incident_nondegen:
                continue  # connected to a non-degenerate edge
            merge = duplicate_edges == MERGE or degenerate_edges == DISCARD_EXCESS
            out.extend([(a, b)] * (1 if merge else n_out))
        elif sibling_pairs == KEEP:
            out.extend([(a, b)] * (1 if duplicate_edges == MERGE else n_out))
        else:
            n_in = cnt.get((b, a), 0)
            if sibling_pairs == DISCARD:
                if n_out <= n_in:
                    continue
                keep = 1 if duplicate_edges == MERGE else n_out - n_in
            else:  # DISCARD_EXCESS: keep one pair if it would vanish
                if n_out < n_in:
                    continue
                keep = 1 if duplicate_edges == MERGE else max(1, n_out - n_in)
            out.extend([(a, b)] * keep)
    return out


def is_fully_degenerate(edges: list[tuple[int, int]]) -> bool:
    """S2PolygonDegeneracyFinder.isFullyDegenerate: every edge is either
    degenerate or has a sibling."""
    present = set(edges)
    return all(a == b or (b, a) in present for a, b in edges)


# ---------------------------------------------------------------------------
# contains-vertex sign (semi-open model)
# ---------------------------------------------------------------------------

def contains_vertex_sign(
    target: np.ndarray, outgoing: list[np.ndarray], incoming: list[np.ndarray]
) -> int:
    """S2ContainsVertexQuery.safeContainsSign: +1 if the polygon whose
    edges incident to ``target`` are given contains the vertex under the
    semi-open model, -1 if not, 0 if the incident edges are all matched
    sibling pairs."""
    ref = predicates.ortho(target)
    direction: dict[tuple[float, float, float], int] = defaultdict(int)
    pts: dict[tuple[float, float, float], np.ndarray] = {}
    for p in outgoing:
        key = (float(p[0]), float(p[1]), float(p[2]))
        direction[key] += 1
        pts[key] = p
    for p in incoming:
        key = (float(p[0]), float(p[1]), float(p[2]))
        direction[key] -= 1
        pts[key] = p
    best_point = ref
    best_sum = 0
    for key in sorted(direction):
        d = direction[key]
        if d == 0:
            continue  # matched edge
        v = pts[key]
        if predicates.ordered_ccw(ref, best_point, v, target):
            best_point = v
            best_sum = d
    return best_sum


# ---------------------------------------------------------------------------
# polygon degeneracy finder
# ---------------------------------------------------------------------------

def find_polygon_degeneracies(
    sites: np.ndarray,
    edges: list[tuple[int, int]],
    is_full_polygon: bool = False,
) -> list[tuple[int, bool]]:
    """S2PolygonDegeneracyFinder.findPolygonDegeneracies: (edge_index,
    is_hole) for every degenerate edge / sibling pair, sorted by edge
    index. REQUIRES edges processed with DISCARD(_EXCESS) semantics (at
    most one copy of each degeneracy)."""
    n = len(edges)
    if n == 0:
        return []
    present = set(edges)
    is_degen = [a == b or (b, a) in present for a, b in edges]
    num_degen = sum(is_degen)
    if num_degen == 0:
        return []
    if num_degen == n:
        return [(i, bool(is_full_polygon)) for i in range(n)]

    out_adj: dict[int, list[int]] = defaultdict(list)  # v -> edge ids out
    in_adj: dict[int, list[int]] = defaultdict(list)
    unbalanced: set[int] = set()
    for i, (a, b) in enumerate(edges):
        out_adj[a].append(i)
        in_adj[b].append(i)
        if a != b and (b, a) not in present:
            unbalanced.add(a)

    def crossing_parity(v0: int, v1: int, include_same: bool) -> bool:
        # parity of crossings of (v0, v1) with the edges incident to v0
        # (S2PolygonDegeneracyFinder.crossingParity)
        crossings = 0
        p0 = sites[v0]
        p1 = sites[v1]
        p0_ref = predicates.ortho(p0)
        for ei in out_adj.get(v0, ()):  # outgoing from v0
            dst = edges[ei][1]
            if dst == v1:
                crossings += 1 if include_same else 0
            elif predicates.ordered_ccw(p0_ref, sites[dst], p1, p0):
                crossings += 1
        for ei in in_adj.get(v0, ()):  # incoming to v0
            src = edges[ei][0]
            if src == v1:
                crossings += 1 if include_same else 0
            elif predicates.ordered_ccw(p0_ref, sites[src], p1, p0):
                crossings += 1
        return (crossings & 1) != 0

    def vertex_sign(v0: int) -> int:
        return contains_vertex_sign(
            sites[v0],
            [sites[edges[ei][1]] for ei in out_adj.get(v0, ())],
            [sites[edges[ei][0]] for ei in in_adj.get(v0, ())],
        )

    used: set[int] = set()
    components = []  # (root, root_sign, [(edge_id, is_hole_rel_root)])
    known_vertex = -1
    known_sign = 0
    for ei in range(n):
        if not is_degen[ei]:
            continue
        root = edges[ei][0]
        if root in used:
            continue
        degeneracies: list[tuple[int, bool]] = []
        root_sign = 0
        frontier = [(root, True)]
        used.add(root)
        while frontier:
            v0, v0_same_inside = frontier.pop()
            if root_sign == 0 and v0 in unbalanced:
                s = vertex_sign(v0)
                root_sign = s if v0_same_inside else -s
            for eid in out_adj.get(v0, ()):
                v1 = edges[eid][1]
                same_inside = v0_same_inside ^ crossing_parity(v0, v1, False)
                if is_degen[eid]:
                    degeneracies.append((eid, same_inside))
                if v1 in used:
                    continue
                same_inside ^= crossing_parity(v1, v0, True)
                frontier.append((v1, same_inside))
                used.add(v1)
        if root_sign != 0:
            known_vertex = root
            known_sign = root_sign
        components.append([root, root_sign, degeneracies])

    unknown = [c for c in components if c[1] == 0]
    if unknown:
        if known_sign == 0:
            known_vertex = min(unbalanced)
            known_sign = vertex_sign(known_vertex)
        # resolve unknown component signs by crossing parity from the
        # known vertex (computeUnknownSignsBruteForce)
        nd = [i for i in range(n) if not is_degen[i]]
        ea = np.stack([sites[edges[i][0]] for i in nd])
        eb = np.stack([sites[edges[i][1]] for i in nd])
        roots = np.stack([sites[c[0]] for c in unknown])
        crossings = predicates.count_crossings_edges(
            sites[known_vertex], roots, ea, eb
        )
        for c, cr in zip(unknown, crossings):
            inside = (known_sign > 0) ^ bool(cr & 1)
            c[1] = 1 if inside else -1

    result: list[tuple[int, bool]] = []
    for _root, sign, degeneracies in components:
        invert = sign < 0
        for eid, same_inside in degeneracies:
            # same_inside is relative to the component root: when the root
            # is inside the polygon, a same-side degeneracy is a HOLE
            result.append((eid, bool(same_inside ^ invert)))
    return sorted(result)


# ---------------------------------------------------------------------------
# directed loop assembly (LoopType.CIRCUIT)
# ---------------------------------------------------------------------------

def get_directed_loops(
    sites: np.ndarray, edges: list[tuple[int, int]]
) -> list[list[int]]:
    """Partition directed edges into closed loops (site-id lists).
    Degenerate edges become single-vertex loops; sibling pairs become
    two-vertex loops; at junction vertices the walk takes the first
    outgoing edge clockwise of the reversed incoming direction (region on
    the left), matching the polygon layers' face traversal."""
    loops: list[list[int]] = []
    remaining = Counter()
    for a, b in edges:
        if a == b:
            loops.append([a])
        else:
            remaining[(a, b)] += 1
    if not remaining:
        return loops

    out_adj: dict[int, list[int]] = defaultdict(list)
    for (a, b), k in remaining.items():
        if k > 0:
            out_adj[a].append(b)
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

    total = sum(remaining.values())
    for start in sorted(remaining):
        while remaining[start] > 0:
            remaining[start] -= 1
            path = [start]
            guard = total + 1
            while True:
                u, v = path[-1]
                theta_in = bearing(v, sites[u])
                best, best_delta = None, None
                for w in out_adj.get(v, ()):
                    if (v, w) != start and remaining[(v, w)] <= 0:
                        continue
                    delta = (theta_in - bearing(v, sites[w])) % (2.0 * np.pi)
                    if delta == 0.0:
                        delta = 2.0 * np.pi  # pure U-turn is the last resort
                    if best_delta is None or delta < best_delta:
                        best, best_delta = (v, w), delta
                if best is None:
                    raise ValueError("directed edges do not form circuits")
                if best == start:
                    break
                remaining[best] -= 1
                path.append(best)
                guard -= 1
                if guard == 0:
                    raise ValueError("loop walk did not terminate")
            loops.append([s for s, _ in path])
    return loops


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

class LaxPolygonLayer:
    """S2LaxPolygonLayer (S2LaxPolygonLayer.java:120-270): assemble
    directed edges into polygon loops, with degenerate boundaries KEPT,
    DISCARDED, or filtered by shell/hole classification. ``build``
    returns loops as site-id lists; the EMPTY list is the full loop."""

    def __init__(self, degenerate_boundaries: str = KEEP):
        if degenerate_boundaries not in (
            KEEP, DISCARD, DISCARD_HOLES, DISCARD_SHELLS
        ):
            raise ValueError(degenerate_boundaries)
        self.degenerate_boundaries = degenerate_boundaries

    def graph_options(self) -> dict:
        # S2LaxPolygonLayer.graphOptions()
        if self.degenerate_boundaries == DISCARD:
            return dict(degenerate_edges=DISCARD, duplicate_edges=KEEP,
                        sibling_pairs=DISCARD)
        return dict(degenerate_edges=DISCARD_EXCESS, duplicate_edges=KEEP,
                    sibling_pairs=DISCARD_EXCESS)

    def build(
        self,
        sites: np.ndarray,
        edges: list[tuple[int, int]],
        is_full_polygon: bool = False,
    ) -> list[list[int]]:
        g = process_edges(edges, **self.graph_options())
        loops: list[list[int]] = []
        db = self.degenerate_boundaries
        if db == DISCARD:
            if not g and is_full_polygon:
                loops.append([])
        elif db == KEEP:
            if is_fully_degenerate(g) and is_full_polygon:
                loops.append([])
        else:
            discard_holes = db == DISCARD_HOLES
            degeneracies = find_polygon_degeneracies(sites, g, is_full_polygon)
            if len(degeneracies) == len(g):
                if not degeneracies:
                    if is_full_polygon:
                        loops.append([])
                elif degeneracies[0][1]:  # first degeneracy is a hole
                    loops.append([])
            drop = {eid for eid, is_hole in degeneracies
                    if is_hole == discard_holes}
            g = [e for i, e in enumerate(g) if i not in drop]
        loops.extend(get_directed_loops(sites, g))
        return loops


class PointVectorLayer:
    """S2PointVectorLayer.java:37-90: collect degenerate edges as points.
    Raises on non-degenerate edges."""

    def __init__(self, duplicate_edges: str = MERGE):
        self.duplicate_edges = duplicate_edges

    def build(
        self, sites: np.ndarray, edges: list[tuple[int, int]]
    ) -> np.ndarray:
        g = process_edges(
            edges,
            degenerate_edges=KEEP,
            sibling_pairs=KEEP,
            duplicate_edges=self.duplicate_edges,
        )
        ids = []
        for a, b in g:
            if a != b:
                raise ValueError(
                    f"found non-degenerate edge ({a}, {b}) in point layer"
                )
            ids.append(a)
        return sites[np.asarray(ids, dtype=np.int64)] if ids else (
            np.zeros((0, 3))
        )


# ---------------------------------------------------------------------------
# PolylineBuilder (S2BuilderGraph.PolylineBuilder, S2BuilderGraph.java:1157)
# ---------------------------------------------------------------------------

NO_INPUT_EDGE_ID = 2**31 - 2  # S2BuilderGraph.java:79 (Integer.MAX_VALUE - 1)

PATH = "PATH"
WALK = "WALK"
DIRECTED = "DIRECTED"
UNDIRECTED = "UNDIRECTED"


def _build_graph_with_ids(
    input_edges: list[tuple[int, int]],
    edge_type: str,
    degenerate_edges: str,
    sibling_pairs: str,
    duplicate_edges: str,
) -> tuple[list[tuple[int, int]], list[int], list[int] | None]:
    """Build the (sorted edges, minInputEdgeIds, siblingMap) triple the
    reference's PolylineBuilder.init consumes (S2BuilderGraph.java:1185).

    Graph edges are sorted lexicographically with a stable sort over
    input order, so edge ids reproduce the reference graph's edge ids
    and VertexOutMap iteration order. Supported option combos are the
    ones the polyline layers use; others raise ValueError.
    """
    if edge_type == UNDIRECTED:
        if not (sibling_pairs == KEEP and duplicate_edges == KEEP):
            raise ValueError(
                "undirected polyline graphs support only KEEP/KEEP options")
        doubled: list[tuple[int, int, int]] = []
        for i, (a, b) in enumerate(input_edges):
            if a == b and degenerate_edges == DISCARD:
                continue
            # Only the input-direction copy carries the input edge id
            # (S2BuilderGraph.java:1230 comment).
            doubled.append((a, b, i))
            doubled.append((b, a, NO_INPUT_EDGE_ID))
        order = sorted(range(len(doubled)),
                       key=lambda k: (doubled[k][0], doubled[k][1], k))
        edges = [(doubled[k][0], doubled[k][1]) for k in order]
        ids = [doubled[k][2] for k in order]
        # siblingMap: pair each edge with its reversed copy; among
        # duplicates, match i-th (a,b) with i-th (b,a).
        seen: dict[tuple[int, int], list[int]] = defaultdict(list)
        for eid, (a, b) in enumerate(edges):
            seen[(a, b)].append(eid)
        sibling = [0] * len(edges)
        for (a, b), ids_fwd in seen.items():
            if a > b or (a == b):
                continue
            ids_rev = seen[(b, a)]
            for f, r in zip(ids_fwd, ids_rev):
                sibling[f] = r
                sibling[r] = f
        return edges, ids, sibling

    # DIRECTED: apply graph options while tracking min input edge ids.
    cnt = Counter(input_edges)
    per_edge_ids: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, e in enumerate(input_edges):
        per_edge_ids[e].append(i)
    triples: list[tuple[int, int, int]] = []
    for (a, b) in sorted(cnt):
        ids_here = per_edge_ids[(a, b)]
        n_out = cnt[(a, b)]
        if a == b:
            if degenerate_edges == DISCARD:
                continue
            keep = 1 if duplicate_edges == MERGE else n_out
        elif sibling_pairs == KEEP:
            keep = 1 if duplicate_edges == MERGE else n_out
        else:
            n_in = cnt.get((b, a), 0)
            if sibling_pairs == DISCARD:
                if n_out <= n_in:
                    continue
                keep = 1 if duplicate_edges == MERGE else n_out - n_in
            else:  # DISCARD_EXCESS
                if n_out < n_in:
                    continue
                keep = 1 if duplicate_edges == MERGE else max(1, n_out - n_in)
        if duplicate_edges == MERGE:
            triples.append((a, b, min(ids_here)))
        else:
            for inp in sorted(ids_here)[:keep]:
                triples.append((a, b, inp))
    edges = [(a, b) for a, b, _ in triples]
    ids = [i for _, _, i in triples]
    return edges, ids, None


class PolylineBuilder:
    """Exact port of S2BuilderGraph.PolylineBuilder
    (S2BuilderGraph.java:1157-1510): assembles graph edges into PATH
    polylines (break at every vertex whose in/out degree is not 1 —
    buildPaths, :1227) or WALK polylines (each as long as possible,
    loops spliced in — buildWalks, :1282), preserving input edge order
    for idempotency. Runs per-shape inside Arrow batches at scale."""

    def __init__(self, edges: list[tuple[int, int]],
                 min_input_ids: list[int], directed: bool,
                 sibling_map: list[int] | None = None):
        self.edges = edges
        self.ids = min_input_ids
        self.directed = directed
        self.sibling_map = sibling_map
        self.out_map: dict[int, list[int]] = defaultdict(list)
        self.in_map: dict[int, list[int]] = defaultdict(list)
        for eid, (a, b) in enumerate(edges):
            self.out_map[a].append(eid)
            self.in_map[b].append(eid)
        self.edges_left = len(edges) // (1 if directed else 2)
        self.used = [False] * len(edges)
        self.excess_used: dict[int, int] = defaultdict(int)
        # getInputEdgeOrder (S2BuilderGraph.java:417)
        self.input_order = sorted(range(len(edges)),
                                  key=lambda k: (self.ids[k], k))

    def _is_interior(self, v: int) -> bool:
        if self.directed:
            return (len(self.in_map.get(v, ())) == 1
                    and len(self.out_map.get(v, ())) == 1)
        return len(self.out_map.get(v, ())) == 2

    def _excess_degree(self, v: int) -> int:
        out_d = len(self.out_map.get(v, ()))
        if self.directed:
            return out_d - len(self.in_map.get(v, ()))
        return out_d % 2

    def _mark_used(self, eid: int) -> None:
        self.used[eid] = True
        if not self.directed:
            self.used[self.sibling_map[eid]] = True
        self.edges_left -= 1

    def _fill_path(self, eid: int) -> list[int]:
        # fillPath (S2BuilderGraph.java:1405-1441)
        polyline: list[int] = []
        start = self.edges[eid][0]
        while True:
            polyline.append(eid)
            self._mark_used(eid)
            v = self.edges[eid][1]
            if not self._is_interior(v) or v == start:
                break
            if self.directed:
                eid = self.out_map[v][0]
            else:
                for eid2 in self.out_map[v]:  # take the LAST unused
                    if not self.used[eid2]:
                        eid = eid2
        return polyline

    def _fill_walk(self, v: int, polyline: list[int]) -> None:
        # fillWalk (S2BuilderGraph.java:1444-1485)
        polyline.clear()
        while True:
            best_eid = -1
            best_out_id = NO_INPUT_EDGE_ID + 2  # Integer.MAX_VALUE
            for eid in self.out_map.get(v, ()):
                if self.used[eid] or self.ids[eid] >= best_out_id:
                    continue
                best_out_id = self.ids[eid]
                best_eid = eid
            if best_eid < 0:
                return
            excess_unused = self._excess_degree(v) - self.excess_used[v]
            if (excess_unused < 0) if self.directed else (
                    excess_unused % 2 == 1):
                for in_eid in self.in_map.get(v, ()):
                    if (not self.used[in_eid]
                            and self.ids[in_eid] <= best_out_id):
                        return
            polyline.append(best_eid)
            self._mark_used(best_eid)
            v = self.edges[best_eid][1]

    def _maximize_walk(self, polyline: list[int]) -> None:
        # maximizeWalk (S2BuilderGraph.java:1493-1509)
        loop: list[int] = []
        i = 0
        while i <= len(polyline):
            v = (self.edges[polyline[i]][0] if i == 0
                 else self.edges[polyline[i - 1]][1])
            for eid in self.out_map.get(v, ()):
                if not self.used[eid]:
                    self._fill_walk(v, loop)
                    assert self.edges[loop[-1]][1] == v
                    polyline[i:i] = loop
                    break
            i += 1

    def _canonicalize_loop_order(self, loop: list[int]) -> list[int]:
        # canonicalizeLoopOrder (S2BuilderGraph.java:648-683): rotate so
        # the edge(s) with the largest input ids come last.
        if len(loop) < 2:
            return loop
        pos = 0
        saw_gap = False
        for i in range(1, len(loop)):
            cmp = self.ids[loop[i]] - self.ids[loop[pos]]
            if cmp < 0:
                saw_gap = True
            elif cmp > 0 or not saw_gap:
                pos = i
                saw_gap = False
        pos += 1
        if pos == len(loop):
            pos = 0
        return loop[pos:] + loop[:pos]

    def _canonical_chain_sort(self, chains: list[list[int]]) -> None:
        # canonicalizeEdgeChainOrder (S2BuilderGraph.java:709)
        chains.sort(key=lambda c: (self.ids[c[0]], c[0]))

    def build_paths(self) -> list[list[int]]:
        polylines: list[list[int]] = []
        for eid in self.input_order:
            if not self.used[eid] and not self._is_interior(
                    self.edges[eid][0]):
                polylines.append(self._fill_path(eid))
        for eid in self.input_order:  # leftover loops
            if self.edges_left <= 0:
                break
            if self.used[eid]:
                continue
            polylines.append(
                self._canonicalize_loop_order(self._fill_path(eid)))
        assert self.edges_left == 0
        self._canonical_chain_sort(polylines)
        return polylines

    def build_walks(self) -> list[list[int]]:
        # buildWalks (S2BuilderGraph.java:1282-1386)
        polylines: list[list[int]] = []
        for eid in self.input_order:
            if self.used[eid]:
                continue
            v = self.edges[eid][0]
            excess = self._excess_degree(v)
            if excess <= 0:
                continue
            excess -= self.excess_used[v]
            if (excess <= 0) if self.directed else (excess % 2 == 0):
                continue
            self.excess_used[v] += 1
            polyline: list[int] = []
            self._fill_walk(v, polyline)
            polylines.append(polyline)
            self.excess_used[self.edges[polyline[-1]][1]] -= 1
        if self.edges_left > 0:
            for polyline in polylines:
                self._maximize_walk(polyline)
        # Remaining edges form loops; start each from the vertex with
        # one excess unused out-edge among edges sharing the minimal
        # input id (handles an input edge split into a chain).
        ordered = self.input_order
        for i, eid in enumerate(ordered):
            if self.edges_left <= 0:
                break
            if self.used[eid]:
                continue
            v = self.edges[eid][0]
            input_id = self.ids[eid]
            excess = 0
            j = i
            while j < len(ordered) and self.ids[ordered[j]] == input_id:
                eid2 = ordered[j]
                if not self.used[eid2]:
                    if self.edges[eid2][0] == v:
                        excess += 1
                    if self.edges[eid2][1] == v:
                        excess -= 1
                j += 1
            if excess == 1 or self.edges[eid][1] == v:
                loop: list[int] = []
                self._fill_walk(v, loop)
                self._maximize_walk(loop)
                polylines.append(loop)
        assert self.edges_left == 0
        self._canonical_chain_sort(polylines)
        return polylines


class PolylineLayer:
    """S2PolylineLayer.java:139-185: assemble ALL edges into a single
    polyline via WALK assembly (duplicates/siblings KEPT, degenerates
    discarded — S2PolylineLayer.java:124-132); raises ValueError
    (BUILDER_EDGES_DO_NOT_FORM_POLYLINE) if the edges form more than
    one walk. Empty input -> empty polyline."""

    def __init__(self, edge_type: str = DIRECTED):
        self.edge_type = edge_type

    def build(
        self, sites: np.ndarray, edges: list[tuple[int, int]]
    ) -> list[int]:
        g_edges, g_ids, sibling = _build_graph_with_ids(
            edges,
            edge_type=self.edge_type,
            degenerate_edges=DISCARD,
            sibling_pairs=KEEP,
            duplicate_edges=KEEP,
        )
        if not g_edges:
            return []
        builder = PolylineBuilder(
            g_edges, g_ids, directed=self.edge_type == DIRECTED,
            sibling_map=sibling)
        walks = builder.build_walks()
        if len(walks) != 1:
            raise ValueError(
                "BUILDER_EDGES_DO_NOT_FORM_POLYLINE: input edges cannot "
                "be assembled into polyline")
        chain = walks[0]
        verts = [g_edges[chain[0]][0]]
        verts.extend(g_edges[eid][1] for eid in chain)
        return verts


class PolylineVectorLayer:
    """S2PolylineVectorLayer.java:51-270: assemble edges into polyline
    vertex chains. Options mirror the reference defaults (DIRECTED
    edges, PolylineType.PATH, duplicates/siblings KEEP); degenerate
    edges are discarded (graphOptions, S2PolylineVectorLayer.java:124).
    PATH breaks at every vertex whose in/out degree differs from 1;
    WALK makes each polyline as long as possible, splicing loops."""

    def __init__(self, duplicate_edges: str = KEEP,
                 sibling_pairs: str = KEEP,
                 polyline_type: str = PATH,
                 edge_type: str = DIRECTED):
        self.duplicate_edges = duplicate_edges
        self.sibling_pairs = sibling_pairs
        self.polyline_type = polyline_type
        self.edge_type = edge_type

    def build(
        self, sites: np.ndarray, edges: list[tuple[int, int]]
    ) -> list[list[int]]:
        g_edges, g_ids, sibling = _build_graph_with_ids(
            edges,
            edge_type=self.edge_type,
            degenerate_edges=DISCARD,
            sibling_pairs=self.sibling_pairs,
            duplicate_edges=self.duplicate_edges,
        )
        builder = PolylineBuilder(
            g_edges, g_ids, directed=self.edge_type == DIRECTED,
            sibling_map=sibling)
        chains = (builder.build_paths() if self.polyline_type == PATH
                  else builder.build_walks())
        lines: list[list[int]] = []
        for chain in chains:
            verts = [g_edges[chain[0]][0]]
            verts.extend(g_edges[eid][1] for eid in chain)
            lines.append(verts)
        return lines
