"""G2 snap-rounding builder: snap functions, site selection, edge
re-chaining, crossing splits, and the polygon-layer loop assembly."""

import numpy as np

from s2_geometry_library_java_spark.kernel import builder as bu
from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import sphere


def _pt(lat, lng):
    x, y, z = ci.latlng_to_xyz(np.radians(float(lat)), np.radians(float(lng)))
    return np.array([float(x), float(y), float(z)])


def _loop(pts):
    return np.stack([_pt(la, ln) for la, ln in pts])


def test_identity_snap_merges_shared_vertices():
    sq1 = _loop([(0, 0), (0, 10), (10, 10), (10, 0)])
    sq2 = _loop([(0, 10), (0, 20), (10, 20), (10, 10)])  # shares 2 vertices
    b = bu.SnapBuilder(bu.IdentitySnapFunction(1e-12))
    b.add_loop(sq1, layer=0)
    b.add_loop(sq2, layer=1)
    g = b.build()
    assert len(g.sites) == 6  # 8 vertices, 2 shared
    e0 = g.layer_edges(0)
    e1 = g.layer_edges(1)
    assert len(e0) == 4 and len(e1) == 4
    # the shared vertices appear in both layers' edge endpoints
    shared = {s for s, _ in e0} & {s for s, _ in e1}
    assert len(shared) == 2


def test_cellid_snap_function_bounds():
    fn = bu.CellIdSnapFunction(level=10)
    rng = np.random.default_rng(3)
    lat = rng.uniform(-80, 80, 200)
    lng = rng.uniform(-180, 180, 200)
    x, y, z = ci.latlng_to_xyz(np.radians(lat), np.radians(lng))
    pts = np.stack([x, y, z], axis=1)
    snapped = fn.snap(pts)
    moved2 = ((snapped - pts) ** 2).sum(axis=1)
    assert (moved2 <= sphere.chord2_from_angle(fn.snap_radius)).all()
    # snapped points are exact cell centers at the level
    ids = ci.xyz_to_cell_id(snapped[:, 0], snapped[:, 1], snapped[:, 2], 10)
    cx, cy, cz = ci.cell_id_to_xyz(ids)
    assert np.allclose(np.stack([cx, cy, cz], axis=1), snapped, atol=1e-15)


def test_intlatlng_snap_reference_example():
    # S2BuilderSnapFunctions doc: E6 snap of (23.12345651, -45.65432149)
    fn = bu.IntLatLngSnapFunction(6)
    p = _pt(23.12345651, -45.65432149)
    s = fn.snap(p[None])[0]
    lat, lng = ci.xyz_to_latlng(s[0], s[1], s[2])
    assert abs(np.degrees(float(lat)) - 23.123457) < 1e-9
    assert abs(np.degrees(float(lng)) - -45.654321) < 1e-9


def test_site_separation_enforced():
    fn = bu.IdentitySnapFunction(np.radians(0.5))
    b = bu.SnapBuilder(fn)
    # two nearly-coincident vertices (0.1 deg apart < 0.5 deg separation)
    b.add_edge(_pt(0, 0), _pt(0, 10))
    b.add_edge(_pt(0.1, 0.0), _pt(10, 10))
    g = b.build()
    sep2 = sphere.chord2_from_angle(fn.min_vertex_separation())
    S = g.sites
    for i in range(len(S)):
        d2 = ((S - S[i]) ** 2).sum(axis=1)
        d2[i] = 4.0
        assert (d2 > sep2).all()
    # the merged vertex's edge still starts at the surviving site
    assert all(len(c) >= 2 for c in g.chains)


def test_split_crossing_edges():
    b = bu.SnapBuilder(
        bu.IdentitySnapFunction(1e-12), split_crossing_edges=True
    )
    b.add_edge(_pt(0, -10), _pt(0, 10), layer=0)
    b.add_edge(_pt(-10, 0), _pt(10, 0), layer=1)
    g = b.build()
    assert len(g.sites) == 5  # 4 endpoints + 1 crossing
    # both chains route through the crossing site
    assert len(g.chains[0]) == 3 and len(g.chains[1]) == 3
    assert g.chains[0][1] == g.chains[1][1]
    cross = g.sites[g.chains[0][1]]
    want = _pt(0, 0)
    assert np.sqrt(((cross - want) ** 2).sum()) < 1e-14


def test_vertex_near_edge_rerouted():
    """A foreign vertex within the snap radius of an edge is inserted into
    that edge's chain (the tangency repair that unblocks boolean ops)."""
    r = np.radians(0.2)
    b = bu.SnapBuilder(bu.IdentitySnapFunction(r))
    b.add_edge(_pt(0, -10), _pt(0, 10), layer=0)  # equator edge
    b.add_edge(_pt(0.1, 0), _pt(10, 0), layer=1)  # starts 0.1 deg above it
    g = b.build()
    chain = g.chains[0]
    assert len(chain) == 3  # rerouted through the near vertex's site
    mid = g.sites[chain[1]]
    assert np.array_equal(mid, _pt(0.1, 0))


def test_assemble_single_loop_ccw():
    sq = _loop([(0, 0), (0, 10), (10, 10), (10, 0)])
    b = bu.SnapBuilder(bu.IdentitySnapFunction(0.0))
    b.add_loop(sq)
    g = b.build()
    loops = bu.assemble_loops(g.sites, g.layer_edges(0))
    assert len(loops) == 1
    v = loops[0]
    assert len(v) == 4
    # same cyclic order as input (CCW preserved)
    area = sphere.signed_loop_area(v)
    want = sphere.signed_loop_area(sq)
    assert abs(area - want) < 1e-12


def test_assemble_two_loops_sharing_corner():
    """Two CCW squares touching at one vertex must assemble into two
    separate loops, not a figure-eight — the degree-4 walk rule."""
    sq1 = _loop([(0, 0), (0, 10), (10, 10), (10, 0)])
    sq2 = _loop([(-10, -10), (-10, 0), (0, 0), (0, -10)])  # touches at (0,0)
    b = bu.SnapBuilder(bu.IdentitySnapFunction(1e-12))
    b.add_loop(sq1)
    b.add_loop(sq2)
    g = b.build()
    assert len(g.sites) == 7
    loops = bu.assemble_loops(g.sites, g.layer_edges(0))
    assert len(loops) == 2
    sizes = sorted(len(lp) for lp in loops)
    assert sizes == [4, 4]
    for lp in loops:
        a = sphere.signed_loop_area(lp)
        assert 0 < a < 2 * np.pi  # both stay CCW-small


def test_idempotent_when_already_snapped():
    fn = bu.CellIdSnapFunction(level=12)
    sq = _loop([(1, 1), (1, 9), (9, 9), (9, 1)])
    snapped_sq = fn.snap(sq)
    b = bu.SnapBuilder(fn)
    b.add_loop(snapped_sq)
    g = b.build()
    loops = bu.assemble_loops(g.sites, g.layer_edges(0))
    assert len(loops) == 1
    got = loops[0]
    # same vertex set, unchanged
    got_set = {tuple(p) for p in got}
    want_set = {tuple(p) for p in snapped_sq}
    assert got_set == want_set


def test_assemble_polylines():
    """Polyline layer: snapped chains reassemble into maximal paths; a
    shared mid-vertex splits nothing, a cycle comes back whole."""
    b = bu.SnapBuilder(bu.IdentitySnapFunction(1e-12))
    line = [_pt(0, k) for k in range(5)]
    b.add_polyline(np.stack(line), layer=0)
    g = b.build()
    lines = bu.assemble_polylines(g.sites, g.layer_edges(0))
    assert len(lines) == 1 and len(lines[0]) == 5
    np.testing.assert_allclose(lines[0], np.stack(line), atol=1e-15)

    b2 = bu.SnapBuilder(bu.IdentitySnapFunction(1e-12))
    b2.add_loop(_loop([(0, 0), (0, 10), (10, 10), (10, 0)]), layer=0)
    g2 = b2.build()
    cyc = bu.assemble_polylines(g2.sites, g2.layer_edges(0))
    assert len(cyc) == 1 and len(cyc[0]) == 5  # closed: first == last
    np.testing.assert_allclose(cyc[0][0], cyc[0][-1], atol=1e-15)


def test_voronoi_site_exclusion_near_coincident():
    """S2Builder.java:1588-1701 snapEdge Voronoi exclusion: a site whose
    coverage interval on the edge is strictly contained in a nearer
    site's cannot have its Voronoi region reach the edge and must NOT
    appear in the chain — projection ordering alone would include it."""
    r = 0.01
    x = np.array([1.0, 0.0, 0.0])
    y = np.array([np.cos(0.0873), np.sin(0.0873), 0.0])  # ~5 deg equator

    def site(par, off):
        p = np.array([np.cos(par), np.sin(par), off])
        return p / np.sqrt(p @ p)

    # p1 close to the edge (wide coverage), p2 nearly snap-radius away
    # (narrow coverage nested inside p1's); |p1-p2| > r so both survive
    # site selection
    p1 = site(0.040, 0.0005)
    p2 = site(0.044, 0.0099)
    far = np.array([0.0, 0.0, 1.0])

    def build(voronoi):
        b = bu.SnapBuilder(
            bu.IdentitySnapFunction(r), voronoi_exclusion=voronoi
        )
        b.add_edge(x, y, layer=0)
        b.add_edge(p1, far, layer=1)
        b.add_edge(p2, far, layer=1)
        return b.build()

    g = build(voronoi=True)
    sid = {tuple(np.round(s, 6)): k for k, s in enumerate(g.sites)}
    k1 = sid[tuple(np.round(p1, 6))]
    k2 = sid[tuple(np.round(p2, 6))]
    chain = g.chains[0]
    assert k1 in chain, chain
    assert k2 not in chain, chain

    g0 = build(voronoi=False)
    sid0 = {tuple(np.round(s, 6)): k for k, s in enumerate(g0.sites)}
    chain0 = g0.chains[0]
    assert sid0[tuple(np.round(p1, 6))] in chain0
    assert sid0[tuple(np.round(p2, 6))] in chain0  # the disagreement


def test_simplify_edge_chains_roundtrip():
    """simplifyEdgeChains (S2Builder.java:20-80): an input polyline with
    many near-collinear interior vertices (degree-2 sites in the output
    graph) simplifies to far fewer edges; every removed site stays within
    the snap radius of the replacement chain; junction sites (split
    crossings, shared vertices) are never removed."""
    from s2_geometry_library_java_spark.kernel import edges as ek
    from s2_geometry_library_java_spark.kernel import sphere

    r = 0.002
    n = 20
    pts = []
    for k in range(n + 1):
        par = 0.015 * k
        off = 0.0004 * np.sin(3.0 * k)  # wiggle well inside r
        p = np.array([np.cos(par), np.sin(par), off])
        pts.append(p / np.sqrt(p @ p))
    pts = np.asarray(pts)

    b = bu.SnapBuilder(bu.IdentitySnapFunction(r), simplify_edge_chains=True)
    b.add_polyline(pts, layer=0)
    g = b.build()
    raw = g.layer_edges(0)
    simp = g.simplified_layer_edges(0)
    assert len(simp) < len(raw) / 2, (len(raw), len(simp))
    # endpoints preserved
    raw_sites = [raw[0][0]] + [e for _, e in raw]
    simp_sites = [simp[0][0]] + [e for _, e in simp]
    assert simp_sites[0] == raw_sites[0] and simp_sites[-1] == raw_sites[-1]
    # every removed site within r of the simplified chain
    removed = [s for s in raw_sites if s not in simp_sites]
    assert removed
    S = g.sites
    va = S[np.asarray([u for u, _ in simp])]
    vb = S[np.asarray([v for _, v in simp])]
    d2 = ek.min_chord2_points_to_chain(S[np.asarray(removed)], va, vb)
    assert (d2 <= sphere.chord2_from_angle(r) * (1 + 1e-9)).all()


def test_simplify_keeps_crossing_junction():
    """A split-crossing site has degree 4 and must survive
    simplification even when the polylines around it are collinear."""
    r = 1e-6
    n = 12
    pts = []
    for k in range(n + 1):
        par = 0.02 * k
        p = np.array([np.cos(par), np.sin(par), 0.0])
        pts.append(p)
    pts = np.asarray(pts)
    b = bu.SnapBuilder(
        bu.IdentitySnapFunction(r),
        split_crossing_edges=True,
        simplify_edge_chains=True,
    )
    b.add_polyline(pts, layer=0)
    mid = 0.02 * n / 2
    b.add_edge(
        np.array([np.cos(mid), np.sin(mid) * np.cos(0.05), np.sin(0.05)]),
        np.array([np.cos(mid), np.sin(mid) * np.cos(0.05), -np.sin(0.05)]),
        layer=1,
    )
    g = b.build()
    simp = g.simplified_layer_edges(0)
    cross_sites = {s for e in g.layer_edges(1) for s in e} & {
        s for e in g.layer_edges(0) for s in e
    }
    assert cross_sites  # the crossing was spliced into both layers
    simp_sites = {s for e in simp for s in e}
    assert cross_sites <= simp_sites  # junction kept through simplify
