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


def _float_interval(p, x, y, r2):
    lo, hi = bu._coverage_intervals(p[None, :], x, y, r2)
    return float(lo[0]), float(hi[0])


def _bisect_root(A, B, C, s_lo, s_hi, n=200):
    """Exact-arithmetic bisection of E(s) = A s^2 + B s + C on [s_lo, s_hi]
    (Fraction endpoints with E of opposite signs); independent oracle for
    the surd-comparison root ordering."""
    from fractions import Fraction

    E = lambda s: A * s * s + B * s + C
    a, b = Fraction(s_lo), Fraction(s_hi)
    fa = E(a)
    for _ in range(n):
        m = (a + b) / 2
        fm = E(m)
        if fm == 0:
            return m
        if (fa > 0) == (fm > 0):
            a, fa = m, fm
        else:
            b = m
    return (a + b) / 2


def test_exact_contains_agrees_with_float_off_tie():
    """Fuzz: exact_contains must agree with the float interval containment
    whenever the float margins are comfortably off a tie (>1e-9)."""
    from s2_geometry_library_java_spark.kernel import exactcover as xc

    rng = np.random.RandomState(7)
    r2 = float(sphere.chord2_from_angle(1e-5))
    checked = 0
    for _ in range(300):
        # short edge somewhere random
        lat0, lng0 = rng.uniform(-60, 60), rng.uniform(-170, 170)
        x = np.ravel(ci.latlng_to_xyz(np.radians(lat0), np.radians(lng0)))
        y = np.ravel(ci.latlng_to_xyz(
            np.radians(lat0 + rng.uniform(0.5, 2.0) * 1e-3),
            np.radians(lng0 + rng.uniform(0.5, 2.0) * 1e-3)))
        # two sites near the edge, within ~r of it
        def site():
            t = rng.uniform(-0.2, 1.2)
            p = x + t * (y - x)
            p = p + rng.uniform(-1, 1, 3) * np.sqrt(r2) * 0.5
            return p / np.linalg.norm(p)
        pi_, pj_ = site(), site()
        li, hi_ = _float_interval(pi_, x, y, r2)
        lj, hj = _float_interval(pj_, x, y, r2)
        margins = min(abs(li - lj), abs(hj - hi_))
        if margins < 1e-9:
            continue
        float_contains = li <= lj and hj <= hi_
        assert xc.exact_contains(pi_, pj_, x, y, r2) == float_contains
        checked += 1
    assert checked > 100


def test_exact_contains_resolves_one_ulp_tie():
    """Two sites identical except one coordinate nudged by 1 ulp along the
    edge: float intervals are bit-identical (a forced tie) but the exact
    path must order the entry/exit roots correctly — pinned against an
    exact-arithmetic bisection of the coverage quadratic."""
    from fractions import Fraction

    from s2_geometry_library_java_spark.kernel import exactcover as xc

    x = np.ravel(ci.latlng_to_xyz(np.radians(10.0), np.radians(20.0)))
    y = np.ravel(ci.latlng_to_xyz(np.radians(10.001), np.radians(20.001)))
    r2 = float(sphere.chord2_from_angle(2e-6))
    mid = x + 0.5 * (y - x)
    p = mid / np.linalg.norm(mid)
    q = p.copy()
    q[2] = np.nextafter(q[2], 2.0)  # 1-ulp nudge
    # forced tie: float endpoints within the exact-routing threshold
    fp, fq = _float_interval(p, x, y, r2), _float_interval(q, x, y, r2)
    assert abs(fp[0] - fq[0]) < bu.VORONOI_TIE_EPS
    assert abs(fp[1] - fq[1]) < bu.VORONOI_TIE_EPS
    # oracle: order the entry and exit roots by exact bisection
    xv = xc._vec(x); yv = xc._vec(y)
    xx = xc._dot(xv, xv); xy = xc._dot(xv, yv)
    w = tuple(yv[k] * xx - xv[k] * xy for k in range(3))
    c = 2 - Fraction(r2)
    sp = xc.Site(p, xv, yv, w, c * c)
    sq = xc.Site(q, xv, yv, w, c * c)
    roots = {}
    for tag, s in (("p", sp), ("q", sq)):
        assert s.D > 0 and s.A < 0
        sv = s.B / (-2 * s.A)
        half = 1
        while (s.A * (sv - half) ** 2 + s.B * (sv - half) + s.C) > 0:
            half *= 2
        lo_root = _bisect_root(s.A, s.B, s.C, sv - half, sv)
        hi_root = _bisect_root(s.A, s.B, s.C, sv, sv + half)
        roots[tag] = (lo_root, hi_root)
    # the 1-ulp nudge genuinely moves the exact roots (the difference the
    # float path cannot see)
    assert roots["p"][0] != roots["q"][0]
    assert roots["p"][1] != roots["q"][1]
    want_p_in_q = roots["q"][0] <= roots["p"][0] and roots["p"][1] <= roots["q"][1]
    want_q_in_p = roots["p"][0] <= roots["q"][0] and roots["q"][1] <= roots["p"][1]
    # clamps don't engage: neither site covers x or y
    assert not sp.cov_x and not sp.cov_y and not sq.cov_x and not sq.cov_y
    assert xc.exact_contains(q, p, x, y, r2) == want_p_in_q
    assert xc.exact_contains(p, q, x, y, r2) == want_q_in_p
    # a second sub-float perturbation direction, also pinned to the oracle
    q2 = p.copy()
    q2[0] = np.nextafter(q2[0], 0.0)
    sq2 = xc.Site(q2, xv, yv, w, c * c)
    if sq2.D > 0 and sq2.A < 0 and not (sq2.cov_x or sq2.cov_y):
        sv = sq2.B / (-2 * sq2.A)
        half = 1
        while (sq2.A * (sv - half) ** 2 + sq2.B * (sv - half) + sq2.C) > 0:
            half *= 2
        r_lo = _bisect_root(sq2.A, sq2.B, sq2.C, sv - half, sv)
        r_hi = _bisect_root(sq2.A, sq2.B, sq2.C, sv, sv + half)
        want = roots["p"][0] <= r_lo and r_hi <= roots["p"][1]
        assert xc.exact_contains(p, q2, x, y, r2) == want


def test_voronoi_filter_all_exact_matches_float(monkeypatch):
    """Routing every comparison through the exact path (tie eps = 10)
    yields the same surviving chain as the float path on a generic
    near-coincident fixture — exact and float agree off ties end-to-end."""
    rng = np.random.RandomState(3)
    x = np.ravel(ci.latlng_to_xyz(np.radians(0.0), np.radians(0.0)))
    y = np.ravel(ci.latlng_to_xyz(np.radians(0.0), np.radians(0.01)))
    r2 = float(sphere.chord2_from_angle(5e-5))
    S = []
    for t in np.linspace(-0.1, 1.1, 9):
        p = x + t * (y - x) + rng.uniform(-1, 1, 3) * 2e-6
        S.append(p / np.linalg.norm(p))
    S = np.asarray(S)
    cand = list(range(len(S)))
    from s2_geometry_library_java_spark.kernel import edges as ekk
    d2 = np.array([
        float(np.atleast_1d(ekk.min_chord2_to_edges(p, x, y))[0]) for p in S
    ])
    base = bu._voronoi_filter(S, cand, d2, x, y, r2)
    monkeypatch.setattr(bu, "VORONOI_TIE_EPS", 10.0)
    assert bu._voronoi_filter(S, cand, d2, x, y, r2) == base


def test_edge_labels_survive_snapping():
    """S2Builder.setLabel / S2BuilderGraph label sets: input-edge labels
    map onto every snapped sub-edge, crossings split both labelled edges,
    and duplicate input edges merge their labels."""
    def pt(la, ln):
        return np.ravel(ci.latlng_to_xyz(np.radians(la), np.radians(ln)))

    bld = bu.SnapBuilder(bu.IdentitySnapFunction(1e-9), split_crossing_edges=True)
    bld.add_edge(pt(0.0, -1.0), pt(0.0, 1.0), label=7)    # equatorial
    bld.add_edge(pt(-1.0, 0.0), pt(1.0, 0.0), label=9)    # crossing meridian
    bld.add_edge(pt(0.0, -1.0), pt(0.0, 1.0), label=11)   # duplicate of edge 7
    g = bld.build()
    labelled = g.layer_edges_with_labels(0)
    # the crossing splits both input edges: 4 labelled sub-edges
    assert len(labelled) == 4
    by_label = {}
    for edge, labels in labelled.items():
        for l in labels:
            by_label.setdefault(l, []).append(edge)
    assert len(by_label[7]) == 2 and len(by_label[9]) == 2
    # duplicate input edge merged label 11 onto label 7's sub-edges
    assert sorted(by_label[11]) == sorted(by_label[7])
    for edge in by_label[7]:
        assert labelled[edge] == [7, 11]
    # unlabeled edges still appear, with empty label lists
    bld2 = bu.SnapBuilder(bu.IdentitySnapFunction(1e-9))
    bld2.add_edge(pt(5.0, 5.0), pt(5.0, 6.0))
    g2 = bld2.build()
    (edge, labels), = g2.layer_edges_with_labels(0).items()
    assert labels == []
