"""Lax layer parity with S2LaxPolygonLayerTest / S2PointVectorLayer /
S2PolylineVectorLayer fixtures.

Loop ORDER is not asserted (the reference's getDirectedLoops emission
order is an implementation detail); loops are compared as canonicalized
sets, and for filament fixtures (where circuit decomposition at repeated
vertices is rule-dependent) as edge multisets.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import cellid as ci
from s2_geometry_library_java_spark.kernel import laxlayers as lax


def _parse(text: str):
    """Parse an S2TextFormat-ish lax polygon string into (sites, edges,
    is_full): loops separated by ';', vertices 'lat:lng' in degrees; a
    single-vertex loop is a degenerate edge, 'full' is the full loop."""
    sites: list[tuple[float, float, float]] = []
    index: dict[tuple[float, float, float], int] = {}
    edges: list[tuple[int, int]] = []
    is_full = False
    loops_ids: list[list[int]] = []

    def site(tok: str) -> int:
        la, ln = (float(v) for v in tok.split(":"))
        x, y, z = ci.latlng_to_xyz(np.radians(la), np.radians(ln))
        key = (float(x), float(y), float(z))
        if key not in index:
            index[key] = len(sites)
            sites.append(key)
        return index[key]

    for part in text.split(";"):
        part = part.strip()
        if not part:
            continue
        if part == "full":
            is_full = True
            loops_ids.append([])
            continue
        ids = [site(tok.strip()) for tok in part.split(",")]
        loops_ids.append(ids)
        if len(ids) == 1:
            edges.append((ids[0], ids[0]))
        else:
            for i in range(len(ids)):
                edges.append((ids[i], ids[(i + 1) % len(ids)]))
    return np.asarray(sites, dtype=np.float64), edges, is_full, loops_ids


def _canon_loops(loops: list[list[int]]) -> frozenset:
    out = []
    for lp in loops:
        if not lp:
            out.append(("FULL",))
            continue
        k = lp.index(min(lp))
        out.append(tuple(lp[k:] + lp[:k]))
    return frozenset(Counter(out).items())


def _loop_edges(loops: list[list[int]]):
    c = Counter()
    full = 0
    for lp in loops:
        if not lp:
            full += 1
        elif len(lp) == 1:
            c[(lp[0], lp[0])] += 1
        else:
            for i in range(len(lp)):
                c[(lp[i], lp[(i + 1) % len(lp)])] += 1
    return full, c


def check_lax(input_str: str, expected_str: str, db: str, by_edges=False):
    sites, edges, is_full, _ = _parse(input_str)
    # expected loops share the same site index space: parse expected with
    # the same site table by re-parsing input+expected together
    combined, _, _, _ = _parse(input_str + " ; " + expected_str
                               if expected_str else input_str)
    layer = lax.LaxPolygonLayer(db)
    got = layer.build(sites if len(sites) else np.zeros((0, 3)), edges,
                      is_full_polygon=is_full)
    # map expected loops into the SAME site index space
    sites2, _, exp_full, exp_loops = _parse(input_str)  # build index
    # re-parse expected against the input's site index
    index = {tuple(s): i for i, s in enumerate(sites2)}
    exp: list[list[int]] = []
    for part in (expected_str or "").split(";"):
        part = part.strip()
        if not part:
            continue
        if part == "full":
            exp.append([])
            continue
        ids = []
        for tok in part.split(","):
            la, ln = (float(v) for v in tok.strip().split(":"))
            x, y, z = ci.latlng_to_xyz(np.radians(la), np.radians(ln))
            ids.append(index[(float(x), float(y), float(z))])
        exp.append(ids)
    if by_edges:
        assert _loop_edges(got) == _loop_edges(exp), (db, got, exp)
    else:
        assert _canon_loops(got) == _canon_loops(exp), (db, got, exp)


ALL_DB = [lax.DISCARD, lax.DISCARD_HOLES, lax.DISCARD_SHELLS, lax.KEEP]


@pytest.mark.parametrize("db", ALL_DB)
def test_empty(db):
    check_lax("", "", db)


@pytest.mark.parametrize("db", ALL_DB)
def test_full(db):
    check_lax("full", "full", db)


@pytest.mark.parametrize("db", ALL_DB)
def test_one_normal_shell(db):
    check_lax("0:0, 0:9, 9:0", "0:0, 0:9, 9:0", db)


def test_all_degenerate_shells():
    # S2LaxPolygonLayerTest.testAllDegenerateShells
    for db in (lax.KEEP, lax.DISCARD_HOLES):
        check_lax("1:1; 2:2, 3:3", "1:1; 2:2, 3:3", db)
    for db in (lax.DISCARD, lax.DISCARD_SHELLS):
        check_lax("1:1; 2:2, 3:3", "", db)


def test_all_degenerate_holes():
    # S2LaxPolygonLayerTest.testAllDegenerateHoles
    for db in (lax.KEEP, lax.DISCARD_SHELLS):
        check_lax("full; 1:1; 2:2, 3:3", "full; 1:1; 2:2, 3:3", db)
    for db in (lax.DISCARD, lax.DISCARD_HOLES):
        check_lax("full; 1:1; 2:2, 3:3", "full", db)


def test_some_degenerate_shells():
    # S2LaxPolygonLayerTest.testSomeDegenerateShells
    normal = "0:0, 0:9, 9:0; 1:1, 7:1, 1:7"
    inp = normal + "; 3:2; 2:2, 2:3"
    check_lax(inp, inp, lax.KEEP)
    check_lax(inp, inp, lax.DISCARD_HOLES)
    check_lax(inp, normal, lax.DISCARD)
    check_lax(inp, normal, lax.DISCARD_SHELLS)


def test_some_degenerate_holes():
    # S2LaxPolygonLayerTest.testSomeDegenerateHoles: 1:1 and 2:2,3:3 lie
    # INSIDE the shell 0:0,0:9,9:0 -> they are degenerate holes
    for db in (lax.KEEP, lax.DISCARD_SHELLS):
        check_lax("0:0, 0:9, 9:0; 1:1; 2:2, 3:3",
                  "0:0, 0:9, 9:0; 1:1; 2:2, 3:3", db)
    for db in (lax.DISCARD, lax.DISCARD_HOLES):
        check_lax("0:0, 0:9, 9:0; 1:1; 2:2, 3:3", "0:0, 0:9, 9:0", db)


def test_two_normal_shells_one_normal_hole():
    # CCW shells, CW hole; no degeneracies -> unchanged under all options
    inp = "0:1, 1:1, 0:0; 0:10, 0:19, 9:19, 9:10; 2:11, 3:11, 3:18, 2:18"
    for db in ALL_DB:
        check_lax(inp, inp, db)


def test_normal_and_degenerate_shells_and_holes():
    # S2LaxPolygonLayerTest.testNormalAndDegenerateShellsAndHoles —
    # compared as edge multisets (filament circuit decomposition at
    # repeated vertices is emission-rule-dependent)
    normal = ("0:0, 0:9, 9:9, 9:0; "
              "0:10, 0:19, 9:19, 9:10; 1:11, 8:11, 8:18, 1:18")
    normal_with_degen_holes = (
        "0:0, 0:9, 1:8, 1:7, 1:8, 0:9, 9:9, 9:0; "
        "0:10, 0:19, 9:19, 9:10, 0:10, 1:11, 8:11, 8:18, 1:18, 1:11")
    degen_shells = "0:9, 0:10; 2:12; 3:13, 3:14; 20:20; 10:0, 10:1"
    degen_holes = "2:5; 3:6, 3:7; 8:8"
    inp = f"{normal_with_degen_holes}; {degen_shells}; {degen_holes}"
    check_lax(inp, normal, lax.DISCARD, by_edges=True)
    check_lax(inp, f"{normal}; {degen_shells}", lax.DISCARD_HOLES,
              by_edges=True)
    check_lax(inp, f"{normal_with_degen_holes}; {degen_holes}",
              lax.DISCARD_SHELLS, by_edges=True)
    check_lax(inp, inp, lax.KEEP, by_edges=True)


def test_point_vector_layer():
    sites, edges, _, _ = _parse("1:1; 2:2; 1:1")
    layer = lax.PointVectorLayer(duplicate_edges=lax.MERGE)
    pts = layer.build(sites, edges)
    assert len(pts) == 2
    layer2 = lax.PointVectorLayer(duplicate_edges=lax.KEEP)
    assert len(layer2.build(sites, edges)) == 3
    with pytest.raises(ValueError):
        lax.PointVectorLayer().build(sites, [(0, 1)])


def _parse_lines(polylines: list[str]):
    """Parse polyline strings sharing one site table; returns (sites,
    edges in input order, vertex-path lookup for expected strings)."""
    sites: list[tuple[float, float, float]] = []
    index: dict[tuple[float, float, float], int] = {}
    edges: list[tuple[int, int]] = []

    def site(tok: str) -> int:
        la, ln = (float(v) for v in tok.split(":"))
        x, y, z = ci.latlng_to_xyz(np.radians(la), np.radians(ln))
        key = (float(x), float(y), float(z))
        if key not in index:
            index[key] = len(sites)
            sites.append(key)
        return index[key]

    for line in polylines:
        ids = [site(tok.strip()) for tok in line.split(",")]
        if len(ids) == 1:
            edges.append((ids[0], ids[0]))
        for i in range(len(ids) - 1):
            edges.append((ids[i], ids[i + 1]))

    def path(line: str) -> list[int]:
        return [site(tok.strip()) for tok in line.split(",")]

    return np.asarray(sites, dtype=np.float64), edges, path


def test_polyline_vector_layer_paths():
    # PATH semantics: chains break at every vertex with in/out degree
    # != 1, so a junction splits all three chains
    # (S2BuilderGraph.java:1227 buildPaths).
    sites, _, _, _ = _parse("0:0; 0:1; 0:2; 1:1")
    layer = lax.PolylineVectorLayer()
    lines = layer.build(sites, [(0, 1), (1, 2), (3, 1)])
    assert sorted(len(p) for p in lines) == [2, 2, 2]
    # WALK extends through the junction: one 3-vertex walk remains
    # (S2BuilderGraph.java:1282 buildWalks).
    walks = lax.PolylineVectorLayer(polyline_type=lax.WALK).build(
        sites, [(0, 1), (1, 2), (3, 1)])
    assert sorted(len(p) for p in walks) == [2, 3]
    # sibling discard empties a back-and-forth pair
    lines2 = lax.PolylineVectorLayer(sibling_pairs=lax.DISCARD).build(
        sites, [(0, 1), (1, 0)]
    )
    assert lines2 == []


def test_polyline_vector_layer_joining_directed():
    # S2PolylineVectorLayerTest.testJoiningPolylines (directed case):
    # polylines join through degree-1/1 vertices, output in input order.
    sites, edges, path = _parse_lines(["1:1, 2:2", "3:3, 2:2", "0:0, 1:1"])
    lines = lax.PolylineVectorLayer().build(sites, edges)
    assert lines == [path("3:3, 2:2"), path("0:0, 1:1, 2:2")]


def test_polyline_vector_layer_joining_undirected():
    # S2PolylineVectorLayerTest.testJoiningPolylines (undirected case):
    # one chain, direction chosen so the first edge entered the builder
    # before the last.
    sites, edges, path = _parse_lines(["1:1, 2:2", "3:3, 2:2", "0:0, 1:1"])
    lines = lax.PolylineVectorLayer(edge_type=lax.UNDIRECTED).build(
        sites, edges)
    assert lines == [path("3:3, 2:2, 1:1, 0:0")]
    # degenerate input polyline is discarded
    sites2, edges2, path2 = _parse_lines(["1:1, 2:2", "3:3, 2:2", "1:1"])
    lines2 = lax.PolylineVectorLayer(edge_type=lax.UNDIRECTED).build(
        sites2, edges2)
    assert lines2 == [path2("1:1, 2:2, 3:3")]


def test_polyline_vector_layer_segment_network_unchanged():
    # S2PolylineVectorLayerTest.testSegmentNetwork: a complex network of
    # polylines meeting at shared vertices round-trips unchanged under
    # PATH (idempotency).
    network = [
        "0:0, 1:1, 2:2",
        "2:2, 2:3, 2:4",
        "2:4, 3:4, 4:4",
        "2:2, 3:2, 4:2",
        "4:2, 4:3, 4:4",
        "1:0, 2:2",
        "0:1, 2:2",
        "5:4, 4:4",
        "4:5, 4:4",
        "2:4, 2:5, 1:5, 1:4, 2:4",
        "4:2, 6:1, 5:0",
        "4:2, 7:0, 6:-1",
        "11:1, 11:0, 10:0, 10:1, 11:1",
    ]
    sites, edges, path = _parse_lines(network)
    lines = lax.PolylineVectorLayer().build(sites, edges)
    assert lines == [path(p) for p in network]


def test_polyline_vector_layer_multiple_intersecting_walks():
    # S2PolylineVectorLayerTest.testMultipleIntersectingWalks: WALK
    # idempotency for polylines sharing edges and loops.
    walks_in = [
        "5:5, 5:6, 6:5, 5:5, 5:4, 5:3",
        "4:4, 5:5, 6:5, 5:6, 5:5, 5:6, 6:5, 5:5, 4:5",
        "3:5, 5:5, 5:6, 6:5, 5:5, 5:6, 6:6, 7:7",
    ]
    sites, edges, path = _parse_lines(walks_in)
    lines = lax.PolylineVectorLayer(polyline_type=lax.WALK).build(
        sites, edges)
    assert lines == [path(p) for p in walks_in]


def test_polyline_vector_layer_early_walk_termination():
    # S2PolylineVectorLayerTest.testEarlyWalkTermination: earlier input
    # polylines terminating mid-walk force non-maximal walks.
    walks_in = [
        "0:1, 1:1",
        "1:0, 1:1, 1:2",
        "0:2, 1:2, 2:2",
        "2:1, 2:2, 2:3",
    ]
    sites, edges, path = _parse_lines(walks_in)
    lines = lax.PolylineVectorLayer(polyline_type=lax.WALK).build(
        sites, edges)
    assert lines == [path(p) for p in walks_in]


def test_process_edges_semantics():
    # degenerate edge incident to a non-degenerate edge: DISCARD_EXCESS
    # drops it, KEEP keeps it
    edges = [(0, 0), (0, 1), (1, 0), (1, 0)]
    assert lax.process_edges(
        edges, degenerate_edges=lax.DISCARD_EXCESS,
        sibling_pairs=lax.DISCARD_EXCESS) == [(1, 0)]
    # isolated degenerate edge survives DISCARD_EXCESS, merged to 1 copy
    assert lax.process_edges(
        [(2, 2), (2, 2)], degenerate_edges=lax.DISCARD_EXCESS) == [(2, 2)]
    # balanced sibling pair: DISCARD removes, DISCARD_EXCESS keeps one pair
    assert lax.process_edges([(0, 1), (1, 0)],
                             sibling_pairs=lax.DISCARD) == []
    assert lax.process_edges([(0, 1), (1, 0)],
                             sibling_pairs=lax.DISCARD_EXCESS) == [
        (0, 1), (1, 0)]


def _single_polyline(lines: list[str], edge_type: str = lax.DIRECTED):
    sites, edges, path = _parse_lines(lines)
    return lax.PolylineLayer(edge_type=edge_type).build(sites, edges), path


def test_polyline_layer_unchanged_fixtures():
    # S2PolylineLayerTest: one edge, backtracking lines, simple loop, and
    # the many-overlapping-loops walk must all round-trip unchanged.
    fixtures = [
        "3:4, 10:7",
        "0:0, 1:0, 0:0, 1:0",
        "0:0, 1:0, 2:0, 1:0",
        "0:0, 1:0, 2:0, 1:0, 2:0",
        "0:0, 1:0, 2:0, 1:0, 2:0, 3:0",
        "0:0, 1:0, 2:0, 1:0, 0:0, 1:0, 2:0",
        "0:0, 1:0, 2:0, 3:0, 2:0, 1:0, 2:0, 3:0",
        "0:0, 1:0, 2:0, 1:0, 0:0, 1:0, 2:0, 3:0",
        "0:0, 1:0, 2:0, 3:0, 2:0, 1:0, 2:0, 3:0, 4:0",
        "0:0, 0:5, 5:5, 5:0, 0:0",
        "0:0, 2:2, 2:4, 2:2, 2:4, 4:4, 4:2, 2:2, 4:4, 4:2, 2:2, 2:0, 2:2, "
        "2:0, 4:0, 2:2, 4:2, 2:2, 0:2, 0:4, 2:2, 0:4, 0:2, 2:2, 0:4, 2:2, "
        "0:2, 2:2, 0:0, 0:2, 2:2, 0:0",
    ]
    for fx in fixtures:
        got, path = _single_polyline([fx])
        assert got == path(fx), fx


def test_polyline_layer_early_walk_termination_end_loop():
    # S2PolylineLayerTest.testEarlyWalkTerminationWithEndLoop2: the walk
    # terminates early (one edge), then is maximized with a 2-edge loop.
    got, path = _single_polyline(["0:0, 0:1", "0:2, 0:1", "0:1, 0:2"])
    assert got == path("0:0, 0:1, 0:2, 0:1")


def test_polyline_layer_unordered_loops():
    # S2PolylineLayerTest.testUnorderedLoops: 5 diagonally-touching
    # squares reordered into one unbroken polyline.
    got, path = _single_polyline(
        [
            "3:3, 3:2, 2:2, 2:3, 3:3",
            "1:0, 0:0, 0:1, 1:1, 1:0",
            "3:1, 3:0, 2:0, 2:1, 3:1",
            "1:3, 1:2, 0:2, 0:1, 1:3",
            "1:1, 1:2, 2:2, 2:1, 1:1",
        ]
    )
    assert got == path(
        "3:3, 3:2, 2:2, 2:1, 3:1, 3:0, 2:0, 2:1, 1:1, 1:0, 0:0, "
        "0:1, 1:1, 1:2, 0:2, 0:1, 1:3, 1:2, 2:2, 2:3, 3:3"
    )


def test_polyline_layer_rejects_disconnected():
    sites, edges, _ = _parse_lines(["0:0, 1:0", "5:5, 6:5"])
    with pytest.raises(ValueError, match="DO_NOT_FORM_POLYLINE"):
        lax.PolylineLayer().build(sites, edges)
    # empty input -> empty polyline (S2PolylineLayer.java:145-148)
    assert lax.PolylineLayer().build(sites, []) == []
