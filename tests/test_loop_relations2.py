"""S2LoopTest.testLoopRelations2 port (S2LoopTest.java:855-881): loops
built as the union boundary of ADJACENT same-level cell-id runs, whose
containment/intersection is known exactly from the Hilbert ranges; the
boolean-kernel relations must reproduce it. RNG is numpy-seeded (geometry
family and invariants match the reference's test; draws are not
seed-bit-matched)."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import booleanop as bo
from s2_geometry_library_java_spark.kernel import cell as cl
from s2_geometry_library_java_spark.kernel import cellid as c
from s2_geometry_library_java_spark.kernel import region as rg

BIAS = 1 << 63


def _biased(x: int) -> int:
    return int(np.uint64(x) ^ np.uint64(BIAS))


def _advance(cid: int, n: int) -> int:
    return int(c.advance(np.array([cid], dtype=np.uint64), np.array([n]))[0])


def _next(cid: int) -> int:
    return int(c.next_cell(np.array([cid], dtype=np.uint64))[0])


def make_cell_loop(begin: int, end: int) -> rg.Polygon:
    """CCW polygon whose boundary is the union of cells [begin, end) —
    directed edges of each cell, opposite pairs cancelled, then one
    region-on-the-left walk (S2LoopTest.makeCellLoop)."""
    edges: dict[tuple, set] = {}
    cid = begin
    while cid != end:
        v = cl.Cell(cid).vertices
        for k in range(4):
            a = tuple(v[k])
            b = tuple(v[(k + 1) & 3])
            if a in edges.get(b, ()):  # cancel the opposite edge
                edges[b].discard(a)
                if not edges[b]:
                    del edges[b]
            else:
                edges.setdefault(a, set()).add(b)
        cid = _next(cid)
    # walk the remaining directed edges into one loop
    start = next(iter(edges))
    verts = [start]
    cur = start
    while True:
        nxt = next(iter(edges[cur]))
        edges[cur].discard(nxt)
        if not edges[cur]:
            del edges[cur]
        if nxt == start:
            break
        verts.append(nxt)
        cur = nxt
    assert not edges, "boundary was not a single loop"
    return rg.Polygon([rg.Loop(np.asarray(verts))])


def _member(poly, p):
    r = False
    for lp in poly.loops:
        r ^= bool(lp.contains_points(p[0:1], p[1:2], p[2:3])[0])
    return r


_PROBE = rg.Loop.ORIGIN


def _nonempty(res, a, b, op):
    if res.loops:
        return True
    ia, ib = _member(a, _PROBE), _member(b, _PROBE)
    return {"intersection": ia and ib, "difference": ia and not ib}[op]


def test_cell_range_loop_relations():
    rng = np.random.RandomState(123455)
    done = 0
    while done < 40:
        num = int(rng.randint(0, 1 << 63, dtype=np.int64)) | 1
        base = np.uint64(num)
        face = int(base >> np.uint64(61))
        if face > 5:
            continue
        # parent at a random level (4..10 keeps loops small enough)
        plvl = rng.randint(4, 11)
        begin = int(c.parent(np.array([base], dtype=np.uint64), plvl)[0])

        def skewed():
            return rng.randint(0, 1 << rng.randint(0, 7))

        a_begin = _advance(begin, skewed())
        a_end = _advance(a_begin, skewed() + 1)
        b_begin = _advance(begin, skewed())
        b_end = _advance(b_begin, skewed() + 1)
        # validity: stay on the sphere (advance clamps/wraps; require
        # strictly increasing biased order and same level throughout)
        ids = [a_begin, a_end, b_begin, b_end]
        if any(
            int(c.level(np.array([i], dtype=np.uint64))[0]) != plvl for i in ids
        ):
            continue
        if not (_biased(a_begin) < _biased(a_end) and _biased(b_begin) < _biased(b_end)):
            continue

        a = make_cell_loop(a_begin, a_end)
        b = make_cell_loop(b_begin, b_end)
        contained = _biased(a_begin) <= _biased(b_begin) and _biased(b_end) <= _biased(a_end)
        intersects = _biased(a_begin) < _biased(b_end) and _biased(b_begin) < _biased(a_end)

        got_contains = not _nonempty(
            bo.boolean_op(b, a, "difference"), b, a, "difference"
        )
        got_intersects = _nonempty(
            bo.boolean_op(a, b, "intersection"), a, b, "intersection"
        )
        na = len(a.loops[0].vertices)
        nb = len(b.loops[0].vertices)
        assert got_contains == contained, (na, nb, contained)
        assert got_intersects == intersects, (na, nb, intersects)
        done += 1
    assert done == 40
