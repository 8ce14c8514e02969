"""Bit-exactness tests for the cell-id codec.

Mirrors reference fixtures in
tests/tests/com/google/common/geometry/S2CellIdTest.java (cited per test).
"""

import numpy as np
import pytest

from s2_geometry_library_java_spark.kernel import cellid as c


def cell_from_deg(lat, lng, level=c.MAX_LEVEL):
    return c.latlng_degrees_to_cell_id(np.float64(lat), np.float64(lng), level)


def test_face_definitions():
    # S2CellIdTest.java:65-72
    cases = [(0, 0, 0), (0, 90, 1), (90, 0, 2), (0, 180, 3), (0, -90, 4), (-90, 0, 5)]
    lat = np.array([x[0] for x in cases], dtype=np.float64)
    lng = np.array([x[1] for x in cases], dtype=np.float64)
    ids = c.latlng_degrees_to_cell_id(lat, lng)
    assert list(c.face(ids)) == [x[2] for x in cases]


def test_face_center_leaf_ids():
    # The leaf cell of each face center is (face<<61)|2^60|1 (cross-impl
    # constant, e.g. C++ S2CellId(S2LatLng(0,0)).id() == 0x1000000000000001).
    # (0,180) is excluded: sin(pi)=1.22e-16 (not 0) places it one leaf off
    # the face-3 center — the reference behaves identically (its test only
    # asserts face()==3 there).
    cases = [(0, (0, 0)), (1, (0, 90)), (2, (90, 0)), (4, (0, -90)), (5, (-90, 0))]
    for f, (la, ln) in cases:
        got = int(cell_from_deg(la, ln))
        expect = (f << 61) | (1 << 60) | 1
        assert got == expect, f"face {f}: {got:016x} != {expect:016x}"


def test_parent_child_relationships():
    # S2CellIdTest.java:104-127
    cid = c.from_face_pos_level(3, 0x12345678, c.MAX_LEVEL - 4)
    assert bool(c.is_valid(cid))
    assert int(c.face(cid)) == 3
    assert int(c.pos(cid)) == 0x12345700
    assert int(c.level(cid)) == c.MAX_LEVEL - 4
    assert not bool(c.is_leaf(cid))

    assert int(c.parent(cid, c.MAX_LEVEL - 4)) == int(cid)
    assert int(c.pos(c.child_begin(cid, c.MAX_LEVEL - 2))) == 0x12345610
    assert int(c.pos(c.child_begin(cid))) == 0x12345640
    assert int(c.pos(c.immediate_parent(cid))) == 0x12345400
    assert int(c.pos(c.parent(cid, c.MAX_LEVEL - 6))) == 0x12345000

    # ordering of children relative to parents (unsigned compare)
    assert int(c.child_begin(cid)) < int(cid)
    assert int(c.child_end(cid)) > int(cid)
    nxt = c.next_cell(c.next_cell(c.next_cell(c.next_cell(c.child_begin(cid)))))
    assert int(c.child_end(cid)) == int(nxt)
    assert int(c.range_min(cid)) == int(c.child_begin(cid, c.MAX_LEVEL))
    assert int(c.next_cell(c.range_max(cid))) == int(c.child_end(cid, c.MAX_LEVEL))
    # cells are represented by center position on the curve
    assert 2 * int(cid) == int(c.range_min(cid)) + int(c.range_max(cid))


def test_center_si_ti():
    # S2CellIdTest.java:164-197: center (si,ti) ends in 1 followed by
    # (30 - level) zeros.
    cid = c.from_face_pos_level(3, 0x12345678, c.MAX_LEVEL)
    for down in [0, 1, 2, 10, 20, 30]:
        p = c.parent(cid, c.MAX_LEVEL - down)
        _, si, ti = c.get_center_si_ti(p)
        mask = (1 << (down + 1)) - 1
        assert int(si) & mask == 1 << down
        assert int(ti) & mask == 1 << down


def test_tokens():
    # S2CellIdTest.java:75-94 + token roundtrips (:300-313)
    assert bool(c.is_valid(c.from_token(["1"]))[0])
    assert bool(c.is_valid(c.from_token(["123456789abcdef1"]))[0])
    assert not bool(c.is_valid(c.from_token(["0"]))[0])
    assert bool(c.is_valid(c.from_token(["89c25"]))[0])
    assert not bool(c.is_valid(c.from_token(["89c26"]))[0])
    assert c.to_token(np.uint64(0))[0] == "X"
    assert int(c.from_token(["X"])[0]) == 0

    rng = np.random.RandomState(123455)
    lat = rng.uniform(-90, 90, 10000)
    lng = rng.uniform(-180, 180, 10000)
    lvl = rng.randint(0, 31, 10000)
    ids = c.parent(c.latlng_degrees_to_cell_id(lat, lng), lvl)
    back = c.from_token(c.to_token(ids))
    assert np.array_equal(ids, back)
    # token of fromFace(0) is "1"
    assert c.to_token(c.from_face(0))[0] == "1"


def test_roundtrip_latlng_200k():
    # S2CellIdTest.java:258-268: fromLatLng(toLatLng(id)) == id for leaves.
    rng = np.random.RandomState(123455)
    lat = rng.uniform(-90, 90, 200000)
    lng = rng.uniform(-180, 180, 200000)
    ids = c.latlng_degrees_to_cell_id(lat, lng)
    assert bool(np.all(c.is_valid(ids)))
    assert bool(np.all(c.is_leaf(ids)))
    la2, ln2 = c.cell_id_to_latlng(ids)
    ids2 = c.latlng_to_cell_id(la2, ln2)
    assert np.array_equal(ids, ids2)


def test_roundtrip_xyz_coverage_bound():
    # S2CellIdTest.java:428-436: angle(p, center(fromPoint(p))) <=
    # 0.5 * MAX_DIAG at level 30.
    rng = np.random.RandomState(123455)
    v = rng.normal(size=(3, 100000))
    v /= np.sqrt((v * v).sum(axis=0))
    x, y, z = v
    ids = c.xyz_to_cell_id(x, y, z)
    cx, cy, cz = c.cell_id_to_xyz(ids)
    dot = x * cx + y * cy + z * cz
    crx, cry, crz = y * cz - z * cy, z * cx - x * cz, x * cy - y * cx
    ang = np.arctan2(np.sqrt(crx * crx + cry * cry + crz * crz), dot)
    max_diag_30 = 2.438654594434021032 * 2.0 ** (-30)  # MAX_DIAG_DERIV * 2^-level
    assert float(ang.max()) <= 0.5 * max_diag_30 + 1e-15


def test_containment_vs_explicit_parent_map():
    # S2CellIdTest.java:366-391: contains/intersects over all cells to level 3
    # vs an explicit parent relation.
    ids = []
    parent_of = {}

    def recurse(cid, lvl):
        ids.append(cid)
        if lvl < 3:
            for p in range(4):
                ch = int(c.child(np.uint64(cid), p))
                parent_of[ch] = cid
                recurse(ch, lvl + 1)

    for f in range(6):
        recurse(int(c.from_face(f)), 0)

    def is_ancestor(a, b):  # a contains b
        while True:
            if a == b:
                return True
            if b not in parent_of:
                return False
            b = parent_of[b]

    arr = np.array(ids, dtype=np.uint64)
    for a in ids[:: 7]:  # sample the left side to keep runtime sane
        expect = np.array([is_ancestor(a, b) for b in ids])
        got = c.contains(np.uint64(a), arr)
        assert np.array_equal(got, expect)
        expect_i = np.array(
            [is_ancestor(a, b) or is_ancestor(b, a) for b in ids]
        )
        got_i = c.intersects(np.uint64(a), arr)
        assert np.array_equal(got_i, expect_i)


def test_continuity_level8():
    # S2CellIdTest.java:399-416: along the curve at a fixed level,
    # successive cell centers are within max edge distance.
    lvl = 8
    ncells = 6 * 4**lvl
    start = c.begin(lvl)
    ids = c.advance(np.full(ncells, int(start), dtype=np.uint64), np.arange(ncells))
    x, y, z = c.cell_id_to_xyz_raw(ids)
    n = np.sqrt(x * x + y * y + z * z)
    x, y, z = x / n, y / n, z / n
    x2, y2, z2 = np.roll(x, -1), np.roll(y, -1), np.roll(z, -1)
    ang = np.arccos(np.clip(x * x2 + y * y2 + z * z2, -1, 1))
    max_walk = 1.704897179199218452 * 2.0 ** (-lvl)  # MAX_ANGLE_SPAN deriv
    assert float(ang.max()) <= max_walk


def test_advance_and_wrapping():
    # S2CellIdTest.java:219-244 (subset without wrap variants)
    assert int(c.advance(c.begin(0), 7)) == int(c.end(0))
    assert int(c.advance(c.begin(0), 12)) == int(c.end(0))
    assert int(c.advance(c.end(0), -7)) == int(c.begin(0))
    assert int(c.advance(c.end(0), -12000000)) == int(c.begin(0))
    num5 = 6 << (2 * 5)
    assert int(c.advance(c.end(5), 500 - num5)) == int(c.advance(c.begin(5), 500))
    cid = c.from_face_pos_level(3, 0x12345678, c.MAX_LEVEL - 4)
    assert int(c.advance(c.child_begin(cid, c.MAX_LEVEL), 256)) == int(
        c.child_begin(c.next_cell(cid), c.MAX_LEVEL)
    )
    assert int(
        c.advance(c.from_face_pos_level(1, 0, c.MAX_LEVEL), 4 << (2 * c.MAX_LEVEL))
    ) == int(c.from_face_pos_level(5, 0, c.MAX_LEVEL))
    # distance_from_begin (S2CellIdTest.java:246-256)
    assert int(c.distance_from_begin(c.end(0))) == 6
    assert int(c.distance_from_begin(c.end(c.MAX_LEVEL))) == 6 * (1 << (2 * c.MAX_LEVEL))


def test_common_ancestor_level():
    # S2CellIdTest.java:270-298 (representative subset)
    f0 = c.from_face(0)
    assert int(c.common_ancestor_level(f0, f0)) == 0
    assert int(c.common_ancestor_level(f0, c.child_begin(f0, 30))) == 0
    assert int(c.common_ancestor_level(f0, c.from_face(5))) == -1
    a = c.child_begin(c.child_begin(f0, 9), 30)
    b = c.child_begin(c.child_begin(f0, 10), 30)
    # both under the level-9 child's level-10 begin... compute expected via parents
    assert int(c.common_ancestor_level(a, b)) >= 0
    left = c.child_begin(c.from_face(0), 30)
    right = c.child_end(c.from_face(0), 30)
    assert int(c.common_ancestor_level(left, c.prev_cell(right))) == 0


def test_biased_ordering():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-90, 90, 5000)
    lng = rng.uniform(-180, 180, 5000)
    ids = c.latlng_degrees_to_cell_id(lat, lng)
    biased = c.to_biased(ids)
    order_u = np.argsort(ids, kind="stable")
    order_b = np.argsort(biased, kind="stable")
    assert np.array_equal(order_u, order_b)
    assert np.array_equal(c.from_biased(biased), ids)


def test_inverse_ij_roundtrip():
    rng = np.random.RandomState(42)
    f = rng.randint(0, 6, 50000)
    i = rng.randint(0, c.MAX_SIZE, 50000)
    j = rng.randint(0, c.MAX_SIZE, 50000)
    ids = c.from_face_ij(f, i, j)
    f2, i2, j2, _orient = c.to_face_ij_orientation(ids)
    assert np.array_equal(f, f2)
    assert np.array_equal(i, i2)
    assert np.array_equal(j, j2)


def test_wide_stride_hilbert_bit_equal_4bit():
    """The 6-bit (5-pass) Hilbert tables are bit-equal to the reference's
    4-bit (8-pass) stride (S2CellId.java:1206-1304) on random + corner ij."""
    rng = np.random.RandomState(1234)
    n = 100000
    f = rng.randint(0, 6, n)
    i = rng.randint(0, c.MAX_SIZE, n)
    j = rng.randint(0, c.MAX_SIZE, n)
    fe = np.repeat(np.arange(6), 4)
    ie = np.tile([0, c.MAX_SIZE - 1, 0, c.MAX_SIZE - 1], 6)
    je = np.tile([0, 0, c.MAX_SIZE - 1, c.MAX_SIZE - 1], 6)
    f = np.concatenate([f, fe]); i = np.concatenate([i, ie]); j = np.concatenate([j, je])
    ids = c.from_face_ij(f, i, j)
    assert np.array_equal(ids, c._from_face_ij_4bit(f, i, j))
    lvl = rng.randint(0, 31, ids.shape[0])
    pids = c.parent(ids, lvl)
    for a, b in zip(c.to_face_ij_orientation(pids), c._to_face_ij_orientation_4bit(pids)):
        assert np.array_equal(a, b)


def test_uv_gather_bit_equal_select():
    """Gather-form face/UV transform is bit-equal to the reference-form
    per-face expressions (S2Projections.java:348-415), incl. axis points
    and face-boundary ties."""
    rng = np.random.RandomState(99)
    v = rng.normal(size=(100000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    special = np.array(
        [[1, 0, 0], [0, 1, 0], [0, 0, 1], [-1, 0, 0], [0, -1, 0], [0, 0, -1],
         [1, 1, 1], [1, 1, -1], [-1, 1, 1], [1, -1, 1], [-1, -1, -1],
         [1, 1, 0], [0, 1, 1], [1, 0, 1], [-1, 1, 0], [0, -1, 1]], dtype=float)
    special /= np.linalg.norm(special, axis=1, keepdims=True)
    v = np.vstack([v, special])
    x, y, z = v[:, 0].copy(), v[:, 1].copy(), v[:, 2].copy()
    face = c.xyz_to_face(x, y, z)
    # reference-form face selection
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    largest = np.where(ax > ay, np.where(ax > az, 0, 2), np.where(ay > az, 1, 2))
    comp = np.where(largest == 0, x, np.where(largest == 1, y, z))
    assert np.array_equal(face, np.where(comp < 0, largest + 3, largest))
    u1, v1 = c.face_xyz_to_uv(face, x, y, z)
    u2, v2 = c._face_xyz_to_uv_select(face, x, y, z)
    assert np.array_equal(u1, u2)
    assert np.array_equal(v1, v2)
