"""F5 closest-edge query: ring-probe + JVM edge distance == numpy brute
force (the knn_brute/knn_cell pairing pattern for edges)."""

import numpy as np

from s2_geometry_library_java_spark.kernel import cellid as s2
from s2_geometry_library_java_spark.kernel import edges as ek
from s2_geometry_library_java_spark.operators import closestedge
from s2_geometry_library_java_spark.operators import shapes as shape_ops


def test_closest_edges_matches_bruteforce(spark):
    rng = np.random.default_rng(31)
    texts = []
    geoms = {}
    for s in range(6):
        clat = float(rng.uniform(-50, 50))
        clng = float(rng.uniform(-160, 160))
        h = float(rng.uniform(3, 7))
        pts = [
            (clat - h, clng - h),
            (clat - h, clng + h),
            (clat + h, clng + h),
            (clat + h, clng - h),
        ]
        text = ", ".join(f"{la!r}:{ln!r}" for la, ln in pts)
        texts.append((f"s{s}", text))
        from s2_geometry_library_java_spark.kernel import region as rg

        geoms[f"s{s}"] = rg.Polygon.from_text(text).loops[0].vertices
    shapes = spark.createDataFrame(texts, "shape_id string, text string")
    idx = shape_ops.shape_index_df(shapes, min_level=4)

    nq = 60
    v = rng.normal(size=(nq, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    lat, lng = s2.xyz_to_latlng(v[:, 0], v[:, 1], v[:, 2])
    qdf = spark.createDataFrame(
        [(i, float(np.degrees(lat[i])), float(np.degrees(lng[i]))) for i in range(nq)],
        "query_id long, lat double, lng double",
    )
    got = {}
    for r in closestedge.closest_edges(idx, qdf, k=3, level=4).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["shape_id"], r["edge_id"], r["chord2"])
        )
    # brute force with the numpy kernel over every (shape, edge)
    all_edges = []
    for sid, verts in geoms.items():
        vb = np.roll(verts, -1, axis=0)
        for e in range(len(verts)):
            all_edges.append((sid, e, verts[e], vb[e]))
    for i in range(nq):
        d = [
            (
                float(ek.min_chord2_to_edges(v[i][None], a[None], b[None])[0]),
                sid,
                e,
            )
            for sid, e, a, b in all_edges
        ]
        d.sort()
        want = [(rk + 1, sid, e) for rk, (_, sid, e) in enumerate(d[:3])]
        have = sorted(got[i])
        assert [(r, s, e) for r, s, e, _ in have] == want, (i, have, want)
        # distances agree to FP noise (the query xyz round-trips through
        # lat/lng degrees on the Spark side; bit parity on identical xyz is
        # asserted separately below)
        for (rk, sid, e, c2), (dd, _, _) in zip(have, d[:3]):
            assert abs(c2 - dd) < 1e-14, (c2, dd)


def test_edge_chord2_column_bit_matches_kernel(spark):
    """edge_min_chord2_cols (JVM) == kernel/edges.min_chord2_to_edges
    (numpy) bit-for-bit on identical xyz inputs."""
    from pyspark.sql import functions as F

    rng = np.random.default_rng(5)
    v = rng.normal(size=(120, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    p, a, b = v[:40], v[40:80], v[80:]
    rows = [
        tuple(float(x) for x in np.concatenate([p[i], a[i], b[i]]))
        for i in range(40)
    ]
    df = spark.createDataFrame(
        rows, "px double, py double, pz double, ax double, ay double, az double, bx double, by double, bz double"
    )
    got = [
        r["c2"]
        for r in df.select(
            closestedge.edge_min_chord2_cols(
                F.col("px"), F.col("py"), F.col("pz"),
                F.col("ax"), F.col("ay"), F.col("az"),
                F.col("bx"), F.col("by"), F.col("bz"),
            ).alias("c2")
        ).collect()
    ]
    want = ek.min_chord2_to_edges(p, a, b)
    assert got == list(want), (got[:3], want[:3])


def test_furthest_edges_antipode_identity(spark):
    """F5 furthest-edge query: results equal the numpy brute maximum-
    distance ranking (max over edge points, per the reference semantics)."""
    import numpy as np

    from s2_geometry_library_java_spark.kernel import cellid as ci
    from s2_geometry_library_java_spark.kernel import edges as ek
    from s2_geometry_library_java_spark.kernel import region as rg
    from s2_geometry_library_java_spark.operators import closestedge
    from s2_geometry_library_java_spark.operators import shapes as shape_ops

    texts = {
        "s0": "0.0:0.0, 0.0:10.0, 10.0:10.0, 10.0:0.0",
        "s1": "-30.0:60.0, -30.0:70.0, -20.0:70.0, -20.0:60.0",
    }
    shapes = spark.createDataFrame(
        list(texts.items()), "shape_id string, text string"
    )
    idx = shape_ops.shape_index_df(shapes, min_level=4)
    qs = [(1, 5.0, 5.0), (2, -40.0, -120.0), (3, 70.0, 30.0)]
    queries = spark.createDataFrame(qs, "query_id long, lat double, lng double")
    got = {
        (r["query_id"], r["rank"]): (r["shape_id"], r["edge_id"], r["chord2"])
        for r in closestedge.furthest_edges(idx, queries, k=2, level=4).collect()
    }
    # brute: per query, max chord2 over each edge's points
    edges = []
    for sid, t in texts.items():
        v = rg.Polygon.from_text(t).loops[0].vertices
        for e in range(4):
            edges.append((sid, e, v[e], v[(e + 1) % 4]))
    for qid, la, ln in qs:
        x, y, z = ci.latlng_to_xyz(np.radians(la), np.radians(ln))
        p = np.array([float(x), float(y), float(z)])
        scored = []
        for sid, e, a, b in edges:
            far = float(ek.max_chord2_to_edges(p[None], a[None], b[None])[0])
            # rank by near-chord2 of the antipode ascending == far desc,
            # ties by (shape, edge) — replicate the operator's order
            scored.append((4.0 - far, sid, e, far))
        scored.sort()
        for rank in (1, 2):
            wsid, we, wfar = scored[rank - 1][1], scored[rank - 1][2], scored[rank - 1][3]
            gsid, ge, gfar = got[(qid, rank)]
            assert (gsid, ge) == (wsid, we), (qid, rank)
            assert abs(gfar - wfar) < 1e-9


def test_furthest_covering_seed_engages_on_clustered_index(spark, monkeypatch):
    """Max-distance covering seed (NOTES_ROUND3 gap): with a CLUSTERED
    index, the antipode query points are far from every index cell, so
    the covering-pruned path must handle them (zero ring rounds for those
    queries) and the results still equal the brute max-distance ranking."""
    import numpy as np

    from s2_geometry_library_java_spark.kernel import cellid as ci
    from s2_geometry_library_java_spark.kernel import edges as ek
    from s2_geometry_library_java_spark.kernel import region as rg
    from s2_geometry_library_java_spark.operators import closestedge
    from s2_geometry_library_java_spark.operators import shapes as shape_ops

    # all shapes inside one ~2-degree patch: a clustered index
    texts = {
        f"s{i}": f"{10 + 0.4 * i}:{20.0}, {10 + 0.4 * i}:{20.6}, "
                 f"{10.3 + 0.4 * i}:{20.6}, {10.3 + 0.4 * i}:{20.0}"
        for i in range(4)
    }
    shapes = spark.createDataFrame(
        list(texts.items()), "shape_id string, text string"
    )
    idx = shape_ops.shape_index_df(shapes, min_level=4)
    # queries near the cluster: their ANTIPODES are far from every cell
    qs = [(1, 11.0, 20.3), (2, 12.0, 20.1)]
    queries = spark.createDataFrame(qs, "query_id long, lat double, lng double")

    calls = {"covering": 0}
    real = closestedge.covering_pruned_edges

    def spy(*a, **k):
        calls["covering"] += 1
        return real(*a, **k)

    monkeypatch.setattr(closestedge, "covering_pruned_edges", spy)
    got = {
        (r["query_id"], r["rank"]): (r["shape_id"], r["edge_id"], r["chord2"])
        for r in closestedge.furthest_edges(
            idx, queries, k=2, level=4, covering_seed=True
        ).collect()
    }
    assert calls["covering"] == 1, "covering seed did not engage"

    edges = []
    for sid, t in texts.items():
        v = rg.Polygon.from_text(t).loops[0].vertices
        for e in range(4):
            edges.append((sid, e, v[e], v[(e + 1) % 4]))
    for qid, la, ln in qs:
        x, y, z = ci.latlng_to_xyz(np.radians(la), np.radians(ln))
        p = np.array([float(x), float(y), float(z)])
        scored = []
        for sid, e, a, b in edges:
            far = float(ek.max_chord2_to_edges(p[None], a[None], b[None])[0])
            scored.append((4.0 - far, sid, e, far))
        scored.sort()
        for rank in (1, 2):
            wsid, we, wfar = scored[rank - 1][1], scored[rank - 1][2], scored[rank - 1][3]
            gsid, ge, gfar = got[(qid, rank)]
            assert (gsid, ge) == (wsid, we), (qid, rank)
            assert abs(gfar - wfar) < 1e-9


def test_furthest_covering_seed_auto_threshold(spark, monkeypatch):
    """covering_seed="auto" (the default) engages the covering-pruned path
    iff the index edge count reaches AUTO_COVERING_SEED_EDGES, with
    identical results either way."""
    from s2_geometry_library_java_spark.operators import closestedge
    from s2_geometry_library_java_spark.operators import shapes as shape_ops

    texts = {
        f"s{i}": f"{10 + 0.4 * i}:{20.0}, {10 + 0.4 * i}:{20.6}, "
                 f"{10.3 + 0.4 * i}:{20.6}, {10.3 + 0.4 * i}:{20.0}"
        for i in range(4)
    }
    shapes = spark.createDataFrame(
        list(texts.items()), "shape_id string, text string"
    )
    idx = shape_ops.shape_index_df(shapes, min_level=4)
    qs = [(1, 11.0, 20.3), (2, 12.0, 20.1)]
    queries = spark.createDataFrame(qs, "query_id long, lat double, lng double")

    calls = {"covering": 0}
    real = closestedge.covering_pruned_edges

    def spy(*a, **k):
        calls["covering"] += 1
        return real(*a, **k)

    monkeypatch.setattr(closestedge, "covering_pruned_edges", spy)

    def run():
        return sorted(
            (r["query_id"], r["rank"], r["shape_id"], r["edge_id"],
             round(r["chord2"], 12))
            for r in closestedge.furthest_edges(idx, queries, k=2, level=4).collect()
        )

    # 16 indexed edges: below the default threshold -> ring path
    monkeypatch.setattr(closestedge, "AUTO_COVERING_SEED_EDGES", 50_000)
    base = run()
    assert calls["covering"] == 0, "seed engaged below the auto threshold"

    # threshold of 1: the same call auto-routes through the covering seed
    monkeypatch.setattr(closestedge, "AUTO_COVERING_SEED_EDGES", 1)
    seeded = run()
    assert calls["covering"] == 1, "auto seed did not engage"
    assert seeded == base


def test_conservative_max_distance_no_under_reporting(spark):
    """Round-4 verdict #5 'done' criterion: points whose TRUE distance
    equals the cap but whose computed chord2 lands 1-2 ulps above it
    (FP rounding) are dropped by the raw inclusive cap but MUST survive
    setConservativeMaxDistance's error-padded cap
    (S2ClosestPointQuery.java:174-186)."""
    import numpy as np

    from s2_geometry_library_java_spark.kernel import sphere
    from s2_geometry_library_java_spark.operators import knn

    r = 0.37  # radians; all index points at ~this angle from q
    qlat, qlng = 10.0, 40.0
    n = 512
    bearings = np.linspace(0.0, 2 * np.pi, n, endpoint=False)
    # rotate: point at angular distance r from q along each bearing
    qlat_r, qlng_r = np.radians(qlat), np.radians(qlng)
    lat = np.arcsin(
        np.sin(qlat_r) * np.cos(r) + np.cos(qlat_r) * np.sin(r) * np.cos(bearings)
    )
    lng = qlng_r + np.arctan2(
        np.sin(bearings) * np.sin(r) * np.cos(qlat_r),
        np.cos(r) - np.sin(qlat_r) * np.sin(lat),
    )
    idx = spark.createDataFrame(
        [(i, float(np.degrees(lat[i])), float(np.degrees(lng[i])))
         for i in range(n)],
        "id long, lat double, lng double",
    )
    qdf = spark.createDataFrame(
        [(0, qlat, qlng)], "query_id long, lat double, lng double"
    )
    # TRUE distances: extended-precision chord2 from the very float64 xyz
    # the operator itself uses (collected from its projection) — the
    # conservative bound covers the distance CALCULATION error, given the
    # index points as stored
    ix = knn._with_xyz(idx, "lat", "lng", "i").orderBy("id").collect()
    qx = knn._with_xyz(qdf, "lat", "lng", "q").collect()[0]
    X = np.array([[row["ix"], row["iy"], row["iz"]] for row in ix],
                 dtype=np.longdouble)
    Q = np.array([qx["qx"], qx["qy"], qx["qz"]], dtype=np.longdouble)
    true_chord2 = ((X - Q) ** 2).sum(axis=1)
    computed = {
        row["neighbor_id"]: row["chord2"]
        for row in knn.knn_bruteforce(idx, qdf, k=n).collect()
    }
    assert len(computed) == n
    # cap chosen so at least one point has TRUE distance within the cap
    # but computed float64 chord2 a few ulps above it
    cap = float(np.median([computed[i] for i in range(n)]))
    within_true = {i for i in range(n) if true_chord2[i] <= cap}
    missed_by_raw = {
        i for i in within_true if computed[i] > cap
    }
    assert missed_by_raw, "fixture must produce true<=cap<computed points"
    raw_ids = {
        row["neighbor_id"]
        for row in knn.knn_bruteforce(idx, qdf, k=n, max_chord2=cap).collect()
    }
    assert missed_by_raw & (within_true - raw_ids), (
        "raw inclusive cap should under-report the ulp-above points"
    )
    cons_ids = {
        row["neighbor_id"]
        for row in knn.knn_bruteforce(
            idx, qdf, k=n, max_chord2=cap, distance_cap="conservative"
        ).collect()
    }
    assert within_true <= cons_ids, (
        f"conservative cap under-reported {sorted(within_true - cons_ids)[:5]}"
    )
    # and the pad is tight: a point 1e-6 rad beyond the cap stays excluded
    far_chord2 = float(sphere.chord2_from_angle(r + 1e-6))
    assert sphere.conservative_max_chord2(float(cap)) < far_chord2


def test_conservative_cap_on_closest_edges(spark):
    """closest_edges exposes the same option (edge error bound)."""
    shapes_df = spark.createDataFrame(
        [("s0", "10.0:20.0, 10.0:30.0, 20.0:30.0, 20.0:20.0")],
        "shape_id string, text string",
    ).coalesce(1)
    idx = shape_ops.shape_index_df(shapes_df, min_level=4)
    qdf = spark.createDataFrame(
        [(0, 15.0, 40.0)], "query_id long, lat double, lng double"
    )
    base = closestedge.closest_edges(idx, qdf, k=1, level=4).collect()
    d = base[0]["chord2"]
    kept = closestedge.closest_edges(
        idx, qdf, k=1, level=4, max_chord2=d, distance_cap="conservative"
    ).count()
    assert kept == 1
    dropped = closestedge.closest_edges(
        idx, qdf, k=1, level=4,
        max_chord2=float(np.nextafter(d, 0.0)), distance_cap="inclusive"
    ).count()
    assert dropped == 0


def test_include_interiors_closest(spark):
    """Options.includeInteriors (S2BestEdgesQueryBase.java:399,410): a
    query point inside a polygon gets a distance-zero interior result
    with edge_id = -1 ranked FIRST; outside points are unchanged."""
    shapes_df = spark.createDataFrame(
        [
            ("s0", "10.0:20.0, 10.0:30.0, 20.0:30.0, 20.0:20.0"),
            ("s1", "-40.0:-120.0, -40.0:-110.0, -30.0:-110.0, -30.0:-120.0"),
        ],
        "shape_id string, text string",
    ).coalesce(1)
    idx = shape_ops.shape_index_df(shapes_df, min_level=4)
    qdf = spark.createDataFrame(
        [(0, 15.0, 25.0),      # inside s0
         (1, -35.0, -115.0),   # inside s1
         (2, 15.0, 40.0)],     # outside both
        "query_id long, lat double, lng double",
    )
    rows = {
        r["query_id"]: r
        for r in closestedge.closest_edges(
            idx, qdf, k=1, level=4, interiors=shapes_df
        ).collect()
    }
    assert rows[0]["shape_id"] == "s0" and rows[0]["edge_id"] == -1
    assert rows[0]["chord2"] == 0.0 and rows[0]["rank"] == 1
    assert rows[1]["shape_id"] == "s1" and rows[1]["edge_id"] == -1
    # outside point: a normal edge result, identical to the no-option run
    base = closestedge.closest_edges(idx, qdf, k=1, level=4).collect()
    base2 = {r["query_id"]: r for r in base}[2]
    assert rows[2]["edge_id"] == base2["edge_id"] >= 0
    assert rows[2]["chord2"] == base2["chord2"]


def test_include_interiors_topk_merge(spark):
    """k=2 inside a shape: rank 1 is the interior zero, rank 2 the true
    nearest boundary edge (the reference Result ordering — interior rows
    merge into the same top-k, S2BestEdgesQueryBase.java:317)."""
    shapes_df = spark.createDataFrame(
        [("s0", "10.0:20.0, 10.0:30.0, 20.0:30.0, 20.0:20.0")],
        "shape_id string, text string",
    ).coalesce(1)
    idx = shape_ops.shape_index_df(shapes_df, min_level=4)
    qdf = spark.createDataFrame(
        [(0, 15.0, 25.0)], "query_id long, lat double, lng double"
    )
    rows = sorted(
        closestedge.closest_edges(
            idx, qdf, k=2, level=4, interiors=shapes_df
        ).collect(),
        key=lambda r: r["rank"],
    )
    assert [r["rank"] for r in rows] == [1, 2]
    assert rows[0]["edge_id"] == -1 and rows[0]["chord2"] == 0.0
    assert rows[1]["edge_id"] >= 0 and rows[1]["chord2"] > 0.0
    base = closestedge.closest_edges(idx, qdf, k=1, level=4).collect()[0]
    assert (rows[1]["shape_id"], rows[1]["edge_id"], rows[1]["chord2"]) == (
        base["shape_id"], base["edge_id"], base["chord2"]
    )


def test_include_interiors_furthest_antipode(spark):
    """S2FurthestEdgeQuery interiors (S2FurthestEdgeQuery.java:369-381):
    a shape containing the query's ANTIPODE yields an interior result at
    the maximum distance chord2 = 4.0."""
    shapes_df = spark.createDataFrame(
        [("s0", "10.0:20.0, 10.0:30.0, 20.0:30.0, 20.0:20.0")],
        "shape_id string, text string",
    ).coalesce(1)
    idx = shape_ops.shape_index_df(shapes_df, min_level=4)
    # antipode of (15, 25) is (-15, -155): query from there
    qdf = spark.createDataFrame(
        [(0, -15.0, -155.0), (1, 15.0, 40.0)],
        "query_id long, lat double, lng double",
    )
    rows = {
        r["query_id"]: r
        for r in closestedge.furthest_edges(
            idx, qdf, k=1, level=4, interiors=shapes_df, covering_seed=False
        ).collect()
    }
    assert rows[0]["edge_id"] == -1 and rows[0]["chord2"] == 4.0
    assert rows[0]["shape_id"] == "s0" and rows[0]["rank"] == 1
    # antipode of (15, 40) = (-15, -140): outside s0 — normal edge result
    assert rows[1]["edge_id"] >= 0 and rows[1]["chord2"] < 4.0


def test_max_error_early_exit(spark):
    """Options.maxError (S2BestEdgesQueryBase.java:467-484): relaxing the
    ring completeness bound by maxError lets borderline queries finish in
    the first ring round — fewer Spark jobs — while the returned distance
    stays within maxError of the exact answer."""
    from s2_geometry_library_java_spark.kernel import sphere

    lvl = 8
    w = float(sphere.metric_value(sphere.MIN_WIDTH_DERIV, lvl))
    d_deg = float(np.degrees(1.5 * w))
    # long quad whose near edge passes ~1.5*MIN_WIDTH(lvl) from the query:
    # inside the 3x3 ring (candidates found) but past the strict bound, so
    # the exact run must retry at coarser levels / brute
    text = f"{d_deg!r}:-10.0, {d_deg!r}:10.0, {d_deg + 5.0!r}:10.0, {d_deg + 5.0!r}:-10.0"
    shapes_df = spark.createDataFrame(
        [("s0", text)], "shape_id string, text string"
    ).coalesce(1)
    idx = shape_ops.shape_index_df(shapes_df, min_level=lvl)
    qdf = spark.createDataFrame(
        [(0, 0.0, 0.0)], "query_id long, lat double, lng double"
    )
    sc = spark.sparkContext
    tr = sc.statusTracker()
    sc.setJobGroup("me-exact", "")
    exact = closestedge.closest_edges(idx, qdf, k=1, level=lvl).collect()
    n_exact = len(tr.getJobIdsForGroup("me-exact"))
    sc.setJobGroup("me-approx", "")
    approx = closestedge.closest_edges(
        idx, qdf, k=1, level=lvl, max_error_rad=w
    ).collect()
    n_approx = len(tr.getJobIdsForGroup("me-approx"))
    sc.setJobGroup(None, None)
    a_exact = 2 * np.arcsin(0.5 * np.sqrt(exact[0]["chord2"]))
    a_approx = 2 * np.arcsin(0.5 * np.sqrt(approx[0]["chord2"]))
    # the option's contract: within maxError of the true best
    assert a_approx <= a_exact + w + 1e-12
    # and the distributed payoff: strictly fewer jobs (round-1 finish)
    assert n_approx < n_exact
    # on this fixture the in-ring edge IS the true best, so results match
    assert approx[0]["edge_id"] == exact[0]["edge_id"]
    assert approx[0]["chord2"] == exact[0]["chord2"]
