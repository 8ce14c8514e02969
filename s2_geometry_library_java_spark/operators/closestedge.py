"""F5: closest-edge queries — nearest shape boundaries to each query point.

Semantics follow S2ClosestEdgeQuery (S2ClosestEdgeQuery.java:158 over
S2BestEdgesQueryBase): results ordered by S1ChordAngle length2, here over
the DataFrame shape index (operators/shapes.shape_index_df) instead of a
per-query priority queue:

1. the index is built with a uniform min_level floor and keyed by
   parent(cell, L);
2. each query probes its level-L cell plus the 8 ring neighbors (A13) and
   equi-joins the index key — candidates are every edge indexed within one
   cell of the query;
3. the exact point-edge chord distance runs as PURE JVM Column arithmetic
   (edge_min_chord2_cols below — the same op order as the numpy A21 kernel
   kernel/edges.min_chord2_to_edges, so the two paths agree bit-for-bit),
   inside whole-stage codegen, no Python;
4. per-query top-k by (chord2, shape_id, edge_id) window; completeness is
   proved by the ring bound (k-th distance <= MIN_WIDTH(L) means nothing
   outside the 3x3 ring can beat it); unfinished queries fall back to a
   brute broadcast pass over the (distinct) edge set.

The whole search composes as ONE lazy plan: ring rounds, finished/unfinished
splits and the brute remnant chain without driver-side isEmpty() round-trips
(each of those was a full Spark job per round), so the caller's single action
executes the complete search. A round whose ``remaining`` input is empty
contributes an empty union branch — AQE's empty-relation propagation collapses
it at runtime — so the result set is identical to the eager-loop form.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions import columns as cc
from ..functions import udfs
from ..kernel import sphere

_EPS = float(np.finfo(np.float64).eps)

#: index edge count at which covering_seed="auto" turns the max-distance
#: covering seed on (tests patch this): the seed's bounds stage costs a few
#: fixed jobs, which only pays off when the remnant brute would otherwise be
#: |queries| x |edges| over a large edge set.
AUTO_COVERING_SEED_EDGES = 50_000

#: index edge count at or below which the search skips the ring rounds and
#: runs ONE exact pass: every query against the broadcast edge set + one
#: top-k window (the DataFrame form of the reference's brute-force-under-
#: threshold routing, S2ClosestEdgeQuery maxBruteForceIndexSize). Exact by
#: construction — identical results to the ring search, which only accepts
#: a query once its top-k is provably the true top-k. The ring path's fixed
#: job count (persist + per-round join/window rounds) only amortizes on a
#: large edge set; under the threshold one broadcast join is strictly
#: cheaper at every scale (the candidate set is |queries| x n_edges rows,
#: map-side, no index shuffle). Tests patch this.
SMALL_INDEX_BRUTE_EDGES = 256


def edge_min_chord2_cols(px, py, pz, ax, ay, az, bx, by, bz) -> Column:
    """Min squared-chord distance from point P to edge AB as a Column
    expression — op-for-op the numpy kernel (kernel/edges.py
    min_chord2_to_edges, itself maybeUpdateMinInteriorDistance from
    S2EdgeUtil.java:2214-2302): planar acute-angle test, wedge sign test
    against C = (B+A) x (B-A), interior distance XQ^2 + QR^2, endpoint min
    otherwise. Stays inside whole-stage codegen."""
    xa2 = (px - ax) ** 2 + (py - ay) ** 2 + (pz - az) ** 2
    xb2 = (px - bx) ** 2 + (py - by) ** 2 + (pz - bz) ** 2
    ab2 = (ax - bx) ** 2 + (ay - by) ** 2 + (az - bz) ** 2
    endpoint = F.least(xa2, xb2)
    max_error = F.lit(4.75 * _EPS) * (xa2 + xb2 + ab2) + F.lit(8.0 * _EPS * _EPS)
    planar = F.abs(xa2 - xb2) < ab2 + max_error
    # c = (b+a) x (b-a) — the stable robustCrossProd form (2 * a x b)
    sx, sy, sz = bx + ax, by + ay, bz + az
    dx, dy, dz = bx - ax, by - ay, bz - az
    c0 = sy * dz - sz * dy
    c1 = sz * dx - sx * dz
    c2_ = sx * dy - sy * dx
    cnorm2 = c0 * c0 + c1 * c1 + c2_ * c2_
    xdc = px * c0 + py * c1 + pz * c2_
    # cx = c x p
    u0 = c1 * pz - c2_ * py
    u1 = c2_ * px - c0 * pz
    u2 = c0 * py - c1 * px
    wedge = (
        ((ax - px) * u0 + (ay - py) * u1 + (az - pz) * u2 < 0)
        & ((bx - px) * u0 + (by - py) * u1 + (bz - pz) * u2 > 0)
    )
    qr = F.lit(1.0) - F.sqrt((u0 * u0 + u1 * u1 + u2 * u2) / cnorm2)
    dint = (xdc * xdc) / cnorm2 + qr * qr
    interior = planar & wedge & (cnorm2 > 0)
    return F.least(
        F.when(interior, F.least(dint, endpoint)).otherwise(endpoint), F.lit(4.0)
    )


def _query_points(queries: DataFrame, query_id: str, lat: str, lng: str) -> DataFrame:
    """(query_id, px, py, pz, qleaf) — ONE Arrow pass over the queries,
    shared by every ring-probe round and the brute remnant."""
    qs = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(lat).alias("lat"),
        F.col(lng).alias("lng"),
        udfs.cell_id_from_latlng_deg(F.col(lat), F.col(lng), 30).alias("qleaf"),
    )
    p = udfs.latlng_deg_to_xyz(F.col("lat"), F.col("lng"))
    return (
        qs.withColumn("_p", p)
        .select(
            "query_id",
            F.col("_p.x").alias("px"),
            F.col("_p.y").alias("py"),
            F.col("_p.z").alias("pz"),
            "qleaf",
        )
    )


def furthest_edges(
    index: DataFrame,
    queries: DataFrame,
    k: int = 1,
    level: int = 8,
    query_id: str = "query_id",
    lat: str = "lat",
    lng: str = "lng",
    fallback_level_step: int = 3,
    max_rounds: int = 3,
    covering_seed: bool | str = "auto",
    interiors: DataFrame | None = None,
    max_error_rad: float = 0.0,
) -> DataFrame:
    """(query_id, rank, shape_id, edge_id, chord2) top-k FURTHEST indexed
    edges per query (S2FurthestEdgeQuery over S2BestEdgesQueryBase) via
    the antipode identity: the max angle from p to an edge is pi minus the
    min angle from -p, i.e. chord2_far = 4 - chord2_near(-p). The whole
    search therefore reuses closest_edges on the negated query points —
    same ring pruning, same completeness proof — and only the output
    distance is transformed.

    ``interiors``: optional shapes table (shape_id, text) enabling
    Options.includeInteriors (S2BestEdgesQueryBase.java:399,410 — default
    TRUE in the reference; opt-in here by passing the geometry). A shape
    whose interior contains the ANTIPODE of the query point
    (S2FurthestEdgeQuery.java:369-381 visitBestDistanceContainingShapes
    over the antipodal connected-component point) contributes an interior
    result at the maximum distance: (shape_id, edge_id=-1, chord2=4.0);
    Result.isInterior() == edge_id < 0 (S2BestEdgesQueryBase.java:317,347).
    Because this wrapper already negates the query points, the inner
    closest_edges call tests containment of exactly those antipodes."""
    neg = queries.select(
        F.col(query_id).alias(query_id),
        (-F.col(lat)).alias("lat"),
        # antipode in lat/lng: negate latitude, rotate longitude by 180
        F.when(F.col(lng) > 0, F.col(lng) - 180.0)
        .otherwise(F.col(lng) + 180.0)
        .alias("lng"),
    )
    near = closest_edges(
        index,
        neg,
        k=k,
        level=level,
        query_id=query_id,
        lat="lat",
        lng="lng",
        fallback_level_step=fallback_level_step,
        max_rounds=max_rounds,
        # Max-distance covering seed (S2FurthestEdgeQuery's covering
        # traversal): antipode points of queries near a CLUSTERED index
        # are far from every cell, so rings always come up empty and the
        # covering-pruned path wins when the edge set is large (remnant
        # brute is |queries| x |edges|). For broad indexes or small edge
        # sets the ring+remnant path is faster (the seed adds a bounds
        # stage and several small jobs). "auto" (default) counts the
        # persisted index once — a cache warm-up the search needs anyway
        # — and turns the seed on above AUTO_COVERING_SEED_EDGES.
        covering_seed=covering_seed,
        interiors=interiors,
        # maxError is an angle bound, symmetric under the antipode map
        max_error_rad=max_error_rad,
    )
    return near.select(
        "query_id",
        "rank",
        "shape_id",
        "edge_id",
        (F.lit(4.0) - F.col("chord2")).alias("chord2"),
    )


def closest_edges(
    index: DataFrame,
    queries: DataFrame,
    k: int = 1,
    level: int = 8,
    query_id: str = "query_id",
    lat: str = "lat",
    lng: str = "lng",
    fallback_level_step: int = 3,
    max_rounds: int = 3,
    covering_seed: bool | str = False,
    max_chord2: float | None = None,
    distance_cap: str = "inclusive",
    interiors: DataFrame | None = None,
    max_error_rad: float = 0.0,
) -> DataFrame:
    """Top-k nearest indexed edges per query, with S2ClosestEdgeQuery's
    maxDistance options: ``distance_cap='inclusive'`` keeps edges AT the
    cap; 'conservative' pads by the max point-to-edge FP error
    (S2EdgeUtil.getUpdateMinDistanceMaxError) so true-within-cap edges
    are never dropped. Applied as an exact-top-k post-filter (sound:
    capping after ranking equals ranking the capped set).

    ``max_error_rad``: Options.maxError (S2BestEdgesQueryBase.java:467-484)
    as an angle in radians — edges up to maxError further than the true
    closest may be substituted in the results. Distributed payoff: the
    ring completeness test accepts a k-th distance within maxError of the
    ring bound, so borderline queries finish in the FIRST ring round
    instead of retrying at coarser levels (each retry is a full
    shuffle+join round at 100 TB). The proof stays sound: any unseen edge
    lies outside the 3x3 ring, hence at angle >= MIN_WIDTH(L), and the
    accepted k-th is within maxError of that floor.

    ``interiors``: optional shapes table (shape_id, text) enabling
    Options.includeInteriors (S2BestEdgesQueryBase.java:399,410 — the
    reference DEFAULT; opt-in here because the DataFrame index carries
    edges only, not parseable geometry). Each shape whose interior
    contains the query point (S2ClosestEdgeQuery.java:479-484
    visitBestDistanceContainingShapes over S2ContainsPointQuery)
    contributes a Result at distance zero with edge_id = -1;
    Result.isInterior() == edge_id < 0 (S2BestEdgesQueryBase.java:317,347).
    Interior rows merge into the same top-k ranking — ordering by
    (distance, shape_id, edge_id) matches the reference Result order, so
    a containing shape's interior result outranks its boundary edges.
    Scale shape: the containment test is the indexed PIP broadcast hash
    join (operators/shapes.pip_join_indexed) — no per-query work beyond
    the one extra union + re-rank."""
    from .knn import effective_max_chord2

    res = _closest_edges_impl(
        index, queries, k, level, query_id, lat, lng,
        fallback_level_step, max_rounds, covering_seed, max_error_rad,
    )
    if interiors is not None:
        from . import shapes as shape_ops

        contained = shape_ops.pip_join_indexed(
            queries.sparkSession, queries, interiors,
            point_id=query_id, lat=lat, lng=lng,
        )
        interior_rows = contained.select(
            F.col("point_id").alias("query_id"),
            F.col("polygon_id").alias("shape_id"),
            F.lit(-1).cast("int").alias("edge_id"),
            F.lit(0.0).alias("chord2"),
        )
        # Re-rank the union: the impl's per-query top-k plus interior
        # zeros — sound because every edge row dropped by the impl ranked
        # below k edge rows that ARE present, and interior rows only push
        # rankings down further.
        w = Window.partitionBy("query_id").orderBy(
            F.asc("chord2"), F.asc("shape_id"), F.asc("edge_id")
        )
        res = (
            res.select("query_id", "shape_id", "edge_id", "chord2")
            .unionByName(interior_rows)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "shape_id", "edge_id", "chord2")
        )
    eff = effective_max_chord2(max_chord2, distance_cap, edges=True)
    return res if eff is None else res.where(F.col("chord2") <= F.lit(eff))


def _closest_edges_impl(
    index: DataFrame,
    queries: DataFrame,
    k: int = 1,
    level: int = 8,
    query_id: str = "query_id",
    lat: str = "lat",
    lng: str = "lng",
    fallback_level_step: int = 3,
    max_rounds: int = 3,
    covering_seed: bool | str = False,
    max_error_rad: float = 0.0,
) -> DataFrame:
    """(query_id, rank, shape_id, edge_id, chord2) top-k nearest indexed
    edges per query. ``index`` is shape_index_df output built with
    min_level >= ``level`` so parent(cell_id, level) is a valid key.

    The index is persisted here: its mapInPandas build runs once and every
    ring round + the brute remnant read the cached rows. Unfinished
    queries (k-th distance not provably final inside the 3x3 ring) retry
    at a coarser level — the bounded-loop form knn_cell_join uses
    (S2ClosestEdgeQuery.java:158 / S2BestEdgesQueryBase's growing search
    region) — so the full-edge brute pass sees only the (tiny) remnant
    still unfinished at level 0, never a whole far-from-boundary region.
    """
    from pyspark import StorageLevel

    index = index.persist(StorageLevel.MEMORY_AND_DISK)
    qpts = _query_points(queries, query_id, lat, lng).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    # One count over the persisted index: materializes the cache every
    # search path reads anyway, and gives the edge cardinality both routing
    # decisions (brute-under-threshold, covering seed) want.
    n_edges = index.count()
    if covering_seed == "auto":
        covering_seed = n_edges >= AUTO_COVERING_SEED_EDGES
    w = Window.partitionBy("query_id").orderBy(
        F.asc("chord2"), F.asc("shape_id"), F.asc("edge_id")
    )
    if not covering_seed and n_edges <= SMALL_INDEX_BRUTE_EDGES:
        # Exact one-pass route: broadcast the (tiny, distinct) edge set onto
        # the query table — no query broadcast (queries may be huge), no
        # ring rounds, one window. Identical results to the ring search. An
        # engaged covering seed (explicit or auto) takes precedence: the
        # caller asked for the covering-pruned traversal.
        edges_all = index.dropDuplicates(["shape_id", "edge_id"]).select(
            "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz"
        )
        return (
            qpts.crossJoin(F.broadcast(edges_all))
            .select(
                "query_id",
                "shape_id",
                "edge_id",
                edge_min_chord2_cols(
                    F.col("px"), F.col("py"), F.col("pz"),
                    F.col("ax"), F.col("ay"), F.col("az"),
                    F.col("bx"), F.col("by"), F.col("bz"),
                ).alias("chord2"),
            )
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "shape_id", "edge_id", "chord2")
        )
    results = None
    remaining = qpts
    if covering_seed:
        # Route queries whose 3x3 ring at the seed level certainly holds
        # no index cell (min distance to the whole covering exceeds the
        # ring's completeness bound) straight to the covering-pruned exact
        # path — their ring rounds would all come up empty (the clustered-
        # index / antipode regime of S2FurthestEdgeQuery).
        cover = index.select(
            cc.parent("cell_id", level).alias("ccell")
        ).distinct()
        ring_reach = float(
            sphere.chord2_from_angle(
                3.0 * sphere.metric_value(sphere.MAX_ANGLE_SPAN_DERIV, level)
            )
        )
        qmin = (
            qpts.crossJoin(F.broadcast(cover))
            .select(
                "query_id",
                _cell_udf("min")("ccell", "px", "py", "pz").alias("minb"),
            )
            .groupBy("query_id")
            .agg(F.min("minb").alias("minb_min"))
        )
        far_ids = qmin.where(F.col("minb_min") > F.lit(ring_reach)).select(
            "query_id"
        )
        far_q = qpts.join(far_ids, "query_id")
        remaining = qpts.join(far_ids, "query_id", "left_anti")
        if not far_q.isEmpty():
            results = covering_pruned_edges(index, far_q, k, level, w)
        if remaining.isEmpty():
            return results
    lvl = level
    for round_no in range(max_rounds):
        idx_l = index.select(
            "shape_id",
            "edge_id",
            "ax", "ay", "az", "bx", "by", "bz",
            cc.parent("cell_id", lvl).alias("cell_key"),
        ).dropDuplicates(["shape_id", "edge_id", "cell_key"])
        probe = remaining.select(
            "query_id",
            "px",
            "py",
            "pz",
            F.explode(
                F.array_union(
                    F.array(cc.parent("qleaf", lvl)),
                    udfs.all_neighbors(cc.parent("qleaf", lvl)),
                )
            ).alias("cell_key"),
        )
        cand = (
            probe.join(idx_l, "cell_key")
            .dropDuplicates(["query_id", "shape_id", "edge_id"])
            .select(
                "query_id",
                "shape_id",
                "edge_id",
                edge_min_chord2_cols(
                    F.col("px"), F.col("py"), F.col("pz"),
                    F.col("ax"), F.col("ay"), F.col("az"),
                    F.col("bx"), F.col("by"), F.col("bz"),
                ).alias("chord2"),
            )
        )
        # persisted: the verdict aggregation, the finished-query filter and
        # the final result all read this round's top-k — without the cache
        # the candidate join would re-execute once per consumer
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # Completeness: an edge with NO index cell inside the 3x3 ring at
        # lvl lies entirely outside it, hence >= MIN_WIDTH(lvl) away.
        # Options.maxError relaxes the acceptance in ANGLE space: a k-th
        # result within maxError of that floor is acceptable even if a
        # marginally closer unseen edge exists outside the ring.
        bound = float(
            sphere.chord2_from_angle(
                sphere.metric_value(sphere.MIN_WIDTH_DERIV, lvl)
                + max_error_rad
            )
        )
        verdict = topk.groupBy("query_id").agg(
            F.count("*").alias("found"), F.max("chord2").alias("kth")
        )
        finished = verdict.where(
            (F.col("found") == k) & (F.col("kth") < F.lit(bound))
        ).select("query_id")
        done = topk.join(finished, "query_id").select(
            "query_id", "rank", "shape_id", "edge_id", "chord2"
        )
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(finished, "query_id", "left_anti")
        lvl = max(0, lvl - fallback_level_step)
        if lvl == 0:
            break
    # exact brute remnant — only queries still unfinished at the coarsest
    # ring (expected ~none); reads the SAME persisted index. Unioned lazily:
    # when every query finished in the ring rounds the remnant broadcast is
    # empty and AQE prunes the join to nothing.
    edges_all = index.dropDuplicates(["shape_id", "edge_id"]).select(
        "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz"
    )
    brute = (
        F.broadcast(remaining.select("query_id", "px", "py", "pz"))
        .crossJoin(edges_all)
        .select(
            "query_id",
            "shape_id",
            "edge_id",
            edge_min_chord2_cols(
                F.col("px"), F.col("py"), F.col("pz"),
                F.col("ax"), F.col("ay"), F.col("az"),
                F.col("bx"), F.col("by"), F.col("bz"),
            ).alias("chord2"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "shape_id", "edge_id", "chord2")
    )
    return results.unionByName(brute) if results is not None else brute


# ---------------------------------------------------------------------------
# Max-distance covering seed (S2FurthestEdgeQuery over S2BestEdgesQueryBase
# max-distance targets): queries far from the whole index skip the ring
# rounds — their rings can never contain an index cell — and instead prune
# through the index's covering with exact cell chord bounds.
# ---------------------------------------------------------------------------

from pyspark.sql.functions import pandas_udf as _pandas_udf  # noqa: E402
import pandas as _pd  # noqa: E402


def _cell_bounds_udf(which: str):
    @_pandas_udf("double")
    def f(cell_id: _pd.Series, px: _pd.Series, py: _pd.Series,
          pz: _pd.Series) -> _pd.Series:
        from ..kernel.cell import cells_distance_chord2, cells_max_distance_chord2

        pts = np.stack(
            [px.to_numpy(np.float64), py.to_numpy(np.float64),
             pz.to_numpy(np.float64)],
            axis=1,
        )
        cids = cell_id.to_numpy(np.int64)
        fn = cells_distance_chord2 if which == "min" else cells_max_distance_chord2
        return _pd.Series(fn(cids, pts))

    return f


_cell_udf_cache: dict = {}


def _cell_udf(which: str):
    """Lazy pandas_udf creation: registration needs an active session,
    which doesn't exist at import time."""
    if which not in _cell_udf_cache:
        _cell_udf_cache[which] = _cell_bounds_udf(which)
    return _cell_udf_cache[which]


def covering_pruned_edges(
    index: DataFrame,
    far_queries: DataFrame,
    k: int,
    cover_level: int,
    w: Window,
) -> DataFrame:
    """Exact top-k closest edges for queries FAR from the index, pruned by
    the index covering instead of ring joins: per (query, covering cell)
    exact min/max chord bounds (A19, kernel/cell.py) give a threshold
    T = min over cells of max_chord2 — the best covering cell certainly
    contains an edge no farther than T — so only cells with
    min_chord2 <= T contribute candidates. Completeness is verified per
    query (k found AND k-th distance below every excluded cell's lower
    bound); violators — possible when k exceeds the best cells' edge
    count — fall back to the exact brute pass. This is the antipode form
    of the reference's max-distance covering seed (S2FurthestEdgeQuery
    visits index cells ordered by distance bound, not by location)."""
    cover = index.select(
        cc.parent("cell_id", cover_level).alias("ccell")
    ).distinct()
    bounds = (
        far_queries.select("query_id", "px", "py", "pz")
        .crossJoin(F.broadcast(cover))
        .select(
            "query_id", "px", "py", "pz", "ccell",
            _cell_udf("min")("ccell", "px", "py", "pz").alias("minb"),
            _cell_udf("max")("ccell", "px", "py", "pz").alias("maxb"),
        )
    ).persist()
    thr = bounds.groupBy("query_id").agg(F.min("maxb").alias("thr"))
    keep_cells = bounds.join(thr, "query_id").where(F.col("minb") <= F.col("thr"))
    excluded_min = (
        bounds.join(thr, "query_id")
        .where(F.col("minb") > F.col("thr"))
        .groupBy("query_id")
        .agg(F.min("minb").alias("exc_min"))
    )
    idx_cells = index.select(
        "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz",
        cc.parent("cell_id", cover_level).alias("ccell"),
    ).dropDuplicates(["shape_id", "edge_id", "ccell"])
    cand = (
        keep_cells.select("query_id", "px", "py", "pz", "ccell")
        .join(idx_cells, "ccell")
        .dropDuplicates(["query_id", "shape_id", "edge_id"])
        .select(
            "query_id", "shape_id", "edge_id",
            edge_min_chord2_cols(
                F.col("px"), F.col("py"), F.col("pz"),
                F.col("ax"), F.col("ay"), F.col("az"),
                F.col("bx"), F.col("by"), F.col("bz"),
            ).alias("chord2"),
        )
    )
    topk = (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .persist()
    )
    verdict = (
        topk.groupBy("query_id")
        .agg(F.count("*").alias("found"), F.max("chord2").alias("kth"))
        .join(excluded_min, "query_id", "left")
    )
    finished = verdict.where(
        (F.col("found") == k)
        & (F.col("exc_min").isNull() | (F.col("kth") < F.col("exc_min")))
    ).select("query_id")
    done = topk.join(finished, "query_id").select(
        "query_id", "rank", "shape_id", "edge_id", "chord2"
    )
    violators = far_queries.join(finished, "query_id", "left_anti")
    if violators.isEmpty():
        return done
    edges_all = index.dropDuplicates(["shape_id", "edge_id"]).select(
        "shape_id", "edge_id", "ax", "ay", "az", "bx", "by", "bz"
    )
    brute = (
        F.broadcast(violators.select("query_id", "px", "py", "pz"))
        .crossJoin(edges_all)
        .select(
            "query_id", "shape_id", "edge_id",
            edge_min_chord2_cols(
                F.col("px"), F.col("py"), F.col("pz"),
                F.col("ax"), F.col("ay"), F.col("az"),
                F.col("bx"), F.col("by"), F.col("bz"),
            ).alias("chord2"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "shape_id", "edge_id", "chord2")
    )
    return done.unionByName(brute)
