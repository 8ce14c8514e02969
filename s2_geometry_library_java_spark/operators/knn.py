"""Spatial kNN: closest index points to each query point.

Semantics follow S2ClosestPointQuery (S2ClosestPointQuery.java:311-355):
results ordered by S1ChordAngle ``length2``, ties by cell id then payload.

Two physical strategies, chosen like the reference chooses brute force under
150 points (S2ClosestPointQuery.java:75):

* ``knn_bruteforce`` — broadcast the query side, exact chord distances JVM-
  side, window top-k. Exact; right when |queries| is small (the broadcast
  nested-loop scan distributes over index partitions with no index shuffle).

* ``knn_cell_join`` — the scale path: both sides keyed by cell id; each
  query probes its level-L cell plus the 8 ring neighbors (kernel A13),
  equi-joins the index on the cell key, windows top-k, then *verifies*
  completeness with the cell-geometry lower bound: a query's top-k is final
  only if the k-th chord distance is <= the minimum distance to the ring
  boundary; unfinished queries fall back to a coarser ring (bounded loop,
  1-3 joins — the DataFrame form of the reference's shrinking-radius queue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, Window
from pyspark.sql.functions import pandas_udf

from ..functions import udfs
from ..kernel import cellid as s2
from ..kernel import sphere


def _with_xyz(df: DataFrame, lat: str, lng: str, prefix: str) -> DataFrame:
    p = udfs.latlng_deg_to_xyz(F.col(lat), F.col(lng))
    return (
        df.withColumn("_p", p)
        .withColumn(f"{prefix}x", F.col("_p.x"))
        .withColumn(f"{prefix}y", F.col("_p.y"))
        .withColumn(f"{prefix}z", F.col("_p.z"))
        .drop("_p")
    )


def _chord2() -> F.Column:
    dx = F.col("qx") - F.col("ix")
    dy = F.col("qy") - F.col("iy")
    dz = F.col("qz") - F.col("iz")
    return F.least(dx * dx + dy * dy + dz * dz, F.lit(4.0))


def knn_bruteforce(
    index: DataFrame,
    queries: DataFrame,
    k: int,
    index_id: str = "id",
    query_id: str = "query_id",
    lat: str = "lat",
    lng: str = "lng",
    max_chord2: float | None = None,
    distance_cap: str = "inclusive",
) -> DataFrame:
    """(query_id, rank, neighbor_id, chord2) exact k nearest.

    ``max_chord2`` adds the reference's maxDistance option
    (S2ClosestPointQuery.Options): neighbors beyond the cap are dropped
    BEFORE ranking, so queries may return fewer than k rows.
    ``distance_cap='conservative'`` pads the cap by the max FP error
    (setConservativeMaxDistance) so true-within-cap points are never
    under-reported."""
    max_chord2 = effective_max_chord2(max_chord2, distance_cap)
    q = F.broadcast(
        _with_xyz(queries, lat, lng, "q").select(
            F.col(query_id).alias("query_id"), "qx", "qy", "qz"
        )
    )
    x = _with_xyz(index, lat, lng, "i").select(
        F.col(index_id).alias("neighbor_id"), "ix", "iy", "iz"
    )
    scored = q.crossJoin(x).select("query_id", "neighbor_id", _chord2().alias("chord2"))
    if max_chord2 is not None:
        scored = scored.where(F.col("chord2") <= F.lit(float(max_chord2)))
    w = Window.partitionBy("query_id").orderBy(F.asc("chord2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "chord2")
    )


def choose_level(n_index: int, k: int) -> int:
    """Largest level whose 3x3 ring is expected to hold >= max(32, 8k)
    points under a uniform prior — the DataFrame analogue of the
    reference's per-query seed-level heuristic (S2ClosestPointQuery
    initQueue). Density rollups (tiling.density_rollup) refine this per
    region when the data is skewed."""
    import math

    target = max(32, 8 * k)
    ratio = 1.5 * n_index / target
    if ratio <= 1:
        return 0
    return max(0, min(30, int(math.log(ratio, 4))))


def density_seed_level(w: F.Column, hist_level: int, k: int) -> F.Column:
    """Per-query seed level from a local density weight ``w`` (points in
    the query's histogram cell at ``hist_level``): the deepest level whose
    3x3 ring still expects >= max(32, 8k) points given that local density
    — the density-rollup refinement of choose_level's uniform prior."""
    target = max(32, 8 * k)
    raw = F.lit(hist_level) + F.floor(
        F.log(4.0, F.lit(9.0) * w / F.lit(1.5 * target))
    )
    lvl = F.greatest(F.lit(0), F.least(F.lit(30), raw.cast("int")))
    return F.when(w.isNull() | (w <= 0), F.lit(0)).otherwise(lvl)


def _capped(df: DataFrame | None, max_chord2: float | None):
    """Inclusive maxDistance post-filter (sound on exact top-k output:
    capping after ranking equals ranking the capped candidate set)."""
    if df is None or max_chord2 is None:
        return df
    return df.where(F.col("chord2") <= F.lit(float(max_chord2)))


def effective_max_chord2(
    max_chord2: float | None, distance_cap: str = "inclusive",
    edges: bool = False,
) -> float | None:
    """Resolve a maxDistance option to the squared-chord filter value.

    'inclusive' = setInclusiveMaxDistance (points AT the cap returned);
    'conservative' = setConservativeMaxDistance
    (S2ClosestPointQuery.java:174-186): the cap is padded by the maximum
    floating-point distance error, so no point (edge, with
    ``edges=True``) whose TRUE distance is within the cap can be
    under-reported — callers then refine with exact predicates."""
    from ..kernel import sphere

    if max_chord2 is None:
        return None
    if distance_cap == "inclusive":
        return float(max_chord2)
    if distance_cap == "conservative":
        return sphere.conservative_max_chord2(float(max_chord2), edges=edges)
    raise ValueError(f"unknown distance_cap: {distance_cap!r}")


def filter_neighbors_in_region(results: DataFrame, index: DataFrame, region,
                               index_id: str = "id", lat: str = "lat",
                               lng: str = "lng") -> DataFrame:
    """F4 region-filter option (S2ClosestPointQuery.Options.setRegion):
    keep only result neighbors whose index point lies inside ``region``
    (any kernel region with contains_points). One Arrow-batched UDF over
    the joined-back index coordinates; ranks are NOT recomputed — like
    the reference, the filter composes with k (you may get fewer than k
    in-region neighbors)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    from ..kernel import cellid as s2

    @pandas_udf(BooleanType())
    def inside(lat_s: pd.Series, lng_s: pd.Series) -> pd.Series:
        x, y, z = s2.latlng_to_xyz(
            np.radians(lat_s.to_numpy()), np.radians(lng_s.to_numpy())
        )
        return pd.Series(np.asarray(region.contains_points(x, y, z), dtype=bool))

    coords = index.select(
        F.col(index_id).alias("neighbor_id"),
        F.col(lat).alias("_nlat"),
        F.col(lng).alias("_nlng"),
    )
    return (
        results.join(F.broadcast(coords), "neighbor_id")
        .where(inside(F.col("_nlat"), F.col("_nlng")))
        .drop("_nlat", "_nlng")
    )


def knn_cell_join(
    index: DataFrame,
    queries: DataFrame,
    k: int,
    level: int | None = None,
    index_id: str = "id",
    query_id: str = "query_id",
    lat: str = "lat",
    lng: str = "lng",
    fallback_level_step: int = 3,
    max_rounds: int = 3,
    density_hist: list[tuple[int, int]] | None = None,
    hist_level: int | None = None,
    max_chord2: float | None = None,
    distance_cap: str = "inclusive",
) -> DataFrame:
    """Scale-path kNN via cell-ring equi-joins with completeness proof.

    Each query carries a seed level ``lvl``; the index is keyed by
    ``parent(leaf, lvl)`` per active level (the distinct-level set is
    tiny); each round queries probe their ring at their level, then
    unfinished queries retry ``fallback_level_step`` coarser. Exactness:
    a query finishes when its k-th chord2 <= the ring's guaranteed min
    chord2 (lower bound above), mirroring the reference's shrinking
    maxDistanceLimit (S2ClosestPointQuery.java:121-136).

    Seed level sources, in priority order: explicit ``level``; a
    ``density_hist`` from plans/density.density_histogram at
    ``hist_level`` (per-query local-density levels — the skewed-data
    path, so dense metros probe deep and sparse regions probe coarse in
    the SAME round); else the index count under a uniform prior.
    """
    from ..functions import columns as cc
    from ..localdf import local_df

    max_chord2 = effective_max_chord2(max_chord2, distance_cap)
    idx = _with_xyz(index, lat, lng, "i").select(
        F.col(index_id).alias("neighbor_id"), "ix", "iy", "iz",
        udfs.cell_id_from_latlng_deg(F.col(lat), F.col(lng), 30).alias("leaf"),
    )
    qs = _with_xyz(queries, lat, lng, "q").select(
        F.col(query_id).alias("query_id"), "qx", "qy", "qz",
        udfs.cell_id_from_latlng_deg(F.col(lat), F.col(lng), 30).alias("qleaf"),
    )
    from pyspark import StorageLevel

    idx = idx.persist(StorageLevel.MEMORY_AND_DISK)
    qs = qs.persist(StorageLevel.MEMORY_AND_DISK)
    spark = index.sparkSession
    target = max(32, 8 * k)
    if level is not None:
        qs2 = qs.withColumn("lvl", F.lit(int(level)))
        seed_levels = {int(level)}
    elif density_hist is not None:
        if hist_level is None:
            raise ValueError("density_hist requires hist_level")
        hist_df = local_df(
            spark,
            [(int(np.int64(np.uint64(c))), int(w)) for c, w in density_hist],
            "hcell long, w long",
        )
        qs2 = (
            qs.withColumn("hcell", cc.parent("qleaf", hist_level))
            .join(F.broadcast(hist_df), "hcell", "left")
            .withColumn("lvl", density_seed_level(F.col("w"), hist_level, k))
            .drop("hcell", "w")
        )
        # the possible seed levels are derivable from the (driver-side)
        # histogram weights — no distinct-collect job needed per round
        import math

        seed_levels = {0}
        for _, wv in density_hist:
            if wv > 0:
                seed_levels.add(
                    max(0, min(30, hist_level + int(
                        math.floor(math.log(9.0 * wv / (1.5 * target), 4.0))
                    )))
                )
    else:
        # Seed level from the index cardinality under a uniform prior.
        # Counted on the RAW input (1:1 with idx rows): Catalyst prunes
        # that count to a plain scan, whereas counting idx would eagerly
        # run its Arrow leaf/xyz passes as a separate job — the single
        # search action materializes the idx cache anyway.
        lvl0 = choose_level(index.count(), k)
        qs2 = qs.withColumn("lvl", F.lit(lvl0))
        seed_levels = {lvl0}
    results = None
    remaining = qs2
    for round_no in range(max_rounds):
        # level set this round, computed driver-side: every seed level
        # decremented round_no times (a superset of the live set is fine —
        # unused levels contribute empty join keys, no extra scan)
        # level 0 rings are dropped: a 3x3 ring of FACES covers most of the
        # sphere, so that round's candidate join approaches the full index —
        # the exact brute remnant below is strictly cheaper (no verdict
        # aggregation, no anti-join) and equally exact, matching the
        # closest-edges loop's lvl==0 break.
        lvls = sorted(
            {max(0, L - round_no * int(fallback_level_step)) for L in seed_levels}
            - {0}
        )
        if not lvls:
            break
        lvl_df = F.broadcast(local_df(spark, [(L,) for L in lvls], "lvl int"))
        idx_l = idx.crossJoin(lvl_df).withColumn(
            "cell", cc.parent("leaf", F.col("lvl"))
        )
        q_cells = remaining.withColumn("qcell", cc.parent("qleaf", F.col("lvl")))
        probe = q_cells.select(
            "query_id", "qx", "qy", "qz", "qcell", "lvl",
            F.explode(
                F.array_union(F.array(F.col("qcell")), udfs.all_neighbors(F.col("qcell")))
            ).alias("cell"),
        ).distinct()
        cand = probe.join(idx_l, ["lvl", "cell"]).select(
            "query_id", "qx", "qy", "qz", "qcell", "lvl", "neighbor_id",
            _chord2().alias("chord2"),
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("chord2"), F.asc("neighbor_id"))
        # persisted (lazily): the verdict aggregation, the finished filter
        # and the done-rows all read this round's top-k — without the cache
        # the candidate join would re-execute once per consumer in the
        # single-action plan
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # Completeness proof: any point OUTSIDE the 3x3 ring at level lvl is
        # at least MIN_WIDTH(lvl) away (a geodesic leaving the ring fully
        # crosses one neighbor cell, whose width >= the level minimum) — the
        # DataFrame form of the reference's shrinking maxDistanceLimit.
        # Column form of chord2_from_angle(metric_value(MIN_WIDTH, lvl)).
        ang = F.lit(float(sphere.MIN_WIDTH_DERIV)) * F.pow(
            F.lit(2.0), -F.col("lvl").cast("double")
        )
        half_sin = F.sin(F.least(F.lit(float(np.pi)), ang) / F.lit(2.0))
        bound_col = (F.lit(2.0) * half_sin) * (F.lit(2.0) * half_sin)
        verdict = topk.groupBy("query_id").agg(
            F.count("*").alias("found"),
            F.max("chord2").alias("kth"),
            F.first("lvl").alias("lvl"),
        ).withColumn("bound", bound_col)
        finished_q = verdict.where(
            (F.col("found") == k) & (F.col("kth") < F.col("bound"))
        ).select("query_id")
        done = topk.join(finished_q, "query_id").select(
            "query_id", "rank", "neighbor_id", "chord2"
        )
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(finished_q, "query_id", "left_anti").withColumn(
            "lvl",
            F.greatest(F.lit(0), F.col("lvl") - F.lit(int(fallback_level_step))),
        )
    # anything still unfinished: exact brute-force remnant (tiny by now).
    # Unioned lazily — no isEmpty() driver job: an all-finished search
    # broadcasts an empty remnant and AQE prunes the cross join to nothing.
    leftover = remaining.select("query_id", "qx", "qy", "qz")
    x = idx.select("neighbor_id", "ix", "iy", "iz")
    scored = F.broadcast(leftover).crossJoin(x).select(
        "query_id", "neighbor_id", _chord2().alias("chord2")
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("chord2"), F.asc("neighbor_id"))
    brute = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "chord2")
    )
    results = brute if results is None else results.unionByName(brute)
    return _capped(results, max_chord2)
