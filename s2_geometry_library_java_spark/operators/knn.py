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
) -> DataFrame:
    """(query_id, rank, neighbor_id, chord2) exact k nearest."""
    q = F.broadcast(
        _with_xyz(queries, lat, lng, "q").select(
            F.col(query_id).alias("query_id"), "qx", "qy", "qz"
        )
    )
    x = _with_xyz(index, lat, lng, "i").select(
        F.col(index_id).alias("neighbor_id"), "ix", "iy", "iz"
    )
    scored = q.crossJoin(x).select("query_id", "neighbor_id", _chord2().alias("chord2"))
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
) -> DataFrame:
    """Scale-path kNN via cell-ring equi-joins with completeness proof.

    The index is keyed once by ``parent(leaf, L)``; each round queries
    probe their ring at L, then unfinished queries retry at L-step.
    Exactness: a query finishes when its k-th chord2 <= the ring's
    guaranteed min chord2 (lower bound above), mirroring the reference's
    shrinking maxDistanceLimit (S2ClosestPointQuery.java:121-136).
    """
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
    if level is None:
        # Seed level from the index cardinality under a uniform prior (the
        # count doubles as the cache warm-up the joins reuse). Callers with
        # skewed data pass an explicit level derived from the
        # plans/density.py rollup artifacts instead.
        level = choose_level(idx.count(), k)
    results = None
    remaining = qs
    lvl = level
    for round_no in range(max_rounds):
        from ..functions import columns as cc

        if round_no > 0 and remaining.isEmpty():
            return results
        idx_l = idx.withColumn("cell", cc.parent("leaf", lvl))
        q_cells = remaining.withColumn("qcell", cc.parent("qleaf", lvl))
        probe = q_cells.select(
            "query_id", "qx", "qy", "qz", "qcell",
            F.explode(
                F.array_union(F.array(F.col("qcell")), udfs.all_neighbors(F.col("qcell")))
            ).alias("cell"),
        ).distinct()
        cand = probe.join(idx_l, "cell").select(
            "query_id", "qx", "qy", "qz", "qcell", "neighbor_id", _chord2().alias("chord2")
        )
        w = Window.partitionBy("query_id").orderBy(F.asc("chord2"), F.asc("neighbor_id"))
        topk = cand.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
        # Completeness proof: any point OUTSIDE the 3x3 ring at level lvl is
        # at least MIN_WIDTH(lvl) away (a geodesic leaving the ring fully
        # crosses one neighbor cell, whose width >= the level minimum) — the
        # DataFrame form of the reference's shrinking maxDistanceLimit.
        bound0 = float(
            sphere.chord2_from_angle(
                sphere.metric_value(sphere.MIN_WIDTH_DERIV, lvl)
            )
        )
        verdict = topk.groupBy("query_id").agg(
            F.count("*").alias("found"), F.max("chord2").alias("kth")
        )
        finished_q = verdict.where(
            (F.col("found") == k) & (F.col("kth") < F.lit(bound0))
        ).select("query_id")
        done = topk.join(finished_q, "query_id").select(
            "query_id", "rank", "neighbor_id", "chord2"
        )
        results = done if results is None else results.unionByName(done)
        remaining = remaining.join(finished_q, "query_id", "left_anti")
        lvl = max(0, lvl - fallback_level_step)
        if lvl == 0:
            break
    # anything still unfinished: exact brute-force remnant (tiny by now)
    if not remaining.isEmpty():
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
    return results
