"""Similarity search over embedding columns.

Brute-force cosine top-k is the exact baseline: broadcast the (small) query
side, compute dot products JVM-side via ``aggregate(zip_with(...))`` —
sequential summation order, so a SQL oracle summing in index order matches
bit-for-bit — and take top-k per query with a window.

The scale path is hyperplane-LSH bucketing: deterministic integer-derived
hyperplanes, sign-bit bucket per plane, equi-join on bucket. At 100 TB the
bucket join replaces the cross join entirely; brute force remains the
per-bucket refiner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, Window


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    """Sequential-order dot product of two array<float/double> columns."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm2(a) -> Column:
    return dot(a, a)


def cosine(a, b) -> Column:
    return dot(a, b) / F.sqrt(norm2(a) * norm2(b))


def cosine_topk_bruteforce(
    index: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int
) -> DataFrame:
    """(query_id, rank, neighbor_id, sim) exact top-k by cosine.

    Queries are broadcast: the join is a broadcast nested loop over index
    partitions (no index shuffle); only the q x n candidate rows shuffle
    for the per-query window. Ties broken by neighbor id for determinism.
    """
    q = F.broadcast(
        queries.select(_c(id_col).alias("query_id"), _c(vec_col).alias("qv"))
    )
    x = index.select(_c(id_col).alias("neighbor_id"), _c(vec_col).alias("xv"))
    scored = q.join(x, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine("qv", "xv").alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )


def hyperplane_weight(p: int, d: int) -> float:
    """Deterministic rational hyperplane component in [-1, 1]."""
    return ((p * 37 + d * 11) % 21 - 10) / 10.0


def lsh_bucket(vec, n_planes: int = 8, dim: int = 64) -> Column:
    """Sign-bit bucket id over ``n_planes`` deterministic hyperplanes."""
    def _proj_lambda(p):
        def fn(acc, d):
            return acc + F.element_at(_c(vec), (d + 1).cast("int")).cast(
                "double"
            ) * ((d * 11 + F.lit(p * 37)) % 21 - 10) / 10.0

        return fn

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        d_idx = F.sequence(F.lit(0), F.lit(dim - 1))
        proj = F.aggregate(d_idx, F.lit(0.0), _proj_lambda(p))
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0))
    return bucket


def make_band_keys_udf(n_tables: int, planes_per_table: int, dim: int):
    """pandas UDF embedding -> array of n_tables band keys.

    Each table t hashes the vector with planes p = t*P..t*P+P-1
    (hyperplane_weight) and packs the sign bits; key = (t << P) | bits.
    The per-plane projection accumulates STRICTLY in dimension order so the
    result is bit-identical to a sequential SQL list_reduce / Column
    aggregate — band keys must match the oracle exactly."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    @pandas_udf(ArrayType(LongType()))
    def band_keys(emb: pd.Series) -> pd.Series:
        E = np.stack(emb.to_numpy()).astype(np.float64)  # (n, dim)
        n = len(E)
        keys = np.zeros((n, n_tables), dtype=np.int64)
        for t in range(n_tables):
            bits = np.zeros(n, dtype=np.int64)
            for i in range(planes_per_table):
                p = t * planes_per_table + i
                acc = np.zeros(n, dtype=np.float64)
                for d in range(dim):  # sequential order == SQL list_reduce
                    acc = acc + E[:, d] * hyperplane_weight(p, d)
                bits |= (acc >= 0).astype(np.int64) << i
            keys[:, t] = (t << planes_per_table) | bits
        return pd.Series(list(keys))

    return band_keys


def lsh_banded_pairs(
    index: DataFrame,
    id_col: str,
    vec_col: str,
    n_tables: int = 4,
    planes_per_table: int = 16,
    dim: int = 64,
    min_cosine: float | None = None,
    max_bucket: int = 10000,
) -> DataFrame:
    """(a, b) candidate pairs sharing any of n_tables LSH bands, optionally
    refined by exact cosine >= min_cosine — the ANN SCALE path.

    Multi-table banding fixes the single-table quadratic failure: with one
    8-plane table the self-join degenerates to ~all-pairs/256 on large
    inputs; 4x16 planes gives 2^16 buckets per table (tiny buckets, high
    recall via 4 independent chances). The skew guard drops bands larger
    than max_bucket from the join (a hot bucket means the planes failed to
    split a dense cluster; callers refine those separately), bounding the
    worst-case fanout to max_bucket^2 per band."""
    bk = make_band_keys_udf(n_tables, planes_per_table, dim)
    b = index.select(
        _c(id_col).alias("id"),
        _c(vec_col).alias("v"),
        F.explode(bk(_c(vec_col))).alias("band"),
    )
    counts = b.groupBy("band").agg(F.count("*").alias("n"))
    kept = b.join(counts.where(F.col("n") <= max_bucket), "band")
    pairs = (
        kept.alias("l")
        .join(
            kept.alias("r"),
            (F.col("l.band") == F.col("r.band")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            F.col("l.v").alias("va"),
            F.col("r.v").alias("vb"),
        )
        .dropDuplicates(["a", "b"])
    )
    if min_cosine is not None:
        pairs = pairs.where(cosine("va", "vb") >= F.lit(min_cosine))
    return pairs.select("a", "b")


def lsh_bucketed_neighbors(
    index: DataFrame, id_col: str, vec_col: str, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """(a, b, sim) for pairs sharing an LSH bucket — the small-scale form
    (single table; see lsh_banded_pairs for the 100 TB parameterization)."""
    b = index.select(
        _c(id_col).alias("id"),
        _c(vec_col).alias("v"),
        lsh_bucket(vec_col, n_planes, dim).alias("bucket"),
    )
    pairs = (
        b.alias("l")
        .join(b.alias("r"), (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            cosine(F.col("l.v"), F.col("r.v")).alias("sim"),
        )
    )
    return pairs


def ivf_centroid_seeds(
    index: DataFrame, id_col: str, vec_col: str, n_centroids: int
) -> DataFrame:
    """(centroid_id, cv) deterministic IVF coarse centroids: the
    ``n_centroids`` lowest-id vectors. A deterministic seeding keeps the
    whole IVF path SQL-oracle-checkable; production deployments would
    refine these with Lloyd iterations (the query plan is identical —
    only the centroid table changes)."""
    # distributed top-K (TakeOrderedAndProject) first; the global
    # row_number window then only ever sees K rows
    seeds = (
        index.select(_c(id_col).alias("cid_src"), _c(vec_col).alias("cv"))
        .orderBy("cid_src")
        .limit(n_centroids)
    )
    return seeds.withColumn(
        "rn", F.row_number().over(Window.orderBy("cid_src"))
    ).select((F.col("rn") - 1).alias("centroid_id"), "cv")


def ivf_topk(
    index: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, neighbor_id) approximate top-k by cosine via an
    IVF (inverted-file) coarse quantizer — the scale path complementing
    the banded-LSH variant:

    1. every index vector is assigned to its best coarse centroid with a
       single map-side-combinable aggregation (max of a (sim, -id)
       struct — ONE shuffle of N rows, never N x K);
    2. each query probes its ``nprobe`` nearest centroids;
    3. candidates = equi-join on centroid id (bucket join, never
       all-pairs at scale), refined by exact cosine + per-query top-k
       window.

    Centroids are broadcast (K rows). Dot products use the sequential
    aggregate(zip_with(...)) form so a SQL oracle summing in index order
    matches bit-for-bit. Approximate by construction: a true neighbor
    assigned to an unprobed list is missed (recall grows with nprobe).
    """
    if centroids is None:
        centroids = ivf_centroid_seeds(index, id_col, vec_col, n_centroids)
    cents = F.broadcast(centroids)
    x = index.select(_c(id_col).alias("neighbor_id"), _c(vec_col).alias("xv"))
    # 1. list assignment: argmax_centroid cosine, one partial-aggregated
    # shuffle; ties -> smallest centroid id (max of (sim, -centroid_id))
    assigned = (
        x.join(cents)
        .select(
            "neighbor_id",
            "xv",
            F.struct(
                cosine("xv", "cv").alias("sim"),
                (-F.col("centroid_id")).alias("neg_cid"),
            ).alias("sc"),
        )
        .groupBy("neighbor_id")
        .agg(F.max("sc").alias("best"), F.first("xv").alias("xv"))
        .select(
            "neighbor_id", "xv", (-F.col("best.neg_cid")).alias("list_id")
        )
    )
    # 2. query probes: top-nprobe centroids per query
    q = queries.select(_c(id_col).alias("query_id"), _c(vec_col).alias("qv"))
    wq = Window.partitionBy("query_id").orderBy(
        F.desc("csim"), F.asc("centroid_id")
    )
    probes = (
        q.join(cents)
        .select(
            "query_id", "qv", "centroid_id", cosine("qv", "cv").alias("csim")
        )
        .withColumn("prn", F.row_number().over(wq))
        .where(F.col("prn") <= nprobe)
        .select("query_id", "qv", F.col("centroid_id").alias("list_id"))
    )
    # 3. bucket join + exact refine
    scored = probes.join(assigned, "list_id").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.select("query_id", "neighbor_id", cosine("qv", "xv").alias("sim"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
