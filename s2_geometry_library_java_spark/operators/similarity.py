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


_seq_cosine_udf_cache: list = []


def seq_cosine_udf():
    """Arrow-vectorized twin of ``cosine(a, b)`` — bit-identical by
    construction: the numpy accumulation walks dimensions in order with one
    vector op per dimension, so every row performs exactly the Column
    aggregate's FP sequence (product a_d*b_d, then running add; norms
    likewise; final dot/sqrt(na*nb)). The Column form interprets ~3*dim
    lambda steps PER ROW inside aggregate()/zip_with() (no codegen for
    higher-order functions) — measured ~10x slower than this batch kernel
    on 64-dim candidate refinement. Lazily constructed: pandas_udf
    registration needs an active session."""
    if not _seq_cosine_udf_cache:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import DoubleType

        @pandas_udf(DoubleType())
        def seq_cosine(va: pd.Series, vb: pd.Series) -> pd.Series:
            A = np.stack(va.to_numpy()).astype(np.float64)
            B = np.stack(vb.to_numpy()).astype(np.float64)
            d_ = np.zeros(len(A), dtype=np.float64)
            na = np.zeros(len(A), dtype=np.float64)
            nb = np.zeros(len(A), dtype=np.float64)
            for d in range(A.shape[1]):  # dimension order == SQL aggregate
                d_ += A[:, d] * B[:, d]
                na += A[:, d] * A[:, d]
                nb += B[:, d] * B[:, d]
            return pd.Series(d_ / np.sqrt(na * nb))

        _seq_cosine_udf_cache.append(seq_cosine)
    return _seq_cosine_udf_cache[0]


_seq_qdot_udf_cache: list = []


def seq_quantized_dot_udf():
    """Arrow-vectorized twin of ``quantized_dot`` (exact BIGINT inner
    product — integer adds are associative, so any order is bit-identical;
    components |q| <= ~2^20 keep 64-dim sums far below 2^63)."""
    if not _seq_qdot_udf_cache:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import LongType

        @pandas_udf(LongType())
        def seq_qdot(qa: pd.Series, qb: pd.Series) -> pd.Series:
            A = np.stack(qa.to_numpy()).astype(np.int64)
            B = np.stack(qb.to_numpy()).astype(np.int64)
            out = np.zeros(len(A), dtype=np.int64)
            for d in range(A.shape[1]):
                out += A[:, d] * B[:, d]
            return pd.Series(out)

        _seq_qdot_udf_cache.append(seq_qdot)
    return _seq_qdot_udf_cache[0]


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
        seq_cosine_udf()(F.col("qv"), F.col("xv")).alias("sim"),
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


_lsh_bucket_udf_cache: dict = {}


def lsh_bucket_udf(n_planes: int = 8, dim: int = 64):
    """Arrow-vectorized twin of ``lsh_bucket`` — bit-identical: each term
    is computed as (elem * integer_weight) / 10.0 and accumulated in
    dimension order, exactly the Column lambda's FP sequence (note the
    association: product with the INTEGER weight first, then the /10.0 —
    NOT elem * (weight/10)). Only the projection's SIGN feeds the bucket,
    but replicating the arithmetic makes equality unconditional. The
    Column form interprets n_planes*dim lambda steps per row; this runs
    one numpy pass per batch."""
    key = (n_planes, dim)
    if key not in _lsh_bucket_udf_cache:
        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import LongType

        @pandas_udf(LongType())
        def bucket_udf(emb: pd.Series) -> pd.Series:
            E = np.stack(emb.to_numpy()).astype(np.float64)
            out = np.zeros(len(E), dtype=np.int64)
            for p in range(n_planes):
                acc = np.zeros(len(E), dtype=np.float64)
                for d in range(dim):  # dimension order == the Column fold
                    w = (d * 11 + p * 37) % 21 - 10
                    acc += (E[:, d] * w) / 10.0
                out |= (acc >= 0).astype(np.int64) << p
            return pd.Series(out)

        _lsh_bucket_udf_cache[key] = bucket_udf
    return _lsh_bucket_udf_cache[key]


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
    from pyspark import StorageLevel

    bk = make_band_keys_udf(n_tables, planes_per_table, dim)
    # Persisted: the bucket-count aggregate and BOTH self-join sides read
    # this table; without the cache the Arrow band-key pass over the full
    # embedding set runs three times (the planner broadcasts one join side,
    # so exchange reuse never applies across the subtrees).
    b = index.select(
        _c(id_col).alias("id"),
        _c(vec_col).alias("v"),
        F.explode(bk(_c(vec_col))).alias("band"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    counts = b.groupBy("band").agg(F.count("*").alias("n"))
    kept = b.join(counts.where(F.col("n") <= max_bucket), "band")
    # Dedup on the SKINNY (a, b) id pair FIRST, then re-attach the vectors
    # for the cosine refine (guide §8: shuffle keys, not payloads). The
    # previous form carried both 64-float embeddings through the self-join
    # and the dropDuplicates shuffle — ~1 KB per candidate row, measured
    # ~100 s at a 10x scale-up where duplicate-dense data produced millions
    # of candidates; the id-only dedup also computes each pair's cosine
    # once instead of once per shared band.
    pairs = (
        kept.alias("l")
        .join(
            kept.alias("r"),
            (F.col("l.band") == F.col("r.band")) & (F.col("l.id") < F.col("r.id")),
        )
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    if min_cosine is not None:
        va = index.select(_c(id_col).alias("a"), _c(vec_col).alias("va"))
        vb = index.select(_c(id_col).alias("b"), _c(vec_col).alias("vb"))
        # Join-strategy choice (guide §3.1): when the vector table fits,
        # broadcast it so the (potentially huge) pair table is never
        # shuffled for the attach — measured 2x on a duplicate-dense 10x
        # scale-up (3.9M pairs). The count reads the already-persisted band
        # table. Above the cap the planner keeps the shuffle join (at true
        # scale the index cannot broadcast).
        if b.count() // max(1, n_tables) <= BROADCAST_VECTORS_MAX_ROWS:
            va, vb = F.broadcast(va), F.broadcast(vb)
        pairs = (
            pairs.join(va, "a")
            .join(vb, "b")
            .where(seq_cosine_udf()(F.col("va"), F.col("vb")) >= F.lit(min_cosine))
        )
    return pairs.select("a", "b")


def lsh_bucketed_neighbors(
    index: DataFrame, id_col: str, vec_col: str, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """(a, b, sim) for pairs sharing an LSH bucket — the small-scale form
    (single table; see lsh_banded_pairs for the 100 TB parameterization)."""
    b = index.select(
        _c(id_col).alias("id"),
        _c(vec_col).alias("v"),
        lsh_bucket_udf(n_planes, dim)(_c(vec_col)).alias("bucket"),
    )
    pairs = (
        b.alias("l")
        .join(b.alias("r"), (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")))
        .select(
            F.col("l.id").alias("a"),
            F.col("r.id").alias("b"),
            seq_cosine_udf()(F.col("l.v"), F.col("r.v")).alias("sim"),
        )
    )
    return pairs


#: vector-table row cap for broadcasting the embedding side of the banded-
#: LSH cosine refine (~50 MB of 64-dim doubles at the cap); above it the
#: pair table shuffles for the attach as before.
BROADCAST_VECTORS_MAX_ROWS = 100_000

#: fixed-point scale for exact (order-independent) centroid sums: component
#: sums are BIGINT, so Lloyd updates hash-match any engine regardless of
#: aggregation order. Cosine is scale-invariant, so the un-divided integer
#: sum vector IS the centroid (no mean, no float division).
IVF_SCALE = float(1 << 20)


def quantized_vec(vec) -> Column:
    """array<bigint> fixed-point quantization of an embedding column."""
    return F.transform(
        _c(vec), lambda e: F.round(e.cast("double") * F.lit(IVF_SCALE)).cast("long")
    )


def quantized_dot(a, b) -> Column:
    """Exact BIGINT inner product of two quantized (array<bigint>) columns.

    Integer addition is associative, so unlike the float dots above there
    is no sequential-order caveat — any engine, any aggregation order,
    identical result. Components are |q| <= ~2^20, so a 64-dim product sum
    stays far below 2^63."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_topk(
    index: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    rescore: int = 0,
) -> DataFrame:
    """(query_id, rank, neighbor_id, score_q) top-k by maximum inner
    product over fixed-point-quantized vectors (the int8-rescore pattern
    from large-scale embedding pipelines, at 2^20 fixed-point precision).

    Scores are exact BIGINTs, so the result is engine-reproducible
    bit-for-bit — the compressed index is the thing a 100-TB deployment
    would actually scan (quantized vectors are 8 bytes/dim of BIGINT here
    standing in for 1 byte/dim int8; the plan shape is identical and the
    scan never shuffles — queries broadcast, one window per query id).

    With ``rescore = m > 0``: keep the top m by quantized score, then
    re-rank those m candidates by exact float cosine (the standard
    two-stage retrieve-then-rescore). The rescore stage touches only
    q x m rows.
    """
    q = F.broadcast(
        queries.select(
            _c(id_col).alias("query_id"),
            quantized_vec(vec_col).alias("qq"),
            _c(vec_col).alias("qv"),
        )
    )
    x = index.select(
        _c(id_col).alias("neighbor_id"),
        quantized_vec(vec_col).alias("qx"),
        _c(vec_col).alias("xv"),
    )
    scored = q.join(x, F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        seq_quantized_dot_udf()(F.col("qq"), F.col("qx")).alias("score_q"),
        "qv",
        "xv",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_q"), F.asc("neighbor_id")
    )
    if not rescore:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "score_q")
        )
    cand = scored.withColumn("crank", F.row_number().over(w)).where(
        F.col("crank") <= int(rescore)
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("sim", seq_cosine_udf()(F.col("qv"), F.col("xv")))
        .withColumn("rank", F.row_number().over(rw))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score_q")
    )


def _sum_vectors(members: DataFrame, dim: int) -> DataFrame:
    """(centroid_id, cv) elementwise BIGINT sum of quantized member vectors.

    posexplode -> partial-aggregated groupBy((centroid_id, pos)) is ONE
    shuffle of N*dim skinny rows with map-side combine — the scalable
    elementwise-sum shape (never collect_list of vectors per centroid).
    Empty clusters simply vanish (no rows), same as a SQL GROUP BY."""
    e = members.select("centroid_id", F.posexplode("q").alias("pos", "val"))
    s = e.groupBy("centroid_id", "pos").agg(F.sum("val").alias("s"))
    return (
        s.groupBy("centroid_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"))
        .select(
            "centroid_id",
            F.transform("ps", lambda x: x["s"].cast("double")).alias("cv"),
        )
    )


def _collect_centroid_matrix(centroids: DataFrame):
    """Driver-side (ids, C) numpy view of the (tiny) centroid table,
    rows ordered by ascending centroid_id."""
    rows = sorted(
        (r["centroid_id"], np.asarray(r["cv"], dtype=np.float64))
        for r in centroids.collect()
    )
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    C = np.stack([r[1] for r in rows]) if rows else np.zeros((0, 1))
    return ids, C


def _seq_dots(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """(n, K) dot products accumulated STRICTLY in dimension order —
    bit-identical to the SQL list_reduce / Column aggregate form (never
    np.dot, whose pairwise/SIMD order differs)."""
    n, dim = X.shape
    out = np.zeros((n, C.shape[0]), dtype=np.float64)
    for d in range(dim):
        out += X[:, d : d + 1] * C[:, d]
    return out


def make_ivf_assign_udf(ids: np.ndarray, C: np.ndarray):
    """pandas UDF embedding -> best centroid_id by cosine (tie -> smallest
    id). One Arrow pass over the data, no N x K row expansion: the K x dim
    centroid matrix rides in the UDF closure (broadcast-by-serialization)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    cnorm = np.zeros(len(C), dtype=np.float64)
    for d in range(C.shape[1]):
        cnorm += C[:, d] * C[:, d]

    @pandas_udf(LongType())
    def assign(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.to_numpy()).astype(np.float64)
        xnorm = np.zeros(len(X), dtype=np.float64)
        for d in range(X.shape[1]):
            xnorm += X[:, d] * X[:, d]
        sims = _seq_dots(X, C) / np.sqrt(xnorm[:, None] * cnorm[None, :])
        # columns are in ascending centroid_id order; argmax returns the
        # FIRST maximum -> ties break to the smallest id, as in the SQL
        # row_number(ORDER BY sim DESC, centroid_id) mirror.
        return pd.Series(ids[np.argmax(sims, axis=1)])

    return assign


def make_ivf_probe_udf(ids: np.ndarray, C: np.ndarray, nprobe: int):
    """pandas UDF embedding -> the nprobe nearest centroid ids (sim DESC,
    id ASC) as an array — replaces the query x centroid nested-loop join."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    cnorm = np.zeros(len(C), dtype=np.float64)
    for d in range(C.shape[1]):
        cnorm += C[:, d] * C[:, d]

    @pandas_udf(ArrayType(LongType()))
    def probe(emb: pd.Series) -> pd.Series:
        X = np.stack(emb.to_numpy()).astype(np.float64)
        xnorm = np.zeros(len(X), dtype=np.float64)
        for d in range(X.shape[1]):
            xnorm += X[:, d] * X[:, d]
        sims = _seq_dots(X, C) / np.sqrt(xnorm[:, None] * cnorm[None, :])
        # stable sort on -sim over columns already ordered by ascending
        # centroid_id -> ties break to the smallest id.
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(ids[order]))

    return probe


def ivf_train_centroids(
    index: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    dim: int = 64,
    iters: int = 2,
    init_planes: int = 6,
) -> DataFrame:
    """(centroid_id, cv) deterministic k-means-style IVF coarse centroids.

    Seeding is a derandomized k-means|| analogue: ONE pass oversamples the
    data into 2**init_planes hyperplane sign buckets (the same
    deterministic rational hyperplanes as the LSH path — each bucket is a
    directional cluster candidate, standing in for k-means||'s sampled
    candidate set), then the ``n_centroids`` heaviest buckets' exact
    integer component sums seed the centroids (count DESC, bucket ASC).
    ``iters`` Lloyd iterations refine: assignment is a single Arrow pass
    (argmax cosine against the broadcast K x dim matrix, no N x K row
    expansion); the update is an exact BIGINT elementwise sum (cosine is
    scale-invariant, so the sum vector needs no division) — every step is
    order-independent or sequential-order, hence SQL-oracle mirrorable.

    Scale: per iteration, one Arrow projection pass + one skinny
    (centroid_id, pos) shuffle with map-side combine. K and iters are
    constants; nothing is ever quadratic in N.
    """
    pts = index.select(
        _c(id_col).alias("id"),
        _c(vec_col).alias("v"),
        quantized_vec(vec_col).alias("q"),
        lsh_bucket_udf(init_planes, dim)(_c(vec_col)).alias("bucket"),
    ).persist()
    wb = Window.orderBy(F.desc("n"), F.asc("bucket"))
    top = (
        pts.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bucket"))
        .limit(n_centroids)
        .select("bucket", (F.row_number().over(wb) - 1).alias("centroid_id"))
    )
    members = pts.join(F.broadcast(top), "bucket").select("centroid_id", "q")
    cents = _sum_vectors(members, dim)
    for _ in range(iters):
        ids, C = _collect_centroid_matrix(cents)
        assign = make_ivf_assign_udf(ids, C)
        members = pts.select(assign(F.col("v")).alias("centroid_id"), "q")
        cents = _sum_vectors(members, dim)
    # Collect the (tiny, K-row) centroid table and re-ship it as a local
    # relation: one job instead of persist + count (and the caller's own
    # _collect_centroid_matrix then reads driver-local rows for free).
    from ..localdf import local_df

    rows = [
        (int(r["centroid_id"]), [float(v) for v in r["cv"]])
        for r in cents.collect()
    ]
    pts.unpersist()
    return local_df(
        index.sparkSession, rows, "centroid_id long, cv array<double>"
    )


def ivf_topk(
    index: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroids: DataFrame | None = None,
    train_iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """(query_id, rank, neighbor_id) approximate top-k by cosine via an
    IVF (inverted-file) coarse quantizer — the scale path complementing
    the banded-LSH variant:

    1. coarse centroids from ``ivf_train_centroids`` (deterministic
       bucket-sum seeding + exact-integer Lloyd refinement), or any
       caller-supplied (centroid_id, cv) table — the plan is
       centroid-table-agnostic;
    2. every index vector is assigned to its best list in ONE Arrow pass
       (argmax cosine against the closure-held K x dim matrix — no
       N x K row expansion, no nested-loop join);
    3. each query probes its ``nprobe`` nearest centroids (same Arrow
       form, array output exploded);
    4. candidates = equi-join on list id (bucket join, never all-pairs
       at scale), refined by exact JVM-side cosine + per-query top-k
       window.

    Dot products everywhere accumulate in dimension order, so a SQL
    oracle running the identical algorithm matches bit-for-bit.
    Approximate by construction: a true neighbor assigned to an unprobed
    list is missed (recall grows with nprobe).
    """
    if centroids is None:
        centroids = ivf_train_centroids(
            index, id_col, vec_col, n_centroids, dim=dim, iters=train_iters
        )
    ids, C = _collect_centroid_matrix(centroids)
    assign = make_ivf_assign_udf(ids, C)
    probe = make_ivf_probe_udf(ids, C, nprobe)
    assigned = index.select(
        _c(id_col).alias("neighbor_id"),
        _c(vec_col).alias("xv"),
        assign(_c(vec_col)).alias("list_id"),
    )
    probes = queries.select(
        _c(id_col).alias("query_id"),
        _c(vec_col).alias("qv"),
        F.explode(probe(_c(vec_col))).alias("list_id"),
    )
    scored = probes.join(assigned, "list_id").where(
        F.col("query_id") != F.col("neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.select(
            "query_id",
            "neighbor_id",
            seq_cosine_udf()(F.col("qv"), F.col("xv")).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id")
    )
