"""Deterministic sampling for training-mix construction.

Sampling a 100-TB corpus must be reproducible (re-runs and backfills
pick the SAME rows), seedable, and shuffle-free. Both operators here
decide membership from a pure integer hash of the row id — a 31-bit
LCG step (the same java.util.Random multiplier family the reference's
TestDataGenerator uses, kernel/javarandom.py) — evaluated as plain
Column arithmetic: no RNG state, no UDF, no shuffle for rate sampling,
one per-stratum shuffle for exact-count sampling. Every expression is
mirrorable in ANSI SQL (the tests run the DuckDB twin), keeping the
engine's everything-has-an-oracle property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 31-bit LCG (glibc constants): u = (id mod 2^31) * A + C mod 2^31.
# All intermediates fit int64 ((2^31)*A ~ 2.3e18 < 2^63), so the same
# expression runs exactly in Spark, DuckDB, and Python.
_A = 1103515245
_C = 12345
_M = 2147483648


def _hash01(col, seed: int):
    u = ((col % _M + _M) % _M + seed) % _M
    u = (u * _A + _C) % _M
    u = (u * _A + _C) % _M  # two rounds: decorrelate consecutive ids
    return u / float(_M)


def hash01_sql(id_expr: str, seed: int) -> str:
    """The ANSI-SQL twin of the sampling hash (for oracles)."""
    u = f"((({id_expr}) % {_M} + {_M}) % {_M} + {seed}) % {_M}"
    u = f"(({u}) * {_A} + {_C}) % {_M}"
    u = f"(({u}) * {_A} + {_C}) % {_M}"
    return f"CAST({u} AS DOUBLE) / {_M}.0"


def stratified_rate_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff hash01(id) < rates[stratum]: a per-stratum
    Bernoulli sample that is a pure filter — no shuffle, no state, and
    membership is stable under re-runs, repartitioning, and appends
    (a row's verdict depends only on its id and the seed). Strata not
    in ``rates`` fall back to ``default_rate``."""
    rate = F.lit(float(default_rate))
    for k, v in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == k, F.lit(float(v))).otherwise(rate)
    return df.where(_hash01(F.col(id_col), seed) < rate)


def stratified_exact_sample(
    df: DataFrame,
    counts: dict[str, int],
    stratum_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Exactly n rows per stratum (fewer if the stratum is smaller):
    rank rows by the sampling hash within each stratum and keep the
    first n — a uniform without-replacement sample, deterministic in
    (ids, seed). One shuffle (the per-stratum window)."""
    n = F.lit(0)
    for k, v in sorted(counts.items()):
        n = F.when(F.col(stratum_col) == k, F.lit(int(v))).otherwise(n)
    w = Window.partitionBy(stratum_col).orderBy(
        _hash01(F.col(id_col), seed).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= n)
        .drop("_rk")
    )
