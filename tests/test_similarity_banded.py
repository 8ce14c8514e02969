"""Banded multi-table hyperplane LSH: recall on near-dup twins, bounded
bucket fanout, and the skew guard."""

import numpy as np
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import similarity


def _emb_df(spark, vecs, start_id=0):
    rows = [(int(start_id + i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, v array<double>")


def test_banded_lsh_twin_recall(spark):
    rng = np.random.default_rng(123455)
    base = rng.normal(0, 0.15, size=(200, 64))
    twins = base.copy()
    twins[:, 0] += 0.05
    df = _emb_df(spark, base).unionByName(_emb_df(spark, twins, start_id=1000000))
    pairs = {
        (r["a"], r["b"])
        for r in similarity.lsh_banded_pairs(
            df, "vec_id", "v", min_cosine=0.95
        ).collect()
    }
    # every twin pair has cosine ~0.999; banded LSH (4 independent tables)
    # must recover nearly all of them
    want = {(i, i + 1000000) for i in range(200)}
    found = len(want & pairs)
    assert found >= 0.9 * len(want), f"twin recall {found}/200"


def test_banded_lsh_skew_guard(spark):
    """50 identical vectors land in one band per table; with max_bucket=10
    the guard drops those bands entirely instead of emitting 50*49/2 pairs
    per table."""
    v = list(np.linspace(0.1, 0.7, 64))
    df = _emb_df(spark, [v] * 50)
    out = similarity.lsh_banded_pairs(df, "vec_id", "v", max_bucket=10).collect()
    assert out == []
    # with the guard off they all pair up
    out2 = similarity.lsh_banded_pairs(df, "vec_id", "v", max_bucket=10000).count()
    assert out2 == 50 * 49 // 2


def test_band_keys_table_disjoint(spark):
    """Band keys from different tables can never collide (table id is
    packed above the sign bits)."""
    rng = np.random.default_rng(7)
    df = _emb_df(spark, rng.normal(size=(20, 64)))
    bk = similarity.make_band_keys_udf(4, 16, 64)
    rows = df.select(F.explode(bk(F.col("v"))).alias("band")).collect()
    tables = {r["band"] >> 16 for r in rows}
    assert tables == {0, 1, 2, 3}
