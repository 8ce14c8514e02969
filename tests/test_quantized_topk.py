"""Scalar-quantized MIPS top-k (similarity.quantized_topk): integer
exactness vs a numpy oracle, rescore-stage agreement with brute-force
cosine, and determinism of the quantized score."""

import numpy as np
import pytest

from s2_geometry_library_java_spark.operators import similarity

DIM = 16
SCALE = 1 << 20


def _vectors(n, seed=7):
    rng = np.random.RandomState(seed)
    # clustered: 4 archetypes + small noise, so quantized MIPS and cosine
    # mostly agree and rescore has something real to fix.
    arch = rng.randn(4, DIM)
    X = arch[np.arange(n) % 4] + 0.05 * rng.randn(n, DIM)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return X.astype(np.float64)


def _df(spark, X):
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_quantized_scores_match_numpy(spark):
    X = _vectors(30)
    df = _df(spark, X)
    out = similarity.quantized_topk(
        df, df.where("vec_id < 3"), "vec_id", "embedding", k=4
    ).collect()
    Q = np.round(X * SCALE).astype(np.int64)
    for r in out:
        expect = int(Q[r["query_id"]] @ Q[r["neighbor_id"]])
        assert r["score_q"] == expect
    # every query got exactly k ranked rows 1..k
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert all(sorted(v) == [1, 2, 3, 4] for v in by_q.values())


def test_rescore_recovers_exact_cosine_order(spark):
    X = _vectors(40, seed=11)
    df = _df(spark, X)
    q = df.where("vec_id < 5")
    brute = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.cosine_topk_bruteforce(
            df, q, "vec_id", "embedding", k=3
        ).collect()
    }
    # rescore = whole index -> the two-stage result must equal brute force
    rescored = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.quantized_topk(
            df, q, "vec_id", "embedding", k=3, rescore=39
        ).collect()
    }
    assert rescored == brute


def test_rescore_recall_on_clustered_data(spark):
    X = _vectors(60, seed=3)
    df = _df(spark, X)
    q = df.where("vec_id < 8")
    brute = {}
    for r in similarity.cosine_topk_bruteforce(
        df, q, "vec_id", "embedding", k=5
    ).collect():
        brute.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    for r in similarity.quantized_topk(
        df, q, "vec_id", "embedding", k=5, rescore=20
    ).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = np.mean(
        [len(brute[qid] & got.get(qid, set())) / 5.0 for qid in brute]
    )
    assert recall >= 0.9, recall
