"""ngram_contamination: benchmark decontamination collision join."""

import numpy as np
from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import dedup


def _grams(text, n=5):
    w = [t for t in "".join(
        ch if ch.isalpha() or ch == " " else " " for ch in text.lower()
    ).split() if t]
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def test_contamination_matches_brute(spark):
    corpus = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        # verbatim copy of benchmark doc 100 (fully contaminated)
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        # partial overlap: shares a 6-word window with benchmark 100
        (3, "prefix words alpha beta gamma delta epsilon zeta suffix words"),
        # no overlap
        (4, "completely different text with no shared five gram windows at all"),
    ]
    bench = [
        (100, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (101, "the quick brown fox jumps over the lazy dog near the river bank"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    bdf = spark.createDataFrame(bench, "bench_id long, text string")
    got = {
        (r["doc_id"], r["bench_id"]): (r["collisions"], r["bench_size"])
        for r in dedup.ngram_contamination(docs, bdf, shingle_n=5).collect()
    }
    want = {}
    for did, text in corpus:
        g = _grams(text)
        for bid, btext in bench:
            bg = _grams(btext)
            hits = len(g & bg)
            if hits >= 1:
                want[(did, bid)] = (hits, len(bg))
    assert got == want
    assert (1, 101) in got and (2, 100) in got and (3, 100) in got
    assert not any(d == 4 for d, _ in got)
    # full containment: collisions == bench_size for the verbatim copy
    c, s = got[(2, 100)]
    assert c == s


def test_contamination_plan_broadcasts_benchmark(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} a b c d e f g h") for i in range(50)],
        "doc_id long, text string")
    bdf = spark.createDataFrame(
        [(0, "a b c d e f g h")], "bench_id long, text string")
    out = dedup.ngram_contamination(docs, bdf, shingle_n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # corpus side must not be globally deduped before the join (that would
    # shuffle the full corpus); distinctness lives in the aggregate
    assert out.count() == 50  # every doc shares the 5-gram tail windows
