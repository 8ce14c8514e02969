"""tile_top_categories (operators/tiling.py) and grouped_percentiles
(operators/textstats.py): hand-computed oracles + plan shape."""

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import textstats, tiling


def test_tile_top_categories(spark):
    rows = (
        [(1, "a")] * 5 + [(1, "b")] * 3 + [(1, "c")] * 3 + [(1, "d")] * 1
        + [(2, "x")] * 2 + [(2, "y")] * 2
    )
    df = spark.createDataFrame(rows, "tile long, cat string")
    out = {
        (r["tile"], r["rank"]): (r["cat"], r["n"])
        for r in tiling.tile_top_categories(df, "cat", k=2).collect()
    }
    assert out[(1, 1)] == ("a", 5)
    assert out[(1, 2)] == ("b", 3)  # b beats c on the tie by name
    assert out[(2, 1)] == ("x", 2)  # tie: x before y
    assert out[(2, 2)] == ("y", 2)
    assert len(out) == 4


def test_tile_top_categories_single_exchange(spark):
    df = spark.createDataFrame([(1, "a"), (1, "b")], "tile long, cat string")
    plan = (
        tiling.tile_top_categories(df, "cat", k=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the rank window reuses the (tile, cat) hash partitioning? No — it
    # needs tile-only clustering, which (tile, cat) hashing does NOT
    # provide; expect exactly two Exchanges: one for the histogram, one
    # tile-keyed for the window (histogram-sized, not input-sized).
    assert plan.count("Exchange") == 2, plan


def test_grouped_percentiles_exact(spark):
    rows = [("s", v) for v in [10, 20, 30, 40, 50, 60, 70, 80, 90, 100]]
    rows += [("t", v) for v in [7, 5, 3]]
    df = spark.createDataFrame(rows, "grp string, v long")
    out = {
        (r["grp"], r["pct"]): (r["v"], r["n"])
        for r in textstats.grouped_percentiles(df, "grp", "v", (50, 90)).collect()
    }
    # s: n=10 -> p50 at rank 5 = 50, p90 at rank 9 = 90
    assert out[("s", 50)] == (50, 10)
    assert out[("s", 90)] == (90, 10)
    # t: n=3 -> p50 at rank ceil(1.5)=2 -> sorted [3,5,7] -> 5;
    #          p90 at rank ceil(2.7)=3 -> 7
    assert out[("t", 50)] == (5, 3)
    assert out[("t", 90)] == (7, 3)


def test_grouped_percentiles_same_rank_dedup(spark):
    # n=1: p50 and p90 both land on rank 1 -> the row must appear TWICE
    # (once per pct label), not once
    df = spark.createDataFrame([("u", 42)], "grp string, v long")
    out = sorted(
        (r["pct"], r["v"])
        for r in textstats.grouped_percentiles(df, "grp", "v", (50, 90)).collect()
    )
    assert out == [(50, 42), (90, 42)]
