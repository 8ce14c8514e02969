"""mixture_allocation / mixture_sample (operators/sampling.py):
largest-remainder apportionment properties, availability capping with
redistribution, and determinism of the drawn sample."""

from s2_geometry_library_java_spark.operators import sampling


def test_allocation_uncapped_largest_remainder():
    w = {"a": 0.5, "b": 0.25, "c": 0.15, "d": 0.10}
    got = sampling.mixture_allocation({k: 10**9 for k in w}, w, 37)
    # quotas 18.5 / 9.25 / 5.55 / 3.7 -> base 18/9/5/3, leftover 2 goes to
    # the largest remainders .7 (d) then .55 (c)
    assert got == {"a": 18, "b": 9, "c": 6, "d": 4}
    assert sum(got.values()) == 37


def test_allocation_caps_redistribute():
    w = {"a": 0.8, "b": 0.1, "c": 0.1}
    got = sampling.mixture_allocation({"a": 5, "b": 100, "c": 100}, w, 50)
    assert got["a"] == 5  # capped
    assert got["b"] + got["c"] == 45  # shortfall redistributed
    assert got["b"] == got["c"] or abs(got["b"] - got["c"]) <= 1
    assert sum(got.values()) == 50


def test_allocation_total_capped_by_availability():
    w = {"a": 0.5, "b": 0.5}
    got = sampling.mixture_allocation({"a": 3, "b": 4}, w, 100)
    assert got == {"a": 3, "b": 4}  # everything available, nothing more


def test_allocation_zero_weight_excluded():
    w = {"a": 1.0, "b": 0.0}
    got = sampling.mixture_allocation({"a": 10, "b": 10}, w, 6)
    assert got == {"a": 6, "b": 0}


def test_mixture_sample_exact_counts_and_determinism(spark):
    rows = [(i, f"s{i % 3}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    w = {"s0": 0.6, "s1": 0.3, "s2": 0.1}
    rows_a = sampling.mixture_sample(df, w, 50, "source", "doc_id", seed=4).collect()
    ids_a = sorted(r["doc_id"] for r in rows_a)
    counts = {}
    for r in rows_a:
        counts[r["source"]] = counts.get(r["source"], 0) + 1
    want = sampling.mixture_allocation({s: 100 for s in w}, w, 50)
    assert counts == {k: v for k, v in want.items() if v > 0}
    # re-run picks the identical rows (hash membership, no RNG state)
    b = sampling.mixture_sample(df, w, 50, "source", "doc_id", seed=4)
    assert sorted(r["doc_id"] for r in b.collect()) == ids_a
    # different seed picks a different set
    c = sampling.mixture_sample(df, w, 50, "source", "doc_id", seed=5)
    assert sorted(r["doc_id"] for r in c.collect()) != ids_a
