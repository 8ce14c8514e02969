"""Deterministic stratified sampling: Python / DuckDB / Spark tri-parity
and statistical sanity on the documents table."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import sampling
from s2_geometry_library_java_spark.sources import tables
from tests.conftest import SF_DIR


def _py_hash01(i: int, seed: int) -> float:
    u = ((i % sampling._M + sampling._M) % sampling._M + seed) % sampling._M
    u = (u * sampling._A + sampling._C) % sampling._M
    u = (u * sampling._A + sampling._C) % sampling._M
    return u / float(sampling._M)


def test_rate_sample_matches_python_and_duckdb(spark):
    d = tables.load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    rates = {"en": 0.5, "de": 0.25}
    got = {
        r["doc_id"]
        for r in sampling.stratified_rate_sample(
            d, rates, "lang", seed=42
        ).collect()
    }
    rows = d.collect()
    want = {
        r["doc_id"]
        for r in rows
        if _py_hash01(r["doc_id"], 42) < rates.get(r["lang"], 0.0)
    }
    assert got == want
    assert 0 < len(got) < len(rows)
    # DuckDB twin of the same expression picks the same rows
    h = sampling.hash01_sql("doc_id", 42)
    sql = f"""
        SELECT doc_id FROM read_parquet('{SF_DIR}/documents.parquet')
        WHERE {h} < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
                    ELSE 0.0 END
    """
    duck = {r[0] for r in duckdb.sql(sql).fetchall()}
    assert duck == want
    # per-stratum empirical rates are in the right ballpark
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], [0, 0])
        by_lang[r["lang"]][0] += 1
        by_lang[r["lang"]][1] += r["doc_id"] in got
    for lang, (n, k) in by_lang.items():
        target = rates.get(lang, 0.0)
        assert abs(k / n - target) < 0.15, (lang, k, n)


def test_rate_sample_stable_under_repartition(spark):
    d = tables.load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    a = {
        r["doc_id"]
        for r in sampling.stratified_rate_sample(
            d, {"en": 0.3}, "lang", seed=7
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in sampling.stratified_rate_sample(
            d.repartition(17), {"en": 0.3}, "lang", seed=7
        ).collect()
    }
    assert a == b
    # a different seed picks a genuinely different subset
    c = {
        r["doc_id"]
        for r in sampling.stratified_rate_sample(
            d, {"en": 0.3}, "lang", seed=8
        ).collect()
    }
    assert c != a


def test_exact_sample_counts_and_determinism(spark):
    d = tables.load_table(spark, SF_DIR, "documents").select("doc_id", "lang")
    counts = {"en": 25, "de": 10}
    out = sampling.stratified_exact_sample(d, counts, "lang", seed=3)
    per = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    avail = {
        r["lang"]: r["n"]
        for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    for lang, want_n in counts.items():
        assert per.get(lang, 0) == min(want_n, avail.get(lang, 0))
    assert set(per) <= set(counts)  # other strata get n=0
    # deterministic: same (data, seed) -> same ids; matches the Python rank
    ids = sorted(r["doc_id"] for r in out.where(F.col("lang") == "en").collect())
    en_rows = [r["doc_id"] for r in d.where(F.col("lang") == "en").collect()]
    want = sorted(
        sorted(en_rows, key=lambda i: (_py_hash01(i, 3), i))[:25]
    )
    assert ids == want
