"""Streaming first-seen dedup + stream-static corpus dedup
(streaming/dedup.py): surviving set matches the batch exact-dedup
canonical rows; corpus tagging matches incremental_dedup's exact tier."""

import datetime as dt

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.operators import dedup as batch_dedup
from s2_geometry_library_java_spark.streaming import dedup as stream_dedup

BASE = dt.datetime(2026, 3, 1)

ROWS = [
    # (doc_id, seconds, text) — ids assigned in arrival order so
    # first-seen == min-id canonical
    (1, 0, "alpha beta gamma"),
    (2, 10, "delta epsilon"),
    (3, 20, "alpha beta gamma"),   # dup of 1
    (4, 30, "zeta eta theta"),
    (5, 40, "delta epsilon"),      # dup of 2
    (6, 50, "alpha beta gamma"),   # dup of 1
]


def _write_src(spark, tmp_path):
    schema = "doc_id long, ts timestamp, text string"
    rows = [(i, BASE + dt.timedelta(seconds=s), t) for (i, s, t) in ROWS]
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "docs_stream")
    df.coalesce(1).write.parquet(src)
    return df, src, schema


def test_first_seen_matches_batch_canonicals(spark, tmp_path):
    batch_df, src, schema = _write_src(spark, tmp_path)
    want = {
        r["id"]
        for r in batch_dedup.exact_duplicates(batch_df, "doc_id", "text")
        .where("id = canonical_id")
        .collect()
    }
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_dedup.streaming_first_seen_docs(stream, "text", "ts", "10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("t_first_seen")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"] for r in spark.sql("SELECT * FROM t_first_seen").collect()
    }
    assert got == want == {1, 2, 4}


def test_corpus_tagging_matches_incremental_exact_tier(spark, tmp_path):
    batch_df, src, schema = _write_src(spark, tmp_path)
    corpus = spark.createDataFrame(
        [(100, "alpha beta gamma"), (101, "unrelated corpus doc")],
        "doc_id long, text string",
    )
    hashes = corpus.select(F.md5(F.lower(F.col("text"))).alias("content_md5"))
    stream = spark.readStream.schema(schema).parquet(src)
    out = stream_dedup.streaming_dedup_against_corpus(stream, hashes, "text")
    q = (
        out.writeStream.format("memory")
        .queryName("t_corpus_tag")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ct_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["is_new"]
        for r in spark.sql("SELECT * FROM t_corpus_tag").collect()
    }
    # docs 1/3/6 ('alpha beta gamma') exist in the corpus -> not new
    assert got == {1: False, 2: True, 3: False, 4: True, 5: True, 6: False}
    # batch twin agrees: incremental_dedup exact tier on the same rows
    verd = {
        r["id"]: r["verdict"]
        for r in batch_dedup.incremental_dedup(
            corpus, batch_df, "doc_id", "text"
        ).collect()
    }
    for d, is_new in got.items():
        assert (verd[d] == "exact") == (not is_new)
