"""Streaming trending terms (streaming/trending.py): finalized windowed
counts + sink-side top-k match the batch vocab computation per window."""

import datetime as dt

from pyspark.sql import functions as F

from s2_geometry_library_java_spark.streaming import trending

BASE = dt.datetime(2026, 4, 1)

ROWS = [
    # window [0:00, 1:00): apple x3, banana x2, cherry x1
    (0, "apple banana apple"),
    (10, "apple banana cherry"),
    # window [1:00, 2:00): date x2, apple x1
    (70, "date date apple"),
    # watermark flush event far in the future (its own window, unfinalized)
    (600, "flush"),
]


def test_windowed_counts_and_topk(spark, tmp_path):
    schema = "ts timestamp, text string"
    rows = [(BASE + dt.timedelta(seconds=s), t) for (s, t) in ROWS]
    src = str(tmp_path / "trend_docs")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    counts = trending.streaming_word_counts(
        stream, "text", "ts", window="1 minute", watermark="30 seconds"
    )
    q = (
        counts.writeStream.format("memory")
        .queryName("t_trend")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "tr_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink = spark.sql("SELECT * FROM t_trend")
    got = {
        (r["window_start"].second + r["window_start"].minute * 60, r["word"]): r["n"]
        for r in sink.collect()
    }
    assert got == {
        (0, "apple"): 3,
        (0, "banana"): 2,
        (0, "cherry"): 1,
        (60, "date"): 2,
        (60, "apple"): 1,
    }
    top = {
        (r["window_start"].minute, r["rank"]): r["word"]
        for r in trending.top_k_per_window(sink, k=2).collect()
    }
    assert top == {(0, 1): "apple", (0, 2): "banana", (1, 1): "date", (1, 2): "apple"}
