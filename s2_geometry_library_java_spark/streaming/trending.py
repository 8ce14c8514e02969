"""Streaming trending terms: watermarked windowed word counts.

The streaming twin of textstats.vocab_topk: per (tumbling window, word)
counts over exploded tokens, watermark-bounded state. The explode happens
BEFORE the stateful aggregation, so state is keyed by (window, word) —
bounded by vocabulary x windows-in-watermark, not by stream volume; the
stream shuffles once (the aggregation), exactly like the batch plan.

The top-k-per-window rank is a batch window function, which Structured
Streaming does not allow pre-sink in append mode — run it on the sink
table (the standard pattern) via ``top_k_per_window``; the heavy lifting
(count state) stays in the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..operators.dedup import normalized_words


def streaming_word_counts(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """(window_start, word, n) finalized per tumbling window (append-safe)."""
    words = (
        docs.withWatermark(ts_col, watermark)
        .select(F.col(ts_col), F.explode(normalized_words(text_col)).alias("word"))
        .where(F.col("word") != "")
    )
    return (
        words.groupBy(F.window(F.col(ts_col), window).alias("win"), F.col("word"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("window_start"), "word", "n")
    )


def top_k_per_window(counts: DataFrame, k: int = 5) -> DataFrame:
    """Rank the sink table: top-k words per window by (n desc, word asc)."""
    w = Window.partitionBy("window_start").orderBy(F.desc("n"), F.asc("word"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("window_start", "rank", "word", "n")
    )
