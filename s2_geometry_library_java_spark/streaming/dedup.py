"""Streaming ingestion dedup: first-seen-wins content dedup on a document
stream — the streaming twin of operators/dedup.exact_duplicates.

Two tiers:

* ``streaming_first_seen_docs`` — `dropDuplicatesWithinWatermark` on the
  content hash: state is bounded by (distinct hashes inside the watermark),
  so a continuous 100-TB/day ingest holds hours of state, not history.
  Exactly one row per content hash survives per watermark window; which
  duplicate wins follows arrival order within the micro-batch stream
  (first seen), matching the batch `canonical_id = min id` rule whenever
  ids are assigned in arrival order.

* ``streaming_dedup_against_corpus`` — the stream-static form of
  operators/dedup.incremental_dedup's exact tier: each micro-batch
  left-joins a STATIC corpus hash table (broadcast when small) and tags
  rows `is_new`; stateless per batch, the stream never shuffles for the
  probe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def content_hash(text_col: str):
    """The shared content key (matches operators/dedup.exact_duplicates)."""
    return F.md5(F.lower(F.col(text_col)))


def streaming_first_seen_docs(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first-arriving document per content hash; duplicates that
    arrive within the watermark of the first copy are dropped. State =
    one (hash, ts) entry per distinct content inside the watermark."""
    return (
        docs.withColumn("content_md5", content_hash(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_md5"])
    )


def streaming_dedup_against_corpus(
    docs: DataFrame, corpus_hashes: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Tag each streamed doc `is_new` against a static corpus hash table
    (one column: content_md5). Stateless stream-static left join —
    broadcast the corpus table when it fits, else Spark plans a
    stream-side-preserved hash join; either way no streaming state."""
    c = corpus_hashes.select(
        F.col("content_md5").alias("content_md5"), F.lit(True).alias("_hit")
    ).dropDuplicates(["content_md5"])
    return (
        docs.withColumn("content_md5", content_hash(text_col))
        .join(c, "content_md5", "left")
        .withColumn("is_new", F.col("_hit").isNull())
        .drop("_hit")
    )
