"""Structured Streaming surface: streaming tile rollups.

The reference library has NO streaming surface (SURVEY.md §2.I); this is
engine-native: a stream of geotagged events is tiled with the same Arrow
kernel and rolled up per (window, tile) with watermarked event time —
late data handled by Spark's state store, exactly-once via checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import columns as cc
from ..functions import udfs
from ..sources import geo


def synthetic_point_stream(spark: SparkSession, rows_per_second: int = 1000) -> DataFrame:
    """Deterministic geotagged event stream from the rate source (value is
    a monotonically increasing long; geo derives from it like every other
    key in the engine)."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    return rate.select(
        F.col("timestamp").alias("event_time"),
        F.col("value").alias("event_id"),
        geo.lat_col("value").alias("lat"),
        geo.lng_col("value").alias("lng"),
    )


def streaming_tile_counts(
    points: DataFrame,
    level: int = 8,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Windowed per-tile counts over a streaming point source.

    The tile kernel is the same pandas UDF as batch; state is keyed by
    (window, tile) so partitioning follows the tile id — hot metros spread
    across state partitions by the window dimension.
    """
    tiled = points.withColumn(
        "tile",
        cc.parent(udfs.cell_id_from_latlng_deg(F.col("lat"), F.col("lng"), 30), level),
    )
    return (
        tiled.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), F.col("tile"))
        .agg(F.count("*").alias("n"), F.approx_count_distinct("event_id").alias("approx_ids"))
        .select(
            F.col("w.start").alias("window_start"),
            cc.token("tile").alias("tile_token"),
            "n",
            "approx_ids",
        )
    )


def run_to_memory_sink(
    spark: SparkSession, level: int = 8, rows_per_second: int = 5000, name: str = "tile_counts"
):
    """Drive the stream once with availableNow into a memory sink (tests /
    local smoke); returns the StreamingQuery."""
    counts = streaming_tile_counts(synthetic_point_stream(spark, rows_per_second), level)
    return (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
