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


def streaming_first_seen(
    points: DataFrame, level: int = 8, entity: str = "entity_id"
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): emit
    each (tile, entity) pair the FIRST time it appears in the stream —
    streaming spatial dedup. State per tile = the set of entity ids seen;
    Spark's state store shards by the tile key, so hot tiles parallelize
    across partitions like every other tile-keyed op in the engine.

    Rows inside a batch are processed in event_time order so "first" is
    deterministic for same-batch duplicates. State grows with distinct
    entities per tile; production pipelines bound it with a timeout
    (GroupStateTimeout.EventTimeTimeout + a watermark) — kept NoTimeout
    here because the engine's batch dedup covers compaction.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    tiled = points.withColumn(
        "tile",
        cc.parent(udfs.cell_id_from_latlng_deg(F.col("lat"), F.col("lng"), 30), level),
    )

    def fn(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        out = []
        # applyInPandasWithState may split one group across several chunks
        # of the iterator: concatenate first, sort ONCE, so "first" is
        # globally event_time-ordered within the batch (not per-chunk).
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allrows = pd.concat(chunks, ignore_index=True).sort_values(
                "event_time", kind="mergesort"
            )
            for eid, t in zip(allrows[entity], allrows["event_time"]):
                e = int(eid)
                if e not in seen:
                    seen.add(e)
                    out.append((int(key[0]), e, t))
        state.update((sorted(seen),))
        yield pd.DataFrame(out, columns=["tile", "entity_id", "event_time"])

    return tiled.groupBy("tile").applyInPandasWithState(
        fn,
        "tile long, entity_id long, event_time timestamp",
        "seen array<long>",
        "append",
        GroupStateTimeout.NoTimeout,
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
