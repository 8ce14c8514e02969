"""Streaming geofence: stream-static point-in-polygon join.

The canonical streaming use of the S2 cell machinery
(S2ContainsPointQuery.java:113 semantics, same two-tier plan as
operators/pip.pip_join): a stream of geotagged events is joined against
a STATIC broadcast covering table (polygon_id, covering cell,
is_interior), with the exact crossing-parity kernel run only on
boundary-cell candidates. Everything is a stateless per-batch map for
the hit stream — no streaming state, no shuffle of the event stream —
so it runs identically under micro-batch and continuous triggers and
at any executor count. The windowed-count form adds the one stateful
stage (watermarked window aggregation) AFTER the thin hit stream.

At 100 TB/day the event stream never shuffles for the join: the
covering table is O(polygons x max_cells) rows and broadcasts; state is
bounded by (windows in watermark) x (polygons hit).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions import columns as cc
from ..functions import udfs
from ..kernel import cellid as s2
from ..localdf import local_df
from ..operators.pip import covering_rows, make_pip_contains_udf


def geofence_hits(
    spark,
    events: DataFrame,
    polygons: dict,
    point_id: str = "entity_id",
    lat: str = "lat",
    lng: str = "lng",
    time_col: str = "event_time",
    max_cells: int = 8,
) -> DataFrame:
    """(event_time, point_id, polygon_id) for every event inside each
    fence. ``events`` may be a streaming OR batch DataFrame — the plan is
    a stateless broadcast hash join (ancestor-explode form, exactly
    operators/pip.pip_join) plus the boundary-sliver exact kernel, so
    streaming output bit-matches the batch join on the same rows."""
    rows = covering_rows(polygons, max_cells=max_cells)
    levels = sorted(
        {int(s2.level(np.uint64(np.int64(r[1]).view(np.uint64)))) for r in rows}
    )
    cov_df = F.broadcast(
        local_df(
            spark,
            rows,
            "polygon_id string, cell_id long, range_min_b long, "
            "range_max_b long, is_interior boolean",
        ).select("polygon_id", "cell_id", "is_interior")
    )
    pts = events.select(
        F.col(time_col).alias("event_time"),
        F.col(point_id).alias("point_id"),
        F.col(lat).alias("lat"),
        F.col(lng).alias("lng"),
        udfs.cell_id_from_latlng_deg(F.col(lat), F.col(lng), 30).alias("leaf"),
    )
    cand = pts.select(
        "event_time",
        "point_id",
        "lat",
        "lng",
        F.explode(F.array(*[cc.parent("leaf", lv) for lv in levels])).alias(
            "cell_id"
        ),
    ).join(cov_df, "cell_id")
    pip = make_pip_contains_udf(polygons)
    hits = cand.where(
        F.col("is_interior") | pip(F.col("polygon_id"), F.col("lat"), F.col("lng"))
    )
    return hits.select("event_time", "point_id", "polygon_id")


def streaming_geofence_counts(
    spark,
    events: DataFrame,
    polygons: dict,
    window: str = "1 minute",
    watermark: str = "30 seconds",
    **kwargs,
) -> DataFrame:
    """Watermarked per-(window, fence) occupancy: event count + distinct
    entities. Append output mode; late events beyond the watermark drop,
    windows finalize once the watermark passes."""
    hits = geofence_hits(spark, events, polygons, **kwargs)
    return (
        hits.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "polygon_id")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("point_id").alias("n_entities"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "polygon_id",
            "n_events",
            "n_entities",
        )
    )
