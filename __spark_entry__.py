"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The engine lives in ``s2_geometry_library_java_spark/``; this module is a
thin shim over its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from s2_geometry_library_java_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: derive the interleaved
    text+media document table, tile every geotagged media span at level 12,
    PIP-join spans against the 6 query polygons (covering broadcast range
    join + crossing-parity kernel), and return per-span assignments."""
    from s2_geometry_library_java_spark.functions import columns as cc
    from s2_geometry_library_java_spark.operators import pip, tiling
    from s2_geometry_library_java_spark.sources import docs as docsrc
    from s2_geometry_library_java_spark.sources import tables

    sf_dir = "/root/testdata/sf0.001"
    d = docsrc.with_spans(tables.load_table(spark, sf_dir, "documents"))
    spans = docsrc.geotagged_media_spans(d)
    tiled = tiling.tile_points(spans, level=12).withColumn(
        "tile_token", cc.token("tile")
    )
    hits = pip.pip_join(
        spark,
        tiled.select(
            F.concat_ws("_", "doc_id", "offset").alias("span_key"), "lat", "lng"
        ),
        q.pip_polygons(),
        point_id="span_key",
    ).withColumnRenamed("point_id", "span_key")
    return (
        tiled.withColumn("span_key", F.concat_ws("_", "doc_id", "offset"))
        .join(hits, "span_key", "left")
        .select("doc_id", "offset", "media_ref", "tile_token", "polygon_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query (omissions = rows-only checks)."""
    return q.all_oracles()
