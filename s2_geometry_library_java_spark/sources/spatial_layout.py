"""Spatially-partitioned table layout: the engine's Iceberg story.

SURVEY §4 'partition pruning by shard covering': store
``part_cell = parent(leaf, L_part)`` as a partition column so the table's
file metadata IS a spatial index — a query region's covering maps to a
``part_cell IN (...)`` predicate that the reader turns into file pruning
(zero I/O outside the covering), exactly like an Iceberg partition spec
over the same column. Plain parquet partitionBy here; the layout and the
pruning predicate are format-agnostic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions import columns as cc
from ..kernel import cellid as s2


def write_spatial_table(
    df: DataFrame,
    path: str,
    leaf_col: str = "leaf",
    part_level: int = 3,
    sort_within: bool = True,
) -> None:
    """Write df partitioned by the level-``part_level`` ancestor of its
    leaf cell id and (optionally) sorted by biased leaf within files —
    range scans then touch only matching partitions and read files in
    Hilbert order (the S2PointIndex layout as a table)."""
    out = df.withColumn("part_cell", cc.parent(leaf_col, part_level))
    if sort_within:
        out = out.repartition("part_cell").sortWithinPartitions(cc.biased(leaf_col))
    out.write.mode("overwrite").partitionBy("part_cell").parquet(path)


def pruned_scan(
    spark: SparkSession,
    path: str,
    covering_ids: list[int],
    part_level: int = 3,
) -> DataFrame:
    """Scan only the partitions a covering can intersect: every level-
    ``part_level`` ancestor/descendant slot each covering cell overlaps —
    a tiny driver-side computation on the covering (the RegionSharder
    dual), emitted as a partition-column IN filter that the file source
    turns into metadata pruning (no data I/O outside)."""
    parts: set[int] = set()
    for cid in covering_ids:
        u = np.uint64(cid)
        lvl = int(np.atleast_1d(s2.level(u))[0])
        if lvl >= part_level:
            parts.add(int(np.int64(np.atleast_1d(s2.parent(u, part_level))[0])))
        else:
            begin = int(np.atleast_1d(s2.child_begin(u, part_level))[0])
            end = int(np.atleast_1d(s2.child_end(u, part_level))[0])
            cur = np.uint64(begin)
            while int(cur) != end:
                parts.add(int(np.int64(cur)))
                cur = np.atleast_1d(s2.next_cell(cur))[0]
    df = spark.read.parquet(path)
    return df.where(F.col("part_cell").isin(sorted(parts)))
