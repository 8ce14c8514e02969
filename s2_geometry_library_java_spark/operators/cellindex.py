"""S2CellIndex as DataFrame joins: a (cellId, label) multimap queried by
stabbing targets — which index cells intersect a target cell? Two S2 cells
intersect iff one CONTAINS the other (leaf ranges are nested or disjoint),
so the range-stabbing iterator of the reference (S2CellIndex.java:60
ContentsIterator, :170 RangeNode tree; getIntersectingLabels /
visitIntersectingCells :225-280) decomposes into two ancestor equi-joins:

1. index-contains-target: explode each target to its ancestors at every
   level present in the index and equi-join on the cell id;
2. target-contains-index (strictly deeper index cells): explode each index
   cell to its ancestors at every level present in the targets.

Both joins are keyed hash joins on int64 cell ids — no range join, no
broadcast requirement; the explode factor is bounded by the number of
distinct LEVELS (<= 31), collected driver-side like the kNN ring levels.
The reference's "each (cellId, label) pair visited at most once" guarantee
(ContentsIterator visited-node dedup) is the final dropDuplicates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions import columns as cc


def _distinct_levels(df: DataFrame, col: str) -> list[int]:
    # <= 31 rows: a driver-side level set, not data
    return sorted(
        int(r["lvl"])
        for r in df.select(cc.level(col).alias("lvl")).distinct().collect()
    )


def _ancestors_at(col: str, levels: list[int], strict: bool) -> Column:
    """array<struct<lvl,anc>> of this cell's ancestors at the given levels
    (lvl < level(col) when strict, else lvl <= level(col))."""
    own = cc.level(col)
    entries = F.array(
        *[
            F.struct(
                F.lit(lv).cast("int").alias("lvl"),
                cc.parent(col, F.lit(lv)).alias("anc"),
            )
            for lv in levels
        ]
    )
    cond = (lambda s: s["lvl"] < own) if strict else (lambda s: s["lvl"] <= own)
    return F.filter(entries, cond)


def intersecting_pairs(
    index: DataFrame,
    targets: DataFrame,
    cell_col: str = "cell_id",
    label_col: str = "label",
    target_col: str = "target",
    query_col: str = "query_id",
) -> DataFrame:
    """(query_id, cell_id, label): every (cellId, label) pair of the index
    that intersects the query's target cell, each pair at most once per
    query (S2CellIndex.visitIntersectingCells semantics; distinct labels
    per query = getIntersectingLabels)."""
    idx_levels = _distinct_levels(index, cell_col)
    tgt_levels = _distinct_levels(targets, target_col)
    idx = index.select(
        F.col(cell_col).alias("cell_id"), F.col(label_col).alias("label")
    )
    tgt = targets.select(
        F.col(query_col).alias("query_id"), F.col(target_col).alias("target")
    )
    # 1. index cell contains (or equals) the target
    t_anc = (
        tgt.withColumn(
            "s", F.explode(_ancestors_at("target", idx_levels, strict=False))
        )
        .select("query_id", F.col("s.anc").alias("cell_id"))
    )
    contains_t = t_anc.join(idx, "cell_id").select("query_id", "cell_id", "label")
    # 2. target strictly contains the (deeper) index cell
    i_anc = (
        idx.withColumn(
            "s", F.explode(_ancestors_at("cell_id", tgt_levels, strict=True))
        )
        .select("cell_id", "label", F.col("s.anc").alias("target"))
    )
    contains_i = i_anc.join(tgt, "target").select("query_id", "cell_id", "label")
    return contains_t.unionByName(contains_i).dropDuplicates(
        ["query_id", "cell_id", "label"]
    )
