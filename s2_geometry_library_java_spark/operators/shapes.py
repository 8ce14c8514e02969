"""Executor-side shape prep: coverings and shape-index build as DataFrame
transforms over a polygon TABLE (no driver loop, no per-polygon closure).

This is the scale path SURVEY §2.D/§2.E planned: with 10^4-10^6 polygons
the per-shape work (coverer priority queue, edge clipping) runs inside
mapInPandas over the shapes table, and the geometry reaches the exact
point-in-polygon filter as a COLUMN on the candidate rows (broadcast hash
join on polygon_id), never as a driver-side Python object.

Shapes are rows (shape_id string, text string) in the S2TextFormat polygon
grammar ('lat:lng, ...; ...' — S2TextFormat.java:484-495), the engine's
only string geometry format.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

from ..functions import columns as cc
from ..functions import udfs
from ..kernel import cellid as s2
from ..localdf import local_df


@lru_cache(maxsize=4096)
def _parse_polygon(text: str):
    from ..kernel import region as rg

    return rg.Polygon.from_text(text)


_COVERING_SCHEMA = "shape_id string, cell_id long, is_interior boolean"


def coverings_df(shapes: DataFrame, max_cells: int = 8,
                 id_col: str = "shape_id", text_col: str = "text",
                 min_level: int = 0, max_level: int = 30,
                 level_mod: int = 1) -> DataFrame:
    """(shape_id, cell_id, is_interior) covering rows, computed on the
    executors — one coverer run per polygon row (D1 + interior flags).
    min_level/max_level/level_mod pass through to the coverer (cells come
    out denormalized to those valid levels — the term-indexer contract)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel import coverer as cov
        from ..kernel import region as rg
        from ..kernel.cell import Cell

        coverer = cov.RegionCoverer(
            max_cells=max_cells, min_level=min_level, max_level=max_level,
            level_mod=level_mod,
        )
        for pdf in batches:
            out_sid, out_cid, out_int = [], [], []
            for sid, text in zip(pdf[id_col], pdf[text_col]):
                poly = _parse_polygon(text)
                contains_cell, _, _ = rg.region_cell_tests(poly)
                for cid in coverer.get_covering(poly):
                    out_sid.append(sid)
                    out_cid.append(int(s2.to_signed(np.uint64(cid))[0]))
                    out_int.append(bool(contains_cell(Cell(cid))))
            yield pd.DataFrame(
                {"shape_id": out_sid, "cell_id": out_cid, "is_interior": out_int}
            )

    return shapes.select(F.col(id_col).alias(id_col), F.col(text_col)).mapInPandas(
        gen, _COVERING_SCHEMA
    )


_INDEX_SCHEMA = (
    "shape_id string, cell_id long, edge_id int, chain_id int, "
    "ax double, ay double, az double, bx double, by double, bz double"
)


def shape_index_df(shapes: DataFrame, max_edges_per_cell: int = 10,
                   max_level: int = 20, min_level: int = 0,
                   id_col: str = "shape_id", text_col: str = "text") -> DataFrame:
    """E2 build: (shape_id, cell_id, edge_id, edge endpoints) rows — the
    DataFrame form of S2ShapeIndex (an index IS a sorted table). Sort or
    bucket by biased cell id downstream for range-scan joins."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel import shapeindex as si

        for pdf in batches:
            rows = {k: [] for k in ("shape_id", "cell_id", "edge_id", "chain_id",
                                    "ax", "ay", "az", "bx", "by", "bz")}
            for sid, text in zip(pdf[id_col], pdf[text_col]):
                poly = _parse_polygon(text)
                loops = [lp.vertices for lp in poly.loops]
                va = np.concatenate(loops, axis=0)
                vb = np.concatenate([np.roll(lp, -1, axis=0) for lp in loops], axis=0)
                # chain id per global edge id (loops are concatenated)
                chain_of = np.repeat(
                    np.arange(len(loops)), [len(lp) for lp in loops]
                )
                for cid, edge_ids in si.build_shape_index(
                    loops, max_edges_per_cell=max_edges_per_cell,
                    max_level=max_level, min_level=min_level
                ):
                    for e in edge_ids:
                        rows["shape_id"].append(sid)
                        rows["cell_id"].append(int(s2.to_signed(np.uint64(cid))[0]))
                        rows["edge_id"].append(int(e))
                        rows["chain_id"].append(int(chain_of[e]))
                        rows["ax"].append(float(va[e, 0]))
                        rows["ay"].append(float(va[e, 1]))
                        rows["az"].append(float(va[e, 2]))
                        rows["bx"].append(float(vb[e, 0]))
                        rows["by"].append(float(vb[e, 1]))
                        rows["bz"].append(float(vb[e, 2]))
            yield pd.DataFrame(rows)

    return shapes.select(F.col(id_col), F.col(text_col)).mapInPandas(gen, _INDEX_SCHEMA)


@pandas_udf(BooleanType())
def _pip_contains_text(text: pd.Series, lat: pd.Series, lng: pd.Series) -> pd.Series:
    """Exact crossing-parity containment with the polygon geometry arriving
    as a column (parsed once per distinct polygon per batch)."""
    lat_r = np.radians(lat.to_numpy(np.float64))
    lng_r = np.radians(lng.to_numpy(np.float64))
    x, y, z = s2.latlng_to_xyz(lat_r, lng_r)
    pts = np.stack([x, y, z], axis=1)
    out = np.zeros(len(pts), dtype=bool)
    for t in pd.unique(text):
        mask = (text == t).to_numpy()
        poly = _parse_polygon(t)
        sub = pts[mask]
        out[mask] = poly.contains_points(sub[:, 0], sub[:, 1], sub[:, 2])
    return pd.Series(out)


@pandas_udf(BooleanType())
def _pip_interior_or_contains(
    is_interior: pd.Series, text: pd.Series, lat: pd.Series, lng: pd.Series
) -> pd.Series:
    """Interior fast-accept fused INTO the kernel: interior-cell candidates
    return True without touching the geometry; the crossing-parity kernel
    runs only on the boundary residue. One UDF -> one ArrowEvalPython ->
    one scan of the point table (the pip.py:153 pattern, in-UDF so interior
    rows skip the kernel work too)."""
    out = is_interior.to_numpy(dtype=bool).copy()
    boundary = ~out
    if boundary.any():
        lat_b = np.radians(lat.to_numpy(np.float64)[boundary])
        lng_b = np.radians(lng.to_numpy(np.float64)[boundary])
        x, y, z = s2.latlng_to_xyz(lat_b, lng_b)
        pts = np.stack([x, y, z], axis=1)
        res = np.zeros(len(pts), dtype=bool)
        text_b = text[boundary]
        for t in pd.unique(text_b):
            mask = (text_b == t).to_numpy()
            poly = _parse_polygon(t)
            sub = pts[mask]
            res[mask] = poly.contains_points(sub[:, 0], sub[:, 1], sub[:, 2])
        out[boundary] = res
    return pd.Series(out)


def pip_join_indexed(
    spark,
    points: DataFrame,
    shapes: DataFrame,
    point_id: str = "id",
    lat: str = "lat",
    lng: str = "lng",
    max_cells: int = 8,
    leaf_col: str | None = None,
    small_shapes: bool = True,
) -> DataFrame:
    """(point_id, polygon_id) PIP join with EXECUTOR-side polygon prep.

    Same physical plan as pip.pip_join (ancestor-level broadcast hash join,
    interior fast-accept, exact kernel on boundary candidates) but the
    covering table is computed distributed from the shapes table and the
    exact filter reads geometry from a joined column — no driver loop, no
    closure capture; scales to millions of polygons.

    ``small_shapes`` (default): the covering rows (<= max_cells per shape)
    are collected once and re-shipped as a local broadcast table — one
    tiny Spark job instead of persist + distinct-levels probe +
    InMemoryTableScan rematerialization inside the main job (~2x wall on
    the 6-polygon gate). Set False for very large shape tables (> ~10^5
    shapes), where the covering stays distributed/persisted.
    """
    if small_shapes:
        import numpy as _np

        from ..kernel import cellid as _ci

        collected = coverings_df(shapes, max_cells=max_cells).collect()
        levels = sorted(
            {
                int(_ci.level(_np.uint64(_np.int64(r["cell_id"]).view(_np.uint64))))
                for r in collected
            }
        )
        cov_b = F.broadcast(
            local_df(spark, 
                [(r["shape_id"], r["cell_id"], r["is_interior"]) for r in collected],
                "polygon_id string, cell_id long, is_interior boolean",
            )
        )
    else:
        # persist the covering rows: the distinct-levels probe and the
        # broadcast materialization would otherwise run the coverer twice
        cov_rows = coverings_df(shapes, max_cells=max_cells).persist()
        levels = [
            int(r["lvl"])
            for r in cov_rows.select(
                cc.level("cell_id").alias("lvl")
            ).distinct().collect()
        ]
        cov_b = F.broadcast(cov_rows.withColumnRenamed("shape_id", "polygon_id"))
    geom_b = F.broadcast(
        shapes.select(F.col("shape_id").alias("polygon_id"), F.col("text"))
    )
    if leaf_col is not None:
        leaf = F.col(leaf_col)
    else:
        leaf = udfs.cell_id_from_latlng_deg(F.col(lat), F.col(lng), 30)
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(lat).alias("lat"),
        F.col(lng).alias("lng"),
        leaf.alias("leaf"),
    )
    # ONE candidate pass: the covering join attaches is_interior, the
    # geometry join attaches the text column, and the fused UDF accepts
    # interior candidates without running the kernel. The point table is
    # scanned and Arrow-encoded exactly once (previously the interior and
    # boundary branches were independent subtrees and paid the dominant
    # scan+encode cost twice).
    cand = (
        pts.select(
            "point_id",
            "lat",
            "lng",
            F.explode(
                F.array(*[cc.parent("leaf", lv) for lv in levels])
            ).alias("cell_id"),
        )
        .join(cov_b, "cell_id")
        .join(geom_b, "polygon_id")
    )
    return cand.where(
        _pip_interior_or_contains(
            F.col("is_interior"), F.col("text"), F.col("lat"), F.col("lng")
        )
    ).select("point_id", "polygon_id")
