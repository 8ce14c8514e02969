"""Shape and shape-index measures (S2ShapeMeasures / S2ShapeIndexMeasures).

Per-shape measures run as one Arrow pass (``mapInPandas``) over a table of
shapes in S2TextFormat-ish text, dispatched on the shape kind; the
index-level rollup (``index_measures``) is a single JVM aggregation over
the per-shape table — dimension-conditional sums, no Python, one shuffle.

Semantics mirrored from the reference:

* ``length`` — total polyline length, 0 for other dimensions
  (S2ShapeMeasures.java:46-66).
* ``perimeter`` — sum of loop perimeters for dimension-2 shapes
  (S2ShapeMeasures.java:72-92).
* ``area`` — sum of ORIENTED per-loop signed areas with ONE shape-level
  +4pi adjustment when negative, so CW hole loops subtract
  (S2ShapeMeasures.java:99-113,193).
* ``centroid`` — the true centroid times the shape's measure (count /
  length / area by dimension), NOT normalized, so centroids sum across
  shapes (S2ShapeMeasures.java:440-468).
* ``index_measures`` — the S2ShapeIndexMeasures rollup: length sums
  polylines, perimeter/area sum polygons, and the centroid sums only the
  shapes of MAXIMAL dimension (S2ShapeIndexMeasures.java:30-133).

Polygon text here is ORIENTED (';'-separated loops, holes wound CW) —
the S2LaxPolygonShape convention S2ShapeMeasures operates on — unlike
region.Polygon.from_text, which normalizes each loop to its CCW-small
form for the XOR containment model.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, StringType, StructField, StructType,
)

MEASURES_SCHEMA = StructType([
    StructField("shape_id", StringType()),
    StructField("dim", IntegerType()),
    StructField("length", DoubleType()),
    StructField("perimeter", DoubleType()),
    StructField("area", DoubleType()),
    StructField("cx", DoubleType()),
    StructField("cy", DoubleType()),
    StructField("cz", DoubleType()),
])

_KIND_DIM = {"points": 0, "polyline": 1, "polygon": 2}


def _parse_latlngs(text: str) -> np.ndarray:
    from ..kernel import cellid as ci

    pts = [tok.strip().split(":") for tok in text.strip().split(",") if tok.strip()]
    lat = np.radians(np.array([float(p[0]) for p in pts]))
    lng = np.radians(np.array([float(p[1]) for p in pts]))
    x, y, z = ci.latlng_to_xyz(lat, lng)
    return np.stack([x, y, z], axis=1)


def _one_shape(kind: str, text: str) -> tuple:
    from ..kernel import sphere

    dim = _KIND_DIM[kind]
    length = perimeter = area = 0.0
    centroid = np.zeros(3)
    if dim == 0:
        pts = _parse_latlngs(text)
        centroid = pts.sum(axis=0)
    elif dim == 1:
        v = _parse_latlngs(text)
        length = sphere.polyline_length(v)
        if len(v) >= 2:
            centroid = sphere.edge_true_centroid(v[:-1], v[1:]).sum(axis=0)
    else:
        for loop_text in text.strip().split(";"):
            loop_text = loop_text.strip()
            if not loop_text:
                continue
            v = _parse_latlngs(loop_text)
            if len(v) >= 2:
                closed = np.concatenate([v, v[:1]], axis=0)
                perimeter += sphere.polyline_length(closed)
            area += sphere.raw_signed_loop_area(v)
            centroid += sphere.loop_centroid(v)
        # signedLoopArea guarantees the full loop a small negative sum;
        # one shape-level wrap keeps holes subtractive
        # (S2ShapeMeasures.java:107-112)
        if area < 0.0:
            area += 4.0 * np.pi
    return dim, length, perimeter, area, centroid


def approx_shape_area(kind: str, text: str) -> float:
    """Gauss-Bonnet area: per loop 2*pi minus the turning angle, summed,
    then wrapped mod 4*pi for full polygons (S2ShapeMeasures.java:121-147
    approxArea/approxLoopArea). Faster convention than the fan sum; error
    <= 2.22e-15 steradians per vertex. 0 for non-polygon shapes."""
    from ..kernel import sphere

    if _KIND_DIM[kind] != 2:
        return 0.0
    area = 0.0
    for loop_text in text.strip().split(";"):
        loop_text = loop_text.strip()
        if not loop_text:
            continue
        v = _parse_latlngs(loop_text)
        area += 2.0 * np.pi - sphere.loop_curvature(v)
    if area <= 4.0 * np.pi:
        return area
    return area % (4.0 * np.pi)


def shape_measures(
    shapes: DataFrame,
    id_col: str = "shape_id",
    kind_col: str = "kind",
    text_col: str = "text",
) -> DataFrame:
    """(shape_id, dim, length, perimeter, area, cx, cy, cz) per shape.

    ``kind`` is one of points | polyline | polygon; ``text`` is
    comma-separated ``lat:lng`` in degrees (polygon: ';'-separated
    oriented loops). The centroid columns carry the measure-weighted true
    centroid, summable across shapes."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in MEASURES_SCHEMA.fieldNames()}
            for sid, kind, text in zip(
                pdf["shape_id"], pdf["kind"], pdf["text"]
            ):
                dim, length, perimeter, area, centroid = _one_shape(kind, text)
                out["shape_id"].append(sid)
                out["dim"].append(dim)
                out["length"].append(length)
                out["perimeter"].append(perimeter)
                out["area"].append(area)
                out["cx"].append(float(centroid[0]))
                out["cy"].append(float(centroid[1]))
                out["cz"].append(float(centroid[2]))
            yield pd.DataFrame(out)

    return shapes.select(
        F.col(id_col).cast("string").alias("shape_id"),
        F.col(kind_col).alias("kind"),
        F.col(text_col).alias("text"),
    ).mapInPandas(gen, MEASURES_SCHEMA)


def index_measures(measures: DataFrame) -> DataFrame:
    """One-row S2ShapeIndexMeasures rollup over a shape_measures table.

    dimension = max shape dimension; length/perimeter/area sum over the
    shapes of the relevant dimension; the centroid sums only the
    maximal-dimension shapes (S2ShapeIndexMeasures.java:124-133 — lower
    dimensions are ignored, e.g. points don't perturb a polyline
    centroid). Partial aggregation happens map-side; the final reduce
    sees one row per partition."""
    dim1 = F.col("dim") == 1
    dim2 = F.col("dim") == 2
    dmax = F.max("dim")
    # per-dimension conditional sums in ONE aggregation; the final select
    # picks the centroid of the maximal dimension (no second scan)
    agg = measures.groupBy().agg(
        F.coalesce(dmax, F.lit(-1)).alias("dimension"),
        F.sum(F.when(dim1, F.col("length")).otherwise(0.0)).alias("length"),
        F.sum(F.when(dim2, F.col("perimeter")).otherwise(0.0)).alias("perimeter"),
        F.sum(F.when(dim2, F.col("area")).otherwise(0.0)).alias("area"),
        *[
            F.sum(
                F.when(F.col("dim") == 0, F.col(c)).otherwise(0.0)
            ).alias(c + "0")
            for c in ("cx", "cy", "cz")
        ],
        *[
            F.sum(F.when(dim1, F.col(c)).otherwise(0.0)).alias(c + "1")
            for c in ("cx", "cy", "cz")
        ],
        *[
            F.sum(F.when(dim2, F.col(c)).otherwise(0.0)).alias(c + "2")
            for c in ("cx", "cy", "cz")
        ],
    )
    pick = lambda c: (  # noqa: E731
        F.when(F.col("dimension") == 2, F.col(c + "2"))
        .when(F.col("dimension") == 1, F.col(c + "1"))
        .when(F.col("dimension") == 0, F.col(c + "0"))
        .otherwise(0.0)
    )
    return agg.select(
        "dimension", "length", "perimeter", "area",
        pick("cx").alias("cx"), pick("cy").alias("cy"), pick("cz").alias("cz"),
    )
