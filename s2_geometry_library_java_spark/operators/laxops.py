"""Lax-layer assembly at engine scale: mixed-dimension boolean results
(polygon + degenerate edges + degenerate points, kernel/booleanop
.boolean_op_mixed) routed through the lax polygon layer
(kernel/laxlayers.LaxPolygonLayer) — the consumer surface the reference
provides as S2LaxPolygonLayer (S2LaxPolygonLayer.java:134,204
DegenerateBoundaries options) over S2BooleanOperation output.

The pair kernel is single-threaded per pair, exactly like the reference;
the distributed form is mapInPandas over pair rows (geometry as
S2TextFormat columns) — partition by pair id at scale, no shuffle beyond
the input distribution."""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


LOOP_CLASS_SCHEMA = (
    "pair_id long, op string, model string, mode string, "
    "n_regular int, n_edge int, n_point int, n_full int"
)


def _lax_graph(poly, degen_edges, degen_points):
    """(sites, edges) lax input graph: polygon boundary loops as directed
    edges, degenerate edges as sibling pairs, degenerate points as
    self-edges (the S2LaxPolygonShape loop conventions)."""
    sites: list[tuple[float, float, float]] = []
    index: dict[tuple[float, float, float], int] = {}

    def sid(p) -> int:
        key = (float(p[0]), float(p[1]), float(p[2]))
        if key not in index:
            index[key] = len(sites)
            sites.append(key)
        return index[key]

    edges: list[tuple[int, int]] = []
    for lp in poly.loops:
        v = lp.vertices
        ids = [sid(v[i]) for i in range(len(v))]
        for i in range(len(ids)):
            edges.append((ids[i], ids[(i + 1) % len(ids)]))
    for pa, pb in degen_edges:
        a, b = sid(pa), sid(pb)
        edges.append((a, b))
        edges.append((b, a))
    for p in degen_points:
        a = sid(p)
        edges.append((a, a))
    S = np.asarray(sites, dtype=np.float64) if sites else np.zeros((0, 3))
    return S, edges


def loop_class_counts(loops: list[list[int]]) -> tuple[int, int, int, int]:
    """(n_regular, n_edge, n_point, n_full) by loop vertex count — the
    S2LaxPolygonShape dimension classes (>=3 regular boundary, 2 =
    degenerate sibling-pair loop, 1 = degenerate point loop, 0 = full)."""
    reg = sum(1 for lp in loops if len(lp) >= 3)
    edg = sum(1 for lp in loops if len(lp) == 2)
    pnt = sum(1 for lp in loops if len(lp) == 1)
    ful = sum(1 for lp in loops if len(lp) == 0)
    return reg, edg, pnt, ful


def lax_boolean_counts(pairs: DataFrame, modes: list[str]) -> DataFrame:
    """For each pair row (pair_id, a_text, b_text, op, model), run the
    mixed-dimension boolean kernel, assemble the result through
    LaxPolygonLayer under every DegenerateBoundaries mode, and emit the
    loop-class counts. One Arrow pass; pairs never leave their partition."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..kernel import booleanop as bo
        from ..kernel import laxlayers as lax
        from .shapes import _parse_polygon

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                a = _parse_polygon(r.a_text)
                b = _parse_polygon(r.b_text)
                poly, degen_edges, degen_points = bo.boolean_op_mixed(
                    a, b, r.op, model=r.model
                )
                sites, edges = _lax_graph(poly, degen_edges, degen_points)
                for mode in modes:
                    loops = lax.LaxPolygonLayer(mode).build(sites, edges)
                    reg, edg, pnt, ful = loop_class_counts(loops)
                    rows.append(
                        (int(r.pair_id), r.op, r.model, mode, reg, edg, pnt, ful)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "pair_id", "op", "model", "mode",
                    "n_regular", "n_edge", "n_point", "n_full",
                ],
            )

    return pairs.mapInPandas(run, LOOP_CLASS_SCHEMA)
