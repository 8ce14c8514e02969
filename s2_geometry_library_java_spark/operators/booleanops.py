"""G1 at engine scale: boolean ops over TABLES of polygon pairs.

The kernel (kernel/booleanop.py) computes one pair on one core — exactly
like the reference, whose S2BooleanOperation is single-threaded per pair
(S2BooleanOperation.java). The distributed form the booleanop docstring
promises lives here:

1. candidate pairs come from a covering join: each shape's covering cells
   (computed executor-side, operators/shapes.coverings_df) emit ancestors
   at the OTHER side's covering levels and equi-join on the cell id —
   cell-id equality means Hilbert-range containment, so a pair is a
   candidate iff the coverings actually intersect (no false negatives by
   covering soundness, no nested-loop range join);
2. the pair kernel runs inside mapInPandas over the candidate pair rows
   (geometry arrives as S2TextFormat columns), emitting the result
   polygon as text plus loop/vertex counts.

Pairs whose coverings do not intersect have empty intersection by
construction and are never materialized — with N x M shapes the join does
the pruning, not a cross product.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions import columns as cc
from .shapes import _parse_polygon, coverings_df
from ..localdf import local_df


def _levels(cov: DataFrame) -> list[int]:
    return [
        int(r["lvl"])
        for r in cov.select(cc.level("cell_id").alias("lvl")).distinct().collect()
    ]


SMALL_SHAPES_THRESHOLD = 1000


def candidate_pairs(
    shapes_a: DataFrame,
    shapes_b: DataFrame,
    max_cells: int = 8,
    small_shapes: bool | None = None,
) -> DataFrame:
    """(a_id, b_id) for every pair whose coverings share sphere area —
    the covering-intersection join (a cell of one side contained in a
    cell of the other, tested as ancestor equi-joins both ways).

    ``small_shapes`` True: BOTH sides' coverings come from a single
    distributed coverer pass over the union of the shape tables, collected
    once, and the range-overlap pairing runs driver-side on the tiny cell
    lists — one Python-stage job instead of two persisted covering jobs
    plus level probes. False: the ancestor equi-join form below stays
    fully distributed. Default None AUTO-selects: the driver-side
    O(|covA|*|covB|) pairing is only taken when both sides count at most
    SMALL_SHAPES_THRESHOLD shapes, so large tables can never hit the
    collect path by default."""
    if small_shapes is None:
        small_shapes = (
            shapes_a.count() <= SMALL_SHAPES_THRESHOLD
            and shapes_b.count() <= SMALL_SHAPES_THRESHOLD
        )
    if small_shapes:
        import numpy as _np

        from ..kernel import cellid as _ci

        spark = shapes_a.sparkSession
        tagged = shapes_a.select(
            F.concat(F.lit("a|"), F.col("shape_id")).alias("shape_id"), "text"
        ).unionByName(
            shapes_b.select(
                F.concat(F.lit("b|"), F.col("shape_id")).alias("shape_id"), "text"
            )
        )
        rows = coverings_df(tagged.coalesce(1), max_cells=max_cells).collect()
        sides: dict[str, list[tuple[str, int, int]]] = {"a": [], "b": []}
        for r in rows:
            side, sid = r["shape_id"].split("|", 1)
            u = _np.uint64(_np.int64(r["cell_id"]).view(_np.uint64))
            lo = int(_np.atleast_1d(_ci.range_min(u))[0])
            hi = int(_np.atleast_1d(_ci.range_max(u))[0])
            sides[side].append((sid, lo, hi))
        pairs = sorted(
            {
                (aid, bid)
                for aid, alo, ahi in sides["a"]
                for bid, blo, bhi in sides["b"]
                if alo <= bhi and blo <= ahi
            }
        )
        # coalesce to the pair count: a driver-local list parallelizes to
        # defaultParallelism slices, and every downstream mapInPandas task
        # costs a Python worker — 32 near-empty workers for 2 pairs is
        # pure scheduling overhead on the pair-kernel stage
        return local_df(spark, 
            pairs or [], "a_id string, b_id string"
        ).coalesce(max(1, min(len(pairs), 32)))
    cov_a = coverings_df(shapes_a, max_cells=max_cells).select(
        F.col("shape_id").alias("a_id"), "cell_id"
    ).persist()
    cov_b = coverings_df(shapes_b, max_cells=max_cells).select(
        F.col("shape_id").alias("b_id"), "cell_id"
    ).persist()
    la, lb = _levels(cov_a), _levels(cov_b)

    def ancestors(cov, levels, id_col):
        lvl = cc.level("cell_id")
        return cov.select(
            id_col,
            F.explode(
                F.filter(
                    F.array(
                        *[
                            F.when(lvl >= L, cc.parent("cell_id", L))
                            for L in levels
                        ]
                    ),
                    lambda c: c.isNotNull(),
                )
            ).alias("cell"),
        )

    a_in_b = ancestors(cov_a, lb, "a_id").join(
        cov_b.withColumnRenamed("cell_id", "cell"), "cell"
    )
    b_in_a = ancestors(cov_b, la, "b_id").join(
        cov_a.withColumnRenamed("cell_id", "cell"), "cell"
    )
    return (
        a_in_b.select("a_id", "b_id")
        .unionByName(b_in_a.select("a_id", "b_id"))
        .distinct()
    )


_PAIR_SCHEMA = (
    "a_id string, b_id string, op string, result string, "
    "n_loops int, n_vertices int"
)

_PAIR_MIXED_SCHEMA = (
    _PAIR_SCHEMA
    + ", degen_edges string, degen_points string, "
    "n_degen_edges int, n_degen_points int"
)


def _pts_text(points) -> str:
    """lat:lng list (S2TextFormat point-list grammar) for degenerate
    elements; edges are 'lat:lng, lat:lng' pairs joined by ';'."""
    import numpy as np

    from ..kernel import cellid as s2

    parts = []
    for p in points:
        la, ln = s2.xyz_to_latlng(p[0], p[1], p[2])
        parts.append(f"{float(np.degrees(la))!r}:{float(np.degrees(ln))!r}")
    return ", ".join(parts)


def boolean_pairs(
    shapes_a: DataFrame,
    shapes_b: DataFrame,
    op: str | list[str],
    max_cells: int = 8,
    mixed: bool = False,
    model: str = "closed",
) -> DataFrame:
    """(a_id, b_id, op, result_text, n_loops, n_vertices) for every
    covering-intersecting pair; result is the kernel boolean_op polygon
    (snap-rounding path included, so shared-vertex/edge pairs are fine)
    serialized as S2TextFormat. Runs the pair kernel on executors.

    ``op`` may be a list: all ops are computed in ONE pass over the
    candidate pairs (one mapInPandas stage total — Python stages carry a
    fixed scheduling cost, so multi-op callers should batch).

    ``mixed=True`` runs boolean_op_mixed under ``model`` ("closed"
    default, "open", or "semi_open" — S2BooleanOperation polygon models)
    instead and adds degenerate-output columns: ';'-joined degenerate
    edges and a point list (S2TextFormat lat:lng grammar) plus their
    counts — additive shells/points under CLOSED, subtractive
    cracks/punctures under OPEN — the distributed surface for
    tangent-geometry degeneracies."""
    from ..kernel import booleanop as bo

    ops = [op] if isinstance(op, str) else list(op)
    cand = candidate_pairs(shapes_a, shapes_b, max_cells=max_cells)
    ta = F.broadcast(
        shapes_a.select(F.col("shape_id").alias("a_id"), F.col("text").alias("a_text"))
    )
    tb = F.broadcast(
        shapes_b.select(F.col("shape_id").alias("b_id"), F.col("text").alias("b_text"))
    )
    pairs = cand.join(ta, "a_id").join(tb, "b_id")

    cols = ["a_id", "b_id", "op", "result", "n_loops", "n_vertices"]
    if mixed:
        cols += ["degen_edges", "degen_points", "n_degen_edges", "n_degen_points"]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in cols}
            for a_id, b_id, a_text, b_text in zip(
                pdf["a_id"], pdf["b_id"], pdf["a_text"], pdf["b_text"]
            ):
                pa, pb = _parse_polygon(a_text), _parse_polygon(b_text)
                for o in ops:
                    if mixed:
                        res, de, dp = bo.boolean_op_mixed(pa, pb, o, model=model)
                    else:
                        res = bo.boolean_op(pa, pb, o)
                    out["a_id"].append(a_id)
                    out["b_id"].append(b_id)
                    out["op"].append(o)
                    out["result"].append(res.to_text())
                    out["n_loops"].append(len(res.loops))
                    out["n_vertices"].append(
                        sum(len(lp.vertices) for lp in res.loops)
                    )
                    if mixed:
                        out["degen_edges"].append(
                            "; ".join(_pts_text(e) for e in de)
                        )
                        out["degen_points"].append(_pts_text(dp))
                        out["n_degen_edges"].append(len(de))
                        out["n_degen_points"].append(len(dp))
            yield pd.DataFrame(out)

    return pairs.mapInPandas(gen, _PAIR_MIXED_SCHEMA if mixed else _PAIR_SCHEMA)


def polygon_relations(shapes_a: DataFrame, shapes_b: DataFrame) -> DataFrame:
    """(a_id, b_id, contains, contained, intersects) region relations for
    every (A, B) pair — the distributed surface for
    Polygon.contains_polygon / intersects_polygon (S2Polygon.contains /
    intersects semantics, regularized).

    All-pairs form (B broadcast): right for relation GATES and small B
    sets. At scale, pre-prune with candidate_pairs — pairs with disjoint
    coverings are all-false and need no kernel call."""
    from ..kernel import region as rgk

    ta = shapes_a.select(
        F.col("shape_id").alias("a_id"), F.col("text").alias("a_text")
    )
    tb = F.broadcast(
        shapes_b.select(F.col("shape_id").alias("b_id"), F.col("text").alias("b_text"))
    )
    pairs = ta.crossJoin(tb)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("a_id", "b_id", "contains", "contained", "intersects")}
            for a_id, b_id, a_text, b_text in zip(
                pdf["a_id"], pdf["b_id"], pdf["a_text"], pdf["b_text"]
            ):
                pa, pb = _parse_polygon(a_text), _parse_polygon(b_text)
                out["a_id"].append(a_id)
                out["b_id"].append(b_id)
                out["contains"].append(pa.contains_polygon(pb))
                out["contained"].append(pb.contains_polygon(pa))
                out["intersects"].append(pa.intersects_polygon(pb))
            yield pd.DataFrame(out)

    return pairs.mapInPandas(
        gen,
        "a_id string, b_id string, contains boolean, "
        "contained boolean, intersects boolean",
    )
