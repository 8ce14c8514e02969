"""spark-submit entrypoint for the flagship pipeline.

Cluster usage (per the north rule):

    cd /root/repo && zip -r /tmp/s2spark.zip s2_geometry_library_java_spark
    spark-submit --py-files /tmp/s2spark.zip \\
        s2_geometry_library_java_spark/pipeline/submit_job.py \\
        --sf-dir /root/testdata/sf0.01 --out /tmp/s2_pipeline_out

Stages (each checkpointed + lineage-tracked; re-running resumes):
  1. spans      — interleaved doc table -> exploded geotagged media spans
  2. tiled      — level-12 tile assignment (Arrow kernel + bit algebra)
  3. pip        — covering-broadcast PIP join against the query polygons
  4. rollup     — per-(tile, polygon) counts + distinct docs
Also asserts the span-sequence invariant between stage 1 and the source.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def fingerprint(*parts: str) -> str:
    return hashlib.md5("|".join(parts).encode()).hexdigest()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", required=True)
    ap.add_argument("--tile-level", type=int, default=12)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("s2spark-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from s2_geometry_library_java_spark import queries as q
    from s2_geometry_library_java_spark.operators import pip, tiling
    from s2_geometry_library_java_spark.pipeline.runner import CheckpointedPipeline
    from s2_geometry_library_java_spark.sources import docs as docsrc
    from s2_geometry_library_java_spark.sources import tables

    pl = CheckpointedPipeline(spark, args.out)
    src_fp = fingerprint("v1", args.sf_dir)

    documents = tables.load_table(spark, args.sf_dir, "documents")
    docs = docsrc.with_spans(documents)

    n_docs_in = documents.count()
    spans = pl.stage(
        "spans",
        lambda: docsrc.geotagged_media_spans(docs),
        src_fp,
        rows_in=n_docs_in,
    )

    # span-sequence invariant: the exploded spans regrouped by doc must
    # fingerprint identically to the source table's span arrays.
    src_fps = docsrc.span_sequence_fingerprint(docs)
    post = docsrc.span_sequence_fingerprint(docsrc.exploded_spans(docs))
    bad = (
        src_fps.alias("a")
        .join(post.alias("b"), "doc_id")
        .where(F.col("a.span_seq_md5") != F.col("b.span_seq_md5"))
        .count()
    )
    if bad:
        raise AssertionError(f"span-sequence invariant violated for {bad} docs")

    n_spans_in = spans.count()
    tiled = pl.stage(
        "tiled",
        lambda: tiling.tile_points(spans, level=args.tile_level),
        fingerprint(src_fp, f"level={args.tile_level}"),
        rows_in=n_spans_in,
        cells_col="tile",
    )
    hits = pl.stage(
        "pip",
        lambda: pip.pip_join(
            spark,
            tiled.select(
                F.concat_ws("_", "doc_id", "offset").alias("span_key"), "lat", "lng"
            ),
            q.pip_polygons(),
            point_id="span_key",
        ).withColumnRenamed("point_id", "span_key"),
        fingerprint(src_fp, f"level={args.tile_level}", "polygons=v1"),
        rows_in=n_spans_in,
    )
    rollup = pl.stage(
        "rollup",
        lambda: (
            tiled.withColumn("span_key", F.concat_ws("_", "doc_id", "offset"))
            .join(hits, "span_key", "left")
            .groupBy("tile", "polygon_id")
            .agg(
                F.count("*").alias("n_spans"),
                F.count_distinct("doc_id").alias("n_docs"),
            )
        ),
        fingerprint(src_fp, f"level={args.tile_level}", "polygons=v1", "rollup"),
        rows_in=n_spans_in,
        cells_col="tile",
    )
    print(f"rollup rows: {rollup.count()}")
    pl.metrics().show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
