"""Interleaved text+media document table (the engine's subject table).

Per BASELINE.json input_hint the engine's primary input is an Iceberg-shaped
table ``(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
of interleaved text and media spans, where media spans carry geotagged
points. The sandbox testdata has no such table, so this module derives one
*deterministically* from the driver's ``documents`` parquet using only
Column expressions (no UDF, no randomness): every value is a pure function
of ``doc_id``, so any scale factor produces the same docs for the same ids.

Geo side-channel: a media span's point comes from sources/geo.py applied to
``geo_key = doc_id * 31 + span_offset`` — integer-exact, so DuckDB oracles
can re-derive it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from . import geo

SPAN_SCHEMA = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def with_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id,text,...) -> (doc_id string, spans array<struct<...>>).

    Span count = 4 + doc_id % 5; every third span is an image, the rest are
    text slices of the source document; offsets are strictly increasing.
    """
    n_spans = (F.lit(4) + F.col("doc_id") % 5).cast("int")
    mk_span = lambda i: F.struct(  # noqa: E731
        F.when(i % 3 == F.lit(2), F.lit("image")).otherwise(F.lit("text")).alias("kind"),
        F.when(i % 3 == F.lit(2), F.lit(""))
        .otherwise(F.substring(F.col("text"), i * 40 + 1, 40))
        .alias("text"),
        F.when(
            i % 3 == F.lit(2),
            F.concat(F.lit("m"), F.col("doc_id").cast("string"), F.lit("_"), i.cast("string")),
        )
        .otherwise(F.lit(""))
        .alias("media_ref"),
        i.cast("int").alias("offset"),
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(F.sequence(F.lit(0), n_spans - 1), mk_span).alias("spans"),
    )


def exploded_spans(docs: DataFrame) -> DataFrame:
    """One row per span, offset order carried explicitly (never rely on
    implicit row order through shuffles — SURVEY.md §7 invariant 6)."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("span_idx", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def geo_key_col() -> Column:
    """Integer geo key of a media span: doc_id * 31 + offset."""
    return F.col("doc_id").cast("long") * 31 + F.col("offset")


def geotagged_media_spans(docs: DataFrame) -> DataFrame:
    """Media spans with their deterministic lat/lng attached."""
    spans = exploded_spans(docs).where(F.col("kind") == "image")
    k = geo_key_col()
    return spans.select(
        "doc_id",
        "media_ref",
        "offset",
        geo.lat_col(k).alias("lat"),
        geo.lng_col(k).alias("lng"),
    )


def span_sequence_fingerprint(docs_or_spans: DataFrame) -> DataFrame:
    """Per-doc order-canonical fingerprint of the span sequence; equality of
    this before/after a pipeline stage is the span-sequence invariant."""
    if "spans" in docs_or_spans.columns:
        spans = exploded_spans(docs_or_spans)
    else:
        spans = docs_or_spans
    seq = F.sort_array(
        F.collect_list(F.struct("offset", "kind", "text", "media_ref"))
    )
    return spans.groupBy("doc_id").agg(
        F.md5(F.to_json(seq)).alias("span_seq_md5"),
        F.count("*").alias("n_spans"),
    )
