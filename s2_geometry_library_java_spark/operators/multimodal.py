"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, Arrow batch shape, mapInPandas signature,
partition sizing) is real and tested; the actual codec step is STUBBED
behind ``decoder=`` because the sandbox has no image/audio libraries —
plug in a real decode (PIL/ffmpeg) by passing one, or use
``deterministic_fake_decoder`` for tests. Calling the default raises
NotImplementedError, loudly, per unit.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

#: Canonical media-asset schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("n_bytes", IntegerType()),
    ]
)


def stub_decoder(payload: bytes, kind: str) -> np.ndarray:
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; pass decoder=deterministic_fake_decoder or a real one"
    )


def deterministic_fake_decoder(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic 16-dim 'feature' from payload bytes (tests only)."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        return np.zeros(16, dtype=np.float32)
    chunks = np.array_split(arr.astype(np.float64), 16)
    return np.array([c.mean() if len(c) else 0.0 for c in chunks], dtype=np.float32)


def synthesize_media_assets(spans: DataFrame) -> DataFrame:
    """Opaque binary payloads for media spans (deterministic: payload =
    md5-chain bytes of the media_ref) — stands in for object-store fetch."""
    payload = F.unhex(
        F.concat(F.md5(F.col("media_ref")), F.md5(F.concat(F.lit("2:"), F.col("media_ref"))))
    )
    return spans.where(F.col("media_ref") != "").select(
        "media_ref",
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit(32).cast("int").alias("width"),
        F.lit(32).cast("int").alias("height"),
        F.lit(0).cast("int").alias("duration_ms"),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = stub_decoder,
    batch_rows: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow batches stream through the Python worker without materializing
    the whole partition (payloads can be MBs each); at 100 TB this pairs
    with maxPartitionBytes sizing so a batch of payloads fits in worker
    memory.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decoder(p if p is not None else b"", k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
