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


# ---------------------------------------------------------------------------
# Resize and frame-sample plumbing. Same contract as extract_features: the
# Spark-side shape (schemas, Arrow streaming, deterministic output sizing)
# is real; the pixel work is pluggable and stubbed by default.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_no", IntegerType()),
        StructField("t_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def stub_resizer(payload: bytes, w: int, h: int, out_w: int, out_h: int) -> bytes:
    raise NotImplementedError(
        "image resize requires an image library not present in this "
        "environment; pass resizer=deterministic_fake_resizer or a real one"
    )


def deterministic_fake_resizer(
    payload: bytes, w: int, h: int, out_w: int, out_h: int
) -> bytes:
    """Length-scaled deterministic bytes (tests only): output size tracks
    the pixel-count ratio, content is an md5 chain of the input."""
    import hashlib

    n_out = max(1, int(len(payload) * (out_w * out_h) / max(w * h, 1)))
    out = bytearray()
    seed = payload or b"\x00"
    while len(out) < n_out:
        seed = hashlib.md5(seed).digest()
        out.extend(seed)
    return bytes(out[:n_out])


def resize_media(
    media: DataFrame,
    out_w: int,
    out_h: int,
    resizer: Callable[[bytes, int, int, int, int], bytes] = stub_resizer,
) -> DataFrame:
    """mapInPandas image resize: payload -> payload at (out_w, out_h).

    Streaming Arrow batches, one output row per input row; the 100-TB
    sizing concern is identical to extract_features (payload bytes per
    batch, not rows, bound worker memory)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                resizer(p if p is not None else b"", int(w), int(h), out_w, out_h)
                for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "payload": out,
                    "width": np.full(len(pdf), out_w, dtype=np.int32),
                    "height": np.full(len(pdf), out_h, dtype=np.int32),
                }
            )

    return media.mapInPandas(run, RESIZED_SCHEMA)


def stub_frame_extractor(payload: bytes, t_ms: int) -> bytes:
    raise NotImplementedError(
        "video frame extraction requires a codec library not present in "
        "this environment; pass extractor=deterministic_fake_frame_extractor"
    )


def deterministic_fake_frame_extractor(payload: bytes, t_ms: int) -> bytes:
    import hashlib

    return hashlib.md5((payload or b"\x00") + t_ms.to_bytes(8, "big")).digest()


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 32,
    extractor: Callable[[bytes, int], bytes] = stub_frame_extractor,
) -> DataFrame:
    """mapInPandas frame sampling: one output row per sampled timestamp of
    each video (duration_ms // every_ms frames, capped at max_frames).

    The fan-out happens INSIDE the Python worker (no explode of binary
    payloads through a shuffle): each Arrow batch of videos yields its
    frames directly, so a payload crosses the JVM<->Python boundary once
    regardless of how many frames it yields."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, nos, ts, outs = [], [], [], []
            for ref, p, dur in zip(
                pdf["media_ref"], pdf["payload"], pdf["duration_ms"]
            ):
                payload = p if p is not None else b""
                n = min(max(int(dur) // every_ms, 0), max_frames)
                for k in range(n):
                    refs.append(ref)
                    nos.append(k)
                    ts.append(k * every_ms)
                    outs.append(extractor(payload, k * every_ms))
            yield pd.DataFrame(
                {
                    "media_ref": refs,
                    "frame_no": np.asarray(nos, dtype=np.int32),
                    "t_ms": np.asarray(ts, dtype=np.int32),
                    "payload": outs,
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
