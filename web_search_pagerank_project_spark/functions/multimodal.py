"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media lives as opaque ``binary`` columns plus typed metadata; all transforms
are Arrow-batched ``mapInPandas`` stages with real schemas/partitioning. The
actual codec work (JPEG decode, resampling, frame extraction) requires
libraries not present in this container, so the codec kernels are STUBBED:
each has a deterministic fake implementation (clearly marked) used by tests
to validate the Spark-side plumbing — batch shapes, schema, null handling —
and a ``NotImplementedError`` path when ``strict=True`` documents the real
integration point (swap ``_decode_image_stub`` for PIL/libvips, etc.).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake 'pixels' derived from payload bytes.
    Real implementation: PIL.Image.open(BytesIO(payload)) -> np.asarray.
    The fake keeps shape semantics (H, W, 3) so downstream plumbing is real."""
    h = (payload[0] % 8 + 1) if payload else 1
    w = (payload[1] % 8 + 1) if len(payload) > 1 else 1
    arr = np.frombuffer(
        (payload * ((h * w * 3) // max(len(payload), 1) + 1))[: h * w * 3],
        dtype=np.uint8,
    )
    return arr.reshape(h, w, 3)


def image_features(
    media: DataFrame, feature_dim: int = 8, strict: bool = False
) -> DataFrame:
    """media -> (media_id, width, height, features[feature_dim]).

    Feature extraction = channel-histogram moments of the decoded pixels
    (deterministic; swap the stub decoder for a real one in production).
    ``strict=True`` raises NotImplementedError to mark the codec boundary.
    """
    src = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if strict:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips; not in container"
                )
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = _decode_image_stub(bytes(payload or b""))
                h, w, _ = px.shape
                flat = px.astype(np.float64)
                feats = [
                    float(flat[..., c].mean()) for c in range(3)
                ] + [float(flat[..., c].std()) for c in range(3)]
                feats = (feats + [float(h), float(w)])[:feature_dim]
                feats += [0.0] * (feature_dim - len(feats))
                out.append((int(mid), w, h, feats))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "features"]
            )

    return src.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """video -> (media_id, frame_ts_ms) sampling grid; the frame *decode* is
    the stubbed codec step, but the sampling plan (explode over a sequence
    bounded by duration) is the real Spark-side logic."""
    vids = media.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    if strict:
        raise NotImplementedError("video frame decode requires ffmpeg bindings")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def audio_window_energy_stub(media: DataFrame, window_ms: int = 500) -> DataFrame:
    """audio -> (media_id, window_start_ms, energy): deterministic fake energy
    per window derived from payload bytes (real impl: PCM decode + RMS)."""
    src = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "duration_ms"
    )
    schema = "media_id long, window_start_ms long, energy double"

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                b = bytes(payload or b"\x00")
                for start in range(0, max(int(dur or 0), 1), window_ms):
                    seg = b[(start // window_ms) % len(b)]
                    out.append((int(mid), start, float(seg) / 255.0))
            yield pd.DataFrame(
                out, columns=["media_id", "window_start_ms", "energy"]
            )

    return src.mapInPandas(gen, schema=schema)


def synth_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic media fixture across all three kinds."""
    rows = []
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(rng.integers(0, 256, size=64, dtype=np.uint8))
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/jpeg", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(8, 64)) if kind == "image" else None,
                int(rng.integers(8, 64)) if kind == "image" else None,
                int(rng.integers(1000, 10000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
