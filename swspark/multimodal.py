"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real and tested — schema, partitioning,
Arrow batch shapes, mapInPandas feature extraction — while the actual
codec step is stubbed (no image/audio libraries in this container):

- ``decode_media(df, fake=False)``: with ``fake=False`` raises
  NotImplementedError *per batch* exactly where a real decoder
  (PIL/ffmpeg) would plug in; with ``fake=True`` it derives a
  deterministic pseudo-decode from the bytes (content hash -> pixel
  stats), so every downstream stage is exercised end-to-end.
- ``extract_features``: mapInPandas producing fixed-width feature
  vectors — the shape a CLIP/ViT embedder would emit.
- ``resize_meta`` / ``frame_sample_plan``: pure-column ops on the
  metadata (target sizes, frame offsets) that run before any decode,
  so filter/pushdown happens on cheap columns, never on the blobs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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
        StructField("bytes", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("mime", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("mean_intensity", FloatType()),
        StructField("content_hash", StringType()),
    ]
)

FEATURE_DIM = 16

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads from a seeded
    stream) matching MEDIA_SCHEMA."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        size = int(rng.integers(256, 4096))
        payload = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                payload,
                int(rng.integers(16, 1024)) if kind != "audio" else None,
                int(rng.integers(16, 1024)) if kind != "audio" else None,
                int(rng.integers(100, 60000)) if kind != "image" else None,
                {"image": "image/png", "audio": "audio/ogg",
                 "video": "video/mp4"}[kind],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """mapInPandas decode stage. Real decoders are NOT available in
    this environment — ``fake=False`` raises NotImplementedError at
    the exact plug-in point; ``fake=True`` derives deterministic
    pseudo-stats so the distributed plumbing is fully testable."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires PIL/ffmpeg — unavailable in "
                    "this container; pass fake=True for the deterministic stub"
                )
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["bytes"].map(len).astype("int32"),
                "mean_intensity": pdf["bytes"]
                .map(lambda b: float(np.frombuffer(b, dtype=np.uint8).mean()))
                .astype("float32"),
                "content_hash": pdf["bytes"].map(
                    lambda b: hashlib.sha1(b).hexdigest()
                ),
            }
            yield pd.DataFrame(out)

    return df.mapInPandas(run, DECODED_SCHEMA)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction (the embedder slot). The fake path projects
    the byte histogram onto FEATURE_DIM deterministic directions —
    stable across partitionings, so tests can assert exact values."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = np.random.default_rng(7).standard_normal((256, FEATURE_DIM))
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real embedder unavailable offline")
            feats = []
            for b in pdf["bytes"]:
                hist = np.bincount(
                    np.frombuffer(b, dtype=np.uint8), minlength=256
                ).astype(float)
                hist /= hist.sum() or 1.0
                feats.append((hist @ proj).astype(np.float32).tolist())
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_meta(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Pure-column resize plan: compute target dims without touching
    the blobs (pushdown-friendly — the blob column is not read)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side)
        / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return df.select(
        "media_id",
        "kind",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    ).where(F.col("kind") != "audio")


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame offsets to sample per video — computed from metadata
    only; the decode stage consumes (media_id, offset) pairs."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms") - 1, F.lit(every_ms)
                )
            ).alias("frame_offset_ms"),
        )
    )
