"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata (training-data-pipeline surface).

The Spark-side plumbing — schemas, batch shapes, partitioning, the
mapInPandas signatures — is real and tested; the actual media DECODE step
is stubbed (this container ships no image/audio libraries): `decode_*`
raise NotImplementedError unless `fake=True`, which substitutes a
deterministic byte-derived stand-in so the downstream dataflow (feature
extraction, dedup by content hash, embedding bucketing) is exercised
end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("content", T.BinaryType()),    # opaque encoded bytes
    T.StructField("mime", T.StringType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("content_sha1", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),  # 64-d
])


def decode_image(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode an encoded image to HWC uint8. STUB: requires Pillow/opencv
    (absent here). fake=True → deterministic 8×8×3 array derived from the
    byte content, preserving the downstream array shape contract."""
    if not fake:
        raise NotImplementedError(
            "image decode needs Pillow/opencv — not in this container; "
            "pass fake=True for the deterministic stand-in")
    d = hashlib.sha256(content or b"").digest()
    return np.frombuffer((d * 6)[:192], dtype=np.uint8).reshape(8, 8, 3)


def decode_audio(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode audio to a float32 waveform. STUB (needs soundfile/ffmpeg)."""
    if not fake:
        raise NotImplementedError(
            "audio decode needs soundfile/ffmpeg — not in this container; "
            "pass fake=True for the deterministic stand-in")
    d = hashlib.sha256(content or b"").digest()
    return (np.frombuffer(d * 32, dtype=np.uint8)[:256].astype(np.float32)
            / 127.5 - 1.0)


def sample_video_frames(content: bytes, n_frames: int = 4,
                        fake: bool = False) -> list[np.ndarray]:
    """Uniform frame sampling. STUB (needs ffmpeg); fake=True yields
    n deterministic frames."""
    if not fake:
        raise NotImplementedError(
            "video decode needs ffmpeg — not in this container; "
            "pass fake=True for the deterministic stand-in")
    return [decode_image(content + bytes([i]), fake=True) for i in range(n_frames)]


def resize_image(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an HWC array. REAL (pure numpy index
    arithmetic), not a stub — only the decode step needs external libs."""
    h, w = arr.shape[:2]
    rows = np.arange(height) * h // height
    cols = np.arange(width) * w // width
    return arr[rows][:, cols]


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("pixels", T.BinaryType()),     # raw HWC uint8 bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])


def resize_images(media: DataFrame, width: int = 4, height: int = 4,
                  batch_partitions: int | None = None) -> DataFrame:
    """Image rows → decoded (stub) → nearest-neighbor resize → raw pixel
    bytes + updated meta, via mapInPandas. Non-image rows are dropped
    (filter pushed before the Python stage, so audio/video bytes never
    cross the Arrow boundary)."""
    df = media.filter(F.col("kind") == "image")
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"],
                                          pdf["meta"]):
                content = bytes(content) if content is not None else b""
                arr = resize_image(decode_image(content, fake=True),
                                   width, height)
                meta = dict(meta or {})
                meta.update({"w": str(width), "h": str(height),
                             "layout": "hwc-uint8"})
                rows.append({
                    "media_id": int(mid), "width": width, "height": height,
                    "pixels": arr.tobytes(), "meta": meta,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def _feature_of(kind: str, content: bytes) -> np.ndarray:
    """64-d feature from the (fake-)decoded media: byte-histogram features
    — the real pipeline would run a model here; the SHAPE and batch flow
    are what the engine tests."""
    if kind == "image":
        arr = decode_image(content, fake=True).ravel()
    elif kind == "audio":
        arr = ((decode_audio(content, fake=True) + 1.0) * 127.5).astype(np.uint8)
    elif kind == "video":
        arr = np.concatenate(
            [f.ravel() for f in sample_video_frames(content, fake=True)])
    else:
        # fail fast: a None/unknown kind silently featurized as video
        # would launder corrupt rows through dedup/embedding stages
        raise ValueError(f"unknown media kind: {kind!r}")
    hist, _ = np.histogram(arr, bins=64, range=(0, 256))
    total = hist.sum() or 1
    return (hist / total).astype(np.float32)


def extract_features(media: DataFrame, batch_partitions: int | None = None) -> DataFrame:
    """media → FEATURE_SCHEMA rows via mapInPandas (Arrow-batched; the
    decode+featurize loop is per-row like any media pipeline, the batching
    amortizes transfer). Repartition first when media files are few/large."""
    df = media
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(pdf["media_id"], pdf["kind"],
                                          pdf["content"]):
                content = bytes(content) if content is not None else b""
                rows.append({
                    "media_id": int(mid),
                    "kind": kind,
                    "n_bytes": len(content),
                    "content_sha1": hashlib.sha1(content).hexdigest(),
                    "feature": _feature_of(kind, content).tolist(),
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def exact_media_dedup(features: DataFrame) -> DataFrame:
    """Content-hash dedup over media (same shape as document exact dedup)."""
    return (
        features.groupBy("content_sha1")
        .agg(F.min("media_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )


def synthetic_media(spark, n_rows: int, partitions: int = 8) -> DataFrame:
    """Deterministic media table for tests/bench (content = seeded bytes;
    every 10th row duplicates an earlier one to exercise dedup)."""
    kinds = ("image", "audio", "video")

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                src = i - (i % 10) if i % 10 == 9 else i  # dup every 10th
                content = hashlib.sha256(f"media:{src}".encode()).digest() * 4
                kind = kinds[i % 3]
                rows.append({
                    "media_id": i, "kind": kind, "content": content,
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                    "meta": {"w": "8", "h": "8"} if kind == "image" else {},
                })
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(0, n_rows, numPartitions=partitions).mapInPandas(
        gen, schema=MEDIA_SCHEMA)
