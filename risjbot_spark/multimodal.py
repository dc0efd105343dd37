"""Multimodal column handling: image/audio/video as opaque binary + typed
metadata (training-data-pipeline surface).

The Spark-side plumbing — schemas, batch shapes, partitioning, the
mapInPandas signatures — is real and tested. The media DECODE step sits
behind a PROBE SEAM (mirroring extract.nlp): when Pillow / soundfile /
ffmpeg are present, `decode_*` dispatch to them; in this container
(none installed) they raise NotImplementedError unless `fake=True`
substitutes a deterministic byte-derived stand-in, keeping the
downstream dataflow (feature extraction, dedup by content hash,
embedding bucketing) exercised end-to-end. The pipeline stages
(resize_images / extract_features) auto-select: real when available,
stand-in otherwise — and the decision is pinnable (driver-decided, like
the NLP backends) so a heterogeneous cluster fails loudly rather than
mixing real and fake features in one run.
"""

from __future__ import annotations

import hashlib
import shutil as _shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _try_pil():
    try:
        from PIL import Image

        Image.open  # probe the attr the seam uses
        return Image
    except Exception:
        return None


def _try_soundfile():
    try:
        import soundfile

        soundfile.read
        return soundfile
    except Exception:
        return None


_PIL_IMAGE = _try_pil()
_soundfile = _try_soundfile()
HAS_PIL = _PIL_IMAGE is not None
HAS_SOUNDFILE = _soundfile is not None
HAS_FFMPEG = _shutil.which("ffmpeg") is not None

_PINNED: dict[str, bool] | None = None


def backend_flags() -> dict[str, bool]:
    return {"image": HAS_PIL, "audio": HAS_SOUNDFILE, "video": HAS_FFMPEG}


def pin_backend(flags: dict[str, bool] | None) -> None:
    """Pin the decode dispatch (driver-decided; None → local probe)."""
    global _PINNED
    _PINNED = dict(flags) if flags is not None else None


class BackendMismatchError(RuntimeError):
    """Driver pinned a backend available that this worker lacks — a
    heterogeneous deployment. Deliberately NOT caught by the per-row
    poison-pill guards: misconfiguration must fail the stage, not
    silently null one worker's rows."""


def _use(name: str, local_has: bool) -> bool:
    from .seams import seam_use
    return seam_use(name, local_has, _PINNED, kind="media backend",
                    exc=BackendMismatchError)

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
    """Decode an encoded image to HWC uint8. Dispatches to Pillow when
    importable (RGB-converted np.asarray); fake=True forces the
    deterministic 8×8×3 byte-derived stand-in (tests/bench
    reproducibility); neither → NotImplementedError."""
    if fake:
        d = hashlib.sha256(content or b"").digest()
        return np.frombuffer((d * 6)[:192], dtype=np.uint8).reshape(8, 8, 3)
    if _use("image", HAS_PIL):
        import io

        img = _PIL_IMAGE.open(io.BytesIO(content)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    raise NotImplementedError(
        "image decode needs Pillow — not in this container; "
        "pass fake=True for the deterministic stand-in")


def decode_audio(content: bytes, fake: bool = False) -> np.ndarray:
    """Decode audio to a mono float32 waveform. Dispatches to soundfile
    when importable (channel-averaged to mono); fake=True forces the
    deterministic 256-sample stand-in."""
    if fake:
        d = hashlib.sha256(content or b"").digest()
        return (np.frombuffer(d * 32, dtype=np.uint8)[:256]
                .astype(np.float32) / 127.5 - 1.0)
    if _use("audio", HAS_SOUNDFILE):
        import io

        data, _sr = _soundfile.read(io.BytesIO(content), dtype="float32")
        arr = np.asarray(data, dtype=np.float32)
        if arr.ndim > 1:
            arr = arr.mean(axis=1)
        return arr.astype(np.float32)
    raise NotImplementedError(
        "audio decode needs soundfile — not in this container; "
        "pass fake=True for the deterministic stand-in")


def _run_ffmpeg(args: list[str], stdin_bytes: bytes | None = None) -> bytes:
    """ffmpeg subprocess runner — module-level so tests can monkeypatch
    it (the binary probe can't be faked via sys.path)."""
    import subprocess

    return subprocess.run(["ffmpeg", "-v", "error", *args],
                          input=stdin_bytes, capture_output=True,
                          check=True).stdout


def sample_video_frames(content: bytes, n_frames: int = 4,
                        fake: bool = False) -> list[np.ndarray]:
    """Frame sampling to 8×8×3 uint8 frames. Dispatches to the ffmpeg
    binary when on PATH (first n_frames decoded at scale=8:8 rawvideo
    rgb24; a production sampler would add a select/fps filter for
    uniform temporal spread); fake=True forces n deterministic frames."""
    if fake:
        return [decode_image(content + bytes([i]), fake=True)
                for i in range(n_frames)]
    if _use("video", HAS_FFMPEG):
        import os
        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".bin",
                                         delete=False) as f:
            f.write(content or b"")
            path = f.name
        try:
            raw = _run_ffmpeg(["-i", path, "-vf", "scale=8:8",
                               "-frames:v", str(n_frames), "-f", "rawvideo",
                               "-pix_fmt", "rgb24", "-"])
        finally:
            os.unlink(path)
        return [np.frombuffer(raw[i * 192:(i + 1) * 192], dtype=np.uint8)
                .reshape(8, 8, 3).copy()
                for i in range(len(raw) // 192)]
    raise NotImplementedError(
        "video decode needs ffmpeg — not in this container; "
        "pass fake=True for the deterministic stand-in")


def use_fake_decode() -> dict[str, bool]:
    """Per-kind fake/real decision for the pipeline stages: fake
    wherever the (possibly pinned) backend is unavailable."""
    return {"image": not _use("image", HAS_PIL),
            "audio": not _use("audio", HAS_SOUNDFILE),
            "video": not _use("video", HAS_FFMPEG)}


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
    """Image rows → decoded (probe-seam dispatch: Pillow when available,
    deterministic stand-in otherwise) → nearest-neighbor resize → raw
    pixel bytes + updated meta, via mapInPandas. Non-image rows are
    dropped (filter pushed before the Python stage, so audio/video bytes
    never cross the Arrow boundary). The fake/real decision is made on
    the DRIVER and rides the closure: a worker missing a
    driver-available codec fails loudly instead of silently producing
    stand-in pixels."""
    fake = use_fake_decode()["image"]
    df = media.filter(F.col("kind") == "image")
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, content, meta in zip(pdf["media_id"], pdf["content"],
                                          pdf["meta"]):
                content = bytes(content) if content is not None else b""
                meta = dict(meta or {})
                meta.update({"w": str(width), "h": str(height),
                             "layout": "hwc-uint8"})
                pixels, err = resize_row(content, fake, width, height)
                if err is not None:
                    meta["decode_error"] = err
                rows.append({
                    "media_id": int(mid), "width": width, "height": height,
                    "pixels": pixels, "meta": meta,
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def resize_row(content: bytes, fake: bool, width: int,
               height: int) -> tuple[bytes | None, str | None]:
    """One row of resize_images: (pixel bytes, error class name).
    Poison-pill guard on the REAL decode path: one corrupt/truncated
    blob must not fail the whole stage (Spark retries the task 4x then
    aborts the job) — the row survives with null pixels + the error
    class for meta; the fake path never raises. NotImplementedError
    (missing backend = misconfiguration) stays loud."""
    try:
        arr = resize_image(decode_image(content, fake=fake), width, height)
        return arr.tobytes(), None
    except (NotImplementedError, BackendMismatchError):
        raise
    except Exception as e:
        return None, type(e).__name__


def _feature_of(kind: str, content: bytes,
                fake_map: dict[str, bool] | None = None) -> np.ndarray:
    """64-d feature from the decoded media: byte-histogram features —
    the real pipeline would run a model here; the SHAPE and batch flow
    are what the engine tests. fake_map carries the driver's per-kind
    fake/real decision (default: this process's probe)."""
    fake_map = fake_map if fake_map is not None else use_fake_decode()
    if kind == "image":
        arr = decode_image(content, fake=fake_map["image"]).ravel()
    elif kind == "audio":
        wave = decode_audio(content, fake=fake_map["audio"])
        arr = (np.clip((wave + 1.0) * 127.5, 0, 255)).astype(np.uint8)
    elif kind == "video":
        frames = sample_video_frames(content, fake=fake_map["video"])
        arr = (np.concatenate([f.ravel() for f in frames]) if frames
               else np.zeros(1, dtype=np.uint8))
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
    amortizes transfer). Repartition first when media files are few/large.
    Decode dispatch is driver-decided (see resize_images)."""
    fake_map = use_fake_decode()
    df = media
    if batch_partitions:
        df = df.repartition(batch_partitions)

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, content in zip(pdf["media_id"], pdf["kind"],
                                          pdf["content"]):
                content = bytes(content) if content is not None else b""
                feature = feature_row(kind, content, fake_map)
                rows.append({
                    "media_id": int(mid),
                    "kind": kind,
                    "n_bytes": len(content),
                    "content_sha1": hashlib.sha1(content).hexdigest(),
                    "feature": feature,
                })
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def feature_row(kind: str, content: bytes,
                fake_map: dict[str, bool]) -> list | None:
    """One row of extract_features: feature list, or None for a corrupt
    blob on the real decode path (hash/bytes are still emitted — exact
    dedup sees the row; see resize_row's poison-pill rationale).
    Unknown kind (schema bug) and NotImplementedError (missing backend)
    stay loud."""
    if kind not in ("image", "audio", "video"):
        raise ValueError(f"unknown media kind: {kind!r}")
    try:
        return _feature_of(kind, content, fake_map).tolist()
    except (NotImplementedError, BackendMismatchError):
        raise
    except Exception:
        return None


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
