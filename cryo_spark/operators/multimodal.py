"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery (schemas, batch iteration, partition-aware
mapInPandas, output schema contracts) is real and tested; the actual
media decode is STUBBED — the decode libraries (PIL/ffmpeg/librosa)
are not in this container. ``decoder`` defaults to a deterministic
fake so the pipeline shape is exercised end-to-end; swap in a real
decoder at deployment.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
    ]
)


def fake_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a media feature extractor: derive a
    unit vector from the payload hash. Replace with a real decoder
    (NotImplementedError guards the real path)."""
    if payload is None:
        return None
    h = hashlib.sha256(payload).digest()
    v = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    v = v.astype(np.float64)
    v = v / np.linalg.norm(v)
    return v.astype(np.float32)


def real_decode(payload: bytes, dim: int = 16) -> np.ndarray:
    """Real image feature extraction when PIL is importable: decode,
    grayscale, downsample to a sqrt(dim) grid, L2-normalized mean
    luminance — a deterministic classical feature proving the decode
    path end-to-end (swap in a learned encoder at deployment). Where
    PIL is absent (this container) it raises NotImplementedError and
    the pipeline runs on :func:`fake_decode`; the skipif-guarded test
    covers the real path wherever the dependency exists."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "media decode requires PIL — not available in this container; "
            "use fake_decode for pipeline testing"
        ) from exc
    import io

    if payload is None:
        return None
    img = Image.open(io.BytesIO(payload)).convert("L")
    side = max(int(dim ** 0.5), 1)
    v = np.asarray(
        img.resize((side, side)), dtype=np.float64
    ).reshape(-1)[:dim]
    if v.size < dim:
        v = np.pad(v, (0, dim - v.size))
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], np.ndarray] = fake_decode,
    batch_hint: int = 1024,
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows
    out. Partitioning is preserved (narrow op) — repartition upstream
    by size if payload skew matters."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                None if p is None else decoder(bytes(p)).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "n_bytes": [None if p is None else len(p) for p in pdf["payload"]],
                    "content_sha256": [
                        None if p is None else hashlib.sha256(bytes(p)).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for an image resize: payload-hash-seeded
    bytes sized to the target (capped so tests stay small). Swap for a
    real PIL resize at deployment."""
    if payload is None:
        return None
    size = min(width * height * 3, 4096)
    h = hashlib.sha256(payload + f"{width}x{height}".encode()).digest()
    return (h * (size // len(h) + 1))[:size]


def real_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real PIL resize -> PNG bytes when the dependency exists;
    NotImplementedError otherwise (see :func:`real_decode`)."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "image resize requires PIL — not available in this container; "
            "use fake_resize for pipeline testing"
        ) from exc
    import io

    if payload is None:
        return None
    img = Image.open(io.BytesIO(payload)).resize((width, height))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], bytes] = fake_resize,
) -> DataFrame:
    """Resize every image row to (width, height); non-image rows pass
    through untouched. Narrow mapInPandas — partitioning preserved, no
    shuffle; at scale repartition upstream by payload size if a few
    giant images skew task times."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            is_img = pdf["kind"] == "image"
            pdf = pdf.copy()
            pdf.loc[is_img, "payload"] = [
                None if p is None else resizer(bytes(p), width, height)
                for p in pdf.loc[is_img, "payload"]
            ]
            pdf.loc[is_img, "width"] = width
            pdf.loc[is_img, "height"] = height
            yield pdf

    return media.mapInPandas(run, MEDIA_SCHEMA)


def fake_frame(payload: bytes, index: int) -> bytes:
    """Deterministic stand-in for a video frame grab."""
    if payload is None:
        return None
    return hashlib.sha256(payload + index.to_bytes(4, "big")).digest()


def sample_frames(
    media: DataFrame,
    interval_ms: int = 1000,
    max_frames: int = 32,
    sampler: Callable[[bytes, int], bytes] = fake_frame,
) -> DataFrame:
    """Sample frames from video rows every ``interval_ms``, capped at
    ``max_frames`` per video: one input row fans out to N frame rows
    (mapInPandas — the row-multiplying shape a real ffmpeg sampler
    needs). Non-video rows contribute nothing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_index": [], "ts_ms": [], "frame": []}
            for _, row in pdf[pdf["kind"] == "video"].iterrows():
                dur = row["duration_ms"]
                if dur is None or pd.isna(dur):
                    continue
                n = min(int(dur) // interval_ms + 1, max_frames)
                payload = None if row["payload"] is None else bytes(row["payload"])
                for i in range(n):
                    out["media_id"].append(row["media_id"])
                    out["frame_index"].append(i)
                    out["ts_ms"].append(i * interval_ms)
                    out["frame"].append(sampler(payload, i))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table for pipeline tests."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 4096)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 4096)) if kind != "audio" else None,
                int(rng.integers(16, 4096)) if kind != "audio" else None,
                int(rng.integers(1000, 600000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
