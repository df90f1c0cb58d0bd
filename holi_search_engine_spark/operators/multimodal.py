"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_media`` raises ``NotImplementedError`` unless the
deterministic fake decoder is selected, which derives a stable feature
vector / frame sample from the bytes alone.  Everything around the stub —
schema, partitioning, UDF signatures, Arrow batch shapes — is real and
tested (tests/test_multimodal.py), so swapping in PIL/torchaudio later is
a one-function change.

Scale notes: media bytes never pass through a shuffle — feature extraction
is map-only over the scan, and only the (doc, features) projection (a few
hundred bytes/row instead of megabytes) flows into joins downstream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, media binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16
FRAME_COUNT = 4


def synth_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (binary payload = repeated md5
    stream of the id) for exercising the plumbing."""
    rows = []
    types = ["image", "audio", "video"]
    for i in range(n):
        mt = types[i % 3]
        seed = f"media-{i}".encode()
        payload = b"".join(
            hashlib.md5(seed + bytes([j])).digest() for j in range(8 + i % 5)
        )
        rows.append(
            (
                i,
                mt,
                bytearray(payload),
                64 + i % 32 if mt == "image" else None,
                48 + i % 32 if mt == "image" else None,
                1000 * (1 + i % 30) if mt != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, media_type: str, fake: bool = True) -> np.ndarray:
    """Decode a media payload into a sample array.

    ``fake=True`` (the only mode available in this container) derives a
    deterministic pseudo-signal from the bytes.  A real deployment replaces
    this body with PIL / soundfile / pyav decoding — the signature and the
    callers do not change.
    """
    if not fake:
        raise NotImplementedError(
            "real media decoding requires PIL/soundfile/pyav, not present "
            "in this environment — use fake=True (deterministic stand-in)"
        )
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return arr / 255.0


def _features_from_signal(sig: np.ndarray) -> np.ndarray:
    """Deterministic FEATURE_DIM-vector: banded means of the signal."""
    if len(sig) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    bands = np.array_split(sig, FEATURE_DIM)
    return np.array([float(b.mean()) if len(b) else 0.0 for b in bands], dtype=np.float32)


def extract_features(df: DataFrame) -> DataFrame:
    """media table → (media_id, media_type, features array<float>).

    Map-only mapInPandas; the binary column is dropped from the output so
    downstream plans never shuffle payload bytes.
    """
    schema = "media_id long, media_type string, features array<float>"

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [
                _features_from_signal(decode_media(bytes(p), t)).tolist()
                for p, t in zip(pdf["media"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": feats,
                }
            )

    return df.select("media_id", "media_type", "media").mapInPandas(kernel, schema=schema)


def sample_frames(df: DataFrame, n_frames: int = FRAME_COUNT) -> DataFrame:
    """video rows → one row per sampled frame (evenly spaced byte slices in
    the fake decoder; a real one samples decoded frames the same way)."""
    schema = "media_id long, frame_no int, frame binary"

    def kernel(batches):
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "video"]
            if not len(pdf):
                continue
            out = {"media_id": [], "frame_no": [], "frame": []}
            for mid, payload in zip(pdf["media_id"], pdf["media"]):
                raw = bytes(payload)
                step = max(1, len(raw) // n_frames)
                for fno in range(n_frames):
                    s = fno * step
                    out["media_id"].append(mid)
                    out["frame_no"].append(fno)
                    out["frame"].append(raw[s : s + step])
            yield pd.DataFrame(out)

    return df.select("media_id", "media_type", "media").mapInPandas(kernel, schema=schema)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes metadata through, marks payload transformed
    (real impl swaps the kernel body for PIL resize)."""
    schema = "media_id long, width int, height int, media binary"

    def kernel(batches):
        for pdf in batches:
            pdf = pdf[pdf["media_type"] == "image"]
            if not len(pdf):
                continue
            target = width * height
            resized = []
            for payload in pdf["media"]:
                sig = np.frombuffer(bytes(payload), dtype=np.uint8)
                idx = (np.arange(target) * max(1, len(sig)) // max(1, target)) % max(1, len(sig))
                resized.append(bytes(sig[idx].tobytes()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": width,
                    "height": height,
                    "media": resized,
                }
            )

    return df.select("media_id", "media_type", "media").mapInPandas(kernel, schema=schema)
