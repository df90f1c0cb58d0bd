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


# --------------------------------------------------------------- queries
# Driver-contract entries: the same decode→feature / frame-sample plumbing
# run over the driver's ``documents`` table with ``text`` as the opaque
# payload (code points = the byte stream), so the kernels are verifiable
# against a DuckDB oracle — the only part a real deployment swaps is the
# decoder body, not the Spark plumbing.

QUERIES: dict = {}
ORACLE: dict[str, str] = {}

N_BANDS = FEATURE_DIM


def media_doc_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, feature): banded code-point means of the payload —
    the feature-extraction kernel shape, vectorized via one utf-32 decode
    + ``np.add.reduceat`` per Arrow batch (no per-row Python)."""
    from .common import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    schema = "doc_id long, band int, feature double"

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            texts = pdf["text"].fillna("")
            lens = texts.str.len().to_numpy(np.int64)
            keep = lens > 0
            if not keep.any():
                continue
            texts, lens = texts[keep], lens[keep]
            ids = pdf["doc_id"].to_numpy()[keep]
            cps = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
            offs = np.concatenate(([0], np.cumsum(lens)))
            # band k of a doc covers 0-based positions [ceil(kL/B), ceil((k+1)L/B))
            k = np.arange(N_BANDS + 1, dtype=np.int64)
            starts = offs[:-1, None] + (k[None, :] * lens[:, None] + N_BANDS - 1) // N_BANDS
            counts = np.diff(starts, axis=1)
            flat = starts[:, :-1].reshape(-1)
            sums = np.add.reduceat(cps.astype(np.float64), np.minimum(flat, len(cps) - 1))
            mask = counts.reshape(-1) > 0
            feats = np.zeros(len(flat))
            feats[mask] = (sums[mask] / counts.reshape(-1)[mask]) / 255.0
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(ids, N_BANDS)[mask],
                    "band": np.tile(np.arange(N_BANDS, dtype=np.int32), len(ids))[mask],
                    "feature": np.round(feats[mask], 6),
                }
            )

    return docs.mapInPandas(kernel, schema=schema)


QUERIES["media_doc_features"] = media_doc_features
ORACLE["media_doc_features"] = f"""
    WITH pos AS (
      SELECT doc_id, ((r.i - 1) * {N_BANDS}) // len(text) AS band,
             ord(substr(text, r.i::INT, 1)) AS cp
      FROM documents, unnest(range(1, len(text) + 1)) AS r(i)
    )
    SELECT doc_id, band::INT AS band, round(avg(cp) / 255.0, 6) AS feature
    FROM pos GROUP BY doc_id, band
"""


def media_doc_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, frame_no, frame): evenly spaced payload slices — the
    frame-sampling plan shape over the documents payload, fully in
    Catalyst (``substr`` with column args + ``encode``/``hex``) since
    slicing IS expressible JVM-side; the binary-payload mapInPandas
    kernel this mirrors is :func:`sample_frames` (pytest-covered).
    Frames are surfaced as hex strings — binary output columns crash
    the correctness driver's canonicalizer."""
    from .common import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    step = F.greatest(F.floor(F.length("text") / FRAME_COUNT), F.lit(1)).cast("int")
    return (
        docs.select("doc_id", "text", step.alias("step"))
        .select(
            "doc_id",
            "text",
            "step",
            F.explode(F.sequence(F.lit(0), F.lit(FRAME_COUNT - 1))).alias("frame_no"),
        )
        .select(
            "doc_id",
            "frame_no",
            F.hex(
                F.encode(
                    F.col("text").substr(
                        F.col("frame_no") * F.col("step") + F.lit(1), F.col("step")
                    ),
                    "UTF-8",
                )
            ).alias("frame"),
        )
    )


QUERIES["media_doc_frames"] = media_doc_frames
ORACLE["media_doc_frames"] = f"""
    SELECT doc_id, r.f::INT AS frame_no,
           hex(encode(substr(text, (r.f * step + 1)::INT, step::INT))) AS frame
    FROM (SELECT doc_id, text, greatest(len(text) // {FRAME_COUNT}, 1) AS step
          FROM documents),
         unnest(range(0, {FRAME_COUNT})) AS r(f)
"""


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
