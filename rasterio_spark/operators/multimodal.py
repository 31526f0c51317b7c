"""Multimodal columns: image/audio/video as opaque binary + typed
metadata.

The container ships no image/audio codecs, so the DECODE step is a
clearly-marked stub (deterministic fake features / NotImplementedError)
— but the Spark-side plumbing is real and tested: binary schemas,
mapInPandas batch shape, Arrow transport of bytes, partition-friendly
output schemas.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODERS_AVAILABLE = False  # no PIL/cv2/librosa in this environment


def html_stats(pages: DataFrame) -> DataFrame:
    """Metadata over the binary html column — pure built-ins:
    (url, html_bytes, has_body, text_bytes)."""
    return pages.select(
        "url",
        F.octet_length("html").alias("html_bytes"),
        F.expr("contains(CAST(html AS STRING), '<body>')").alias("has_body"),
        F.octet_length(F.encode(F.col("text"), "UTF-8")).alias("text_bytes"),
    )


def html_stats_sql() -> str:
    return """
        SELECT url,
               octet_length(html) AS html_bytes,
               contains(CAST(html AS VARCHAR), '<body>') AS has_body,
               octet_length(encode(text)) AS text_bytes
        FROM pages
    """


def extract_image_features(
    binaries: DataFrame, binary_col: str = "content", id_col: str = "url", dim: int = 8
) -> DataFrame:
    """Batch feature extraction over opaque binary blobs.

    Real pipeline shape: mapInPandas over Arrow batches of bytes ->
    fixed-size float vector per blob. The decode itself is STUBBED with
    a deterministic fake (sha256-seeded vector) because no image codec
    ships in this container; swap ``_fake_decode`` for a real decoder
    (PIL/turbojpeg) without touching the plan.
    """

    def _fake_decode(blob: bytes) -> np.ndarray:
        h = hashlib.sha256(blob or b"").digest()
        return np.frombuffer(h[: dim * 4], dtype="<u4").astype("float64") / 2**32

    schema = f"{id_col} string, feat array<double>, n_bytes long"

    def extract(batches):
        for pdf in batches:
            feats = [
                _fake_decode(b if isinstance(b, (bytes, bytearray)) else bytes(b or b""))
                for b in pdf[binary_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feat": [f.tolist() for f in feats],
                    "n_bytes": [len(b or b"") for b in pdf[binary_col]],
                }
            )

    return binaries.mapInPandas(extract, schema=schema)


def decode_image(blob: bytes):
    """Real image decode — unavailable in this container."""
    raise NotImplementedError(
        "image codecs are not installed in this environment; "
        "extract_image_features uses the deterministic stub instead"
    )


def frame_sample(
    videos: DataFrame, every_n: int = 10, binary_col: str = "content", id_col: str = "url"
) -> DataFrame:
    """Frame-sampling plumbing: emits (id, frame_idx, frame_feat) rows
    per blob — frame count is derived deterministically from blob size
    (stub for a real container parser)."""

    def sample(batches):
        for pdf in batches:
            blobs = [bytes(b) if b is not None else b"" for b in pdf[binary_col]]
            sampled = [
                np.arange(0, max(1, len(b) // 1024), every_n, dtype=np.int32)
                for b in blobs
            ]
            reps = np.array([len(s) for s in sampled], dtype=np.int64)
            out_id = np.repeat(pdf[id_col].to_numpy(), reps)
            out_idx = (
                np.concatenate(sampled) if len(sampled) else np.array([], dtype=np.int32)
            )
            # the per-frame sha256 below IS the stubbed decode step (a
            # real frame decoder is per-frame work too); the row
            # assembly around it is vectorized (repeat/concatenate)
            out_feat = [
                (
                    np.frombuffer(
                        hashlib.sha256(b + int(i).to_bytes(4, "little")).digest()[:16],
                        dtype="<u4",
                    ).astype("float64")
                    / 2**32
                ).tolist()
                for b, s in zip(blobs, sampled)
                for i in s
            ]
            yield pd.DataFrame({id_col: out_id, "frame_idx": out_idx, "frame_feat": out_feat})

    return videos.mapInPandas(sample, schema=f"{id_col} string, frame_idx int, frame_feat array<double>")
