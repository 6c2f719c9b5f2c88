"""Multimodal column plumbing: images/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` kernels.

The container has no image/audio codecs, so the *decode* step is stubbed
two ways (clearly marked):

- ``decode_mode="stub"`` — a deterministic fake: features derive from the
  md5 of the payload bytes, so tests can assert exact values and the
  pipeline (schema, batch shape, partitioning, UDF signatures) is fully
  exercised end-to-end.
- ``decode_mode="real"`` — raises ``NotImplementedError`` unless the
  optional codec import (PIL / soundfile) succeeds; this is where a real
  deployment plugs in.

At 100 TB the pattern is: binaries live in parquet (or are pointers into a
blob store), ``spark.sql.files.maxPartitionBytes`` bounds task memory, and
each kernel is one Arrow batch → numpy pass with no Python-per-row cost.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_stub",
    "image_features",
    "frame_sample",
    "audio_duration",
]

# one row per asset: payload + typed metadata (schemaless meta bags lose
# Catalyst pruning; typed columns are the scalable form)
MEDIA_SCHEMA = (
    "media_id bigint, payload binary, media_type string, "
    "width int, height int, sample_rate int, n_frames int"
)


def attach_media_stub(docs: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic fake media table from any id column (test
    fixture helper: payload bytes = md5 stream of the id)."""
    payload = F.unhex(F.md5(F.col(id_col).cast("string").cast("binary")))
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.col(id_col) % 640 + 32).cast("int").alias("width"),
        (F.col(id_col) % 480 + 32).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col(id_col) % 300 + 1).cast("int").alias("n_frames"),
    )


def _stub_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding: md5-seeded uniform values in [0,1)."""
    out = np.empty(dim, dtype=np.float64)
    h = payload or b""
    for i in range(dim):
        h = hashlib.md5(h).digest()
        out[i] = int.from_bytes(h[:8], "big") / 2**64
    return out


def image_features(
    media: DataFrame, *, dim: int = 8, decode_mode: str = "stub"
) -> DataFrame:
    """Decode + feature-extract images → (media_id, features ARRAY<DOUBLE>).

    The Spark-side plumbing (filter pushdown on media_type, Arrow batches,
    output schema) is real; only the pixel decode is stubbed.
    """
    if decode_mode == "real":
        try:
            import PIL.Image  # noqa: F401
        except ImportError as ex:  # pragma: no cover - env-dependent
            raise NotImplementedError(
                "real image decode needs PIL, which this environment lacks; "
                "use decode_mode='stub'"
            ) from ex

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [list(_stub_features(p, dim)) for p in pdf["payload"]]
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    imgs = media.filter(F.col("media_type") == "image").select("media_id", "payload")
    return imgs.mapInPandas(extract, "media_id bigint, features array<double>")


def frame_sample(
    media: DataFrame, *, every_n: int = 30, decode_mode: str = "stub"
) -> DataFrame:
    """Sample frame indexes from videos → (media_id, frame_idx, frame BINARY).

    Frame payloads are stub bytes (md5 of payload+idx); a real deployment
    swaps the generator for an actual demuxer.
    """
    if decode_mode == "real":
        raise NotImplementedError("no video codec in this environment")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload, n in zip(pdf["media_id"], pdf["payload"], pdf["n_frames"]):
                for i in range(0, int(n), every_n):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.md5((payload or b"") + bytes([i % 256])).digest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    vids = media.filter(F.col("media_type") == "video").select(
        "media_id", "payload", "n_frames"
    )
    return vids.mapInPandas(sample, "media_id bigint, frame_idx int, frame binary")


def audio_duration(media: DataFrame) -> DataFrame:
    """Pure-metadata op (no decode): duration from frames & sample rate."""
    auds = media.filter(F.col("media_type") == "audio")
    return auds.select(
        "media_id",
        F.round(F.col("n_frames") * 512.0 / F.col("sample_rate"), 6).alias("duration_s"),
    )
