"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct, exactly
like `html:binary` in the pages table.  The decode/feature steps are Arrow-
batched `mapInPandas` stages; the actual codecs are STUBBED (no image/audio
libs in this container) behind `decode_stub`, which produces deterministic
fake features so the Spark-side plumbing — schema, batch shape, partitioning,
column pruning — is real and tested.

Scale notes: the binary column is projected away before any shuffle (same
rule as `html` in extract.extract_articles); `mapInPandas` keeps the wide
bytes inside the scan stage.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def decode_stub(payload: bytes, kind: str, dim: int = 8) -> list[float]:
    """Deterministic fake 'decoded feature': bytes of sha256 scaled to [0,1).

    Replace with a real decode (PIL / torchaudio / pyav frame-sample) in
    production — the UDF signature and batch shape stay identical."""
    h = hashlib.sha256(payload or b"").digest()
    return [h[i] / 256.0 for i in range(dim)]


FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", LongType()),
        StructField("frame_sha", StringType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Deterministic uniform frame sampling for video payloads: one output
    row per (video, frame index), timestamp = floor(duration_ms * i / n) —
    the 1→N row fan-out happens INSIDE the scan stage (mapInPandas yields
    more rows than it consumes), so the binary payload is read once and
    never shuffled; only per-frame signatures leave the stage.

    The frame DECODE is stubbed (no pyav/ffmpeg in this container) as
    sha256(payload ':' idx) — deterministic and cross-engine reproducible,
    so the driver ORACLE value-checks the fan-out, timestamps, and
    signature plumbing; production swaps the stub for a keyframe grab with
    the identical signature."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "frame_idx": [], "ts_ms": [], "frame_sha": []
            }
            for mid, payload, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["duration_ms"]
            ):
                for i in range(n_frames):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(int((dur or 0) * i // n_frames))
                    out["frame_sha"].append(
                        hashlib.sha256((payload or b"") + f":{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    return media.filter(media["kind"] == "video").mapInPandas(gen, FRAMES_SCHEMA)


def extract_media_features(media: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction: payload never leaves the scan stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p or b"") for p in pdf["payload"]],
                    "checksum": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feature": [
                        decode_stub(p, k, dim)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(gen, FEATURES_SCHEMA)
