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


RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("resized_sha", StringType()),
    ]
)


def resize_dims(w, h, max_w: int, max_h: int):
    """Fit-within target dimensions, aspect preserved: scale =
    min(max_w/w, max_h/h, 1) (never upscale), floor to ints, min 1 px.
    Pure column expressions — the same double math replays in DuckDB."""
    from pyspark.sql import functions as F

    scale = F.least(
        F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0)
    )
    return (
        F.greatest(F.floor(w * scale), F.lit(1)).cast("int"),
        F.greatest(F.floor(h * scale), F.lit(1)).cast("int"),
    )


def resize_media(media: DataFrame, max_w: int = 64, max_h: int = 64) -> DataFrame:
    """Image resize stage: target dims are computed JVM-side (resize_dims),
    the resample itself is an Arrow mapInPandas over the payload — STUBBED
    (no PIL in this container) as sha256(payload '|' out_w 'x' out_h),
    deterministic and cross-engine reproducible so the driver oracle
    value-checks the dimension math and the batch plumbing end-to-end;
    production swaps the stub via make_pil_resize_udf.  The binary payload
    stays inside the scan stage (same rule as html/extract)."""
    from pyspark.sql import functions as F

    ow, oh = resize_dims(media["width"], media["height"], max_w, max_h)
    with_dims = media.filter(media["kind"] == "image").select(
        "media_id", "payload", ow.alias("out_w"), oh.alias("out_h")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": pdf["out_w"],
                    "out_h": pdf["out_h"],
                    "resized_sha": [
                        hashlib.sha256(
                            (p or b"") + f"|{w}x{h}".encode()
                        ).hexdigest()
                        for p, w, h in zip(pdf["payload"], pdf["out_w"], pdf["out_h"])
                    ],
                }
            )

    return with_dims.mapInPandas(gen, RESIZE_SCHEMA)


def make_pil_resize_udf(max_w: int = 64, max_h: int = 64, resample: str = "LANCZOS"):
    """Production resize: PIL per python worker (import deferred to the
    executor), decode -> thumbnail((max_w, max_h), Resampling[resample]) ->
    re-encode PNG bytes.  Same mapInPandas contract as the stub; numeric
    parity is environment-bound (no PIL here) — the adapter is
    contract-tested against a mock PIL module."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        rs = getattr(Image.Resampling, resample)
        for pdf in batches:
            out: dict[str, list] = {
                "media_id": [], "out_w": [], "out_h": [], "resized": []
            }
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                img = Image.open(io.BytesIO(payload))
                img.thumbnail((max_w, max_h), rs)
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                out["media_id"].append(mid)
                out["out_w"].append(img.size[0])
                out["out_h"].append(img.size[1])
                out["resized"].append(buf.getvalue())
            yield pd.DataFrame(out)

    return gen


PIL_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("resized", BinaryType()),
    ]
)
