"""Multimodal column plumbing: binary media + typed metadata over Spark.

Images/audio/video are opaque ``binary`` columns with typed metadata
structs. The Spark-side plumbing — schemas, mapInPandas batch shape,
partition sizing — is real and tested; the codec step is stubbed behind
deterministic fakes because the decode libraries (PIL/ffmpeg/etc.) are
not available in this container. Swap ``_decode_image_stub`` for a real
decoder (e.g. PIL) in production; every other line stays unchanged.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

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

__all__ = [
    "MEDIA_SCHEMA",
    "IMAGE_FEATURES_SCHEMA",
    "AUDIO_FEATURES_SCHEMA",
    "attach_media_metadata",
    "image_features",
    "audio_features",
    "frame_sample",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_s", FloatType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decoder: (width, height, channels) from a hash.

    Production: replace with ``PIL.Image.open(io.BytesIO(payload)).size``.
    Raises like a real decoder would on empty payloads.
    """
    if not payload:
        raise ValueError("empty media payload")
    digest = hashlib.sha256(payload).digest()
    w, h = struct.unpack("<HH", digest[:4])
    return 1 + w % 4096, 1 + h % 4096, 3


def _feature_stub(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic fake feature extractor (stands in for a CNN/CLIP
    forward pass). Values derive from the payload hash: stable across
    runs and partitions."""
    digest = hashlib.sha256(payload).digest()
    raw = struct.unpack(f"<{dim}H", (digest * ((2 * dim) // len(digest) + 1))[: 2 * dim])
    return [v / 65535.0 for v in raw]


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """JVM-side metadata: byte length + sha256 (no Python involved)."""
    return df.withColumns(
        {
            "byte_len": F.length(payload_col).cast("long"),
            "sha256": F.sha2(F.col(payload_col), 256),
        }
    )


def image_features(df: DataFrame, *, dim: int = 16) -> DataFrame:
    """Decode + featurize images via mapInPandas (Arrow batches).

    The batch shape is the production contract: one pandas DataFrame per
    Arrow batch, payload bytes in, fixed-width feature rows out. Decode
    failures yield NULL dimensions rather than failing the task (lineage
    keeps the error count observable).
    """

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "media_id": batch["media_id"],
                "width": [],
                "height": [],
                "channels": [],
                "embedding": [],
            }
            for payload in batch["payload"]:
                try:
                    w, h, c = _decode_image_stub(bytes(payload or b""))
                    out["width"].append(w)
                    out["height"].append(h)
                    out["channels"].append(c)
                    out["embedding"].append(_feature_stub(bytes(payload), dim))
                except ValueError:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["channels"].append(None)
                    out["embedding"].append(None)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        worker, IMAGE_FEATURES_SCHEMA
    )


def _decode_audio_stub(payload: bytes) -> tuple[int, int]:
    """Deterministic fake audio decoder: (sample_rate, n_samples).

    Production: replace with ``soundfile.read``/ffprobe; empty payloads
    raise like a real decoder would.
    """
    if not payload:
        raise ValueError("empty media payload")
    digest = hashlib.sha256(payload).digest()
    rate = (8000, 16000, 22050, 44100, 48000)[digest[0] % 5]
    # fake "compression ratio": ~4 samples per payload byte
    return rate, 4 * len(payload)


def audio_features(df: DataFrame, *, dim: int = 16) -> DataFrame:
    """Decode + featurize audio via mapInPandas (Arrow batches).

    Same production contract as :func:`image_features`: payload bytes
    in, fixed-width feature rows out, decode failures -> NULLs instead
    of task failure. The embedding stub stands in for an MFCC/wav2vec
    forward pass.
    """

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "media_id": batch["media_id"],
                "sample_rate": [],
                "n_samples": [],
                "duration_s": [],
                "embedding": [],
            }
            for payload in batch["payload"]:
                try:
                    rate, n = _decode_audio_stub(bytes(payload or b""))
                    out["sample_rate"].append(rate)
                    out["n_samples"].append(n)
                    out["duration_s"].append(n / rate)
                    out["embedding"].append(_feature_stub(bytes(payload), dim))
                except ValueError:
                    out["sample_rate"].append(None)
                    out["n_samples"].append(None)
                    out["duration_s"].append(None)
                    out["embedding"].append(None)
            yield pd.DataFrame(out)

    return df.select("media_id", "payload").mapInPandas(
        worker, AUDIO_FEATURES_SCHEMA
    )


def frame_sample(
    df: DataFrame, *, every_nth: int = 10, payload_col: str = "payload"
) -> DataFrame:
    """Video frame sampling plumbing: emits (media_id, frame_idx, frame).

    The stub treats each 4KB payload slice as a "frame"; a real
    implementation replaces the slicing with an ffmpeg/pyav iterator —
    the explode shape and schema stay identical.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def worker(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunk = 4096
        for batch in batches:
            rows = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, payload in zip(batch["media_id"], batch[payload_col]):
                data = bytes(payload or b"")
                n_frames = max(1, len(data) // chunk)
                for idx in range(0, n_frames, every_nth):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame"].append(data[idx * chunk : (idx + 1) * chunk])
            yield pd.DataFrame(rows)

    return df.select("media_id", payload_col).mapInPandas(worker, schema)
